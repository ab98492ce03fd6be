"""ZeroBoundary wrapper: any problem with dirichlet/neumann replaced by zero —
used by BlockSWIPDG to make subdomain-local problems purely interior
(reference: problems/zero-boundary.hh:21-61)."""
from __future__ import annotations

from ..functions.base import ConstantFunction, nonparametric
from .interfaces import Problem

__all__ = ["ZeroBoundaryProblem"]


class ZeroBoundaryProblem(Problem):
    static_id = Problem.static_id + ".zero-boundary"

    def __init__(self, problem: Problem):
        self.wrapped = problem
        super().__init__(
            diffusion_factor=problem.diffusion_factor,
            diffusion_tensor=problem.diffusion_tensor,
            force=problem.force,
            dirichlet=nonparametric(ConstantFunction(0.0, "dirichlet")),
            neumann=nonparametric(ConstantFunction(0.0, "neumann")),
        )

    def type(self) -> str:
        return self.static_id
