"""Dimension-generic CG test cases (d = 1, 2, 3).

The reference runs its CG example on SGrid<1,1>/<2,2>/<3,3>
(examples/linearelliptic/cg.cc:19-21) with the ESV2007-style Dirichlet
problems; this module provides the manufactured-solution counterpart on
TensorGrids: ``u = prod_a sin(pi x_a)`` on [0,1]^d with zero Dirichlet data,
``f = d pi^2 u`` — known exact solution, EOC {2, 1} in L2/H1 for Q1
(testcases/ESV2007.hh:29-167 idiom, exact solution + refinement hierarchy).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..functions.base import ConstantFunction, Function, constant_matrix, nonparametric
from ..grid.tensor import TensorGridHierarchy, tensor_grid
from ..problems.interfaces import Problem
from .base import TestCaseBase

__all__ = ["TensorSineTestcase", "TensorSineExactSolution"]


class TensorSineExactSolution(Function):
    """u(x) = prod_a sin(pi x_a); closed-form gradient."""

    range_shape = ()
    order = 8
    name = "exact_solution"

    def __init__(self, dim: int):
        self.dim = int(dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        comps = []
        for a in range(self.dim):
            g = jnp.pi * jnp.cos(jnp.pi * x[..., a])
            for b in range(self.dim):
                if b != a:
                    g = g * jnp.sin(jnp.pi * x[..., b])
            comps.append(g)
        return jnp.stack(comps, axis=-1)


class _TensorSineForce(Function):
    range_shape = ()
    order = 8
    name = "force"

    def __init__(self, dim: int):
        self.dim = int(dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.dim * jnp.pi ** 2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)


class TensorSineTestcase(TestCaseBase):
    """Unit-diffusion Dirichlet problem on [0,1]^d with exact solution."""

    name = "tensor_sine"

    def __init__(self, dim: int, initial_cells: int = 4,
                 num_refinements: int = 2):
        self.dim = int(dim)
        problem = Problem(
            nonparametric(ConstantFunction(1.0, "diffusion_factor")),
            nonparametric(constant_matrix(1.0, dim=dim)),
            nonparametric(_TensorSineForce(dim)),
            nonparametric(ConstantFunction(0.0, "dirichlet")),
            nonparametric(ConstantFunction(0.0, "neumann")),
        )
        base = tensor_grid([0.0] * dim, [1.0] * dim, [initial_cells] * dim)
        hierarchy = TensorGridHierarchy(base, num_refinements + 1)
        super().__init__(
            problem,
            hierarchy,
            boundary_info_cfg={"type": "stuff.grid.boundaryinfo.alldirichlet"},
            exact_solution=TensorSineExactSolution(dim),
            num_refinements=num_refinements,
        )
