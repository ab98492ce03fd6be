"""EOC (experimental order of convergence) study harness.

Re-design of the reference's EocStudyBase / SWIPDGStudy
(test/linearelliptic.hh:48-290, test/linearelliptic-swipdg.hh:62-328):
per refinement level assemble + solve, measure error norms against the exact
solution (or the reference-level discrete solution through cell parent
chains), evaluate estimators, report EOC rates, and compare against
expectation tables.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, List, Mapping, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..functions.base import Function, freeze_function
from ..grid.boundaryinfo import make_boundary_info
from ..ops.assembly import cell_quadrature
from ..ops.norms import error_norms, evaluate_discrete, evaluate_discrete_gradient
from ..testcases.base import TestCaseBase

__all__ = ["EocStudy", "eoc_rates"]


def eoc_rates(values: Sequence[float]) -> List[float]:
    """EOC between successive levels (grid width halves per level)."""
    return [
        float(np.log2(values[i] / values[i + 1])) for i in range(len(values) - 1)
    ]


def _difference_norms(space_f, u_f, space_c, u_c, parent, diffusion=None, order: int = 6):
    """Norms of (u_f - u_c) on the fine grid, with u_c evaluated through the
    fine->coarse cell map (replaces the reference's Prolongation operator,
    test/linearelliptic.hh:168-175)."""
    qp, qw = cell_quadrature(space_f.grid, order)
    uf_val = evaluate_discrete(space_f, u_f, qp)
    uf_grad = evaluate_discrete_gradient(space_f, u_f, qp)
    verts_c = jnp.asarray(space_c.grid.cell_vertices[parent])
    vals_c = space_c.shape_values(verts_c, qp)
    grads_c = space_c.shape_gradients(verts_c, qp)
    u_loc = u_c[jnp.asarray(space_c.cell_dofs)[jnp.asarray(parent)]]
    uc_val = jnp.einsum("cki,ci->ck", vals_c, u_loc)
    uc_grad = jnp.einsum("ckia,ci->cka", grads_c, u_loc)
    ev = uf_val - uc_val
    eg = uf_grad - uc_grad
    out = {
        "L2": float(jnp.sqrt(jnp.sum(qw * ev**2))),
        "H1_semi": float(jnp.sqrt(jnp.sum(qw * jnp.sum(eg**2, axis=-1)))),
    }
    if diffusion is not None:
        lam_fn, kap_fn = diffusion
        lam = lam_fn(qp) if lam_fn is not None else 1.0
        kap = kap_fn(qp)
        flux = jnp.einsum("ckab,ckb->cka", kap, eg)
        out["energy"] = float(jnp.sqrt(jnp.sum(qw * lam * jnp.sum(eg * flux, axis=-1))))
    return out


class EocStudy:
    def __init__(
        self,
        test_case: TestCaseBase,
        discretization_factory: Callable,
        norms: Sequence[str] = ("L2", "H1_semi", "energy"),
        estimator_types: Sequence[str] = (),
        estimate_fn: Optional[Callable] = None,
        mu=None,
        energy_mu=None,
        solver_options: Optional[Mapping] = None,
    ):
        self.test_case = test_case
        self.factory = discretization_factory
        self.norms = tuple(norms)
        self.estimator_types = tuple(estimator_types)
        self.estimate_fn = estimate_fn
        self.mu = mu
        self.energy_mu = energy_mu if energy_mu is not None else mu
        self.solver_options = dict(solver_options or {"type": "direct"})
        self.time_to_solution: List[float] = []
        self.discretizations: List = []
        self.solutions: List = []

    # ------------------------------------------------------------------
    def _energy_diffusion(self):
        problem = self.test_case.problem
        frozen = problem.with_mu(self.energy_mu) if problem.parametric() else problem
        return (
            freeze_function(frozen.diffusion_factor),
            freeze_function(frozen.diffusion_tensor),
        )

    def run(self, verbose: bool = True) -> Dict[str, List[float]]:
        tc = self.test_case
        results: Dict[str, List[float]] = {t: [] for t in self.norms + self.estimator_types}
        reference = None  # (space, u) on the reference grid, if needed
        if not tc.provides_exact_solution():
            ref_disc = self.factory(tc.reference_grid, tc.boundary_info(), tc.problem)
            u_ref = ref_disc.solve(self.mu, options=self.solver_options)
            reference = (ref_disc.space, u_ref, ref_disc)
        lam_kap = self._energy_diffusion()
        for r in range(tc.num_refinements + 1):
            grid = tc.level_grid(r)
            t0 = time.perf_counter()
            disc = self.factory(grid, tc.boundary_info(), tc.problem)
            u = disc.solve(self.mu, options=self.solver_options)
            self.time_to_solution.append(time.perf_counter() - t0)
            self.discretizations.append(disc)
            self.solutions.append(u)
            if tc.provides_exact_solution():
                errs = error_norms(
                    disc.space, u, tc.exact_solution,
                    diffusion_factor=lam_kap[0], diffusion_tensor=lam_kap[1],
                )
            else:
                space_f, u_f, _rd = reference
                parent = tc.hierarchy.parent_cells(r, tc.reference_level)
                errs = _difference_norms(space_f, u_f, disc.space, u, parent, lam_kap)
            for t in self.norms:
                results[t].append(errs[t])
            for t in self.estimator_types:
                results[t].append(
                    float(self.estimate_fn(disc, u, t, level=r))
                )
            if verbose:
                line = f"  ref {r}: " + "  ".join(
                    f"{t}={results[t][-1]:.3e}" for t in self.norms + self.estimator_types
                )
                print(line)
        self.results = results
        return results

    def eoc(self, type_: str) -> List[float]:
        return eoc_rates(self.results[type_])
