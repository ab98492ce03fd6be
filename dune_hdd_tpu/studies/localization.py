"""Localization study: estimator indicator distributions vs true local
errors (analog of Stuff::Common::LocalizationStudy as driven by
test/OS2014_localization_study.cc:90-136 and compute_reference_indicators,
test/linearelliptic-swipdg.hh:133-223: per-element true energy errors mapped
to coarse entities/subdomains)."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..functions.base import Function, freeze_function
from ..ops.assembly import cell_quadrature
from ..ops.norms import evaluate_discrete_gradient

__all__ = ["true_local_indicators", "localization_study"]


def true_local_indicators(
    block_disc,
    u: jnp.ndarray,
    exact: Function,
    mu=None,
    order: int = 6,
) -> np.ndarray:
    """Per-subdomain squared energy errors |e|^2_{a,Omega_j} of the discrete
    solution against an exact solution, normalised to sum 1."""
    d = block_disc
    grid = d.space.grid
    problem = d.problem.with_mu(mu) if d.problem.parametric() else d.problem
    lam = freeze_function(problem.diffusion_factor)
    kap = freeze_function(problem.diffusion_tensor)
    qp, qw = cell_quadrature(grid, order)
    e_grad = exact.gradient(qp) - evaluate_discrete_gradient(d.space, u, qp)
    lam_q = lam(qp)
    kap_q = kap(qp)
    flux = jnp.einsum("ckab,ckb->cka", kap_q, e_grad)
    cell_sq = jnp.sum(qw * lam_q * jnp.sum(e_grad * flux, axis=-1), axis=1)
    sub_sq = jax.ops.segment_sum(
        cell_sq, jnp.asarray(d.ms_grid.subdomain_of.astype(np.int64)),
        num_segments=d.ms_grid.size(),
    )
    total = jnp.sum(sub_sq)
    return np.asarray(sub_sq / total)


def localization_study(
    block_disc,
    u: jnp.ndarray,
    exact: Function,
    estimator_type: str = "eta_OS2014",
    parameters: Optional[Dict] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Returns (estimator indicators, true indicators, Pearson correlation).

    Both distributions are normalised; a well-localised estimator orders the
    subdomains like the true error does.
    """
    from ..estimators.block_swipdg import BlockSWIPDGEstimators

    est = BlockSWIPDGEstimators.estimate_local(block_disc, u, estimator_type, parameters)
    est = est / est.sum()
    mu = (parameters or {}).get("mu")
    true = true_local_indicators(block_disc, u, exact, mu)
    if est.std() == 0 or true.std() == 0:
        corr = 1.0 if np.allclose(est, true) else 0.0
    else:
        corr = float(np.corrcoef(est, true)[0, 1])
    return est, true, corr
