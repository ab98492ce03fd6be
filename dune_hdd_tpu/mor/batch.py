"""Batched (vmapped) online RB sweeps over parameter sets.

The reference's greedy workflow scores every training parameter per
iteration (thermalblock_main.py:126-170 via pyMOR) — a Python loop of tiny
dense solves and estimator evaluations.  On TPU each of those is a
dispatch; this module fuses the whole candidate sweep into ONE jitted
program: parameters are stacked into leading-axis arrays (a pytree), the
theta expressions are jnp-traced, and ``jax.vmap`` batches the reduced
solve + Riesz residual estimate over the parameter axis.  This is the
DP-style online analog of the detailed-solve parameter sweeps in
parallel/sharded.py.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stack_parameters", "batched_reduced_solve", "batched_estimates"]


def stack_parameters(problem, mus: Sequence[dict]) -> Dict[str, jnp.ndarray]:
    """Parse + stack a parameter list into {key: [M, k]} arrays (a pytree
    vmap can map over)."""
    parsed = [problem.parse_parameter(mu) for mu in mus]
    keys = sorted(parsed[0].keys()) if parsed else []
    return {k: jnp.stack([jnp.atleast_1d(jnp.asarray(p[k], dtype=jnp.result_type(float)))
                          for p in parsed]) for k in keys}


def _thetas(coeffs, mu):
    if not coeffs:
        return jnp.zeros((0,))
    return jnp.stack([jnp.asarray(c(mu)).reshape(()) for c in coeffs])


def batched_reduced_solve(rm, stacked: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """[M, n] reduced coefficients for all stacked parameters in one jitted
    vmapped dense solve (ReducedModel.solve batched over mu)."""

    def one(mu):
        A = jnp.einsum("q,qij->ij", _thetas(rm.op_coeffs, mu), rm.op_mats)
        b = jnp.einsum("q,qi->i", _thetas(rm.rhs_coeffs, mu), rm.rhs_vecs)
        return jnp.linalg.solve(A, b)

    return jax.jit(jax.vmap(one))(stacked)


def batched_estimates(online, rm, stacked: Dict[str, jnp.ndarray],
                      coercivities: Optional[np.ndarray] = None) -> np.ndarray:
    """[M] Riesz residual estimates (OnlineResidual.estimate batched): one
    fused program evaluates thetas, the reduced solves and the Gramian
    quadratic form for every candidate.  ``coercivities``: per-candidate
    alpha_LB evaluated by the caller (the coercivity callable may not be
    vmap-traceable); divides as 1/sqrt(alpha)."""
    G_fa = online.G_fa
    Qf = G_fa.shape[0]
    Qa, n = G_fa.shape[1], G_fa.shape[2]
    G_fa2 = G_fa.reshape(Qf, Qa * n)
    G_aa2 = online.G_aa.reshape(Qa * n, Qa * n)

    def one(mu):
        c = jnp.einsum("q,qij->ij", _thetas(rm.op_coeffs, mu), rm.op_mats)
        b = jnp.einsum("q,qi->i", _thetas(rm.rhs_coeffs, mu), rm.rhs_vecs)
        coef = jnp.linalg.solve(c, b) if n else jnp.zeros((0,))
        tf = _thetas(online.rhs_coeffs, mu)
        ta = _thetas(online.op_coeffs, mu)
        w = (ta[:, None] * coef[None, :]).reshape(-1)
        eta2 = tf @ online.G_ff @ tf - 2.0 * (tf @ (G_fa2 @ w)) + w @ (G_aa2 @ w)
        return jnp.sqrt(jnp.maximum(eta2, 0.0))

    etas = np.asarray(jax.jit(jax.vmap(one))(stacked))
    if coercivities is not None:
        etas = etas / np.sqrt(np.maximum(np.asarray(coercivities, dtype=etas.dtype),
                                         1e-300))
    return etas
