"""Geometric/aggregation multigrid in the SoA plane layout.

Round-3 retrospective: the BlockEll-gather V-cycle (la/multigrid.py) passes
its tests but measured 24.97 s/solve at 192k DoF vs 52.6 ms for two-level
deflation (ROADMAP round 3 section 11) — the gather-based transfer operators
serialize on TPU.  This is its rebuild in the plane layout (VERDICT r3 next
item 5): every operator application is rolls + elementwise FMAs
(la/stencil.py band machinery), every transfer a reshape-sum (restriction)
or broadcast (prolongation) — zero gathers, zero scatters.

Hierarchy:
  level 0   — the SWIPDG block system in planes [nd, 8, KY, KX]
              (StencilBlockEll; 24 rolls / 36 FMAs per matvec)
  level 1   — its piecewise-constant aggregation to the SCALAR cell lattice
              [KY, KX]: 9-point stencil bands (la/stencil.py _stencil_bands)
  level l+1 — 2x2 re-aggregation of level l's bands (_aggregate_bands)
  coarsest  — dense inverse (Newton-Schulz-polished block-cyclic-reduction
              or LU, la/stencil.py _coarse_inverse*)

The V(1,1) cycle with (self-adjoint) damped Jacobi smoothing and
restriction = prolongation^T is a fixed symmetric operator, usable directly
as the PCG preconditioner (solver registry semantics, reference
base.hh:314-322).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .stencil import (
    StencilBlockEll,
    _aggregate_bands,
    _aggregation2d,
    _band_matvec,
    _bands_to_dense,
    _coarse_inverse,
    _coarse_inverse_bcr,
    _stencil_bands,
    jacobi_smoother,
)

__all__ = ["stencil_multigrid_preconditioner"]


def _damped_jacobi_bands(bands: dict, omega: float) -> Callable:
    d = bands[(0, 0)]
    dinv = jnp.where(d != 0, omega / jnp.where(d != 0, d, 1.0), 0.0)
    return lambda r: dinv * r


def _restrict2(x: jnp.ndarray) -> jnp.ndarray:
    my, mx = x.shape
    return x.reshape(my // 2, 2, mx // 2, 2).sum(axis=(1, 3))


def _prolong2(xc: jnp.ndarray) -> jnp.ndarray:
    my2, mx2 = xc.shape
    return jnp.broadcast_to(
        xc[:, None, :, None], (my2, 2, mx2, 2)).reshape(my2 * 2, mx2 * 2)


def stencil_multigrid_preconditioner(
    S: StencilBlockEll,
    coarsest_max: int = 4096,
    omega: float = 0.7,
    newton_schulz: int = 2,
    smoother: Optional[Callable] = None,
) -> Callable:
    """Symmetric V(1,1)-cycle preconditioner for the plane-layout system.

    All level operators are built at trace time from ``S`` (runtime-input
    coefficients flow through — nothing is baked as a constant), so the
    preconditioner jits inside the same fused program as assembly + PCG.
    """
    KY, KX = S.lattice
    nd = S.nd
    agg = _aggregation2d(S, (KX, KY))  # factor (1,1): planes -> cell lattice
    assert agg is not None
    bands0 = _stencil_bands(S, agg)

    # band hierarchy: halve both axes while they stay even and large
    levels = [(bands0, KY, KX)]
    my, mx = KY, KX
    while my * mx > coarsest_max and my % 2 == 0 and mx % 2 == 0:
        bands = _aggregate_bands(levels[-1][0], my, mx, 2, 2)
        my, mx = my // 2, mx // 2
        levels.append((bands, my, mx))

    bands_c, my_c, mx_c = levels[-1]
    E_c = _bands_to_dense(bands_c, my_c, mx_c)
    if mx_c >= 2 and all(abs(vx) <= 1 for (_vy, vx) in bands_c):
        coarse = _coarse_inverse_bcr(E_c, mx_c, my_c, newton_schulz)
    else:
        coarse = _coarse_inverse(E_c, newton_schulz)

    def coarse_solve(r):  # [my_c, mx_c] -> [my_c, mx_c]; BCR order is x-major
        y = coarse(r.T.reshape(-1))
        return y.reshape(mx_c, my_c).T

    mats = [_band_matvec(b) for b, _, _ in levels]
    smooths = [_damped_jacobi_bands(b, omega) for b, _, _ in levels]

    def band_vcycle(lvl: int, r: jnp.ndarray) -> jnp.ndarray:
        if lvl == len(levels) - 1:
            return coarse_solve(r)
        x = smooths[lvl](r)
        res = r - mats[lvl](x)
        x = x + _prolong2(band_vcycle(lvl + 1, _restrict2(res)))
        res = r - mats[lvl](x)
        return x + smooths[lvl](res)

    if smoother is not None:
        top_smooth = smoother
    else:
        bj = jacobi_smoother(S)  # blockwise 3x3 diagonal inverse
        top_smooth = lambda r: omega * bj(r)  # noqa: E731 - damped

    def apply(R: jnp.ndarray) -> jnp.ndarray:  # [nd, 8, KY, KX]
        x = top_smooth(R)
        res = R - S.matvec(x)
        xc = band_vcycle(0, agg.aggsum(res))
        x = x + jnp.broadcast_to(agg.broadcast(xc)[None], R.shape)
        res = R - S.matvec(x)
        return x + top_smooth(res)

    return apply
