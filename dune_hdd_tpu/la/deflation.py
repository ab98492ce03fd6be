"""Two-level (deflation) preconditioning for high-contrast SPD systems.

The SPE10 permeability is piecewise constant on the 100x20 macro grid, so the
near-kernel of the Jacobi-preconditioned operator is spanned by functions
that are constant on high-permeability islands.  An aggregation coarse space
with one piecewise-constant vector per macro cell captures exactly these
modes (aggregates align with the coefficient), turning the 1e6-contrast solve
into a contrast-robust iteration: the classical two-level
deflation/balancing preconditioner (Nicolaides/Mandel; cf. the spectral-AMGe
coarse spaces the reference reaches via its Stuff::LA AMG solver option,
dune/hdd/linearelliptic/discretizations/base.hh:327-367) is

  M^-1 = Q + (I - Q A)^T M_J^-1 (I - A Q),     Q = Z E^-1 Z^T,  E = Z^T A Z

with M_J the (block-)Jacobi smoother.  All pieces are jit-friendly: Z is a
static cell->aggregate map, E is built by segment-sums, the coarse solve is
one dense Cholesky factorization reused across PCG iterations.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_ell import BlockEllMatrix, block_jacobi_preconditioner

__all__ = [
    "aggregate_map_from_points",
    "coarse_operator",
    "deflation_preconditioner",
    "refined_deflated_solve",
    "structured_aggregation",
]


def structured_aggregation(order, macro_shape):
    """(aggsum, broadcast, cell_agg_new) for a StructuredOrder whose
    subclass lattices tile the (mx, my) macro grid: Z^T r and Z yc become
    pure reshape-sum / broadcast (no segment_sum scatter, no gather — both
    run ~20x below stream bandwidth on TPU).  Aggregate ids follow
    aggregate_map_from_points: agg = ix_macro * my + iy_macro.

    Returns None if the macro grid doesn't tile the lattice.
    """
    plan = order.aggregate_plan(macro_shape)
    if plan is None:
        return None
    fy, fx = plan
    mx, my = int(macro_shape[0]), int(macro_shape[1])
    ky, kx = order.lattice
    nc = order.num_cells

    def aggsum(r, nd):
        # [8, MY, fy, MX, fx, nd] -> [MY, MX] -> agg order (MX-major)
        rc = r.reshape(8, my, fy, mx, fx, nd)
        return rc.sum(axis=(0, 2, 4, 5)).T.reshape(-1)

    def broadcast(yc, nd):
        g = yc.reshape(mx, my).T  # [MY, MX]
        g = jnp.broadcast_to(g[None, :, None, :, None, None], (8, my, fy, mx, fx, nd))
        return g.reshape(nc * nd)

    # aggregate id per NEW cell id (for the coarse operator build)
    iy2 = np.repeat(np.arange(ky), kx)
    j = np.tile(np.arange(kx), ky)
    agg_lattice = (j // fx) * my + (iy2 // fy)
    cell_agg_new = np.tile(agg_lattice, 8)
    return aggsum, broadcast, cell_agg_new


def aggregate_map_from_points(points: np.ndarray, lower, upper, shape) -> np.ndarray:
    """Aggregate id per point by binning into a structured (nx, ny) box grid
    over [lower, upper] — for SPE10 this is the 100x20 macro-permeability
    grid, so aggregates align exactly with the coefficient structure."""
    lower = np.asarray(lower, dtype=float)
    upper = np.asarray(upper, dtype=float)
    shape = np.asarray(shape, dtype=int)
    rel = (points - lower) / (upper - lower)
    ij = np.clip(np.floor(rel * shape).astype(np.int64), 0, shape - 1)
    return ij[:, 0] * shape[1] + ij[:, 1]


def _dof_aggregates(matrix: BlockEllMatrix, cell_agg: np.ndarray) -> np.ndarray:
    nd = matrix.nd
    return np.repeat(np.asarray(cell_agg, dtype=np.int64), nd)


def coarse_operator(matrix: BlockEllMatrix, cell_agg: np.ndarray, n_agg: int) -> jnp.ndarray:
    """E = Z^T A Z for the piecewise-constant aggregation basis
    Z[i, a] = 1_{agg(i) == a}: per (cell, slot) block sums scattered by
    (agg(cell), agg(neighbor)).  jit-safe (static index arrays)."""
    cell_agg = np.asarray(cell_agg, dtype=np.int64)
    rows = np.repeat(cell_agg[:, None], matrix.neighbors.shape[1], axis=1)
    cols = cell_agg[np.asarray(matrix.neighbors, dtype=np.int64)]
    flat = (rows * n_agg + cols).reshape(-1)
    sums = jnp.sum(matrix.blocks, axis=(-2, -1)).reshape(-1)  # [NC * B]
    E = jnp.zeros(n_agg * n_agg, dtype=matrix.blocks.dtype)
    E = E.at[jnp.asarray(flat)].add(sums)
    return E.reshape(n_agg, n_agg)


def deflation_preconditioner(
    matrix: BlockEllMatrix,
    cell_agg: np.ndarray,
    n_agg: int,
    smoother: Optional[Callable] = None,
    coarse_dtype=None,
) -> Callable:
    """Build M^-1 r = Q r + (I - Q A) M_J^-1 (I - A Q) r (symmetric
    two-level balancing preconditioner; SPD, so usable inside CG).

    ``coarse_dtype`` lets the [n_agg, n_agg] Cholesky run in float64 while
    the fine-grid smoother/matvec stay float32 (the coarse problem inherits
    the full contrast, the fine corrections do not).
    """
    if smoother is None:
        smoother = block_jacobi_preconditioner(matrix)
    dof_agg = jnp.asarray(_dof_aggregates(matrix, cell_agg))
    E = coarse_operator(matrix, cell_agg, n_agg)
    # Precompute A Z once: (A Z)[c*nd+i, a] = sum_b 1{agg(nb(c,b))=a}
    # sum_j blocks[c,b,i,j].  Stored as [NC, B, nd] + aggregate ids [NC, B],
    # this replaces the two extra fine matvecs of the balancing form
    # (A (Q r) and Z^T A s = (A Z)^T s, A symmetric) by gathers/segment-sums
    # over an array 1/nd the size of the operator — each preconditioner
    # apply then costs ~2/nd of a matvec instead of 2 full matvecs.
    AZ = jnp.sum(matrix.blocks, axis=-1)  # [NC, B, nd]
    agg_nb = jnp.asarray(
        np.asarray(cell_agg, dtype=np.int64)[np.asarray(matrix.neighbors, dtype=np.int64)]
    )  # [NC, B]
    nd = matrix.nd
    # Diagonal scaling keeps the inversion well-behaved at 1e6 contrast; the
    # explicit inverse turns each coarse apply into one dense [n_agg, n_agg]
    # matvec — MXU-friendly, unlike sequential triangular solves (n_agg ~
    # 2000 => the inversion is a one-off O(n^3) ~ 1e10 flop).  The LU runs
    # in float32 (TPU's LuDecomposition implements only F32/C64); an inexact
    # coarse inverse only weakens the preconditioner slightly, and we
    # symmetrize it so CG's SPD assumption holds.  ``coarse_dtype`` sets the
    # dtype of the scaling/apply arithmetic around it.
    cdt = coarse_dtype or E.dtype
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(E)), 1e-30)).astype(cdt)
    Es = ((E.astype(cdt) / d[:, None]) / d[None, :]).astype(jnp.float32)
    Einv = jnp.linalg.inv(Es)
    # TPU's f32 LU loses digits at high contrast (and its matmuls may run at
    # reduced precision); two Newton-Schulz steps X <- X (2I - Es X) with
    # HIGHEST-precision matmuls square the residual each time, restoring a
    # near-f32-exact inverse at the cost of 4 MXU matmuls (one-off)
    hp = jax.lax.Precision.HIGHEST
    two_eye = 2.0 * jnp.eye(Es.shape[0], dtype=jnp.float32)
    for _ in range(2):
        EX = jnp.matmul(Es, Einv, precision=hp)
        Einv = jnp.matmul(Einv, two_eye - EX, precision=hp)
    Einv = (0.5 * (Einv + Einv.T)).astype(cdt)

    def coarse_solve(rc):
        return ((jnp.matmul(Einv, rc.astype(cdt) / d, precision=hp)) / d).astype(rc.dtype)

    def apply(r):
        rc = jax.ops.segment_sum(r, dof_agg, num_segments=n_agg)  # Z^T r
        yc = coarse_solve(rc)
        qr = yc[dof_agg]  # Z E^-1 Z^T r
        # A Q r via the precomputed A Z
        aqr = jnp.einsum(
            "cbi,cb->ci", AZ, yc[agg_nb], precision=jax.lax.Precision.HIGHEST
        ).reshape(-1)
        s = smoother(r - aqr)
        # Z^T A s = (A Z)^T s (A symmetric)
        sc = s.reshape(-1, nd)
        zas = jax.ops.segment_sum(
            jnp.einsum("cbi,ci->cb", AZ, sc,
                       precision=jax.lax.Precision.HIGHEST).reshape(-1),
            agg_nb.reshape(-1), num_segments=n_agg,
        )
        return qr + s - coarse_solve(zas)[dof_agg]

    return apply


def _coarse_inverse(E: jnp.ndarray, coarse_dtype) -> Callable:
    """Dense symmetrized inverse of the (diagonally scaled) coarse operator;
    shared by the gather- and structured-path preconditioners.  The LU runs
    in f32 (TPU LuDecomposition is F32-only); two Newton-Schulz steps with
    HIGHEST-precision matmuls restore a near-f32-exact inverse."""
    cdt = coarse_dtype or E.dtype
    hp = jax.lax.Precision.HIGHEST
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(E)), 1e-30)).astype(cdt)
    Es = ((E.astype(cdt) / d[:, None]) / d[None, :]).astype(jnp.float32)
    Einv = jnp.linalg.inv(Es)
    two_eye = 2.0 * jnp.eye(Es.shape[0], dtype=jnp.float32)
    for _ in range(2):
        EX = jnp.matmul(Es, Einv, precision=hp)
        Einv = jnp.matmul(Einv, two_eye - EX, precision=hp)
    Einv = (0.5 * (Einv + Einv.T)).astype(cdt)

    def coarse_solve(rc):
        return ((jnp.matmul(Einv, rc.astype(cdt) / d, precision=hp)) / d).astype(rc.dtype)

    return coarse_solve


def structured_deflation_preconditioner(
    matrix,
    order,
    macro_shape,
    smoother: Optional[Callable] = None,
    coarse_dtype=None,
    variant: str = "balanced",
) -> Optional[Callable]:
    """Two-level preconditioner with ALL per-iteration ops regular (reshape
    sums, broadcasts, and StructuredBlockEll slice-matvecs — no gathers or
    scatters, which run ~20x below stream bandwidth on this hardware).

    variant="balanced": M^-1 r = Qr + (I - QA) M_J^-1 (I - AQ) r with the
    A-projections computed as plain matvecs on the broadcast coarse fields
    (Z^T A s = Z^T (A s) since A is symmetric).  variant="additive":
    M^-1 = M_J^-1 + Q (cheaper per iteration, more iterations).
    """
    agg = structured_aggregation(order, macro_shape)
    if agg is None:
        return None
    aggsum, broadcast, cell_agg_new = agg
    n_agg = int(macro_shape[0]) * int(macro_shape[1])
    if smoother is None:
        smoother = block_jacobi_preconditioner(matrix)
    nd = matrix.nd
    E = coarse_operator(matrix, cell_agg_new, n_agg)
    coarse_solve = _coarse_inverse(E, coarse_dtype)

    if variant == "additive":
        def apply_additive(r):
            qr = broadcast(coarse_solve(aggsum(r, nd)), nd)
            return smoother(r) + qr

        return apply_additive

    def apply_balanced(r):
        qr = broadcast(coarse_solve(aggsum(r, nd)), nd)
        s = smoother(r - matrix.matvec(qr))
        zas = aggsum(matrix.matvec(s), nd)
        return qr + s - broadcast(coarse_solve(zas), nd)

    return apply_balanced


def refined_deflated_solve(
    matrix: BlockEllMatrix,
    b: jnp.ndarray,
    cell_agg: np.ndarray,
    n_agg: int,
    tol: float = 1e-6,
    inner_iters: int = 150,
    outer_max: int = 6,
    coarse_dtype=None,
    inner_rtol: float = 1e-5,
    M: Optional[Callable] = None,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed-precision solve of the float32 system (A, b) to a TRUE relative
    residual <= tol, measured in float64.

    float32 deflated PCG converges its recurrence fast but the true residual
    stalls near the f32 matvec rounding floor (~1e-4 at 1e6 contrast), so we
    wrap it in classical iterative refinement: the outer loop accumulates x
    and evaluates r = b - A x in float64 (A's f32 values are exactly
    representable, so this is the exact residual of the stored system); each
    inner solve runs ``inner_iters`` deflated-PCG iterations in float32 on
    the residual equation.  ``inner_iters`` should be large enough to reach
    CG's superlinear phase (restarting too early forfeits it — measured:
    40-iteration sweeps contract only ~3-9x each, while one 150-iteration
    sweep reaches the f32 true-residual floor ~3e-4); two to three such
    sweeps reach 1e-6.  Requires jax_enable_x64.

    Returns (x float64, true relative residual float64).
    """
    f32 = jnp.float32
    if M is None:
        M = deflation_preconditioner(
            matrix, cell_agg, n_agg, coarse_dtype=coarse_dtype or jnp.float64
        )
    A64 = BlockEllMatrix(matrix.neighbors, matrix.blocks.astype(jnp.float64))
    b64 = b.astype(jnp.float64)
    bnorm = jnp.linalg.norm(b64)
    target = tol * jnp.maximum(bnorm, 1e-300)

    def inner(r32):
        # the inner rhs is pre-scaled to ||r32|| = 1, so the recurrence
        # residual IS the relative residual of the correction equation;
        # stopping at inner_rtol (default 1e-5, below the ~3e-4 f32
        # true-residual floor) skips iterations the refinement loop would
        # re-do anyway — the later sweeps converge in far fewer than
        # inner_iters iterations
        x = jnp.zeros_like(r32)
        z = M(r32)
        p = z
        rz = jnp.vdot(r32, z)
        r = r32
        stop2 = jnp.asarray(inner_rtol**2, dtype=f32)

        def cond_i(state):
            x, r, z, p, rz, k = state
            return (jnp.vdot(r, r) > stop2) & (k < inner_iters)

        def one_step(state):
            x, r, z, p, rz, k = state
            ap = matrix.matvec(p)
            pap = jnp.vdot(p, ap)
            # 0/0 guards: with unrolled steps the iteration may continue a
            # few steps past exact convergence (r = p = 0)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z + beta * p
            return x, r, z, p, rz_new, k + 1

        def step(state):
            # ``unroll`` CG steps per while iteration: on this backend every
            # loop iteration costs ~150 us of fixed dispatch overhead
            # regardless of body size, so batching steps amortizes it
            for _ in range(max(1, int(unroll))):
                state = one_step(state)
            return state

        x, r, z, p, rz, k = jax.lax.while_loop(
            cond_i, step, (x, r, z, p, rz, jnp.int32(0))
        )
        return x, k

    def cond(state):
        x, r64, rnorm, k, it = state
        return (rnorm > target) & (k < outer_max)

    def body(state):
        # carry the f64 residual: rnorm == ||r64|| by construction, so each
        # sweep costs one emulated-f64 matvec, not two.  The scale keeps the
        # f32 inner solve seeing O(1) data.
        x, r64, rnorm, k, it = state
        scale = rnorm
        dx, ki = inner((r64 / scale).astype(f32))
        x = x + dx.astype(jnp.float64) * scale
        r64 = b64 - A64.matvec(x)
        rnorm = jnp.linalg.norm(r64)
        return x, r64, rnorm, k + 1, it + ki

    x0 = jnp.zeros_like(b64)
    x, _r, rnorm, k, it = jax.lax.while_loop(
        cond, body, (x0, b64, bnorm, jnp.int32(0), jnp.int32(0))
    )
    return x, rnorm / jnp.maximum(bnorm, 1e-300)
