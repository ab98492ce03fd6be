"""Is a Chebyshev inner iteration immune to the f32 blowup that costs the
inner PCG 3.5x its f64 iteration count at 3M DoF (docs/DESIGN.md round-4
forensics)?

Chebyshev semi-iteration on the deflation-preconditioned operator M*A:
  - no inner products (no f32 dot fragility, no per-iteration scalar sync),
  - a FIXED polynomial: f32 round-off perturbs each iterate locally but does
    not destroy the method the way lost Krylov orthogonality does,
  - needs spectral bounds [lmin, lmax] of M*A: lmax from power iteration,
    lmin from the Lanczos tridiagonal of a short PCG run (Ritz value).

Compares, at a given size, iterations to a true 1e-6 residual:
  CG-f64 | CG-f32 | Cheby-f64 | Cheby-f32      (same M, same operator)

Usage: python scripts/diag_cheby.py [bisections=4] [mode=all] [macro=100,20]
       (CPU by default: set JAX_PLATFORMS=cpu; add mid=auto for 3-level)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.functions.base import (
    ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
from dune_hdd_tpu.functions.spe10 import (MODEL1_NX, MODEL1_NZ,
                                          _synthetic_model1_field)
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.stencil import (
    StencilBlockEll, stencil_deflation_preconditioner, stencil_pcg)
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10, build_structured_assembly,
    precompute_coefficient, scale_planes, structured_rhs)
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


def lanczos_bounds(A, M, B, k=80):
    """(lmin, lmax) Ritz estimates of M*A from k PCG steps' Lanczos
    tridiagonal (alpha/beta recurrence), in f64."""
    X = jnp.zeros_like(B)
    R = B
    Z = M(R)
    P = Z
    rz = jnp.vdot(R, Z)
    alphas, betas = [], []
    beta_prev = 0.0
    alpha_prev = 1.0
    diag, off = [], []
    for i in range(k):
        AP = A.matvec(P)
        pap = jnp.vdot(P, AP)
        alpha = float(rz / pap)
        X = X + alpha * P
        R = R - alpha * AP
        Z = M(R)
        rz_new = jnp.vdot(R, Z)
        beta = float(rz_new / rz)
        # Lanczos tridiagonal from CG coefficients (Saad, Iterative Methods
        # ch. 6.7): T_ii = 1/alpha_i + beta_{i-1}/alpha_{i-1},
        # T_{i,i+1} = sqrt(beta_i)/alpha_i
        diag.append(1.0 / alpha + (beta_prev / alpha_prev))
        off.append(np.sqrt(max(beta, 0.0)) / alpha)
        beta_prev, alpha_prev = beta, alpha
        P = Z + beta * P
        rz = rz_new
    T = np.diag(diag) + np.diag(off[:-1], 1) + np.diag(off[:-1], -1)
    ev = np.linalg.eigvalsh(T)
    return float(ev[0]), float(ev[-1])


def chebyshev(A, M, B, lmin, lmax, maxiter, tol, check_every=50):
    """Preconditioned Chebyshev on A X = B; returns (X, iters).  Classic
    two-term form (Saad alg. 12.1).  Residual checked only every
    `check_every` iterations (there are no per-iteration dots)."""
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    X = jnp.zeros_like(B)
    R = B
    D = (1.0 / theta) * M(R)
    bn2 = float(jnp.vdot(B, B))
    it = 0
    while it < maxiter:
        for _ in range(check_every):
            X = X + D
            R = B - A.matvec(X)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            D = rho_new * rho * D + (2.0 * rho_new / delta) * M(R)
            rho = rho_new
            it += 1
        r2 = float(jnp.vdot(R.astype(jnp.float64), R.astype(jnp.float64)))
        if r2 <= tol * tol * bn2:
            break
    return X, it


def main():
    bis = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    macro = (tuple(int(v) for v in sys.argv[3].split(","))
             if len(sys.argv) > 3 else (100, 20))
    mid_arg = sys.argv[4] if len(sys.argv) > 4 else "none"
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bis)
    binfo = make_boundary_info(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    force = IndicatorFunction([
        ((0.95, 0.30), (1.10, 0.45), 2000.0),
        ((3.00, 0.75), (3.15, 0.90), -1000.0),
        ((4.25, 0.25), (4.40, 0.40), -1000.0)])
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    splan = build_structured_assembly(grid, order, binfo)
    dfac_pre = precompute_coefficient(splan, dfac)
    KY, KX = order.lattice
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    mid = (None if mid_arg == "none"
           else ((KX // 4, KY // 4) if mid_arg == "auto"
                 else tuple(int(v) for v in mid_arg.split(","))))
    print(f"dofs={grid.num_cells*3} lattice=({KY},{KX}) macro={macro} "
          f"mid={mid}", flush=True)

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        ft = field.astype(jnp.float32).T
        cf2d = jnp.broadcast_to(
            ft[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
        ).reshape(KY, KX)
        cf = jnp.broadcast_to(cf2d[None], (8, KY, KX))
        S, B, s = scale_planes(
            assemble_structured_spe10(splan, dfac_pre, cf),
            structured_rhs(splan, force))
        M32 = stencil_deflation_preconditioner(
            S, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2)
    S64 = S.astype(jnp.float64)
    B64 = B.astype(jnp.float64)
    M64 = stencil_deflation_preconditioner(
        S64, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2)
    bn = float(jnp.linalg.norm(B64))
    b64 = B64 / bn
    b32 = (B / jnp.float32(bn)).astype(jnp.float32)

    t0 = time.time()
    lmin, lmax = lanczos_bounds(S64, M64, b64, k=80)
    print(f"Lanczos bounds of M*A: lmin={lmin:.4e} lmax={lmax:.4e} "
          f"kappa={lmax/lmin:.1f} ({time.time()-t0:.0f}s)", flush=True)
    # safety margins: Ritz lmin overestimates the true lmin, lmax slightly
    # underestimates — widen both
    lmin_s, lmax_s = 0.8 * lmin, 1.05 * lmax

    def true_res(X):
        return float(jnp.linalg.norm(
            b64 - S64.matvec(X.astype(jnp.float64))))

    if mode in ("all", "cg64"):
        t0 = time.time()
        X, it = stencil_pcg(S64, b64, M64, rtol=1e-6, maxiter=3000, unroll=1)
        print(f"CG-f64:    iters={int(it):5d} true={true_res(X):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if mode in ("all", "cg32"):
        t0 = time.time()
        X, it = stencil_pcg(S, b32, M32, rtol=1e-6, maxiter=6000, unroll=1)
        print(f"CG-f32:    iters={int(it):5d} true={true_res(X):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if mode in ("all", "ch64"):
        t0 = time.time()
        X, it = chebyshev(S64, M64, b64, lmin_s, lmax_s, 6000, 1e-6)
        print(f"Cheby-f64: iters={int(it):5d} true={true_res(X):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if mode in ("all", "ch32"):
        t0 = time.time()
        X, it = chebyshev(S, M32, b32, lmin_s, lmax_s, 6000, 1e-6)
        print(f"Cheby-f32: iters={int(it):5d} true={true_res(X):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
