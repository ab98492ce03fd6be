"""Is the 3M-DoF iteration blowup (1500 vs 450 at 768k, same H/h) caused by
f32 round-off in the inner PCG, or by a genuine two-level rate degradation?

Runs the stencil solve at a given size ENTIRELY in f64 on CPU (inner PCG,
operator, preconditioner application) and reports iteration counts.  If f64
recovers the 768k-like count, the fix is precision engineering (restart
cadence, compensated dots); if not, the coarse space itself must improve.

Usage: JAX_PLATFORMS=cpu python scripts/diag_3m_precision.py [bisections=8]
       [inner=300] [macro=200,40] [mid=none]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
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


def main():
    bis = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    macro = (tuple(int(v) for v in sys.argv[3].split(","))
             if len(sys.argv) > 3 else (200, 40))
    mid_arg = sys.argv[4] if len(sys.argv) > 4 else "none"
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bis)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
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
           else tuple(int(v) for v in mid_arg.split(",")))
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

    # f64 copies of operator + preconditioner internals: rebuild the
    # preconditioner from an f64 operator so every internal tensor is f64
    S64 = S.astype(jnp.float64)
    B64 = B.astype(jnp.float64)
    M64 = stencil_deflation_preconditioner(
        S64, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2)

    bn = float(jnp.linalg.norm(B64))
    mode = sys.argv[5] if len(sys.argv) > 5 else "f64"

    if mode in ("f64", "f64m32", "f32m64"):
        # factorial experiment: inner-PCG dtype x preconditioner dtype
        A_ = S64 if mode != "f32m64" else S
        b_ = (B64 / bn) if mode != "f32m64" else (B / jnp.float32(bn))
        M_ = {"f64": M64, "f64m32": M32,
              "f32m64": (lambda R: M64(R.astype(jnp.float64))
                         .astype(jnp.float32))}[mode]
        t0 = time.time()
        X, it = stencil_pcg(A_, b_, M_, rtol=1e-6, maxiter=6 * inner,
                            unroll=1)
        r = float(jnp.linalg.norm(B64 / bn - S64.matvec(X.astype(jnp.float64))))
        print(f"{mode} inner: iters={int(it)} true_rel={r:.3e} "
              f"wall={time.time()-t0:.0f}s", flush=True)
    else:
        # production scheme: f32 inner sweeps inside f64 refinement, at the
        # given restart cadence
        from dune_hdd_tpu.la.stencil import stencil_refined_solve

        outer = int(mode)
        t0 = time.time()
        X, res, it = stencil_refined_solve(
            S, B, M32, tol=1e-6, inner_iters=inner, outer_max=outer,
            unroll=1)
        print(f"f32 inner={inner} outer<={outer}: iters={int(it)} "
              f"true_rel={float(res):.3e} wall={time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
