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
    elif mode in ("dots64", "vec64", "vec64d32", "mv32"):
        # mixed-precision PCG variants isolating WHICH f32 operation drives
        # the 3M iteration blowup:
        #   dots64 — f32 vectors/matvec/M, f64 inner products only
        #   vec64  — f64 vectors & dots, f32 matvec and f32 M
        #   mv32   — like vec64 but ALSO f32-truncated residual updates
        f32, f64 = jnp.float32, jnp.float64
        b_ = B64 / bn
        t0 = time.time()
        if mode == "dots64":
            X = jnp.zeros_like(B)
            R = b_.astype(f32)
            Z = M32(R)
            P = Z
            rz = jnp.vdot(R.astype(f64), Z.astype(f64))
            it = 0
            while it < 6 * inner:
                AP = S.matvec(P)
                pap = float(jnp.vdot(P.astype(f64), AP.astype(f64)))
                alpha = jnp.float32(float(rz) / pap)
                X = X + alpha * P
                R = R - alpha * AP
                if float(jnp.vdot(R.astype(f64), R.astype(f64))) < 1e-12:
                    it += 1
                    break
                Z = M32(R)
                rz_new = jnp.vdot(R.astype(f64), Z.astype(f64))
                beta = jnp.float32(float(rz_new) / float(rz))
                P = Z + beta * P
                rz = rz_new
                it += 1
        else:
            d32 = mode == "vec64d32"  # dots on f32 casts of f64 vectors

            def vd(a, b):
                if d32:
                    return jnp.vdot(a.astype(f32), b.astype(f32))
                return jnp.vdot(a, b)

            X = jnp.zeros_like(b_)
            R = b_
            Z = M32(R.astype(f32)).astype(f64)
            P = Z
            rz = vd(R, Z)
            it = 0
            while it < 6 * inner:
                AP = S.matvec(P.astype(f32)).astype(f64)
                pap = float(vd(P, AP))
                alpha = float(rz) / pap
                X = X + alpha * P
                R = R - alpha * AP
                if mode == "mv32":
                    R = R.astype(f32).astype(f64)
                if float(vd(R, R)) < 1e-12:
                    it += 1
                    break
                Z = M32(R.astype(f32)).astype(f64)
                rz_new = vd(R, Z)
                beta = float(rz_new) / float(rz)
                P = Z + beta * P
                rz = rz_new
                it += 1
        r = float(jnp.linalg.norm(b_ - S64.matvec(X.astype(f64))))
        print(f"{mode}: iters={it} true_rel={r:.3e} "
              f"wall={time.time()-t0:.0f}s", flush=True)
    elif mode == "mvdiff":
        # difference-form matvec: y_i = sum W_ij (x_j - x_i) + x_i rowsum_i.
        # Algebraically identical; numerically the products are O(h grad x)
        # instead of O(x), killing the cancellation amplification (~h^-2)
        # that caps the f32 rate at large sizes.
        from dune_hdd_tpu.la.stencil import stencil_refined_solve

        class DiffMV:
            def __init__(self, Sin):
                self.S = Sin
                self.rs = Sin.planes.sum(axis=(0, 2))  # [nd, 8, KY, KX]

            def matvec(self, Xv):
                Sv = self.S
                fields = Sv.neighbor_fields(Xv)
                acc = []
                for i in range(Sv.nd):
                    t = None
                    for s_ in range(4):
                        for j in range(Sv.nd):
                            c = Sv.planes[s_, i, j] * (fields[s_][j] - Xv[i])
                            t = c if t is None else t + c
                    acc.append(t + Xv[i] * self.rs[i])
                return jnp.stack(acc, axis=0)

            def astype(self, dt):
                return DiffMV(self.S.astype(dt))

        t0 = time.time()
        X, res, it = stencil_refined_solve(
            DiffMV(S), B, M32, tol=1e-6, inner_iters=inner, outer_max=6,
            unroll=1)
        print(f"mvdiff inner={inner}: iters={int(it)} "
              f"true_rel={float(res):.3e} wall={time.time()-t0:.0f}s",
              flush=True)
    else:
        # production scheme: f32 inner sweeps inside f64 refinement, at the
        # given restart cadence; "Nv64" = N outer sweeps with f64 Krylov
        # vectors in the inner PCG (vec_dtype), f32 matvec/M/dots
        from dune_hdd_tpu.la.stencil import stencil_refined_solve

        vdt = None
        if mode.endswith("v64"):
            vdt = jnp.float64
            mode = mode[:-3]
        outer = int(mode)
        t0 = time.time()
        X, res, it = stencil_refined_solve(
            S, B, M32, tol=1e-6, inner_iters=inner, outer_max=outer,
            unroll=1, vec_dtype=vdt)
        tag = "vec64" if vdt is not None else "f32"
        print(f"{tag} inner={inner} outer<={outer}: iters={int(it)} "
              f"true_rel={float(res):.3e} wall={time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
