"""Phase breakdown of the 3-level stencil2 bench at large sizes.

Usage: python scripts/bench_phases_3lvl.py [bisections=8] [inner=300] [cheb=2]
         [macro=100,20] [mid=auto|none|mx,my] [ns=2]

Times assembly and the preconditioner-build + refined solve separately and
reports the inner-iteration count, so the per-iteration cost at 3M DoF can be
read off (the full bench reports only the end-to-end wall).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
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
    stencil_deflation_preconditioner, stencil_refined_solve)
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10, build_structured_assembly,
    precompute_coefficient, scale_planes, structured_rhs)
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


def timed(tag, f, *args, n=3):
    out = f(*args)
    jax.block_until_ready(out)
    # sync via a scalar fetch of the last leaf (tunnel-honest)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(jnp.asarray(leaf).ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.asarray(leaf).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag:40s} {np.median(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    bis = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cheb = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    macro_arg = sys.argv[4] if len(sys.argv) > 4 else None
    mid_arg = sys.argv[5] if len(sys.argv) > 5 else "auto"
    ns = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    symmv = os.environ.get("PH_SYMMV", "0") == "1"
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bis)
    print(f"bisections={bis} cells={grid.num_cells} dofs={grid.num_cells*3} "
          f"inner={inner} cheb={cheb} symmv={symmv}", flush=True)
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
    macro = (tuple(int(v) for v in macro_arg.split(","))
             if macro_arg else (MODEL1_NX, MODEL1_NZ))
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    if mid_arg == "auto":
        mid = (KX // 4, KY // 4) if min(fx, fy) >= 8 else None
    elif mid_arg == "none":
        mid = None
    elif ";" in mid_arg:
        mid = [tuple(int(v) for v in part.split(","))
               for part in mid_arg.split(";")]
    else:
        mid = tuple(int(v) for v in mid_arg.split(","))
    print(f"lattice=({KY},{KX}) macro={macro} mid={mid} ns={ns}", flush=True)

    # O(N) setup arrays as jit ARGUMENTS, not baked HLO literals (the 12M
    # remote-compile request otherwise overflows: HTTP 413 — same fix as
    # bench_harness commit 336c154)
    big = {
        "pre": jax.tree.map(jnp.asarray, dfac_pre),
        "qp_x": jnp.asarray(splan.vol_qp[..., 0], dtype=jnp.float32),
        "qp_y": jnp.asarray(splan.vol_qp[..., 1], dtype=jnp.float32),
    }

    @jax.jit
    def _asm_impl(field, big):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            ft = field.astype(jnp.float32).T
            cf2d = jnp.broadcast_to(
                ft[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
            ).reshape(KY, KX)
            cf = jnp.broadcast_to(cf2d[None], (8, KY, KX))
            S = assemble_structured_spe10(splan, big["pre"], cf)
            B = structured_rhs(splan, force, qp_xy=(big["qp_x"], big["qp_y"]))
            return scale_planes(S, B)

    def asm(field):
        return _asm_impl(field, big)

    weighted = os.environ.get("PH_WEIGHTED", "1") == "1"

    @jax.jit
    def solve(S, B, s):
        with jax.enable_x64(False):
            weight = (1.0 / s) if weighted else None
            if symmv:
                S = S.symmetrized()
            M = stencil_deflation_preconditioner(
                S, macro, newton_schulz=ns, mid_shape=mid, mid_cheb=cheb,
                weight=weight)
        return stencil_refined_solve(
            S, B, M, tol=1e-6, inner_iters=inner,
            inner_rtol=float(os.environ.get("PH_IRTOL", "1e-5")),
            outer_max=int(os.environ.get("PH_OUTER", "6")),
            unroll=4,
            dot_dtype=(jnp.float64 if os.environ.get("PH_DOTS", "f32") == "f64"
                       else None),
            vec_dtype=(jnp.float64 if os.environ.get("PH_VEC", "f32") == "f64"
                       else None))

    @jax.jit
    def mv(S, X):
        return S.matvec(X)

    @jax.jit
    def mbuild(S, B, s):
        with jax.enable_x64(False):
            weight = (1.0 / s) if weighted else None
            if symmv:
                S = S.symmetrized()
            M = stencil_deflation_preconditioner(
                S, macro, newton_schulz=ns, mid_shape=mid, mid_cheb=cheb,
                weight=weight)
            return M(B)

    @jax.jit
    def mapply(S, B, s, reps: int = 10):
        with jax.enable_x64(False):
            weight = (1.0 / s) if weighted else None
            if symmv:
                S = S.symmetrized()
            M = stencil_deflation_preconditioner(
                S, macro, newton_schulz=ns, mid_shape=mid, mid_cheb=cheb,
                weight=weight)
            import jax.lax as lax

            def body(_, Y):
                return M(Y)

            return lax.fori_loop(0, 50, body, B)

    S, B, s = timed("assembly (direct planes + scale)", asm, field)
    X0 = jnp.zeros_like(B)
    timed("matvec x1", mv, S, X0 + 1.0)
    if symmv:
        Ssym = S.symmetrized()
        timed("matvec x1 (sym)", mv, Ssym, X0 + 1.0)
    t0 = timed("precond build + 1 apply", mbuild, S, B, s)
    timed("precond build + 50 applies", mapply, S, B, s)
    out = timed("precond build + refined solve", solve, S, B, s)
    X, res, iters = out
    print(f"  iters={int(iters)} res={float(res):.2e}", flush=True)


if __name__ == "__main__":
    main()
