"""Does a diagonal-weighted deflation space fix the SPE10 kappa floor?

The bench path symmetrically scales the system (scale_planes: A -> S A S,
S = D^{-1/2}) and then deflates with piecewise CONSTANTS.  But the physical
near-kernel of A (locally constant functions) maps to D^{1/2} 1 under the
scaling — the constant space misses it entirely on high-contrast
coefficients, which is consistent with the measured kappa(M A) ~ 4e3 at
H/h = 2 (scripts/diag_cheby.py).  Weighted deflation Z_w = diag(1/s) Z
restores the near-kernel.

Compares, per size: kappa(M A) (Lanczos) and PCG iterations to true 1e-6,
unweighted vs weighted, f64 and f32.

Usage: JAX_PLATFORMS=cpu python scripts/diag_weighted_deflation.py \
           [bisections=4] [macro=100,20] [mid=none] [mode=all]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# the axon TPU-tunnel plugin injects itself regardless of JAX_PLATFORMS;
# this diagnostic is a CPU-f64 forensic tool — force CPU explicitly
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
    stencil_deflation_preconditioner, stencil_pcg)
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10, build_structured_assembly,
    precompute_coefficient, scale_planes, structured_rhs)
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL

from diag_cheby import lanczos_bounds  # noqa: E402


def main():
    bis = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    macro = (tuple(int(v) for v in sys.argv[2].split(","))
             if len(sys.argv) > 2 else (100, 20))
    mid_arg = sys.argv[3] if len(sys.argv) > 3 else "none"
    mode = sys.argv[4] if len(sys.argv) > 4 else "all"
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
    if mid_arg == "none":
        mid = None
    elif mid_arg == "auto":
        mid = (KX // 4, KY // 4)
    elif ";" in mid_arg:  # multi-level chain "mx1,my1;mx2,my2"
        mid = [tuple(int(v) for v in p.split(",")) for p in mid_arg.split(";")]
    else:
        mid = tuple(int(v) for v in mid_arg.split(","))
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
        w32 = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-30), 0.0)
        Ms = {}
        Ms["unw32"] = stencil_deflation_preconditioner(
            S, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2)
        Ms["wgt32"] = stencil_deflation_preconditioner(
            S, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2, weight=w32)
    S64 = S.astype(jnp.float64)
    B64 = B.astype(jnp.float64)
    w64 = w32.astype(jnp.float64)
    Ms["unw64"] = stencil_deflation_preconditioner(
        S64, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2)
    Ms["wgt64"] = stencil_deflation_preconditioner(
        S64, macro, newton_schulz=2, mid_shape=mid, mid_cheb=2, weight=w64)
    bn = float(jnp.linalg.norm(B64))
    b64 = B64 / bn
    b32 = (B / jnp.float32(bn)).astype(jnp.float32)

    def true_res(X):
        return float(jnp.linalg.norm(
            b64 - S64.matvec(X.astype(jnp.float64))))

    for name in ("unw64", "wgt64"):
        if mode not in ("all", "kappa", name) and not (
                mode == "kappa-wgt" and name == "wgt64"):
            continue
        t0 = time.time()
        lmin, lmax = lanczos_bounds(S64, Ms[name], b64, k=80)
        print(f"{name}: kappa(M A) = {lmax/lmin:9.1f}  "
              f"[{lmin:.3e}, {lmax:.3e}] ({time.time()-t0:.0f}s)",
              flush=True)
    if mode in ("kappa", "kappa-wgt"):
        return
    for name, Aop, rhs, mi in (("unw64", S64, b64, 3000),
                               ("wgt64", S64, b64, 3000),
                               ("unw32", S, b32, 6000),
                               ("wgt32", S, b32, 6000)):
        if mode not in ("all", name, name[:3]):
            continue
        t0 = time.time()
        X, it = stencil_pcg(Aop, rhs, Ms[name], rtol=1e-6, maxiter=mi,
                            unroll=1)
        print(f"{name}: iters={int(it):5d} true={true_res(X):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
