"""Variant sweep for the stencil2 solve at large DoF (12M north-star work).

The 12M phase forensics (round 5) showed the wall is split between
iteration count (f32 per-sweep true progress collapses to ~0.65 orders at
12M vs 2.3 at 3M) and M-apply overhead (9.4 ms, dominated by the many small
sequential kernels of the mid/coarse chain — the chip itself reaches
~470 GB/s on large arrays with a ~0.6 ms fixed cost per loop rep, measured
by scripts/diag_bandwidth.py).  This script assembles ONCE (host setup at
12M costs ~12 min, so it is pickle-cached) and times MANY solver variants
in one process.

Usage:
  python scripts/bench_sweep12m.py <bisections> "<variant>" ["<variant>" ...]

Variant syntax (semicolon-joined key=value):
  irtol=1e-3 outer=20 inner=300 mid=800,160+400,80 cheb=2 ns=2 vec=f64
  sym=0 weighted=0
e.g.  "irtol=1e-3;outer=20"  "mid=400,80;cheb=1"
"""
import os
import pickle
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
from dune_hdd_tpu.la.stencil import (
    stencil_deflation_preconditioner, stencil_refined_solve)
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10, scale_planes, structured_rhs)
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL

_FORCE = IndicatorFunction([
    ((0.95, 0.30), (1.10, 0.45), 2000.0),
    ((3.00, 0.75), (3.15, 0.90), -1000.0),
    ((4.25, 0.25), (4.40, 0.40), -1000.0)])


def setup(bis: int):
    cache = f"/tmp/splan_b{bis}.pkl"
    if os.path.exists(cache):
        t0 = time.time()
        with open(cache, "rb") as f:
            splan, dfac_pre, lattice = pickle.load(f)
        print(f"splan cache hit ({time.time()-t0:.0f}s)", flush=True)
        return splan, dfac_pre, lattice
    from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
    from dune_hdd_tpu.grid.structured import alu_cube_grid
    from dune_hdd_tpu.grid.structured_order import structured_cell_order
    from dune_hdd_tpu.la.stencil_assembly import (
        build_structured_assembly, precompute_coefficient)

    t0 = time.time()
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bis)
    binfo = make_boundary_info(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    splan = build_structured_assembly(grid, order, binfo)
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    dfac_pre = precompute_coefficient(splan, dfac)
    lattice = tuple(int(v) for v in order.lattice)
    print(f"splan built ({time.time()-t0:.0f}s); caching", flush=True)
    with open(cache, "wb") as f:
        pickle.dump((splan, dfac_pre, lattice), f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    return splan, dfac_pre, lattice


def parse_variant(spec: str, KY: int, KX: int):
    cfg = {"irtol": 1e-5, "outer": 6, "inner": 300, "cheb": 2, "ns": 2,
           "vec": "f32", "dots": "f32", "sym": 1, "weighted": 1,
           "mid": "800,160+400,80", "unroll": 4}
    for part in spec.split(";"):
        if not part:
            continue
        k, v = part.split("=")
        cfg[k] = v
    mid_arg = str(cfg["mid"])
    if mid_arg == "none":
        mid = None
    else:
        mids = [tuple(int(x) for x in p.split(",")) for p in mid_arg.split("+")]
        mid = mids[0] if len(mids) == 1 else mids
    return cfg, mid


def main():
    bis = int(sys.argv[1])
    variants = sys.argv[2:] or ["irtol=1e-3;outer=20"]
    splan, dfac_pre, (KY, KX) = setup(bis)
    ndofs = 24 * KY * KX // 8 * 8 * 3 // 3  # nd*8*KY*KX = 24*KY*KX
    print(f"lattice=({KY},{KX}) dofs={24*KY*KX}", flush=True)
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    big = {
        "pre": jax.tree.map(jnp.asarray, dfac_pre),
        "qp_x": jnp.asarray(splan.vol_qp[..., 0], dtype=jnp.float32),
        "qp_y": jnp.asarray(splan.vol_qp[..., 1], dtype=jnp.float32),
    }

    @jax.jit
    def asm(field, big):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            ft = field.astype(jnp.float32).T
            cf2d = jnp.broadcast_to(
                ft[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
            ).reshape(KY, KX)
            cf = jnp.broadcast_to(cf2d[None], (8, KY, KX))
            S = assemble_structured_spe10(splan, big["pre"], cf)
            B = structured_rhs(splan, _FORCE, qp_xy=(big["qp_x"], big["qp_y"]))
            return scale_planes(S, B)

    t0 = time.time()
    S, B, s = asm(field, big)
    jax.block_until_ready(s)
    print(f"assembled ({time.time()-t0:.0f}s)", flush=True)

    macro = (MODEL1_NX, MODEL1_NZ)
    for spec in variants:
        cfg, mid = parse_variant(spec, KY, KX)

        def solve(S, B, s):
            with jax.enable_x64(False):
                weight = (1.0 / s) if str(cfg["weighted"]) == "1" else None
                A = S.symmetrized() if str(cfg["sym"]) == "1" else S
                if cfg.get("pc2") == "mg":
                    from dune_hdd_tpu.la.stencil_multigrid import (
                        stencil_multigrid_preconditioner)

                    M = stencil_multigrid_preconditioner(
                        A, newton_schulz=int(cfg["ns"]))
                else:
                    M = stencil_deflation_preconditioner(
                        A, macro, newton_schulz=int(cfg["ns"]), mid_shape=mid,
                        mid_cheb=int(cfg["cheb"]), weight=weight)
            return stencil_refined_solve(
                A, B, M, tol=1e-6, inner_iters=int(cfg["inner"]),
                inner_rtol=float(cfg["irtol"]),
                outer_max=int(cfg["outer"]), unroll=int(cfg["unroll"]),
                dot_dtype=(jnp.float64 if cfg["dots"] == "f64" else None),
                vec_dtype=(jnp.float64 if cfg["vec"] == "f64" else None))

        sj = jax.jit(solve)
        try:
            t0 = time.time()
            X, res, iters = sj(S, B, s)
            float(res)
            tc = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                X, res, iters = sj(S, B, s)
                float(res)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            print(f"{spec:48s} {dt*1e3:9.1f} ms  iters={int(iters):5d} "
                  f"res={float(res):.2e}  (compile+first {tc:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - keep sweeping
            print(f"{spec:48s} FAILED: {exc}", flush=True)


if __name__ == "__main__":
    main()
