#!/usr/bin/env python
"""Sweep-by-sweep refined-PCG behaviour, weighted vs unweighted deflation.

The 768k on-chip bench REGRESSED 2x with the weighted space (292 vs 147 ms)
although single-sweep iteration counts improve.  This prints, per outer
restart sweep: inner iterations taken, recurrence exit reason, and TRUE f64
relative residual — for both spaces, at a given size.

Usage: JAX_PLATFORMS=cpu python scripts/diag_weighted_sweeps.py [bis] [inner]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

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
from dune_hdd_tpu.bench_harness import _FORCES, _select_mid_level


def main():
    bis = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    macro = (100, 20)
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bis)
    binfo = make_boundary_info(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    force = IndicatorFunction(_FORCES)
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    splan = build_structured_assembly(grid, order, binfo)
    dfac_pre = precompute_coefficient(splan, dfac)
    KY, KX = order.lattice
    mid, mid_cheb = _select_mid_level(KY, KX, macro)
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    print(f"dofs={grid.num_cells*3} lattice=({KY},{KX}) mid={mid} "
          f"inner={inner}", flush=True)

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        ft = field.T
        cf2d = jnp.broadcast_to(
            ft[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
        ).reshape(KY, KX)
        cf = jnp.broadcast_to(cf2d[None], (8, KY, KX))
        S, B, s = scale_planes(
            assemble_structured_spe10(splan, dfac_pre, cf),
            structured_rhs(splan, force))
        w = 1.0 / s
        Ms = {
            "unw": stencil_deflation_preconditioner(
                S, macro, newton_schulz=2, mid_shape=mid, mid_cheb=mid_cheb),
            "wgt": stencil_deflation_preconditioner(
                S, macro, newton_schulz=2, mid_shape=mid, mid_cheb=mid_cheb,
                weight=w),
        }
    S64 = S.astype(jnp.float64)
    B64 = B.astype(jnp.float64)
    bn64 = jnp.linalg.norm(B64)

    for name, M in Ms.items():
        X64 = jnp.zeros_like(B64)
        print(f"--- {name}", flush=True)
        t0 = time.time()
        total = 0
        for sweep in range(8):
            R64 = B64 - S64.matvec(X64)
            rel = float(jnp.linalg.norm(R64) / bn64)
            print(f"  sweep {sweep}: true rel={rel:.3e} "
                  f"(cum iters {total}, {time.time()-t0:.0f}s)", flush=True)
            if rel <= 1e-6:
                break
            rn = jnp.linalg.norm(R64)
            with jax.enable_x64(False):
                D, it = stencil_pcg(S, (R64 / rn).astype(jnp.float32), M,
                                    rtol=1e-6, maxiter=inner, unroll=1)
            total += int(it)
            X64 = X64 + rn * D.astype(jnp.float64)
        print(f"  total inner iters {total}", flush=True)


if __name__ == "__main__":
    main()
