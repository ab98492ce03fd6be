"""In-context ablation of the fused stencil2 program: the same jit program
truncated after successive stages.  Differences = true in-fused phase costs
(standalone phase timings proved misleading)."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")

from dune_hdd_tpu.functions.base import (
    ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
from dune_hdd_tpu.functions.spe10 import (MODEL1_NX, MODEL1_NZ,
                                          _synthetic_model1_field)
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.stencil import (
    stencil_deflation_preconditioner, stencil_pcg, stencil_refined_solve)
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10, build_structured_assembly, scale_planes,
    structured_rhs)
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


def timed(tag, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for k in range(n):
        args2 = tuple(a * (1.0 + 1e-6 * (k + 1)) if hasattr(a, "dtype") else a
                      for a in args)
        for a in args2:
            np.asarray(a)
        t0 = time.perf_counter()
        out = f(*args2)
        # scalar fetch = reliable sync through the axon tunnel
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag:36s} {np.median(ts)*1e3:8.2f} ms", flush=True)


def main():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=4)
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
    KY, KX = order.lattice
    cent = grid.cell_centroids
    ij = np.clip((cent / np.array([5.0, 1.0]) * np.array([MODEL1_NX, MODEL1_NZ]))
                 .astype(np.int64), 0, np.array([MODEL1_NX - 1, MODEL1_NZ - 1]))
    ij_soa = jnp.asarray(ij[np.asarray(order.inv)].reshape(8, KY, KX, 2))
    macro = (MODEL1_NX, MODEL1_NZ)

    def _asm(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            cf = field.astype(jnp.float32)[ij_soa[..., 0], ij_soa[..., 1]]
            S = assemble_structured_spe10(splan, dfac, cf)
            B = structured_rhs(splan, force)
            return scale_planes(S, B)

    @jax.jit
    def stage_a(field):
        S, B, s = _asm(field)
        return S.planes.sum(), B.sum()

    @jax.jit
    def stage_b(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            S, B, s = _asm(field)
            M = stencil_deflation_preconditioner(S, macro, newton_schulz=2)
            return M(B).sum()

    @jax.jit
    def stage_c(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            S, B, s = _asm(field)
            M = stencil_deflation_preconditioner(S, macro, newton_schulz=2)
            X, it = stencil_pcg(S, B / jnp.linalg.norm(B), M, rtol=1e-5,
                                maxiter=150, unroll=8)
            return X.sum(), it

    @jax.jit
    def stage_d(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            S, B, s = _asm(field)
            M = stencil_deflation_preconditioner(S, macro, newton_schulz=2)
        X, res, it = stencil_refined_solve(S, B, M, tol=1e-6,
                                           inner_iters=150, unroll=8)
        return X.sum(), res, it

    timed("A: assembly only", stage_a, field)
    timed("B: + precond build + 1 apply", stage_b, field)
    timed("C: + one 150-iter f32 sweep", stage_c, field)
    timed("D: + full f64-refined solve", stage_d, field)


if __name__ == "__main__":
    main()
