"""Diagnose the SPE10 converged solve: iterations per refinement sweep,
phase timings, and sensitivity to coarse-inverse quality / smoother.

Usage: python scripts/diag_solver.py [variant ...]
Variants: base ns4 f64coarse cheb2 cheb4 addc
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.bench_harness import build_spe10_bench
from dune_hdd_tpu.functions.spe10 import MODEL1_NX, MODEL1_NZ
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import StructuredBlockEll, block_jacobi_preconditioner
from dune_hdd_tpu.la import deflation as D


def instrumented_solve(A_st, b_st, M, tol=1e-6, inner_iters=150,
                       inner_rtol=1e-5, unroll=4):
    """Like refined_deflated_solve but python-loop outer, reporting
    (iters, true_res) per sweep."""
    f32 = jnp.float32
    from dune_hdd_tpu.la.block_ell import BlockEllMatrix

    A64 = A_st.with_blocks(A_st.blocks.astype(jnp.float64))
    b64 = b_st.astype(jnp.float64)
    bnorm = float(jnp.linalg.norm(b64))

    @jax.jit
    def inner(r32):
        x = jnp.zeros_like(r32)
        z = M(r32)
        p = z
        rz = jnp.vdot(r32, z)
        r = r32
        stop2 = jnp.asarray(inner_rtol ** 2, dtype=f32)

        def cond_i(state):
            x, r, z, p, rz, k = state
            return (jnp.vdot(r, r) > stop2) & (k < inner_iters)

        def one_step(state):
            x, r, z, p, rz, k = state
            ap = A_st.matvec(p)
            pap = jnp.vdot(p, ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z + beta * p
            return x, r, z, p, rz_new, k + 1

        def step(state):
            for _ in range(unroll):
                state = one_step(state)
            return state

        out = jax.lax.while_loop(cond_i, step, (x, r, z, p, rz, jnp.int32(0)))
        return out[0], out[5]

    @jax.jit
    def true_resid(x):
        return b64 - A64.matvec(x)

    x = jnp.zeros_like(b64)
    sweeps = []
    t0 = time.perf_counter()
    for sweep in range(6):
        r64 = true_resid(x)
        rnorm = float(jnp.linalg.norm(r64))
        if rnorm <= tol * bnorm:
            break
        scale = rnorm
        ts = time.perf_counter()
        dx, k = inner((r64 / scale).astype(f32))
        dx.block_until_ready()
        te = time.perf_counter()
        x = x + dx.astype(jnp.float64) * scale
        sweeps.append((int(k), rnorm / bnorm, te - ts))
    rfinal = float(jnp.linalg.norm(true_resid(x))) / bnorm
    total = time.perf_counter() - t0
    return x, rfinal, sweeps, total


def main():
    variants = sys.argv[1:] or ["base"]
    fn, field, num_dofs = build_spe10_bench(bisections=4, preconditioner="deflation")
    # replicate the bench assembly path
    from dune_hdd_tpu.bench_harness import (
        _FORCES, _field_tensor_function)
    import dune_hdd_tpu.bench_harness as BH
    from dune_hdd_tpu.functions.base import (
        ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
    from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
    from dune_hdd_tpu.grid.structured import alu_cube_grid
    from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
    from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
    from dune_hdd_tpu.ops.spaces import dg_space
    from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
    from dune_hdd_tpu.testcases._spe10_channel import CHANNEL

    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=4)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    channel = IndicatorFunction(CHANNEL, name="channel")
    dfac = SumFunction([ConstantFunction(1.0), ScaledFunction(channel, -0.9)])
    tensor = _field_tensor_function(field)

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        t0 = time.perf_counter()
        vol = elliptic_cell_matrices(space, dfac, tensor)
        ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
        A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
        b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
        A, b, s = symmetric_diagonal_scaling(A, b)
        jax.block_until_ready(A.blocks)
        print(f"assembly (eager, incl compile): {time.perf_counter()-t0:.2f}s",
              flush=True)

    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    A_st = StructuredBlockEll.from_block_ell(A, order)
    nd = A.nd
    perm_flat = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    b_st = b[jnp.asarray(perm_flat)]
    macro = (MODEL1_NX, MODEL1_NZ)

    for var in variants:
        if var == "base":
            M = D.structured_deflation_preconditioner(
                A_st, order, macro, coarse_dtype=jnp.float32)
        elif var == "addc":
            M = D.structured_deflation_preconditioner(
                A_st, order, macro, coarse_dtype=jnp.float32, variant="additive")
        elif var == "f64coarse":
            M = D.structured_deflation_preconditioner(
                A_st, order, macro, coarse_dtype=jnp.float64)
        else:
            print(f"unknown variant {var}", flush=True)
            continue
        x, rfinal, sweeps, total = instrumented_solve(A_st, b_st, M)
        iters = sum(k for k, _, _ in sweeps)
        print(f"[{var}] total_iters={iters} sweeps={sweeps} "
              f"final_rel_res={rfinal:.2e} wall={total:.3f}s", flush=True)


if __name__ == "__main__":
    main()
