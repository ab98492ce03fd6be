"""Microbenchmark: structured SWIPDG SpMV variants on the real chip.

Variants:
  gather   — BlockEllMatrix.matvec ([NC,B,nd] row gather + einsum)
  slices   — StructuredBlockEll.matvec (24 static slices + einsum)
  stencil  — SoA plane-major: vectors live as [nd, 8, KY, KX] (lattice dims
             minor => dense sublane/lane tiling), neighbour access is 24
             small 2-axis rolls, FMA core is 36 fused elementwise ops.
  roofline — one pass over the block planes (sum) = stream bound.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jax_cache python scripts/bench_spmv_variants.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")

from dune_hdd_tpu.bench_harness import build_spe10_bench  # noqa: F401  (pulls deps)
from dune_hdd_tpu.functions.spe10 import MODEL1_NX, MODEL1_NZ, _synthetic_model1_field
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import StructuredBlockEll


def build_matrix(bisections=4):
    import os

    from dune_hdd_tpu.functions.base import (
        ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
    from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
    from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
    from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
    from dune_hdd_tpu.ops.spaces import dg_space
    from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
    from dune_hdd_tpu.testcases._spe10_channel import CHANNEL
    from dune_hdd_tpu.bench_harness import _field_tensor_function, _FORCES

    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=bisections)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    channel = IndicatorFunction(CHANNEL, name="channel")
    dfac = SumFunction([ConstantFunction(1.0), ScaledFunction(channel, -0.9)])
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    tensor = _field_tensor_function(field)
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
    A, b, s = symmetric_diagonal_scaling(A, b)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    return grid, A, b, order


def stencil_plan(order):
    """Per (subclass k, slot s): (k_src, dy, dx) such that the slot-s
    neighbour field of subclass k is roll2d(X[k_src], -dy, -dx); differences
    vs the flat-offset semantics only hit zero-block (boundary) entries."""
    KY, KX = order.lattice
    L = KY * KX
    NC = order.num_cells
    plan = []
    for k in range(8):
        row = []
        for s in range(3):
            o = int(order.offsets[k][s]) % NC
            oc = ((o + NC // 2) % NC) - NC // 2  # centered
            dk = int(np.round(oc / L))
            r = oc - dk * L
            dy = int(np.round(r / KX))
            dx = r - dy * KX
            assert abs(dy) <= 2 and abs(dx) <= 2, (k, s, oc, dk, dy, dx)
            row.append(((k + dk) % 8, dy, dx))
        plan.append(row)
    return plan


def make_stencil(A_st, order, mode="loop"):
    KY, KX = order.lattice
    nd = A_st.nd
    plan = stencil_plan(order)
    # W[s, i, j, 8, KY, KX]
    W = jnp.asarray(
        np.moveaxis(
            np.asarray(A_st.blocks, np.float32).reshape(8, KY, KX, 4, nd, nd),
            (3, 4, 5), (0, 1, 2),
        )
    )

    def matvec(W, X):  # X [nd, 8, KY, KX]
        # neighbour fields per slot: F[s] [nd, 8, KY, KX]
        fields = [X]
        for s in range(3):
            per_k = []
            for k in range(8):
                ks, dy, dx = plan[k][s]
                per_k.append(jnp.roll(X[:, ks], shift=(-dy, -dx), axis=(1, 2)))
            fields.append(jnp.stack(per_k, axis=1))
        if mode == "loop":
            acc = [None] * nd
            for i in range(nd):
                t = None
                for s in range(4):
                    for j in range(nd):
                        c = W[s, i, j] * fields[s][j]
                        t = c if t is None else t + c
                acc[i] = t
            return jnp.stack(acc, axis=0)
        F = jnp.stack(fields, axis=0)  # [4, nd, 8, KY, KX]
        return (W * F[:, None]).sum(axis=(0, 2))

    return matvec, W


def to_soa(order, x_flat, nd):
    KY, KX = order.lattice
    xc = np.asarray(x_flat).reshape(-1, nd)[np.asarray(order.inv)]
    return jnp.asarray(xc.T.reshape(nd, 8, KY, KX))


def from_soa(order, X):
    nd = X.shape[0]
    xc = np.asarray(X).reshape(nd, -1).T  # [NC, nd] new order
    return xc[np.asarray(order.perm)].reshape(-1)


def timeit(f, *args, n=50):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n


def timeit_chained(step, x0, *args, n=100):
    """Time ``n`` self-composed applications INSIDE one jit: removes the
    per-dispatch tunnel overhead that dominates sub-ms kernels here."""

    @jax.jit
    def chain(x, *a):
        def body(_, x):
            return step(x, *a)
        return jax.lax.fori_loop(0, n, body, x)

    y = chain(x0, *args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chain(x0, *args)
    jax.block_until_ready(y)
    dt1 = time.perf_counter() - t0
    return dt1 / n


def main():
    grid, A, b, order = build_matrix()
    nc, nd = A.num_cells, A.nd
    print(f"NC={nc} nd={nd} lattice={order.lattice}", flush=True)
    A_st = StructuredBlockEll.from_block_ell(A, order)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(nc * nd), dtype=jnp.float32)

    y_ref = np.asarray(A.matvec(x))

    # permuted flat vector for the structured variants
    perm_flat = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    x_st = x[jnp.asarray(perm_flat)]
    back = (np.asarray(order.perm)[:, None] * nd + np.arange(nd)).reshape(-1)
    y_st = np.asarray(A_st.matvec(x_st))[back]
    print("slices max err:", np.abs(y_st - y_ref).max() / np.abs(y_ref).max(), flush=True)

    mv_loop, W = make_stencil(A_st, order, "loop")
    mv_sum, _ = make_stencil(A_st, order, "sum")
    X = to_soa(order, x, nd)
    Y = np.asarray(jax.jit(mv_loop)(W, X))
    y_soa = from_soa(order, Y)
    print("stencil max err:", np.abs(y_soa - y_ref).max() / np.abs(y_ref).max(), flush=True)

    bytes_blocks = nc * 4 * nd * nd * 4

    # chained (in-graph) timing: step(x) -> x so fori_loop can self-compose
    from dune_hdd_tpu.la.stencil import (
        StencilBlockEll, jacobi_smoother, chebyshev_smoother,
        stencil_deflation_preconditioner)

    S = StencilBlockEll.from_block_ell(A, order)
    Mdef = stencil_deflation_preconditioner(S, (100, 20))
    Mdef_mv = stencil_deflation_preconditioner(S, (100, 20), use_az=False)
    jac = jacobi_smoother(S)

    cases = [
        ("gather", lambda x, A: A.matvec(x) * 0.5, x, (A,)),
        ("slices", lambda x, A: A.matvec(x) * 0.5, x_st, (A_st,)),
        ("stencil-loop", lambda X, W: mv_loop(W, X) * 0.5, X, (W,)),
        ("stencil-sum", lambda X, W: mv_sum(W, X) * 0.5, X, (W,)),
        ("roofline-copy", lambda W: W * 0.999999, W, ()),
        ("jacobi", lambda X, S: jac(X), X, (S,)),
        ("deflation-az", lambda X, S: Mdef(X) * 0.5, X, (S,)),
        ("deflation-mv", lambda X, S: Mdef_mv(X) * 0.5, X, (S,)),
    ]
    for name, f, x0, args in cases:
        try:
            dt = timeit_chained(f, x0, *args)
            nbytes = (2 * W.size * 4) if name == "roofline-copy" else bytes_blocks
            print(f"{name:14s} {dt*1e3:8.3f} ms  {nbytes/dt/1e9:7.2f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
