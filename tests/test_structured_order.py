"""Structured (bandwidth-ordered) numbering: the slice-based SpMV and the
reshape-based macro aggregation must bit-match the gather/segment paths.

Reference analog: none (TPU-specific data layout; the reference's ALUGrid
iteration order is the refinement-tree order, dune-gdt grid walk)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.grid.structured import alu_cube_grid, rectangle_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import (
    BlockEllMatrix,
    StructuredBlockEll,
    block_ell_neighbors,
)
from dune_hdd_tpu.la.deflation import (
    aggregate_map_from_points,
    structured_aggregation,
    structured_deflation_preconditioner,
    deflation_preconditioner,
    refined_deflated_solve,
)


def _random_symmetric_block_ell(grid, nd=3, seed=0):
    rng = np.random.default_rng(seed)
    nbr = block_ell_neighbors(grid)
    nc, B = nbr.shape
    blocks = rng.standard_normal((nc, B, nd, nd))
    blocks[:, 1:] *= 0.1  # keep strictly diagonally dominant -> SPD
    # zero padded/boundary slots (slot points at self)
    for b in range(1, B):
        blocks[nbr[:, b] == np.arange(nc), b] = 0.0
    # symmetrize: A[c,0] spd, A[c,b] = A[n,b']^T
    blocks[:, 0] = blocks[:, 0] + blocks[:, 0].transpose(0, 2, 1) + 8.0 * np.eye(nd)
    for c in range(nc):
        for b in range(1, B):
            n = nbr[c, b]
            if n == c:
                continue
            bn = int(np.nonzero(nbr[n] == c)[0][0])
            blocks[n, bn] = blocks[c, b].T
    return BlockEllMatrix(nbr, jnp.asarray(blocks))


@pytest.mark.parametrize("refs,nxy", [(2, (4, 3)), (4, (5, 2))])
def test_structured_matvec_matches_gather(refs, nxy):
    grid = alu_cube_grid((0.0, 0.0), (2.5, 1.0), nxy, refinements=refs)
    order = structured_cell_order(grid)
    assert order is not None
    A = _random_symmetric_block_ell(grid)
    A_st = StructuredBlockEll.from_block_ell(A, order)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(grid.num_cells * 3))
    y_ref = A.matvec(x)
    nd = 3
    perm_f = (np.asarray(order.perm)[:, None] * nd + np.arange(nd)).reshape(-1)
    inv_f = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    y_st = A_st.matvec(x[inv_f])[perm_f]
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref), rtol=1e-12, atol=1e-12)


def test_unstructured_grid_returns_none():
    g = rectangle_grid((0, 0), (1, 1), (3, 3))  # criss, no bisection reorder
    # odd bisection count -> intermediate (non-axis-aligned-hypotenuse) cells
    from dune_hdd_tpu.grid.structured import bisect

    g_alu = alu_cube_grid((0, 0), (1, 1), (2, 2), refinements=1)
    assert structured_cell_order(g_alu) is None


def test_structured_aggregation_matches_segment_sum():
    macro = (5, 2)
    grid = alu_cube_grid((0.0, 0.0), (2.5, 1.0), macro, refinements=4)
    order = structured_cell_order(grid)
    agg = structured_aggregation(order, macro)
    assert agg is not None
    aggsum, broadcast, cell_agg_new = agg
    cell_agg = aggregate_map_from_points(
        grid.cell_centroids, (0.0, 0.0), (2.5, 1.0), macro
    )
    # cell_agg_new must equal the permuted geometric aggregate map
    perm = np.asarray(order.perm)
    expect = np.empty_like(cell_agg)
    expect[perm] = cell_agg
    np.testing.assert_array_equal(cell_agg_new, expect)
    nd = 3
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(grid.num_cells * nd))
    dof_agg = np.repeat(cell_agg_new, nd)
    rc_ref = jax.ops.segment_sum(r, jnp.asarray(dof_agg), num_segments=10)
    np.testing.assert_allclose(np.asarray(aggsum(r, nd)), np.asarray(rc_ref), rtol=1e-12)
    yc = jnp.asarray(rng.standard_normal(10))
    np.testing.assert_allclose(
        np.asarray(broadcast(yc, nd)), np.asarray(yc)[dof_agg], rtol=1e-15
    )


def test_structured_balanced_preconditioner_matches_gather_path():
    macro = (5, 2)
    grid = alu_cube_grid((0.0, 0.0), (2.5, 1.0), macro, refinements=4)
    order = structured_cell_order(grid)
    A = _random_symmetric_block_ell(grid, seed=3)
    A_st = StructuredBlockEll.from_block_ell(A, order)
    cell_agg = aggregate_map_from_points(
        grid.cell_centroids, (0.0, 0.0), (2.5, 1.0), macro
    )
    n_agg = 10
    M_ref = deflation_preconditioner(A, cell_agg, n_agg)
    M_st = structured_deflation_preconditioner(A_st, order, macro)
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal(grid.num_cells * 3))
    nd = 3
    perm_f = (np.asarray(order.perm)[:, None] * nd + np.arange(nd)).reshape(-1)
    inv_f = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    y_ref = np.asarray(M_ref(r))
    y_st = np.asarray(M_st(r[inv_f])[perm_f])
    np.testing.assert_allclose(y_st, y_ref, rtol=1e-4, atol=1e-6 * np.abs(y_ref).max())


def test_refined_solve_structured_path():
    macro = (5, 2)
    grid = alu_cube_grid((0.0, 0.0), (2.5, 1.0), macro, refinements=4)
    order = structured_cell_order(grid)
    A = _random_symmetric_block_ell(grid, seed=5)
    A32 = BlockEllMatrix(A.neighbors, A.blocks.astype(jnp.float32))
    A_st = StructuredBlockEll.from_block_ell(A32, order)
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.standard_normal(grid.num_cells * 3), dtype=jnp.float32)
    nd = 3
    inv_f = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    M = structured_deflation_preconditioner(A_st, order, macro, coarse_dtype=jnp.float32)
    x, res = refined_deflated_solve(
        A_st, b[inv_f], None, 10, tol=1e-6, inner_iters=200, M=M, unroll=4
    )
    assert float(res) <= 1e-6
