"""Two-level deflation preconditioning on the high-contrast SPE10 system
(la/deflation.py): aggregation coarse space aligned with the 100x20 macro
permeability grid; mixed-precision iterative refinement reaches a TRUE
float64 relative residual <= 1e-6 with a float32 fine-grid iteration —
the contrast-robust analog of the reference's AMG/SuperLU solver options
(discretizations/base.hh:327-367)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.bench_harness import _FORCES, _field_tensor_function
from dune_hdd_tpu.functions.base import (
    ConstantFunction,
    IndicatorFunction,
    ScaledFunction,
    SumFunction,
)
from dune_hdd_tpu.functions.spe10 import _synthetic_model1_field
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.la.block_ell import (
    BlockEllMatrix,
    block_cg,
    build_block_ell,
    symmetric_diagonal_scaling,
)
from dune_hdd_tpu.la.deflation import (
    aggregate_map_from_points,
    coarse_operator,
    deflation_preconditioner,
    refined_deflated_solve,
)
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


@pytest.fixture(scope="module")
def spe10_system():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=0)
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(bi.dirichlet_faces)[0]
    dfac = SumFunction([ConstantFunction(1.0), ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    tensor = _field_tensor_function(jnp.asarray(_synthetic_model1_field()))
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
    A_s, b_s, s = symmetric_diagonal_scaling(A, b)
    cell_agg = aggregate_map_from_points(grid.cell_centroids, (0, 0), (5, 1), (100, 20))
    return grid, A_s, b_s, cell_agg


def test_coarse_operator_galerkin(spe10_system):
    """E == Z^T A Z against an explicit dense computation."""
    grid, A_s, b_s, cell_agg = spe10_system
    n_agg = 2000
    E = np.asarray(coarse_operator(A_s, cell_agg, n_agg))
    # dense check on a subset of aggregate pairs
    nd = A_s.nd
    dof_agg = np.repeat(cell_agg, nd)
    rng = np.random.default_rng(0)
    for a in rng.integers(0, n_agg, 5):
        za = (dof_agg == a).astype(np.float64)
        Aza = np.asarray(A_s.matvec(jnp.asarray(za)))
        for bb_ in rng.integers(0, n_agg, 5):
            zb = (dof_agg == bb_).astype(np.float64)
            assert E[bb_, a] == pytest.approx(float(zb @ Aza), rel=1e-10, abs=1e-12)


def test_deflated_cg_converges_fast(spe10_system):
    """Deflation cuts the 1e6-contrast iteration count by ~an order of
    magnitude vs block-Jacobi CG (measured 1180 -> 122 at 48k DoF)."""
    grid, A_s, b_s, cell_agg = spe10_system
    M = deflation_preconditioner(A_s, cell_agg, 2000)
    x, res = block_cg(A_s, b_s, tol=1e-8, maxiter=150, M=M)
    assert float(res) <= 1e-8


@pytest.mark.slow
def test_refined_deflated_solve_true_residual(spe10_system):
    """float32 fine iteration + float64 refinement reaches a TRUE 1e-6."""
    grid, A_s, b_s, cell_agg = spe10_system
    A32 = BlockEllMatrix(A_s.neighbors, A_s.blocks.astype(jnp.float32))
    b32 = b_s.astype(jnp.float32)
    x, relres = refined_deflated_solve(A32, b32, cell_agg, 2000, tol=1e-6,
                                       inner_iters=40, outer_max=10)
    assert float(relres) <= 1e-6
    # verify independently in float64
    A64 = BlockEllMatrix(A_s.neighbors, A32.blocks.astype(jnp.float64))
    r = b32.astype(jnp.float64) - A64.matvec(x)
    true = float(jnp.linalg.norm(r) / jnp.linalg.norm(b32.astype(jnp.float64)))
    assert true <= 1.5e-6
