"""Plane-layout aggregation multigrid (la/stencil_multigrid.py) — the
round-4 rebuild of the BlockEll-gather V-cycle that measured 475x off
(ROADMAP r3 section 11): roll/reshape-only transfer, band-stencil coarse
operators, symmetric V(1,1)."""
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
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
from dune_hdd_tpu.la.stencil import (
    StencilBlockEll,
    soa_index_maps,
    stencil_refined_solve,
)
from dune_hdd_tpu.la.stencil_multigrid import stencil_multigrid_preconditioner
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


@pytest.fixture(scope="module")
def spe10_system():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=2)
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(bi.dirichlet_faces)[0]
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    tensor = _field_tensor_function(jnp.asarray(_synthetic_model1_field()))
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
    A_s, b_s, _ = symmetric_diagonal_scaling(A, b)
    A32 = A_s.with_blocks(A_s.blocks.astype(jnp.float32))
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    S = StencilBlockEll.from_block_ell(A32, order)
    KY, KX = order.lattice
    maps = soa_index_maps(order, 3)
    B = b_s.astype(jnp.float32)[jnp.asarray(maps.to_soa)].reshape(3, 8, KY, KX)
    return S, B


def test_vcycle_is_symmetric(spe10_system):
    """<M r, s> == <r, M s> — required for use inside PCG."""
    S, B = spe10_system
    # force a real band hierarchy (lattice 20x100 -> 10x50 -> stop)
    M = stencil_multigrid_preconditioner(S, coarsest_max=512)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(B.shape), jnp.float32)
    s = jnp.asarray(rng.standard_normal(B.shape), jnp.float32)
    lhs = float(jnp.vdot(M(r), s))
    rhs = float(jnp.vdot(r, M(s)))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), abs(rhs)), (lhs, rhs)


def test_vcycle_pcg_converges_on_spe10(spe10_system):
    """PCG with the V-cycle preconditioner reaches a true 1e-6 residual on
    the 1e6-contrast SPE10 system (f32 work + f64 refinement)."""
    S, B = spe10_system
    M = stencil_multigrid_preconditioner(S)
    X, res, iters = stencil_refined_solve(S, B, M, tol=1e-6, inner_iters=300)
    assert float(res) <= 1e-6, (float(res), int(iters))
    assert bool(jnp.all(jnp.isfinite(X)))
