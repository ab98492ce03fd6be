"""Direct-to-planes structured SWIPDG assembly (la/stencil_assembly.py):
must reproduce the general assembly path (ops/assembly + ops/swipdg +
block-ELL + permute) to floating-point reassociation on the SPE10 system,
including rhs and diagonal scaling."""
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
from dune_hdd_tpu.functions.spe10 import (
    MODEL1_NX,
    MODEL1_NZ,
    _synthetic_model1_field,
)
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
from dune_hdd_tpu.la.stencil import StencilBlockEll, soa_index_maps
from dune_hdd_tpu.la.stencil_assembly import (
    assemble_structured_spe10,
    build_structured_assembly,
    geometric_soa_maps,
    scale_planes,
    structured_rhs,
)
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


@pytest.fixture(scope="module")
def setup():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=2)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    dfac = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    field = jnp.asarray(_synthetic_model1_field())
    return grid, binfo, space, order, dfac, field


def _cell_field_soa(grid, order, field):
    cent = grid.cell_centroids
    ij = np.clip(
        (cent / np.array([5.0, 1.0]) * np.array([MODEL1_NX, MODEL1_NZ]))
        .astype(np.int64), 0, np.array([MODEL1_NX - 1, MODEL1_NZ - 1]))
    vals = np.asarray(field)[ij[:, 0], ij[:, 1]]
    KY, KX = order.lattice
    return jnp.asarray(vals[np.asarray(order.inv)].reshape(8, KY, KX))


def test_planes_match_general_path(setup):
    grid, binfo, space, order, dfac, field = setup
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    tensor = _field_tensor_function(field)
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    S_ref = StencilBlockEll.from_block_ell(A, order)

    plan = build_structured_assembly(grid, order, binfo, side_eps=1e-7)
    cf = _cell_field_soa(grid, order, field)
    S_new = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64)
    scale = float(jnp.abs(S_ref.planes).max())
    np.testing.assert_allclose(
        np.asarray(S_new.planes), np.asarray(S_ref.planes),
        rtol=0, atol=1e-12 * scale)


def test_rhs_and_scaling_match(setup):
    grid, binfo, space, order, dfac, field = setup
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    tensor = _field_tensor_function(field)
    force = IndicatorFunction(_FORCES)
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, force).reshape(-1)
    A_s, b_s, s = symmetric_diagonal_scaling(A, b)
    S_ref = StencilBlockEll.from_block_ell(A_s, order)
    maps = soa_index_maps(order, 3)
    KY, KX = order.lattice
    B_ref = b_s[jnp.asarray(maps.to_soa)].reshape(3, 8, KY, KX)

    plan = build_structured_assembly(grid, order, binfo, side_eps=1e-7)
    cf = _cell_field_soa(grid, order, field)
    S0 = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64)
    B0 = structured_rhs(plan, force, dtype=jnp.float64)
    S_new, B_new, s_new = scale_planes(S0, B0)
    scale = float(jnp.abs(S_ref.planes).max())
    np.testing.assert_allclose(
        np.asarray(S_new.planes), np.asarray(S_ref.planes),
        rtol=0, atol=1e-12 * scale)
    np.testing.assert_allclose(
        np.asarray(B_new), np.asarray(B_ref), rtol=1e-10,
        atol=1e-12 * float(jnp.abs(B_ref).max()))


@pytest.mark.slow
def test_matvec_equivalence_at_bisections4():
    """At 4 bisections cells within a subclass have VARYING vertex storage
    orders (refinement history); the role-enumerated assembly + geometric
    index maps must still reproduce the general operator as a linear map
    (regression for the dof-permutation bug found on the chip)."""
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=4)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    dfac = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    field = jnp.asarray(_synthetic_model1_field())
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    tensor = _field_tensor_function(field)
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)

    plan = build_structured_assembly(grid, order, binfo, side_eps=1e-7)
    # dof permutations are genuinely non-trivial at this depth
    assert (plan.dof_perm != np.arange(3)).any()
    cf = _cell_field_soa(grid, order, field)
    S = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64)
    to_g, from_g = geometric_soa_maps(order, plan)
    KY, KX = order.lattice
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(grid.num_cells * 3))
    y_ref = np.asarray(A.matvec(x))
    X = x[jnp.asarray(to_g)].reshape(3, 8, KY, KX)
    y = np.asarray(S.matvec(X).reshape(-1)[jnp.asarray(from_g)])
    np.testing.assert_allclose(y, y_ref, rtol=0,
                               atol=1e-12 * np.abs(y_ref).max())


def test_precomputed_coefficient_matches(setup):
    """Host-precomputed static coefficient == in-trace evaluation."""
    from dune_hdd_tpu.la.stencil_assembly import precompute_coefficient

    grid, binfo, space, order, dfac, field = setup
    plan = build_structured_assembly(grid, order, binfo, side_eps=1e-7)
    cf = _cell_field_soa(grid, order, field)
    pre = precompute_coefficient(plan, dfac, dtype=np.float64)
    S1 = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64)
    S2 = assemble_structured_spe10(plan, pre, cf, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(S1.planes), np.asarray(S2.planes))


def test_family_chunks_equivalent(setup):
    """family_chunks divides peak memory but must not change values."""
    grid, binfo, space, order, dfac, field = setup
    plan = build_structured_assembly(grid, order, binfo, side_eps=1e-7)
    cf = _cell_field_soa(grid, order, field)
    S1 = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64)
    S3 = assemble_structured_spe10(plan, dfac, cf, dtype=jnp.float64,
                                   family_chunks=3)
    np.testing.assert_allclose(np.asarray(S3.planes), np.asarray(S1.planes),
                               rtol=0, atol=1e-13 * float(jnp.abs(S1.planes).max()))
