"""BlockSWIPDG: global equivalence with SWIPDG + the LRBMS surface
(reference: discretizations/block-swipdg.hh; test strategy survey 4.3 —
partitionings are pure config)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.grid.multiscale import MultiscaleGrid, extract_subgrid
from dune_hdd_tpu.problems import ESV2007Problem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


@pytest.fixture(scope="module")
def block_disc():
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    return BlockSWIPDGDiscretization(grid, BI, ESV2007Problem(), num_partitions=(2, 2))


def test_multiscale_grid_partition():
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    ms = MultiscaleGrid(grid, (2, 2))
    assert ms.size() == 4
    total = sum(len(ms.cells(ss)) for ss in range(4))
    assert total == grid.num_cells
    # neighbours on a 2x2 partition: edge-adjacent (+ diagonal via corner-touching
    # faces does not exist -> each subdomain has exactly 2 neighbours)
    for ss in range(4):
        assert len(ms.neighbors_of(ss)) == 2
    # coupling faces are symmetric and disjoint from inner faces
    cf = ms.coupling_faces(0, 1)
    assert len(cf) > 0
    np.testing.assert_array_equal(cf, ms.coupling_faces(1, 0))
    assert not set(cf.tolist()) & set(ms.inner_faces(0).tolist())
    # diameter of a quarter of [-1,1]^2 is sqrt(2)
    assert ms.subdomain_diameter(0) == pytest.approx(np.sqrt(2.0))


def test_oversampling_layers():
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    ms = MultiscaleGrid(grid, (2, 2), oversampling_layers=2)
    base = ms.cells(0)
    over = ms.oversampled_cells(0)
    assert len(over) > len(base)
    assert set(base.tolist()) <= set(over.tolist())


def test_block_solution_equals_swipdg(block_disc):
    """Same global space => identical solution for every partitioning
    (BASELINE.md: L2/H1/energy identical across partitionings)."""
    d = block_disc
    single = SWIPDGDiscretization(d.space.grid, BI, d.problem)
    u_b = d.solve(options={"type": "direct"})
    u_s = single.solve(options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_s), atol=1e-10)


def test_global_equals_sum_of_blocks(block_disc):
    """A_global == sum_ss lift(A_local_ss) + sum_(ss<nn) lift(coupling)."""
    d = block_disc
    n = d.space.num_dofs
    A = np.asarray(d.freeze_operator({}).to_dense())
    B = np.zeros_like(A)
    for ss in range(d.num_subdomains()):
        dofs = d._local_dof_map(ss)
        B[np.ix_(dofs, dofs)] += np.asarray(d.get_local_operator(ss).freeze({}).to_dense())
        for nn in d.neighbouring_subdomains(ss):
            if nn <= ss:
                continue
            cop = d.get_coupling_operator(ss, int(nn)).freeze({})
            dn = d._local_dof_map(int(nn))
            B[np.ix_(dofs, dofs)] += np.asarray(cop.in_in.to_dense())
            B[np.ix_(dofs, dn)] += np.asarray(cop.in_out.to_dense())
            B[np.ix_(dn, dofs)] += np.asarray(cop.out_in.to_dense())
            B[np.ix_(dn, dn)] += np.asarray(cop.out_out.to_dense())
    np.testing.assert_allclose(B, A, atol=1e-10)


@pytest.mark.parametrize("scheme", ["reference", "penalty_mu"])
@pytest.mark.parametrize("mu_val", [1.0, 0.3])
def test_global_equals_sum_of_blocks_parametric(scheme, mu_val):
    """The LRBMS decomposition identity must hold for every mu and both
    parametric schemes (the round-1 coupling operator counted the fixed
    penalty once per affine component, breaking this away from mu=1)."""
    from dune_hdd_tpu.problems import ThermalblockProblem

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(
        grid, BI, ThermalblockProblem((2, 2)), num_partitions=(2, 2), scheme=scheme,
    )
    mu = {"diffusion_factor": jnp.array([mu_val, 1.0, 0.5, 2.0])}
    A = np.asarray(d.freeze_operator(mu).to_dense())
    B = np.zeros_like(A)
    for ss in range(d.num_subdomains()):
        dofs = d._local_dof_map(ss)
        B[np.ix_(dofs, dofs)] += np.asarray(d.get_local_operator(ss).freeze(mu).to_dense())
        for nn in d.neighbouring_subdomains(ss):
            if nn <= ss:
                continue
            cop = d.get_coupling_operator(ss, int(nn)).freeze(mu)
            dn = d._local_dof_map(int(nn))
            B[np.ix_(dofs, dofs)] += np.asarray(cop.in_in.to_dense())
            B[np.ix_(dofs, dn)] += np.asarray(cop.in_out.to_dense())
            B[np.ix_(dn, dofs)] += np.asarray(cop.out_in.to_dense())
            B[np.ix_(dn, dn)] += np.asarray(cop.out_out.to_dense())
    np.testing.assert_allclose(B, A, atol=1e-10)


def test_global_rhs_equals_sum_of_local(block_disc):
    d = block_disc
    b = np.asarray(d.freeze_rhs({}))
    acc = np.zeros_like(b)
    for ss in range(d.num_subdomains()):
        dofs = d._local_dof_map(ss)
        acc[dofs] += np.asarray(d.get_local_rhs(ss).freeze({}))
    np.testing.assert_allclose(acc, b, atol=1e-12)


def test_localize_globalize_roundtrip(block_disc):
    d = block_disc
    u = d.solve(options={"type": "direct"})
    locals_ = [d.localize_vector(u, ss) for ss in range(d.num_subdomains())]
    assert sum(lv.shape[0] for lv in locals_) == d.space.num_dofs
    back = d.globalize_vectors(locals_)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u), atol=0)


def test_local_products(block_disc):
    d = block_disc
    p = d.get_local_product(0, "h1_semi").freeze({})
    nloc = len(d.ms_grid.cells(0)) * d.space.shape_count
    assert p.shape == (nloc, nloc)
    # local h1 seminorm of the localized global linear x is |subdomain|-consistent:
    grid = d.ms_grid.grid
    lin = jnp.asarray(grid.cell_vertices[..., 0].reshape(-1))
    loc = d.localize_vector(lin, 0)
    val = float(jnp.sqrt(loc @ p.matvec(loc)))
    # integral of |grad x|^2 = area of subdomain = 1.0 for a quarter of [-1,1]^2
    assert val == pytest.approx(1.0, rel=1e-12)


def test_oversampled_discretization():
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(
        grid, BI, ESV2007Problem(), num_partitions=(2, 2), oversampling_layers=2
    )
    od = d.get_oversampled_discretization(0, "dirichlet")
    assert od.space.grid.num_cells > len(d.ms_grid.cells(0))
    with pytest.raises(ValueError):
        d.get_oversampled_discretization(0, "bogus")
    with pytest.raises(ValueError):
        d.solve_for_local_correction([], 0)


def test_interface_accessors_and_validation(block_disc):
    d = block_disc
    assert d.grid_view() is d.space.grid
    assert d.test_space() is d.space and d.ansatz_space() is d.space
    assert d.pattern().shape == (d.space.num_dofs, d.space.num_dofs)
    # NaN input rejected (block-swipdg.hh:711-712 semantics)
    bad = jnp.full(d.space.num_dofs, jnp.nan)
    with pytest.raises(ValueError):
        d.localize_vector(bad, 0)
    with pytest.raises(ValueError):
        d.localize_vector(jnp.zeros(3), 0)


def test_online_enrichment_reduces_local_error():
    """solve_for_local_correction: a perturbation supported strictly inside a
    subdomain is (mostly) removed by the oversampled-patch correction."""
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(
        grid, BI, ESV2007Problem(), num_partitions=(2, 2), oversampling_layers=3
    )
    u_star = d.solve(options={"type": "direct"})
    # perturb inside subdomain 0, away from its boundary
    centroids = grid.cell_centroids
    bump_cells = np.nonzero(
        (centroids[:, 0] < -0.45) & (centroids[:, 1] < -0.45)
        & (centroids[:, 0] > -0.9) & (centroids[:, 1] > -0.9)
    )[0]
    assert set(d.ms_grid.subdomain_of[bump_cells].tolist()) == {0}
    pert = np.zeros(d.space.num_dofs)
    nd = d.space.shape_count
    for c in bump_cells:
        pert[c * nd : (c + 1) * nd] = 0.3
    u = u_star + jnp.asarray(pert)
    locals_ = [d.localize_vector(u, ss) for ss in range(4)]
    delta = d.solve_for_local_correction(locals_, 0)
    err_before = float(jnp.linalg.norm(locals_[0] - d.localize_vector(u_star, 0)))
    corrected = locals_[0] + delta
    err_after = float(jnp.linalg.norm(corrected - d.localize_vector(u_star, 0)))
    assert err_after < 0.2 * err_before, (err_before, err_after)
