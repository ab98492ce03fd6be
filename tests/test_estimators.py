"""ESV2007 estimator regression vs the reference expectation tables
(test/linearelliptic-swipdg-expectations_esv2007_2daluconform.cxx:38-57)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.estimators import (
    SWIPDGEstimators,
    oswald_interpolation,
    rt0_divergence,
    rt0_flux_reconstruction,
)
from dune_hdd_tpu.ops import cell_quadrature, error_norms
from dune_hdd_tpu.testcases import ESV2007TestCase

EXPECTED = {
    "eta_NC_ESV2007": [1.66e-1, 7.89e-2],
    "eta_R_ESV2007": [7.23e-2, 1.82e-2],
    "eta_DF_ESV2007": [3.55e-1, 1.76e-1],
    "eta_ESV2007": [4.49e-01, 2.07e-01],
    "eta_ESV2007_alt": [5.93e-01, 2.73e-01],
}


@pytest.fixture(scope="module")
def solved_levels():
    tc = ESV2007TestCase(num_refinements=1, grid_variant="alu_conforming")
    out = []
    for r in range(2):
        d = SWIPDGDiscretization(tc.level_grid(r), tc.boundary_info(), tc.problem)
        u = d.solve(options={"type": "direct"})
        out.append((tc, d, u))
    return out


def test_estimators_match_reference_tables(solved_levels):
    for r, (tc, d, u) in enumerate(solved_levels):
        for t, vals in EXPECTED.items():
            est = SWIPDGEstimators.estimate(d.space, d.boundary_info, tc.problem, u, t)
            assert est == pytest.approx(vals[r], rel=7e-3), (t, r, est, vals[r])


def test_efficiency_matches(solved_levels):
    # eff_ESV2007 = eta / energy error = 1.37, 1.28 (same .cxx:49-53)
    expected_eff = [1.37, 1.28]
    for r, (tc, d, u) in enumerate(solved_levels):
        e = error_norms(d.space, u, tc.exact_solution)
        eta = SWIPDGEstimators.estimate(d.space, d.boundary_info, tc.problem, u, "eta_ESV2007")
        assert eta / e["H1_semi"] == pytest.approx(expected_eff[r], rel=1e-2)


def test_rt0_locally_conservative(solved_levels):
    """div t_h == P0 f exactly (local conservation of the SWIPDG flux)."""
    tc, d, u = solved_levels[0]
    from dune_hdd_tpu.functions import freeze_function

    lam = freeze_function(tc.problem.diffusion_factor)
    kap = freeze_function(tc.problem.diffusion_tensor)
    force = freeze_function(tc.problem.force)
    grid = d.space.grid
    fb = np.nonzero(d.boundary_info.dirichlet_faces)[0]
    mean_flux = rt0_flux_reconstruction(
        d.space, u, lam, kap, fb, np.zeros(0, dtype=int)
    )
    div = rt0_divergence(grid, mean_flux)
    qp, qw = cell_quadrature(grid, 6)
    p0f = jnp.sum(qw * force(qp), axis=1) / jnp.asarray(grid.cell_volumes)
    np.testing.assert_allclose(np.asarray(div), np.asarray(p0f), rtol=1e-5)


def test_oswald_preserves_continuous(solved_levels):
    """Oswald interpolation of an (interior-)continuous DG function returns
    its vertex values."""
    tc, d, u = solved_levels[0]
    grid = d.space.grid
    lin = 2.0 * grid.vertices[:, 0] + 0.5 * grid.vertices[:, 1]
    u_dg = jnp.asarray(lin)[jnp.asarray(grid.cells.astype(np.int64))].reshape(-1)
    no_dirichlet = np.zeros(grid.num_vertices, dtype=bool)
    osw = oswald_interpolation(d.space, u_dg, no_dirichlet)
    np.testing.assert_allclose(np.asarray(osw), lin, atol=1e-12)


def test_estimate_local_normalised(solved_levels):
    tc, d, u = solved_levels[0]
    loc = SWIPDGEstimators.estimate_local(
        d.space, d.boundary_info, tc.problem, u, "eta_ESV2007"
    )
    assert loc.shape == (d.space.grid.num_cells,)
    assert np.sum(loc) == pytest.approx(1.0, rel=1e-12)
    assert (loc >= 0).all()


def test_unknown_estimator_rejected(solved_levels):
    tc, d, u = solved_levels[0]
    with pytest.raises(ValueError):
        SWIPDGEstimators.estimate(d.space, d.boundary_info, tc.problem, u, "eta_bogus")
