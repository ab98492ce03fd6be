import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import CGDiscretization
from dune_hdd_tpu.functions import Testcase1ExactSolution
from dune_hdd_tpu.grid import rectangle_grid, refine
from dune_hdd_tpu.ops import error_norms, induced_norm
from dune_hdd_tpu.problems import (
    ESV2007Problem,
    MixedBoundariesProblem,
    ParametricESV2007Problem,
    ThermalblockProblem,
)

ALL_DIRICHLET = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_cg_esv2007_converges(cell_type):
    """The minimum end-to-end slice (survey 7.2): ESV2007 + CG-P1, EOC ~ {2,1}."""
    problem = ESV2007Problem()
    exact = Testcase1ExactSolution()
    errors = []
    grid = rectangle_grid((-1, -1), (1, 1), (8, 8), cell_type)
    for _ in range(3):
        disc = CGDiscretization(grid, ALL_DIRICHLET, problem)
        u = disc.solve_with_dirichlet_shift(options={"type": "cg.jacobi", "precision": 1e-13})
        errors.append(error_norms(disc.space, u, exact))
        grid, _ = refine(grid)
    l2 = [e["L2"] for e in errors]
    h1 = [e["H1_semi"] for e in errors]
    eoc_l2 = [np.log2(l2[i] / l2[i + 1]) for i in range(2)]
    eoc_h1 = [np.log2(h1[i] / h1[i + 1]) for i in range(2)]
    assert all(e > 1.85 for e in eoc_l2), (l2, eoc_l2)
    assert all(e > 0.95 for e in eoc_h1), (h1, eoc_h1)


def test_cg_solver_types_agree():
    problem = ESV2007Problem()
    grid = rectangle_grid((-1, -1), (1, 1), (8, 8), "triangle")
    disc = CGDiscretization(grid, ALL_DIRICHLET, problem)
    u_direct = disc.solve(options={"type": "direct"})
    for t in ("cg.jacobi", "bicgstab.jacobi", "gmres.jacobi"):
        u = disc.solve(options={"type": t, "precision": 1e-12})
        assert float(jnp.max(jnp.abs(u - u_direct))) < 1e-8, t


def test_cg_products():
    problem = ESV2007Problem()
    grid = rectangle_grid((-1, -1), (1, 1), (16, 16), "triangle")
    disc = CGDiscretization(grid, ALL_DIRICHLET, problem)
    assert disc.available_products() == ["energy", "h1_semi", "l2"]
    # || 1 ||_L2 over [-1,1]^2 = 2  (constant-one vertex vector)
    ones = jnp.ones(disc.space.num_dofs)
    m = disc.product_matrix("l2")
    assert float(induced_norm(m, ones)) == pytest.approx(2.0, rel=1e-12)
    # h1_semi of linear x: ||grad x||_L2 = 2
    lin = jnp.asarray(disc.space.grid.vertices[:, 0])
    h = disc.product_matrix("h1_semi")
    assert float(induced_norm(h, lin)) == pytest.approx(2.0, rel=1e-12)
    # energy == h1_semi for unit diffusion
    e = disc.product_matrix("energy")
    assert float(induced_norm(e, lin)) == pytest.approx(2.0, rel=1e-12)


def test_cg_nonzero_dirichlet_mixed_boundaries():
    """MixedBoundaries: u = 0.25 x y is NOT the solution (force=1), but the
    dirichlet shift machinery must reproduce the boundary values exactly."""
    problem = MixedBoundariesProblem()
    grid = rectangle_grid((0, 0), (1, 1), (16, 16), "quad")
    bi = {
        "type": "stuff.grid.boundaryinfo.normalbased",
        "default": "dirichlet",
        "neumann": [[-1.0, 0.0], [1.0, 0.0]],
    }
    disc = CGDiscretization(grid, bi, problem)
    u = disc.solve_with_dirichlet_shift(options={"type": "direct"})
    # boundary values match g = 0.25 x y on dirichlet vertices
    mask = disc.boundary_info.dirichlet_vertices
    v = grid.vertices
    np.testing.assert_allclose(
        np.asarray(u)[mask], 0.25 * v[mask, 0] * v[mask, 1], atol=1e-12
    )
    # interior solution should exceed the boundary data somewhere (force=1)
    assert float(jnp.max(u)) > 0.25


def test_cg_idbased_boundary_matches_normalbased():
    """IdBased boundary info (discreteproblem.hh:128-132 accepts arbitrary
    boundary configs incl. IdBased) must yield the identical discretization
    as the equivalent NormalBased classification on a cube grid."""
    problem = MixedBoundariesProblem()
    grid = rectangle_grid((0, 0), (1, 1), (12, 12), "quad")
    bi_id = {"type": "stuff.grid.boundaryinfo.idbased",
             "default": "dirichlet", "neumann": "1 2"}
    bi_nb = {
        "type": "stuff.grid.boundaryinfo.normalbased",
        "default": "dirichlet",
        "neumann": [[-1.0, 0.0], [1.0, 0.0]],
    }
    u_id = CGDiscretization(grid, bi_id, problem).solve_with_dirichlet_shift(
        options={"type": "direct"})
    u_nb = CGDiscretization(grid, bi_nb, problem).solve_with_dirichlet_shift(
        options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u_id), np.asarray(u_nb), atol=1e-13)


def test_cg_parametric_affine_consistency():
    """Frozen parametric operator must equal the operator assembled from the
    frozen problem."""
    problem = ParametricESV2007Problem()
    grid = rectangle_grid((-1, -1), (1, 1), (8, 8), "triangle")
    disc = CGDiscretization(grid, ALL_DIRICHLET, problem)
    assert disc.parametric()
    mu = {"mu": jnp.array([0.3])}
    frozen_op = disc.freeze_operator(mu)
    disc2 = CGDiscretization(grid, ALL_DIRICHLET, problem.with_mu(mu))
    direct_op = disc2.freeze_operator({})
    np.testing.assert_allclose(
        np.asarray(frozen_op.values), np.asarray(direct_op.values), atol=1e-12
    )
    u1 = disc.solve(mu, options={"type": "direct"})
    u2 = disc2.solve(options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-10)


def test_cg_thermalblock_solution_cache():
    problem = ThermalblockProblem((2, 2))
    grid = rectangle_grid((0, 0), (1, 1), (8, 8), "triangle")
    disc = CGDiscretization(grid, ALL_DIRICHLET, problem)
    mu = {"diffusion_factor": jnp.array([1.0, 2.0, 3.0, 4.0])}
    u1 = disc.solve(mu)
    u2 = disc.solve(mu)
    assert u1 is u2  # cache hit (base.hh:151-178 semantics)
    assert float(jnp.max(u1)) > 0.0
