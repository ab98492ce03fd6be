"""SWIPDG on 1D interval grids — the SGrid<1,1> instantiation of the
reference's SWIPDG example (examples/linearelliptic/swipdg.cc:11) at the FULL
discretization surface: the same SWIPDGDiscretization class (affine
operator/rhs, penalty_mu/reference schemes, l2/h1_semi/energy/penalty
products, solver registry, Dirichlet/Neumann data functionals) runs unchanged
on Grid(cell_type="interval"), where faces are points, face quadrature is
point evaluation, and the penalty length scale is min(h_L, h_R)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.swipdg import SWIPDGDiscretization
from dune_hdd_tpu.functions.base import (
    ConstantFunction,
    IndicatorFunction,
    LambdaFunction,
    constant_matrix,
    nonparametric,
)
from dune_hdd_tpu.grid.hierarchy import GridProviders
from dune_hdd_tpu.grid.structured import interval_grid, refine
from dune_hdd_tpu.ops.norms import error_norms
from dune_hdd_tpu.parameters import ParameterFunctional
from dune_hdd_tpu.problems.interfaces import Problem
from dune_hdd_tpu.studies.eoc import eoc_rates

ALLDIRICHLET = {"type": "stuff.grid.boundaryinfo.alldirichlet"}
PI = np.pi


def _sine_problem():
    """-u'' = pi^2 sin(pi x) on (0,1), u = sin(pi x), zero Dirichlet."""
    exact = LambdaFunction(lambda x: jnp.sin(PI * x[..., 0]), order=8, name="exact")
    problem = Problem(
        ConstantFunction(1.0, "diffusion_factor"),
        constant_matrix(1.0, dim=1),
        LambdaFunction(lambda x: PI * PI * jnp.sin(PI * x[..., 0]), order=8,
                       name="force"),
        ConstantFunction(0.0, "dirichlet"),
        ConstantFunction(0.0, "neumann"),
    )
    return exact, problem


@pytest.mark.parametrize("order,expected", [(1, (2.0, 1.0)), (2, (3.0, 2.0))])
def test_interval_swipdg_eoc(order, expected):
    exact, problem = _sine_problem()
    errs = {"L2": [], "H1_semi": []}
    for n in (8, 16, 32):
        d = SWIPDGDiscretization(interval_grid(0, 1, n), ALLDIRICHLET, problem,
                                 order=order)
        u = d.solve(None, options={"type": "direct"})
        e = error_norms(d.space, u, exact)
        for k in errs:
            errs[k].append(e[k])
    rate_l2 = np.mean(eoc_rates(errs["L2"]))
    rate_h1 = np.mean(eoc_rates(errs["H1_semi"]))
    assert rate_l2 > expected[0] - 0.2, errs["L2"]
    assert rate_h1 > expected[1] - 0.2, errs["H1_semi"]


def test_interval_swipdg_order3_exact_for_cubic():
    """P3 space reproduces a cubic solution to solver precision."""
    exact = LambdaFunction(lambda x: x[..., 0] ** 3, order=3)
    problem = Problem(
        ConstantFunction(1.0, "diffusion_factor"),
        constant_matrix(1.0, dim=1),
        LambdaFunction(lambda x: -6.0 * x[..., 0], order=1, name="force"),
        LambdaFunction(lambda x: x[..., 0] ** 3, order=3, name="dirichlet"),
        ConstantFunction(0.0, "neumann"),
    )
    d = SWIPDGDiscretization(interval_grid(0, 1, 4), ALLDIRICHLET, problem,
                             order=3)
    u = d.solve(None, options={"type": "direct"})
    e = error_norms(d.space, u, exact)
    assert e["L2"] < 1e-9 and e["H1_semi"] < 1e-8, e


def test_interval_swipdg_neumann_exact_linear():
    """u = x with Dirichlet at x=0 and exact Neumann flux at x=1 is
    reproduced exactly (Neumann face functional on point faces)."""
    problem = Problem(
        ConstantFunction(1.0, "diffusion_factor"),
        constant_matrix(1.0, dim=1),
        ConstantFunction(0.0, "force"),
        ConstantFunction(0.0, "dirichlet"),
        ConstantFunction(1.0, "neumann"),  # u'.n = 1 at the right end
    )
    bi = {"type": "stuff.grid.boundaryinfo.normalbased",
          "default": "dirichlet", "neumann": [[1.0]]}
    d = SWIPDGDiscretization(interval_grid(0, 1, 8), bi, problem, order=1)
    u = d.solve(None, options={"type": "direct"})
    exact = LambdaFunction(lambda x: x[..., 0], order=1)
    e = error_norms(d.space, u, exact)
    assert e["L2"] < 1e-10 and e["H1_semi"] < 1e-9, e


def test_interval_swipdg_parametric_affine_contract():
    """Affine operator/rhs freeze at mu == assembly of the frozen problem
    (the frozen == affine contract, as in the 2D SWIPDG tests), on a 1D
    two-block thermalblock-type diffusion."""
    chi_left = IndicatorFunction([((0.0,), (0.5,), 1.0)], name="left")
    chi_right = IndicatorFunction([((0.5,), (1.0,), 1.0)], name="right")
    from dune_hdd_tpu.affine import AffineDecomposition

    lam = AffineDecomposition()
    lam.register_component(chi_left, ParameterFunctional({"mu": 2}, "mu[0]"))
    lam.register_component(chi_right, ParameterFunctional({"mu": 2}, "mu[1]"))
    problem = Problem(
        lam,
        nonparametric(constant_matrix(1.0, dim=1)),
        nonparametric(ConstantFunction(1.0, "force")),
        nonparametric(ConstantFunction(0.0, "dirichlet")),
        nonparametric(ConstantFunction(0.0, "neumann")),
    )
    grid = interval_grid(0, 1, 16)
    mu = {"mu": jnp.asarray([0.3, 2.0])}
    # penalty_mu scheme with weight lambda(mu): the affine operator's flux
    # terms are linear in the components at the FIXED weight, so freeze(mu)
    # must equal assembling the frozen problem (whose self-weight is the same
    # lambda(mu)) — the reference's penalty_mu semantics (swipdg.hh:222-249)
    d = SWIPDGDiscretization(grid, ALLDIRICHLET, problem, order=1,
                             penalty_mu=mu)
    frozen = SWIPDGDiscretization(grid, ALLDIRICHLET, problem.with_mu(mu),
                                  order=1)
    A_aff = d.freeze_operator(mu).to_dense()
    A_frz = frozen.freeze_operator(None).to_dense()
    np.testing.assert_allclose(np.asarray(A_aff), np.asarray(A_frz),
                               rtol=1e-12, atol=1e-12)
    u_aff = d.solve(mu, options={"type": "direct"})
    u_frz = frozen.solve(None, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u_aff), np.asarray(u_frz),
                               rtol=1e-9, atol=1e-11)


def test_interval_swipdg_products_and_solvers():
    exact, problem = _sine_problem()
    d = SWIPDGDiscretization(interval_grid(0, 1, 16), ALLDIRICHLET, problem,
                             order=1)
    assert set(d.available_products()) >= {"l2", "h1_semi", "energy"}
    one = jnp.ones(d.space.num_dofs)
    # interpolant of 1: all nodal values 1 -> l2 norm^2 == |domain| = 1
    M = d.product_matrix("l2")
    assert abs(float(one @ M.matvec(one)) - 1.0) < 1e-12
    # h1_semi of a constant is 0
    H = d.product_matrix("h1_semi")
    assert abs(float(one @ H.matvec(one))) < 1e-12
    # solver registry: iterative matches direct
    u_direct = d.solve(None, options={"type": "direct"})
    u_cg = d.solve(None, options={"type": "cg.jacobi", "precision": 1e-13,
                                  "max_iter": 20000})
    np.testing.assert_allclose(np.asarray(u_cg), np.asarray(u_direct),
                               rtol=1e-7, atol=1e-9)


def test_interval_grid_refine_and_provider():
    g = interval_grid(0, 1, 4)
    g2, info = refine(g)
    assert g2.num_cells == 8 and g2.num_vertices == 9
    assert np.all(np.sort(g2.vertices[:, 0]) == np.linspace(0, 1, 9))
    assert list(info.parent_cell[:4]) == [0, 0, 1, 1]
    # provider registry (write-config-then-rerun path)
    gp = GridProviders.create("stuff.grid.provider.interval",
                              {"lower_left": 0.0, "upper_right": 2.0,
                               "num_elements": 4, "num_refinements": 1})
    assert gp.num_cells == 8
    assert np.isclose(gp.cell_volumes.sum(), 2.0)


def test_interval_swipdg_example_facade(tmp_path):
    """Config-driven façade: grid.type interval + ESV2007-style 1D problem."""
    from dune_hdd_tpu.cli.examples import LinearellipticExampleSWIPDG
    from dune_hdd_tpu.utils.config import Configuration

    cfg = Configuration()
    cfg["grid.type"] = "stuff.grid.provider.interval"
    cfg["grid.lower_left"] = 0.0
    cfg["grid.upper_right"] = 1.0
    cfg["grid.num_elements"] = 16
    cfg["boundary_info.type"] = "stuff.grid.boundaryinfo.alldirichlet"
    cfg["problem.type"] = "hdd.linearelliptic.problem.default"
    cfg_file = tmp_path / "interval_swipdg.cfg"
    cfg_file.write_text(cfg.to_string())
    ex = LinearellipticExampleSWIPDG().initialize([str(cfg_file)])
    d = ex.discretization()
    assert d.space.grid.cell_type == "interval"
    u = d.solve(None, options={"type": "direct"})
    assert np.all(np.isfinite(np.asarray(u)))
