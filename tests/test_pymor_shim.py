"""pyMOR interop shim (mor/pymor_shim.py) — the L6 bindings-generator role
(reference: cg_bindings_generator.py:14-70, thermalblock_main.py:73-79)."""
import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.mor import as_pymor_model, StationaryModelShim
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


def test_shim_satisfies_shared_contract():
    """The SAME contract suite tests/test_pymor_real.py runs against real
    pyMOR (importorskipped there), here on the shim branch — shim and real
    bridge share one behavioural spec."""
    from pymor_contract import make_thermalblock_discretization, run_full_contract

    d = make_thermalblock_discretization()
    run_full_contract(as_pymor_model(d), d)


def test_shim_solve_matches_native():
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))
    m = as_pymor_model(d)
    mu = {"diffusion_factor": jnp.asarray([0.3, 1.0, 0.7, 0.2])}
    if isinstance(m, StationaryModelShim):
        assert m.parameters == {"diffusion_factor": 4}
        u_shim = m.solve(mu, solver_options={"type": "direct"})
        u_native = d.solve(d.problem.parse_parameter(mu), options={"type": "direct"})
        np.testing.assert_allclose(np.asarray(u_shim), np.asarray(u_native))
        assert "h1_semi" in m.products and "l2" in m.products
        # affine structure exposed: one component per theta + the constant
        # penalty part (the penalty_mu scheme keeps the penalty exactly once
        # in an affine part, exported as a unit-coefficient component)
        assert m.operator.num_components == 5
    else:  # real pymor installed
        U = m.solve({"diffusion_factor": np.asarray([0.3, 1.0, 0.7, 0.2])})
        u_native = d.solve(d.problem.parse_parameter(mu), options={"type": "direct"})
        np.testing.assert_allclose(
            U.to_numpy().ravel(), np.asarray(u_native), rtol=1e-8, atol=1e-10
        )


def test_multiscale_shim_lrbms_surface():
    """Block discretizations expose the LRBMS surface through the shim
    (the image of inject_StationaryMultiscaleDiscretizationImplementation,
    thermalblock_bindings_generator.py:34-58)."""
    from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
    from dune_hdd_tpu.mor.pymor_shim import StationaryMultiscaleModelShim

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)),
                                  num_partitions=(2, 2))
    m = as_pymor_model(d)
    if not isinstance(m, StationaryMultiscaleModelShim):
        return  # real pymor present: covered by the stationary test
    assert m.num_subdomains() == 4
    assert set(m.neighbouring_subdomains(0)) == {1, 2}
    mu = {"diffusion_factor": jnp.asarray([0.3, 1.0, 0.7, 0.2])}
    mu_p = d.problem.parse_parameter(mu)
    # local operator/rhs/product are affine decompositions per subdomain
    op0 = m.local_operator(0)
    assert op0.num_components >= 1
    rhs0 = m.local_rhs(0)
    prod0 = m.local_product(0, "h1_semi")
    n0 = len(d._local_dof_map(0))
    assert prod0.freeze({}).shape == (n0, n0)
    # coupling blocks exist for a neighbour pair
    cpl = m.coupling_operator(0, 1)
    assert cpl.num_components >= 1 or cpl.affine_part is not None
    # localize/globalize round trip
    u = m.solve(mu, solver_options={"type": "direct"})
    locs = [m.localize_vector(u, ss) for ss in range(4)]
    np.testing.assert_allclose(
        np.asarray(m.globalize_vectors(locs)), np.asarray(u), atol=1e-12)
