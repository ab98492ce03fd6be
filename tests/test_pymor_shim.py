"""pyMOR interop shim (mor/pymor_shim.py) — the L6 bindings-generator role
(reference: cg_bindings_generator.py:14-70, thermalblock_main.py:73-79)."""
import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.mor import as_pymor_model, StationaryModelShim
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


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
