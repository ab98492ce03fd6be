"""SPE10 model-1 studies (analog of the reference's SWIPDG/BlockSWIPDG SPE10
regression rows).  The SPE10 data file is not distributed with the reference,
so these run on the documented deterministic synthetic field — values are
regression-locked for THIS framework; structure (error decrease vs the
reference solution, estimator positivity, per-subdomain localisation)
mirrors the reference.  Grids are test-scaled (25x5 macro cells) to keep the
suite fast; solves use the jitted block-CG path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.studies import EocStudy
from dune_hdd_tpu.testcases import Spe10Model1TestCase, Spe10ParametricBlockModel1TestCase

SOLVER = {"type": "block_cg.jacobi", "precision": 1e-11, "max_iter": 30000}


def test_spe10_nonparametric_study():
    tc = Spe10Model1TestCase(num_refinements=1, num_elements=(25, 5))
    assert not tc.provides_exact_solution()
    study = EocStudy(
        tc, SWIPDGDiscretization, norms=("L2", "H1_semi", "energy"),
        solver_options=SOLVER,
    )
    results = study.run(verbose=False)
    for t in ("L2", "H1_semi", "energy"):
        assert results[t][1] < results[t][0], (t, results[t])
        assert results[t][0] > 0


def test_spe10_parametric_block():
    tc = Spe10ParametricBlockModel1TestCase(
        {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1},
        num_partitions=(5, 1), num_refinements=0,
    )
    # test scale: shrink via direct construction on a small grid
    from dune_hdd_tpu.grid import alu_cube_grid

    grid = alu_cube_grid((0, 0), (5, 1), (25, 5), refinements=1)
    d = BlockSWIPDGDiscretization(
        grid, tc.boundary_info(), tc.problem, num_partitions=(5, 1),
    )
    assert d.num_subdomains() == 5
    u = d.solve(tc.parameters["mu"], options=SOLVER)
    assert bool(jnp.all(jnp.isfinite(u)))
    pars = tc.estimator_parameters()
    eta = BlockSWIPDGEstimators.estimate(d, u, "eta_OS2014_*", pars)
    assert np.isfinite(eta) and eta > 0
    ind = BlockSWIPDGEstimators.estimate_local(d, u, "eta_OS2014_*", pars)
    assert ind.shape == (5,)
    assert (ind > 0).all()
