"""Batched (vmapped) online RB sweeps (mor/batch.py) equal the per-mu
loop they replace: reduced solves and Riesz residual estimates over a
stacked parameter set match OnlineResidual.estimate / ReducedModel.solve
elementwise (the greedy's candidate scoring, thermalblock_main.py:126-170
semantics)."""
import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.discretizations.tensor_cg import TensorCGDiscretization
from dune_hdd_tpu.grid.tensor import tensor_grid
from dune_hdd_tpu.mor.batch import (
    batched_estimates,
    batched_reduced_solve,
    stack_parameters,
)
from dune_hdd_tpu.mor.greedy import greedy_rb
from dune_hdd_tpu.mor.reductor import RBReductor
from dune_hdd_tpu.mor.residual import RieszResidualEstimator, min_theta_coercivity
from dune_hdd_tpu.problems.thermalblock import ThermalblockProblem

OPTS = {"type": "cg.jacobi", "precision": 1e-12, "max_iter": 20000}


def _setup():
    grid = tensor_grid((0.0, 0.0), (1.0, 1.0), (8, 8))
    d = TensorCGDiscretization(grid, None, ThermalblockProblem((2, 2)))
    rng = np.random.default_rng(11)
    mus = [{"diffusion_factor": 10 ** rng.uniform(-1, 1, 4)} for _ in range(7)]
    reductor = RBReductor(d)
    basis = jnp.zeros((0, d.space.num_dofs))
    from dune_hdd_tpu.mor.greedy import _extend

    for mu in mus[:3]:
        basis = _extend(basis, d.solve(mu, OPTS), "gram_schmidt",
                        d.product_matrix("h1_semi"))
    rm = reductor.reduce(basis)
    return d, rm, basis, mus


def test_batched_reduced_solve_matches_loop():
    d, rm, _, mus = _setup()
    stacked = stack_parameters(d.problem, mus)
    C = np.asarray(batched_reduced_solve(rm, stacked))
    for m, mu in enumerate(mus):
        np.testing.assert_allclose(C[m], np.asarray(rm.solve(mu)),
                                   rtol=1e-5, atol=1e-8)


def test_batched_estimates_match_loop():
    d, rm, basis, mus = _setup()
    est = RieszResidualEstimator(d, product="h1_semi")
    online = est.offline(basis)
    stacked = stack_parameters(d.problem, mus)
    etas = batched_estimates(online, rm, stacked)
    refs = np.asarray([online.estimate(mu, rm.solve(mu)) for mu in mus])
    # snapshot parameters have eta ~ 0: eta^2 is a cancellation of O(1)
    # Gramian terms, so both paths share an f32 noise floor ~ sqrt(eps)*scale
    floor = 2e-3 * float(refs.max())
    np.testing.assert_allclose(etas, refs, rtol=1e-3, atol=floor)


def test_batched_estimates_with_coercivity():
    d, rm, basis, mus = _setup()
    alpha = min_theta_coercivity(d.get_operator(),
                                 d.problem.parse_parameter(mus[0]))
    est = RieszResidualEstimator(d, product="h1_semi", coercivity=alpha)
    online = est.offline(basis)
    stacked = stack_parameters(d.problem, mus)
    coercs = np.asarray([float(alpha(d.problem.parse_parameter(mu)))
                         for mu in mus])
    etas = batched_estimates(online, rm, stacked, coercs)
    refs = np.asarray([online.estimate(mu, rm.solve(mu)) for mu in mus])
    floor = 2e-3 * float(refs.max())
    np.testing.assert_allclose(etas, refs, rtol=1e-3, atol=floor)


def test_greedy_estimator_mode_uses_batched_path():
    d, _, _, mus = _setup()
    res = greedy_rb(d, mus, target_error=1e-10, max_extensions=4,
                    use_estimator=True, solver_options=OPTS)
    errs = [e for e in res.max_errors if e >= 0]
    assert len(errs) >= 2 and errs[-1] < errs[0]
    # empty-basis iteration must score finite too (Gramians handle n = 0)
    assert np.isfinite(res.max_errors[0])


def test_cg_estimator_certifies_energy_error():
    """With the Dirichlet-CONSTRAINED h1_semi product (mor/residual.py) and
    min-theta coercivity at mu_bar = 1, the Riesz bound certifies the
    mu-energy error on the CG thermalblock: effectivities measured 1.3-2.3
    (unconstrained products put the constants kernel into the Riesz solve
    and inflated eta by ~1e6x)."""
    from dune_hdd_tpu.grid.tensor import tensor_grid as tg

    grid = tg((0.0, 0.0), (1.0, 1.0), (12, 12))
    d = TensorCGDiscretization(grid, None, ThermalblockProblem((2, 2)))
    opts = {"type": "cg.jacobi", "precision": 1e-13, "max_iter": 30000}
    rng = np.random.default_rng(3)
    mus = [{"diffusion_factor": 10 ** rng.uniform(-1, 1, 4)} for _ in range(8)]
    from dune_hdd_tpu.mor.greedy import _extend

    basis = jnp.zeros((0, d.space.num_dofs))
    for mu in mus[:3]:
        basis = _extend(basis, d.solve(mu, opts), "gram_schmidt",
                        d.product_matrix("h1_semi"))
    rm = RBReductor(d).reduce(basis)
    mu_bar = {"diffusion_factor": np.ones(4)}
    alpha = min_theta_coercivity(d.get_operator(),
                                 d.problem.parse_parameter(mu_bar))
    online = RieszResidualEstimator(
        d, product="h1_semi", coercivity=alpha).offline(basis)
    for mu in mus[3:]:
        u = d.solve(mu, opts)
        e = u - rm.reconstruct(rm.solve(mu))
        err = float(jnp.sqrt(jnp.maximum(
            e @ d.freeze_operator(mu).matvec(e), 0.0)))
        eta = online.estimate(mu, rm.solve(mu))
        assert 0.99 * err <= eta <= 10.0 * err, (err, eta)
