"""Reduced-basis workflows (thermalblock_main.py analog: standard RB greedy
+ LRBMS with per-subdomain bases + quality check, survey 3.5)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.mor import (
    RBReductor,
    gram_schmidt,
    greedy_lrbms,
    greedy_rb,
    pod,
    sample_randomly,
    sample_uniformly,
)
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


@pytest.fixture(scope="module")
def tb_disc():
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    return SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))


def test_gram_schmidt_orthonormal(tb_disc):
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.normal(size=(4, tb_disc.space.num_dofs)))
    product = tb_disc.product_matrix("l2")
    onb = gram_schmidt(vecs, product)
    G = np.asarray(
        jnp.stack([jnp.stack([a @ product.matvec(b) for b in onb]) for a in onb])
    )
    np.testing.assert_allclose(G, np.eye(len(onb)), atol=1e-10)
    # duplicated vector gets dropped
    dup = jnp.concatenate([vecs, vecs[:1]])
    assert gram_schmidt(dup, product).shape[0] == 4


def test_pod_reproduces_span(tb_disc):
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.normal(size=(2, tb_disc.space.num_dofs)))
    snaps = jnp.concatenate([base, base[0:1] + base[1:2]])
    modes, svals = pod(snaps, tb_disc.product_matrix("l2"))
    assert modes.shape[0] == 2  # rank 2
    assert svals.shape == (2,)


@pytest.mark.slow
def test_greedy_rb_converges(tb_disc):
    # note: sample_uniformly gives mu = (t, t, t, t) whose solutions span a
    # 1-D manifold (u scales with 1/t) — use random samples for a real test
    training = sample_randomly(tb_disc.parameter_type, 0.1, 1.0, 6, seed=5)
    res = greedy_rb(tb_disc, training, target_error=1e-8, max_extensions=6)
    assert res.extensions >= 2
    assert res.max_errors[-1] < 1e-8
    assert res.max_errors[-1] < 1e-8
    # reduced solve matches detailed solve at a training parameter
    mu = training[2]
    u = tb_disc.solve(mu, options={"type": "direct"})
    u_rb = res.reduced_model.reconstruct(res.reduced_model.solve(mu))
    pm = tb_disc.product_matrix("h1_semi")
    err = float(jnp.sqrt((u - u_rb) @ pm.matvec(u - u_rb)))
    assert err < 1e-8


@pytest.mark.slow
def test_greedy_rb_generalizes(tb_disc):
    training = sample_randomly(tb_disc.parameter_type, 0.1, 1.0, 8, seed=2)
    res = greedy_rb(tb_disc, training, target_error=1e-6, max_extensions=8)
    reductor = RBReductor(tb_disc)
    test_mus = sample_randomly(tb_disc.parameter_type, 0.1, 1.0, 3, seed=99)
    for mu in test_mus:
        err = reductor.true_error(res.reduced_model, mu, "h1_semi")
        assert err < 1e-2, err


@pytest.mark.slow
def test_greedy_lrbms(tb_disc):
    grid = tb_disc.space.grid
    d = BlockSWIPDGDiscretization(grid, BI, tb_disc.problem, num_partitions=(2, 2))
    training = sample_uniformly(d.parameter_type, 0.1, 1.0, 4)
    res = greedy_lrbms(d, training, target_error=1e-7, max_extensions=4)
    assert res.max_errors[-1] < 1e-7
    # basis is block structured: each row supported on one subdomain
    for row in np.asarray(res.basis):
        nz = np.nonzero(row)[0]
        subdomains = {int(d.ms_grid.subdomain_of[i // 3]) for i in nz}
        assert len(subdomains) == 1


@pytest.mark.slow
def test_greedy_lrbms_estimator_driven(tb_disc):
    """Riesz-estimator-driven LRBMS greedy (VERDICT r2 item 7): selects the
    same extension parameters as the detailed-error greedy while issuing one
    detailed solve per extension instead of |training_set| per sweep."""
    grid = tb_disc.space.grid
    d = BlockSWIPDGDiscretization(grid, BI, tb_disc.problem, num_partitions=(2, 2))
    training = sample_randomly(d.parameter_type, 0.1, 1.0, 6, seed=3)

    solves = {"n": 0}
    orig_solve = d.solve

    def counting_solve(*a, **k):
        solves["n"] += 1
        return orig_solve(*a, **k)

    d.solve = counting_solve
    try:
        res_det = greedy_lrbms(d, training, target_error=1e-7, max_extensions=4)
        n_detailed = solves["n"]
        solves["n"] = 0
        res_est = greedy_lrbms(d, training, target_error=1e-7, max_extensions=4,
                               use_estimator=True)
        n_estimated = solves["n"]
    finally:
        d.solve = orig_solve
    # an order of magnitude fewer detailed solves (1/extension vs 1/candidate;
    # the selection order may differ — the residual estimator ranks by
    # ||rho||_P, the detailed greedy by the true energy error)
    assert n_estimated * 5 <= n_detailed, (n_estimated, n_detailed)
    assert res_est.extensions >= 1
    # estimator greedy converges to the same quality (detailed error probes)
    reductor = RBReductor(d)
    for mu in training[:3]:
        err = reductor.true_error(res_est.reduced_model, mu, "h1_semi")
        assert err < 1e-6, err


def test_reduced_model_roundtrip(tb_disc, tmp_path):
    from dune_hdd_tpu.mor import load_reduced_model, save_reduced_model

    training = sample_randomly(tb_disc.parameter_type, 0.1, 1.0, 3, seed=11)
    res = greedy_rb(tb_disc, training, target_error=1e-4, max_extensions=3)
    path = save_reduced_model(res.reduced_model, str(tmp_path / "rb_model"))
    rm2 = load_reduced_model(path)
    mu = training[0]
    np.testing.assert_allclose(
        np.asarray(res.reduced_model.solve(mu)), np.asarray(rm2.solve(mu)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(rm2.reconstruct(rm2.solve(mu))),
        np.asarray(res.reduced_model.reconstruct(res.reduced_model.solve(mu))),
        atol=1e-12,
    )


def test_matmat_consistency(tb_disc):
    import jax.numpy as jnp

    A = tb_disc.freeze_operator({"diffusion_factor": jnp.ones(4)})
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.normal(size=(tb_disc.space.num_dofs, 3)))
    Y = A.matmat(X)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(Y[:, k]), np.asarray(A.matvec(X[:, k])), atol=1e-10
        )


def test_greedy_checkpoint_resume(tb_disc, tmp_path):
    """Interrupted greedy resumes from the checkpoint and reproduces the
    uninterrupted run exactly (basis, history, selections)."""
    mus = sample_uniformly(tb_disc.problem.parameter_type, 0.1, 1.0, 5)
    full = greedy_rb(tb_disc, mus, target_error=0.0, max_extensions=4)
    ckpt = str(tmp_path / "greedy_state")
    part = greedy_rb(tb_disc, mus, target_error=0.0, max_extensions=2,
                     checkpoint_path=ckpt)
    assert part.extensions == 2
    resumed = greedy_rb(tb_disc, mus, target_error=0.0, max_extensions=4,
                        checkpoint_path=ckpt)
    assert resumed.extensions == full.extensions
    np.testing.assert_allclose(np.asarray(resumed.basis),
                               np.asarray(full.basis), atol=1e-12)
    assert [list(np.asarray(list(m.values())[0])) for m in resumed.selected_mus] == \
           [list(np.asarray(list(m.values())[0])) for m in full.selected_mus]
    np.testing.assert_allclose(resumed.max_errors, full.max_errors, rtol=1e-12)
