"""Stage pipelining (PP) on the virtual CPU mesh: a GPipe-style
assemble→solve→estimate schedule over a "stage" mesh axis (SURVEY §2.8 PP
row).  The affine component stacks — the pipeline's "weights" — are sharded
over the assembly stages, so no device materializes the full decomposition
(the memory rationale for pipelining).  Tests: equality against the
identical stage functions run sequentially (3- and 5-stage meshes), the
real in-pipeline ESV2007 estimate stage against the host front-end,
true-solution accuracy, the sharded-stack memory layout, and the collective
structure of the compiled program."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.parallel.pipeline import (
    EstimatorStage,
    make_stage_mesh,
    pipeline_parameter_stages,
    sequential_parameter_stages,
)
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}

MUS = ([1.0, 1.0, 1.0, 1.0], [0.1, 1.0, 0.5, 2.0],
       [2.0, 0.3, 1.0, 0.7], [0.5, 0.5, 0.5, 0.5], [1.5, 0.2, 0.8, 1.1])


@pytest.fixture(scope="module")
def setup():
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))
    op, rhs = d.get_operator(), d.get_rhs()
    expanded = op.with_expanded_affine_part()
    th_op = jnp.stack([
        jnp.stack([jnp.asarray(c({"diffusion_factor": jnp.array(v)}))
                   for c in expanded.coefficients]) for v in MUS])
    rhs_exp = rhs.with_expanded_affine_part()
    th_rhs = jnp.stack([
        jnp.stack([jnp.asarray(c({"diffusion_factor": jnp.array(v)}))
                   for c in rhs_exp.coefficients]) for v in MUS])
    return d, op, rhs, th_op, th_rhs


@pytest.mark.parametrize("num_stages", [3, 5])
def test_pipeline_matches_sequential(setup, num_stages):
    d, op, rhs, th_op, th_rhs = setup
    mesh = make_stage_mesh(num_stages=num_stages)
    u_pp, est_pp = pipeline_parameter_stages(
        op, rhs, th_op, th_rhs, mesh=mesh, cg_iters=400, dtype=jnp.float64)
    u_seq, est_seq = sequential_parameter_stages(
        op, rhs, th_op, th_rhs, cg_iters=400, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(u_pp), np.asarray(u_seq),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(est_pp), np.asarray(est_seq),
                               rtol=0, atol=1e-12)


def test_pipeline_estimate_stage_equals_host_frontend(setup):
    """The REAL estimator kernels (Oswald eta_NC, RT0 eta_DF, eta_R_*) run
    inside the jitted estimate stage at each item's μ and equal the public
    host front-end ``SWIPDGEstimators.estimate`` (which the sequential
    baseline calls)."""
    d, op, rhs, th_op, th_rhs = setup
    mus = [{"diffusion_factor": jnp.array(v)} for v in MUS]
    est = EstimatorStage(d.space, d.boundary_info, d.problem, mus)
    mesh = make_stage_mesh(num_stages=4)
    u_pp, est_pp = pipeline_parameter_stages(
        op, rhs, th_op, th_rhs, mesh=mesh, cg_iters=800, dtype=jnp.float64,
        estimator=est)
    u_seq, est_seq = sequential_parameter_stages(
        op, rhs, th_op, th_rhs, cg_iters=800, dtype=jnp.float64,
        estimator=est)
    assert est_pp.shape == (len(MUS), 2 + len(est.types))
    np.testing.assert_allclose(np.asarray(est_pp), np.asarray(est_seq),
                               rtol=0, atol=1e-12)
    # the estimator columns are real (nonzero) for the parametric items
    assert np.all(np.asarray(est_pp[1:, 2]) > 0)


def test_pipeline_weight_shards_live_on_assembly_stages(setup):
    """Memory rationale: with S stages and A = S - 2 assembly stages, each
    device holds a ceil(Q/A)-component shard of the affine stacks, and the
    solve/estimate devices' shards are pure zero padding — no device
    materializes the full decomposition."""
    d, op, rhs, th_op, th_rhs = setup
    S = 5
    mesh = make_stage_mesh(num_stages=S)
    Q = th_op.shape[1]
    A = S - 2
    out = pipeline_parameter_stages(
        op, rhs, th_op, th_rhs, mesh=mesh, cg_iters=50, dtype=jnp.float64,
        _return_stacks=True)
    vals_pad, rhs_pad = out[-1]
    Qc = -(-Q // A)
    assert vals_pad.shape[0] == S * Qc
    shards = {s.device.id: np.asarray(s.data)
              for s in vals_pad.addressable_shards}
    devs = [dev.id for dev in mesh.devices.ravel()]
    for s_idx, dev_id in enumerate(devs):
        shard = shards[dev_id]
        assert shard.shape[0] == Qc  # per-device footprint is Q/A, not Q
        if s_idx >= A:  # solve + estimate stages: zeros only
            assert not np.any(shard)
    # the assembly stages together hold exactly the full stack
    from dune_hdd_tpu.parallel.pipeline import _ell_stacks

    ell_vals, _, _, _, _ = _ell_stacks(op, rhs, jnp.float64)
    full = np.concatenate([shards[d_] for d_ in devs[:A]])[:Q]
    np.testing.assert_array_equal(full, np.asarray(ell_vals))


def test_pipeline_solutions_are_solutions(setup):
    """The piped solves converge: tiny relative residuals recorded by the
    estimate stage, and the solutions match the direct solver."""
    d, op, rhs, th_op, th_rhs = setup
    u_pp, est_pp = pipeline_parameter_stages(
        op, rhs, th_op, th_rhs, cg_iters=2000, dtype=jnp.float64)
    assert np.all(np.asarray(est_pp[:, 0]) < 1e-8)  # relative residuals
    assert np.all(np.asarray(est_pp[:, 1]) > 0)  # energy norms
    for i, v in enumerate(MUS):
        u_ref = d.solve({"diffusion_factor": jnp.array(v)},
                        options={"type": "direct"})
        np.testing.assert_allclose(np.asarray(u_pp[i]), np.asarray(u_ref),
                                   atol=1e-7)


def test_pipeline_hlo_uses_collective_permute(setup):
    """The inter-stage activation transfer lowers to collective-permute
    (the ICI-ring primitive) — the payload is handed point-to-point, not
    all-gathered."""
    from dune_hdd_tpu.parallel.pipeline import (_build_pipeline, _ell_stacks,
                                                _pad_rows)

    d, op, rhs, th_op, th_rhs = setup
    mesh = make_stage_mesh()
    S = mesh.shape["stage"]
    A = S - 2
    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(op, rhs, jnp.float64)
    Qc = -(-ell_vals.shape[0] // A)
    Qcr = -(-rhs_stack.shape[0] // A)
    vals_pad = _pad_rows(ell_vals, Qc, S)
    rhs_pad = _pad_rows(rhs_stack, Qcr, S)
    th_op_p = jnp.zeros((th_op.shape[0], S * Qc), th_op.dtype
                        ).at[:, : th_op.shape[1]].set(th_op)
    th_rhs_p = jnp.zeros((th_rhs.shape[0], S * Qcr), th_rhs.dtype
                         ).at[:, : th_rhs.shape[1]].set(th_rhs)
    fn = _build_pipeline(mesh, 10, 2, None)
    lowered = fn.lower(th_op_p, th_rhs_p, vals_pad, ell_cols, rhs_pad, {})
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo or "collective_permute" in hlo


def test_pipeline_rejects_bad_mesh(setup):
    d, op, rhs, th_op, th_rhs = setup
    with pytest.raises(ValueError):
        make_stage_mesh(num_stages=2)
    bad = Mesh(np.asarray(jax.devices()[:2]), axis_names=("stage",))
    with pytest.raises(ValueError):
        pipeline_parameter_stages(op, rhs, th_op, th_rhs, mesh=bad)
