"""Stage pipelining (PP) on the virtual CPU mesh: a GPipe-style
assemble→solve→estimate schedule over a 3-device "stage" axis (SURVEY §2.8
PP row).  Equality against the identical stage functions run sequentially,
true-solution accuracy, and the collective structure of the compiled
program."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.parallel.pipeline import (
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


def test_pipeline_matches_sequential(setup):
    d, op, rhs, th_op, th_rhs = setup
    mesh = make_stage_mesh()
    u_pp, est_pp = pipeline_parameter_stages(
        op, rhs, th_op, th_rhs, mesh=mesh, cg_iters=400, dtype=jnp.float64)
    u_seq, est_seq = sequential_parameter_stages(
        op, rhs, th_op, th_rhs, cg_iters=400, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(u_pp), np.asarray(u_seq),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(est_pp), np.asarray(est_seq),
                               rtol=0, atol=1e-12)


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
    (the ICI-ring primitive), not all-gather/all-reduce of the payload."""
    from dune_hdd_tpu.parallel.pipeline import _ell_stacks, _pipeline_jit

    d, op, rhs, th_op, th_rhs = setup
    mesh = make_stage_mesh()
    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(op, rhs, jnp.float64)
    lowered = _pipeline_jit.lower(mesh, th_op, th_rhs, ell_vals, ell_cols,
                                  rhs_stack, 10)
    hlo = lowered.as_text()
    assert "collective-permute" in hlo or "collective_permute" in hlo


def test_pipeline_rejects_bad_mesh(setup):
    from jax.sharding import Mesh

    d, op, rhs, th_op, th_rhs = setup
    bad = Mesh(np.asarray(jax.devices()[:4]), axis_names=("stage",))
    with pytest.raises(ValueError):
        pipeline_parameter_stages(op, rhs, th_op, th_rhs, mesh=bad)
