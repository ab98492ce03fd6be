"""Sharded execution on the 8-device CPU mesh (survey 4.6: subdomain/device
count as pure config; XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.parallel import (
    ShardedAffineSystem,
    make_device_mesh,
    sharded_parameter_sweep,
)
from dune_hdd_tpu.problems import ParametricESV2007Problem, ThermalblockProblem
from dune_hdd_tpu.grid import alu_cube_grid

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


@pytest.fixture(scope="module")
def disc():
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    return SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_single_device(disc):
    mesh = make_device_mesh(mu_axis=1, domain_axis=8)
    system = ShardedAffineSystem(disc.get_operator(), disc.get_rhs(), mesh,
                                 dtype=jnp.float64)
    mu = {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 2.0])}
    u_sharded = system.solve(mu, tol=1e-12, maxiter=5000)
    u_ref = disc.solve(mu, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u_sharded), np.asarray(u_ref),
                               atol=1e-8)


def test_sharded_parameter_sweep(disc):
    """2x4 mesh: mu-batch data parallelism x domain decomposition."""
    mesh = make_device_mesh(mu_axis=2, domain_axis=4)
    system = ShardedAffineSystem(disc.get_operator(), disc.get_rhs(), mesh,
                                 dtype=jnp.float64)
    mus = [
        {"diffusion_factor": jnp.array(v)}
        for v in ([1.0, 1.0, 1.0, 1.0], [0.1, 1.0, 0.5, 2.0],
                  [2.0, 0.3, 1.0, 0.7], [0.5, 0.5, 0.5, 0.5])
    ]
    th_op = jnp.stack([system.thetas(system.op_coefficients, m) for m in mus])
    th_rhs = jnp.stack([system.thetas(system.rhs_coefficients, m) for m in mus])
    out = sharded_parameter_sweep(system, th_op, th_rhs, tol=1e-12, maxiter=5000)
    assert out.shape[0] == 4
    for i, mu in enumerate(mus):
        u_ref = disc.solve(mu, options={"type": "direct"})
        np.testing.assert_allclose(
            np.asarray(out[i, : system.num_dofs]), np.asarray(u_ref), atol=1e-8
        )


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_device_mesh(mu_axis=3, domain_axis=3)


def test_block_swipdg_as_sharded():
    """BlockSWIPDG -> device mesh bridge: the DD system solved on all 8
    devices matches the sequential solve."""
    from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(
        grid, BI, ThermalblockProblem((2, 2)), num_partitions=(2, 2)
    )
    system = d.as_sharded(make_device_mesh(mu_axis=1, domain_axis=8),
                          dtype=jnp.float64)
    mu = {"diffusion_factor": jnp.array([0.5, 1.5, 1.0, 0.2])}
    u = system.solve(mu, tol=1e-12, maxiter=5000)
    u_ref = d.solve(mu, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-8)
