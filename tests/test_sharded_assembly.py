"""Per-device (sharded) assembly of the BlockSWIPDG operator values
(parallel/sharded_assembly.py — VERDICT r2 item 3): the value sweep runs
inside shard_map over the "domain" axis and must reproduce the host-path
ELL values BITWISE; as_sharded(assemble_on_device=True) consumes them
without a host round-trip."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.parallel import make_device_mesh
from dune_hdd_tpu.parallel.sharded_assembly import sharded_operator_values
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


@pytest.fixture(scope="module")
def disc():
    grid = alu_cube_grid((0, 0), (1, 1), (8, 8), refinements=2)
    return BlockSWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)),
                                     num_partitions=(4, 2))


@pytest.fixture(scope="module")
def mesh():
    return make_device_mesh(mu_axis=1, domain_axis=8)


def test_device_assembly_bitwise_equals_host(disc, mesh):
    row_blocks = disc.subdomain_row_blocks(8)
    t0 = time.perf_counter()
    vals_dev = sharded_operator_values(disc._global, mesh, row_blocks,
                                       dtype=jnp.float64)
    jax.block_until_ready(vals_dev)
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    sys_host = disc.as_sharded(mesh=mesh, dtype=jnp.float64)
    t_host = time.perf_counter() - t0
    host = np.asarray(sys_host.ell_vals)
    dev = np.asarray(vals_dev)
    # same raw-entry order restricted per device + stable sort + segment sum
    # => identical addend order per slot => bitwise equality
    np.testing.assert_array_equal(host, dev)
    # wall-time record (VERDICT asks for the measurement; CPU-mesh numbers
    # are indicative only)
    print(f"\n  value sweep: device {t_dev*1e3:.0f} ms vs host fill "
          f"{t_host*1e3:.0f} ms")


def test_as_sharded_on_device_solves(disc, mesh):
    system = disc.as_sharded(mesh=mesh, dtype=jnp.float64,
                             assemble_on_device=True)
    mu = {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 2.0])}
    u = system.solve(mu, tol=1e-12, maxiter=5000)
    u_ref = disc.solve(mu, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-8)


def test_device_assembly_parametric_consistency(disc, mesh):
    """theta-contraction of the device-assembled components == frozen host
    operator at a nontrivial mu."""
    row_blocks = disc.subdomain_row_blocks(8)
    vals_dev = sharded_operator_values(disc._global, mesh, row_blocks,
                                       dtype=jnp.float64)
    op = disc.get_operator().with_expanded_affine_part()
    mu = {"diffusion_factor": jnp.array([0.3, 0.9, 0.6, 1.4])}
    mu_p = disc.problem.parse_parameter(mu)
    th = np.asarray([float(np.asarray(c(mu_p))) for c in op.coefficients])
    frozen = disc.freeze_operator(mu_p)
    ell_host = np.asarray(frozen.pattern.ell_values(frozen.values))
    dev = np.einsum("q,qdlk->dlk", th, np.asarray(vals_dev))
    for d, rows in enumerate(row_blocks):
        np.testing.assert_allclose(dev[d, : len(rows)], ell_host[rows],
                                   rtol=1e-12, atol=1e-12)
