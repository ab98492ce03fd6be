"""Subdomain-aligned halo-exchange sharding (verdict item 5): ppermute
neighbour rings instead of all_gather, O(halo) comm per CG iteration, and
BlockSWIPDG.as_sharded built on whole-subdomain row blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import SWIPDGDiscretization
from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.parallel import (
    HaloShardedSystem,
    ShardedAffineSystem,
    halo_exchange_spec,
    make_device_mesh,
)
from dune_hdd_tpu.parallel.halo import _halo_solve_jit
from dune_hdd_tpu.problems import ThermalblockProblem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}
MU = {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 2.0])}


@pytest.fixture(scope="module")
def disc():
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    return SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))


@pytest.fixture(scope="module")
def mesh():
    return make_device_mesh(mu_axis=1, domain_axis=8)


@pytest.fixture(scope="module")
def halo_system(disc, mesh):
    return HaloShardedSystem(disc.get_operator(), disc.get_rhs(), mesh,
                             dtype=jnp.float64)


def test_halo_matches_all_gather_path_bitwise(disc, mesh, halo_system):
    """Same CG recurrence, same slot order -> bit-identical solutions."""
    sys_a = ShardedAffineSystem(disc.get_operator(), disc.get_rhs(), mesh,
                                dtype=jnp.float64)
    u_a = sys_a.solve(MU, tol=1e-12, maxiter=5000)
    u_h = halo_system.solve(MU, tol=1e-12, maxiter=5000)
    np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u_h))


def test_halo_matches_direct_solve(disc, halo_system):
    u_h = halo_system.solve(MU, tol=1e-12, maxiter=5000)
    u_ref = disc.solve(MU, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u_h), np.asarray(u_ref), atol=1e-8)


def test_comm_volume_is_o_halo_not_o_n(halo_system):
    """Per-iteration exchange = sum of per-shift halo buffers << N."""
    spec = halo_exchange_spec(halo_system)
    n = halo_system.num_dofs
    assert spec["elements_per_spmv"] < n / 2, spec
    # the all_gather path moves (D-1)/D * N elements per device per SpMV
    assert spec["elements_per_spmv"] < 7 / 8 * n


def test_hlo_has_collective_permute_and_no_all_gather(halo_system):
    th_op = halo_system.thetas(halo_system.op_coefficients, MU)
    th_rhs = halo_system.thetas(halo_system.rhs_coefficients, MU)
    hlo = _halo_solve_jit.lower(
        halo_system, th_op, th_rhs, 1e-12, 5000).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_block_swipdg_as_sharded_subdomain_aligned(mesh):
    """as_sharded rides whole-subdomain row blocks and reproduces the
    unsharded block solve."""
    grid = alu_cube_grid((0, 0), (1, 1), (8, 8), refinements=0)
    disc = BlockSWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)),
                                     num_partitions=(4, 2))
    system = disc.as_sharded(mesh=mesh, dtype=jnp.float64)
    assert isinstance(system, HaloShardedSystem)
    blocks = disc.subdomain_row_blocks(8)
    assert len(blocks) == 8
    # blocks partition the DoFs
    allrows = np.sort(np.concatenate(blocks))
    np.testing.assert_array_equal(allrows, np.arange(disc.space.num_dofs))
    u = system.solve(MU, tol=1e-12, maxiter=5000)
    u_ref = disc.solve(MU, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-8)


def test_halo_parameter_sweep_mu_x_domain(disc):
    """(2 mu x 4 domain) mesh: the DP x DD composition solves a parameter
    batch through the ppermute halo path; results match per-mu unsharded
    solves and the HLO stays all_gather-free (VERDICT r2 item 4)."""
    from dune_hdd_tpu.parallel.halo import halo_parameter_sweep

    mesh24 = make_device_mesh(mu_axis=2, domain_axis=4)
    system = HaloShardedSystem(disc.get_operator(), disc.get_rhs(), mesh24,
                               dtype=jnp.float64)
    mus = [
        {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 2.0])},
        {"diffusion_factor": jnp.array([1.0, 0.2, 0.9, 0.4])},
        {"diffusion_factor": jnp.array([0.7, 0.7, 0.7, 0.7])},
        {"diffusion_factor": jnp.array([2.0, 0.1, 1.0, 0.3])},
    ]
    th_op = jnp.stack([system.thetas(system.op_coefficients, m) for m in mus])
    th_rhs = jnp.stack([system.thetas(system.rhs_coefficients, m) for m in mus])
    U = halo_parameter_sweep(system, th_op, th_rhs, tol=1e-12, maxiter=5000)
    assert U.shape == (4, disc.space.num_dofs)
    for i, m in enumerate(mus):
        u_ref = disc.solve(m, options={"type": "direct"})
        np.testing.assert_allclose(np.asarray(U[i]), np.asarray(u_ref),
                                   atol=1e-8)


def test_halo_sweep_hlo_ppermute_only(disc):
    from dune_hdd_tpu.parallel.halo import _halo_cg, halo_parameter_sweep

    mesh24 = make_device_mesh(mu_axis=2, domain_axis=4)
    system = HaloShardedSystem(disc.get_operator(), disc.get_rhs(), mesh24,
                               dtype=jnp.float64)
    # lower the same computation halo_parameter_sweep jits and inspect HLO
    import jax as _jax

    th_op = jnp.stack([system.thetas(system.op_coefficients, MU)] * 4)
    th_rhs = jnp.stack([system.thetas(system.rhs_coefficients, MU)] * 4)
    matvec_fn = system._matvec_body()

    def body(th_op_l, th_rhs_l, ell_vals_l, cols_ext_l, rhs_l, *send_locals):
        vals_q = ell_vals_l[:, 0]
        cols = cols_ext_l[0]
        sends = [s[0] for s in send_locals]

        def one(th_op, th_rhs):
            vals = jnp.einsum("q,qnk->nk", th_op, vals_q)
            b = jnp.einsum("q,qn->n", th_rhs, rhs_l[:, 0])
            return _halo_cg(matvec_fn, vals, cols, b, sends, "domain",
                            1e-12, 5000, sync_axes=("mu",))

        return _jax.vmap(one)(th_op_l, th_rhs_l)[:, None]

    from jax.sharding import PartitionSpec as P

    in_specs = (
        P("mu", None), P("mu", None), P(None, "domain", None, None),
        P("domain", None, None), P(None, "domain", None),
    ) + tuple(P("domain", None) for _ in system.send_idx)
    fn = _jax.jit(_jax.shard_map(
        body, mesh=mesh24, in_specs=in_specs, out_specs=P("mu", "domain", None)))
    hlo = fn.lower(th_op, th_rhs, system.ell_vals, system.cols_ext,
                   system.rhs_stack, *system.send_idx).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_subdomain_row_blocks_skewed_sizes():
    """Skewed subdomain DoF sizes must not push split bounds past S-1
    (advisor round-2 repro: sizes [1]*7 + [1000] with 8 devices produced
    empty groups and a np.concatenate([]) ValueError)."""
    sizes = [1] * 7 + [1000]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    class Stub:
        def num_subdomains(self):
            return len(sizes)

        def _local_dof_map(self, ss):
            return np.arange(offsets[ss], offsets[ss + 1])

    blocks = BlockSWIPDGDiscretization.subdomain_row_blocks(Stub(), 8)
    assert len(blocks) == 8
    assert all(len(b) > 0 for b in blocks)
    np.testing.assert_array_equal(
        np.sort(np.concatenate(blocks)), np.arange(sum(sizes)))


def test_subdomain_row_blocks_whole_subdomains():
    grid = alu_cube_grid((0, 0), (1, 1), (8, 8), refinements=0)
    disc = BlockSWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)),
                                     num_partitions=(4, 4))
    blocks = disc.subdomain_row_blocks(8)
    # 16 subdomains over 8 devices: each device owns whole subdomains
    sub_rows = [set(map(int, disc._local_dof_map(ss)))
                for ss in range(disc.num_subdomains())]
    for blk in blocks:
        s = set(map(int, blk))
        covered = [ss for ss in range(16) if sub_rows[ss] <= s]
        assert sum(len(sub_rows[ss]) for ss in covered) == len(s)
