"""3D parametric thermalblock — the ThermalblockExample<SGrid<3,3>>
instantiation (examples/linearelliptic/thermalblock.hh:91): a d = 3
checkerboard diffusion (problems/thermalblock.hh:106-112, dune-stuff
Checkerboard subdomain numbering ix + nx*(iy + ny*iz)) driven through the
Q1 tensor CG discretization and the RB greedy workflow
(thermalblock_main.py:126-170 semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.cli.examples import ThermalblockExample
from dune_hdd_tpu.discretizations.tensor_cg import TensorCGDiscretization
from dune_hdd_tpu.functions.base import (
    CheckerboardFunction,
    make_checkerboard_decomposition,
)
from dune_hdd_tpu.grid.tensor import tensor_grid
from dune_hdd_tpu.problems.thermalblock import ThermalblockProblem

CG_OPTS = {"type": "cg.jacobi", "precision": 1e-12, "max_iter": 20000}


def test_checkerboard_3d_block_numbering():
    # x fastest: block = ix + nx*(iy + ny*iz)
    ne = (2, 3, 2)
    vals = np.arange(np.prod(ne), dtype=float)
    f = CheckerboardFunction((0, 0, 0), (1, 1, 1), ne, vals)
    rng = np.random.default_rng(3)
    x = rng.random((40, 3))
    ij = np.minimum((x * np.array(ne)).astype(int), np.array(ne) - 1)
    expected = ij[:, 0] + ne[0] * (ij[:, 1] + ne[1] * ij[:, 2])
    got = np.asarray(f(jnp.asarray(x)))
    assert np.array_equal(got, expected.astype(float))


def test_checkerboard_3d_partition_of_unity():
    dec = make_checkerboard_decomposition((0, 0, 0), (1, 1, 1), (2, 2, 2))
    assert dec.num_components == 8
    x = jnp.asarray(np.random.default_rng(0).random((25, 3)))
    total = sum(np.asarray(c(x)) for c in dec.components)
    assert np.allclose(total, 1.0)


def test_thermalblock_problem_3d():
    from dune_hdd_tpu.parameters import ParameterType

    p = ThermalblockProblem(num_blocks=(2, 2, 2))
    assert p.diffusion_factor.parameter_type == ParameterType(
        {"diffusion_factor": 8})
    assert p.diffusion_factor.num_components == 8
    # config path: dim selects the slice of the reference's [4 4 4] default
    p3 = ThermalblockProblem.create({"dim": 3,
                                     "diffusion_factor": {"num_elements": [2, 2, 2]}})
    assert p3.num_blocks == (2, 2, 2)
    p2 = ThermalblockProblem.create(
        {"diffusion_factor": {"num_elements": [4, 4, 4]}})
    assert p2.num_blocks == (4, 4)  # 2D default unchanged


@pytest.fixture(scope="module")
def disc3d():
    grid = tensor_grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (6, 6, 6))
    return TensorCGDiscretization(grid, None, ThermalblockProblem((2, 2, 2)))


def test_thermalblock_3d_affine_solve(disc3d):
    d = disc3d
    assert len(d.get_operator().components) == 8
    mu = {"diffusion_factor": np.array([0.1, 1.0, 0.5, 2.0, 1.0, 0.3, 4.0, 1.0])}
    u = d.solve(mu, CG_OPTS)
    # frozen system == with_mu path: residual of the frozen operator
    A = d.freeze_operator(mu)
    b = d.freeze_rhs(mu)
    r = np.asarray(A.matvec(u) - b)
    assert np.linalg.norm(r) <= 1e-8 * max(1.0, float(np.linalg.norm(np.asarray(b))))
    # mu = 1 everywhere reduces to the unit-diffusion poisson solve
    ones = {"diffusion_factor": np.ones(8)}
    u1 = d.solve(ones, CG_OPTS)
    grid = tensor_grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (6, 6, 6))
    dref = TensorCGDiscretization(grid, None)  # constant-1 diffusion
    uref = dref.solve(None, CG_OPTS)
    assert np.allclose(np.asarray(u1), np.asarray(uref), atol=1e-10)
    # physical monotonicity: scaling all conductivities up scales u down
    u10 = d.solve({"diffusion_factor": 10 * np.ones(8)}, CG_OPTS)
    assert float(jnp.max(jnp.abs(u10))) < float(jnp.max(jnp.abs(u1)))


def test_thermalblock_3d_rb_greedy(disc3d):
    from dune_hdd_tpu.mor.greedy import greedy_rb

    rng = np.random.default_rng(7)
    training = [{"diffusion_factor": 10 ** rng.uniform(-1, 1, 8)}
                for _ in range(6)]
    res = greedy_rb(disc3d, training, target_error=1e-8, max_extensions=5,
                    error_norm="h1_semi", solver_options=CG_OPTS)
    # -1.0 is the non-finite (empty-basis) sentinel; finite scores decrease
    errs = [e for e in res.max_errors if e >= 0]
    assert len(errs) >= 2 and errs[-1] < errs[0]
    rom = res.reduced_model
    mu = training[0]
    u_red = rom.reconstruct(rom.solve(mu))
    u_det = disc3d.solve(mu, CG_OPTS)
    prod = disc3d.product_matrix("h1_semi")
    e = u_det - u_red
    err = float(jnp.sqrt(e @ prod.matvec(e)))
    den = float(jnp.sqrt(u_det @ prod.matvec(u_det)))
    assert err <= 1e-3 * max(den, 1e-12)


def test_thermalblock_example_tensor_3d():
    ex = ThermalblockExample().initialize_tensor(
        dim=3, num_elements=4, num_blocks=(2, 2, 2))
    d = ex.discretization()
    assert d.space.dim == 3
    assert len(d.get_operator().components) == 8
    u = d.solve({"diffusion_factor": np.ones(8)}, CG_OPTS)
    assert np.isfinite(np.asarray(u)).all()
