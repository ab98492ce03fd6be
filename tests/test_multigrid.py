"""Geometric multigrid for DG block-ELL operators."""
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.functions import ConstantFunction, constant_matrix
from dune_hdd_tpu.functions.esv2007 import Testcase1Force
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.la.block_ell import (
    BlockEllMatrix,
    block_cg,
    block_jacobi_preconditioner,
    build_block_ell,
)
from dune_hdd_tpu.la.multigrid import (
    MultigridHierarchy,
    build_dg_prolongation,
    mg_preconditioner,
)
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks


def _laplace_system(refinements):
    grid = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=refinements)
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(bi.dirichlet_faces)[0]
    lam, kap = ConstantFunction(1.0), constant_matrix(1.0)
    vol = elliptic_cell_matrices(space, lam, kap)
    ib, bb = swipdg_face_blocks(space, lam, kap, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, Testcase1Force()).reshape(-1)
    return grid, A, b


def test_block_ell_matches_scalar_ell():
    """Block-ELL matvec equals the generic SWIPDG assembly."""
    from dune_hdd_tpu.discretizations import SWIPDGDiscretization
    from dune_hdd_tpu.problems import ESV2007Problem

    grid, A, b = _laplace_system(2)
    d = SWIPDGDiscretization(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"}, ESV2007Problem(),
        only_these_products=(),
    )
    A_ref = d.freeze_operator({})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=b.shape[0]))
    np.testing.assert_allclose(
        np.asarray(A.matvec(x)), np.asarray(A_ref.matvec(x)), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(d.freeze_rhs({})), atol=1e-12)


def test_prolongation_exact_for_linears():
    coarse = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    from dune_hdd_tpu.grid import bisect

    fine, _ = bisect(coarse)
    space_f = dg_space(fine)
    prol = build_dg_prolongation(coarse, fine, space_f)
    lin = lambda g: (2.0 * g.cell_vertices[..., 0] - g.cell_vertices[..., 1]).reshape(-1)
    x_c = jnp.asarray(lin(coarse))
    np.testing.assert_allclose(np.asarray(prol.prolong(x_c)), lin(fine), atol=1e-12)


@pytest.mark.slow
def test_mg_beats_jacobi_on_laplace():
    grids = [alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=b) for b in (4, 2, 0)]
    grid, A, b = _laplace_system(4)
    h = MultigridHierarchy(grids, A)
    M = mg_preconditioner(h)
    _, res_mg = block_cg(A, b, tol=1e-10, maxiter=25, M=M)
    _, res_jac = block_cg(A, b, tol=1e-10, maxiter=25)
    assert float(res_mg) < 1e-9
    assert float(res_mg) < float(res_jac) * 1e-2


@pytest.mark.slow
def test_vcycle_alone_converges():
    grids = [alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=b) for b in (2, 0)]
    grid, A, b = _laplace_system(2)
    h = MultigridHierarchy(grids, A)
    x = jnp.zeros_like(b)
    for _ in range(20):
        r = b - A.matvec(x)
        x = x + h.v_cycle(r)
    rel = float(jnp.linalg.norm(b - A.matvec(x)) / jnp.linalg.norm(b))
    assert rel < 1e-4  # rho ~ 0.6 per cycle -> ~4e-5 after 20


def test_block_ell_from_sparse_and_solve_fn():
    """Scalar-ELL -> block-ELL conversion and the jitted online solve path
    agree with the direct solver."""
    import jax.numpy as jnp

    from dune_hdd_tpu.discretizations import SWIPDGDiscretization
    from dune_hdd_tpu.la.block_ell import block_ell_from_sparse
    from dune_hdd_tpu.problems import ThermalblockProblem
    from dune_hdd_tpu.grid import alu_cube_grid

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = SWIPDGDiscretization(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"},
        ThermalblockProblem((2, 2)), only_these_products=(),
    )
    mu = {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 2.0])}
    A = d.freeze_operator(mu)
    Ab = block_ell_from_sparse(d.space, A)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=d.space.num_dofs))
    np.testing.assert_allclose(np.asarray(Ab.matvec(x)), np.asarray(A.matvec(x)), atol=1e-10)

    solve_fn, thetas = d.make_solve_fn(tol=1e-12, maxiter=5000)
    u, res = solve_fn(*thetas(mu))
    u_ref = d.solve(mu, options={"type": "direct"})
    assert float(res) < 1e-10
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-8)
