"""SoA stencil operator (la/stencil.py): plane-layout matvec, smoothers and
two-level deflation must reproduce the gather/slice paths bit-for-bit (up to
f32 reassociation), and the refined solve must reach a true 1e-6 residual on
the high-contrast SPE10 system."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.bench_harness import _FORCES, _field_tensor_function
from dune_hdd_tpu.functions.base import (
    ConstantFunction,
    IndicatorFunction,
    ScaledFunction,
    SumFunction,
)
from dune_hdd_tpu.functions.spe10 import _synthetic_model1_field
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import (
    block_jacobi_preconditioner,
    build_block_ell,
    symmetric_diagonal_scaling,
    StructuredBlockEll,
)
from dune_hdd_tpu.la.deflation import structured_deflation_preconditioner
from dune_hdd_tpu.la.stencil import (
    StencilBlockEll,
    chebyshev_smoother,
    jacobi_smoother,
    soa_index_maps,
    stencil_deflation_preconditioner,
    stencil_refined_solve,
)
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL

MACRO = (50, 10)


@pytest.fixture(scope="module")
def system():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=2)
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(bi.dirichlet_faces)[0]
    dfac = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    tensor = _field_tensor_function(jnp.asarray(_synthetic_model1_field()))
    vol = elliptic_cell_matrices(space, dfac, tensor)
    ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
    A_s, b_s, s = symmetric_diagonal_scaling(A, b)
    A32 = A_s.with_blocks(A_s.blocks.astype(jnp.float32))
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    assert order is not None
    return grid, A32, b_s.astype(jnp.float32), order


def to_soa(order, x, nd):
    maps = soa_index_maps(order, nd)
    KY, KX = order.lattice
    return x[jnp.asarray(maps.to_soa)].reshape(nd, 8, KY, KX)


def from_soa(order, X):
    nd = X.shape[0]
    maps = soa_index_maps(order, nd)
    return X.reshape(-1)[jnp.asarray(maps.from_soa)]


def test_matvec_matches_gather_path(system):
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A.num_cells * A.nd), dtype=jnp.float32)
    y_ref = np.asarray(A.matvec(x))
    y = np.asarray(from_soa(order, S.matvec(to_soa(order, x, A.nd))))
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=3e-5 * np.abs(y_ref).max())


def test_symmetric_matvec_matches(system):
    """Half-storage symmetric matvec == full matvec within f32 assembly
    roundoff (the two directions of each coupling edge are assembled
    independently, so they agree only to ~1e-7 rel), and is EXACTLY
    symmetric as a bilinear form."""
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    Ssym = S.symmetrized()
    assert Ssym.sym and not S.sym
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.standard_normal((A.nd, 8) + S.lattice), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((A.nd, 8) + S.lattice), jnp.float32)
    yf = np.asarray(S.matvec(X))
    ys = np.asarray(Ssym.matvec(X))
    np.testing.assert_allclose(ys, yf, rtol=0, atol=5e-6 * np.abs(yf).max())
    # exact symmetry of the bilinear form (up to f32 reduction order)
    lhs = float(jnp.vdot(Ssym.matvec(X), Y))
    rhs = float(jnp.vdot(X, Ssym.matvec(Y)))
    assert lhs == pytest.approx(rhs, rel=1e-5)
    # pytree round trip preserves the sym flag
    leaves, tree = jax.tree_util.tree_flatten(Ssym)
    assert jax.tree_util.tree_unflatten(tree, leaves).sym


def test_refined_solve_with_symmetric_matvec(system):
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order).symmetrized()
    M = stencil_deflation_preconditioner(S, (100, 20))
    B = to_soa(order, b, A.nd)
    X, relres, iters = stencil_refined_solve(S, B, M, tol=1e-6,
                                             inner_iters=200)
    assert float(relres) <= 1e-6
    # solution also solves the UNSYMMETRIZED assembled system to ~1e-6
    # (the two operators differ within assembly roundoff)
    x = np.asarray(from_soa(order, X))
    A64 = A.with_blocks(A.blocks.astype(jnp.float64))
    r = np.asarray(b, dtype=np.float64) - np.asarray(A64.matvec(jnp.asarray(x)))
    true = np.linalg.norm(r) / np.linalg.norm(np.asarray(b, dtype=np.float64))
    assert true <= 5e-6


def test_jacobi_smoother_matches(system):
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(A.num_cells * A.nd), dtype=jnp.float32)
    z_ref = np.asarray(block_jacobi_preconditioner(A)(r))
    z = np.asarray(from_soa(order, jacobi_smoother(S)(to_soa(order, r, A.nd))))
    np.testing.assert_allclose(z, z_ref, rtol=3e-5)


@pytest.mark.parametrize("use_az", [False, True])
def test_deflation_matches_structured_path(system, use_az):
    """Plane-layout balanced two-level == la/deflation structured path."""
    grid, A, b, order = system
    A_st = StructuredBlockEll.from_block_ell(A, order)
    nd = A.nd
    M_ref = structured_deflation_preconditioner(
        A_st, order, MACRO, coarse_dtype=jnp.float32)
    assert M_ref is not None
    S = StencilBlockEll.from_block_ell(A, order)
    M = stencil_deflation_preconditioner(S, MACRO, use_az=use_az,
                                         newton_schulz=2)
    assert M is not None
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(A.num_cells * nd), dtype=jnp.float32)
    perm_flat = (np.asarray(order.inv)[:, None] * nd + np.arange(nd)).reshape(-1)
    z_ref = np.asarray(M_ref(r[jnp.asarray(perm_flat)]))
    back = (np.asarray(order.perm)[:, None] * nd + np.arange(nd)).reshape(-1)
    z = np.asarray(from_soa(order, M(to_soa(order, r, nd))))[
        np.argsort(np.arange(len(back)))]
    # both in original ordering
    z_ref_orig = z_ref[back]
    np.testing.assert_allclose(z, z_ref_orig, rtol=2e-4, atol=2e-4 * np.abs(z_ref_orig).max())


def test_chebyshev_smoother_contracts(system):
    """Chebyshev(3) reduces the Jacobi-preconditioned residual much more
    than a single Jacobi sweep and keeps CG-usable symmetry."""
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    cheb = chebyshev_smoother(S, degree=3)
    jac = jacobi_smoother(S)
    rng = np.random.default_rng(3)
    R = to_soa(order, jnp.asarray(
        rng.standard_normal(A.num_cells * A.nd), dtype=jnp.float32), A.nd)
    # error after smoothing x ~ A^{-1} R: measure residual reduction
    res_cheb = R - S.matvec(cheb(R))
    res_jac = R - S.matvec(jac(R))
    # high-frequency damping: Chebyshev must beat plain Jacobi clearly
    assert float(jnp.linalg.norm(res_cheb)) < 0.7 * float(jnp.linalg.norm(res_jac))
    # symmetry of the smoother operator: <S r1, r2> == <r1, S r2>
    R2 = to_soa(order, jnp.asarray(
        rng.standard_normal(A.num_cells * A.nd), dtype=jnp.float32), A.nd)
    lhs = float(jnp.vdot(cheb(R), R2))
    rhs = float(jnp.vdot(R, cheb(R2)))
    assert lhs == pytest.approx(rhs, rel=2e-4)


@pytest.mark.parametrize("smoother", ["jacobi", "cheb"])
def test_refined_solve_reaches_true_tol(system, smoother):
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    sm = None if smoother == "jacobi" else chebyshev_smoother(S, degree=2)
    # contrast robustness requires aggregates aligned with the 100x20 macro
    # permeability grid (cf. la/deflation.py docstring)
    M = stencil_deflation_preconditioner(S, (100, 20), smoother=sm)
    B = to_soa(order, b, A.nd)
    X, relres, iters = stencil_refined_solve(S, B, M, tol=1e-6,
                                             inner_iters=200)
    assert float(relres) <= 1e-6
    # independent f64 check in the original layout
    x = np.asarray(from_soa(order, X))
    A64 = A.with_blocks(A.blocks.astype(jnp.float64))
    r = np.asarray(b, dtype=np.float64) - np.asarray(A64.matvec(jnp.asarray(x)))
    true = np.linalg.norm(r) / np.linalg.norm(np.asarray(b, dtype=np.float64))
    assert true <= 1.5e-6
    assert int(iters) > 0


def test_refined_solve_vec64_matches_f32(system):
    """Mixed-precision inner PCG (f64 Krylov vectors, f32 matvec/M/dots —
    the 3M-DoF iteration-blowup fix, scripts/diag_3m_precision.py) reaches
    the same true 1e-6 residual and the same solution.  Its iteration WIN
    only appears at large sizes (800 vs 1500 at 3M DoF) where f32 round-off
    caps the rate; at this 48k-DoF test size the two recurrences are both
    healthy and may differ slightly either way — assert a sanity band, not
    superiority."""
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    M = stencil_deflation_preconditioner(S, (100, 20))
    B = to_soa(order, b, A.nd)
    X32, res32, it32 = stencil_refined_solve(S, B, M, tol=1e-6,
                                             inner_iters=200)
    X64, res64, it64 = stencil_refined_solve(S, B, M, tol=1e-6,
                                             inner_iters=200,
                                             vec_dtype=jnp.float64)
    assert float(res64) <= 1e-6
    assert int(it64) <= 1.5 * int(it32)
    # both converged to the same solution of the same system
    np.testing.assert_allclose(
        np.asarray(X64), np.asarray(X32), rtol=0,
        atol=1e-5 * float(jnp.abs(X32).max()))


def test_bands_blocktridiag_factored_solve_matches_dense(system):
    """The never-densify coarse path (bands -> block-tridiag -> factored
    CR; engaged for n_agg > 4096 where a dense E is unaffordable) solves
    E y = r to the same accuracy as the dense solve of `_coarse_E_banded`
    on the SPE10 coarse operator."""
    from dune_hdd_tpu.la.stencil import (
        _aggregation, _bands_to_blocktridiag, _coarse_bands,
        _coarse_E_banded, _factored_bcr_solve_from_blocks)

    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    agg = _aggregation(S, MACRO)
    E = np.asarray(_coarse_E_banded(S, agg), dtype=np.float64)
    Bb, Cb = _bands_to_blocktridiag(_coarse_bands(S, agg), agg.mx, agg.my)
    # block-tridiagonal form reproduces E exactly
    n = agg.mx * agg.my
    Ebt = np.zeros((n, n))
    for i in range(agg.mx):
        Ebt[i*agg.my:(i+1)*agg.my, i*agg.my:(i+1)*agg.my] = np.asarray(Bb[i])
        if i + 1 < agg.mx:
            Ebt[i*agg.my:(i+1)*agg.my, (i+1)*agg.my:(i+2)*agg.my] = np.asarray(Cb[i])
            Ebt[(i+1)*agg.my:(i+2)*agg.my, i*agg.my:(i+1)*agg.my] = np.asarray(Cb[i]).T
    np.testing.assert_allclose(Ebt, E, rtol=0, atol=1e-5 * np.abs(E).max())
    rng = np.random.default_rng(3)
    r = rng.standard_normal(n)
    yt = np.linalg.solve(E, r)
    solve = _factored_bcr_solve_from_blocks(Bb, Cb, agg.mx, agg.my)
    y = np.asarray(solve(jnp.asarray(r, dtype=Bb.dtype)), dtype=np.float64)
    rel = np.linalg.norm(E @ y - r) / np.linalg.norm(r)
    assert rel < 5e-4, rel
    np.testing.assert_allclose(y, yt, rtol=0, atol=1e-3 * np.abs(yt).max())


def test_block_tridiag_solve_random():
    """Block cyclic reduction == dense solve on a random SPD block
    tridiagonal system (incl. power-of-two padding, mx=10)."""
    from dune_hdd_tpu.la.stencil import _coarse_inverse, _coarse_inverse_bcr

    rng = np.random.default_rng(0)
    mx, my = 10, 4
    n = mx * my
    A = np.zeros((n, n))
    for i in range(mx):
        Bi = rng.standard_normal((my, my))
        A[i*my:(i+1)*my, i*my:(i+1)*my] = Bi @ Bi.T + 5 * np.eye(my)
        if i + 1 < mx:
            Ci = 0.3 * rng.standard_normal((my, my))
            A[i*my:(i+1)*my, (i+1)*my:(i+2)*my] = Ci
            A[(i+1)*my:(i+2)*my, i*my:(i+1)*my] = Ci.T
    E = jnp.asarray(A)
    r = jnp.asarray(rng.standard_normal(n))
    yt = np.linalg.solve(A, np.asarray(r))
    y_bcr = np.asarray(_coarse_inverse_bcr(E, mx, my, newton_schulz=2)(r))
    np.testing.assert_allclose(y_bcr, yt, rtol=0, atol=1e-5 * np.abs(yt).max())
    y_lu = np.asarray(_coarse_inverse(E, newton_schulz=2)(r))
    np.testing.assert_allclose(y_bcr, y_lu, rtol=0, atol=1e-5 * np.abs(yt).max())


def test_factored_bcr_beats_dense_inverse_on_high_contrast():
    """Factored-CR direct solves stay accurate where the dense f32 inverse +
    Newton-Schulz path diverges: on a cond ~1e7 SPD block tridiagonal
    (block scales 1e-3..1e3) the NS polish amplifies the f32 seed error
    (||I - E X0|| > 1) — the mechanism behind round 3's "exact (200,40)
    two-level converges worse" measurement at 3M DoF."""
    from dune_hdd_tpu.la.stencil import (
        _coarse_inverse_bcr, _coarse_inverse_bcr_factored)

    rng = np.random.default_rng(0)
    mx, my = 13, 5
    n = mx * my
    A = np.zeros((n, n))
    for i in range(mx):
        blk = rng.standard_normal((my, my))
        blk = blk @ blk.T + my * np.eye(my)
        s = 10.0 ** rng.integers(-3, 4)
        A[i*my:(i+1)*my, i*my:(i+1)*my] = blk * s
        if i + 1 < mx:
            Ci = 0.3 * s * rng.standard_normal((my, my))
            A[i*my:(i+1)*my, (i+1)*my:(i+2)*my] = Ci
            A[(i+1)*my:(i+2)*my, i*my:(i+1)*my] = Ci.T
    w = np.linalg.eigvalsh(A)
    A += (abs(min(w.min(), 0.0)) + 1e-3) * np.eye(n)
    E = jnp.asarray(A, dtype=jnp.float32)
    b = rng.standard_normal(n)
    bn = np.linalg.norm(b)

    def rel_res(solve):
        x = np.asarray(solve(jnp.asarray(b, jnp.float32)), dtype=np.float64)
        return np.linalg.norm(A @ x - b) / bn

    r_fact = rel_res(_coarse_inverse_bcr_factored(E, mx, my))
    r_dense = rel_res(_coarse_inverse_bcr(E, mx, my, newton_schulz=2))
    assert r_fact < 1e-2, r_fact           # direct solves stay usable
    assert r_dense > 10 * r_fact, (r_fact, r_dense)  # NS path degrades


def test_factored_bcr_matches_dense_solve_random():
    """Factored CR == dense solve on a well-conditioned block tridiagonal
    (same system as test_block_tridiag_solve_random)."""
    from dune_hdd_tpu.la.stencil import _coarse_inverse_bcr_factored

    rng = np.random.default_rng(0)
    mx, my = 10, 4
    n = mx * my
    A = np.zeros((n, n))
    for i in range(mx):
        Bi = rng.standard_normal((my, my))
        A[i*my:(i+1)*my, i*my:(i+1)*my] = Bi @ Bi.T + 5 * np.eye(my)
        if i + 1 < mx:
            Ci = 0.3 * rng.standard_normal((my, my))
            A[i*my:(i+1)*my, (i+1)*my:(i+2)*my] = Ci
            A[(i+1)*my:(i+2)*my, i*my:(i+1)*my] = Ci.T
    E = jnp.asarray(A)
    r = jnp.asarray(rng.standard_normal(n))
    yt = np.linalg.solve(A, np.asarray(r))
    y = np.asarray(_coarse_inverse_bcr_factored(E, mx, my)(r))
    np.testing.assert_allclose(y, yt, rtol=0, atol=1e-5 * np.abs(yt).max())


def test_coarse_bcr_on_spe10_coarse_operator(system):
    """BCR inverse quality matches the LU path on the high-contrast SPE10
    coarse operator (the production preconditioner build path)."""
    from dune_hdd_tpu.la.stencil import (
        _aggregation, _coarse_E_banded, _coarse_inverse, _coarse_inverse_bcr)

    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    agg = _aggregation(S, MACRO)
    E = _coarse_E_banded(S, agg)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(E.shape[0]), dtype=jnp.float64)
    yt = np.linalg.solve(np.asarray(E, dtype=np.float64), np.asarray(r))
    y = np.asarray(_coarse_inverse_bcr(E, agg.mx, agg.my, newton_schulz=2)(r))
    np.testing.assert_allclose(y, yt, rtol=0, atol=2e-5 * np.abs(yt).max())


def test_stencil_cg_solver_option():
    """"stencil_cg" routes SWIPDG solves through the SoA plane layout on
    structured grids and falls back to block_cg on unstructured ones.

    mu components stay <= penalty_mu (= ones): the penalty-frozen scheme
    loses coercivity for components above the reference parameter (the
    frozen system at mu=(..,2.0) is measurably indefinite — CG-class
    solvers are out of contract there; the reference's AMG/BiCGStab
    options have the same caveat)."""
    from dune_hdd_tpu.discretizations import SWIPDGDiscretization
    from dune_hdd_tpu.grid.structured import rectangle_grid
    from dune_hdd_tpu.problems import ThermalblockProblem

    mu = {"diffusion_factor": jnp.array([0.1, 1.0, 0.5, 0.3])}
    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=2)
    d = SWIPDGDiscretization(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"},
                             ThermalblockProblem((2, 2)))
    u = d.solve(mu, options={"type": "stencil_cg", "precision": 1e-12})
    u_ref = d.solve(mu, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-8)
    # with a tiling macro the deflation path engages
    u2 = d.solve(mu, options={"type": "stencil_cg", "precision": 1e-12,
                              "macro": (4, 4)})
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref), atol=1e-8)
    # unstructured (odd-bisection) grid: silent fallback to block_cg
    g2 = rectangle_grid((0, 0), (1, 1), (5, 5), "quad")
    d2 = SWIPDGDiscretization(g2, {"type": "stuff.grid.boundaryinfo.alldirichlet"},
                              ThermalblockProblem((2, 2)))
    u3 = d2.solve(mu, options={"type": "stencil_cg", "precision": 1e-12})
    u3_ref = d2.solve(mu, options={"type": "direct"})
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u3_ref), atol=1e-7)


def test_weighted_deflation_unit_weight_matches(system):
    """Z_w with w = 1 is exactly the constant space: the weighted code path
    (pairing sums, AZ planes, wsum/wbcast) must reproduce the unweighted
    preconditioner up to f32 reassociation, for both AZ modes."""
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    ones = jnp.ones((A.nd, 8) + S.lattice, jnp.float32)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((A.nd, 8) + S.lattice), jnp.float32)
    for use_az in (False, True):
        M0 = stencil_deflation_preconditioner(S, MACRO, use_az=use_az,
                                              newton_schulz=2)
        Mw = stencil_deflation_preconditioner(S, MACRO, use_az=use_az,
                                              newton_schulz=2, weight=ones)
        z0 = np.asarray(M0(r))
        zw = np.asarray(Mw(r))
        np.testing.assert_allclose(zw, z0, rtol=0,
                                   atol=5e-5 * np.abs(z0).max())


def test_weighted_deflation_symmetric(system):
    """M stays a symmetric bilinear form with a non-trivial weight (PCG
    contract), in both two-level and three-level mode."""
    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    KY, KX = S.lattice
    rng = np.random.default_rng(4)
    w = jnp.asarray(
        0.5 + rng.random((A.nd, 8, KY, KX)), jnp.float32)
    r1 = jnp.asarray(rng.standard_normal((A.nd, 8, KY, KX)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((A.nd, 8, KY, KX)), jnp.float32)
    mid = (KX // 2, KY // 2) if (KX % (2 * MACRO[0]) == 0
                                 and KY % (2 * MACRO[1]) == 0) else None
    for mid_shape in {None, mid}:
        M = stencil_deflation_preconditioner(S, MACRO, newton_schulz=2,
                                             mid_shape=mid_shape, weight=w)
        assert M is not None
        lhs = float(jnp.vdot(M(r1), r2))
        rhs = float(jnp.vdot(r1, M(r2)))
        assert lhs == pytest.approx(rhs, rel=5e-4)


def test_weighted_deflation_beats_unweighted_on_contrast(system):
    """On the diagonally-scaled SPE10 system the constant coarse space
    misses the near-kernel (D^{1/2} 1); the w = 1/s weighted space restores
    it — measured at 3M DoF: kappa(M A) 3884 -> 336, iters 437 -> 141.
    Locks the small-size version: strictly fewer PCG iterations AND true
    convergence."""
    from dune_hdd_tpu.bench_harness import _FORCES
    from dune_hdd_tpu.la.stencil import stencil_pcg
    from dune_hdd_tpu.la.stencil_assembly import (
        assemble_structured_spe10, build_structured_assembly,
        precompute_coefficient, scale_planes, structured_rhs)

    grid, A, b, order = system
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    dfac = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    splan = build_structured_assembly(grid, order, bi)
    KY, KX = order.lattice
    field = jnp.asarray(_synthetic_model1_field(), jnp.float32)
    NZ, NX = field.shape[1], field.shape[0]
    fy, fx = KY // NZ, KX // NX
    cf2d = jnp.broadcast_to(
        field.T[:, None, :, None], (NZ, fy, NX, fx)).reshape(KY, KX)
    S0 = assemble_structured_spe10(
        splan, precompute_coefficient(splan, dfac),
        jnp.broadcast_to(cf2d[None], (8, KY, KX)))
    B0 = structured_rhs(splan, IndicatorFunction(_FORCES))
    S, B, s = scale_planes(S0, B0)
    w = 1.0 / s
    M0 = stencil_deflation_preconditioner(S, MACRO, newton_schulz=2)
    Mw = stencil_deflation_preconditioner(S, MACRO, newton_schulz=2, weight=w)
    bn = float(jnp.linalg.norm(B))
    rhs = B / jnp.float32(bn)
    _, it0 = stencil_pcg(S, rhs, M0, rtol=1e-5, maxiter=2000, unroll=1)
    Xw, itw = stencil_pcg(S, rhs, Mw, rtol=1e-5, maxiter=2000, unroll=1)
    assert int(itw) < 0.6 * int(it0), (int(itw), int(it0))
    r64 = (rhs.astype(jnp.float64)
           - S.astype(jnp.float64).matvec(Xw.astype(jnp.float64)))
    assert float(jnp.linalg.norm(r64)) <= 1e-4


def test_multilevel_mid_chain(system):
    """The recursive multi-level mid chain (``_multilevel_inverse``):
    symmetric SPD operator, and PCG with the full chain converges to a true
    residual like the single-mid version (needed at 12M+ DoF where one mid
    leaves a factor-8 gap to the exact macro level)."""
    from dune_hdd_tpu.la.stencil import stencil_pcg

    grid, A, b, order = system
    S = StencilBlockEll.from_block_ell(A, order)
    KY, KX = S.lattice  # (40, 200)
    macro = (25, 5)     # exact level, factor 8 from fine
    chain = [(KX // 2, KY // 2), (KX // 4, KY // 4)]  # gaps 2, 2, 2
    rng = np.random.default_rng(7)
    r1 = jnp.asarray(rng.standard_normal((A.nd, 8, KY, KX)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((A.nd, 8, KY, KX)), jnp.float32)
    M = stencil_deflation_preconditioner(S, macro, newton_schulz=2,
                                         mid_shape=chain)
    assert M is not None
    # symmetry (PCG contract)
    lhs = float(jnp.vdot(M(r1), r2))
    rhs_ = float(jnp.vdot(r1, M(r2)))
    assert lhs == pytest.approx(rhs_, rel=5e-4)
    # convergence to a true residual
    bn = float(jnp.linalg.norm(b))
    Bs = StencilBlockEll.from_block_ell(A, order)  # noqa: F841 (layout)
    from dune_hdd_tpu.la.stencil import soa_index_maps
    maps = soa_index_maps(order, A.nd)
    B = (b / bn)[jnp.asarray(maps.to_soa)].reshape(A.nd, 8, KY, KX)
    # quality bar: the chain must match the single-mid preconditioner on
    # this (unweighted-space) system — same true-residual floor (the f32
    # floor without the weighted space, ~5e-4 here; the production path
    # adds the weight + f64 refinement) and comparable iterations
    X, it = stencil_pcg(S, B, M, rtol=1e-5, maxiter=2000, unroll=1)
    r64 = (B.astype(jnp.float64)
           - S.astype(jnp.float64).matvec(X.astype(jnp.float64)))
    res_chain = float(jnp.linalg.norm(r64))
    M1 = stencil_deflation_preconditioner(S, macro, newton_schulz=2,
                                          mid_shape=chain[0])
    X1, it1 = stencil_pcg(S, B, M1, rtol=1e-5, maxiter=2000, unroll=1)
    r64_1 = (B.astype(jnp.float64)
             - S.astype(jnp.float64).matvec(X1.astype(jnp.float64)))
    res_single = float(jnp.linalg.norm(r64_1))
    assert res_chain <= 3 * max(res_single, 1e-6), (res_chain, res_single)
    assert int(it) <= 2 * int(it1), (int(it), int(it1))


def test_select_mid_level_builds_chain():
    """Auto mid selection (round-5 rule): mids anchored at 4x the macro
    lattice, factor-4 steps toward fine until the fine-to-mid gap is <= 4.
    Measured at 12M (scripts/bench_sweep12m.py): the single (400, 80) mid
    beats the factor-2-from-fine chain on wall time (2.62 s vs 5.26 s) —
    the chain's deeper level stack is latency-bound per M apply."""
    import os as _os
    from unittest import mock

    from dune_hdd_tpu.bench_harness import _select_mid_level

    with mock.patch.dict(_os.environ, {}, clear=False):
        _os.environ.pop("BENCH_MID", None)
        # 3M lattice (KY=160, KX=800), macro (100, 20): one mid at 4x macro
        mid, _ = _select_mid_level(160, 800, (100, 20))
        assert mid == (400, 80)
        # 12M lattice (KY=320, KX=1600): still the single 4x-macro mid
        # (fine-to-mid gap exactly 4)
        mid, _ = _select_mid_level(320, 1600, (100, 20))
        assert mid == (400, 80)
        # 49M lattice (KY=640, KX=3200): gap 8 -> insert the 16x-macro mid
        mid, _ = _select_mid_level(640, 3200, (100, 20))
        assert mid == [(1600, 320), (400, 80)]
        # 768k (KY=80, KX=400): factor 4 -> no mid
        mid, _ = _select_mid_level(80, 400, (100, 20))
        assert mid is None
    # explicit chain parsing
    with mock.patch.dict(_os.environ, {"BENCH_MID": "800,160;400,80"}):
        mid, _ = _select_mid_level(320, 1600, (100, 20))
        assert mid == [(800, 160), (400, 80)]
