"""Order-2 (P2) spaces: the reference's polynomialOrder template parameter
(discretizations/cg.hh order k, swipdg.hh polynomialOrder; SIPDG sigma
constants for p2)."""
import numpy as np
import pytest

from dune_hdd_tpu.discretizations import CGDiscretization, SWIPDGDiscretization
from dune_hdd_tpu.functions import Testcase1ExactSolution
from dune_hdd_tpu.grid import alu_cube_grid, rectangle_grid, refine
from dune_hdd_tpu.ops import error_norms
from dune_hdd_tpu.ops.spaces import cg_space, dg_space
from dune_hdd_tpu.problems import ESV2007Problem

ALL_DIRICHLET = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


def test_p2_space_structure():
    g = rectangle_grid((0, 0), (1, 1), (2, 2), "triangle")
    s = cg_space(g, 2)
    assert s.shape_count == 6
    assert s.num_dofs == g.num_vertices + g.num_faces
    d = dg_space(g, 2)
    assert d.num_dofs == g.num_cells * 6
    # partition of unity and nodal property at the 6 nodal points
    import jax.numpy as jnp

    pts = jnp.asarray(s.nodal_points)
    vals = s.shape_values(jnp.asarray(g.cell_vertices), pts)  # [NC, 6, 6]
    np.testing.assert_allclose(np.asarray(vals.sum(-1)), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(vals), np.broadcast_to(np.eye(6), vals.shape), atol=1e-12
    )


@pytest.mark.parametrize("disc_cls", [CGDiscretization, SWIPDGDiscretization])
def test_p2_esv2007_eoc(disc_cls):
    problem, exact = ESV2007Problem(), Testcase1ExactSolution()
    errors = []
    grid = rectangle_grid((-1, -1), (1, 1), (4, 4), "triangle")
    for _ in range(3):
        d = disc_cls(grid, ALL_DIRICHLET, problem, order=2)
        if disc_cls is CGDiscretization:
            u = d.solve_with_dirichlet_shift(options={"type": "direct"})
        else:
            u = d.solve(options={"type": "direct"})
        errors.append(error_norms(d.space, u, exact))
        grid, _ = refine(grid)
    l2 = [e["L2"] for e in errors]
    h1 = [e["H1_semi"] for e in errors]
    eoc_l2 = [np.log2(l2[i] / l2[i + 1]) for i in range(2)]
    eoc_h1 = [np.log2(h1[i] / h1[i + 1]) for i in range(2)]
    assert all(r > 2.8 for r in eoc_l2), (l2, eoc_l2)
    assert all(r > 1.9 for r in eoc_h1), (h1, eoc_h1)
    # P2 is far more accurate than P1 at the same grid
    assert l2[0] < 2e-2


def test_q2_space_structure():
    g = rectangle_grid((0, 0), (1, 1), (2, 2), "quad")
    s = cg_space(g, 2)
    assert s.shape_count == 9
    assert s.num_dofs == g.num_vertices + g.num_faces + g.num_cells
    d = dg_space(g, 2)
    assert d.num_dofs == g.num_cells * 9
    # partition of unity + nodal property at the 9 nodal points
    import jax.numpy as jnp

    pts = jnp.asarray(s.nodal_points)
    vals = s.shape_values(jnp.asarray(g.cell_vertices), pts)  # [NC, 9, 9]
    np.testing.assert_allclose(np.asarray(vals.sum(-1)), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(vals), np.broadcast_to(np.eye(9), vals.shape), atol=1e-12
    )
    # CG dof map is conforming: shared faces share edge dofs
    cd = s.cell_dofs
    for f in range(g.num_faces):
        cells = [c for c in range(g.num_cells) if f in g.cell_faces[c]]
        dofs = {int(cd[c][4 + list(g.cell_faces[c]).index(f)]) for c in cells}
        assert len(dofs) == 1


@pytest.mark.parametrize("disc_cls", [CGDiscretization, SWIPDGDiscretization])
def test_q2_esv2007_eoc(disc_cls):
    """Q2 on quads (reference instantiates arbitrary polOrder via the
    cg.hh:95 template; completes order-2 across both cell types)."""
    problem, exact = ESV2007Problem(), Testcase1ExactSolution()
    errors = []
    grid = rectangle_grid((-1, -1), (1, 1), (4, 4), "quad")
    for _ in range(3):
        d = disc_cls(grid, ALL_DIRICHLET, problem, order=2)
        if disc_cls is CGDiscretization:
            u = d.solve_with_dirichlet_shift(options={"type": "direct"})
        else:
            u = d.solve(options={"type": "direct"})
        errors.append(error_norms(d.space, u, exact))
        grid, _ = refine(grid)
    l2 = [e["L2"] for e in errors]
    h1 = [e["H1_semi"] for e in errors]
    eoc_l2 = [np.log2(l2[i] / l2[i + 1]) for i in range(2)]
    eoc_h1 = [np.log2(h1[i] / h1[i + 1]) for i in range(2)]
    assert all(r > 2.8 for r in eoc_l2), (l2, eoc_l2)
    assert all(r > 1.9 for r in eoc_h1), (h1, eoc_h1)
    assert l2[0] < 2e-2


@pytest.mark.slow
def test_p2_estimators_optimal_rates():
    """Beyond the reference (polOrder-1/RT0-only estimators): P2 SWIPDG with
    conforming-P2 Oswald averaging and the RT1 equilibrated flux.  Rates:
    eta_NC ~ p = 2, eta_R_* ~ p+1 = 3 (div t = Pi_P1 f), eta_DF ~ 2, and
    efficiency stays O(1) (measured 1.33 -> 1.25)."""
    from dune_hdd_tpu.estimators import SWIPDGEstimators

    rows = []
    for lvl in range(2):
        g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2 + 2 * lvl)
        d = SWIPDGDiscretization(g, ALL_DIRICHLET, ESV2007Problem(), order=2)
        u = d.solve(options={"type": "direct"})
        e = error_norms(d.space, u, Testcase1ExactSolution())
        row = {"energy": e["H1_semi"]}
        for t in ("eta_NC_ESV2007", "eta_R_ESV2007_*", "eta_DF_ESV2007", "eta_ESV2007"):
            row[t] = SWIPDGEstimators.estimate(
                d.space, d.boundary_info, d.problem, u, t)
        rows.append(row)
    r = {k: np.log2(rows[0][k] / rows[1][k]) for k in rows[0]}
    assert r["energy"] > 1.85
    assert r["eta_NC_ESV2007"] > 1.85
    assert r["eta_R_ESV2007_*"] > 2.7  # p+1 via RT1 divergence matching
    assert r["eta_DF_ESV2007"] > 1.85
    for row in rows:
        eff = row["eta_ESV2007"] / row["energy"]
        assert 1.0 <= eff < 2.0, eff


def test_rt1_divergence_matches_p1_force_projection():
    """The RT1 interior-dof construction enforces div t = Pi_{P1} f."""
    import jax.numpy as jnp

    from dune_hdd_tpu.estimators import rt1_divergence_at, rt1_flux_reconstruction
    from dune_hdd_tpu.functions import freeze_function
    from dune_hdd_tpu.ops import cell_quadrature

    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = SWIPDGDiscretization(g, ALL_DIRICHLET, ESV2007Problem(), order=2)
    u = d.solve(options={"type": "direct"})
    lam = freeze_function(d.problem.diffusion_factor)
    kap = freeze_function(d.problem.diffusion_tensor)
    force = freeze_function(d.problem.force)
    fb = np.nonzero(d.boundary_info.dirichlet_faces)[0]
    coeffs = rt1_flux_reconstruction(
        d.space, u, lam, kap, fb, np.zeros(0, dtype=int), force_fn=force)
    qp, qw = cell_quadrature(g, 6)
    div = rt1_divergence_at(g, coeffs, qp)
    f = force(qp)
    # moments of (f - div t) against {1, x, y} vanish per cell
    for mom in (jnp.ones_like(f), qp[..., 0], qp[..., 1]):
        res = jnp.einsum("ck,ck,ck->c", qw, f - div, mom)
        scale = jnp.einsum("ck,ck->c", qw, jnp.abs(f) + jnp.abs(div)) + 1e-30
        assert float(jnp.max(jnp.abs(res) / scale)) < 1e-8


def test_p3_space_structure():
    g = rectangle_grid((0, 0), (1, 1), (2, 2), "triangle")
    s = cg_space(g, 3)
    assert s.shape_count == 10
    assert s.num_dofs == g.num_vertices + 2 * g.num_faces + g.num_cells
    d = dg_space(g, 3)
    assert d.num_dofs == g.num_cells * 10
    import jax.numpy as jnp

    pts = jnp.asarray(s.nodal_points)
    vals = s.shape_values(jnp.asarray(g.cell_vertices), pts)  # [NC, 10, 10]
    np.testing.assert_allclose(np.asarray(vals.sum(-1)), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(vals), np.broadcast_to(np.eye(10), vals.shape), atol=1e-12
    )
    # CG conformity: the two cells sharing a face assign the same global
    # dofs to the same PHYSICAL points (edge orientation absorbed)
    cd = s.cell_dofs
    npnts = s.nodal_points
    pos = {}
    for c in range(g.num_cells):
        for sl in range(10):
            dof = int(cd[c, sl])
            p = tuple(np.round(npnts[c, sl], 12))
            assert pos.setdefault(dof, p) == p, (dof, pos[dof], p)


@pytest.mark.parametrize("disc_cls", [CGDiscretization, SWIPDGDiscretization])
def test_p3_esv2007_eoc(disc_cls):
    """P3 (cubic) triangles: EOC {4, 3} — the reference templates arbitrary
    polOrder (cg.hh:95); sigma constants for p3 are in ops/swipdg.py."""
    problem, exact = ESV2007Problem(), Testcase1ExactSolution()
    errors = []
    grid = rectangle_grid((-1, -1), (1, 1), (4, 4), "triangle")
    for _ in range(3):
        d = disc_cls(grid, ALL_DIRICHLET, problem, order=3)
        if disc_cls is CGDiscretization:
            u = d.solve_with_dirichlet_shift(options={"type": "direct"})
        else:
            u = d.solve(options={"type": "direct"})
        errors.append(error_norms(d.space, u, exact))
        grid, _ = refine(grid)
    l2 = [e["L2"] for e in errors]
    h1 = [e["H1_semi"] for e in errors]
    eoc_l2 = [np.log2(l2[i] / l2[i + 1]) for i in range(2)]
    eoc_h1 = [np.log2(h1[i] / h1[i + 1]) for i in range(2)]
    assert all(r > 3.7 for r in eoc_l2), (l2, eoc_l2)
    assert all(r > 2.8 for r in eoc_h1), (h1, eoc_h1)
