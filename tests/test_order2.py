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
