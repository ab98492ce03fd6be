import numpy as np
import pytest

from dune_hdd_tpu.grid import (
    Grid,
    GridHierarchy,
    GridProviders,
    make_boundary_info,
    prolong_vertex_values,
    rectangle_grid,
    refine,
)


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_rectangle_counts(cell_type):
    g = rectangle_grid((0, 0), (1, 1), (4, 3), cell_type)
    assert g.num_vertices == 5 * 4
    if cell_type == "quad":
        assert g.num_cells == 12
        assert g.num_faces == 4 * 4 + 5 * 3  # horizontal + vertical edges
    else:
        assert g.num_cells == 24
        assert g.num_faces == 4 * 4 + 5 * 3 + 12  # + one diagonal per square


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_geometry(cell_type):
    g = rectangle_grid((-1, -1), (1, 1), (4, 4), cell_type)
    assert g.cell_volumes.sum() == pytest.approx(4.0)
    # normals are unit and point outward on the boundary
    n = g.face_normals
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0)
    bnd = g.boundary_faces
    centers = g.face_centroids[bnd]
    outward = n[bnd]
    # on the boundary of [-1,1]^2, outward normal matches the face position
    on_right = np.abs(centers[:, 0] - 1) < 1e-12
    assert np.all(outward[on_right, 0] > 0.99)


def test_face_cell_consistency():
    g = rectangle_grid((0, 0), (1, 1), (3, 3), "triangle")
    # each interior face has two distinct cells; local indices point back at it
    for f in range(g.num_faces):
        cin, cout = g.face_cells[f]
        assert cin >= 0
        assert g.cell_faces[cin, g.face_local[f, 0]] == f
        if cout >= 0:
            assert g.cell_faces[cout, g.face_local[f, 1]] == f


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_refine_nested(cell_type):
    g = rectangle_grid((0, 0), (2, 1), (2, 2), cell_type)
    fine, info = refine(g)
    assert fine.num_cells == 4 * g.num_cells
    assert fine.cell_volumes.sum() == pytest.approx(g.cell_volumes.sum())
    # coarse vertices preserved
    np.testing.assert_allclose(fine.vertices[: g.num_vertices], g.vertices)
    # midpoint consistency
    vp = info.vertex_parents
    np.testing.assert_allclose(
        fine.vertices, 0.5 * (fine.vertices[vp[:, 0]] + fine.vertices[vp[:, 1]])
    )


def test_prolongation_exact_for_linear():
    g = rectangle_grid((0, 0), (1, 1), (3, 3), "triangle")
    h = GridHierarchy(g, 2)
    lin = lambda v: 2.0 * v[:, 0] - 3.0 * v[:, 1] + 1.0
    vals = lin(h[0].vertices)
    vals = prolong_vertex_values(vals, h.info(0))
    vals = prolong_vertex_values(vals, h.info(1))
    np.testing.assert_allclose(vals, lin(h[2].vertices), atol=1e-12)


def test_boundary_info():
    g = rectangle_grid((0, 0), (1, 1), (4, 4), "quad")
    bi = make_boundary_info(g, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    assert bi.dirichlet_faces.sum() == 16
    assert bi.neumann_faces.sum() == 0
    bi2 = make_boundary_info(
        g,
        {
            "type": "stuff.grid.boundaryinfo.normalbased",
            "default": "dirichlet",
            "neumann": [[-1.0, 0.0], [1.0, 0.0]],
        },
    )
    assert bi2.neumann_faces.sum() == 8
    assert bi2.dirichlet_faces.sum() == 8
    assert not (bi2.neumann_faces & bi2.dirichlet_faces).any()


def test_grid_provider():
    g = GridProviders.create(
        "stuff.grid.provider.cube",
        {"lower_left": -1, "upper_right": 1, "num_elements": 4, "num_refinements": 1},
    )
    assert g.num_cells == 2 * 8 * 8
