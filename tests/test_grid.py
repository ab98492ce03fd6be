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


def test_boundary_info_idbased():
    from dune_hdd_tpu.grid.boundaryinfo import boundary_id_faces

    g = rectangle_grid((0, 0), (1, 1), (4, 4), "quad")
    ids = boundary_id_faces(g)
    # cube-grid segment ids: left=1 right=2 bottom=3 top=4, interior=0
    assert set(np.unique(ids)) == {0, 1, 2, 3, 4}
    assert (ids[g.boundary_faces] > 0).all() and (ids[~g.boundary_faces] == 0).all()
    for bid in (1, 2, 3, 4):
        assert (ids == bid).sum() == 4
    centers = g.vertices[g.faces].mean(axis=1)
    np.testing.assert_allclose(centers[ids == 1, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(centers[ids == 2, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(centers[ids == 3, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(centers[ids == 4, 1], 1.0, atol=1e-12)
    # the reference's multiscale idiom: cfg["neumann"] = "7" (a string id;
    # block-swipdg.hh:119), everything else defaults to dirichlet
    bi = make_boundary_info(
        g, {"type": "stuff.grid.boundaryinfo.idbased", "neumann": "7"})
    assert bi.dirichlet_faces.sum() == 16 and bi.neumann_faces.sum() == 0
    # left/right neumann by id == left/right neumann by normal
    bi_id = make_boundary_info(
        g, {"type": "stuff.grid.boundaryinfo.idbased",
            "default": "dirichlet", "neumann": [1, 2]})
    bi_nb = make_boundary_info(
        g, {"type": "stuff.grid.boundaryinfo.normalbased",
            "default": "dirichlet", "neumann": [[-1.0, 0.0], [1.0, 0.0]]})
    np.testing.assert_array_equal(bi_id.neumann_faces, bi_nb.neumann_faces)
    np.testing.assert_array_equal(bi_id.dirichlet_faces, bi_nb.dirichlet_faces)
    # default=neumann flips the unlisted ids
    bi3 = make_boundary_info(
        g, {"type": "stuff.grid.boundaryinfo.idbased",
            "default": "neumann", "dirichlet": "3 4"})
    assert bi3.dirichlet_faces.sum() == 8 and bi3.neumann_faces.sum() == 8
    with pytest.raises(ValueError):
        make_boundary_info(
            g, {"type": "stuff.grid.boundaryinfo.idbased",
                "dirichlet": [1], "neumann": [1, 2]})


def test_grid_provider():
    g = GridProviders.create(
        "stuff.grid.provider.cube",
        {"lower_left": -1, "upper_right": 1, "num_elements": 4, "num_refinements": 1},
    )
    assert g.num_cells == 2 * 8 * 8
