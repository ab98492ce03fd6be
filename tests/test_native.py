"""Native C++ host kernels vs the numpy fallback."""
import numpy as np
import pytest

from dune_hdd_tpu.grid.structured import Grid, _build_connectivity, rectangle_grid
from dune_hdd_tpu.native import build_connectivity, dedup_pattern, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_connectivity_matches_numpy():
    g = rectangle_grid((0, 0), (1, 1), (7, 5), "triangle")
    out = build_connectivity(g.cells)
    assert out is not None
    faces, cell_faces, face_cells, face_local = out
    # same number of faces, and the same set of (sorted) vertex pairs
    assert len(faces) == g.num_faces
    ours = set(map(tuple, np.sort(faces, axis=1).tolist()))
    ref = set(map(tuple, np.sort(g.faces, axis=1).tolist()))
    assert ours == ref
    # a consistent Grid can be built on the native connectivity
    g2 = Grid(vertices=g.vertices, cells=g.cells, cell_type="triangle",
              faces=faces, cell_faces=cell_faces, face_cells=face_cells,
              face_local=face_local)
    assert g2.cell_volumes.sum() == pytest.approx(1.0)
    for f in range(g2.num_faces):
        cin, cout = g2.face_cells[f]
        assert g2.cell_faces[cin, g2.face_local[f, 0]] == f
        if cout >= 0:
            assert g2.cell_faces[cout, g2.face_local[f, 1]] == f


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_dedup_matches_numpy():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, 1000)
    cols = rng.integers(0, 50, 1000)
    keys = rows * 50 + cols
    out = dedup_pattern(keys)
    assert out is not None
    perm, seg_ids, slot_keys = out
    np.testing.assert_array_equal(np.sort(keys), keys[perm])
    np.testing.assert_array_equal(slot_keys, np.unique(keys))
    # segment ids map sorted entries to their slot
    np.testing.assert_array_equal(slot_keys[seg_ids], keys[perm])


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_grid_end_to_end():
    """A grid built through the native path solves identically."""
    import os

    os.environ["DUNE_HDD_TPU_NATIVE"] = "1"
    try:
        from dune_hdd_tpu.discretizations import SWIPDGDiscretization
        from dune_hdd_tpu.grid import alu_cube_grid
        from dune_hdd_tpu.ops import error_norms
        from dune_hdd_tpu.problems import ESV2007Problem
        from dune_hdd_tpu.functions import Testcase1ExactSolution

        g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
        d = SWIPDGDiscretization(
            g, {"type": "stuff.grid.boundaryinfo.alldirichlet"}, ESV2007Problem()
        )
        u = d.solve(options={"type": "direct"})
        e = error_norms(d.space, u, Testcase1ExactSolution())
        assert e["L2"] == pytest.approx(1.83e-2, rel=5e-3)
    finally:
        os.environ.pop("DUNE_HDD_TPU_NATIVE", None)
