"""Auxiliary subsystems: logging/timing (survey 5.1), config (5.6), vtk (5.5)."""
import logging
import os

import numpy as np
import pytest

from dune_hdd_tpu.utils.config import Configuration
from dune_hdd_tpu.utils.logging import TimedLogger, create_logger, reset_timings, timed, timings
from dune_hdd_tpu.utils.vtk import write_cell_data_vtu, write_vtu


def test_timed_records_phases():
    reset_timings()
    with timed("phase.a"):
        pass
    with timed("phase.a"):
        pass
    with timed("phase.b"):
        pass
    t = timings()
    assert len(t["phase.a"]) == 2
    assert len(t["phase.b"]) == 1
    assert all(v >= 0 for v in t["phase.a"])
    reset_timings()
    assert timings() == {}


def test_timed_logger_emits(capsys):
    log = TimedLogger("test_timed_logger")
    log.info("hello")
    out = capsys.readouterr().out
    assert "hello" in out and "s] " in out


def test_logger_flags():
    log = create_logger({"info": False}, "quiet_logger")
    assert log.level == logging.WARNING
    log = create_logger({"debug": True}, "debug_logger")
    assert log.level == logging.DEBUG


def test_config_merge_and_sections(tmp_path):
    a = Configuration({"grid.type": "cube", "grid.num_elements": [4, 4]})
    b = Configuration({"problem.type": "ESV2007"})
    a.add(b)
    assert a["problem.type"] == "ESV2007"
    a.add(Configuration({"inner": 1}), sub_name="nested.deep")
    assert a["nested.deep.inner"] == 1
    # comments and blank lines are ignored on parse
    text = "# comment\n[grid]\ntype = cube # trailing\n\nnum = 3\n"
    cfg = Configuration.from_string(text)
    assert cfg["grid.type"] == "cube"
    assert cfg["grid.num"] == 3


def test_vtk_writers(tmp_path):
    from dune_hdd_tpu.grid import rectangle_grid
    from dune_hdd_tpu.ops.spaces import cg_space, dg_space

    g = rectangle_grid((0, 0), (1, 1), (3, 3), "triangle")
    cgp = write_vtu(cg_space(g), np.arange(g.num_vertices, dtype=float),
                    str(tmp_path / "cg"))
    dgp = write_vtu(dg_space(g), np.arange(g.num_cells * 3, dtype=float),
                    str(tmp_path / "dg"))
    cp = write_cell_data_vtu(g, {"eta": np.ones(g.num_cells)}, str(tmp_path / "cells"))
    for p in (cgp, dgp, cp):
        assert os.path.isfile(p)
        text = open(p).read()
        assert "<VTKFile" in text and "</VTKFile>" in text
    assert "eta" in open(cp).read()


def test_write_vtu_p2(tmp_path):
    """P2 spaces are written as VTK quadratic triangles (type 22) with the
    matching corner/edge-midpoint node order (beyond the reference's
    P1-only writers)."""
    import jax.numpy as jnp

    from dune_hdd_tpu.grid import rectangle_grid
    from dune_hdd_tpu.ops.spaces import cg_space, dg_space
    from dune_hdd_tpu.utils.vtk import write_vtu

    g = rectangle_grid((0, 0), (1, 1), (2, 2), "triangle")
    for space in (cg_space(g, 2), dg_space(g, 2)):
        u = jnp.arange(space.num_dofs, dtype=jnp.float64)
        path = write_vtu(space, u, str(tmp_path / f"p2_{space.continuous}"))
        text = open(path).read()
        import re

        types = re.search(
            r'Name="types" format="ascii">\s*([\d ]+)', text
        ).group(1).split()
        assert set(types) == {"22"}
        conn = re.search(
            r'Name="connectivity" format="ascii">\s*([\d ]+)', text
        ).group(1).split()
        assert len(conn) == g.num_cells * 6


def test_profiler_trace_and_annotations(tmp_path):
    """utils/profiling.py: jax.profiler trace capture writes a trace dir;
    annotate() lands in the phase registry; profile_report() aggregates."""
    import jax
    import jax.numpy as jnp

    from dune_hdd_tpu.utils.logging import reset_timings, timings
    from dune_hdd_tpu.utils.profiling import annotate, profile_report, trace

    reset_timings()
    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x * 2.0).sum())
    with trace(logdir):
        with annotate("hot_phase"):
            float(f(jnp.ones((64, 64))))
    import os

    found = []
    for root, dirs, files in os.walk(logdir):
        found += [fn for fn in files if fn.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, "no trace artifacts written"
    assert "hot_phase" in timings()
    rep = profile_report(reset=True)
    assert "hot_phase" in rep and "calls" in rep
    assert timings() == {}


def test_vtu_high_order_types(tmp_path):
    """write_vtu handles P2/Q2/P3 spaces (quadratic triangle 22,
    biquadratic quad 28, Lagrange triangle 69) without crashing and with
    matching point/value counts."""
    import numpy as np

    from dune_hdd_tpu.grid import rectangle_grid
    from dune_hdd_tpu.ops.spaces import cg_space, dg_space
    from dune_hdd_tpu.utils.vtk import write_vtu

    cases = [
        (rectangle_grid((0, 0), (1, 1), (2, 2), "triangle"), 2),
        (rectangle_grid((0, 0), (1, 1), (2, 2), "quad"), 2),
        (rectangle_grid((0, 0), (1, 1), (2, 2), "triangle"), 3),
    ]
    for i, (g, order) in enumerate(cases):
        for mk in (cg_space, dg_space):
            s = mk(g, order)
            u = np.arange(s.num_dofs, dtype=float)
            path = write_vtu(s, u, str(tmp_path / f"ho_{i}_{mk.__name__}"))
            txt = open(path).read()
            assert "UnstructuredGrid" in txt
