"""Device-level profiling: JAX profiler traces + annotations, integrated
with the phase-timing registry (utils/logging.py).

SURVEY §5.1 promises real trace integration beyond the reference's
Dune::Timer "done (took Xs)" lines.  This wraps ``jax.profiler``:

* ``trace(logdir)`` — context manager capturing a TensorBoard/XProf device
  trace of everything executed inside (view with
  ``tensorboard --logdir=<logdir>`` or xprof).
* ``annotate(name)`` — a TraceAnnotation + phase-timing span: the region
  shows up named in the device trace AND lands in ``timings()``.
* ``profile_report()`` — the registry aggregated to a printable table
  (count / total / mean per phase), the textual profile the reference's
  timer lines approximate.

The axon tunnel's remote device does not support on-device trace capture
(profiler server lives host-side); traces there contain host + dispatch
events only — full device timelines require a locally attached TPU.  The
wall-clock phase registry works everywhere.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

from .logging import _TIMINGS, timings

__all__ = ["trace", "annotate", "profile_report"]


@contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region: a jax.profiler.TraceAnnotation (visible in device
    traces) + a span in the phase-timing registry."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _TIMINGS.setdefault(name, []).append(time.perf_counter() - t0)


def profile_report(reset: bool = False) -> str:
    """Aggregate the phase registry into a table (name, calls, total, mean)."""
    rows = []
    for name, vals in sorted(timings().items()):
        rows.append((name, len(vals), sum(vals), sum(vals) / len(vals)))
    width = max([len(r[0]) for r in rows], default=10)
    lines = [f"{'phase':{width}s}  calls   total[s]    mean[s]"]
    for name, n, tot, mean in rows:
        lines.append(f"{name:{width}s}  {n:5d}  {tot:9.4f}  {mean:9.4f}")
    if reset:
        from .logging import reset_timings

        reset_timings()
    return "\n".join(lines)
