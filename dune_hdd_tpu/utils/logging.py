"""Logging + phase timing (Stuff::Common::Logger / DSC::TimedLogger analog).

The reference wires LOG_CONSOLE|INFO|DEBUG|FILE flags from the [logging]
config section (discreteproblem.hh:104-115) and wraps every phase in
Dune::Timer with "... done (took Xs)" lines (survey 5.1).  Here: a thin
logging.Logger wrapper with the same flag surface, a ``timed`` context
manager for phase lines, and a process-wide registry of phase timings for
profiling reports (the north-star assembled-DoF/s metrics).
"""
from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager
from typing import Dict, List, Optional

__all__ = ["create_logger", "timed", "timings", "reset_timings", "TimedLogger"]

_TIMINGS: Dict[str, List[float]] = {}


def create_logger(config: Optional[dict] = None, name: str = "dune_hdd_tpu") -> logging.Logger:
    """[logging] flags: info / debug / file (discreteproblem.hh:104-115)."""
    cfg = dict(config or {})
    logger = logging.getLogger(name)
    logger.handlers.clear()
    level = logging.WARNING
    if cfg.get("debug"):
        level = logging.DEBUG
    elif cfg.get("info", True):
        level = logging.INFO
    logger.setLevel(level)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(handler)
    if cfg.get("file"):
        fh = logging.FileHandler(str(cfg.get("filename", name + ".log")))
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
    return logger


@contextmanager
def timed(phase: str, logger: Optional[logging.Logger] = None, sync=None):
    """Phase timer emitting the reference's "<phase>... done (took Xs)" lines;
    ``sync`` may be a jax array / callable to block on before stopping the
    clock (device-accurate timings)."""
    if logger:
        logger.info(f"{phase}...")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            obj = sync() if callable(sync) else sync
            if hasattr(obj, "block_until_ready"):
                obj.block_until_ready()
        dt = time.perf_counter() - t0
        _TIMINGS.setdefault(phase, []).append(dt)
        if logger:
            logger.info(f"{phase}... done (took {dt:.3f}s)")


def timings() -> Dict[str, List[float]]:
    return dict(_TIMINGS)


def reset_timings():
    _TIMINGS.clear()


class TimedLogger:
    """DSC::TimedLogger-style scoped logger with elapsed-time prefixes."""

    def __init__(self, name: str = "dune_hdd_tpu", info: bool = True, debug: bool = False):
        self._logger = create_logger({"info": info, "debug": debug}, name)
        self._t0 = time.perf_counter()

    def _prefix(self) -> str:
        return f"[{time.perf_counter() - self._t0:8.3f}s] "

    def info(self, msg: str):
        self._logger.info(self._prefix() + msg)

    def debug(self, msg: str):
        self._logger.debug(self._prefix() + msg)

    def warn(self, msg: str):
        self._logger.warning(self._prefix() + msg)
