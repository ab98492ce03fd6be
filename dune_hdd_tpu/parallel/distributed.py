"""Multi-process (multi-host) initialisation.

The reference initialises MPI once and never communicates (survey 5.8:
discreteproblem.hh:91-95).  The TPU-native equivalent is
jax.distributed.initialize(): after it, jax.devices() spans all hosts of the
slice and every shard_map/psum in this package rides ICI/DCN transparently —
the same Mesh-based code paths tested on the single-host CPU mesh.

Single-host runs (including this repo's tests) never need to call this.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "is_distributed", "process_info"]

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed if a multi-process environment is detected
    (or explicitly described).  Safe to call multiple times / single-host
    (returns False when nothing to do).

    Resolution order: explicit arguments > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU pod auto-detection
    (argument-free initialize()).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()  # TPU pod auto-detection
        else:
            return False
    except RuntimeError:
        # already initialised by the launcher
        pass
    except ValueError:
        # env hinted multi-host but auto-detection found no coordinator
        # (e.g. tunneled single-chip setups) — run single-process
        return False
    _INITIALIZED = True
    return True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
