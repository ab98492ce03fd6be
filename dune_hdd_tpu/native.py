"""ctypes bindings for the native host-side kernels (native/hdd_native.cpp).

Builds the shared library lazily with g++ on first use (cached next to the
source); every entry point has a vectorised-numpy fallback so the package
works without a toolchain.  Used by grid connectivity construction and
sparsity-pattern deduplication for large meshes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "build_connectivity", "dedup_pattern"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "hdd_native.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.isfile(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "libhdd_native.so")
        try:
            if not os.path.isfile(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.build_connectivity.restype = ctypes.c_int64
            lib.build_connectivity.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p, i32p,
            ]
            lib.dedup_pattern.restype = ctypes.c_int64
            lib.dedup_pattern.argtypes = [i64p, ctypes.c_int64, i64p, i32p, i64p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def build_connectivity(cells: np.ndarray):
    """Returns (faces, cell_faces, face_cells, face_local) or None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nvc = cells.shape
    max_nf = nc * nvc
    faces = np.empty((max_nf, 2), dtype=np.int32)
    cell_faces = np.empty((nc, nvc), dtype=np.int32)
    face_cells = np.empty((max_nf, 2), dtype=np.int32)
    face_local = np.empty((max_nf, 2), dtype=np.int32)
    nf = lib.build_connectivity(
        cells.reshape(-1), nc, nvc, faces.reshape(-1), cell_faces.reshape(-1),
        face_cells.reshape(-1), face_local.reshape(-1),
    )
    return (
        faces[:nf].copy(), cell_faces, face_cells[:nf].copy(), face_local[:nf].copy()
    )


def dedup_pattern(keys: np.ndarray):
    """Returns (perm, seg_ids, slot_keys) or None."""
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    e = keys.shape[0]
    perm = np.empty(e, dtype=np.int64)
    seg_ids = np.empty(e, dtype=np.int32)
    slot_keys = np.empty(e, dtype=np.int64)
    nnz = lib.dedup_pattern(keys, e, perm, seg_ids, slot_keys)
    return perm, seg_ids, slot_keys[:nnz].copy()
