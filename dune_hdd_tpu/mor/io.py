"""On-disk persistence of reduced models (checkpoint/resume for RB training).

The reference has no disk checkpointing (survey 5.4 — only the in-memory
solution cache); for production RB workflows the trained basis and reduced
operators are the valuable artifact, so they round-trip here as a plain .npz
plus the coefficient expressions (re-compiled on load).
"""
from __future__ import annotations

import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..parameters import ParameterFunctional, ParameterType
from .reductor import ReducedModel

__all__ = ["save_reduced_model", "load_reduced_model", "save_greedy_state", "load_greedy_state"]


def _coeffs_meta(coeffs):
    return [
        {"expression": c.expression, "parameter_type": dict(c.parameter_type.items())}
        for c in coeffs
    ]


def _coeffs_from_meta(meta):
    return [
        ParameterFunctional(ParameterType(m["parameter_type"]), m["expression"])
        for m in meta
    ]


def save_reduced_model(rm: ReducedModel, path: str) -> str:
    if not path.endswith(".npz"):
        path += ".npz"
    meta = {
        "op_coeffs": _coeffs_meta(rm.op_coeffs),
        "rhs_coeffs": _coeffs_meta(rm.rhs_coeffs),
        "products": sorted(rm.products),
    }
    arrays = {
        "op_mats": np.asarray(rm.op_mats),
        "rhs_vecs": np.asarray(rm.rhs_vecs),
        "basis": np.asarray(rm.basis),
        "meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    for name, mat in rm.products.items():
        arrays[f"product_{name}"] = np.asarray(mat)
    np.savez(path, **arrays)
    return path


def load_reduced_model(path: str) -> ReducedModel:
    if not path.endswith(".npz"):
        path += ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    products = {
        name: jnp.asarray(data[f"product_{name}"]) for name in meta["products"]
    }
    return ReducedModel(
        jnp.asarray(data["op_mats"]),
        _coeffs_from_meta(meta["op_coeffs"]),
        jnp.asarray(data["rhs_vecs"]),
        _coeffs_from_meta(meta["rhs_coeffs"]),
        jnp.asarray(data["basis"]),
        products,
    )


def save_greedy_state(path: str, basis, selected_mus, max_errors,
                      extensions: int) -> str:
    """Checkpoint greedy training state (basis + history) so an interrupted
    run resumes where it stopped (greedy_rb(checkpoint_path=...)).  The
    reference keeps no training state on disk (survey 5.4); for long greedy
    runs over expensive detailed solves this is the resume artifact."""
    if not path.endswith(".npz"):
        path += ".npz"
    meta = {
        "selected_mus": [
            {k: np.asarray(v).tolist() for k, v in mu.items()} for mu in selected_mus
        ],
        "max_errors": [float(e) for e in max_errors],
        "extensions": int(extensions),
    }
    np.savez(
        path,
        basis=np.asarray(basis),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )
    return path


def load_greedy_state(path: str):
    """(basis, selected_mus, max_errors, extensions) or None if absent."""
    import os

    if not path.endswith(".npz"):
        path += ".npz"
    if not os.path.exists(path):
        return None
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    mus = [
        {k: jnp.asarray(v) for k, v in mu.items()} for mu in meta["selected_mus"]
    ]
    return (jnp.asarray(data["basis"]), mus, list(meta["max_errors"]),
            int(meta["extensions"]))
