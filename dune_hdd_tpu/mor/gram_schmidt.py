"""Product-orthonormalization utilities for reduced bases.

Replaces the pyMOR gram_schmidt/pod extension algorithms driven by the
reference's RB scripts (examples/linearelliptic/thermalblock_main.py:82-188:
extension_algorithm in {gram_schmidt, pod, trivial}).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["gram_schmidt", "pod", "trivial_extension"]


def _inner(product, a, b):
    if product is None:
        return jnp.vdot(a, b)
    return a @ product.matvec(b)


def gram_schmidt(vectors: jnp.ndarray, product=None, atol: float = 1e-13,
                 reiterate: bool = True) -> jnp.ndarray:
    """Rows of ``vectors`` [n, N] -> product-orthonormal rows [m, N] (m <= n),
    dropping (numerically) linearly dependent vectors."""
    basis = []
    for v in vectors:
        w = v
        for passes in range(2 if reiterate else 1):
            for b in basis:
                w = w - _inner(product, b, w) * b
        norm = jnp.sqrt(jnp.maximum(_inner(product, w, w), 0.0))
        if float(norm) > atol:
            basis.append(w / norm)
    if not basis:
        return jnp.zeros((0, vectors.shape[1]))
    return jnp.stack(basis)


def pod(snapshots: jnp.ndarray, product=None, rtol: float = 1e-7,
        modes: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """POD of snapshot rows [n, N] w.r.t. a product; returns (modes [m, N],
    singular values [m])."""
    n = snapshots.shape[0]
    if product is None:
        gram = snapshots @ snapshots.T
    else:
        gram = snapshots @ jnp.stack([product.matvec(s) for s in snapshots]).T
    evals, evecs = jnp.linalg.eigh(gram)
    order = jnp.argsort(evals)[::-1]
    evals = jnp.maximum(evals[order], 0.0)
    evecs = evecs[:, order]
    svals = jnp.sqrt(evals)
    keep = np.asarray(svals) > float(svals[0]) * rtol if n else np.zeros(0, bool)
    if modes is not None:
        keep[modes:] = False
    idx = np.nonzero(keep)[0]
    coeffs = evecs[:, idx] / svals[idx][None, :]
    return (coeffs.T @ snapshots), svals[idx]


def trivial_extension(basis: jnp.ndarray, new_vector: jnp.ndarray,
                      atol: float = 1e-13) -> jnp.ndarray:
    """Append without orthonormalization (pyMOR's trivial extension)."""
    if basis.shape[0] == 0:
        return new_vector[None, :]
    return jnp.concatenate([basis, new_vector[None, :]], axis=0)
