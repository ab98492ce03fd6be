"""Norms: discrete induced norms (product matrices) and continuous-vs-discrete
error norms by quadrature (GDT Products induced_norm analog, used by the EOC
studies' current_error_norm, reference: test/linearelliptic-swipdg.hh:267-290).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..functions.base import Function
from ..la.sparse import SparseMatrix
from .assembly import cell_quadrature
from .spaces import Space

__all__ = ["induced_norm", "evaluate_discrete", "evaluate_discrete_gradient", "error_norms"]


def induced_norm(matrix: SparseMatrix, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(v @ matrix.matvec(v), 0.0))


def evaluate_discrete(space: Space, u: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """u_h at per-cell points qp [NC, k, 2] -> [NC, k]."""
    verts = jnp.asarray(space.grid.cell_vertices)
    vals = space.shape_values(verts, qp)  # [NC, k, nd]
    u_loc = u[jnp.asarray(space.cell_dofs)]  # [NC, nd]
    return jnp.einsum("cki,ci->ck", vals, u_loc)


def evaluate_discrete_gradient(space: Space, u: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """grad u_h at per-cell points -> [NC, k, 2]."""
    verts = jnp.asarray(space.grid.cell_vertices)
    grads = space.shape_gradients(verts, qp)  # [NC, k, nd, 2]
    u_loc = u[jnp.asarray(space.cell_dofs)]
    return jnp.einsum("ckia,ci->cka", grads, u_loc)


def error_norms(
    space: Space,
    u: jnp.ndarray,
    exact: Function,
    diffusion_factor: Optional[Function] = None,
    diffusion_tensor: Optional[Function] = None,
    order: int = 8,
) -> Dict[str, float]:
    """L2 / H1_semi (/ energy if diffusion given) norms of (exact - u_h),
    by high-order quadrature over the cells of ``space``.
    """
    qp, qw = cell_quadrature(space.grid, order)
    e_val = exact(qp) - evaluate_discrete(space, u, qp)
    e_grad = exact.gradient(qp) - evaluate_discrete_gradient(space, u, qp)
    out = {
        "L2": float(jnp.sqrt(jnp.sum(qw * e_val**2))),
        "H1_semi": float(jnp.sqrt(jnp.sum(qw * jnp.sum(e_grad**2, axis=-1)))),
    }
    if diffusion_factor is not None or diffusion_tensor is not None:
        lam = diffusion_factor(qp) if diffusion_factor is not None else 1.0
        if diffusion_tensor is not None:
            kap = diffusion_tensor(qp)
            flux = jnp.einsum("ckab,ckb->cka", kap, e_grad)
        else:
            flux = e_grad
        out["energy"] = float(jnp.sqrt(jnp.sum(qw * lam * jnp.sum(e_grad * flux, axis=-1))))
    return out
