"""Dimension-generic Q1 space + kernels on TensorGrids (d = 1, 2, 3).

The reference's CG discretization is dimension-templated and instantiated for
SGrid<1,1> and SGrid<3,3> alongside the 2D grids
(examples/linearelliptic/cg.cc:19-21, discretizations/cg.hh:95-419).  This
module is the d-generic kernel layer backing the full-surface
``TensorCGDiscretization``: multilinear Q1 elements on axis-aligned boxes,
tensor Gauss quadrature, all assembly as batched einsums over the cell axis
(one XLA fusion per affine component — no per-cell loop).

The ``TensorSpace`` duck-types ``ops.spaces.Space`` where the generic
machinery needs it (``cell_dofs``/``num_dofs`` for patterns and scatters,
``shape_values``/``shape_gradients`` for ``ops.norms``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..functions.base import Function
from ..grid.tensor import TensorBoundaryInfo, TensorGrid

__all__ = [
    "TensorSpace",
    "tensor_q1_space",
    "tensor_cell_quadrature",
    "tensor_elliptic_cell_matrices",
    "tensor_l2_cell_matrices",
    "tensor_force_cell_vectors",
    "tensor_neumann_functional",
]


def _gauss_1d(n: int) -> Tuple[np.ndarray, np.ndarray]:
    x, w = np.polynomial.legendre.leggauss(max(n, 1))
    return 0.5 * (x + 1.0), 0.5 * w


def _gauss_tensor(d: int, order: int) -> Tuple[np.ndarray, np.ndarray]:
    """Tensor Gauss rule on [0,1]^d exact for (per-axis) degree ``order``:
    points [k, d], weights [k]."""
    n = max((order + 2) // 2, 1)
    x, w = _gauss_1d(n)
    if d == 0:
        return np.zeros((1, 0)), np.ones(1)
    mesh = np.meshgrid(*([x] * d), indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=-1)
    wt = np.ones(pts.shape[0])
    idx = np.unravel_index(np.arange(pts.shape[0]), (len(x),) * d)
    for a in range(d):
        wt = wt * w[idx[a]]
    return pts, wt


def q1_values(rel: jnp.ndarray, d: int) -> jnp.ndarray:
    """Multilinear Q1 basis at reference coordinates rel [..., d] ->
    [..., 2^d], corner order = TensorGrid.cells (axis 0 = MSB)."""
    vals = []
    for c in range(1 << d):
        v = jnp.ones(rel.shape[:-1], dtype=rel.dtype)
        for a in range(d):
            bit = (c >> (d - 1 - a)) & 1
            v = v * (rel[..., a] if bit else 1.0 - rel[..., a])
        vals.append(v)
    return jnp.stack(vals, axis=-1)


def q1_gradients(rel: jnp.ndarray, d: int) -> jnp.ndarray:
    """Reference gradients [..., 2^d, d]."""
    grads = []
    for c in range(1 << d):
        comp = []
        for a in range(d):
            g = jnp.ones(rel.shape[:-1], dtype=rel.dtype)
            for b in range(d):
                bit = (c >> (d - 1 - b)) & 1
                if b == a:
                    g = g * (1.0 if bit else -1.0)
                else:
                    g = g * (rel[..., b] if bit else 1.0 - rel[..., b])
            comp.append(g)
        grads.append(jnp.stack(comp, axis=-1))
    return jnp.stack(grads, axis=-2)


@dataclass(frozen=True, eq=False)  # identity hash: caches live in __dict__
class TensorSpace:
    """Q1 CG space on a TensorGrid (cg.hh:140-144 SpaceProvider analog)."""

    grid: TensorGrid
    order: int = 1

    @property
    def num_dofs(self) -> int:
        return self.grid.num_vertices

    @property
    def cell_dofs(self) -> np.ndarray:
        return self.grid.cells

    @property
    def dim(self) -> int:
        return self.grid.dim

    # -- point evaluation (ops.norms surface) -------------------------------
    def _rel(self, qp: jnp.ndarray) -> jnp.ndarray:
        lo = jnp.asarray(self.grid.cell_vertices[:, 0, :])
        h = jnp.asarray(self.grid.h)
        return (qp - lo[:, None, :]) / h

    def shape_values(self, verts, qp: jnp.ndarray) -> jnp.ndarray:
        """Q1 values at per-cell physical points qp [NC, k, d] -> [NC, k, nd]
        (``verts`` accepted for Space API compatibility; the tensor geometry
        is affine per cell so only the lower corner + h matter)."""
        return q1_values(self._rel(qp), self.dim)

    def shape_gradients(self, verts, qp: jnp.ndarray) -> jnp.ndarray:
        """Physical gradients [NC, k, nd, d]."""
        h = jnp.asarray(self.grid.h)
        return q1_gradients(self._rel(qp), self.dim) / h

    def __repr__(self) -> str:  # pragma: no cover
        return f"TensorSpace(Q1 d={self.dim}, ndofs={self.num_dofs})"


def tensor_q1_space(grid: TensorGrid) -> TensorSpace:
    return TensorSpace(grid)


def tensor_cell_quadrature(grid: TensorGrid, order: int):
    """(qp [NC, k, d], qw [k]) physical tensor Gauss rule; the weights fold
    in the (cell-constant) Jacobian determinant.  Cached per (grid, order)."""
    cache = grid.__dict__.setdefault("_quad_cache", {})
    if order not in cache:
        d = grid.dim
        pts, wts = _gauss_tensor(d, order)
        h = grid.h
        lo = grid.cell_vertices[:, 0, :]
        qp = jnp.asarray(lo[:, None, :] + (pts * h)[None, :, :])
        qw = jnp.asarray(wts * float(np.prod(h)))
        cache[order] = (qp, qw)
    return cache[order]


def _ref_shapes(grid: TensorGrid, order: int):
    """Reference-rule Q1 values [k, nd] and PHYSICAL gradients [k, nd, d]
    (cell-independent on a tensor grid)."""
    cache = grid.__dict__.setdefault("_shape_cache", {})
    if order not in cache:
        d = grid.dim
        pts, _ = _gauss_tensor(d, order)
        rel = jnp.asarray(pts)
        vals = q1_values(rel, d)
        grads = q1_gradients(rel, d) / jnp.asarray(grid.h)
        cache[order] = (vals, grads)
    return cache[order]


def tensor_elliptic_cell_matrices(
    space: TensorSpace,
    diffusion_factor: Function,
    diffusion_tensor: Function,
    order: Optional[int] = None,
) -> jnp.ndarray:
    """[NC, nd, nd] local stiffness int lam (kappa grad phi_j).grad phi_i
    (EllipticCG volume kernel, cg.hh:223-247), d-generic."""
    grid = space.grid
    qorder = (order if order is not None
              else diffusion_factor.order + diffusion_tensor.order + 2)
    qp, qw = tensor_cell_quadrature(grid, qorder)
    _, grads = _ref_shapes(grid, qorder)     # [k, nd, d]
    lam = diffusion_factor(qp)               # [NC, k]
    kap = diffusion_tensor(qp)               # [NC, k, d, d]
    flux = jnp.einsum("ckab,kjb->ckja", kap, grads)
    return jnp.einsum("k,ck,kia,ckja->cij", qw, lam, grads, flux)


def tensor_l2_cell_matrices(
    space: TensorSpace, weight: Optional[Function] = None,
    order: Optional[int] = None,
) -> jnp.ndarray:
    grid = space.grid
    worder = weight.order if weight is not None else 0
    qorder = order if order is not None else 2 + worder
    qp, qw = tensor_cell_quadrature(grid, qorder)
    vals, _ = _ref_shapes(grid, qorder)      # [k, nd]
    if weight is not None:
        wq = qw * weight(qp)                 # [NC, k]
        return jnp.einsum("ck,ki,kj->cij", wq, vals, vals)
    local = jnp.einsum("k,ki,kj->ij", qw, vals, vals)
    return jnp.broadcast_to(local, (grid.num_cells,) + local.shape)


def tensor_force_cell_vectors(
    space: TensorSpace, f: Function, order: Optional[int] = None
) -> jnp.ndarray:
    """[NC, nd] local L2-volume functionals (cg.hh:249-271)."""
    grid = space.grid
    qorder = order if order is not None else f.order + 2
    qp, qw = tensor_cell_quadrature(grid, qorder)
    vals, _ = _ref_shapes(grid, qorder)
    return jnp.einsum("k,ck,ki->ci", qw, f(qp), vals)


def tensor_neumann_functional(
    space: TensorSpace, g: Function, binfo: TensorBoundaryInfo,
    order: Optional[int] = None,
) -> jnp.ndarray:
    """Global vector of int_e g phi_i over the Neumann facets (Neumann
    L2-face functional, cg.hh:273-289), d-generic: one batched facet
    quadrature per normal axis (facets of equal axis share the rule)."""
    grid = space.grid
    d = grid.dim
    qorder = order if order is not None else g.order + 2
    facets = grid.boundary_facets
    out = jnp.zeros(space.num_dofs)
    pts, wts = _gauss_tensor(d - 1, qorder)      # [k, d-1], [k]
    vals = q1_values(jnp.asarray(pts), d - 1)    # [k, 2^(d-1)]
    for a in range(d):
        sel = np.nonzero(binfo.neumann_facets & (facets.axis == a))[0]
        if len(sel) == 0:
            continue
        corners = facets.corners[sel]            # [F, 2^(d-1)]
        lo = grid.vertices[corners[:, 0]]        # [F, d] facet lower corner
        rest = np.delete(np.arange(d), a)
        h_rest = grid.h[rest]
        qp = np.repeat(lo[:, None, :], pts.shape[0], axis=1)
        qp[:, :, rest] = lo[:, None, rest] + pts[None, :, :] * h_rest
        gq = g(jnp.asarray(qp))                  # [F, k]
        meas = jnp.asarray(facets.measure[sel])  # [F]
        local = jnp.einsum("f,k,fk,ki->fi", meas, jnp.asarray(wts), gq, vals)
        out = out.at[jnp.asarray(corners.reshape(-1))].add(local.reshape(-1))
    return out
