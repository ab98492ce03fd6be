"""Finite element spaces as flat DoF-index arrays + batched shape evaluation.

Replaces GDT::Spaces::ContinuousLagrange / DiscontinuousLagrange providers
(reference: discretizations/cg.hh:48-56, swipdg.hh space creation) with
static-shape index arrays: ``cell_dofs[NC, nd]`` is the whole DoF map.  Shape
functions are evaluated *in physical coordinates* (barycentric for P1
triangles, tensor-bilinear for axis-aligned Q1 quads), so face kernels can
evaluate both neighbour bases at shared quadrature points without
reference-element gymnastics — everything vmaps over cell/face batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..grid.structured import Grid, INTERVAL, QUAD, TRIANGLE

__all__ = ["Space", "cg_space", "dg_space"]


@dataclass(frozen=True, eq=False)  # identity hash (holds numpy-array members)
class Space:
    grid: Grid
    continuous: bool  # CG (vertex dofs) vs DG (per-cell dofs)
    order: int = 1
    basis: str = "nodal"  # "nodal" (P1/Q1 vertex basis) | "p1" (total-degree
    # monomials {1, xi, eta} — dune-fem's DG space on quads is total-degree P1,
    # which the SGrid expectation tables were recorded with)

    def __post_init__(self):
        if self.order not in (1, 2, 3):
            raise NotImplementedError("orders 1-3 implemented")
        if self.order == 3 and self.grid.cell_type not in (TRIANGLE, INTERVAL):
            raise NotImplementedError("order 3 is triangle/interval-only")
        if self.basis == "p1" and (self.continuous or self.order != 1):
            raise ValueError("monomial p1 basis is order-1 DG-only")
        if self.basis == "p1" and self.grid.cell_type == INTERVAL:
            raise ValueError("monomial p1 basis is quad-only")

    @property
    def shape_count(self) -> int:
        """Local shape functions per cell."""
        if self.grid.cell_type == INTERVAL:
            return self.order + 1
        if self.basis == "p1":
            return 3
        if self.order == 3:
            return 10  # P3 triangle: 3 vertices + 2 per edge + center
        if self.order == 2:
            if self.grid.cell_type == TRIANGLE:
                return 6  # P2 triangle: 3 vertices + 3 edge midpoints
            return 9  # Q2 quad: 4 vertices + 4 edge midpoints + center
        return self.grid.vertices_per_cell

    @property
    def num_dofs(self) -> int:
        if self.continuous:
            if self.grid.cell_type == INTERVAL:
                # order-1: vertex dofs; higher: + (order-1) interior nodes/cell
                return (self.grid.num_vertices
                        + (self.order - 1) * self.grid.num_cells)
            if self.order == 3:
                return (self.grid.num_vertices + 2 * self.grid.num_faces
                        + self.grid.num_cells)
            if self.order == 2:
                n = self.grid.num_vertices + self.grid.num_faces
                if self.grid.cell_type == QUAD:
                    n += self.grid.num_cells  # Q2 cell-center bubbles
                return n
            return self.grid.num_vertices
        return self.grid.num_cells * self.shape_count

    @cached_property
    def cell_dofs(self) -> np.ndarray:
        """[NC, nd] global DoF indices.

        P2 local node order: (v0, v1, v2, e01, e12, e20) — edge nodes follow
        the local face numbering (f0=(v0,v1), f1=(v1,v2), f2=(v2,v0)).
        Q2 adds the cell-center node last: (v0..v3, e0..e3, c).
        P3: (v0, v1, v2, e01a, e01b, e12a, e12b, e20a, e20b, c) — edge node
        "a" sits at 2/3 of the LOCAL first vertex; the GLOBAL dof of each
        edge slot absorbs the edge orientation (canonical = ascending global
        vertex id), so shared edges are conforming."""
        if self.continuous:
            if self.grid.cell_type == INTERVAL:
                nv, nc = self.grid.num_vertices, self.grid.num_cells
                cells = self.grid.cells.astype(np.int64)
                k = self.order - 1  # interior nodes per cell
                parts = [cells]
                if k:
                    interior = (nv + k * np.arange(nc, dtype=np.int64)[:, None]
                                + np.arange(k, dtype=np.int64)[None, :])
                    parts.append(interior)
                return np.concatenate(parts, axis=1).astype(np.int32)
            if self.order == 3:
                nv, nf = self.grid.num_vertices, self.grid.num_faces
                cells = self.grid.cells.astype(np.int64)
                nc = self.grid.num_cells
                out = np.empty((nc, 10), dtype=np.int64)
                out[:, :3] = cells
                for kf, (i, j) in enumerate(((0, 1), (1, 2), (2, 0))):
                    f = self.grid.cell_faces[:, kf].astype(np.int64)
                    fwd = cells[:, i] < cells[:, j]  # local dir == canonical
                    out[:, 3 + 2 * kf] = nv + 2 * f + np.where(fwd, 0, 1)
                    out[:, 4 + 2 * kf] = nv + 2 * f + np.where(fwd, 1, 0)
                out[:, 9] = nv + 2 * nf + np.arange(nc)
                return out.astype(np.int32)
            if self.order == 2:
                edge = self.grid.num_vertices + self.grid.cell_faces.astype(np.int64)
                parts = [self.grid.cells.astype(np.int64), edge]
                if self.grid.cell_type == QUAD:
                    center = (self.grid.num_vertices + self.grid.num_faces
                              + np.arange(self.grid.num_cells, dtype=np.int64))
                    parts.append(center[:, None])
                return np.concatenate(parts, axis=1).astype(np.int32)
            return self.grid.cells.astype(np.int32)
        nd = self.shape_count
        return (
            np.arange(self.grid.num_cells, dtype=np.int32)[:, None] * nd
            + np.arange(nd, dtype=np.int32)[None, :]
        )

    @cached_property
    def nodal_points(self) -> np.ndarray:
        """[NC, nd, 2] physical positions of the local (nodal) basis points."""
        v = self.grid.cell_vertices
        if self.basis == "p1":
            raise NotImplementedError("monomial basis has no nodal points")
        if self.grid.cell_type == INTERVAL:
            r = _interval_ref_nodes(self.order)  # [nd]
            v0, v1 = v[:, 0, :], v[:, 1, :]
            return v0[:, None, :] + r[None, :, None] * (v1 - v0)[:, None, :]
        if self.order == 1:
            return v
        if self.order == 3:
            vn = np.roll(v, -1, axis=1)
            a = (2.0 * v + vn) / 3.0   # e_a per local face
            b = (v + 2.0 * vn) / 3.0   # e_b
            edge = np.stack([a, b], axis=2).reshape(v.shape[0], 6, 2)
            return np.concatenate(
                [v, edge, v.mean(axis=1, keepdims=True)], axis=1)
        mid = 0.5 * (v + np.roll(v, -1, axis=1))  # face midpoints
        parts = [v, mid]
        if self.grid.cell_type == QUAD:
            parts.append(v.mean(axis=1, keepdims=True))  # center node
        return np.concatenate(parts, axis=1)

    # -- batched shape evaluation (jnp) ------------------------------------
    # cellverts: [..., nvc, 2]; x: [..., k, 2] physical points inside the cell
    def shape_values(self, cellverts: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """[..., k, nd] values of the local basis at physical points."""
        if self.grid.cell_type == INTERVAL:
            return _interval_values(cellverts, x, self.order)
        if self.basis == "p1" and self.grid.cell_type == QUAD:
            return _p1_monomial_values(cellverts, x)
        if self.grid.cell_type == TRIANGLE:
            lam = _tri_shape_values(cellverts, x)
            if self.order == 3:
                return _tri_p3_values(lam)
            if self.order == 2:
                return _tri_p2_values(lam)
            return lam
        if self.order == 2:
            return _quad_q2_values(cellverts, x)
        return _quad_shape_values(cellverts, x)

    def shape_gradients(self, cellverts: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """[..., k, nd, dim] physical gradients at the points."""
        if self.grid.cell_type == INTERVAL:
            return _interval_grads(cellverts, x, self.order)
        if self.basis == "p1" and self.grid.cell_type == QUAD:
            return _p1_monomial_grads(cellverts, x)
        if self.grid.cell_type == TRIANGLE:
            g = _tri_shape_grads(cellverts)  # [..., 3, 2], constant in x
            if self.order == 3:
                lam = _tri_shape_values(cellverts, x)
                return _tri_p3_grads(lam, g)
            if self.order == 2:
                lam = _tri_shape_values(cellverts, x)
                return _tri_p2_grads(lam, g)
            return jnp.broadcast_to(
                g[..., None, :, :], x.shape[:-1] + g.shape[-2:]
            )
        if self.order == 2:
            return _quad_q2_grads(cellverts, x)
        return _quad_shape_grads(cellverts, x)

    def interpolate_vertex_function(self, values_at_vertices: jnp.ndarray) -> jnp.ndarray:
        """Nodal interpolation: vertex values -> DoF vector."""
        if self.basis != "nodal":
            raise NotImplementedError("nodal interpolation needs the nodal basis")
        if self.continuous:
            return values_at_vertices
        return values_at_vertices[self.grid.cells].reshape(-1)

    def __repr__(self):
        kind = "CG" if self.continuous else "DG"
        return f"Space({kind} P{self.order} {self.grid.cell_type}, ndofs={self.num_dofs})"


def cg_space(grid: Grid, order: int = 1) -> Space:
    return Space(grid, continuous=True, order=order)


def dg_space(grid: Grid, order: int = 1, basis: str = "nodal") -> Space:
    """DG space: nodal P1 on triangles / Q1 on quads by default; pass
    basis="p1" on quads for a total-degree-1 monomial space."""
    return Space(grid, continuous=False, order=order, basis=basis)


# -- physical-coordinate shape functions -----------------------------------


def _interval_ref_nodes(order: int) -> np.ndarray:
    """Reference nodes on [0,1], vertices first (matches cell_dofs ordering)."""
    if order == 1:
        return np.array([0.0, 1.0])
    if order == 2:
        return np.array([0.0, 1.0, 0.5])
    return np.array([0.0, 1.0, 1.0 / 3.0, 2.0 / 3.0])


def _interval_rel(cellverts, x):
    """Reference coordinate r in [0,1] and cell length h.

    cellverts [..., 2, 1], x [..., k, 1] -> (r [..., k], h [...])."""
    v0 = cellverts[..., 0, 0]
    h = cellverts[..., 1, 0] - v0
    return (x[..., 0] - v0[..., None]) / h[..., None], h


def _interval_values(cellverts, x, order: int):
    """[..., k, nd] Lagrange values on intervals (P1/P2/P3, nodes
    vertices-first)."""
    r, _ = _interval_rel(cellverts, x)
    nodes = _interval_ref_nodes(order)
    cols = []
    for i, ni in enumerate(nodes):
        li = jnp.ones_like(r)
        for j, nj in enumerate(nodes):
            if j != i:
                li = li * (r - nj) / (ni - nj)
        cols.append(li)
    return jnp.stack(cols, axis=-1)


def _interval_grads(cellverts, x, order: int):
    """[..., k, nd, 1] physical derivatives of the interval Lagrange basis."""
    r, h = _interval_rel(cellverts, x)
    nodes = _interval_ref_nodes(order)
    cols = []
    for i, ni in enumerate(nodes):
        others = [nj for j, nj in enumerate(nodes) if j != i]
        denom = float(np.prod([ni - nj for nj in others]))
        dli = jnp.zeros_like(r)
        for skip in range(len(others)):
            term = jnp.ones_like(r)
            for j, nj in enumerate(others):
                if j != skip:
                    term = term * (r - nj)
            dli = dli + term
        cols.append(dli / denom)
    dref = jnp.stack(cols, axis=-1)  # [..., k, nd]
    return (dref / h[..., None, None])[..., None]


def _tri_shape_values(cellverts, x):
    """Barycentric coordinates of x in the triangle == P1 shape values.

    cellverts [..., 3, 2], x [..., k, 2] -> [..., k, 3].
    """
    v0 = cellverts[..., 0, :]
    e1 = cellverts[..., 1, :] - v0
    e2 = cellverts[..., 2, :] - v0
    det = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
    r = x - v0[..., None, :]
    lam1 = (r[..., 0] * e2[..., None, 1] - r[..., 1] * e2[..., None, 0]) / det[..., None]
    lam2 = (e1[..., None, 0] * r[..., 1] - e1[..., None, 1] * r[..., 0]) / det[..., None]
    lam0 = 1.0 - lam1 - lam2
    return jnp.stack([lam0, lam1, lam2], axis=-1)


def _tri_shape_grads(cellverts):
    """[..., 3, 2] constant physical gradients of the barycentric basis."""
    v0 = cellverts[..., 0, :]
    e1 = cellverts[..., 1, :] - v0
    e2 = cellverts[..., 2, :] - v0
    det = (e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0])[..., None]
    g1 = jnp.stack([e2[..., 1], -e2[..., 0]], axis=-1) / det
    g2 = jnp.stack([-e1[..., 1], e1[..., 0]], axis=-1) / det
    g0 = -g1 - g2
    return jnp.stack([g0, g1, g2], axis=-2)


def _tri_p2_values(lam):
    """P2 basis from barycentric coordinates lam [..., k, 3]:
    vertex i: lam_i (2 lam_i - 1); edge (a,b): 4 lam_a lam_b."""
    l0, l1, l2 = lam[..., 0], lam[..., 1], lam[..., 2]
    return jnp.stack(
        [
            l0 * (2 * l0 - 1), l1 * (2 * l1 - 1), l2 * (2 * l2 - 1),
            4 * l0 * l1, 4 * l1 * l2, 4 * l2 * l0,
        ],
        axis=-1,
    )


def _tri_p2_grads(lam, g):
    """P2 physical gradients: lam [..., k, 3], g [..., 3, 2] (constant
    barycentric gradients) -> [..., k, 6, 2]."""
    gb = g[..., None, :, :]  # [..., 1, 3, 2]
    l = lam[..., None]  # [..., k, 3, 1]
    vertex = (4 * l - 1) * gb  # [..., k, 3, 2]
    g0, g1, g2 = gb[..., 0, :], gb[..., 1, :], gb[..., 2, :]
    l0, l1, l2 = l[..., 0, :], l[..., 1, :], l[..., 2, :]
    e01 = 4 * (l0 * g1 + l1 * g0)
    e12 = 4 * (l1 * g2 + l2 * g1)
    e20 = 4 * (l2 * g0 + l0 * g2)
    edges = jnp.stack([e01, e12, e20], axis=-2)
    return jnp.concatenate([vertex, edges], axis=-2)


def _tri_p3_values(lam):
    """P3 basis from barycentric coordinates lam [..., k, 3], node order
    (v0, v1, v2, e01a, e01b, e12a, e12b, e20a, e20b, c) with e_{ij}a at
    2/3 v_i + 1/3 v_j:  vertex i: l_i(3l_i-1)(3l_i-2)/2;
    e_{ij}a: 9/2 l_i l_j (3l_i-1); e_{ij}b: 9/2 l_i l_j (3l_j-1);
    center: 27 l0 l1 l2."""
    l = [lam[..., i] for i in range(3)]
    out = [li * (3 * li - 1) * (3 * li - 2) / 2 for li in l]
    for i, j in ((0, 1), (1, 2), (2, 0)):
        out.append(4.5 * l[i] * l[j] * (3 * l[i] - 1))
        out.append(4.5 * l[i] * l[j] * (3 * l[j] - 1))
    out.append(27.0 * l[0] * l[1] * l[2])
    return jnp.stack(out, axis=-1)


def _tri_p3_grads(lam, g):
    """P3 physical gradients: lam [..., k, 3], g [..., 3, 2] -> [..., k, 10, 2]."""
    gb = g[..., None, :, :]  # [..., 1, 3, 2]
    l = [lam[..., i, None] for i in range(3)]  # each [..., k, 1]
    gi = [gb[..., i, :] for i in range(3)]     # each [..., 1|k, 2]
    out = []
    for i in range(3):
        out.append(((27 * l[i] * l[i] - 18 * l[i] + 2) / 2) * gi[i])
    for i, j in ((0, 1), (1, 2), (2, 0)):
        out.append(4.5 * (l[j] * (6 * l[i] - 1) * gi[i]
                          + l[i] * (3 * l[i] - 1) * gi[j]))
        out.append(4.5 * (l[j] * (3 * l[j] - 1) * gi[i]
                          + l[i] * (6 * l[j] - 1) * gi[j]))
    out.append(27.0 * (l[1] * l[2] * gi[0] + l[0] * l[2] * gi[1]
                       + l[0] * l[1] * gi[2]))
    return jnp.stack(out, axis=-2)


def _p1_monomial_values(cellverts, x):
    """Total-degree-1 basis {1, xi-1/2, eta-1/2} in cell-local coordinates
    (span == dune-fem's orthonormal DG basis of order 1).  [..., k, 3]."""
    lo = cellverts[..., 0, :]
    ext = cellverts[..., 2, :] - lo
    t = (x - lo[..., None, :]) / ext[..., None, :]
    one = jnp.ones_like(t[..., 0])
    return jnp.stack([one, t[..., 0] - 0.5, t[..., 1] - 0.5], axis=-1)


def _p1_monomial_grads(cellverts, x):
    lo = cellverts[..., 0, :]
    ext = cellverts[..., 2, :] - lo
    zeros = jnp.zeros(x.shape[:-1])
    inv_x = jnp.broadcast_to(1.0 / ext[..., None, 0], zeros.shape)
    inv_y = jnp.broadcast_to(1.0 / ext[..., None, 1], zeros.shape)
    g0 = jnp.stack([zeros, zeros], axis=-1)
    g1 = jnp.stack([inv_x, zeros], axis=-1)
    g2 = jnp.stack([zeros, inv_y], axis=-1)
    return jnp.stack([g0, g1, g2], axis=-2)


def _quad_rect_params(cellverts):
    """Lower corner and extents of an axis-aligned rectangle cell
    (v0=lower-left, v2=upper-right by the CCW convention)."""
    lo = cellverts[..., 0, :]
    hi = cellverts[..., 2, :]
    return lo, hi - lo


def _quad_shape_values(cellverts, x):
    """Bilinear Q1 basis on axis-aligned rectangles, vertex order
    (v00, v10, v11, v01).  [..., k, 4]."""
    lo, ext = _quad_rect_params(cellverts)
    t = (x - lo[..., None, :]) / ext[..., None, :]
    xi, eta = t[..., 0], t[..., 1]
    return jnp.stack(
        [(1 - xi) * (1 - eta), xi * (1 - eta), xi * eta, (1 - xi) * eta], axis=-1
    )


def _quad_shape_grads(cellverts, x):
    lo, ext = _quad_rect_params(cellverts)
    t = (x - lo[..., None, :]) / ext[..., None, :]
    xi, eta = t[..., 0], t[..., 1]
    dxi = jnp.stack([-(1 - eta), (1 - eta), eta, -eta], axis=-1)
    deta = jnp.stack([-(1 - xi), -xi, xi, (1 - xi)], axis=-1)
    gx = dxi / ext[..., None, 0:1]
    gy = deta / ext[..., None, 1:2]
    return jnp.stack([gx, gy], axis=-1)


def _q2_1d(t):
    """1D quadratic Lagrange basis at nodes {0, 1/2, 1}: (L_left, L_mid,
    L_right) and derivatives."""
    A = (2 * t - 1) * (t - 1)
    B = 4 * t * (1 - t)
    C = t * (2 * t - 1)
    dA = 4 * t - 3
    dB = 4 - 8 * t
    dC = 4 * t - 1
    return (A, B, C), (dA, dB, dC)


def _quad_q2_values(cellverts, x):
    """Biquadratic Q2 basis on axis-aligned rectangles, node order
    (v00, v10, v11, v01, e_bottom, e_right, e_top, e_left, center) — edge
    nodes follow the local face numbering f0=(v0,v1).. f3=(v3,v0).
    [..., k, 9]."""
    lo, ext = _quad_rect_params(cellverts)
    t = (x - lo[..., None, :]) / ext[..., None, :]
    (Ax, Bx, Cx), _ = _q2_1d(t[..., 0])
    (Ay, By, Cy), _ = _q2_1d(t[..., 1])
    return jnp.stack(
        [Ax * Ay, Cx * Ay, Cx * Cy, Ax * Cy,
         Bx * Ay, Cx * By, Bx * Cy, Ax * By,
         Bx * By],
        axis=-1,
    )


def _quad_q2_grads(cellverts, x):
    lo, ext = _quad_rect_params(cellverts)
    t = (x - lo[..., None, :]) / ext[..., None, :]
    (Ax, Bx, Cx), (dAx, dBx, dCx) = _q2_1d(t[..., 0])
    (Ay, By, Cy), (dAy, dBy, dCy) = _q2_1d(t[..., 1])
    dxi = jnp.stack(
        [dAx * Ay, dCx * Ay, dCx * Cy, dAx * Cy,
         dBx * Ay, dCx * By, dBx * Cy, dAx * By,
         dBx * By],
        axis=-1,
    )
    deta = jnp.stack(
        [Ax * dAy, Cx * dAy, Cx * dCy, Ax * dCy,
         Bx * dAy, Cx * dBy, Bx * dCy, Ax * dBy,
         Bx * dBy],
        axis=-1,
    )
    gx = dxi / ext[..., None, 0:1]
    gy = deta / ext[..., None, 1:2]
    return jnp.stack([gx, gy], axis=-1)
