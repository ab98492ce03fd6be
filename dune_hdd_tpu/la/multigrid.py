"""Geometric multigrid for DG block-ELL operators on refinement hierarchies.

The reference delegates hard solves to external AMG/SuperLU backends
(Stuff::LA::Solver types, survey 2.? base.hh:314-322).  The TPU-native
equivalent: a geometric V-cycle over the newest-vertex-bisection hierarchy —
DG-P1 prolongation is a per-child 3x3 interpolation (children of cell c are
exactly (2c, 2c+1), so restriction is a reshape + einsum, no scatter), coarse
operators are Galerkin RAP products computed as batched 3x3 einsums, and the
smoother is damped block-Jacobi.  Used as a CG preconditioner it makes the
high-contrast SPE10 solve converge in tens of iterations instead of
thousands.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.structured import Grid
from ..ops.spaces import Space, dg_space
from .block_ell import BlockEllMatrix, _block_inverse, block_jacobi_preconditioner

__all__ = ["DGProlongation", "build_dg_prolongation", "galerkin_rap",
           "MultigridHierarchy", "v_cycle", "mg_preconditioner"]


@dataclass(frozen=True, eq=False)
class DGProlongation:
    """Coarse-DG-P1 -> fine-DG-P1 interpolation.

    P_cell [NCf, nd, nd]: fine nodal values of each child from its parent's
    basis; parent [NCf] with children contiguous: parent[2c] = parent[2c+1] = c.
    """

    P_cell: jnp.ndarray
    parent: np.ndarray
    children_per_parent: int

    def prolong(self, x_coarse: jnp.ndarray) -> jnp.ndarray:
        nd = self.P_cell.shape[-1]
        xc = x_coarse.reshape(-1, nd)
        return jnp.einsum("cij,cj->ci", self.P_cell, xc[self.parent]).reshape(-1)

    def restrict(self, r_fine: jnp.ndarray) -> jnp.ndarray:
        nd = self.P_cell.shape[-1]
        k = self.children_per_parent
        rf = r_fine.reshape(-1, nd)
        contrib = jnp.einsum("cij,ci->cj", self.P_cell, rf)  # P^T r per fine cell
        return contrib.reshape(-1, k, nd).sum(axis=1).reshape(-1)


def build_dg_prolongation(coarse: Grid, fine: Grid, space_fine: Space) -> DGProlongation:
    """Children of coarse cell c are fine cells (k*c .. k*c+k-1) — true for
    both bisect (k=2) and red refine (k=4) by construction."""
    k = fine.num_cells // coarse.num_cells
    parent = np.repeat(np.arange(coarse.num_cells, dtype=np.int64), k)
    parent_verts = jnp.asarray(coarse.cell_vertices[parent])  # [NCf, nvc, 2]
    fine_nodes = jnp.asarray(fine.cell_vertices)  # [NCf, nd, 2] nodal points
    P = space_fine.shape_values(parent_verts, fine_nodes)  # [NCf, nd, nd_coarse]
    return DGProlongation(P_cell=P, parent=parent, children_per_parent=k)


def galerkin_rap(A_fine: BlockEllMatrix, prol: DGProlongation,
                 coarse_space: Space) -> BlockEllMatrix:
    """A_coarse = P^T A_fine P on block-ELL layout."""
    grid_c = coarse_space.grid
    nc_c, nd = grid_c.num_cells, coarse_space.shape_count
    nfc = grid_c.faces_per_cell
    Bc = 1 + nfc
    # coarse neighbor table (same convention as build_block_ell)
    neighbors_c = np.tile(np.arange(nc_c, dtype=np.int32)[:, None], (1, Bc))
    fi = np.nonzero(grid_c.interior_faces)[0]
    cin, cout = grid_c.face_cells[fi, 0], grid_c.face_cells[fi, 1]
    li, lo = grid_c.face_local[fi, 0], grid_c.face_local[fi, 1]
    neighbors_c[cin, 1 + li] = cout
    neighbors_c[cout, 1 + lo] = cin

    # coarse slot of (fine cell, fine slot): position of parent[fine neighbor]
    # in the coarse neighbor list of parent[fine cell]
    pf = prol.parent  # [NCf]
    pn = prol.parent[A_fine.neighbors]  # [NCf, Bf] coarse cell of each fine nb
    slot = np.full(pn.shape, -1, dtype=np.int64)
    for b in range(Bc):
        match = pn == neighbors_c[pf][:, b][:, None]
        slot[match & (slot < 0)] = b
    if (slot < 0).any():
        raise ValueError("fine neighbour's parent is not a coarse neighbour")

    # contribution per (fine cell, fine slot): P_f^T A P_nb  -> [NCf, Bf, nd, nd]
    P = prol.P_cell
    M = jnp.einsum("cik,cbkl,cblj->cbij", jnp.swapaxes(P, 1, 2), A_fine.blocks,
                   P[A_fine.neighbors])
    blocks_c = jnp.zeros((nc_c, Bc, nd, nd), dtype=A_fine.blocks.dtype)
    blocks_c = blocks_c.at[jnp.asarray(pf)[:, None], jnp.asarray(slot)].add(M)
    return BlockEllMatrix(neighbors_c, blocks_c)


class MultigridHierarchy:
    """Levels fine -> coarse with Galerkin operators and a dense coarsest
    solve; a V-cycle usable directly or as a CG preconditioner."""

    def __init__(self, grids_fine_to_coarse: List[Grid], A_fine: BlockEllMatrix,
                 omega: float = 0.6, pre: int = 2, post: int = 2,
                 coarse_dense_limit: int = 4096, coarse_smooth_iters: int = 30):
        self.grids = grids_fine_to_coarse
        self.omega = omega
        self.pre = pre
        self.post = post
        self.coarse_smooth_iters = coarse_smooth_iters
        self.matrices: List[BlockEllMatrix] = [A_fine]
        self.prolongations: List[DGProlongation] = []
        self.smoother_inv: List[jnp.ndarray] = []
        for lvl in range(len(self.grids) - 1):
            fine_g, coarse_g = self.grids[lvl], self.grids[lvl + 1]
            space_f = dg_space(fine_g)
            space_c = dg_space(coarse_g)
            prol = build_dg_prolongation(coarse_g, fine_g, space_f)
            self.prolongations.append(prol)
            self.matrices.append(galerkin_rap(self.matrices[-1], prol, space_c))
        self.omegas: List[jnp.ndarray] = []
        for A in self.matrices:
            inv = _block_inverse(A.diagonal_blocks())
            self.smoother_inv.append(inv)
            # damped block-Jacobi is stable for omega < 2 / rho(D^-1 A);
            # estimate rho with a few power iterations (high-contrast spectra
            # exceed the Laplace-calibrated fixed omega)
            nd = A.nd
            v = jnp.ones(A.num_cells * nd, dtype=A.blocks.dtype)

            def dinv_a(x):
                y = A.matvec(x)
                return jnp.einsum("cij,cj->ci", inv, y.reshape(-1, nd)).reshape(-1)

            rho = jnp.asarray(1.0, dtype=A.blocks.dtype)
            for _ in range(12):
                w = dinv_a(v)
                rho = jnp.linalg.norm(w) / jnp.maximum(jnp.linalg.norm(v), 1e-30)
                v = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            # target ~0.7 * (2/rho): inside the stability window with good
            # high-frequency damping; never exceed the user omega
            self.omegas.append(jnp.minimum(omega, 1.4 / jnp.maximum(rho, 1e-6)))
        n_coarse = self.matrices[-1].num_cells * self.matrices[-1].nd
        # the coarsest solve must stay LINEAR so the V-cycle remains a valid
        # (fixed) CG preconditioner: dense solve if small enough, otherwise a
        # fixed number of damped block-Jacobi sweeps
        self.coarse_dense = (
            _block_ell_to_dense(self.matrices[-1]) if n_coarse <= coarse_dense_limit
            else None
        )

    def _smooth(self, lvl, A, x, b, iterations):
        inv = self.smoother_inv[lvl]
        omega = self.omegas[lvl]
        nd = A.nd

        def body(_, x):
            r = b - A.matvec(x)
            dx = jnp.einsum("cij,cj->ci", inv, r.reshape(-1, nd)).reshape(-1)
            return x + omega * dx

        return jax.lax.fori_loop(0, iterations, body, x)

    def v_cycle(self, b: jnp.ndarray, x: Optional[jnp.ndarray] = None,
                lvl: int = 0) -> jnp.ndarray:
        A = self.matrices[lvl]
        if x is None:
            x = jnp.zeros_like(b)
        if lvl == len(self.matrices) - 1:
            if self.coarse_dense is not None:
                return jnp.linalg.solve(self.coarse_dense, b)
            return self._smooth(lvl, A, x, b, self.coarse_smooth_iters)
        x = self._smooth(lvl, A, x, b, self.pre)
        r = b - A.matvec(x)
        rc = self.prolongations[lvl].restrict(r)
        ec = self.v_cycle(rc, None, lvl + 1)
        x = x + self.prolongations[lvl].prolong(ec)
        x = self._smooth(lvl, A, x, b, self.post)
        return x


def _block_ell_to_dense(A: BlockEllMatrix) -> jnp.ndarray:
    nc, B, nd, _ = A.blocks.shape
    n = nc * nd
    rows = (np.arange(nc)[:, None, None, None] * nd
            + np.zeros((1, B, 1, 1), np.int64)
            + np.arange(nd)[None, None, :, None])
    cols = (A.neighbors.astype(np.int64)[:, :, None, None] * nd
            + np.arange(nd)[None, None, None, :])
    rows = np.broadcast_to(rows, A.blocks.shape).reshape(-1)
    cols = np.broadcast_to(cols, A.blocks.shape).reshape(-1)
    out = jnp.zeros((n, n), dtype=A.blocks.dtype)
    return out.at[rows, cols].add(A.blocks.reshape(-1))


def mg_preconditioner(hierarchy: MultigridHierarchy) -> Callable:
    return lambda r: hierarchy.v_cycle(r)
