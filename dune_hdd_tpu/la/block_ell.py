"""Block-ELL operators for DG spaces — the TPU fast path.

A DG-P1 SWIPDG operator couples each cell only with itself and its face
neighbours, so the matrix is [NC, 1+nfc] dense nd x nd blocks.  SpMV becomes
a coalesced row gather of [NC, B, nd] plus one batched einsum — no scalar
gathers, VPU-friendly, and the natural layout for a Pallas kernel and for
subdomain sharding (neighbor slots are the halo).

Compared to the generic scalar ELL SpMV (la/sparse.py) this is ~2 orders of
magnitude faster on TPU for the SWIPDG bench (scalar gathers of [N, 12]
indices dominate there).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.structured import Grid
from ..ops.spaces import Space

__all__ = [
    "BlockEllMatrix",
    "StructuredBlockEll",
    "build_block_ell",
    "block_jacobi_preconditioner",
    "block_cg",
]




class _StaticArray:
    """Hashable wrapper for numpy index arrays living in pytree aux_data:
    jit caches compare aux_data with == / hash, which raises on raw numpy
    arrays ("truth value of an array ... ambiguous").  Equality is by
    content digest; the wrapper is built once per matrix instance so
    per-call flattening stays O(1)."""

    __slots__ = ("array", "_key")

    def __init__(self, array):
        self.array = np.asarray(array)
        self._key = (self.array.shape, self.array.dtype.str,
                     hash(self.array.tobytes()))

    def __hash__(self):
        return self._key[2]

    def __eq__(self, other):
        return (isinstance(other, _StaticArray) and self._key == other._key
                and np.array_equal(self.array, other.array))

@jax.tree_util.register_pytree_node_class
class BlockEllMatrix:
    """neighbors [NC, B] (slot 0 = self; padded slots point at self with a
    zero block), blocks [NC, B, nd, nd]."""

    def __init__(self, neighbors: np.ndarray, blocks: jnp.ndarray):
        self.neighbors = neighbors  # static int32
        self.blocks = blocks

    def tree_flatten(self):
        if not hasattr(self, "_aux"):
            self._aux = _StaticArray(self.neighbors)
        return (self.blocks,), self._aux

    @classmethod
    def tree_unflatten(cls, neighbors, children):
        return cls(neighbors.array, children[0])

    @property
    def num_cells(self):
        return self.blocks.shape[0]

    @property
    def nd(self):
        return self.blocks.shape[-1]

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nc, nd = self.num_cells, self.nd
        xc = x.reshape(nc, nd)
        xg = xc[self.neighbors]  # [NC, B, nd] — coalesced nd-wide rows
        # HIGHEST precision: TPU's default f32 dot runs a single bf16 pass,
        # whose ~1e-3 products stall Krylov convergence at high contrast;
        # the matvec is bandwidth-bound (12 MACs/element), so exact-f32
        # accumulation is free in wall-clock
        y = jnp.einsum("cbij,cbj->ci", self.blocks, xg,
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(-1)

    __matmul__ = matvec

    def diagonal_blocks(self) -> jnp.ndarray:
        return self.blocks[:, 0]

    def with_blocks(self, blocks: jnp.ndarray) -> "BlockEllMatrix":
        return BlockEllMatrix(self.neighbors, blocks)

    def __mul__(self, s):
        return BlockEllMatrix(self.neighbors, self.blocks * s)

    __rmul__ = __mul__

    def __add__(self, other):
        if isinstance(other, BlockEllMatrix):
            return BlockEllMatrix(self.neighbors, self.blocks + other.blocks)
        return NotImplemented


@jax.tree_util.register_pytree_node_class
class StructuredBlockEll:
    """Block-ELL operator in the bandwidth-ordered structured numbering
    (grid/structured_order.py): neighbour access is 24 static contiguous
    slices instead of a random gather — the TPU gather path runs ~20x below
    stream bandwidth, the slice path is bandwidth-bound.

    blocks [NC, 4, nd, nd] with cells subclass-major and slots geometric
    (0=self, 1=hypotenuse, 2=vertical face, 3=horizontal face); neighbors
    [NC, 4] kept (permuted) for setup-time code (coarse operators, scaling).
    offsets: 8x3 static ints — new-id offset of each (subclass, slot)
    neighbour; wrap-around entries carry zero blocks (domain boundary).
    """

    def __init__(self, neighbors: np.ndarray, blocks: jnp.ndarray, offsets):
        self.neighbors = neighbors
        self.blocks = blocks
        self.offsets = tuple(tuple(int(o) for o in row) for row in offsets)

    def tree_flatten(self):
        if not hasattr(self, "_aux"):
            self._aux = (_StaticArray(self.neighbors), self.offsets)
        return (self.blocks,), self._aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        neighbors, offsets = aux
        return cls(neighbors.array, children[0], offsets)

    @property
    def num_cells(self):
        return self.blocks.shape[0]

    @property
    def nd(self):
        return self.blocks.shape[-1]

    def with_blocks(self, blocks: jnp.ndarray) -> "StructuredBlockEll":
        return StructuredBlockEll(self.neighbors, blocks, self.offsets)

    @classmethod
    def from_block_ell(cls, A: "BlockEllMatrix", order) -> "StructuredBlockEll":
        """Permute a BlockEllMatrix into structured order (one static gather
        of the block array — setup cost, not in the iteration path)."""
        nc, B, nd, _ = A.blocks.shape
        assert B == 4, "structured layout is for triangle grids (3 faces)"
        inv = np.asarray(order.inv)  # new -> old cell
        slot_idx = np.concatenate(
            [np.zeros((nc, 1), dtype=np.int64),
             1 + np.asarray(order.slot_source, dtype=np.int64)], axis=1
        )  # [NC_new, 4] original slot feeding each geo slot
        cell_idx = inv[:, None]
        blocks = A.blocks[jnp.asarray(cell_idx), jnp.asarray(slot_idx)]
        perm = np.asarray(order.perm)
        neighbors = perm[np.asarray(A.neighbors)[cell_idx, slot_idx]].astype(np.int32)
        return cls(neighbors, blocks, order.offsets)

    def neighbor_fields(self, xc: jnp.ndarray) -> jnp.ndarray:
        """[NC, 4, nd]: x at self and at each geo-slot neighbour, built from
        static contiguous slices (no gather)."""
        nc, nd = self.num_cells, self.nd
        L = nc // 8
        x2 = jnp.concatenate([xc, xc], axis=0)
        fields = [xc]
        for s in range(3):
            segs = []
            for k in range(8):
                start = k * L + (self.offsets[k][s] % nc)
                segs.append(jax.lax.slice(x2, (start, 0), (start + L, nd)))
            fields.append(jnp.concatenate(segs, axis=0))
        return jnp.stack(fields, axis=1)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nc, nd = self.num_cells, self.nd
        xg = self.neighbor_fields(x.reshape(nc, nd))
        y = jnp.einsum("cbij,cbj->ci", self.blocks, xg,
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(-1)

    __matmul__ = matvec

    def diagonal_blocks(self) -> jnp.ndarray:
        return self.blocks[:, 0]


def block_ell_neighbors(grid) -> np.ndarray:
    """[NC, 1+nfc] neighbor table (slot 0 = self, padded slots = self)."""
    nc, nfc = grid.num_cells, grid.faces_per_cell
    neighbors = np.tile(np.arange(nc, dtype=np.int32)[:, None], (1, 1 + nfc))
    fi = np.nonzero(grid.interior_faces)[0]
    cin, cout = grid.face_cells[fi, 0], grid.face_cells[fi, 1]
    li, lo = grid.face_local[fi, 0], grid.face_local[fi, 1]
    neighbors[cin, 1 + li] = cout
    neighbors[cout, 1 + lo] = cin
    return neighbors


def block_ell_from_sparse(space, sparse_matrix) -> BlockEllMatrix:
    """Convert a DG SparseMatrix (scalar ELL, cell-block sparsity) into
    block-ELL layout.  The slot -> (cell, slot, i, j) map is static, so under
    jit this is a single static gather of the value vector."""
    grid = space.grid
    nd = space.shape_count
    neighbors = block_ell_neighbors(grid)
    nc, B = neighbors.shape
    p = sparse_matrix.pattern
    # position of each slot: row = c*nd + i, col = n*nd + j; find b with
    # neighbors[c, b] == n (pick the first match; self-couplings -> slot 0)
    rows = p.slot_rows.astype(np.int64)
    cols = p.slot_cols.astype(np.int64)
    c, i = rows // nd, rows % nd
    n, j = cols // nd, cols % nd
    b = np.zeros(len(rows), dtype=np.int64)
    found = np.zeros(len(rows), dtype=bool)
    for bb in range(B):
        match = (~found) & (neighbors[c, bb] == n) & ((bb == 0) == (c == n))
        b[match] = bb
        found |= match
    if not found.all():
        raise ValueError("sparse matrix does not fit the cell-neighbour stencil")
    flat = ((c * B + b) * nd + i) * nd + j
    blocks = jnp.zeros(nc * B * nd * nd, dtype=sparse_matrix.values.dtype)
    blocks = blocks.at[jnp.asarray(flat)].set(sparse_matrix.values)
    return BlockEllMatrix(neighbors, blocks.reshape(nc, B, nd, nd))


def build_block_ell(
    space: Space,
    vol_local: jnp.ndarray,  # [NC, nd, nd]
    int_blocks: jnp.ndarray,  # [Fi, 2, 2, nd, nd] (from swipdg_face_blocks)
    bnd_blocks: jnp.ndarray,  # [Fb, nd, nd]
    interior_faces: np.ndarray,
    boundary_faces: np.ndarray,
) -> BlockEllMatrix:
    """Assemble SWIPDG volume/face blocks into block-ELL layout."""
    grid = space.grid
    nc, nd, nfc = grid.num_cells, space.shape_count, grid.faces_per_cell
    B = 1 + nfc
    fi = np.asarray(interior_faces)
    fb = np.asarray(boundary_faces)

    neighbors = np.tile(np.arange(nc, dtype=np.int32)[:, None], (1, B))
    if len(fi):
        cin, cout = grid.face_cells[fi, 0], grid.face_cells[fi, 1]
        li, lo = grid.face_local[fi, 0], grid.face_local[fi, 1]
        neighbors[cin, 1 + li] = cout
        neighbors[cout, 1 + lo] = cin

    blocks = jnp.zeros((nc, B, nd, nd), dtype=vol_local.dtype)
    blocks = blocks.at[:, 0].add(vol_local)
    if len(fi):
        cin_j = jnp.asarray(cin)
        cout_j = jnp.asarray(cout)
        blocks = blocks.at[cin_j, 0].add(int_blocks[:, 0, 0])
        blocks = blocks.at[cout_j, 0].add(int_blocks[:, 1, 1])
        blocks = blocks.at[cin_j, 1 + jnp.asarray(li)].set(int_blocks[:, 0, 1])
        blocks = blocks.at[cout_j, 1 + jnp.asarray(lo)].set(int_blocks[:, 1, 0])
    if len(fb):
        blocks = blocks.at[jnp.asarray(grid.face_cells[fb, 0]), 0].add(bnd_blocks)
    return BlockEllMatrix(neighbors, blocks)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate/det) — avoids batched LU,
    which compiles poorly on the TPU backend."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    # det-safe: near-singular blocks (f32 high-contrast coarse operators)
    # fall back to a diagonally-scaled identity instead of producing inf/nan
    scale = jnp.maximum(jnp.abs(m).max(axis=(-2, -1)), 1e-30)
    tiny = jnp.abs(det) < 1e-12 * scale**3
    safe_det = jnp.where(tiny, 1.0, det)
    inv = adj / safe_det[..., None, None]
    fallback = jnp.eye(3, dtype=m.dtype) / scale[..., None, None]
    return jnp.where(tiny[..., None, None], fallback, inv)


def _block_inverse(blocks: jnp.ndarray) -> jnp.ndarray:
    if blocks.shape[-1] == 3:
        return inv3x3(blocks)
    return jnp.linalg.inv(blocks)


def block_jacobi_preconditioner(matrix: BlockEllMatrix):
    """Inverse of the nd x nd diagonal blocks, applied blockwise."""
    inv = _block_inverse(matrix.diagonal_blocks())  # [NC, nd, nd]
    nd = matrix.nd

    def apply(r):
        rc = r.reshape(-1, nd)
        return jnp.einsum("cij,cj->ci", inv, rc,
                          precision=jax.lax.Precision.HIGHEST).reshape(-1)

    return apply


def symmetric_diagonal_scaling(matrix: BlockEllMatrix, b: jnp.ndarray):
    """(A, b) -> (S A S, S b) with S = diag(A)^{-1/2}; returns the scaled
    system plus S for unscaling.  For high-contrast coefficients this keeps
    the float32 dynamic range of the Krylov iteration tame (entries of the
    scaled matrix are O(1))."""
    nd = matrix.nd
    diag = jnp.einsum("cii->ci", matrix.diagonal_blocks())  # [NC, nd]
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    s_rows = s[:, None, :, None]  # scale test index i of cell c
    s_cols = s[matrix.neighbors][:, :, None, :]  # ansatz index j of neighbor
    blocks = matrix.blocks * s_rows * s_cols
    s_flat = s.reshape(-1)
    return matrix.with_blocks(blocks), b * s_flat, s_flat


def block_cg(matrix: BlockEllMatrix, b: jnp.ndarray, tol: float = 1e-6,
             maxiter: int = 500, M=None,
             x0: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Preconditioned CG on a BlockEllMatrix (lax.while_loop, jittable).
    Returns (x, relative_residual)."""
    if M is None:
        M = block_jacobi_preconditioner(matrix)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matrix.matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.vdot(r, r) > atol2) & (k < maxiter)

    def step(state):
        x, r, z, p, rz, k = state
        ap = matrix.matvec(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, k + 1

    x, r, z, p, rz, k = jax.lax.while_loop(cond, step, (x, r, z, p, rz, 0))
    return x, jnp.linalg.norm(r) / jnp.maximum(bnorm, 1e-30)
