"""Static-structure sparse operators for TPU.

Replaces Stuff::LA containers (reference: discretizations/base.hh affine
matrix/vector payloads).  Design: the *sparsity structure* is built once on
the host (numpy) from cell/face DoF couplings; the *values* live as a flat
``[nnz]`` jnp array filled under jit by a sorted ``segment_sum`` over local
element/face contributions — no scatter contention, fully static shapes.

Matrices are stored in ELL layout (``[N, K]`` padded column/value arrays), so
SpMV is gather + multiply + row-reduce: dense, regular, VPU-friendly, and a
natural Pallas kernel later.  Affine decompositions stack value arrays over a
leading q axis and share one pattern (freeze = theta-weighted sum of value
arrays).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SparsityPattern", "SparseMatrix", "build_pattern"]


@dataclass(frozen=True, eq=False)  # identity equality: patterns are shared
class SparsityPattern:
    """Host-built static structure mapping raw (possibly duplicate) COO
    entries to deduplicated slots and an ELL layout."""

    shape: Tuple[int, int]
    nnz: int
    # raw-entry -> slot machinery (for jit value assembly)
    perm: np.ndarray  # [E] sort order of raw entries
    seg_ids: np.ndarray  # [E] slot id per sorted raw entry
    # slot metadata
    slot_rows: np.ndarray  # [nnz]
    slot_cols: np.ndarray  # [nnz]
    # ELL layout
    ell_width: int
    ell_cols: np.ndarray  # [N, K] int32, padded entries point at column 0
    ell_mask: np.ndarray  # [N, K] bool
    slot_ell_pos: np.ndarray  # [nnz] flat index into [N*K] for each slot
    diag_slot: np.ndarray  # [N] slot id of (i, i), -1 if not present

    @property
    def num_rows(self) -> int:
        return self.shape[0]

    def assemble(self, raw_values: jnp.ndarray) -> jnp.ndarray:
        """Raw entry values (same order as the (rows, cols) the pattern was
        built from) -> deduplicated slot values [nnz].  jit-safe."""
        sorted_vals = raw_values[self.perm]
        return jax.ops.segment_sum(
            sorted_vals, jnp.asarray(self.seg_ids), num_segments=self.nnz
        )

    # NOTE: cache only host-side int32 numpy here.  Caching jnp conversions
    # would stash tracers when the first conversion happens inside a jit
    # trace (int64 -> int32 canonicalisation is a traced convert).
    @cached_property
    def _jnp_ell_cols(self):
        return self.ell_cols.astype(np.int32)

    @cached_property
    def _jnp_ell_mask(self):
        return self.ell_mask

    @cached_property
    def _jnp_slot_ell_pos(self):
        return self.slot_ell_pos.astype(np.int32)

    def ell_values(self, slot_values: jnp.ndarray) -> jnp.ndarray:
        """[nnz] slot values -> [N, K] ELL value array."""
        n, k = self.shape[0], self.ell_width
        flat = jnp.zeros(n * k, dtype=slot_values.dtype)
        flat = flat.at[self._jnp_slot_ell_pos].set(slot_values)
        return flat.reshape(n, k)


def build_pattern(
    rows: np.ndarray, cols: np.ndarray, shape: Tuple[int, int]
) -> SparsityPattern:
    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    n, m = shape
    key = rows * m + cols
    perm = np.argsort(key, kind="stable")
    sorted_key = key[perm]
    new_slot = np.ones(len(sorted_key), dtype=bool)
    new_slot[1:] = sorted_key[1:] != sorted_key[:-1]
    seg_ids = np.cumsum(new_slot) - 1
    slot_key = sorted_key[new_slot]
    nnz = len(slot_key)
    slot_rows = (slot_key // m).astype(np.int32)
    slot_cols = (slot_key % m).astype(np.int32)

    counts = np.bincount(slot_rows, minlength=n)
    K = int(counts.max()) if nnz else 1
    pos_in_row = np.arange(nnz) - np.concatenate([[0], np.cumsum(counts)[:-1]])[slot_rows]
    slot_ell_pos = slot_rows.astype(np.int64) * K + pos_in_row
    ell_cols = np.zeros((n, K), dtype=np.int32)
    ell_mask = np.zeros((n, K), dtype=bool)
    ell_cols.reshape(-1)[slot_ell_pos] = slot_cols
    ell_mask.reshape(-1)[slot_ell_pos] = True

    diag_slot = np.full(n, -1, dtype=np.int64)
    on_diag = slot_rows == slot_cols
    diag_slot[slot_rows[on_diag]] = np.nonzero(on_diag)[0]

    return SparsityPattern(
        shape=(n, m),
        nnz=nnz,
        perm=perm,
        seg_ids=seg_ids.astype(np.int32),
        slot_rows=slot_rows,
        slot_cols=slot_cols,
        ell_width=K,
        ell_cols=ell_cols,
        ell_mask=ell_mask,
        slot_ell_pos=slot_ell_pos,
        diag_slot=diag_slot,
    )


@jax.tree_util.register_pytree_node_class
class SparseMatrix:
    """ELL sparse matrix: static pattern + jnp slot values.

    Registered as a pytree with the pattern static, so SparseMatrix instances
    pass through jit/vmap boundaries and AffineDecomposition.freeze maps over
    the value leaf.
    """

    def __init__(self, pattern: SparsityPattern, values: jnp.ndarray):
        self.pattern = pattern
        self.values = values

    def tree_flatten(self):
        return (self.values,), self.pattern

    @classmethod
    def tree_unflatten(cls, pattern, children):
        return cls(pattern, children[0])

    # -- algebra ------------------------------------------------------------
    @property
    def shape(self):
        return self.pattern.shape

    def __mul__(self, scalar):
        return SparseMatrix(self.pattern, self.values * scalar)

    __rmul__ = __mul__

    def __add__(self, other):
        if isinstance(other, SparseMatrix):
            assert other.pattern is self.pattern or other.pattern.shape == self.pattern.shape
            return SparseMatrix(self.pattern, self.values + other.values)
        return NotImplemented

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.pattern
        ell_vals = p.ell_values(self.values)
        gathered = x[p._jnp_ell_cols]  # [N, K]
        return jnp.sum(ell_vals * gathered, axis=1)

    __matmul__ = matvec

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        """A @ X for X [N, K] — one row gather amortised over K columns
        (use for multi-vector workloads: RB projections, power iterations)."""
        p = self.pattern
        ell_vals = p.ell_values(self.values)
        gathered = X[p._jnp_ell_cols]  # [N, Kell, K]
        return jnp.einsum("nk,nkK->nK", ell_vals, gathered)

    def diagonal(self) -> jnp.ndarray:
        p = self.pattern
        d = jnp.where(
            jnp.asarray(p.diag_slot) >= 0,
            self.values[jnp.clip(jnp.asarray(p.diag_slot), 0)],
            0.0,
        )
        return d

    def to_dense(self) -> jnp.ndarray:
        p = self.pattern
        out = jnp.zeros(p.shape, dtype=self.values.dtype)
        return out.at[jnp.asarray(p.slot_rows), jnp.asarray(p.slot_cols)].set(self.values)

    # -- row/column constraints (Dirichlet) ---------------------------------
    def with_constrained_rows(self, row_mask: np.ndarray, unit_diagonal: bool) -> "SparseMatrix":
        """Zero all slots in masked rows; optionally set their diagonal to 1
        (reference: clear/unit row constraints, cg.hh:377-397)."""
        mask = jnp.asarray(np.asarray(row_mask)[self.pattern.slot_rows])
        vals = jnp.where(mask, 0.0, self.values)
        if unit_diagonal:
            dslot = np.asarray(self.pattern.diag_slot)
            rows = np.nonzero(np.asarray(row_mask))[0]
            slots = dslot[rows]
            assert (slots >= 0).all(), "unit-row constraint needs diagonal slots"
            vals = vals.at[jnp.asarray(slots)].set(1.0)
        return SparseMatrix(self.pattern, vals)

    def with_constrained_cols(self, col_mask: np.ndarray, keep_unit_diag: bool) -> "SparseMatrix":
        """Zero all slots in masked columns (keeping (i,i)=old value if
        keep_unit_diag) — symmetric Dirichlet elimination so Krylov solvers
        see an SPD operator."""
        cmask = np.asarray(col_mask)[self.pattern.slot_cols]
        if keep_unit_diag:
            cmask = cmask & (self.pattern.slot_rows != self.pattern.slot_cols)
        vals = jnp.where(jnp.asarray(cmask), 0.0, self.values)
        return SparseMatrix(self.pattern, vals)

    def __repr__(self):
        return f"SparseMatrix(shape={self.shape}, nnz={self.pattern.nnz}, K={self.pattern.ell_width})"
