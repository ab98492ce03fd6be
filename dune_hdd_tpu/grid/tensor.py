"""Tensor-product interval grids in d = 1, 2, 3 dimensions.

The reference instantiates its CG discretization on SGrid<1,1> and
SGrid<3,3> next to the 2D grids (examples/linearelliptic/cg.cc:19-21);
this module is the dimension-generic counterpart of grid/structured.py's
2D quad grids: axis-aligned boxes on a tensor lattice, with uniform
refinement and boundary masks.  Geometry is host-side numpy (like Grid);
the ops layer consumes static arrays and runs batched einsums on device.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from typing import Sequence, Tuple

import numpy as np

__all__ = ["TensorGrid", "tensor_grid"]


@dataclass(frozen=True, eq=False)
class TensorGrid:
    lower: Tuple[float, ...]
    upper: Tuple[float, ...]
    shape: Tuple[int, ...]  # cells per axis

    @property
    def dim(self) -> int:
        return len(self.shape)

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.shape))

    @property
    def vertex_shape(self) -> Tuple[int, ...]:
        return tuple(n + 1 for n in self.shape)

    @property
    def num_vertices(self) -> int:
        return int(np.prod(self.vertex_shape))

    @property
    def h(self) -> np.ndarray:
        return (np.asarray(self.upper) - np.asarray(self.lower)) / np.asarray(self.shape)

    @cached_property
    def vertices(self) -> np.ndarray:
        """[NV, d] lexicographic (last axis fastest)."""
        axes = [np.linspace(self.lower[a], self.upper[a], self.shape[a] + 1)
                for a in range(self.dim)]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.stack([m.ravel() for m in mesh], axis=-1)

    @cached_property
    def cells(self) -> np.ndarray:
        """[NC, 2^d] vertex ids, corner order = binary counting over axes
        (bit a of the corner index = offset along axis a; axis 0 is the
        most significant bit, matching the lexicographic vertex order)."""
        vs = self.vertex_shape
        strides = np.cumprod([1] + list(vs[::-1]))[::-1][1:]  # vertex strides
        base_axes = [np.arange(n) for n in self.shape]
        mesh = np.meshgrid(*base_axes, indexing="ij")
        base = sum(m.ravel() * strides[a] for a, m in enumerate(mesh))
        d = self.dim
        corners = []
        for c in range(1 << d):
            off = sum(((c >> (d - 1 - a)) & 1) * strides[a] for a in range(d))
            corners.append(base + off)
        return np.stack(corners, axis=-1).astype(np.int64)

    @cached_property
    def cell_vertices(self) -> np.ndarray:
        return self.vertices[self.cells]

    @cached_property
    def boundary_vertices(self) -> np.ndarray:
        """[NV] bool mask of vertices on the domain boundary."""
        vs = self.vertex_shape
        idx = np.unravel_index(np.arange(self.num_vertices), vs)
        mask = np.zeros(self.num_vertices, dtype=bool)
        for a in range(self.dim):
            mask |= (idx[a] == 0) | (idx[a] == vs[a] - 1)
        return mask

    def refine(self) -> "TensorGrid":
        return TensorGrid(self.lower, self.upper,
                          tuple(2 * n for n in self.shape))


def tensor_grid(lower, upper, shape) -> TensorGrid:
    lower = tuple(float(v) for v in np.atleast_1d(lower))
    upper = tuple(float(v) for v in np.atleast_1d(upper))
    shape = tuple(int(v) for v in np.atleast_1d(shape))
    assert len(lower) == len(upper) == len(shape)
    return TensorGrid(lower, upper, shape)
