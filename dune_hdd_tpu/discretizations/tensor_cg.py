"""Dimension-generic Q1 continuous Galerkin on tensor-product grids.

The reference's CG discretization is dimension-templated and instantiated
for SGrid<1,1> and SGrid<3,3> alongside the 2D grids
(examples/linearelliptic/cg.cc:19-21, dune/hdd/.../discretizations/cg.hh).
This is its TPU image for d = 1, 2, 3: multilinear Q1 elements on
axis-aligned boxes, assembly as ONE batched einsum over all cells
(Gauss tensor quadrature), Dirichlet rows/columns cleared symmetrically
(cf. discretizations/cg.py), jit-compatible CG solve.

Coefficients are scalar callables lam(x: [..., d]) -> [...] (the 2D
problem layer's Function objects work unchanged when d == 2).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.tensor import TensorGrid

__all__ = ["TensorCGDiscretization"]


def _gauss_tensor(d: int, n: int = 2):
    """Tensor Gauss rule on [0,1]^d: points [k, d], weights [k]."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (x + 1.0)
    w = 0.5 * w
    mesh = np.meshgrid(*([x] * d), indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=-1)
    wt = np.ones(pts.shape[0])
    for a in range(d):
        wt = wt * w[np.unravel_index(np.arange(pts.shape[0]), (n,) * d)[a]]
    return pts, wt


def _q1_shapes(d: int, pts: np.ndarray):
    """Multilinear Q1 values [k, 2^d] and reference gradients [k, 2^d, d]
    in the corner order of TensorGrid.cells (axis 0 = MSB)."""
    k = pts.shape[0]
    nd = 1 << d
    vals = np.ones((k, nd))
    grads = np.zeros((k, nd, d))
    for c in range(nd):
        for a in range(d):
            bit = (c >> (d - 1 - a)) & 1
            f = pts[:, a] if bit else 1.0 - pts[:, a]
            vals[:, c] *= f
        for a in range(d):
            g = np.ones(k)
            for b in range(d):
                bit = (c >> (d - 1 - b)) & 1
                if b == a:
                    g *= 1.0 if bit else -1.0
                else:
                    g *= pts[:, b] if bit else 1.0 - pts[:, b]
            grads[:, c, a] = g
    return vals, grads


class TensorCGDiscretization:
    """Poisson/elliptic  -div(lam grad u) = f  with zero Dirichlet data on
    the full boundary of a TensorGrid (the cg.cc instantiation surface)."""

    def __init__(self, grid: TensorGrid, diffusion: Optional[Callable] = None,
                 force: Optional[Callable] = None, qorder: int = 2):
        self.grid = grid
        d = grid.dim
        self.diffusion = diffusion or (lambda x: jnp.ones(x.shape[:-1]))
        self.force = force or (lambda x: jnp.ones(x.shape[:-1]))
        pts, wts = _gauss_tensor(d, qorder)
        vals, grads = _q1_shapes(d, pts)
        h = grid.h
        detj = float(np.prod(h))
        self._qw = wts * detj                      # [k]
        self._vals = vals                          # [k, nd]
        self._grads = grads / h[None, None, :]     # physical gradients [k, nd, d]
        # physical quadrature points per cell [NC, k, d]
        lo = grid.cell_vertices[:, 0, :]           # corner 0 = lower corner
        self._qp = lo[:, None, :] + (pts * h)[None, :, :]
        self._dofs = grid.cells                    # [NC, nd] (CG: vertex ids)
        self._bnd = grid.boundary_vertices

    # -- assembly -----------------------------------------------------------
    def assemble(self):
        """(A_dense_free, b_free, free_idx): the Dirichlet-eliminated system
        as index arrays + a matvec closure (matrix-free)."""
        qp = jnp.asarray(self._qp)
        lam = self.diffusion(qp)                   # [NC, k]
        qw = jnp.asarray(self._qw)
        G = jnp.asarray(self._grads)               # [k, nd, d]
        # local stiffness [NC, nd, nd]
        local = jnp.einsum("k,ck,kia,kja->cij", qw, lam, G, G)
        rhs_local = jnp.einsum("k,ck,ki->ci", qw, self.force(qp),
                               jnp.asarray(self._vals))
        return local, rhs_local

    def solve(self, tol: float = 1e-10, maxiter: int = 20000) -> jnp.ndarray:
        local, rhs_local = self.assemble()
        n = self.grid.num_vertices
        dofs = jnp.asarray(self._dofs)
        b = jnp.zeros(n).at[dofs.reshape(-1)].add(rhs_local.reshape(-1))
        free = ~self._bnd

        nd = self._dofs.shape[1]
        free_j = jnp.asarray(free)

        def matvec(x):
            # zero Dirichlet dofs, scatter local matvecs, re-zero
            xm = jnp.where(free_j, x, 0.0)
            xl = xm[dofs]                          # [NC, nd]
            yl = jnp.einsum("cij,cj->ci", local, xl)
            y = jnp.zeros(n, x.dtype).at[dofs.reshape(-1)].add(yl.reshape(-1))
            return jnp.where(free_j, y, x)

        b = jnp.where(free_j, b, 0.0)
        x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=tol, maxiter=maxiter)
        return x

    # -- norms --------------------------------------------------------------
    def error_norms(self, u: jnp.ndarray, exact: Callable,
                    exact_grad: Optional[Callable] = None) -> dict:
        qp = jnp.asarray(self._qp)
        qw = jnp.asarray(self._qw)
        vals = jnp.asarray(self._vals)
        ul = u[jnp.asarray(self._dofs)]            # [NC, nd]
        uh = jnp.einsum("ki,ci->ck", vals, ul)
        e = exact(qp) - uh
        out = {"L2": float(jnp.sqrt(jnp.sum(qw * e**2)))}
        if exact_grad is not None:
            G = jnp.asarray(self._grads)
            gh = jnp.einsum("kia,ci->cka", G, ul)
            ge = exact_grad(qp) - gh
            out["H1_semi"] = float(jnp.sqrt(jnp.sum(qw * jnp.sum(ge**2, -1))))
        return out
