"""Jitted linear solvers + options registry.

Replaces Stuff::LA::Solver (reference: discretizations/base.hh:314-322
solver_types/solver_options forwarding, uncached_solve apply_inverse at
base.hh:361).  Krylov methods are XLA-compiled jax.scipy primitives with
matrix-free operator application (ELL SpMV), preconditioned by Jacobi /
block-Jacobi; "direct" densifies (small systems, reference solutions).
"""
from __future__ import annotations


from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import SparseMatrix

__all__ = ["solver_types", "solver_options", "solve", "make_preconditioner"]

_DEFAULT_OPTS = {
    "direct": {"type": "direct"},
    # handled by the DG discretizations (block-ELL fast path); listed here so
    # solver_options() documents it
    "block_cg.jacobi": {"type": "block_cg.jacobi", "max_iter": 10000, "precision": 1e-10},
    # SoA plane-layout solver for structured NVB grids (la/stencil.py);
    # handled by the DG discretizations, falls back to block_cg elsewhere
    "stencil_cg": {"type": "stencil_cg", "max_iter": 10000, "precision": 1e-10},
    "cg": {"type": "cg", "max_iter": 10000, "precision": 1e-10},
    "cg.jacobi": {"type": "cg.jacobi", "max_iter": 10000, "precision": 1e-10},
    "bicgstab": {"type": "bicgstab", "max_iter": 10000, "precision": 1e-10},
    "bicgstab.jacobi": {"type": "bicgstab.jacobi", "max_iter": 10000, "precision": 1e-10},
    "gmres": {"type": "gmres", "max_iter": 2000, "restart": 50, "precision": 1e-10},
    "gmres.jacobi": {"type": "gmres.jacobi", "max_iter": 2000, "restart": 50, "precision": 1e-10},
}


def solver_types() -> List[str]:
    """Available solver ids; first entry is the default (mirrors
    Stuff::LA::Solver::types())."""
    return ["bicgstab.jacobi", "cg.jacobi", "cg", "bicgstab", "gmres.jacobi",
            "gmres", "direct", "block_cg.jacobi", "stencil_cg"]


def solver_options(type_: Optional[str] = None) -> Dict:
    type_ = type_ or solver_types()[0]
    if type_ not in _DEFAULT_OPTS:
        raise ValueError(f"unknown solver type {type_!r}; available: {solver_types()}")
    return dict(_DEFAULT_OPTS[type_])


def make_preconditioner(matrix: SparseMatrix, kind: str) -> Optional[Callable]:
    if kind == "jacobi":
        inv_diag = 1.0 / matrix.diagonal()
        return lambda r: inv_diag * r
    if kind in (None, "", "none"):
        return None
    raise ValueError(f"unknown preconditioner {kind!r}")


def solve(
    matrix: SparseMatrix,
    rhs: jnp.ndarray,
    options: Optional[Dict] = None,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """apply_inverse: solve A x = b according to an options dict
    (reference semantics of Stuff::LA::Solver::apply_inverse)."""
    opts = solver_options() if options is None else dict(options)
    type_ = opts.get("type", solver_types()[0])
    base, _, precond = type_.partition(".")
    tol = float(opts.get("precision", 1e-10))
    maxiter = int(opts.get("max_iter", 10000))

    if base == "direct":
        if matrix.pattern.shape[0] > 4096:
            # sparse LU on the host (reference-level solves; the reference
            # reaches SuperLU through the same "direct" option,
            # base.hh:327-367) — densifying would be O(N^2) memory
            import scipy.sparse as _sp
            import scipy.sparse.linalg as _spla

            p = matrix.pattern
            A = _sp.csc_matrix(
                (np.asarray(matrix.values, dtype=np.float64),
                 (p.slot_rows, p.slot_cols)),
                shape=p.shape,
            )
            x = _spla.spsolve(A, np.asarray(rhs, dtype=np.float64))
            return jnp.asarray(x, dtype=rhs.dtype)
        return jnp.linalg.solve(matrix.to_dense(), rhs)

    M = make_preconditioner(matrix, precond) if precond else None
    mv = matrix.matvec
    if base == "cg":
        x, _ = jax.scipy.sparse.linalg.cg(mv, rhs, x0=x0, tol=tol, maxiter=maxiter, M=M)
    elif base == "bicgstab":
        x, _ = jax.scipy.sparse.linalg.bicgstab(
            mv, rhs, x0=x0, tol=tol, maxiter=maxiter, M=M
        )
    elif base == "gmres":
        x, _ = jax.scipy.sparse.linalg.gmres(
            mv,
            rhs,
            x0=x0,
            tol=tol,
            maxiter=maxiter,
            restart=int(opts.get("restart", 50)),
            M=M,
        )
    else:
        raise ValueError(f"unknown solver type {type_!r}")
    return x
