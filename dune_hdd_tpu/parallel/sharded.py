"""Sharded (multi-chip) execution of affine block systems.

The reference's parallel axis is domain decomposition executed sequentially
(survey 2.8/5.7: BlockSWIPDG subdomains + MPI initialised but never used).
Here that axis becomes a real device-mesh axis:

* "domain" axis — DoF-row blocks of the global ELL operator are sharded
  across devices (the TPU analog of per-subdomain local systems); SpMV
  gathers the needed remote x entries with an ``all_gather`` over ICI (halo
  exchange; a ppermute neighbour exchange is a later optimisation), and CG
  inner products reduce with ``psum``.
* "mu" axis — embarrassingly parallel parameter sweeps (the reference's EOC
  loops and pyMOR greedy evaluate many mu sequentially, survey 2.8 DP row)
  are sharded as a leading batch axis.

Everything is expressed with jax.shard_map over a jax.sharding.Mesh, so the
same code runs on one chip, a v5p pod slice, or the 8-device CPU test mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..affine import AffineDecomposition
from ..la.sparse import SparseMatrix

__all__ = [
    "make_device_mesh",
    "ShardedAffineSystem",
    "sharded_cg",
    "sharded_parameter_sweep",
]


def make_device_mesh(mu_axis: int = 1, domain_axis: Optional[int] = None,
                     devices=None) -> Mesh:
    """Mesh with ("mu", "domain") axes over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if domain_axis is None:
        domain_axis = n // mu_axis
    if mu_axis * domain_axis != n:
        raise ValueError(f"{mu_axis} x {domain_axis} != {n} devices")
    arr = np.asarray(devices).reshape(mu_axis, domain_axis)
    return Mesh(arr, axis_names=("mu", "domain"))


def _pad_rows(a: np.ndarray, rows: int):
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, widths)


class ShardedAffineSystem:
    """An affine family of ELL operators + rhs, laid out for row-sharding.

    Stacks the Q component value arrays as ELL [Q, N_pad, K] with global
    column ids, pads N to a multiple of the domain axis, and exposes a jitted
    sharded ``solve(thetas)``: freeze (theta contraction — one einsum the
    compiler fuses into the SpMV) + preconditioned CG with mesh collectives.
    """

    def __init__(self, operator: AffineDecomposition, rhs: AffineDecomposition,
                 mesh: Mesh, dtype=jnp.float32):
        self.mesh = mesh
        n_dom = mesh.shape["domain"]
        expanded = operator.with_expanded_affine_part()
        rhs_expanded = rhs.with_expanded_affine_part()
        mats = [c for c in expanded.components]
        self.op_coefficients = list(expanded.coefficients)
        self.rhs_coefficients = list(rhs_expanded.coefficients)
        pattern = mats[0].pattern
        n = pattern.shape[0]
        self.num_dofs = n
        self.n_pad = ((n + n_dom - 1) // n_dom) * n_dom
        ell_cols = _pad_rows(pattern.ell_cols, self.n_pad)
        ell_vals = np.stack(
            [_pad_rows(np.asarray(m.pattern.ell_values(m.values)), self.n_pad) for m in mats]
        )
        rhs_stack = np.stack(
            [_pad_rows(np.asarray(v), self.n_pad) for v in rhs_expanded.components]
        )
        self.ell_cols = jnp.asarray(ell_cols)
        self.ell_vals = jnp.asarray(ell_vals, dtype=dtype)
        self.rhs_stack = jnp.asarray(rhs_stack, dtype=dtype)
        self.dtype = dtype
        # device placement: shard rows over the "domain" axis
        self._vals_sharding = NamedSharding(mesh, P(None, "domain", None))
        self._cols_sharding = NamedSharding(mesh, P("domain", None))
        self.ell_vals = jax.device_put(self.ell_vals, self._vals_sharding)
        self.ell_cols = jax.device_put(self.ell_cols, self._cols_sharding)
        self.rhs_stack = jax.device_put(
            self.rhs_stack, NamedSharding(mesh, P(None, "domain"))
        )

    def thetas(self, decomposition_coeffs, mu) -> jnp.ndarray:
        return jnp.stack([jnp.asarray(c(mu)).astype(self.dtype) for c in decomposition_coeffs])

    def solve(self, mu, tol: float = 1e-6, maxiter: int = 1000) -> jnp.ndarray:
        """Freeze at mu and run sharded CG; returns the unpadded solution."""
        th_op = self.thetas(self.op_coefficients, mu)
        th_rhs = self.thetas(self.rhs_coefficients, mu)
        u = _sharded_solve_jit(
            self.mesh, self.ell_vals, self.ell_cols, self.rhs_stack,
            th_op, th_rhs, tol, maxiter,
        )
        return u[: self.num_dofs]


@partial(jax.jit, static_argnums=(0, 6, 7))
def _sharded_solve_jit(mesh, ell_vals, ell_cols, rhs_stack, th_op, th_rhs,
                       tol, maxiter):
    def body(ell_vals_l, ell_cols_l, rhs_l):
        vals = jnp.einsum("q,qnk->nk", th_op, ell_vals_l)
        b = jnp.einsum("q,qn->n", th_rhs, rhs_l)
        return sharded_cg(vals, ell_cols_l, b, "domain", tol=tol, maxiter=maxiter)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, "domain", None), P("domain", None), P(None, "domain")),
        out_specs=P("domain"),
    )(ell_vals, ell_cols, rhs_stack)


def sharded_cg(ell_vals_local: jnp.ndarray, ell_cols_local: jnp.ndarray,
               b_local: jnp.ndarray, axis_name: str, tol: float = 1e-6,
               maxiter: int = 1000) -> jnp.ndarray:
    """Jacobi-preconditioned CG on a row-sharded ELL matrix, inside
    shard_map: SpMV via all_gather of x (ICI), reductions via psum."""

    def matvec(x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
        return jnp.sum(ell_vals_local * x_full[ell_cols_local], axis=1)

    def dot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis_name)

    # local diagonal for the Jacobi preconditioner
    n_local = ell_vals_local.shape[0]
    idx = jax.lax.axis_index(axis_name)
    rows_global = idx * n_local + jnp.arange(n_local)
    on_diag = ell_cols_local == rows_global[:, None]
    diag = jnp.sum(jnp.where(on_diag, ell_vals_local, 0.0), axis=1)
    inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)

    x = jnp.zeros_like(b_local)
    r = b_local
    z = inv_diag * r
    p = z
    rz = dot(r, z)
    bnorm = jnp.sqrt(dot(b_local, b_local))
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (dot(r, r) > atol2) & (k < maxiter)

    def step(state):
        x, r, z, p, rz, k = state
        ap = matvec(p)
        alpha = rz / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = inv_diag * r
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, k + 1

    x, r, z, p, rz, k = jax.lax.while_loop(cond, step, (x, r, z, p, rz, 0))
    return x


def sharded_parameter_sweep(system: ShardedAffineSystem, thetas_op: jnp.ndarray,
                            thetas_rhs: jnp.ndarray, tol: float = 1e-6,
                            maxiter: int = 1000) -> jnp.ndarray:
    """Solve for a batch of parameters: the batch is sharded over the "mu"
    mesh axis (data parallelism), each solve row-sharded over "domain".

    thetas_op [B, Q_op], thetas_rhs [B, Q_rhs] -> solutions [B, N_pad].
    """
    mesh = system.mesh

    def body(th_op_l, th_rhs_l, ell_vals_l, ell_cols_l, rhs_l):
        def one(th_op, th_rhs):
            vals = jnp.einsum("q,qnk->nk", th_op, ell_vals_l)
            b = jnp.einsum("q,qn->n", th_rhs, rhs_l)
            return sharded_cg(vals, ell_cols_l, b, "domain", tol=tol, maxiter=maxiter)

        return jax.vmap(one)(th_op_l, th_rhs_l)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("mu", None), P("mu", None), P(None, "domain", None),
                  P("domain", None), P(None, "domain")),
        out_specs=P("mu", "domain"),
    )
    return jax.jit(fn)(
        thetas_op.astype(system.dtype), thetas_rhs.astype(system.dtype),
        system.ell_vals, system.ell_cols, system.rhs_stack,
    )
