"""Stage pipelining (PP) of the assemble -> solve -> estimate chain.

SURVEY §2.8 lists pipeline parallelism for this framework as "optional
stage pipelining of assembly→solve→estimate across devices" (the reference
has no parallel execution at all; its MPI is init-only,
discreteproblem.hh:91-95).  This module implements that option as a
GPipe-style schedule over a ``stage`` mesh axis:

* stage 0 (assemble): freeze the affine operator/rhs at the item's μ —
  the θ-contraction einsum over the stacked ELL component values;
* stage 1 (solve): fixed-trip Jacobi-CG on the frozen system;
* stage 2 (estimate): cheap jittable per-solution functionals (relative
  residual + energy norm by default — the full ESV2007/OS2014 estimator
  machinery stays a host-level front-end).

A stream of B parameters flows through S stages in B + S - 1 steps; at
step t, stage s works on item t - s and hands its payload (frozen ELL
values, rhs, solution) to stage s + 1 with ONE ``ppermute`` over the ICI
ring — the classic pipeline: steady-state cost per item is the slowest
stage, not the stage sum.  All stage constants here are replicated for
simplicity (on a memory-bound deployment the affine component stack would
live only on stage 0's device, which is the actual reason to pipeline);
the schedule, the per-stage compute, and the inter-stage activation
transfers are the real thing.

DP over μ (``sharded_parameter_sweep``) remains the preferred axis for
embarrassingly parallel sweeps; PP composes with DD when the solve stage
is itself domain-sharded.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..affine import AffineDecomposition

__all__ = ["make_stage_mesh", "pipeline_parameter_stages"]

NUM_STAGES = 3


def make_stage_mesh(devices=None) -> Mesh:
    """Mesh with a single ("stage",) axis over NUM_STAGES devices."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < NUM_STAGES:
        raise ValueError(
            f"stage pipelining needs {NUM_STAGES} devices, got {len(devices)}")
    return Mesh(np.asarray(devices[:NUM_STAGES]), axis_names=("stage",))


def _ell_stacks(operator: AffineDecomposition, rhs: AffineDecomposition,
                dtype):
    """Stacked ELL component values [Q, N, K], columns [N, K], rhs [Qr, N]."""
    expanded = operator.with_expanded_affine_part()
    rhs_expanded = rhs.with_expanded_affine_part()
    mats = list(expanded.components)
    pattern = mats[0].pattern
    ell_cols = jnp.asarray(pattern.ell_cols)
    ell_vals = jnp.stack(
        [jnp.asarray(m.pattern.ell_values(m.values), dtype=dtype)
         for m in mats])
    rhs_stack = jnp.stack(
        [jnp.asarray(v, dtype=dtype) for v in rhs_expanded.components])
    op_coeffs = list(expanded.coefficients)
    rhs_coeffs = list(rhs_expanded.coefficients)
    return ell_vals, ell_cols, rhs_stack, op_coeffs, rhs_coeffs


def _local_cg(vals, cols, b, iters: int, rtol: float = 1e-12):
    """Fixed-trip Jacobi-CG on a single-device ELL system (static schedule:
    every pipeline step costs the same, which is what keeps the GPipe
    schedule balanced).  Early exit is expressed as a converged-freeze mask
    rather than a data-dependent trip count — SPMD-friendly, and it also
    protects against post-convergence near-breakdown blow-up (the SWIPDG
    operator can be slightly indefinite at strong-contrast μ where the
    default penalty no longer guarantees coercivity; a while-loop CG exits
    at tolerance, this freezes there instead)."""
    rows = jnp.arange(b.shape[0])
    diag = jnp.sum(jnp.where(cols == rows[:, None], vals, 0.0), axis=1)
    inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)

    def matvec(x):
        return jnp.sum(vals * x[cols], axis=1)

    x = jnp.zeros_like(b)
    r = b
    z = inv_diag * r
    p = z
    rz = jnp.vdot(r, z)
    atol2 = (rtol ** 2) * jnp.maximum(jnp.vdot(b, b), 1e-300)

    def step(_, state):
        x, r, z, p, rz = state
        done = jnp.vdot(r, r) <= atol2
        ap = matvec(p)
        pap = jnp.vdot(p, ap)
        # signed alpha: CG navigates the slightly indefinite case via
        # negative curvature steps (like the unguarded sharded_cg); only
        # exact breakdown pap == 0 is masked
        ok = (pap != 0) & ~done
        alpha = jnp.where(ok, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = inv_diag * r
        rz_new = jnp.where(ok, jnp.vdot(r, z), rz)
        beta = jnp.where(ok & (rz != 0), rz_new / jnp.where(rz != 0, rz, 1.0),
                         0.0)
        p = jnp.where(ok, z + beta * p, p)
        return x, r, z, p, rz_new

    x, r, z, p, rz = jax.lax.fori_loop(0, iters, step, (x, r, z, p, rz))
    return x


def _default_estimate(vals, cols, b, u):
    """(relative residual, energy norm) of the received solution."""
    au = jnp.sum(vals * u[cols], axis=1)
    relres = jnp.linalg.norm(b - au) / jnp.maximum(jnp.linalg.norm(b), 1e-30)
    energy = jnp.sqrt(jnp.maximum(jnp.vdot(u, au), 0.0))
    return jnp.stack([relres, energy])


@partial(jax.jit, static_argnums=(0, 6))
def _pipeline_jit(mesh, thetas_op, thetas_rhs, ell_vals, ell_cols, rhs_stack,
                  cg_iters):
    B = thetas_op.shape[0]
    n = rhs_stack.shape[1]

    def body(th_op, th_rhs, vals_q, cols, rhs_q):
        s = jax.lax.axis_index("stage")

        def stage0(payload, item):
            i = jnp.clip(item, 0, B - 1)
            vals = jnp.einsum("q,qnk->nk", th_op[i], vals_q)
            b = jnp.einsum("q,qn->n", th_rhs[i], rhs_q)
            return vals, b, jnp.zeros_like(b)

        def stage1(payload, item):
            vals, b, _ = payload
            return vals, b, _local_cg(vals, cols, b, cg_iters)

        def stage2(payload, item):
            return payload

        # mark the payload as device-varying up front: stage 0's output
        # depends on axis_index, so every switch branch must agree on the
        # varying-manual-axes type
        payload = tuple(
            jax.lax.pcast(x, "stage", to="varying")
            for x in (jnp.zeros((n, ell_cols.shape[1]), rhs_q.dtype),
                      jnp.zeros(n, rhs_q.dtype), jnp.zeros(n, rhs_q.dtype)))
        out_u = jax.lax.pcast(jnp.zeros((B, n), rhs_q.dtype), "stage",
                              to="varying")
        out_est = jax.lax.pcast(jnp.zeros((B, 2), rhs_q.dtype), "stage",
                                to="varying")
        perm = [(k, k + 1) for k in range(NUM_STAGES - 1)]

        def step(t, carry):
            payload, out_u, out_est = carry
            item = t - s
            active = (item >= 0) & (item < B)
            payload = jax.lax.switch(s, [stage0, stage1, stage2],
                                     payload, item)
            # the last stage records its (just received) item's results
            vals, b, u = payload
            est = _default_estimate(vals, cols, b, u)
            record = active & (s == NUM_STAGES - 1)
            i = jnp.clip(item, 0, B - 1)
            out_u = out_u.at[i].set(jnp.where(record, u, out_u[i]))
            out_est = out_est.at[i].set(jnp.where(record, est, out_est[i]))
            # hand the payload to the next stage over the ICI ring
            payload = tuple(
                jax.lax.ppermute(x, "stage", perm) for x in payload)
            return payload, out_u, out_est

        _, out_u, out_est = jax.lax.fori_loop(
            0, B + NUM_STAGES - 1, step, (payload, out_u, out_est))
        # only the last stage wrote anything; psum replicates its results
        return jax.lax.psum(out_u, "stage"), jax.lax.psum(out_est, "stage")

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
    )(thetas_op, thetas_rhs, ell_vals, ell_cols, rhs_stack)


def pipeline_parameter_stages(
    operator: AffineDecomposition,
    rhs: AffineDecomposition,
    thetas_op: jnp.ndarray,
    thetas_rhs: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    cg_iters: int = 200,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a stream of B parameters through the 3-stage pipeline.

    thetas_op [B, Q_op], thetas_rhs [B, Q_rhs] (rows = θ(μ) per item) ->
    (solutions [B, N], estimates [B, 2] = (relative residual, energy)).
    """
    mesh = mesh if mesh is not None else make_stage_mesh()
    if mesh.shape.get("stage") != NUM_STAGES:
        raise ValueError(
            f'mesh must have a "stage" axis of size {NUM_STAGES}')
    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(operator, rhs, dtype)
    thetas_op = jnp.asarray(thetas_op, dtype=dtype)
    thetas_rhs = jnp.asarray(thetas_rhs, dtype=dtype)
    return _pipeline_jit(mesh, thetas_op, thetas_rhs, ell_vals, ell_cols,
                         rhs_stack, int(cg_iters))


def sequential_parameter_stages(
    operator: AffineDecomposition,
    rhs: AffineDecomposition,
    thetas_op: jnp.ndarray,
    thetas_rhs: jnp.ndarray,
    cg_iters: int = 200,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device reference running the identical stage functions in
    sequence (the equality baseline for the pipeline)."""
    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(operator, rhs, dtype)
    us, ests = [], []
    for th_op, th_rhs in zip(np.asarray(thetas_op), np.asarray(thetas_rhs)):
        vals = jnp.einsum("q,qnk->nk", jnp.asarray(th_op, dtype=dtype),
                          ell_vals)
        b = jnp.einsum("q,qn->n", jnp.asarray(th_rhs, dtype=dtype), rhs_stack)
        u = _local_cg(vals, ell_cols, b, int(cg_iters))
        us.append(u)
        ests.append(_default_estimate(vals, ell_cols, b, u))
    return jnp.stack(us), jnp.stack(ests)
