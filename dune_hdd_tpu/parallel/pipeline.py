"""Stage pipelining (PP) of the assemble -> solve -> estimate chain.

SURVEY §2.8 lists pipeline parallelism for this framework as "optional
stage pipelining of assembly→solve→estimate across devices" (the reference
has no parallel execution at all; its MPI is init-only,
discreteproblem.hh:91-95).  This module implements that option as a
GPipe-style schedule over a ``stage`` mesh axis of S >= 3 devices:

* stages 0 .. S-3 (assemble chain): the affine component stacks — the
  "weights" of this pipeline — are SHARDED over the assembly stages
  (in_spec P("stage") on the Q axis, zero-padded on the solve/estimate
  devices).  Each assembly stage adds its shard's θ-contraction
  ``Σ_{q∈shard} θ_q(μ)·A_q`` to the item's partial operator/rhs as the
  item flows past — exactly how GPipe partitions layer weights along the
  pipeline.  Per-device affine-stack footprint is ceil(Q/(S-2)) components
  instead of Q; the solve/estimate devices' shards are zero padding (SPMD
  equal-shard artifact) and carry no decomposition data.
* stage S-2 (solve): fixed-trip Jacobi-CG on the frozen system;
* stage S-1 (estimate): jittable per-solution functionals.  Always
  (relative residual, energy norm); optionally the REAL ESV2007 estimator
  kernels (eta_NC Oswald, eta_DF with RT0 flux reconstruction, eta_R_* —
  estimators/swipdg.py, reference estimators/swipdg.hh:70-632) evaluated
  at the item's μ inside the stage: the ParameterFunctional θ-evaluation
  is jnp-traced, so the full estimator machinery runs under the pipeline's
  jit and equals the host front-end exactly.

A stream of B parameters flows through S stages in B + S - 1 steps; at
step t, stage s works on item t - s and hands its payload (partial/frozen
ELL values, rhs, solution) to stage s + 1 with ONE ``ppermute`` over the
ICI ring — the classic pipeline: steady-state cost per item is the slowest
stage, not the stage sum.

DP over μ (``sharded_parameter_sweep``) remains the preferred axis for
embarrassingly parallel sweeps; PP composes with DD when the solve stage
is itself domain-sharded, and earns its keep when the affine decomposition
(many components × fine grid) does not fit one device.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..affine import AffineDecomposition

__all__ = ["make_stage_mesh", "pipeline_parameter_stages",
           "sequential_parameter_stages", "EstimatorStage"]

NUM_STAGES = 3


def make_stage_mesh(devices=None, num_stages: int = NUM_STAGES) -> Mesh:
    """Mesh with a single ("stage",) axis over ``num_stages`` devices."""
    if num_stages < NUM_STAGES:
        raise ValueError(f"stage pipelining needs >= {NUM_STAGES} stages")
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < num_stages:
        raise ValueError(
            f"stage pipelining needs {num_stages} devices, got {len(devices)}")
    return Mesh(np.asarray(devices[:num_stages]), axis_names=("stage",))


class EstimatorStage:
    """Config for the real estimate stage: which ESV2007 estimator ids to
    evaluate, on which space/problem, at which per-item parameters.

    ``mus``: length-B list of Parameter dicts (one per pipeline item); they
    are stacked into [B, dim] arrays and sliced per item inside the jitted
    stage.  ``mu_hat`` (optional) is a FIXED parameter for the eta_DF
    weighting metric (estimators/swipdg.hh:582-585); default = the item's μ.
    """

    def __init__(self, space, boundary_info, problem,
                 mus: Sequence[Dict], types: Sequence[str] = (
                     "eta_NC_ESV2007", "eta_DF_ESV2007", "eta_R_ESV2007_*"),
                 mu_hat: Optional[Dict] = None):
        self.space = space
        self.boundary_info = boundary_info
        self.problem = problem
        self.types = tuple(types)
        self.mu_hat = mu_hat
        keys = sorted({k for mu in mus for k in mu})
        self.mu_arrays = {
            k: jnp.stack([jnp.atleast_1d(jnp.asarray(mu[k], dtype=jnp.result_type(float)))
                          for mu in mus]) for k in keys}


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


def _estimator_values(est: EstimatorStage, u, i, mu_arrays):
    """The real estimator kernels at the item's μ — traced inside the stage
    (the full batched ESV2007 machinery from estimators/swipdg.py)."""
    from ..estimators.swipdg import SWIPDGEstimators

    mu = ({k: v[i] for k, v in mu_arrays.items()}
          if est.problem.parametric() else None)
    mu_hat = est.mu_hat if est.mu_hat is not None else mu
    out = []
    for t in est.types:
        local = SWIPDGEstimators._local_squared(
            est.space, est.boundary_info, est.problem, u, t, mu, mu_hat)
        out.append(jnp.sqrt(jnp.sum(local)))
    return jnp.stack(out)


def _pad_rows(stack: jnp.ndarray, chunk: int, num_stages: int) -> jnp.ndarray:
    """Zero-pad axis 0 to num_stages * chunk rows (real data in the leading
    rows -> on the assembly stages' shards; the solve/estimate shards are
    zeros)."""
    pad = num_stages * chunk - stack.shape[0]
    return jnp.concatenate(
        [stack, jnp.zeros((pad,) + stack.shape[1:], stack.dtype)])


def _build_pipeline(mesh: Mesh, cg_iters: int, n_est: int,
                    est: Optional[EstimatorStage]):
    """Jitted shard_map pipeline over the mesh's "stage" axis.

    Inputs (see pipeline_parameter_stages): θ stacks padded to the sharded
    component layout, component stacks sharded P("stage") on the Q axis.
    """
    S = mesh.shape["stage"]
    A = S - 2  # number of assembly stages

    def _zero_est(n, dtype):
        # all switch branches must agree that the estimate vector is
        # device-varying (the estimate branch's output depends on the
        # stage's payload)
        return jax.lax.pcast(jnp.zeros(n, dtype), "stage", to="varying")

    def body(th_op, th_rhs, vals_q, cols, rhs_q, mu_arrays):
        s = jax.lax.axis_index("stage")
        B = th_op.shape[0]
        n = rhs_q.shape[1]
        K = cols.shape[1]
        Qc = vals_q.shape[0]   # per-device operator component chunk
        Qcr = rhs_q.shape[0]   # per-device rhs component chunk

        def assemble(payload, item):
            # stage s < A: add this shard's θ-contraction to the partial
            # operator/rhs (stage 0 starts the item from zero)
            vals, b, u = payload
            i = jnp.clip(item, 0, B - 1)
            th_loc = jax.lax.dynamic_slice(th_op[i], (s * Qc,), (Qc,))
            thr_loc = jax.lax.dynamic_slice(th_rhs[i], (s * Qcr,), (Qcr,))
            keep = jnp.where(s > 0, 1.0, 0.0).astype(vals.dtype)
            vals = keep * vals + jnp.einsum("q,qnk->nk", th_loc, vals_q)
            b = keep * b + jnp.einsum("q,qn->n", thr_loc, rhs_q)
            return (vals, b, jnp.zeros_like(b)), _zero_est(n_est, vals.dtype)

        def solve(payload, item):
            vals, b, _ = payload
            u = _local_cg(vals, cols, b, cg_iters)
            return (vals, b, u), _zero_est(n_est, vals.dtype)

        def estimate(payload, item):
            vals, b, u = payload
            i = jnp.clip(item, 0, B - 1)
            parts = [_default_estimate(vals, cols, b, u)]
            if est is not None:
                parts.append(
                    _estimator_values(est, u, i, mu_arrays).astype(vals.dtype))
            return payload, jnp.concatenate(parts)

        # mark the payload as device-varying up front: stage 0's output
        # depends on axis_index, so every switch branch must agree on the
        # varying-manual-axes type
        payload = tuple(
            jax.lax.pcast(x, "stage", to="varying")
            for x in (jnp.zeros((n, K), rhs_q.dtype),
                      jnp.zeros(n, rhs_q.dtype), jnp.zeros(n, rhs_q.dtype)))
        out_u = jax.lax.pcast(jnp.zeros((B, n), rhs_q.dtype), "stage",
                              to="varying")
        out_est = jax.lax.pcast(jnp.zeros((B, n_est), rhs_q.dtype), "stage",
                                to="varying")
        perm = [(k, k + 1) for k in range(S - 1)]
        role = jnp.where(s < A, 0, jnp.where(s == A, 1, 2))

        def step(t, carry):
            payload, out_u, out_est = carry
            item = t - s
            active = (item >= 0) & (item < B)
            payload, est_vec = jax.lax.switch(
                role, [assemble, solve, estimate], payload, item)
            # the last stage records its (just received) item's results
            _, _, u = payload
            record = active & (s == S - 1)
            i = jnp.clip(item, 0, B - 1)
            out_u = out_u.at[i].set(jnp.where(record, u, out_u[i]))
            out_est = out_est.at[i].set(
                jnp.where(record, est_vec, out_est[i]))
            # hand the payload to the next stage over the ICI ring
            payload = tuple(
                jax.lax.ppermute(x, "stage", perm) for x in payload)
            return payload, out_u, out_est

        _, out_u, out_est = jax.lax.fori_loop(
            0, B + S - 1, step, (payload, out_u, out_est))
        # only the last stage wrote anything; psum replicates its results
        return jax.lax.psum(out_u, "stage"), jax.lax.psum(out_est, "stage")

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("stage"), P(), P("stage"), P()),
        out_specs=(P(), P()),
    ))


def pipeline_parameter_stages(
    operator: AffineDecomposition,
    rhs: AffineDecomposition,
    thetas_op: jnp.ndarray,
    thetas_rhs: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    cg_iters: int = 200,
    dtype=jnp.float32,
    estimator: Optional[EstimatorStage] = None,
    _return_stacks: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a stream of B parameters through the S-stage pipeline.

    thetas_op [B, Q_op], thetas_rhs [B, Q_rhs] (rows = θ(μ) per item) ->
    (solutions [B, N], estimates [B, K]) with K = 2 (relative residual,
    energy) or 2 + len(estimator.types) when an :class:`EstimatorStage` is
    given (the real ESV2007 estimator values at each item's μ).

    The affine component stacks are placed SHARDED over the assembly
    stages (device s holds components [s·Qc, (s+1)·Qc); the solve and
    estimate devices hold only zero padding) — the memory rationale for
    pipelining: no device materializes the full decomposition.
    """
    mesh = mesh if mesh is not None else make_stage_mesh()
    S = mesh.shape.get("stage")
    if S is None or S < NUM_STAGES:
        raise ValueError(
            f'mesh must have a "stage" axis of size >= {NUM_STAGES}')
    A = S - 2
    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(operator, rhs, dtype)
    Qc = -(-ell_vals.shape[0] // A)
    Qcr = -(-rhs_stack.shape[0] // A)
    vals_pad = _pad_rows(ell_vals, Qc, S)
    rhs_pad = _pad_rows(rhs_stack, Qcr, S)
    # commit the stacks to their sharded layout up front (so the full stack
    # never lives replicated on the devices)
    vals_pad = jax.device_put(vals_pad, NamedSharding(mesh, P("stage")))
    rhs_pad = jax.device_put(rhs_pad, NamedSharding(mesh, P("stage")))
    thetas_op = jnp.asarray(thetas_op, dtype=dtype)
    thetas_rhs = jnp.asarray(thetas_rhs, dtype=dtype)
    th_op = jnp.zeros((thetas_op.shape[0], S * Qc), dtype=dtype)
    th_op = th_op.at[:, : thetas_op.shape[1]].set(thetas_op)
    th_rhs = jnp.zeros((thetas_rhs.shape[0], S * Qcr), dtype=dtype)
    th_rhs = th_rhs.at[:, : thetas_rhs.shape[1]].set(thetas_rhs)
    n_est = 2 + (len(estimator.types) if estimator is not None else 0)
    fn = _build_pipeline(mesh, int(cg_iters), n_est, estimator)
    mu_arrays = estimator.mu_arrays if estimator is not None else {}
    out = fn(th_op, th_rhs, vals_pad, ell_cols, rhs_pad, mu_arrays)
    if _return_stacks:
        return out + ((vals_pad, rhs_pad),)
    return out


def sequential_parameter_stages(
    operator: AffineDecomposition,
    rhs: AffineDecomposition,
    thetas_op: jnp.ndarray,
    thetas_rhs: jnp.ndarray,
    cg_iters: int = 200,
    dtype=jnp.float32,
    estimator: Optional[EstimatorStage] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device reference running the identical stage functions in
    sequence (the equality baseline for the pipeline).  With an
    :class:`EstimatorStage` the estimator values come from the HOST
    front-end (``SWIPDGEstimators.estimate``), so pipeline == sequential
    also proves the in-pipeline estimate stage equals the public API."""
    from ..estimators.swipdg import SWIPDGEstimators

    ell_vals, ell_cols, rhs_stack, _, _ = _ell_stacks(operator, rhs, dtype)
    us, ests = [], []
    for i, (th_op, th_rhs) in enumerate(
            zip(np.asarray(thetas_op), np.asarray(thetas_rhs))):
        vals = jnp.einsum("q,qnk->nk", jnp.asarray(th_op, dtype=dtype),
                          ell_vals)
        b = jnp.einsum("q,qn->n", jnp.asarray(th_rhs, dtype=dtype), rhs_stack)
        u = _local_cg(vals, ell_cols, b, int(cg_iters))
        us.append(u)
        parts = [_default_estimate(vals, ell_cols, b, u)]
        if estimator is not None:
            mu = ({k: v[i] for k, v in estimator.mu_arrays.items()}
                  if estimator.problem.parametric() else None)
            mu_hat = estimator.mu_hat if estimator.mu_hat is not None else mu
            vals_est = [SWIPDGEstimators.estimate(
                estimator.space, estimator.boundary_info, estimator.problem,
                u, t, mu, mu_hat) for t in estimator.types]
            parts.append(jnp.asarray(vals_est, dtype=dtype))
        ests.append(jnp.concatenate(parts))
    return jnp.stack(us), jnp.stack(ests)
