"""Multi-chip execution of the SoA stencil solver.

The plane-layout operator (la/stencil.py) shards naturally over a device
mesh: slabs along the lattice x-axis.  Every neighbour access is a 2-axis
roll with |dx| <= 2, so each device only ever needs a 2-column halo from
its ring neighbours — and because ``jnp.roll`` wraps (with zero blocks on
the wrapped entries), a ring ``ppermute`` reproduces the single-device
semantics EXACTLY: device 0's left halo is device D-1's right edge, which
is precisely the wrap the roll would have produced.

Per CG iteration the exchange is 2 x [nd, 8, KY, H] columns (O(halo));
reductions are ``psum``.  The two-level deflation stays fully local: the
macro columns partition along x with the slabs, so Z^T r needs no
communication; the (small) coarse operator is psum-assembled once per
solve and its block-cyclic-reduction inverse is computed redundantly on
every device (pure SPMD — no broadcast).

This is the multi-chip production image of the BENCH pipeline, validated
on the 8-device CPU mesh against the single-device solver
(tests/test_stencil_sharded.py) and exercised by dryrun_multichip.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .stencil import (
    StencilBlockEll,
    _coarse_inverse_bcr,
    inv3x3,
)

__all__ = ["ShardedStencilSystem"]

_HALO = 2  # max |dx| of any stencil shift


class ShardedStencilSystem:
    """Plane-layout system sharded over the "domain" axis in x-slabs.

    planes [4, nd, nd, 8, KY, KX] with KX % D == 0; with ``macro``
    (mx, my), additionally mx % D == 0 so aggregates stay slab-local.
    """

    def __init__(self, S: StencilBlockEll, B: jnp.ndarray, mesh: Mesh,
                 macro: Optional[Tuple[int, int]] = None,
                 weight: Optional[jnp.ndarray] = None):
        D = mesh.shape["domain"]
        KY, KX = S.lattice
        nd = S.nd
        if KX % D:
            raise ValueError(f"KX={KX} not divisible by {D} devices")
        if macro is not None and macro[0] % D:
            raise ValueError(f"macro mx={macro[0]} not divisible by {D}")
        self.mesh = mesh
        self.plan = S.plan
        self.macro = macro
        self.nd = nd
        self.lattice = (KY, KX)
        self.planes = jax.device_put(
            S.planes, NamedSharding(mesh, P(None, None, None, None, None, "domain")))
        self.B = jax.device_put(
            B, NamedSharding(mesh, P(None, None, None, "domain")))
        # weighted deflation space Z_w = diag(w) Z (see la/stencil.py:
        # on a diagonally-scaled system pass w = 1/s to restore the
        # physical near-kernel; measured kappa(M A) 3884 -> 336 on SPE10)
        self.weight = (None if weight is None else jax.device_put(
            weight, NamedSharding(mesh, P(None, None, None, "domain"))))

    # -- device-local kernels (inside shard_map) ----------------------------
    def _neighbor_fields_local(self, X, axis="domain"):
        """[4][nd, 8, KY, Wd] neighbour fields of the local slab X
        (self + 3 slots), halos via ring ppermute."""
        D = self.mesh.shape[axis]
        plan = self.plan
        if D > 1:
            left = jax.lax.ppermute(  # my left halo = left neighbour's right edge
                X[..., -_HALO:], axis,
                [(i, (i + 1) % D) for i in range(D)])
            right = jax.lax.ppermute(
                X[..., :_HALO], axis,
                [(i, (i - 1) % D) for i in range(D)])
            X_ext = jnp.concatenate([left, X, right], axis=-1)
        else:
            X_ext = jnp.concatenate([X[..., -_HALO:], X, X[..., :_HALO]], axis=-1)
        Wd = X.shape[-1]
        fields = [X]
        for s in range(3):
            per_k = []
            for k in range(8):
                ks, dy, dx = plan[k][s]
                # x-shift via static slice of the extended slab, y via roll
                sl = jax.lax.slice_in_dim(X_ext[:, ks], _HALO + dx,
                                          _HALO + dx + Wd, axis=-1)
                per_k.append(jnp.roll(sl, shift=-dy, axis=1))
            fields.append(jnp.stack(per_k, axis=1))
        return fields

    def _matvec_local(self, W, X, axis="domain"):
        """X [nd, 8, KY, Wd] local slab -> A X local; ring-ppermute halos."""
        nd = self.nd
        fields = self._neighbor_fields_local(X, axis)
        acc = []
        for i in range(nd):
            t = None
            for s in range(4):
                for j in range(nd):
                    c = W[s, i, j] * fields[s][j]
                    t = c if t is None else t + c
            acc.append(t)
        return jnp.stack(acc, axis=0)

    def _jacobi_local(self, W):
        Dg = W[0]  # [nd, nd, 8, KY, Wd]
        if self.nd == 3:
            Dm = jnp.moveaxis(Dg, (0, 1), (-2, -1))
            Dinv = jnp.moveaxis(inv3x3(Dm), (-2, -1), (0, 1))
        else:
            Dm = jnp.moveaxis(Dg, (0, 1), (-2, -1))
            Dinv = jnp.moveaxis(jnp.linalg.inv(Dm), (-2, -1), (0, 1))

        def apply(R):
            return jnp.einsum("ij...,j...->i...", Dinv, R)

        return apply

    def _deflation_local(self, W, matvec, smoother, axis="domain",
                        newton_schulz: int = 2, wloc=None):
        """Balanced two-level deflation with slab-local aggregation.  The
        coarse operator is psum-assembled (it needs neighbour-slab
        couplings) and inverted redundantly per device."""
        KY, KX = self.lattice
        D = self.mesh.shape[axis]
        mx, my = self.macro
        mxl = mx // D           # local macro columns
        fy, fx = KY // my, (KX // D) // mxl
        n_agg = mx * my
        nd = self.nd

        def aggsum_local(R):
            # R [..., 8, KY, Wd] -> [mxl*my] local aggregates
            lead = R.shape[:-3]
            rc = R.reshape(lead + (8, my, fy, mxl, fx))
            axes = tuple(range(len(lead))) + (len(lead),) + (len(lead) + 2,
                                                             len(lead) + 4)
            return rc.sum(axis=axes).T.reshape(-1)  # [my,mxl]->[mxl,my] flat

        def broadcast_local(yc_local):
            g = yc_local.reshape(mxl, my).T
            g = jnp.broadcast_to(g[None, :, None, :, None],
                                 (8, my, fy, mxl, fx))
            return g.reshape(8, my * fy, mxl * fx)

        def to_global(yc_local):
            # [mxl*my] per device -> full [n_agg] on every device (x-major
            # aggregate ids: device d owns ids [d*mxl*my, (d+1)*mxl*my))
            return jax.lax.all_gather(yc_local, axis, tiled=True)

        def local_part(yc):
            idx = jax.lax.axis_index(axis)
            return jax.lax.dynamic_slice_in_dim(yc, idx * mxl * my, mxl * my)

        # coarse operator: E[a, b] = sum over cells of plane sums paired
        # with rolled aggregate ids — assemble from the GLOBAL aggregate
        # field pairing, locally, then psum (couplings across slab
        # boundaries land on the owning row's device; psum merges).
        # With a weight, the pairing sums become P_w = w_i W w_j(nbr)
        # (E = Z_w^T A Z_w) — the neighbour weights ride one halo
        # ppermute, exactly like the matvec.
        if wloc is None:
            P_sums = W.sum(axis=(1, 2))  # [4, 8, KY, Wd]
        else:
            wn = self._neighbor_fields_local(wloc, axis)
            P_sums = jnp.stack([
                (wloc[:, None] * W[s] * wn[s][None, :]).sum(axis=(0, 1))
                for s in range(4)
            ])
        iy = np.arange(KY)[:, None]
        Wd = KX // D
        ixl = np.arange(Wd)[None, :]
        idx = jax.lax.axis_index(axis)
        # global x position of local columns
        ixg = ixl + idx * Wd
        row_local = (ixl // fx) * my + iy // fy  # [KY, Wd] LOCAL agg id
        row_global = row_local + idx * mxl * my
        E = jnp.zeros((n_agg, n_agg), dtype=W.dtype)
        # self slot
        flat_self = (row_global * n_agg + row_global).reshape(-1)
        E = E.reshape(-1).at[flat_self].add(
            P_sums[0].sum(axis=0).reshape(-1)).reshape(n_agg, n_agg)
        for s in range(3):
            for k in range(8):
                ks, dy, dx = self.plan[k][s]
                col_global = (((ixg + dx) % KX) // fx) * my + ((iy + dy) % KY) // fy
                # wrapped entries carry zero blocks; clamp validity anyway
                valid = ((ixg + dx >= 0) & (ixg + dx < KX)
                         & (iy + dy >= 0) & (iy + dy < KY))
                flat = (row_global * n_agg + col_global).reshape(-1)
                vals = (P_sums[s + 1, k] * valid).reshape(-1)
                E = E.reshape(-1).at[flat].add(vals).reshape(n_agg, n_agg)
        E = jax.lax.psum(E, axis)
        coarse = _coarse_inverse_bcr(E, mx, my, newton_schulz)

        def wsum(R):
            return aggsum_local(R if wloc is None else R * wloc)

        def wbcast(yc_local, shape):
            g = jnp.broadcast_to(broadcast_local(yc_local)[None], shape)
            return g if wloc is None else g * wloc

        def apply_balanced(R):
            rc = to_global(wsum(R))
            yc = coarse(rc)
            Qr = wbcast(local_part(yc), R.shape)
            s_ = smoother(R - matvec(Qr))
            zc = to_global(wsum(matvec(s_)))
            z = coarse(zc)
            return Qr + s_ - wbcast(local_part(z), R.shape)

        return apply_balanced

    # -- solves -------------------------------------------------------------
    def lower_solve(self, **kw):
        """AOT-lower (no execute) the sharded solve program — used by the
        driver dryrun to validate sharding specs / padding / divisibility at
        LARGE shapes without paying the execution (VERDICT r4 item 8)."""
        run, args = self._solve_fn(**kw)
        return run.lower(*args)

    def solve(self, tol: float = 1e-6, inner_iters: int = 150,
              inner_rtol: float = 1e-5, outer_max: int = 6,
              unroll: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """f32 deflated PCG inside f64 refinement, fully sharded.  Returns
        (X [nd,8,KY,KX] sharded, true relative residual)."""
        run, args = self._solve_fn(tol=tol, inner_iters=inner_iters,
                                   inner_rtol=inner_rtol, outer_max=outer_max,
                                   unroll=unroll)
        X, res = run(*args)
        return X, res[0]

    def _solve_fn(self, tol: float = 1e-6, inner_iters: int = 150,
                  inner_rtol: float = 1e-5, outer_max: int = 6,
                  unroll: int = 4):
        """(jitted run, args) for :meth:`solve` / :meth:`lower_solve`."""
        mesh = self.mesh
        axis = "domain"
        tol = float(tol)

        have_w = self.weight is not None

        @partial(jax.jit, static_argnums=())
        def run(planes, B, *wargs):
            def body(W, Bl, *wl):
                def dot(a, b):
                    return jax.lax.psum(jnp.vdot(a, b), axis)

                matvec = lambda X: self._matvec_local(W, X, axis)
                smoother = self._jacobi_local(W)
                M = (self._deflation_local(W, matvec, smoother, axis,
                                           wloc=wl[0] if wl else None)
                     if self.macro is not None else smoother)
                W64 = W.astype(jnp.float64)
                matvec64 = lambda X: self._matvec_local(W64, X, axis)
                B64 = Bl.astype(jnp.float64)
                bnorm = jnp.sqrt(dot(B64, B64))
                target = tol * jnp.maximum(bnorm, 1e-300)

                def pcg(R32):
                    X = jnp.zeros_like(R32)
                    Z = M(R32)
                    Pv = Z
                    rz = dot(R32, Z)
                    R = R32
                    stop2 = jnp.asarray(inner_rtol ** 2, dtype=R32.dtype)

                    def cond(st):
                        X, R, Z, Pv, rz, k = st
                        return (dot(R, R) > stop2) & (k < inner_iters)

                    def one(st):
                        X, R, Z, Pv, rz, k = st
                        AP = matvec(Pv)
                        pap = dot(Pv, AP)
                        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
                        X = X + alpha * Pv
                        R = R - alpha * AP
                        Z = M(R)
                        rz_new = dot(R, Z)
                        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
                        Pv = Z + beta * Pv
                        return X, R, Z, Pv, rz_new, k + 1

                    def step(st):
                        for _ in range(max(1, int(unroll))):
                            st = one(st)
                        return st

                    out = jax.lax.while_loop(cond, step,
                                             (X, R, Z, Pv, rz, jnp.int32(0)))
                    return out[0]

                def ocond(st):
                    X, rnorm, k = st
                    return (rnorm > target) & (k < outer_max)

                def obody(st):
                    X, rnorm, k = st
                    R64 = B64 - matvec64(X)
                    scale = jnp.sqrt(dot(R64, R64))
                    dX = pcg((R64 / scale).astype(jnp.float32))
                    X = X + dX.astype(jnp.float64) * scale
                    R64 = B64 - matvec64(X)
                    return X, jnp.sqrt(dot(R64, R64)), k + 1

                X0 = jnp.zeros_like(B64)
                X, rnorm, k = jax.lax.while_loop(ocond, obody,
                                                 (X0, bnorm, jnp.int32(0)))
                return X, (rnorm / jnp.maximum(bnorm, 1e-300))[None]

            vec_spec = P(None, None, None, "domain")
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(None, None, None, None, None, "domain"),
                          vec_spec) + ((vec_spec,) if wargs else ()),
                out_specs=(vec_spec, P("domain")),
            )(planes, B, *wargs)

        return run, (self.planes, self.B) + (
            (self.weight,) if have_w else ())
