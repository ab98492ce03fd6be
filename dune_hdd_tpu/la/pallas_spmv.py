"""Pallas TPU kernel for the bandwidth-ordered structured block SpMV.

The StructuredBlockEll matvec (la/block_ell.py) is 24 static shifts + a
36-plane FMA; XLA executes the shift/concat path ~20x below stream
bandwidth on this hardware (layout changes dominate).  This kernel keeps
the full solution vector VMEM-resident in an SoA [nd, R, 128] layout and
realizes every neighbour access as a STATIC circular roll (sublane roll +
lane roll + carry select — Mosaic handles static rolls, unlike the dynamic
lane-dim slices that crash its remote compiler), streaming only the 36
block planes from HBM.

Correctness relies on the StructuredBlockEll invariant that wrap-around and
NVB-exception slots carry ZERO blocks: rolling over the 128-padded cell
count instead of nc only mis-reads values that are multiplied by zero.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_structured_pallas_matvec"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_structured_pallas_matvec(A_st, interpret: bool = False):
    """(matvec_flat, blocks_planes): matvec_flat(blocks_planes, x_flat) with
    x in the standard [nc*nd] cell-major layout; blocks_planes is the
    [4, nd, nd, R, 128] SoA repack of A_st.blocks (pass it explicitly so it
    stays a runtime argument, not a baked-in jit constant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc, nd = A_st.num_cells, A_st.nd
    assert nc % 8 == 0
    L = nc // 8
    ncp = _round_up(nc, 8 * 128)  # rows multiple of 8 for the f32 tile
    R = ncp // 128

    # static shifts per (subclass k, geo slot s): field value at cell c is
    # x[(c + o) mod nc] (cf. StructuredBlockEll.neighbor_fields)
    shifts = [[int(A_st.offsets[k][s] % nc) for s in range(3)] for k in range(8)]

    # blocks -> [4, nd, nd, R, 128] planes, zero-padded
    blocks = np.zeros((4, nd, nd, ncp), dtype=np.float32)
    bnp = np.asarray(A_st.blocks, dtype=np.float32)  # [nc, 4, nd, nd]
    blocks[:, :, :, :nc] = np.moveaxis(bnp, 0, -1)
    blocks_planes = jnp.asarray(blocks.reshape(4, nd, nd, R, 128))


    def _flat_roll(x2d, o):
        """x2d [R, 128] viewed as flat row-major [R*128]; returns
        y[c] = x[(c + o) mod (R*128)] via static sublane/lane rolls."""
        o = int(o) % ncp
        q, r = divmod(o, 128)
        if r == 0:
            return pltpu.roll(x2d, shift=(-q) % R, axis=0)
        a = pltpu.roll(x2d, shift=(-q) % R, axis=0)      # rows shifted by q
        b = pltpu.roll(x2d, shift=(-(q + 1)) % R, axis=0)
        al = pltpu.roll(a, shift=(-r) % 128, axis=1)
        bl = pltpu.roll(b, shift=(-r) % 128, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        # lanes < 128 - r take from row q (no lane wrap), the rest from q+1
        return jnp.where(lane < 128 - r, al, bl)

    def kernel(x_ref, blocks_ref, out_ref):
        # x_ref [nd, R, 128]; blocks_ref [4, nd, nd, R, 128]; out [nd, R, 128]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        flat = row * 128 + lane
        x = [x_ref[j] for j in range(nd)]
        acc = [jnp.zeros((R, 128), dtype=jnp.float32) for _ in range(nd)]
        # slot 0: self
        for i in range(nd):
            for j in range(nd):
                acc[i] = acc[i] + blocks_ref[0, i, j] * x[j]
        # slots 1..3: per-subclass static rolls, block planes pre-masked by
        # multiplying with the segment mask (blocks are only valid for their
        # own subclass's shift)
        for s in range(3):
            for k in range(8):
                o = shifts[k][s]
                fields = [_flat_roll(x[j], o) for j in range(nd)]
                m = ((flat >= k * L) & (flat < (k + 1) * L)).astype(jnp.float32)
                for i in range(nd):
                    contrib = jnp.zeros((R, 128), dtype=jnp.float32)
                    for j in range(nd):
                        contrib = contrib + blocks_ref[s + 1, i, j] * fields[j]
                    acc[i] = acc[i] + m * contrib
        for i in range(nd):
            out_ref[i] = acc[i]

    spmv = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nd, R, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def matvec_flat(planes, x_flat):
        xc = x_flat.reshape(nc, nd).astype(jnp.float32)
        x_soa = jnp.zeros((nd, ncp), dtype=jnp.float32)
        x_soa = x_soa.at[:, :nc].set(xc.T).reshape(nd, R, 128)
        y = spmv(x_soa, planes)
        return y.reshape(nd, ncp)[:, :nc].T.reshape(-1).astype(x_flat.dtype)

    return matvec_flat, blocks_planes
