"""Per-device (sharded) assembly of the BlockSWIPDG operator values.

The reference assembles per-subdomain local systems in two sweeps — a
pattern sweep and a value sweep — then copies local->global
(block-swipdg.hh:262-551).  The TPU image keeps the *pattern* sweep on the
host (static index plans, exactly like the reference's sparsity setup) and
executes the *value* sweep per device inside ``jax.shard_map`` over the
"domain" mesh axis: each device evaluates the volume + face kernels for the
cells/faces of its own subdomains (faces on subdomain interfaces are
evaluated on both owning devices — redundant compute instead of
communication) and assembles its row block of every affine component's ELL
value array in place.  No host round-trip: the resulting values live
sharded on the mesh and feed ``HaloShardedSystem`` directly.

Bitwise equality with the host path: each device's raw entry list is the
restriction of the global raw list (volume entries in ascending cell order,
then interior-face, then Dirichlet-face entries) to its own rows, in the
same relative order; the stable sort + segment-sum then adds exactly the
same addends in the same order per matrix slot.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.assembly import cell_quadrature, cell_shape_gradients, elliptic_cells_core
from ..ops.swipdg import (
    _side_quantities_arrays,
    _side_shapes,
    _face_geometry,
    boundary_blocks_core,
    interior_blocks_core,
)

__all__ = ["sharded_operator_values", "ShardedAssemblyPlan", "build_assembly_plan"]


class ShardedAssemblyPlan(NamedTuple):
    """Static (host-built) per-device value-sweep plan, stacked over D."""

    cells: np.ndarray       # [D, Lc] global cell ids (padded by repeating)
    fi: np.ndarray          # [D, Lfi] global interior face ids (padded)
    fb: np.ndarray          # [D, Lfb] global dirichlet face ids (padded)
    perm: np.ndarray        # [D, E] stable sort of the device's raw entries
    seg_ids: np.ndarray     # [D, E] slot id per sorted raw entry (trash = nnz_pad)
    slot_pos: np.ndarray    # [D, nnz_pad] position into [L*K] (trash -> L*K)
    L: int                  # rows per device (padded)
    K: int                  # ELL width
    nnz_pad: int


def build_assembly_plan(space, pattern, row_blocks: Sequence[np.ndarray],
                        interior: np.ndarray, dirichlet: np.ndarray,
                        ) -> ShardedAssemblyPlan:
    grid = space.grid
    nd = space.shape_count
    D = len(row_blocks)
    n = space.num_dofs
    K = pattern.ell_width
    L = max(len(b) for b in row_blocks)
    owner = np.full(n, -1, dtype=np.int64)
    local_row = np.zeros(n, dtype=np.int64)
    for d, rows in enumerate(row_blocks):
        owner[rows] = d
        local_row[rows] = np.arange(len(rows))

    # ELL slot position of each (row, col) pair (host lookup table)
    ell_pos_of = {}
    for s in range(pattern.nnz):
        r, c = int(pattern.slot_rows[s]), int(pattern.slot_cols[s])
        ell_pos_of[(r, c)] = int(pattern.slot_ell_pos[s])  # flat into [N*K]
    row_base = {r: r * K for r in range(n)}  # flat = r*K + k

    dofs = space.cell_dofs
    cells_d, fi_d, fb_d = [], [], []
    fi_all = np.asarray(interior)
    fb_all = np.asarray(dirichlet)
    cin_all, cout_all = grid.face_cells[fi_all, 0], grid.face_cells[fi_all, 1]
    cb_all = grid.face_cells[fb_all, 0]
    cell_owner = owner[dofs[:, 0]]  # DG: all dofs of a cell share a device
    for d in range(D):
        cset = np.nonzero(cell_owner == d)[0]  # ascending
        cells_d.append(cset)
        m = (cell_owner[cin_all] == d) | (cell_owner[cout_all] == d)
        fi_d.append(fi_all[m])
        fb_d.append(fb_all[cell_owner[cb_all] == d])
    Lc = max(len(c) for c in cells_d)
    Lfi = max(len(f) for f in fi_d)
    Lfb = max(max(len(f) for f in fb_d), 1)

    def pad(a, size):
        if len(a) == 0:
            return np.zeros(size, dtype=np.int64)
        return np.concatenate([a, np.repeat(a[:1], size - len(a))])

    cells_p = np.stack([pad(c, Lc) for c in cells_d])
    fi_p = np.stack([pad(f, Lfi) for f in fi_d])
    fb_p = np.stack([pad(f, Lfb) for f in fb_d])

    # raw entry (local_row or -1, col) per device, canonical order
    E = Lc * nd * nd + Lfi * 4 * nd * nd + Lfb * nd * nd
    perm_l, seg_l, pos_l = [], [], []
    nnz_max = 0
    entries_per_dev = []
    for d in range(D):
        rows_parts, cols_parts, real_parts = [], [], []
        # volume entries (match vol_local.reshape(-1): [c, i, j])
        cd = cells_p[d]
        rr = np.repeat(dofs[cd], nd, axis=1).reshape(-1)
        cc = np.tile(dofs[cd], (1, nd)).reshape(-1)
        real = np.repeat(np.arange(Lc) < len(cells_d[d]), nd * nd)
        rows_parts.append(rr); cols_parts.append(cc); real_parts.append(real)
        # interior entries (match int_blocks [F, s, t, i, j].reshape(-1))
        fd = fi_p[d]
        sd = np.stack([dofs[grid.face_cells[fd, 0]],
                       dofs[grid.face_cells[fd, 1]]], axis=1)  # [F, 2, nd]
        shape = (len(fd), 2, 2, nd, nd)
        rr = np.broadcast_to(sd[:, :, None, :, None], shape).reshape(-1)
        cc = np.broadcast_to(sd[:, None, :, None, :], shape).reshape(-1)
        real = np.repeat(np.arange(Lfi) < len(fi_d[d]), 4 * nd * nd)
        rows_parts.append(rr); cols_parts.append(cc); real_parts.append(real)
        # dirichlet entries
        bd = fb_p[d]
        din = dofs[grid.face_cells[bd, 0]]
        rr = np.repeat(din, nd, axis=1).reshape(-1)
        cc = np.tile(din, (1, nd)).reshape(-1)
        real = np.repeat(np.arange(Lfb) < len(fb_d[d]), nd * nd)
        rows_parts.append(rr); cols_parts.append(cc); real_parts.append(real)

        rows = np.concatenate(rows_parts)
        cols = np.concatenate(cols_parts)
        realm = np.concatenate(real_parts)
        owned = realm & (owner[rows] == d)
        key = np.where(owned, local_row[rows] * n + cols, np.int64(L) * n + n)
        perm = np.argsort(key, kind="stable")
        sk = key[perm]
        new = np.ones(E, dtype=bool)
        new[1:] = sk[1:] != sk[:-1]
        # trash entries all share the sentinel key -> their first occurrence
        # still opens a segment; detect it
        seg = np.cumsum(new) - 1
        owned_sorted = owned[perm]
        nnz_d = int(seg[owned_sorted].max()) + 1 if owned_sorted.any() else 0
        # route every non-owned entry to the trash segment
        seg = np.where(owned_sorted, seg, -1)
        entries_per_dev.append((perm, seg, nnz_d, sk, owned_sorted))
        nnz_max = max(nnz_max, nnz_d)

    for d in range(D):
        perm, seg, nnz_d, sk, owned_sorted = entries_per_dev[d]
        seg = np.where(seg >= 0, seg, nnz_max)  # trash segment = nnz_pad
        # slot -> ELL flat position
        pos = np.full(nnz_max, L * K, dtype=np.int64)
        # recover (row, col) of each slot from the sorted keys
        sl_keys = sk[owned_sorted]
        uniq_keys = np.unique(sl_keys)
        assert len(uniq_keys) == nnz_d
        rloc = uniq_keys // n
        cols = uniq_keys % n
        grow = row_blocks[d][rloc]  # local -> global row
        for s in range(nnz_d):
            flat_global = ell_pos_of[(int(grow[s]), int(cols[s]))]
            k = flat_global - int(grow[s]) * K
            pos[s] = rloc[s] * K + k
        perm_l.append(perm)
        seg_l.append(seg)
        pos_l.append(pos)

    return ShardedAssemblyPlan(
        cells=cells_p, fi=fi_p, fb=fb_p,
        perm=np.stack(perm_l), seg_ids=np.stack(seg_l),
        slot_pos=np.stack(pos_l), L=L, K=K, nnz_pad=nnz_max,
    )


def _stacked_geometry(space, plan: ShardedAssemblyPlan, qorder_vol: int,
                      qorder_face: int):
    """Per-device geometry bundles, stacked over D (host, once)."""
    grid = space.grid
    qp, qw = cell_quadrature(grid, qorder_vol)
    grads = cell_shape_gradients(space, qorder_vol)
    cells = jnp.asarray(plan.cells)
    vol = (qp[cells], qw[cells], grads[cells])

    def face_bundle(face_ids, both_sides):
        fgeo = []
        for d in range(face_ids.shape[0]):
            ids = face_ids[d]
            qpf, qwf, nf, hf = _face_geometry(grid, ids, qorder_face)
            cin = grid.face_cells[ids, 0]
            vals_m, grads_m, cent_m = _side_shapes(space, cin, qpf)
            entry = [qpf, qwf, nf, hf, vals_m, grads_m, cent_m]
            if both_sides:
                cout = grid.face_cells[ids, 1]
                vals_p, grads_p, cent_p = _side_shapes(space, cout, qpf)
                entry += [vals_p, grads_p, cent_p]
            fgeo.append(entry)
        return [jnp.stack([e[i] for e in fgeo]) for i in range(len(fgeo[0]))]

    geom_i = face_bundle(plan.fi, True)
    geom_b = face_bundle(plan.fb, False)
    return vol, geom_i, geom_b


def sharded_operator_values(discretization, mesh,
                            row_blocks: Sequence[np.ndarray],
                            dtype=jnp.float32) -> jnp.ndarray:
    """[Q, D, L, K] ELL value array of every operator component, assembled
    per device inside shard_map (rows sharded over the "domain" axis).

    ``discretization``: the (global) SWIPDGDiscretization whose
    ``_operator_kernels`` record the per-component kernel configs.  Returns
    the values in ``with_expanded_affine_part`` component order — exactly
    what HaloShardedSystem stores as ``ell_vals``.
    """
    space = discretization.space
    grid = space.grid
    nd = space.shape_count
    interior = discretization._interior_faces
    dirichlet = discretization._dirichlet_faces
    from ..ops.swipdg import swipdg_pattern

    pattern = swipdg_pattern(space, interior, dirichlet)
    plan = build_assembly_plan(space, pattern, row_blocks, interior, dirichlet)
    kernels = discretization._operator_kernels

    qorders_vol = set()
    qorders_face = set()
    for ker in kernels:
        lam_fn = ker["lam_fn"]
        wlam = ker["face_kw"].get("weight_lam_fn") or lam_fn
        qorders_face.add(2 * space.order + max(lam_fn.order, wlam.order) + 1)
        if ker["volume"]:
            kap_fn = ker["kap_fn"]
            qorders_vol.add(lam_fn.order + kap_fn.order
                            + 2 * (space.order - 1) + 2)
    if len(qorders_face) != 1:
        raise NotImplementedError(
            f"components with mixed face quadrature orders: {qorders_face}")
    if len(qorders_vol) > 1:
        # the stacked geometry is shared across components; a single volume
        # qorder keeps the sharded path bitwise-equal to the host path, so
        # refuse (rather than silently assemble with the first kernel's
        # order) when the components disagree
        raise NotImplementedError(
            f"components with mixed volume quadrature orders: {qorders_vol}")
    qorder_face = qorders_face.pop()
    qorder_vol = qorders_vol.pop() if qorders_vol else 2
    vol_geo, geom_i, geom_b = _stacked_geometry(space, plan, qorder_vol,
                                                qorder_face)

    perm = jnp.asarray(plan.perm)
    seg_ids = jnp.asarray(plan.seg_ids)
    slot_pos = jnp.asarray(plan.slot_pos)
    L, K, nnz_pad = plan.L, plan.K, plan.nnz_pad
    n_dom = mesh.shape["domain"]
    assert len(row_blocks) == n_dom

    def body(qp_c, qw_c, grads_c, gi0, gi1, gi2, gi3, gi4, gi5, gi6, gi7,
             gi8, gi9, gb0, gb1, gb2, gb3, gb4, gb5, gb6,
             perm_l, seg_l, pos_l):
        (qp_c, qw_c, grads_c) = (qp_c[0], qw_c[0], grads_c[0])
        qpf, qwf, nf, hf = gi0[0], gi1[0], gi2[0], gi3[0]
        vals_m, grads_m, cent_m = gi4[0], gi5[0], gi6[0]
        vals_p, grads_p, cent_p = gi7[0], gi8[0], gi9[0]
        qpb, qwb, nb, hb = gb0[0], gb1[0], gb2[0], gb3[0]
        vals_b, grads_b, cent_b = gb4[0], gb5[0], gb6[0]
        perm_d, seg_d, pos_d = perm_l[0], seg_l[0], pos_l[0]

        outs = []
        for ker in kernels:
            lam_fn, kap_fn = ker["lam_fn"], ker["kap_fn"]
            kw = dict(ker["face_kw"])
            wlam = kw.pop("weight_lam_fn", None) or lam_fn
            wkap = kw.pop("weight_kap_fn", None) or kap_fn
            sigma_i = kw.pop("sigma_i")
            sigma_b = kw.pop("sigma_b")
            beta = kw.pop("beta")
            flags = dict(penalty_only=kw.pop("penalty_only", False),
                         flux_only=kw.pop("flux_only", False),
                         flux_scale=kw.pop("flux_scale", 1.0))
            assert not kw, kw
            if ker["volume"]:
                vol = elliptic_cells_core(qp_c, qw_c, grads_c, lam_fn, kap_fn)
            else:
                vol = jnp.zeros((qp_c.shape[0], nd, nd))
            side_m = _side_quantities_arrays(vals_m, grads_m, cent_m, qpf, nf,
                                             lam_fn, kap_fn, wlam, wkap)
            side_p = _side_quantities_arrays(vals_p, grads_p, cent_p, qpf, nf,
                                             lam_fn, kap_fn, wlam, wkap)
            ib = interior_blocks_core(qwf, hf, side_m, side_p, sigma_i, beta,
                                      nd, **flags)
            side_b = _side_quantities_arrays(vals_b, grads_b, cent_b, qpb, nb,
                                             lam_fn, kap_fn, wlam, wkap)
            bb = boundary_blocks_core(qwb, hb, side_b, sigma_b, beta, nd,
                                      **flags)
            raw = jnp.concatenate(
                [vol.reshape(-1), ib.reshape(-1), bb.reshape(-1)])
            slots = jax.ops.segment_sum(raw[perm_d], seg_d,
                                        num_segments=nnz_pad + 1)
            flat = jnp.zeros(L * K + 1, dtype=raw.dtype)
            flat = flat.at[pos_d].set(slots[:nnz_pad])
            outs.append(flat[: L * K].reshape(L, K).astype(dtype))
        return jnp.stack(outs)[:, None]  # [Q, 1, L, K]

    args = [vol_geo[0], vol_geo[1], vol_geo[2], *geom_i, *geom_b,
            perm, seg_ids, slot_pos]
    in_specs = tuple(P("domain", *([None] * (a.ndim - 1))) for a in args)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs,
        out_specs=P(None, "domain", None, None)))
    return fn(*args)
