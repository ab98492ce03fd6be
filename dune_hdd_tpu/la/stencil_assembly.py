"""Direct-to-planes SWIPDG assembly for structured NVB grids.

The general assembly path (ops/assembly + ops/swipdg + la/block_ell) computes
per-face blocks with tiny nd x nd minor axes and scatters them into the
block-ELL layout — on TPU the scatter and the lane-padded einsums dominate
the whole benchmark.  On a structured grid (grid/structured_order.py) every
cell is congruent within its subclass and every face is congruent within its
(subclass, geo-slot) family, so the SWIPDG integrals factor into

    per-family CONSTANT nd x nd tensors  x  scalar lattice fields,

and the assembly writes straight into the StencilBlockEll planes
W[slot, i, j, subclass, KY, KX]: no gather, no scatter, no permute — just
coefficient evaluations at lattice-shaped point arrays and fused
elementwise multiply-adds.  Faces are processed once per side (each side
owns its own test-function rows), which writes every plane entry exactly
once.

Exactness: uses the same quadrature rules and the same centroid-shifted
side evaluation as the general path (ops/swipdg._side_eval), so the
assembled operator matches the general path to floating-point
reassociation.  The diffusion TENSOR must be a cell-constant scalar field
(kappa = field(x) * I with field piecewise constant per cell — e.g. the
SPE10 permeability); the scalar diffusion FACTOR may vary arbitrarily
within cells (evaluated at quadrature points).

Cites: reference assembly loops swipdg.hh:222-332 (the math), SURVEY §2
preamble (hot kernels as XLA/Pallas-class code).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.structured import Grid
from ..ops.quadrature import edge_rule, tri_rule
from ..ops.swipdg import boundary_sigma, default_beta, inner_sigma
from .stencil import StencilBlockEll, stencil_plan

__all__ = ["StructuredAssemblyPlan", "build_structured_assembly",
           "assemble_structured_spe10", "precompute_coefficient"]

_SIDE_EPS32 = 1e-3  # cf. ops/swipdg._side_eval (float32 branch)


class _FaceFamily(NamedTuple):
    k_src: int          # subclass of the slot-s neighbour
    dy: int
    dx: int
    qp: np.ndarray      # [kq, KY, KX, 2] face quadrature points
    qp_m: np.ndarray    # [kq, KY, KX, 2] shifted toward own centroid
    qp_p: np.ndarray    # [kq, KY, KX, 2] shifted toward neighbour centroid
    qw: np.ndarray      # [kq] weights incl. face length
    h: float            # face length
    vals_m: np.ndarray  # [kq, nd] own basis at qp
    vals_p: np.ndarray  # [kq, nd] neighbour basis at qp
    nflux_m: np.ndarray  # [nd] (grad phi_m . n_out)
    nflux_p: np.ndarray  # [nd] (grad phi_p . n_out)
    interior: np.ndarray  # [KY, KX] bool: face has a neighbour
    dirichlet: np.ndarray  # [KY, KX] bool: face is a Dirichlet boundary face


class StructuredAssemblyPlan(NamedTuple):
    families: Tuple[Tuple[_FaceFamily, ...], ...]  # [8][3]
    vol_qp: np.ndarray    # [kq_v, 8, KY, KX, 2]
    vol_G: np.ndarray     # [8, kq_v, nd, nd] qw x (grad_i . grad_j)
    vol_wvals: np.ndarray  # [8, kq_v, nd] qw x basis values
    dof_perm: np.ndarray  # [8, KY, KX, nd] storage dof index of geometric
    # role r (cells within a subclass are geometric translates but their
    # VERTEX STORAGE ORDER varies with refinement history; the planes are
    # assembled in the representative's role enumeration and this map
    # absorbs the per-cell permutation into the SoA<->flat index maps)
    plan: tuple           # stencil plan (8 x 3 (k_src, dy, dx))
    lattice: Tuple[int, int]
    nd: int
    sigma_i: float
    sigma_b: float
    beta: float


def _geo_slots(grid: Grid, order) -> np.ndarray:
    """geo[new_cell, s] = face id of geo slot s (via order.slot_source)."""
    inv = np.asarray(order.inv)
    src = np.asarray(order.slot_source, dtype=np.int64)  # [NC(new), 3]
    return grid.cell_faces[inv[:, None], src]


def build_structured_assembly(grid: Grid, order, binfo,
                              space_order: int = 1,
                              qorder_vol: int = 2,
                              qorder_face: int = 3,
                              side_eps: float = _SIDE_EPS32) -> StructuredAssemblyPlan:
    """Host-side (one-off) geometry plan.  ``qorder_*`` and ``side_eps``
    must match the general path's choices for comparable operators
    (qorder_vol = lam.order + kap.order + 2(p-1) + 2, qorder_face =
    2p + coefficient order + 1, side_eps = 1e-3 for f32 / 1e-7 for f64 —
    cf. ops/assembly.elliptic_cell_matrices, ops/swipdg)."""
    import jax as _jax

    from ..ops.spaces import dg_space

    # pin the (tiny, representative-cell) shape evaluations below to the
    # host CPU backend: on the remote-TPU platform each op-by-op jnp call
    # pays a tunnel RTT + compile — ~100 dispatches that turn a ~1-min
    # numpy setup into many minutes of idle waiting at 12M DoF (same
    # rationale as precompute_coefficient)
    try:
        _ctx = _jax.default_device(_jax.local_devices(backend="cpu")[0])
    except RuntimeError:  # no cpu backend registered
        from contextlib import nullcontext

        _ctx = nullcontext()
    with _ctx:
        return _build_structured_assembly_impl(
            grid, order, binfo, space_order, qorder_vol, qorder_face,
            side_eps)


def _build_structured_assembly_impl(grid: Grid, order, binfo,
                                    space_order, qorder_vol, qorder_face,
                                    side_eps) -> StructuredAssemblyPlan:
    from ..ops.spaces import dg_space

    space = dg_space(grid, space_order)
    nd = space.shape_count
    KY, KX = order.lattice
    L = KY * KX
    plan = stencil_plan(order)
    inv = np.asarray(order.inv)
    faces_of = _geo_slots(grid, order)  # [NC(new), 3]
    interior_f = np.asarray(grid.interior_faces)
    dirichlet_f = np.zeros(grid.num_faces, dtype=bool)
    dirichlet_f[np.nonzero(binfo.dirichlet_faces)[0]] = True

    # per-cell dof permutation: geometric role r (= the representative's
    # storage order) -> this cell's storage index, by matching vertex
    # offsets relative to the cell anchor (v0 is NOT a translation-invariant
    # anchor, so use the bounding-box corner)
    dof_perm = np.empty((8, KY, KX, nd), dtype=np.int64)
    verts_all0 = grid.cell_vertices
    for k in range(8):
        cells_old_k = inv[k * L: (k + 1) * L]
        v = verts_all0[cells_old_k]  # [L, nvc, 2]
        anchor = v.min(axis=1)  # [L, 2] bbox corner (translation-invariant)
        rel = v - anchor[:, None]  # [L, nvc, 2]
        rep_rel = rel[0]  # role r = storage order of the representative
        # perm[c, r] = argmin_j |rel[c, j] - rep_rel[r]|
        dist = np.linalg.norm(rel[:, None, :, :] - rep_rel[None, :, None, :],
                              axis=-1)  # [L, r, j]
        perm = dist.argmin(axis=-1)
        assert (np.take_along_axis(dist, perm[..., None], -1) < 1e-9).all(), k
        dof_perm[k] = perm.reshape(KY, KX, nd)

    # volume: per-subclass constant gradients + translated quadrature
    ref, w = tri_rule(qorder_vol)
    kq_v = len(w)
    vol_qp = np.empty((kq_v, 8, KY, KX, 2))
    vol_G = np.empty((8, kq_v, nd, nd))
    vol_wvals = np.empty((8, kq_v, nd))  # qw x basis values (for the rhs)
    verts_all = grid.cell_vertices
    for k in range(8):
        rep_new = k * L
        rep_old = inv[rep_new]
        v = verts_all[rep_old]  # [3, 2]
        e1, e2 = v[1] - v[0], v[2] - v[0]
        detj = abs(e1[0] * e2[1] - e1[1] * e2[0])
        qw_v = 2.0 * w * detj * 0.5
        # constant P1 gradients
        import jax.numpy as _jnp

        g = np.asarray(space.shape_gradients(
            _jnp.asarray(v)[None], _jnp.asarray(v.mean(0))[None, None]))[0, 0]
        vol_G[k] = qw_v[:, None, None] * np.einsum("ia,ja->ij", g, g)[None]
        # quadrature points per cell by translation from the representative
        qp_rep = v[0] + ref[:, 0:1] * e1[None] + ref[:, 1:2] * e2[None]
        vals = np.asarray(space.shape_values(
            _jnp.asarray(v)[None], _jnp.asarray(qp_rep)[None]))[0]  # [kq, nd]
        vol_wvals[k] = qw_v[:, None] * vals
        # translation offsets anchored on the bbox corner (v0 is NOT
        # translation-invariant: vertex storage order varies per cell)
        cells_k = verts_all[inv[k * L: (k + 1) * L]]  # [L, nvc, 2]
        anchors = cells_k.min(axis=1)  # [L, 2]
        vol_qp[:, k] = (qp_rep[:, None] + (anchors - v.min(axis=0))[None]
                        ).reshape(kq_v, KY, KX, 2)

    # face families
    t_e, w_e = edge_rule(qorder_face)
    kq_f = len(w_e)
    families = []
    for k in range(8):
        row = []
        cells_new = np.arange(k * L, (k + 1) * L)
        cells_old = inv[cells_new]
        cents = grid.cell_centroids[cells_old]  # [L, 2]
        for s in range(3):
            ks, dy, dx = plan[k][s]
            f_ids = faces_of[cells_new, s]  # [L]
            fv = grid.face_vertices[f_ids]  # [L, 2, 2]
            # representative geometry; the stored endpoint ORDER may flip
            # within a family (face keys are sorted by vertex id), so anchor
            # on the elementwise-min corner, which is storage-order-invariant
            a0, b0 = fv[0, 0], fv[0, 1]
            h = float(np.linalg.norm(b0 - a0))
            anchors_c = np.minimum(fv[:, 0], fv[:, 1])  # [L, 2]
            a0c = anchors_c[0]
            # verify the family is translation-congruent (up to endpoint swap)
            dvec = np.abs(fv[:, 1] - fv[:, 0])
            assert np.allclose(dvec - np.abs(b0 - a0), 0.0, atol=1e-9), (k, s)
            qp_rep = a0[None] + t_e[:, None] * (b0 - a0)[None]  # [kq, 2]
            qw = w_e * h
            # outward normal of THIS cell (representative): face normal
            # oriented away from the cell centroid
            n_raw = grid.face_normals[f_ids[0]]
            cvec = qp_rep.mean(0) - cents[0]
            n_out = n_raw if np.dot(n_raw, cvec) > 0 else -n_raw
            # basis values/fluxes at the representative face
            rep_old = cells_old[0]
            v_m = verts_all[rep_old]
            import jax.numpy as _jnp

            vals_m = np.asarray(space.shape_values(
                _jnp.asarray(v_m)[None], _jnp.asarray(qp_rep)[None]))[0]
            g_m = np.asarray(space.shape_gradients(
                _jnp.asarray(v_m)[None], _jnp.asarray(qp_rep[:1])[None]))[0, 0]
            nflux_m = g_m @ n_out
            # neighbour representative: pick an interior face of the family
            int_mask = interior_f[f_ids]
            if int_mask.any():
                j0 = int(np.argmax(int_mask))
                f0 = f_ids[j0]
                c_m_old = cells_old[j0]
                both = grid.face_cells[f0]
                c_p_old = both[1] if both[0] == c_m_old else both[0]
                v_p_rep = verts_all[c_p_old]
                # evaluate the neighbour basis at the representative's qp
                # TRANSLATED to face j0 (canonical-anchor offset)
                qp_j = qp_rep + (anchors_c[j0] - a0c)[None]
                vals_p = np.asarray(space.shape_values(
                    _jnp.asarray(v_p_rep)[None], _jnp.asarray(qp_j)[None]))[0]
                g_p = np.asarray(space.shape_gradients(
                    _jnp.asarray(v_p_rep)[None], _jnp.asarray(qp_j[:1])[None]))[0, 0]
                nflux_p = g_p @ n_out
                # re-express in the neighbour SUBCLASS's role enumeration
                # (c_p_old is an arbitrary cell of subclass ks whose storage
                # order may differ from ks's representative)
                p_new = int(np.asarray(order.perm)[c_p_old])
                assert p_new // L == ks, (k, s, p_new // L, ks)
                piy, pix = divmod(p_new % L, KX)
                pperm = dof_perm[ks, piy, pix]
                vals_p = vals_p[:, pperm]
                nflux_p = nflux_p[pperm]
                cent_p_rep = grid.cell_centroids[c_p_old]
                # shift of the p-centroid relative to the canonical anchor
                p_cent_off = cent_p_rep - anchors_c[j0]
            else:
                vals_p = np.zeros_like(vals_m)
                nflux_p = np.zeros(nd)
                p_cent_off = np.zeros(2)
            # per-cell translated quadrature + side-shifted variants
            qp_all = qp_rep[:, None] + (anchors_c - a0c)[None]  # [kq, L, 2]
            cent_m = cents[None]  # [1, L, 2]
            cent_p = (anchors_c + p_cent_off[None])[None]
            qp_m = qp_all + side_eps * (cent_m - qp_all)
            qp_p = qp_all + side_eps * (cent_p - qp_all)
            row.append(_FaceFamily(
                k_src=ks, dy=dy, dx=dx,
                qp=qp_all.reshape(kq_f, KY, KX, 2),
                qp_m=qp_m.reshape(kq_f, KY, KX, 2),
                qp_p=qp_p.reshape(kq_f, KY, KX, 2),
                qw=qw, h=h,
                vals_m=vals_m, vals_p=vals_p,
                nflux_m=np.asarray(nflux_m), nflux_p=np.asarray(nflux_p),
                interior=int_mask.reshape(KY, KX),
                dirichlet=dirichlet_f[f_ids].reshape(KY, KX),
            ))
        families.append(tuple(row))

    return StructuredAssemblyPlan(
        families=tuple(families), vol_qp=vol_qp, vol_G=vol_G,
        vol_wvals=vol_wvals, dof_perm=dof_perm, plan=plan,
        lattice=(KY, KX), nd=nd,
        sigma_i=inner_sigma(space_order), sigma_b=boundary_sigma(space_order),
        beta=default_beta(2),
    )


def geometric_soa_maps(order, plan: StructuredAssemblyPlan):
    """(to_soa, from_soa) flat index maps between the standard cell-major
    vector (original cell order, storage dof enumeration) and the
    role-enumerated SoA [nd, 8, KY, KX] layout of the structured assembly
    (cf. stencil.soa_index_maps, plus the per-cell dof permutation)."""
    KY, KX = plan.lattice
    nd = plan.nd
    NC = order.num_cells
    inv = np.asarray(order.inv)  # new -> old
    # soa position (r, new) <- old flat index inv[new]*nd + perm[new, r]
    perm_flat = plan.dof_perm.reshape(8 * KY * KX, nd)
    to_soa = (inv[None, :] * nd + perm_flat.T).reshape(-1)
    from_soa = np.empty(NC * nd, dtype=np.int64)
    from_soa[to_soa] = np.arange(NC * nd)
    return to_soa.astype(np.int32), from_soa.astype(np.int32)


class PrecomputedCoefficient(NamedTuple):
    """Host-evaluated scalar coefficient at all assembly quadrature points
    (legitimate when the coefficient function is static — e.g. the SPE10
    channel geometry; the runtime permeability field still multiplies in).
    The 105-box indicator evaluated in-trace costs ~35 ms of [K, N]
    intermediates per assembly; precomputed it is a ~4 MB constant."""

    a_vol: np.ndarray   # [kq_v, 8, KY, KX]
    lam_m: np.ndarray   # [F, kq, KY, KX]
    lam_p: np.ndarray   # [F, kq, KY, KX]


def precompute_coefficient(plan: StructuredAssemblyPlan, lam_fn,
                           dtype=np.float32) -> PrecomputedCoefficient:
    """Evaluate pinned to the HOST CPU backend: the eager evaluation of a
    many-box indicator at millions of points materializes [K, N]
    intermediates that exceed TPU HBM at multi-million-DoF lattices (the
    3M-DoF OOM was THIS setup step, not the solver)."""
    import jax as _jax

    fams = [plan.families[k][s] for k in range(8) for s in range(3)]
    try:
        cpu = _jax.local_devices(backend="cpu")[0]
        ctx = _jax.default_device(cpu)
    except RuntimeError:  # no cpu backend registered
        from contextlib import nullcontext

        ctx = nullcontext()
    with ctx:
        a_vol = np.asarray(lam_fn(jnp.asarray(plan.vol_qp)), dtype=dtype)
        lam_m = np.asarray(
            lam_fn(jnp.asarray(np.stack([f.qp_m for f in fams]))), dtype=dtype)
        lam_p = np.asarray(
            lam_fn(jnp.asarray(np.stack([f.qp_p for f in fams]))), dtype=dtype)
    return PrecomputedCoefficient(a_vol, lam_m, lam_p)


def structured_rhs(plan: StructuredAssemblyPlan, force_fn,
                   dtype=jnp.float32, qp_xy=None) -> jnp.ndarray:
    """SoA rhs [nd, 8, KY, KX]: B[i] = sum_q f(qp_q) qw_q phi_i(qp_q).
    Valid when the force quadrature order <= the plan's volume order.
    Coordinates enter as separate x/y planes (host-side slices): a single
    [..., 2] coordinate constant pads its trailing axis to 128 lanes on
    TPU — 64x HBM inflation, the OOM at 3M DoF.  ``qp_xy=(x0, x1)``: pass
    the coordinate planes as runtime values instead of trace-time
    constants (multi-hundred-MB HLO literals overflow the remote-compile
    request at 12M DoF)."""
    if qp_xy is not None:
        x0 = jnp.asarray(qp_xy[0], dtype=dtype)
        x1 = jnp.asarray(qp_xy[1], dtype=dtype)
    else:
        x0 = jnp.asarray(plan.vol_qp[..., 0], dtype=dtype)
        x1 = jnp.asarray(plan.vol_qp[..., 1], dtype=dtype)
    try:
        f = force_fn((x0, x1))  # [kq, 8, KY, KX]
    except (TypeError, AttributeError, IndexError):
        f = force_fn(jnp.asarray(plan.vol_qp, dtype=dtype))
    wv = jnp.asarray(plan.vol_wvals, dtype=dtype)        # [8, kq, nd]
    return jnp.einsum("qkyx,kqi->ikyx", f, wv)


def scale_planes(S: StencilBlockEll, B: jnp.ndarray):
    """(S, B) -> (S A S, S B, s) symmetric block-Jacobi diagonal scaling in
    the plane layout (cf. la/block_ell.symmetric_diagonal_scaling)."""
    nd = S.nd
    diag = jnp.stack([S.planes[0, i, i] for i in range(nd)])  # [nd, 8, KY, KX]
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    fields = S.neighbor_fields(s)  # [4][nd, 8, KY, KX]
    # planes[sl, i, j] *= s[i] * s_neighbor[j]
    scaled = jnp.stack([
        S.planes[sl] * s[:, None] * fields[sl][None, :]
        for sl in range(4)
    ])
    return S.with_planes(scaled), B * s, s


def assemble_structured_spe10(plan: StructuredAssemblyPlan, lam_fn,
                              cell_field: Optional[jnp.ndarray] = None,
                              dtype=jnp.float32,
                              family_chunks: int = 1) -> StencilBlockEll:
    """Assemble the SWIPDG operator into planes.

    ``lam_fn``: scalar coefficient evaluated at quadrature points (may vary
    within cells).  ``cell_field`` [8, KY, KX]: optional cell-constant
    scalar multiplier (the SPE10 permeability as per-cell values in SoA
    order); the total diffusion is a(x) = lam_fn(x) * cell_field[cell].

    All 24 face families are processed as ONE stacked batch — per-family
    loops cost ~1000 tiny kernel launches (measured ~30 ms of pure launch
    overhead on 16k-element lattice arrays); stacked, the whole face
    assembly is ~20 fused ops over [24, ...] arrays.
    """
    KY, KX = plan.lattice
    nd = plan.nd
    fams = [plan.families[k][s] for k in range(8) for s in range(3)]
    F = len(fams)  # 24

    pre = lam_fn if isinstance(lam_fn, PrecomputedCoefficient) else None
    a_vol = (jnp.asarray(pre.a_vol, dtype=dtype) if pre is not None
             else lam_fn(jnp.asarray(plan.vol_qp, dtype=dtype)))

    # --- volume ---
    if cell_field is not None:
        a_vol = a_vol * cell_field[None]
    volG = jnp.asarray(plan.vol_G, dtype=dtype)  # [8, kq, nd, nd]
    w0 = jnp.einsum("qkyx,kqij->ijkyx", a_vol, volG)

    # --- faces, stacked over families in ``family_chunks`` groups (the
    # fully-stacked einsums peak at several [F, nd, nd, KY, KX] temporaries,
    # which exceeds HBM at multi-million-DoF lattices; chunking divides the
    # peak without reintroducing the ~1000-tiny-kernel launch overhead) ---
    nb_planes = jnp.zeros((3, nd, nd, 8, KY, KX), dtype=dtype)
    n_chunks = max(1, int(family_chunks))
    bounds = np.linspace(0, F, n_chunks + 1).astype(int)
    for c0, c1 in zip(bounds[:-1], bounds[1:]):
        chunk = list(range(int(c0), int(c1)))
        if not chunk:
            continue
        cf_list = [fams[f] for f in chunk]
        if pre is not None:
            cidx = np.asarray(chunk)
            a_m = jnp.asarray(pre.lam_m[cidx], dtype=dtype)
            a_p = jnp.asarray(pre.lam_p[cidx], dtype=dtype)
        else:
            a_m = lam_fn(jnp.asarray(
                np.stack([f.qp_m for f in cf_list]), dtype=dtype))
            a_p = lam_fn(jnp.asarray(
                np.stack([f.qp_p for f in cf_list]), dtype=dtype))
        if cell_field is not None:
            own = cell_field[np.array([f // 3 for f in chunk])]
            a_m = a_m * own[:, None]
            nb = jnp.stack([
                jnp.roll(cell_field[f.k_src], shift=(-f.dy, -f.dx),
                         axis=(0, 1)) for f in cf_list])
            a_p = a_p * nb[:, None]
        qw = jnp.asarray(np.stack([f.qw for f in cf_list]), dtype=dtype)
        hb = np.array([f.h ** plan.beta for f in cf_list])
        interior = jnp.asarray(
            np.stack([f.interior for f in cf_list]), dtype=dtype)
        dirich = jnp.asarray(
            np.stack([f.dirichlet for f in cf_list]), dtype=dtype)
        vals_m = np.stack([f.vals_m for f in cf_list])   # [Fc, kq, nd]
        vals_p = np.stack([f.vals_p for f in cf_list])
        nfm = np.stack([f.nflux_m for f in cf_list])     # [Fc, nd]
        nfp = np.stack([f.nflux_p for f in cf_list])

        # side quantities (kappa = a*I): delta = a, flux_i = a * nflux_i
        denom = a_m + a_p
        zero = denom == 0
        safe = jnp.where(zero, 1.0, denom)
        w_m = jnp.where(zero, 0.5, a_p / safe)
        gamma = jnp.where(zero, 0.0, a_m * a_p / safe)
        inv_hb = jnp.asarray(1.0 / hb, dtype=dtype)[:, None, None, None]
        pen_q = qw[..., None, None] * (plan.sigma_i * gamma * inv_hb)
        wam_q = qw[..., None, None] * (w_m * a_m)
        wap_q = qw[..., None, None] * ((1.0 - w_m) * a_p)
        penb_q = qw[..., None, None] * (plan.sigma_b * a_m * inv_hb)
        am_q = qw[..., None, None] * a_m

        PenMM = jnp.asarray(np.einsum("fqi,fqj->fqij", vals_m, vals_m), dtype=dtype)
        PenMP = jnp.asarray(np.einsum("fqi,fqj->fqij", vals_m, vals_p), dtype=dtype)
        VnM = jnp.asarray(np.einsum("fqi,fj->fqij", vals_m, nfm), dtype=dtype)
        NvM = jnp.asarray(np.einsum("fi,fqj->fqij", nfm, vals_m), dtype=dtype)
        VnP = jnp.asarray(np.einsum("fqi,fj->fqij", vals_m, nfp), dtype=dtype)
        NvP = jnp.asarray(np.einsum("fi,fqj->fqij", nfm, vals_p), dtype=dtype)

        # b[m,m] = sum_q qw ( pen v_m v_m - v_m wam nfm - wam nfm v_m )
        # b[m,p] = sum_q qw ( -pen v_m v_p - v_m wap nfp + wam nfm v_p )
        # (jump sign: [u] = u_m - u_p with n = n_out of m)
        b_mm_int = (jnp.einsum("fqyx,fqij->fijyx", pen_q, PenMM)
                    - jnp.einsum("fqyx,fqij->fijyx", wam_q, VnM + NvM))
        b_mp_int = (-jnp.einsum("fqyx,fqij->fijyx", pen_q, PenMP)
                    - jnp.einsum("fqyx,fqij->fijyx", wap_q, VnP)
                    + jnp.einsum("fqyx,fqij->fijyx", wam_q, NvP))
        b_mm_dir = (jnp.einsum("fqyx,fqij->fijyx", penb_q, PenMM)
                    - jnp.einsum("fqyx,fqij->fijyx", am_q, VnM + NvM))

        self_add = (interior[:, None, None] * b_mm_int
                    + dirich[:, None, None] * b_mm_dir)
        nb_set = interior[:, None, None] * b_mp_int
        if len(chunk) == F:
            # single-chunk fast path: pure reshapes, no .at updates
            self_k = self_add.reshape(8, 3, nd, nd, KY, KX).sum(axis=1)
            w0 = w0 + jnp.moveaxis(self_k, 0, 2)
            nb_planes = jnp.moveaxis(
                nb_set.reshape(8, 3, nd, nd, KY, KX), (0, 1), (3, 0))
        else:
            # family f = k*3 + s: self contribution -> W0[:, :, k];
            # neighbour contribution -> plane s+1 at subclass k
            for i, f in enumerate(chunk):
                k, s = f // 3, f % 3
                w0 = w0.at[:, :, k].add(self_add[i])
                nb_planes = nb_planes.at[s, :, :, k].add(nb_set[i])

    planes = jnp.concatenate([w0[None], nb_planes], axis=0)
    return StencilBlockEll(planes, plan.plan)
