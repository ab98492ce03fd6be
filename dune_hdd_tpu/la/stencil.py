"""SoA (structure-of-arrays) stencil form of the structured block operator.

``StructuredBlockEll`` (la/block_ell.py) already replaces the neighbour
gather by static slices, but its [NC, 4, nd, nd] layout puts tiny size-3/4
axes in the minor (lane/sublane) dimensions — XLA pads them to the 8x128
tile, so the SpMV runs ~8x below stream bandwidth.  Here the operator lives
as *planes* W[slot, i, j, subclass, KY, KX] with the lattice dims minor
(dense sublane/lane tiling) and vectors live as X[nd, 8, KY, KX]; every
neighbour access is a small 2-axis roll and the FMA core is 36 fused
elementwise multiply-adds — one clean pass over the 9.2 MB of blocks.

Key identity (proved per-offset in ``stencil_plan``, verified in tests):
for a subclass-k cell at lattice position (iy, ix), its geometric slot-s
neighbour is the subclass-``k_src`` cell at (iy+dy, ix+dx); entries where the
2-axis roll wraps differ from the flat-offset semantics of
StructuredBlockEll only where the blocks are zero (domain boundary), because
a wrapped read is never the true neighbour and the block-ELL invariant puts
zero blocks exactly there.

This is the TPU image of the reference's bandwidth-tuned CPU assembly/solve
loops (dune/hdd/linearelliptic/discretizations/base.hh:327-367 solver
semantics); the deflation/two-level pieces mirror la/deflation.py in the
plane layout with all per-iteration ops regular (rolls, reshape-sums,
broadcasts; no gather/scatter).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_ell import BlockEllMatrix, StructuredBlockEll, inv3x3

__all__ = [
    "StencilBlockEll",
    "stencil_plan",
    "soa_index_maps",
    "jacobi_smoother",
    "chebyshev_smoother",
    "stencil_deflation_preconditioner",
    "stencil_refined_solve",
]


def stencil_plan(order) -> Tuple[Tuple[Tuple[int, int, int], ...], ...]:
    """Per (subclass k, slot s): (k_src, dy, dx) with the slot-s neighbour
    field of subclass k equal to roll2d(X[k_src], (-dy, -dx))."""
    KY, KX = order.lattice
    L = KY * KX
    NC = order.num_cells
    plan = []
    for k in range(8):
        row = []
        for s in range(3):
            o = int(order.offsets[k][s]) % NC
            oc = ((o + NC // 2) % NC) - NC // 2
            dk = int(np.round(oc / L))
            r = oc - dk * L
            dy = int(np.round(r / KX))
            dx = r - dy * KX
            if abs(dy) > 2 or abs(dx) > 2:
                raise ValueError(
                    f"offset {oc} for subclass {k} slot {s} is not a small "
                    f"lattice shift (dy={dy}, dx={dx})")
            row.append(((k + dk) % 8, dy, dx))
        plan.append(tuple(row))
    return tuple(plan)


class _SoAMaps(NamedTuple):
    to_soa: np.ndarray    # [nd*NC] flat gather: soa_flat = x[to_soa]
    from_soa: np.ndarray  # [NC*nd] flat gather: x = soa_flat[from_soa]


def soa_index_maps(order, nd: int) -> _SoAMaps:
    """Static index maps between the flat cell-major vector in ORIGINAL cell
    order and the SoA [nd, 8, KY, KX] layout (flattened)."""
    NC = order.num_cells
    inv = np.asarray(order.inv)   # new -> old
    perm = np.asarray(order.perm)  # old -> new
    # soa position (j, new) <- old flat index inv[new]*nd + j
    to_soa = (inv[None, :] * nd + np.arange(nd)[:, None]).reshape(-1)
    # old flat (old, j) <- soa flat j*NC + perm[old]
    from_soa = (np.arange(nd)[None, :] * NC + perm[:, None]).reshape(-1)
    return _SoAMaps(to_soa.astype(np.int32), from_soa.astype(np.int32))


class _Static:
    """Hashable aux-data wrapper (cf. block_ell._StaticArray)."""

    __slots__ = ("value", "_key")

    def __init__(self, value):
        self.value = value
        self._key = repr(value)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Static) and self._key == other._key


@jax.tree_util.register_pytree_node_class
class StencilBlockEll:
    """planes [4, nd, nd, 8, KY, KX] (slot 0 = self); plan: 8x3 static
    (k_src, dy, dx) lattice shifts.

    ``sym=True`` switches :meth:`matvec` to the symmetric-storage form: the
    SWIPDG operator is symmetric, so each undirected coupling edge (k, s) ~
    (k_src, s') satisfies W[s'+1, j, i, k_src] == roll(W[s+1, i, j, k],
    (dy, dx)) up to f32 assembly roundoff (~1e-7 rel, verified in tests).
    The symmetric matvec reads only the 12 forward-edge plane sets plus the
    upper triangle of the self blocks and applies each stored plane twice
    (forward, and transposed + inverse-rolled), cutting operator HBM
    traffic ~1.5x.  The result is the exactly-symmetrized operator
    (required by CG anyway); it differs from the assembled one within
    assembly roundoff.
    """

    def __init__(self, planes: jnp.ndarray, plan, sym: bool = False):
        self.planes = planes
        self.plan = tuple(tuple(tuple(int(v) for v in e) for e in row)
                          for row in plan)
        self.sym = bool(sym)

    def tree_flatten(self):
        if not hasattr(self, "_aux"):
            self._aux = _Static((self.plan, self.sym))
        return (self.planes,), self._aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        plan, sym = aux.value
        return cls(children[0], plan, sym)

    @property
    def nd(self):
        return self.planes.shape[1]

    @property
    def lattice(self):
        return self.planes.shape[-2], self.planes.shape[-1]

    @property
    def num_cells(self):
        return 8 * self.planes.shape[-2] * self.planes.shape[-1]

    def with_planes(self, planes):
        return StencilBlockEll(planes, self.plan, self.sym)

    def astype(self, dtype):
        return self.with_planes(self.planes.astype(dtype))

    def symmetrized(self) -> "StencilBlockEll":
        """Same planes, symmetric-storage matvec (see class docstring)."""
        return StencilBlockEll(self.planes, self.plan, sym=True)

    @classmethod
    def from_block_ell(cls, A: BlockEllMatrix, order) -> "StencilBlockEll":
        """One static gather of the block array into plane layout (jit-safe;
        setup cost ~1 pass over the operator)."""
        A_st = StructuredBlockEll.from_block_ell(A, order)
        return cls.from_structured(A_st, order)

    @classmethod
    def from_structured(cls, A_st: StructuredBlockEll, order) -> "StencilBlockEll":
        KY, KX = order.lattice
        nd = A_st.nd
        plan = stencil_plan(order)
        blocks = A_st.blocks.reshape(8, KY, KX, 4, nd, nd)
        planes = jnp.moveaxis(blocks, (3, 4, 5), (0, 1, 2))  # [4,nd,nd,8,KY,KX]
        return cls(planes, plan)

    # -- vector layout ------------------------------------------------------

    def neighbor_fields(self, X: jnp.ndarray):
        """[4][nd, 8, KY, KX] neighbour fields (self + 3 slots) of X."""
        fields = [X]
        for s in range(3):
            per_k = []
            for k in range(8):
                ks, dy, dx = self.plan[k][s]
                per_k.append(jnp.roll(X[:, ks], shift=(-dy, -dx), axis=(1, 2)))
            fields.append(jnp.stack(per_k, axis=1))
        return fields

    def matvec(self, X: jnp.ndarray) -> jnp.ndarray:
        """X [nd, 8, KY, KX] -> A X in the same layout; 24 rolls + 36 FMAs,
        all fused elementwise (exact f32 — no matmul/bf16 pass involved).
        With ``sym`` set, dispatches to the half-storage symmetric form."""
        if self.sym:
            return self._matvec_sym(X)
        W = self.planes
        nd = self.nd
        fields = self.neighbor_fields(X)
        acc = []
        for i in range(nd):
            t = None
            for s in range(4):
                for j in range(nd):
                    c = W[s, i, j] * fields[s][j]
                    t = c if t is None else t + c
            acc.append(t)
        return jnp.stack(acc, axis=0)

    def _sym_forward_edges(self):
        """12 forward (k, s) edges covering each undirected coupling once,
        with the reverse (k_src, s') partner.  Raises if the plan is not
        symmetric (it is for the NVB subclass structure)."""
        pairs = {}
        for k in range(8):
            for s in range(3):
                ks, dy, dx = self.plan[k][s]
                rev = None
                for sp in range(3):
                    if self.plan[ks][sp] == (k, -dy, -dx):
                        rev = sp
                if rev is None:
                    raise ValueError(
                        f"stencil plan has no reverse edge for (k={k}, s={s})")
                pairs[(k, s)] = (ks, rev)
        return [(e, pairs[e]) for e in pairs if e < pairs[e]]

    def _matvec_sym(self, X: jnp.ndarray) -> jnp.ndarray:
        W = self.planes
        nd = self.nd
        acc = [[None] * 8 for _ in range(nd)]

        def add(i, k, val):
            acc[i][k] = val if acc[i][k] is None else acc[i][k] + val

        # self blocks: upper triangle used both ways (exactly symmetric)
        for k in range(8):
            for i in range(nd):
                for j in range(i, nd):
                    w = W[0, i, j, k]
                    add(i, k, w * X[j, k])
                    if i < j:
                        add(j, k, w * X[i, k])
        # each undirected edge: stored forward plane applied forward and
        # (transposed + inverse-rolled) backward
        for (k, s), (ks, _sp) in self._sym_forward_edges():
            _, dy, dx = self.plan[k][s]
            Xsh = jnp.roll(X[:, ks], shift=(-dy, -dx), axis=(1, 2))
            for i in range(nd):
                t = None
                for j in range(nd):
                    c = W[s + 1, i, j, k] * Xsh[j]
                    t = c if t is None else t + c
                add(i, k, t)
            for j in range(nd):
                t = None
                for i in range(nd):
                    c = W[s + 1, i, j, k] * X[i, k]
                    t = c if t is None else t + c
                add(j, ks, jnp.roll(t, shift=(dy, dx), axis=(0, 1)))
        return jnp.stack([jnp.stack(row, axis=0) for row in acc], axis=0)

    __matmul__ = matvec

    def diagonal_blocks(self) -> jnp.ndarray:
        """[nd, nd, 8, KY, KX]."""
        return self.planes[0]

    def row_sums(self) -> jnp.ndarray:
        """AZ planes: [4, nd, 8, KY, KX] with AZ[s,i,c] = sum_j W[s,i,j,c]
        (the action of A on the indicator of the neighbour's aggregate)."""
        return self.planes.sum(axis=2)


# -- smoothers ---------------------------------------------------------------


def jacobi_smoother(A: StencilBlockEll) -> Callable:
    """Blockwise inverse of the diagonal nd x nd blocks, SoA layout."""
    D = A.diagonal_blocks()  # [nd, nd, 8, KY, KX]
    nd = A.nd
    if nd == 3:
        Dm = jnp.moveaxis(D, (0, 1), (-2, -1))
        Dinv = jnp.moveaxis(inv3x3(Dm), (-2, -1), (0, 1))
    else:
        Dm = jnp.moveaxis(D, (0, 1), (-2, -1))
        Dinv = jnp.moveaxis(jnp.linalg.inv(Dm), (-2, -1), (0, 1))

    def apply(R):
        return jnp.einsum("ij...,j...->i...", Dinv, R)

    return apply


def estimate_lambda_max(A: StencilBlockEll, smoother: Callable,
                        iters: int = 12, seed: int = 0) -> jnp.ndarray:
    """Power iteration on M_J^-1 A (setup-time; ~``iters`` matvecs)."""
    KY, KX = A.lattice
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal((A.nd, 8, KY, KX)), dtype=A.planes.dtype)

    def body(_, v):
        w = smoother(A.matvec(v))
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    w = smoother(A.matvec(v))
    return jnp.vdot(v, w) / jnp.vdot(v, v)


def chebyshev_smoother(A: StencilBlockEll, degree: int = 3,
                       lmax: Optional[jnp.ndarray] = None,
                       ratio: float = 8.0,
                       lmax_safety: float = 1.1) -> Callable:
    """Chebyshev polynomial smoother in M_J^-1 A on [lmax/ratio, lmax]
    (hypre-style AMG smoothing; SPD for even/odd degree since the shifted
    Chebyshev polynomial is positive on the spectrum — safe inside CG)."""
    Mj = jacobi_smoother(A)
    if lmax is None:
        lmax = estimate_lambda_max(A, Mj)
    lmax = lmax * lmax_safety
    lmin = lmax / ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def apply(R):
        # smoothing iteration for A x = R, x0 = 0 (Saad, Iterative Methods,
        # alg. 12.1 adapted to preconditioned residual polynomials)
        rho = 1.0 / sigma
        z = Mj(R)
        d = z / theta
        x = d
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = R - A.matvec(x)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * Mj(r)
            x = x + d
            rho = rho_new
        return x

    return apply


# -- generic preconditioned-Chebyshev helper ----------------------------------


def _cheb_apply(matvec: Callable, precond: Callable, degree: int,
                lmax, ratio: float = 8.0, lmax_safety: float = 1.1):
    """Chebyshev polynomial approximation of (matvec)^-1 preconditioned by
    ``precond`` on the spectral interval [lmax/ratio, lmax] of precond∘matvec.
    A FIXED polynomial -> a fixed symmetric positive operator, safe as (part
    of) a PCG preconditioner (unlike an inner Krylov solve)."""
    lmax = lmax * lmax_safety
    lmin = lmax / ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def apply(R):
        rho = 1.0 / sigma
        z = precond(R)
        d = z / theta
        x = d
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = R - matvec(x)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * precond(r)
            x = x + d
            rho = rho_new
        return x

    return apply


def _power_lambda_max(matvec: Callable, precond: Callable, shape, dtype,
                      iters: int = 12, seed: int = 0):
    """Power iteration for lambda_max(precond∘matvec) (trace-time setup)."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(shape), dtype=dtype)

    def body(_, v):
        w = precond(matvec(v))
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    w = precond(matvec(v))
    return jnp.vdot(v, w) / jnp.vdot(v, v)


# -- two-level deflation in plane layout -------------------------------------


class _Aggregation(NamedTuple):
    aggsum: Callable      # [.., 8, KY, KX] -> [n_agg] (sum over nd too)
    broadcast: Callable   # [n_agg] -> [8, KY, KX] scalar field
    mx: int
    my: int
    fy: int
    fx: int


def _aggregation(A: StencilBlockEll, macro_shape) -> Optional[_Aggregation]:
    KY, KX = A.lattice
    mx, my = int(macro_shape[0]), int(macro_shape[1])
    if KX % mx or KY % my:
        return None
    fy, fx = KY // my, KX // mx
    # aggregate id = ix_macro * my + iy_macro (cf. aggregate_map_from_points)

    def aggsum(R):
        # R [..., 8, KY, KX] -> [n_agg]; sums leading dims too
        lead = R.shape[:-3]
        rc = R.reshape(lead + (8, my, fy, mx, fx))
        axes = tuple(range(len(lead))) + (len(lead),) + (len(lead) + 2, len(lead) + 4)
        return rc.sum(axis=axes).T.reshape(-1)  # [my,mx] -> [mx,my] flat

    def broadcast(yc):
        g = yc.reshape(mx, my).T  # [my, mx]
        g = jnp.broadcast_to(g[None, :, None, :, None], (8, my, fy, mx, fx))
        return g.reshape(8, my * fy, mx * fx)

    return _Aggregation(aggsum, broadcast, mx, my, fy, fx)


class _Aggregation2D(NamedTuple):
    """Fine plane layout -> 2D coarse lattice field [my, mx] (rows = y)."""

    aggsum: Callable      # [.., 8, KY, KX] -> [my, mx] (sums leading dims)
    broadcast: Callable   # [my, mx] -> [8, KY, KX]
    mx: int
    my: int
    fy: int
    fx: int


def _aggregation2d(A: StencilBlockEll, macro_shape) -> Optional[_Aggregation2D]:
    KY, KX = A.lattice
    mx, my = int(macro_shape[0]), int(macro_shape[1])
    if KX % mx or KY % my:
        return None
    fy, fx = KY // my, KX // mx

    def aggsum(R):
        lead = R.shape[:-3]
        rc = R.reshape(lead + (8, my, fy, mx, fx))
        axes = (tuple(range(len(lead))) + (len(lead),)
                + (len(lead) + 2, len(lead) + 4))
        return rc.sum(axis=axes)  # [my, mx]

    def broadcast(yc):
        g = jnp.broadcast_to(yc[None, :, None, :, None], (8, my, fy, mx, fx))
        return g.reshape(8, my * fy, mx * fx)

    return _Aggregation2D(aggsum, broadcast, mx, my, fy, fx)


def _crossing_masks(f: int, d: int, n: int) -> dict:
    """{v: bool[n]} partition of lattice positions i by the aggregate offset
    v = (i+d)//f - i//f the shift d produces under f-fold aggregation.
    Out-of-domain targets keep their arithmetic v — their stencil weights
    are zero (block-ELL boundary invariant), so they contribute nothing."""
    i = np.arange(n)
    dA = (i + d) // f - i // f
    return {int(v): (dA == v) for v in np.unique(dA)}


def _stencil_bands(A: StencilBlockEll, agg: _Aggregation2D,
                   P: Optional[jnp.ndarray] = None) -> dict:
    """Galerkin coarse operator E = Z^T A Z of the piecewise-constant
    aggregation as STENCIL BANDS {(vy, vx): [my, mx]} on the coarse lattice
    (E[a, a+v] = band[v][a]) — the scalar-lattice image of the fine plane
    layout, applied with rolls (no dense matrix, no scatter).

    ``P`` [4, 8, KY, KX]: optional precomputed per-(slot, subclass) pairing
    sums (default 1^T W 1 = planes.sum over the block axes; pass the
    w-weighted sums for a weighted deflation space Z_w)."""
    KY, KX = A.lattice
    my, mx, fy, fx = agg.my, agg.mx, agg.fy, agg.fx
    if P is None:
        P = A.planes.sum(axis=(1, 2))  # [4, 8, KY, KX]

    def agg2(field2d):  # [KY, KX] -> [my, mx]
        return field2d.reshape(my, fy, mx, fx).sum(axis=(1, 3))

    bands: dict = {(0, 0): agg2(P[0].sum(axis=0))}
    for s in range(3):
        for k in range(8):
            _, dy, dx = A.plan[k][s]
            masks_y = _crossing_masks(fy, dy, KY)
            masks_x = _crossing_masks(fx, dx, KX)
            Pk = P[s + 1, k]
            for vy, m_y in masks_y.items():
                wy = jnp.asarray(m_y.astype(np.float32))[:, None]
                for vx, m_x in masks_x.items():
                    wx = jnp.asarray(m_x.astype(np.float32))[None, :]
                    contrib = agg2(Pk * wy * wx)
                    key = (vy, vx)
                    bands[key] = bands.get(key, 0.0) + contrib
    return bands


def _band_matvec(bands: dict) -> Callable:
    """y[a] = sum_v band[v][a] * x[a+v] via 2-axis rolls (band entries whose
    target is out of domain are zero, so the wrap reads are harmless)."""

    def mv(x):
        out = bands[(0, 0)] * x
        for (vy, vx), b in bands.items():
            if (vy, vx) == (0, 0):
                continue
            out = out + b * jnp.roll(x, shift=(-vy, -vx), axis=(0, 1))
        return out

    return mv


def _aggregate_bands(bands: dict, my: int, mx: int, gy: int, gx: int) -> dict:
    """Re-aggregate stencil bands on an [my, mx] lattice by (gy, gx) ->
    bands on the [my//gy, mx//gx] lattice (Galerkin: Z2^T E Z2)."""
    my2, mx2 = my // gy, mx // gx
    out: dict = {}
    for (vy, vx), b in bands.items():
        masks_y = _crossing_masks(gy, vy, my)
        masks_x = _crossing_masks(gx, vx, mx)
        for vy2, m_y in masks_y.items():
            wy = jnp.asarray(m_y.astype(np.float32))[:, None]
            for vx2, m_x in masks_x.items():
                wx = jnp.asarray(m_x.astype(np.float32))[None, :]
                contrib = (b * wy * wx).reshape(my2, gy, mx2, gx).sum(axis=(1, 3))
                key = (vy2, vx2)
                out[key] = out.get(key, 0.0) + contrib
    return out


def _bands_to_dense(bands: dict, my: int, mx: int) -> jnp.ndarray:
    """Dense [mx*my, mx*my] operator from stencil bands, in the x-major flat
    ordering id = ax*my + ay used by ``_coarse_inverse_bcr``."""
    ay, ax = np.mgrid[0:my, 0:mx]
    a = ax * my + ay  # [my, mx]
    n = mx * my
    E = jnp.zeros((n, n), dtype=jnp.float32)
    for (vy, vx), b in bands.items():
        by, bx = ay + vy, ax + vx
        valid = (by >= 0) & (by < my) & (bx >= 0) & (bx < mx)
        rows = a[valid]
        cols = (bx * my + by)[valid]
        E = E.at[jnp.asarray(rows), jnp.asarray(cols)].add(
            jnp.asarray(b, dtype=jnp.float32)[valid])
    return E


def _coarse_E(A: StencilBlockEll, agg: _Aggregation,
              P: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """E = Z^T A Z via one static scatter-add of plane block sums (setup)."""
    KY, KX = A.lattice
    mx, my, fy, fx = agg.mx, agg.my, agg.fy, agg.fx
    n_agg = mx * my
    iy, ix = np.meshgrid(np.arange(KY), np.arange(KX), indexing="ij")
    agg_field = (ix // fx) * my + (iy // fy)  # [KY, KX]
    rows = np.broadcast_to(agg_field, (4, 8, KY, KX)).copy()
    cols = np.empty((4, 8, KY, KX), dtype=np.int64)
    cols[0] = agg_field
    valid = np.ones((4, 8, KY, KX), dtype=bool)
    for s in range(3):
        for k in range(8):
            _, dy, dx = A.plan[k][s]
            shifted = np.roll(np.roll(agg_field, -dy, axis=0), -dx, axis=1)
            cols[s + 1, k] = shifted
            # wrapped entries carry zero blocks; mark anyway for clarity
            if dy > 0:
                valid[s + 1, k, KY - dy:, :] = False
            elif dy < 0:
                valid[s + 1, k, : -dy, :] = False
            if dx > 0:
                valid[s + 1, k, :, KX - dx:] = False
            elif dx < 0:
                valid[s + 1, k, :, : -dx] = False
    flat = (rows * n_agg + cols).reshape(-1)
    if P is None:
        P = A.planes.sum(axis=(1, 2))
    sums = P.reshape(-1)  # [4*8*KY*KX]
    sums = sums * jnp.asarray(valid.reshape(-1), dtype=sums.dtype)
    E = jnp.zeros(n_agg * n_agg, dtype=sums.dtype)
    E = E.at[jnp.asarray(flat)].add(sums)
    return E.reshape(n_agg, n_agg)


def _coarse_bands(A: StencilBlockEll, agg: _Aggregation,
                  P: Optional[jnp.ndarray] = None) -> dict:
    """Bands of E = Z^T A Z keyed by aggregate offset (vy, vx), each a
    [n_agg] vector in x-major id = ax*my + ay ordering: each (subclass,
    slot) family contributes to at most 4 relative aggregate offsets
    (crossing 0/1 macro boundaries per axis), so the bands assemble from
    ~100 masked reshape-sums — never materializing E."""
    KY, KX = A.lattice
    fy, fx = agg.fy, agg.fx
    iy = np.arange(KY)[:, None]
    ix = np.arange(KX)[None, :]
    if P is None:
        P = A.planes.sum(axis=(1, 2))  # [4, 8, KY, KX]

    bands: dict = {}

    def add_band(vy: int, vx: int, vec: jnp.ndarray):
        key = (int(vy), int(vx))
        bands[key] = bands.get(key, 0.0) + vec

    # slot 0 (self): diagonal band
    add_band(0, 0, agg.aggsum(P[0]))
    for s in range(3):
        for k in range(8):
            _, dy, dx = A.plan[k][s]
            dAy = (iy + dy) // fy - iy // fy  # [KY, 1]
            dAx = (ix + dx) // fx - ix // fx  # [1, KX]
            Pk = P[s + 1, k]
            for vy in np.unique(dAy):
                for vx in np.unique(dAx):
                    mask = jnp.asarray(
                        ((dAy == vy) & (dAx == vx)).astype(np.float32))
                    # aggsum over a single subclass: zero-pad the others
                    field = jnp.zeros((8, KY, KX), dtype=Pk.dtype)
                    field = field.at[k].set(Pk * mask)
                    add_band(vy, vx, agg.aggsum(field))
    return bands


def _coarse_E_banded(A: StencilBlockEll, agg: _Aggregation,
                     P: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense E = Z^T A Z from `_coarse_bands` (small coarse spaces only)."""
    mx, my = agg.mx, agg.my
    n_agg = mx * my
    bands = _coarse_bands(A, agg, P)
    E = jnp.zeros((n_agg, n_agg), dtype=A.planes.dtype)
    a = np.arange(n_agg)
    amx, amy = a // my, a % my
    for (vy, vx), vec in bands.items():
        b = a + vx * my + vy
        valid = ((amx + vx >= 0) & (amx + vx < mx)
                 & (amy + vy >= 0) & (amy + vy < my))
        rows = a[valid]
        cols = b[valid]
        E = E.at[jnp.asarray(rows), jnp.asarray(cols)].add(vec[jnp.asarray(rows)])
    return E


def _bands_to_blocktridiag(bands: dict, mx: int, my: int):
    """(B, C) [mx, my, my] block-tridiagonal form of banded E (x-major
    ordering; requires |vx| <= 1, i.e. aggregation factor fx >= 2).  C is
    symmetrized from the +1/-1 bands so the CR factorization's C/C^T
    convention holds exactly."""
    dt = next(iter(bands.values())).dtype
    B = jnp.zeros((mx, my, my), dtype=dt)
    C_up = jnp.zeros((mx, my, my), dtype=dt)
    C_lo = jnp.zeros((mx, my, my), dtype=dt)
    ay = np.arange(my)
    for (vy, vx), vec in bands.items():
        if abs(vx) > 1:
            raise ValueError(
                f"band vx={vx}: coarse lattice not block-tridiagonal "
                "(needs aggregation factor fx >= 2)")
        V = vec.reshape(mx, my)
        by = ay + vy
        ok = (by >= 0) & (by < my)
        r, c = ay[ok], by[ok]
        if vx == 0:
            B = B.at[:, r, c].add(V[:, r])
        elif vx == 1:
            # row (ax, ay) -> col (ax+1, ay+vy); stored at block ax
            C_up = C_up.at[:-1, r, c].add(V[:-1, r])
        else:
            # row (ax, ay) -> col (ax-1, ay+vy): the same physical entry as
            # C[ax-1][ay+vy, ay] in the "C_i couples i -> i+1" convention
            C_lo = C_lo.at[:-1, c, r].add(V[1:, r])
    # average the two independently-assembled copies of each coupling block
    # (equal up to assembly rounding since E is symmetric)
    C = 0.5 * (C_up + C_lo)
    return B, C


def _block_tridiag_solve(B: jnp.ndarray, C: jnp.ndarray, R: jnp.ndarray,
                         precision=None) -> jnp.ndarray:
    """Solve the symmetric block-tridiagonal system

        C_{i-1}^T y_{i-1} + B_i y_i + C_i y_{i+1} = r_i,  i = 0..n-1

    for a BATCH of right-hand sides by block cyclic reduction: log2(n)
    levels of batched [m,m] x [m,N] matmuls — MXU-friendly, unlike the
    panel-sequential dense LU.  B [n,m,m], C [n,m,m] with C[n-1] == 0
    (C_i couples block i to i+1), R [n,m,N].  n must be a power of two
    (pad with identity blocks / zero coupling / zero rhs)."""
    hp = precision or jax.lax.Precision.HIGHEST
    n = B.shape[0]
    if n == 1:
        return jnp.linalg.solve(B[0], R[0])[None]

    def mm(a, b):
        return jnp.einsum("nij,njk->nik", a, b, precision=hp)

    Binv_odd = jnp.linalg.inv(B[1::2])  # [n/2, m, m]
    CL = C[0::2]   # C[2e]   : even 2e   -> odd 2e+1
    CRo = C[1::2]  # C[2e+1] : odd 2e+1  -> even 2e+2  (last is C[n-1] = 0)
    G = mm(CL, Binv_odd)                     # C[2e] Binv[2e+1]
    H = mm(jnp.swapaxes(CRo, -1, -2), Binv_odd)  # C[2e+1]^T Binv[2e+1]
    T = mm(H, CRo)                           # C^T Binv C (for even 2e+2)
    B_new = B[0::2] - mm(G, jnp.swapaxes(CL, -1, -2))
    B_new = B_new - jnp.concatenate([jnp.zeros_like(T[:1]), T[:-1]], axis=0)
    C_new = -mm(G, CRo)                      # even 2e -> even 2e+2
    R_odd = R[1::2]
    R_new = R[0::2] - mm(G, R_odd)
    HR = mm(H, R_odd)
    R_new = R_new - jnp.concatenate([jnp.zeros_like(HR[:1]), HR[:-1]], axis=0)
    y_even = _block_tridiag_solve(B_new, C_new, R_new, precision=hp)
    # back-substitute odds: y[2e+1] = Binv (r - CL^T y[2e] - CRo y[2e+2])
    y_next = jnp.concatenate([y_even[1:], jnp.zeros_like(y_even[:1])], axis=0)
    rhs_odd = (R_odd - mm(jnp.swapaxes(CL, -1, -2), y_even)
               - mm(CRo, y_next))
    y_odd = mm(Binv_odd, rhs_odd)
    # interleave
    out = jnp.zeros((n,) + y_even.shape[1:], dtype=y_even.dtype)
    out = out.at[0::2].set(y_even).at[1::2].set(y_odd)
    return out


def _block_tridiag_factor(B: jnp.ndarray, C: jnp.ndarray,
                          precision=None) -> list:
    """Factor phase of block cyclic reduction: per-level elimination tensors
    for `_block_tridiag_apply` with arbitrary later right-hand sides.

    Unlike precomputing a dense inverse (`_coarse_inverse_bcr`), the factors
    stay O(n m^2) — ~8 MB at (mx, my) = (200, 40) vs 256 MB for the dense
    [8000, 8000] inverse — so each application streams ~30x less HBM, and
    the solve is a direct structured elimination (backward-stable per level)
    instead of an f32 dense inverse whose Newton-Schulz polish stalls at
    n ~ 8000 on high-contrast coarse operators."""
    hp = precision or jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.einsum("nij,njk->nik", a, b, precision=hp)

    levels = []
    while B.shape[0] > 1:
        Binv_odd = jnp.linalg.inv(B[1::2])
        CL = C[0::2]
        CRo = C[1::2]
        G = mm(CL, Binv_odd)
        H = mm(jnp.swapaxes(CRo, -1, -2), Binv_odd)
        T = mm(H, CRo)
        B_new = B[0::2] - mm(G, jnp.swapaxes(CL, -1, -2))
        B_new = B_new - jnp.concatenate([jnp.zeros_like(T[:1]), T[:-1]], axis=0)
        C = -mm(G, CRo)
        levels.append((Binv_odd, G, H, CL, CRo))
        B = B_new
    levels.append(jnp.linalg.inv(B[0]))
    return levels


def _block_tridiag_apply(levels: list, R: jnp.ndarray,
                         precision=None) -> jnp.ndarray:
    """Solve with precomputed `_block_tridiag_factor` levels; R [n, m, N]."""
    hp = precision or jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.einsum("nij,njk->nik", a, b, precision=hp)

    stack = []
    for Binv_odd, G, H, CL, CRo in levels[:-1]:
        R_odd = R[1::2]
        HR = mm(H, R_odd)
        R = (R[0::2] - mm(G, R_odd)
             - jnp.concatenate([jnp.zeros_like(HR[:1]), HR[:-1]], axis=0))
        stack.append(R_odd)
    y = jnp.matmul(levels[-1], R[0], precision=hp)[None]
    for (Binv_odd, G, H, CL, CRo), R_odd in zip(reversed(levels[:-1]),
                                                reversed(stack)):
        y_next = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)
        rhs_odd = (R_odd - mm(jnp.swapaxes(CL, -1, -2), y)
                   - mm(CRo, y_next))
        y_odd = mm(Binv_odd, rhs_odd)
        out = jnp.zeros((2 * y.shape[0],) + y.shape[1:], dtype=y.dtype)
        y = out.at[0::2].set(y).at[1::2].set(y_odd)
    return y


def _factored_bcr_solve_from_blocks(B: jnp.ndarray, C: jnp.ndarray,
                                    mx: int, my: int,
                                    refine: int = 1) -> Callable:
    """Factored-CR solve from block-tridiagonal (B, C) directly (no dense
    E anywhere — the (400,80) coarse space at 3M DoF would densify to
    4 GB).  Blockwise symmetric diagonal scaling + `_block_tridiag_factor`;
    see `_coarse_inverse_bcr_factored` for the accuracy rationale."""
    hp = jax.lax.Precision.HIGHEST
    wdt = B.dtype
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.einsum("nii->ni", B)), 1e-30))
    d_next = jnp.concatenate([d[1:], jnp.ones_like(d[:1])], axis=0)
    Bs = (B / (d[:, :, None] * d[:, None, :])).astype(wdt)
    Cs = (C / (d[:, :, None] * d_next[:, None, :])).astype(wdt)
    n2 = 1 << (mx - 1).bit_length()
    if n2 != mx:
        eye = jnp.broadcast_to(jnp.eye(my, dtype=wdt), (n2 - mx, my, my))
        B2 = jnp.concatenate([Bs, eye])
        C2 = jnp.concatenate([Cs, jnp.zeros((n2 - mx, my, my), wdt)])
    else:
        B2, C2 = Bs, Cs
    levels = _block_tridiag_factor(B2, C2)
    Cp = jnp.concatenate([jnp.zeros_like(Cs[:1]), Cs[:-1]], axis=0)

    def tri_matvec(y, dt):
        yn = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)
        yp = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]], axis=0)
        return (jnp.einsum("nij,njk->nik", Bs.astype(dt), y, precision=hp)
                + jnp.einsum("nij,njk->nik", Cs.astype(dt), yn, precision=hp)
                + jnp.einsum("nji,njk->nik", Cp.astype(dt), yp, precision=hp))

    def solve(rc):
        rdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        nref = 0 if (rdt == jnp.float32 or wdt != jnp.float32) else refine
        r = (rc.reshape(mx, my) / d).astype(wdt)[:, :, None]
        if n2 != mx:
            r2 = jnp.concatenate([r, jnp.zeros((n2 - mx, my, 1), wdt)])
        else:
            r2 = r
        y = _block_tridiag_apply(levels, r2)[:mx]
        for _ in range(nref):
            res = (r.astype(rdt) - tri_matvec(y.astype(rdt), rdt)
                   ).astype(wdt)
            if n2 != mx:
                res = jnp.concatenate(
                    [res, jnp.zeros((n2 - mx, my, 1), wdt)])
            y = y + _block_tridiag_apply(levels, res)[:mx]
        return ((y[:, :, 0] / d).reshape(-1)).astype(rc.dtype)

    return solve


def _coarse_inverse_bcr_factored(E: jnp.ndarray, mx: int, my: int,
                                 refine: int = 1) -> Callable:
    """Coarse solve via factored block cyclic reduction (see
    `_block_tridiag_factor`): per-application direct solves on the
    diagonally-scaled operator.  Measured on a cond ~2e7 SPD
    block-tridiagonal: rel residual 1.3e-3 vs 8-20 (!) for the dense
    f32-inverse + Newton-Schulz paths, whose polish DIVERGES once the f32
    seed error reaches ||I - E X0|| >= 1 — the mechanism behind the round-3
    "exact (200,40) two-level converges worse" measurement.  ``refine``
    defect-correction passes run with an f64 residual when x64 is enabled
    (squaring the f32 solve error); in pure f32 they are skipped — the f32
    residual of a ~1e-3-accurate solve is noise-limited (measured worse)."""
    hp = jax.lax.Precision.HIGHEST
    wdt = E.dtype  # elimination dtype follows the operator (f32 production)
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(E)), 1e-30))
    Es = ((E / d[:, None]) / d[None, :]).astype(wdt)
    E4 = Es.reshape(mx, my, mx, my)
    ix = np.arange(mx)
    B = E4[ix, :, ix, :]
    C = jnp.concatenate(
        [E4[ix[:-1], :, ix[:-1] + 1, :], jnp.zeros((1, my, my), Es.dtype)])
    n2 = 1 << (mx - 1).bit_length()
    if n2 != mx:
        eye = jnp.broadcast_to(jnp.eye(my, dtype=Es.dtype), (n2 - mx, my, my))
        B2 = jnp.concatenate([B, eye])
        C2 = jnp.concatenate([C, jnp.zeros((n2 - mx, my, my), Es.dtype)])
    else:
        B2, C2 = B, C
    levels = _block_tridiag_factor(B2, C2)

    Cp = jnp.concatenate([jnp.zeros_like(C[:1]), C[:-1]], axis=0)

    def tri_matvec(y, dt):  # y [mx, my, 1] -> block-tridiag E_s y, dtype dt
        yn = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)
        yp = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]], axis=0)
        return (jnp.einsum("nij,njk->nik", B.astype(dt), y, precision=hp)
                + jnp.einsum("nij,njk->nik", C.astype(dt), yn, precision=hp)
                + jnp.einsum("nji,njk->nik", Cp.astype(dt), yp, precision=hp))

    def solve(rc):
        # refinement residuals in f64 when available: the f32 residual of a
        # ~1e-3-accurate first solve is itself noise-limited (measured:
        # refine in f32 makes accuracy WORSE), while one f64-residual pass
        # squares the error (~1e-3 -> ~1e-6) for the price of tiny
        # [n2, my, my] einsums.  The x64 flag is read HERE (apply/trace
        # time), not at build time: preconditioner builds run inside an
        # enable_x64(False) scope while the solve traces outside it.
        rdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        nref = 0 if (rdt == jnp.float32 or wdt != jnp.float32) else refine
        r = (rc / d).astype(wdt).reshape(mx, my, 1)
        if n2 != mx:
            r2 = jnp.concatenate([r, jnp.zeros((n2 - mx, my, 1), wdt)])
        else:
            r2 = r
        y = _block_tridiag_apply(levels, r2)[:mx]
        for _ in range(nref):
            res = (r.astype(rdt) - tri_matvec(y.astype(rdt), rdt)
                   ).astype(wdt)
            if n2 != mx:
                res = jnp.concatenate(
                    [res, jnp.zeros((n2 - mx, my, 1), wdt)])
            y = y + _block_tridiag_apply(levels, res)[:mx]
        return (y.reshape(-1) / d).astype(rc.dtype)

    return solve


def _coarse_inverse_bcr(E: jnp.ndarray, mx: int, my: int,
                        newton_schulz: int = 2) -> Callable:
    """Dense symmetrized inverse of the diagonally-scaled coarse operator
    via block cyclic reduction (the coarse lattice is block-tridiagonal
    with mx blocks of size my) + Newton-Schulz polish.  Replaces the
    panel-sequential jnp.linalg.inv LU, which dominates the preconditioner
    build wall-time on TPU."""
    hp = jax.lax.Precision.HIGHEST
    n_agg = mx * my
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(E)), 1e-30))
    Es = ((E / d[:, None]) / d[None, :]).astype(jnp.float32)
    E4 = Es.reshape(mx, my, mx, my)
    ix = np.arange(mx)
    B = E4[ix, :, ix, :]                     # [mx, my, my]
    C = jnp.concatenate(
        [E4[ix[:-1], :, ix[:-1] + 1, :], jnp.zeros((1, my, my), Es.dtype)])
    # pad mx to a power of two with decoupled identity blocks
    n2 = 1 << (mx - 1).bit_length()
    if n2 != mx:
        eye = jnp.broadcast_to(jnp.eye(my, dtype=Es.dtype), (n2 - mx, my, my))
        B = jnp.concatenate([B, eye])
        C = jnp.concatenate([C, jnp.zeros((n2 - mx, my, my), Es.dtype)])
    R = jnp.eye(n_agg, dtype=Es.dtype).reshape(mx, my, n_agg)
    if n2 != mx:
        R = jnp.concatenate([R, jnp.zeros((n2 - mx, my, n_agg), Es.dtype)])
    Einv = _block_tridiag_solve(B, C, R)[:mx].reshape(n_agg, n_agg)
    two_eye = 2.0 * jnp.eye(n_agg, dtype=jnp.float32)
    for _ in range(newton_schulz):
        EX = jnp.matmul(Es, Einv, precision=hp)
        Einv = jnp.matmul(Einv, two_eye - EX, precision=hp)
    Einv = 0.5 * (Einv + Einv.T)

    def solve(rc):
        y = jnp.matmul(Einv, (rc / d).astype(jnp.float32), precision=hp)
        return (y / d).astype(rc.dtype)

    return solve


def _coarse_inverse(E: jnp.ndarray, newton_schulz: int = 3) -> Callable:
    """Dense symmetrized inverse of the diagonally-scaled coarse operator
    (f32 LU + Newton-Schulz refinement; cf. la/deflation._coarse_inverse)."""
    hp = jax.lax.Precision.HIGHEST
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(E)), 1e-30))
    Es = ((E / d[:, None]) / d[None, :]).astype(jnp.float32)
    Einv = jnp.linalg.inv(Es)
    two_eye = 2.0 * jnp.eye(Es.shape[0], dtype=jnp.float32)
    for _ in range(newton_schulz):
        EX = jnp.matmul(Es, Einv, precision=hp)
        Einv = jnp.matmul(Einv, two_eye - EX, precision=hp)
    Einv = 0.5 * (Einv + Einv.T)

    def solve(rc):
        y = jnp.matmul(Einv, (rc / d).astype(jnp.float32), precision=hp)
        return (y / d).astype(rc.dtype)

    return solve


def _middle_inverse(bands1: dict, my1: int, mx1: int, macro_shape,
                    newton_schulz: int = 2, cheb_degree: int = 2,
                    cheb_ratio: float = 8.0,
                    dtype=jnp.float32) -> Optional[Callable]:
    """Approximate inverse of the middle-level stencil operator E1 (bands on
    an [my1, mx1] lattice): a balanced two-level preconditioner — Jacobi
    smoothing + exact (BCR dense) coarse solve on the ``macro_shape``
    aggregation — optionally wrapped in a degree-``cheb_degree`` Chebyshev
    polynomial of the preconditioned operator.  A fixed symmetric positive
    linear operator (NOT an inner Krylov solve), so the enclosing fine-level
    PCG stays a valid PCG."""
    return _multilevel_inverse(bands1, my1, mx1, [tuple(macro_shape)],
                               newton_schulz=newton_schulz,
                               cheb_degree=cheb_degree,
                               cheb_ratio=cheb_ratio, dtype=dtype)


def _multilevel_inverse(bands1: dict, my1: int, mx1: int, shapes,
                        newton_schulz: int = 2, cheb_degree: int = 2,
                        cheb_ratio: float = 8.0,
                        dtype=jnp.float32) -> Optional[Callable]:
    """Recursive generalization of :func:`_middle_inverse`: ``shapes`` is a
    list of successively coarser ``(mx, my)`` lattices; the LAST one is
    solved exactly (dense/BCR), every intermediate one by recursion.  Each
    level is the same balanced two-level operator (Jacobi smoothing + the
    next level's inverse as its coarse solve), optionally Chebyshev-wrapped
    — so the whole chain stays a fixed SPD operator and the enclosing PCG
    remains a valid PCG.

    Needed at 12M+ DoF: the single-mid hierarchy leaves a factor-8 gap
    between the mid lattice and the exact ``macro`` level (measured at
    12.3M: the 6-sweep refinement stalls at 2e-3 true residual); a factor-2
    chain keeps every gap <= 4."""
    mx2, my2 = int(shapes[0][0]), int(shapes[0][1])
    if mx1 % mx2 or my1 % my2:
        return None
    gy, gx = my1 // my2, mx1 // mx2
    bands2 = _aggregate_bands(bands1, my1, mx1, gy, gx)
    if len(shapes) == 1:
        E2 = _bands_to_dense(bands2, my2, mx2)
        if gx >= 2 and mx2 * my2 > 4096:
            coarse2_flat = _coarse_inverse_bcr_factored(E2, mx2, my2)
        elif gx >= 2:
            coarse2_flat = _coarse_inverse_bcr(E2, mx2, my2, newton_schulz)
        else:
            coarse2_flat = _coarse_inverse(E2, newton_schulz)

        def coarse2(r2d):  # [my2, mx2] -> [my2, mx2] via x-major flat solve
            return coarse2_flat(r2d.T.reshape(-1)).reshape(mx2, my2).T
    else:
        coarse2 = _multilevel_inverse(bands2, my2, mx2, shapes[1:],
                                      newton_schulz=newton_schulz,
                                      cheb_degree=cheb_degree,
                                      cheb_ratio=cheb_ratio, dtype=dtype)
        if coarse2 is None:
            return None
    E1mv = _band_matvec(bands1)
    d1 = bands1[(0, 0)]
    Dinv = jnp.where(d1 != 0, 1.0 / jnp.where(d1 != 0, d1, 1.0), 0.0)

    def aggsum2(r):  # [my1, mx1] -> [my2, mx2]
        return r.reshape(my2, gy, mx2, gx).sum(axis=(1, 3))

    def bcast2(yc):  # [my2, mx2] -> [my1, mx1]
        return jnp.broadcast_to(
            yc[:, None, :, None], (my2, gy, mx2, gx)).reshape(my1, mx1)

    def Q2(r):
        return bcast2(coarse2(aggsum2(r)))

    def P1(r):
        qr = Q2(r)
        s = Dinv * (r - E1mv(qr))
        return qr + s - Q2(E1mv(s))

    if cheb_degree < 2:
        return P1
    lmax = _power_lambda_max(E1mv, P1, (my1, mx1), dtype)
    return _cheb_apply(E1mv, P1, cheb_degree, lmax, ratio=cheb_ratio)


def stencil_deflation_preconditioner(
    A: StencilBlockEll,
    macro_shape,
    smoother: Optional[Callable] = None,
    newton_schulz: int = 3,
    use_az: bool = True,
    mid_shape=None,
    mid_cheb: int = 2,
    weight: Optional[jnp.ndarray] = None,
) -> Optional[Callable]:
    """Balanced two- or three-level preconditioner, all ops regular in the
    plane layout:

        M^-1 r = Q r + (I - Q A) S (I - A Q) r,   Q = Z E^-1 Z^T.

    With ``use_az`` the A-projections ride precomputed AZ planes
    (AZ[s,i] = sum_j W[s,i,j], ~1/3 of the operator bytes) instead of full
    matvecs: A(Qr) = sum_s AZ[s] * roll_s(broadcast(yc)), and
    Z^T A s = aggsum_s(roll_s^-1(AZ[s] . s)) by symmetry of the pairing.

    ``mid_shape=(mx1, my1)``: THREE-level mode for large lattices, where the
    ``macro_shape`` coarse space alone degrades (H/h >= 8).  Z projects onto
    the finer mid_shape aggregation, whose Galerkin operator E1 is a 9-point
    scalar stencil applied with rolls (``_stencil_bands``); E1 is "inverted"
    by a fixed Jacobi + exact-``macro_shape``-coarse two-level operator,
    optionally Chebyshev-accelerated (``mid_cheb``) — so M stays a fixed
    SPD operator and the outer iteration remains plain PCG.  mid_shape must
    tile the lattice and be a multiple of macro_shape.  A SEQUENCE of
    shapes ``[(mx1, my1), (mx2, my2), ...]`` builds the full multi-level
    chain (``_multilevel_inverse``): each intermediate lattice is handled
    by Jacobi + the next level, the ``macro_shape`` level stays the exact
    solve — needed at 12M+ DoF where one mid leaves a factor-8 gap.

    ``weight`` [nd, 8, KY, KX]: per-dof weights of the deflation space
    Z_w = diag(w) Z (each coarse vector = w restricted to an aggregate
    instead of the indicator).  A symmetrically diagonal-scaled system
    S A S (``scale_planes``) no longer has constants as its near-kernel —
    the physical near-kernel (locally constant functions) maps to
    D^{1/2} 1 under the scaling; pass weight = sqrt(diag A) = 1/s to
    restore it.  On high-contrast coefficients (SPE10) the unweighted
    coarse space misses the near-kernel entirely (measured kappa(M A) ~
    4e3 at H/h = 2); the weighted space removes that floor.  All coarser
    levels stay unweighted constants (the Galerkin image of Z_w already
    carries the weights).
    """
    # weighted pairing sums P_w[s,k] = sum_ij w_i W[s,i,j] w_j(neighbour)
    # and weighted AZ planes AZ_w[s,i] = sum_j W[s,i,j] w_j(neighbour):
    # E = Z_w^T A Z_w and A Z_w ride the same machinery as the unweighted
    # constants (w = 1 reproduces planes.sum / row_sums exactly).
    Pw = None
    if weight is not None:
        wnbr = A.neighbor_fields(weight)  # [4][nd, 8, KY, KX]
        Pw = jnp.stack([
            (weight[:, None] * A.planes[s] * wnbr[s][None, :]).sum(axis=(0, 1))
            for s in range(4)
        ])  # [4, 8, KY, KX]
    if mid_shape is not None:
        mids = ([tuple(mid_shape)] if isinstance(mid_shape[0], (int, np.integer))
                else [tuple(m) for m in mid_shape])
        agg = _aggregation2d(A, mids[0])
        if agg is None:
            return None
        bands1 = _stencil_bands(A, agg, Pw)
        coarse = _multilevel_inverse(bands1, agg.my, agg.mx,
                                     mids[1:] + [tuple(macro_shape)],
                                     newton_schulz=newton_schulz,
                                     cheb_degree=mid_cheb,
                                     dtype=A.planes.dtype)
        if coarse is None:
            return None
        if smoother is None:
            smoother = jacobi_smoother(A)
    else:
        agg = _aggregation(A, macro_shape)
        if agg is None:
            return None
        if smoother is None:
            smoother = jacobi_smoother(A)
        if agg.fx >= 2 and agg.mx * agg.my > 4096:
            # large coarse space: never densify (the (400,80) coarse at 3M
            # would be a 4 GB dense E); the precomputed dense inverse would
            # also stream n_agg^2 f32 per application (256 MB at (200,40))
            # and its f32 LU/CR + Newton-Schulz polish loses accuracy on
            # high-contrast operators at n ~ 8000 — bands -> block-tridiag
            # -> factored-CR direct solves
            bands = _coarse_bands(A, agg, Pw)
            Bb, Cb = _bands_to_blocktridiag(bands, agg.mx, agg.my)
            coarse = _factored_bcr_solve_from_blocks(Bb, Cb, agg.mx, agg.my)
        elif agg.fx >= 2:
            E = _coarse_E_banded(A, agg, Pw)
            # block-cyclic-reduction inverse: with >=2 fine cells per
            # aggregate in x the |dx|<=2 stencil shifts cross at most ONE
            # macro boundary, so the coarse lattice is block-tridiagonal
            # ([mx] blocks of [my]; any vy coupling stays inside a dense
            # my x my block); batched-matmul CR beats the sequential LU ~10x
            coarse = _coarse_inverse_bcr(E, agg.mx, agg.my, newton_schulz)
        else:
            # fx == 1: |dx|=2 shifts produce +-2 macro-column couplings that
            # BCR would silently drop — use the dense LU inverse instead
            E = _coarse_E_banded(A, agg, Pw)
            coarse = _coarse_inverse(E, newton_schulz)
    nd = A.nd

    def wsum(R):
        """Z_w^T R: weighted aggregate sums (w = 1 when unweighted)."""
        return agg.aggsum(R if weight is None else R * weight)

    def wbcast(yc, shape):
        """Z_w yc in the full [nd, 8, KY, KX] layout."""
        g = jnp.broadcast_to(agg.broadcast(yc)[None], shape)
        return g if weight is None else g * weight

    if not use_az:
        def apply_balanced(R):
            yc = coarse(wsum(R))
            Qr = wbcast(yc, R.shape)
            s = smoother(R - A.matvec(Qr))
            zas = coarse(wsum(A.matvec(s)))
            return Qr + s - wbcast(zas, R.shape)

        return apply_balanced

    if weight is None:
        AZ = A.row_sums()  # [4, nd, 8, KY, KX]
    else:
        AZ = jnp.stack([(A.planes[s] * wnbr[s][None, :]).sum(axis=1)
                        for s in range(4)])
    plan = A.plan

    def a_broadcast(yc):
        """A (Z yc) [nd, 8, KY, KX] via AZ planes + rolled broadcast."""
        B0 = agg.broadcast(yc)  # [8, KY, KX]
        out = AZ[0] * B0[None]
        for s in range(3):
            per_k = []
            for k in range(8):
                ks, dy, dx = plan[k][s]
                per_k.append(jnp.roll(B0[ks], shift=(-dy, -dx), axis=(0, 1)))
            Bs = jnp.stack(per_k, axis=0)  # [8, KY, KX]
            out = out + AZ[s + 1] * Bs[None]
        return out

    def zt_a(Svec):
        """Z^T A s via AZ planes: scatter each slot's pairing back to the
        neighbour's lattice position with the inverse roll, then aggsum."""
        P0 = (AZ[0] * Svec).sum(axis=0)  # [8, KY, KX]
        total = P0
        for s in range(3):
            Ps = (AZ[s + 1] * Svec).sum(axis=0)  # [8, KY, KX]
            out_k = [None] * 8
            for k in range(8):
                ks, dy, dx = plan[k][s]
                contrib = jnp.roll(Ps[k], shift=(dy, dx), axis=(0, 1))
                out_k[ks] = contrib if out_k[ks] is None else out_k[ks] + contrib
            # every slot's k -> k_src map is a bijection for the NVB
            # subclass structure; assert at trace time
            assert all(o is not None for o in out_k), "slot map not bijective"
            total = total + jnp.stack(out_k, axis=0)
        return agg.aggsum(total)

    def apply_balanced_az(R):
        yc = coarse(wsum(R))
        Qr = wbcast(yc, R.shape)
        s = smoother(R - a_broadcast(yc))
        zas = zt_a(s)
        return Qr + s - wbcast(coarse(zas), R.shape)

    return apply_balanced_az


# -- mixed-precision refined PCG ---------------------------------------------


def stencil_pcg(A: StencilBlockEll, B: jnp.ndarray, M: Callable,
                rtol: float = 1e-5, maxiter: int = 150,
                unroll: int = 4, dot_dtype=None, vec_dtype=None):
    """f32 PCG in SoA layout; returns (X, iterations).  The rhs is assumed
    pre-scaled to ||B|| = 1 so the recurrence residual is relative.

    Mixed-precision knobs (3M-DoF forensics, scripts/diag_3m_precision.py:
    plain f32 needs 1500 inner iterations where all-f64 needs 422 — the f32
    Krylov *vector recurrence* is the wall, not the matvec or the
    preconditioner):

    ``vec_dtype``: dtype of the Krylov vectors X/R/Z/P and their axpy
    updates.  f64 vectors with the matvec and preconditioner still applied
    in A's dtype recover the f64 iteration count (vec64 cell: 800 vs 1500),
    while on TPU emulated-f64 axpys cost only ~1.36x f32 and the matvec
    stays f32.  Requires jax_enable_x64.

    ``dot_dtype``: accumulation dtype for the three inner products.  On TPU
    an emulated-f64 dot reduction is ~12x f32 (the one pathological f64
    op), so dots default to A's dtype; f64 dots alone do NOT fix true
    progress (dots64 cell: recurrence converges but true residual stalls at
    3.8e-2).  WARNING: at 12M DoF the emulated-f64 dot reduction CRASHED
    the TPU worker process (kernel fault, 2026-08-19, bench_sweep12m
    sweep-4 log) — do not enable at 10+ bisections."""
    adt = B.dtype          # matvec / preconditioner dtype
    vdt = vec_dtype or adt  # Krylov vector dtype
    mixed = vdt != adt
    B = B.astype(vdt)
    X = jnp.zeros_like(B)
    Z = M(B.astype(adt) if mixed else B).astype(vdt)
    P = Z
    dt = dot_dtype or adt

    def vdot(a, b):
        return jnp.vdot(a.astype(dt), b.astype(dt))

    rz = vdot(B, Z)
    R = B
    stop2 = jnp.asarray(rtol * rtol, dtype=dt)
    zero = jnp.asarray(0.0, dtype=dt)
    one_ = jnp.asarray(1.0, dtype=dt)

    def cond(state):
        X, R, Z, P, rz, k = state
        return (vdot(R, R) > stop2) & (k < maxiter)

    def one(state):
        X, R, Z, P, rz, k = state
        AP = A.matvec(P.astype(adt) if mixed else P).astype(vdt)
        pap = vdot(P, AP)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, one_),
                          zero).astype(vdt)
        X = X + alpha * P
        R = R - alpha * AP
        Z = M(R.astype(adt) if mixed else R).astype(vdt)
        rz_new = vdot(R, Z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, one_),
                         zero).astype(vdt)
        P = Z + beta * P
        return X, R, Z, P, rz_new, k + 1

    def step(state):
        for _ in range(max(1, int(unroll))):
            state = one(state)
        return state

    out = jax.lax.while_loop(cond, step, (X, R, Z, P, rz, jnp.int32(0)))
    return out[0], out[5]


def stencil_refined_solve(
    A: StencilBlockEll,
    B: jnp.ndarray,
    M: Callable,
    tol: float = 1e-6,
    inner_iters: int = 150,
    inner_rtol: float = 1e-5,
    outer_max: int = 6,
    unroll: int = 4,
    dot_dtype=None,
    vec_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """f32 deflated PCG inside f64 iterative refinement (the exact image of
    la/deflation.refined_deflated_solve in the plane layout).  Returns
    (X float64, true relative residual, total inner iterations).  Requires
    jax_enable_x64 for the outer residual.  ``dot_dtype``/``vec_dtype``
    forward to `stencil_pcg` (f64 Krylov vectors fix the large-size f32
    iteration blowup; see its docstring)."""
    f32 = jnp.float32
    A64 = A.astype(jnp.float64)
    B64 = B.astype(jnp.float64)
    bnorm = jnp.linalg.norm(B64)
    target = tol * jnp.maximum(bnorm, 1e-300)
    # NOTE (round-5 negative result): updating the outer residual
    # INCREMENTALLY with the f32 matvec of the correction (R <- R - scale *
    # A32 dX) to skip the per-sweep emulated-f64 matvec does NOT work: the
    # increment's error is eps32 * ||A|| * ||dX|| ~ eps32 * kappa(S A S) *
    # scale — the very floor the f64 recompute exists to escape (measured:
    # 768k-class tests stall at 7e-5).  The exact f64 recompute each sweep
    # IS the engine of the iterative refinement.

    def cond(state):
        X, R64, rnorm, k, it = state
        return (rnorm > target) & (k < outer_max)

    def body(state):
        # carry the f64 residual across sweeps: rnorm == ||R64|| by
        # construction, so each sweep costs ONE emulated-f64 matvec (the
        # end-of-sweep true residual), not two
        X, R64, rnorm, k, it = state
        scale = rnorm
        dX, ki = stencil_pcg(A, (R64 / scale).astype(f32), M,
                             rtol=inner_rtol, maxiter=inner_iters,
                             unroll=unroll, dot_dtype=dot_dtype,
                             vec_dtype=vec_dtype)
        X = X + dX.astype(jnp.float64) * scale
        R64 = B64 - A64.matvec(X)
        rnorm = jnp.linalg.norm(R64)
        return X, R64, rnorm, k + 1, it + ki

    X0 = jnp.zeros_like(B64)
    X, _R, rnorm, k, it = jax.lax.while_loop(
        cond, body, (X0, B64, bnorm, jnp.int32(0), jnp.int32(0)))
    return X, rnorm / jnp.maximum(bnorm, 1e-300), it
