"""Batched element/face integral kernels + global assembly.

TPU-native replacement for the GDT SystemAssembler grid walk (reference:
cg.hh:191-334, swipdg.hh:222-508 — the HOT assembly loops of survey 3.1/3.2).
Instead of walking entities and applying local C++ kernels, every integral is
a vmapped einsum over static cell/face batches; global matrices materialize
through SparsityPattern.assemble (sorted segment_sum, no scatter contention).

All kernels are pure jnp functions of the coefficient Functions, so each
affine component's matrix/vector is one jitted evaluation and the whole
affine family shares one sparsity pattern.
"""
from __future__ import annotations


from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..affine import AffineDecomposition
from ..functions.base import Function
from ..grid.structured import Grid, INTERVAL, TRIANGLE
from ..la.sparse import SparseMatrix, SparsityPattern, build_pattern
from ..parameters import ProductFunctional
from .quadrature import edge_rule, quad_rule, tri_rule
from .spaces import Space

__all__ = [
    "cell_quadrature",
    "face_quadrature",
    "volume_pattern",
    "elliptic_cell_matrices",
    "l2_cell_matrices",
    "force_cell_vectors",
    "boundary_face_functional",
    "boundary_face_l2_matrices",
    "scatter_cell_vectors",
    "assemble_cell_matrix",
    "diffusion_pairs",
]


def _cacheable(*arrays) -> bool:
    """Only cache concrete arrays — inside a jit trace the same computation
    yields tracers, and stashing those leaks them across traces."""
    import jax.core

    return not any(isinstance(a, jax.core.Tracer) for a in arrays)


def _float_tag() -> str:
    """Ambient default float dtype — part of every cache key so a process
    that mixes x64 and non-x64 traces (e.g. the bench's f32 assembly inside
    an f64 refinement solve) never serves a stale-dtype cached array."""
    return jnp.result_type(float).name


def cell_quadrature(grid: Grid, order: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Physical quadrature: points [NC, k, 2], weights [NC, k] (incl. |J|).
    Cached per (grid, order) — shared by every affine component's kernel."""
    from ..grid.tensor import TensorGrid

    if isinstance(grid, TensorGrid):  # d-generic Q1 path (ops/tensor_space.py)
        from .tensor_space import tensor_cell_quadrature

        return tensor_cell_quadrature(grid, order)
    key = ("_cell_quadrature", int(order), _float_tag())
    cached = grid.__dict__.get(key)
    if cached is not None:
        return cached
    out = _cell_quadrature_impl(grid, order)
    if _cacheable(*out):
        grid.__dict__[key] = out
    return out


def _cell_quadrature_impl(grid: Grid, order: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    verts = jnp.asarray(grid.cell_vertices)
    if grid.cell_type == INTERVAL:
        t, w = edge_rule(order)
        t = jnp.asarray(t)
        w = jnp.asarray(w)
        v0, v1 = verts[:, 0, :], verts[:, 1, :]
        qp = v0[:, None, :] + t[None, :, None] * (v1 - v0)[:, None, :]
        length = jnp.abs((v1 - v0)[:, 0])
        return qp, w[None, :] * length[:, None]
    if grid.cell_type == TRIANGLE:
        ref, w = tri_rule(order)
        ref = jnp.asarray(ref)
        w = jnp.asarray(w)
        v0 = verts[:, 0, :]
        e1 = verts[:, 1, :] - v0
        e2 = verts[:, 2, :] - v0
        qp = (
            v0[:, None, :]
            + ref[None, :, 0:1] * e1[:, None, :]
            + ref[None, :, 1:2] * e2[:, None, :]
        )
        detj = jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        qw = 2.0 * w[None, :] * detj[:, None] * 0.5  # w sums to 1/2; |J| = 2*area
        return qp, qw
    ref, w = quad_rule(order)
    ref = jnp.asarray(ref)
    w = jnp.asarray(w)
    lo = verts[:, 0, :]
    ext = verts[:, 2, :] - lo
    qp = lo[:, None, :] + ref[None, :, :] * ext[:, None, :]
    area = jnp.abs(ext[:, 0] * ext[:, 1])
    qw = w[None, :] * area[:, None]
    return qp, qw


def face_quadrature(
    grid: Grid, order: int, face_ids: Optional[np.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Points [F, k, dim] and weights [F, k] (incl. face length) on faces."""
    fv = jnp.asarray(grid.face_vertices)
    if face_ids is not None:
        fv = fv[jnp.asarray(face_ids)]
    if grid.cell_type == INTERVAL:
        # point faces: integrals over a face are point evaluations (weight 1;
        # the penalty length scale lives in grid.face_volumes, not here)
        return fv[:, :1, :], jnp.ones(fv.shape[:1] + (1,))
    t, w = edge_rule(order)
    t = jnp.asarray(t)
    w = jnp.asarray(w)
    a, b = fv[:, 0, :], fv[:, 1, :]
    qp = a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]
    length = jnp.linalg.norm(b - a, axis=-1)
    return qp, w[None, :] * length[:, None]


# -- local (per-cell) kernels ----------------------------------------------


def cell_shape_values(space: Space, qorder: int) -> jnp.ndarray:
    """[NC, k, nd] basis values at the cell quadrature points (cached)."""
    key = ("_cell_shape_values", int(qorder), _float_tag())
    cached = space.__dict__.get(key)
    if cached is not None:
        return cached
    qp, _ = cell_quadrature(space.grid, qorder)
    out = space.shape_values(jnp.asarray(space.grid.cell_vertices), qp)
    if _cacheable(out):
        space.__dict__[key] = out
    return out


def cell_shape_gradients(space: Space, qorder: int) -> jnp.ndarray:
    """[NC, k, nd, 2] basis gradients at the cell quadrature points (cached)."""
    key = ("_cell_shape_gradients", int(qorder), _float_tag())
    cached = space.__dict__.get(key)
    if cached is not None:
        return cached
    qp, _ = cell_quadrature(space.grid, qorder)
    out = space.shape_gradients(jnp.asarray(space.grid.cell_vertices), qp)
    if _cacheable(out):
        space.__dict__[key] = out
    return out


def elliptic_cell_matrices(
    space: Space,
    diffusion_factor: Function,
    diffusion_tensor: Function,
    order: Optional[int] = None,
) -> jnp.ndarray:
    """[NC, nd, nd] local stiffness: int lam (kappa grad phi_j) . grad phi_i
    (EllipticCG/EllipticSWIPDG volume kernel, cg.hh:223-247)."""
    grid = space.grid
    # GDT integrand order (coefficient orders + gradient orders p-1) plus 2
    # over-integration: the published parametric values were shown to be
    # insensitive to this (orders 3->12 move eta_DF by <0.2%, docs/DESIGN.md
    # section 3.2), so we lock the better-converged choice
    qorder = order if order is not None else diffusion_factor.order + diffusion_tensor.order + 2 * (space.order - 1) + 2
    qp, qw = cell_quadrature(grid, qorder)
    grads = cell_shape_gradients(space, qorder)  # [NC, k, nd, 2]
    return elliptic_cells_core(qp, qw, grads, diffusion_factor, diffusion_tensor)


def elliptic_cells_core(qp, qw, grads, diffusion_factor, diffusion_tensor):
    """Array-form elliptic volume kernel (pure jnp on the given quadrature /
    gradient arrays — usable inside shard_map for per-device assembly)."""
    lam = diffusion_factor(qp)  # [NC, k]
    kap = diffusion_tensor(qp)  # [NC, k, 2, 2]
    flux = jnp.einsum("ckab,ckjb->ckja", kap, grads)
    return jnp.einsum("ck,ckia,ckja->cij", qw * lam, grads, flux)


def l2_cell_matrices(
    space: Space, weight: Optional[Function] = None, order: Optional[int] = None
) -> jnp.ndarray:
    """[NC, nd, nd] local mass matrices (weighted L2 product)."""
    grid = space.grid
    worder = weight.order if weight is not None else 0
    qorder = order if order is not None else 2 * space.order + worder
    qp, qw = cell_quadrature(grid, qorder)
    vals = cell_shape_values(space, qorder)  # [NC, k, nd]
    wq = qw * weight(qp) if weight is not None else qw
    return jnp.einsum("ck,cki,ckj->cij", wq, vals, vals)


def force_cell_vectors(space: Space, f: Function, order: Optional[int] = None) -> jnp.ndarray:
    """[NC, nd] local L2-volume functionals int f phi_i (cg.hh:249-271)."""
    grid = space.grid
    qorder = order if order is not None else f.order + space.order + 1
    qp, qw = cell_quadrature(grid, qorder)
    vals = cell_shape_values(space, qorder)
    return jnp.einsum("ck,cki->ci", qw * f(qp), vals)


def boundary_face_functional(
    space: Space, g: Function, face_ids: np.ndarray, order: Optional[int] = None
) -> jnp.ndarray:
    """Global vector of int_e g phi_i over the given boundary faces
    (Neumann L2-face functional, cg.hh:273-289)."""
    grid = space.grid
    if len(face_ids) == 0:
        return jnp.zeros(space.num_dofs)
    qorder = order if order is not None else g.order + space.order + 1
    qp, qw = face_quadrature(grid, qorder, face_ids)
    inside = grid.face_cells[np.asarray(face_ids), 0]
    verts = jnp.asarray(grid.cell_vertices[inside])
    vals = space.shape_values(verts, qp)  # [F, k, nd]
    local = jnp.einsum("fk,fki->fi", qw * g(qp), vals)
    dofs = space.cell_dofs[inside]
    return scatter_cell_vectors(local, dofs, space.num_dofs)


def boundary_face_l2_matrices(
    space: Space, face_ids: np.ndarray, weight_fn: Optional[Callable] = None,
    order: Optional[int] = None,
) -> jnp.ndarray:
    """[F, nd, nd] local face L2 matrices int_e w phi_i phi_j on the inside
    cell's basis (boundary_l2 / penalty products, swipdg.hh:358-508).

    ``weight_fn(face_ids, qp)`` may supply a per-face weight field (e.g. the
    SWIPDG penalty sigma/h)."""
    grid = space.grid
    qorder = order if order is not None else 2 * space.order + 1
    qp, qw = face_quadrature(grid, qorder, face_ids)
    inside = grid.face_cells[np.asarray(face_ids), 0]
    verts = jnp.asarray(grid.cell_vertices[inside])
    vals = space.shape_values(verts, qp)
    w = qw if weight_fn is None else qw * weight_fn(face_ids, qp)
    return jnp.einsum("fk,fki,fkj->fij", w, vals, vals)


# -- global assembly --------------------------------------------------------


def scatter_cell_vectors(local: jnp.ndarray, dofs: np.ndarray, num_dofs: int) -> jnp.ndarray:
    """[B, nd] local vectors + [B, nd] dof map -> [num_dofs] global vector."""
    out = jnp.zeros(num_dofs, dtype=local.dtype)
    return out.at[jnp.asarray(dofs).reshape(-1)].add(local.reshape(-1))


def volume_pattern(space: Space) -> SparsityPattern:
    """Sparsity pattern of cell-local couplings (the CG/DG volume pattern).
    Cached per Space instance."""
    cached = space.__dict__.get("_volume_pattern")
    if cached is None:
        dofs = space.cell_dofs
        nd = dofs.shape[1]
        rows = np.repeat(dofs, nd, axis=1)  # entry (c,i,j) -> flat c*nd*nd + i*nd + j
        cols = np.tile(dofs, (1, nd))
        cached = build_pattern(rows, cols, (space.num_dofs, space.num_dofs))
        space.__dict__["_volume_pattern"] = cached
    return cached


def assemble_cell_matrix(
    space: Space, local: jnp.ndarray, pattern: Optional[SparsityPattern] = None
) -> SparseMatrix:
    """[NC, nd, nd] local matrices -> global SparseMatrix on the volume pattern."""
    pattern = pattern or volume_pattern(space)
    # raw entry order must match volume_pattern: rows repeat i, cols tile j —
    # entry (c, i, j) flattens to c*nd*nd + i*nd + j
    vals = pattern.assemble(local.reshape(-1))
    return SparseMatrix(pattern, vals)


def diffusion_pairs(problem) -> AffineDecomposition:
    """Expand (diffusion_factor x diffusion_tensor) into a single affine
    family of (factor_fn, tensor_fn) payload pairs with product coefficients.

    The reference assembles one elliptic operator per diffusion_factor
    component with the (nonparametric) tensor (cg.hh:223-247); this
    generalization also covers a parametric tensor.
    """
    factor = problem.diffusion_factor
    tensor = problem.diffusion_tensor
    out = AffineDecomposition()
    f_parts = [(c, factor.coefficients[q]) for q, c in enumerate(factor.components)]
    if factor.affine_part is not None:
        f_parts.append((factor.affine_part, None))
    t_parts = [(c, tensor.coefficients[q]) for q, c in enumerate(tensor.components)]
    if tensor.affine_part is not None:
        t_parts.append((tensor.affine_part, None))
    for ffn, fcoef in f_parts:
        for tfn, tcoef in t_parts:
            if fcoef is None and tcoef is None:
                out.register_affine_part((ffn, tfn))
            elif fcoef is None:
                out.register_component((ffn, tfn), tcoef)
            elif tcoef is None:
                out.register_component((ffn, tfn), fcoef)
            else:
                out.register_component((ffn, tfn), ProductFunctional(fcoef, tcoef))
    return out
