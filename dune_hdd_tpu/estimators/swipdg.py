"""ESV2007 a-posteriori error estimators for SWIPDG (P1, simplicial grids).

TPU-native re-design of estimators/swipdg.hh (reference:
dune/hdd/linearelliptic/estimators/swipdg.hh:57-985).  The reference's
grid-walker functors become batched kernels:

* eta_NC_ESV2007 — energy norm of u_h - Oswald(u_h); the Oswald
  interpolation (DG->conforming vertex averaging with zero Dirichlet values,
  GDT::Operators::OswaldInterpolation, used at swipdg.hh:149-150) is one
  segment-mean over (cell, vertex) incidences.
* eta_R_ESV2007 — Poincare-weighted element residual:
  eta_R_T^2 = cutoff_T ||f - P0 f||_T^2,
  cutoff_T = h_T^2 / (pi^2 min_eig(lambda kappa)|_T)
  (Stuff::Functions::ESV2007::Cutoff; constant spelled out at
  estimators/block-swipdg.hh:288-309).
* eta_R_ESV2007_* — cutoff_T ||f - div t_h||_T^2 with t_h the RTN0 flux.
* eta_DF_ESV2007 — ||lambda(mu) kappa grad u_h + t_h||_{(lambda(mu_hat) kappa)^{-1}, T}
  with t_h in RTN0 reconstructed from the SWIPDG numerical flux
  (GDT::Operators::DiffusiveFluxReconstruction, swipdg.hh:426-431).
* eta_ESV2007 = sqrt( sum_T [ eta_NC_T^2 + (eta_R_T + eta_DF_T)^2 ] )
  (swipdg.hh:679-685); eta_ESV2007_alt = sqrt(sum NC^2) + sqrt(sum R^2) +
  sqrt(sum DF^2) (swipdg.hh:745-815).

``estimate`` returns the global value; ``estimate_local`` per-element squared
indicators scaled by 1/eta^2 like the reference (swipdg.hh:700-719).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..functions.base import Function, freeze_function
from ..grid.boundaryinfo import BoundaryInfo
from ..grid.structured import Grid, TRIANGLE
from ..ops.assembly import cell_quadrature, face_quadrature
from ..ops.norms import evaluate_discrete, evaluate_discrete_gradient
from ..ops.spaces import Space
from ..ops.swipdg import boundary_sigma, default_beta, inner_sigma

__all__ = ["SWIPDGEstimators", "oswald_interpolation", "rt0_flux_reconstruction",
           "rt0_evaluate", "rt0_divergence", "min_diffusion_eigenvalue"]

POINCARE = 1.0 / (math.pi**2)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def oswald_interpolation(space: Space, u: jnp.ndarray,
                         dirichlet_vertices: np.ndarray) -> jnp.ndarray:
    """DG-P1 -> conforming-P1 vertex averaging; zero on Dirichlet vertices.
    Returns vertex values [NV]."""
    assert space.basis == "nodal" and not space.continuous
    grid = space.grid
    vert_ids = jnp.asarray(grid.cells.astype(np.int64))  # [NC, nd]
    vals = u[jnp.asarray(space.cell_dofs)]  # [NC, nd]
    nv = grid.num_vertices
    sums = jnp.zeros(nv, dtype=u.dtype).at[vert_ids.reshape(-1)].add(vals.reshape(-1))
    counts = jnp.zeros(nv, dtype=u.dtype).at[vert_ids.reshape(-1)].add(1.0)
    avg = sums / counts
    return jnp.where(jnp.asarray(dirichlet_vertices), 0.0, avg)


def min_diffusion_eigenvalue(lam_fn: Function, kap_fn: Function, grid: Grid,
                             qorder: int = 2) -> jnp.ndarray:
    """Per-cell min eigenvalue of lambda*kappa sampled at quadrature points
    (the reference's Minimum helpers, estimators/block-swipdg.hh:41-103,
    replacing the Eigen eigensolver with the closed-form symmetric 2x2)."""
    qp, _ = cell_quadrature(grid, qorder)
    lam = lam_fn(qp)
    kap = kap_fn(qp)
    mat = lam[..., None, None] * kap
    a, b = mat[..., 0, 0], mat[..., 0, 1]
    c, d = mat[..., 1, 0], mat[..., 1, 1]
    disc = jnp.sqrt(jnp.maximum((a - d) ** 2 + 4.0 * b * c, 0.0))
    ev_min = 0.5 * (a + d - disc)
    return jnp.min(ev_min, axis=1)


def _side_data(space: Space, cells: np.ndarray, qp: jnp.ndarray,
               u: jnp.ndarray, lam_fn: Function, kap_fn: Function,
               n: jnp.ndarray, wlam_fn: Optional[Function] = None,
               wkap_fn: Optional[Function] = None):
    """(u_h at qp [F,k], normal diffusive flux of u_h [F,k], delta [F,k]);
    delta (weights/penalty ingredient) uses the weighting diffusion when
    given (the scheme's fixed penalty diffusion for parametric problems)."""
    grid = space.grid
    verts = jnp.asarray(grid.cell_vertices[cells])
    cent = jnp.asarray(grid.cell_centroids[cells])
    shifted = qp + 1e-7 * (cent[:, None, :] - qp)
    vals = space.shape_values(verts, qp)
    grads = space.shape_gradients(verts, qp)
    u_loc = u[jnp.asarray(space.cell_dofs)[jnp.asarray(cells)]]
    uh = jnp.einsum("fki,fi->fk", vals, u_loc)
    grad_uh = jnp.einsum("fkia,fi->fka", grads, u_loc)
    lam = lam_fn(shifted)
    kap = kap_fn(shifted)
    tau = lam[..., None, None] * kap
    flux = jnp.einsum("fkab,fkb,fa->fk", tau, grad_uh, n)
    if wlam_fn is not None and wlam_fn is not lam_fn:
        wtau = wlam_fn(shifted)[..., None, None] * (wkap_fn or kap_fn)(shifted)
    else:
        wtau = tau
    delta = jnp.einsum("fa,fkab,fb->fk", n, wtau, n)
    return uh, flux, delta


def rt0_flux_reconstruction(
    space: Space,
    u: jnp.ndarray,
    lam_fn: Function,
    kap_fn: Function,
    dirichlet_faces: np.ndarray,
    neumann_faces: np.ndarray,
    g_d: Optional[Function] = None,
    g_n: Optional[Function] = None,
    qorder: int = 4,
    weight_lam_fn: Optional[Function] = None,
    weight_kap_fn: Optional[Function] = None,
) -> jnp.ndarray:
    """Mean normal flux per face [NF] (along the global inside->outside
    normal) of the RTN0 diffusive-flux reconstruction t_h of -lam kap grad u:

      interior:  t.n = -{lam kap grad u_h . n}_w + pen_e [u_h]
      dirichlet: t.n = -lam kap grad u_h . n + pen_b (u_h - g_d)
      neumann:   t.n = -g_n  (Neumann data prescribes lam kap grad u . n = g_n)

    The penalty signs make t locally conservative: testing the SWIPDG form
    with 1_T gives sum_e int_e t.n_out = int_T f exactly, hence
    div t_h = P0 f elementwise.
    """
    grid = space.grid
    sigma_i, sigma_b = inner_sigma(space.order), boundary_sigma(space.order)
    beta = default_beta(2)
    mean_flux = jnp.zeros(grid.num_faces, dtype=u.dtype)

    interior = np.nonzero(grid.interior_faces)[0]
    if len(interior):
        qp, qw = face_quadrature(grid, qorder, interior)
        n = jnp.asarray(grid.face_normals[interior])
        h = jnp.asarray(grid.face_volumes[interior])
        u_m, f_m, d_m = _side_data(space, grid.face_cells[interior, 0], qp, u,
                                   lam_fn, kap_fn, n, weight_lam_fn, weight_kap_fn)
        u_p, f_p, d_p = _side_data(space, grid.face_cells[interior, 1], qp, u,
                                   lam_fn, kap_fn, n, weight_lam_fn, weight_kap_fn)
        denom = d_m + d_p
        zero = denom == 0
        safe = jnp.where(zero, 1.0, denom)
        w_m, w_p = jnp.where(zero, 0.5, d_p / safe), jnp.where(zero, 0.5, d_m / safe)
        gamma = jnp.where(zero, 0.0, d_m * d_p / safe)
        pen = sigma_i * gamma / (h[:, None] ** beta)
        tn = -(w_m * f_m + w_p * f_p) + pen * (u_m - u_p)
        mean_flux = mean_flux.at[jnp.asarray(interior)].set(
            jnp.sum(qw * tn, axis=1) / h
        )

    fb = np.asarray(dirichlet_faces)
    if len(fb):
        qp, qw = face_quadrature(grid, qorder, fb)
        n = jnp.asarray(grid.face_normals[fb])
        h = jnp.asarray(grid.face_volumes[fb])
        uh, flux, delta = _side_data(space, grid.face_cells[fb, 0], qp, u,
                                     lam_fn, kap_fn, n, weight_lam_fn, weight_kap_fn)
        gd = g_d(qp) if g_d is not None else 0.0
        pen = sigma_b * delta / (h[:, None] ** beta)
        tn = -flux + pen * (uh - gd)
        mean_flux = mean_flux.at[jnp.asarray(fb)].set(jnp.sum(qw * tn, axis=1) / h)

    fn_ = np.asarray(neumann_faces)
    if len(fn_) and g_n is not None:
        qp, qw = face_quadrature(grid, qorder, fn_)
        h = jnp.asarray(grid.face_volumes[fn_])
        mean_flux = mean_flux.at[jnp.asarray(fn_)].set(
            -jnp.sum(qw * g_n(qp), axis=1) / h
        )
    return mean_flux


def _rt0_cell_data(grid: Grid, mean_flux: jnp.ndarray):
    """Outward integral dofs D_e [NC, 3] and opposite vertices P_e [NC, 3, 2]."""
    assert grid.cell_type == TRIANGLE
    cf = grid.cell_faces  # local faces (v0v1, v1v2, v2v0)
    s = np.where(
        grid.face_cells[cf, 0] == np.arange(grid.num_cells)[:, None], 1.0, -1.0
    )
    fv = grid.face_volumes[cf]
    dofs = mean_flux[jnp.asarray(cf)] * jnp.asarray(s * fv)  # [NC, 3]
    opp = grid.cells[:, [2, 0, 1]]  # vertex opposite each local face
    P = jnp.asarray(grid.vertices[opp])  # [NC, 3, 2]
    return dofs, P


def rt0_evaluate(grid: Grid, mean_flux: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """RT0 field at per-cell points qp [NC, k, 2] -> [NC, k, 2]:
    t|_T(x) = sum_e D_e (x - P_e) / (2|T|)."""
    dofs, P = _rt0_cell_data(grid, mean_flux)
    inv2a = jnp.asarray(1.0 / (2.0 * grid.cell_volumes))  # [NC]
    diff = qp[:, :, None, :] - P[:, None, :, :]  # [NC, k, 3, 2]
    return jnp.einsum("ce,ckea->cka", dofs, diff) * inv2a[:, None, None]


def rt0_divergence(grid: Grid, mean_flux: jnp.ndarray) -> jnp.ndarray:
    """div t per cell [NC] = sum_e D_e / |T| (constant for RT0)."""
    dofs, _ = _rt0_cell_data(grid, mean_flux)
    return jnp.sum(dofs, axis=1) / jnp.asarray(grid.cell_volumes)


# ---------------------------------------------------------------------------
# the estimator front-end (string dispatch like estimators/swipdg.hh:824-985)
# ---------------------------------------------------------------------------


class SWIPDGEstimators:
    @staticmethod
    def available() -> List[str]:
        return [
            "eta_NC_ESV2007",
            "eta_R_ESV2007",
            "eta_R_ESV2007_*",
            "eta_DF_ESV2007",
            "eta_ESV2007",
            "eta_ESV2007_alt",
        ]

    available_local = available

    # -- local (per-element squared) contributions --------------------------
    @classmethod
    def _local_squared(cls, space, boundary_info, problem, u, type_, mu=None,
                       mu_hat=None) -> jnp.ndarray:
        grid = space.grid
        frozen = problem.with_mu(mu) if problem.parametric() else problem
        lam = freeze_function(frozen.diffusion_factor)
        kap = freeze_function(frozen.diffusion_tensor)
        frozen_hat = (
            problem.with_mu(mu_hat) if (problem.parametric() and mu_hat is not None)
            else frozen
        )
        lam_hat = freeze_function(frozen_hat.diffusion_factor)
        kap_hat = freeze_function(frozen_hat.diffusion_tensor)
        # the flux reconstruction's weighting diffusion is the mu-frozen
        # diffusion itself (the reference reconstructs with
        # problem.with_mu(mu)'s affine part, estimators/block-swipdg.hh:
        # 428-434, 676-684 — i.e. self-weighted at the frozen parameter)
        wlam, wkap = lam, kap
        force = freeze_function(frozen.force)
        g_d = freeze_function(frozen.dirichlet)
        g_n = freeze_function(frozen.neumann)
        dirichlet_faces = np.nonzero(boundary_info.dirichlet_faces)[0]
        neumann_faces = np.nonzero(boundary_info.neumann_faces)[0]

        if type_ == "eta_NC_ESV2007":
            vtx = oswald_interpolation(space, u, boundary_info.dirichlet_vertices)
            qorder = lam.order + kap.order + 2
            qp, qw = cell_quadrature(grid, qorder)
            grads = space.shape_gradients(jnp.asarray(grid.cell_vertices), qp)
            u_loc = u[jnp.asarray(space.cell_dofs)]
            # conforming interpolant has the cell's vertex values
            v_loc = vtx[jnp.asarray(grid.cells.astype(np.int64))]
            e_grad = jnp.einsum("ckia,ci->cka", grads, u_loc - v_loc)
            lam_q = lam(qp)
            kap_q = kap(qp)
            flux = jnp.einsum("ckab,ckb->cka", kap_q, e_grad)
            return jnp.sum(qw * lam_q * jnp.sum(e_grad * flux, axis=-1), axis=1)

        if type_ in ("eta_R_ESV2007", "eta_R_ESV2007_*"):
            qorder = max(force.order + 1, 4)
            qp, qw = cell_quadrature(grid, qorder)
            f_q = force(qp)
            vol = jnp.asarray(grid.cell_volumes)
            if type_ == "eta_R_ESV2007":
                proj = jnp.sum(qw * f_q, axis=1) / vol  # P0 projection
            else:
                mean_flux = rt0_flux_reconstruction(
                    space, u, lam, kap, dirichlet_faces, neumann_faces, g_d, g_n,
                    weight_lam_fn=wlam, weight_kap_fn=wkap,
                )
                proj = rt0_divergence(grid, mean_flux)
            resid = jnp.sum(qw * (f_q - proj[:, None]) ** 2, axis=1)
            h2 = jnp.asarray(grid.cell_diameters) ** 2
            min_ev = min_diffusion_eigenvalue(lam, kap, grid)
            cutoff = POINCARE * h2 / min_ev
            return cutoff * resid

        if type_ in ("eta_DF_ESV2007", "eta_DF_star"):
            # reconstruction always uses the diffusion at mu
            # (LocalDiffusiveFluxESV2007::prepare, estimators/swipdg.hh:592-599);
            # the residual's gradient weight is lambda(mu_hat) for the plain
            # variant (DiffusiveFluxEstimate takes only lambda_hat,
            # swipdg.hh:582-585) and lambda(mu) for the star variant
            # (OS2014::DiffusiveFluxEstimateStar, block-swipdg.hh:609-615).
            mean_flux = rt0_flux_reconstruction(
                space, u, lam, kap, dirichlet_faces, neumann_faces, g_d, g_n,
                weight_lam_fn=wlam, weight_kap_fn=wkap,
            )
            qorder = lam.order + lam_hat.order + 4
            qp, qw = cell_quadrature(grid, qorder)
            grad_uh = evaluate_discrete_gradient(space, u, qp)
            t = rt0_evaluate(grid, mean_flux, qp)
            lam_q = lam(qp) if type_ == "eta_DF_star" else lam_hat(qp)
            kap_q = kap(qp)
            resid = lam_q[..., None] * jnp.einsum("ckab,ckb->cka", kap_q, grad_uh) + t
            # metric (lambda_hat kappa_hat)^{-1}
            tau_hat = lam_hat(qp)[..., None, None] * kap_hat(qp)
            det = tau_hat[..., 0, 0] * tau_hat[..., 1, 1] - tau_hat[..., 0, 1] * tau_hat[..., 1, 0]
            inv = (
                jnp.stack(
                    [
                        jnp.stack([tau_hat[..., 1, 1], -tau_hat[..., 0, 1]], axis=-1),
                        jnp.stack([-tau_hat[..., 1, 0], tau_hat[..., 0, 0]], axis=-1),
                    ],
                    axis=-2,
                )
                / det[..., None, None]
            )
            quad = jnp.einsum("cka,ckab,ckb->ck", resid, inv, resid)
            return jnp.sum(qw * quad, axis=1)

        raise ValueError(f"unknown estimator {type_!r}; available: {cls.available()}")

    # -- public surface ------------------------------------------------------
    @classmethod
    def estimate(cls, space, boundary_info, problem, u, type_, mu=None,
                 mu_hat=None) -> float:
        if type_ == "eta_ESV2007":
            nc = cls._local_squared(space, boundary_info, problem, u, "eta_NC_ESV2007", mu, mu_hat)
            r = cls._local_squared(space, boundary_info, problem, u, "eta_R_ESV2007_*", mu, mu_hat)
            df = cls._local_squared(space, boundary_info, problem, u, "eta_DF_ESV2007", mu, mu_hat)
            return float(jnp.sqrt(jnp.sum(nc + (jnp.sqrt(r) + jnp.sqrt(df)) ** 2)))
        if type_ == "eta_ESV2007_alt":
            nc = cls._local_squared(space, boundary_info, problem, u, "eta_NC_ESV2007", mu, mu_hat)
            r = cls._local_squared(space, boundary_info, problem, u, "eta_R_ESV2007_*", mu, mu_hat)
            df = cls._local_squared(space, boundary_info, problem, u, "eta_DF_ESV2007", mu, mu_hat)
            return float(
                jnp.sqrt(jnp.sum(nc)) + jnp.sqrt(jnp.sum(r)) + jnp.sqrt(jnp.sum(df))
            )
        vals = cls._local_squared(space, boundary_info, problem, u, type_, mu, mu_hat)
        return float(jnp.sqrt(jnp.sum(vals)))

    @classmethod
    def estimate_local(cls, space, boundary_info, problem, u, type_, mu=None,
                       mu_hat=None) -> np.ndarray:
        """Per-element squared indicators scaled by the squared total
        (swipdg.hh:700-719)."""
        if type_ == "eta_ESV2007":
            nc = cls._local_squared(space, boundary_info, problem, u, "eta_NC_ESV2007", mu, mu_hat)
            r = cls._local_squared(space, boundary_info, problem, u, "eta_R_ESV2007_*", mu, mu_hat)
            df = cls._local_squared(space, boundary_info, problem, u, "eta_DF_ESV2007", mu, mu_hat)
            local = nc + (jnp.sqrt(r) + jnp.sqrt(df)) ** 2
        else:
            local = cls._local_squared(space, boundary_info, problem, u, type_, mu, mu_hat)
        total = jnp.sum(local)
        return np.asarray(local / total)
