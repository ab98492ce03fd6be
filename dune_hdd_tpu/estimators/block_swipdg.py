"""OS2014 localized a-posteriori estimators for BlockSWIPDG.

Re-design of estimators/block-swipdg.hh (reference:
dune/hdd/linearelliptic/estimators/block-swipdg.hh:35-1265):

* eta_NC_OS2014     — ESV2007 nonconformity at mu_bar (:118-132)
* eta_R_OS2014      — subdomain-local residual with explicit Poincare
  weighting C_P diam(Omega_j)^2 / min-diffusion, min diffusion over
  {mu_min, mu_max} (:152-328; constant at :288-309); P0 projection per cell
* eta_R_OS2014_*    — same weighting, residual f - div t_h with the global
  RTN0 flux at mu (:350-541)
* eta_DF_OS2014     — ESV2007 diffusive flux with (mu, mu_hat) (:546-561)
* eta_DF_OS2014_*   — OS2014::DiffusiveFluxEstimateStar semantics (:581-716)
* eta_OS2014 / eta_OS2014_* — combined with parameter factors
  (1/sqrt(alpha_mu_mu_bar)) (sqrt(gamma_mu_mu_bar) eta_NC + eta_R +
  gamma_tilde eta_DF), gamma_tilde = max(sqrt(gamma_mu_mu_hat),
  1/sqrt(alpha_mu_mu_hat)) (:777-786); estimate_local returns per-subdomain
  indicators 3/sqrt(alpha)(...) / eta^2 (:854-890)

alpha/gamma are the dune-pymor coefficient bounds min/max_q
theta_q(mu)/theta_q(mu_ref) (affine.coefficient_bounds).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..affine import coefficient_bounds
from ..functions.base import freeze_function
from ..grid.multiscale import MultiscaleGrid
from ..ops.assembly import cell_quadrature
from .swipdg import POINCARE, SWIPDGEstimators, rt0_divergence, rt0_flux_reconstruction

__all__ = ["BlockSWIPDGEstimators"]


def _segment_sum_by_subdomain(values: jnp.ndarray, ms_grid: MultiscaleGrid) -> jnp.ndarray:
    import jax

    return jax.ops.segment_sum(
        values, jnp.asarray(ms_grid.subdomain_of.astype(np.int64)),
        num_segments=ms_grid.size(),
    )


class BlockSWIPDGEstimators:
    @staticmethod
    def available() -> List[str]:
        return [
            "eta_NC_OS2014",
            "eta_R_OS2014",
            "eta_R_OS2014_*",
            "eta_DF_OS2014",
            "eta_DF_OS2014_*",
            "eta_OS2014",
            "eta_OS2014_*",
        ]

    available_local = available

    # ------------------------------------------------------------------
    @classmethod
    def _component_subdomain_squares(cls, block_disc, u, type_, parameters):
        """Per-subdomain squared contributions [S] of one component."""
        space = block_disc.space
        bi = block_disc.boundary_info
        problem = block_disc.problem
        ms = block_disc.ms_grid
        p = dict(parameters or {})
        mu = p.get("mu")
        mu_bar = p.get("mu_bar", mu)
        mu_hat = p.get("mu_hat", mu)
        mu_min = p.get("parameter_range_min")
        mu_max = p.get("parameter_range_max")
        # "reconstruction": "frozen" (reference semantics, default) or
        # "scheme" (theta-combined per-component flux; exactly conservative
        # for the per-component self-weighted scheme - see
        # swipdg.scheme_flux_parts)
        recon = p.get("reconstruction", "frozen")
        # penalty_mu-scheme discretizations assemble with FIXED weights; the
        # consistent flux reconstruction uses the same pair (self-weighted
        # "reference"-scheme problems keep the reference's frozen weights)
        wdiff = None
        if getattr(block_disc, "_scheme", None) == "penalty_mu":
            wdiff = getattr(block_disc._global, "_weight_diffusion", None)
        if problem.parametric():
            for req in ("mu", "mu_bar", "mu_hat"):
                if p.get(req) is None and req == "mu":
                    raise ValueError("parameters are missing 'mu'")

        if type_ == "eta_NC_OS2014":
            cells = SWIPDGEstimators._local_squared(
                space, bi, problem, u, "eta_NC_ESV2007", mu=mu_bar
            )
            return _segment_sum_by_subdomain(cells, ms)

        if type_ == "eta_DF_OS2014":
            cells = SWIPDGEstimators._local_squared(
                space, bi, problem, u, "eta_DF_ESV2007", mu=mu, mu_hat=mu_hat,
                reconstruction=recon, weight_diffusion=wdiff,
            )
            return _segment_sum_by_subdomain(cells, ms)

        if type_ == "eta_DF_OS2014_*":
            cells = SWIPDGEstimators._local_squared(
                space, bi, problem, u, "eta_DF_star", mu=mu, mu_hat=mu_hat,
                reconstruction=recon, weight_diffusion=wdiff,
            )
            return _segment_sum_by_subdomain(cells, ms)

        if type_ in ("eta_R_OS2014", "eta_R_OS2014_*"):
            if problem.parametric() and (mu_min is None or mu_max is None):
                raise ValueError(
                    "parameters are missing 'parameter_range_min'/'parameter_range_max'"
                )
            grid = space.grid
            frozen_mu = problem.with_mu(mu) if problem.parametric() else problem
            force = freeze_function(frozen_mu.force)
            qorder = max(force.order + 1, 4)
            qp, qw = cell_quadrature(grid, qorder)
            f_q = force(qp)
            vol = jnp.asarray(grid.cell_volumes)
            if type_ == "eta_R_OS2014":
                proj = jnp.sum(qw * f_q, axis=1) / vol  # per-cell P0 projection
            else:
                lam = freeze_function(frozen_mu.diffusion_factor)
                kap = freeze_function(frozen_mu.diffusion_tensor)
                g_d = freeze_function(frozen_mu.dirichlet)
                g_n = freeze_function(frozen_mu.neumann)
                from .swipdg import scheme_flux_parts

                mean_flux = rt0_flux_reconstruction(
                    space, u, lam, kap,
                    np.nonzero(bi.dirichlet_faces)[0],
                    np.nonzero(bi.neumann_faces)[0],
                    g_d, g_n,
                    weight_lam_fn=(wdiff[0] if wdiff else None),
                    weight_kap_fn=(wdiff[1] if wdiff else None),
                    flux_parts=(scheme_flux_parts(problem, mu)
                                if (recon == "scheme" and problem.parametric())
                                else None),
                )
                proj = rt0_divergence(grid, mean_flux)
            resid_cells = jnp.sum(qw * (f_q - proj[:, None]) ** 2, axis=1)
            resid_sub = _segment_sum_by_subdomain(resid_cells, ms)
            # min diffusion per cell over {mu_min, mu_max}
            # (LocalResidualOS2014::apply_local, block-swipdg.hh:265-280)
            candidates = []
            for m in ([mu_min, mu_max] if problem.parametric() else [None]):
                fr = problem.with_mu(m) if problem.parametric() else problem
                lam_m = freeze_function(fr.diffusion_factor)
                kap_m = freeze_function(fr.diffusion_tensor)
                lam_vals = lam_m(qp)
                # min eigenvalue of kappa (2x2 symmetric) times min lambda
                kq = kap_m(qp)
                a, b = kq[..., 0, 0], kq[..., 0, 1]
                c_, d_ = kq[..., 1, 0], kq[..., 1, 1]
                disc = jnp.sqrt(jnp.maximum((a - d_) ** 2 + 4 * b * c_, 0.0))
                kmin = jnp.min(0.5 * (a + d_ - disc), axis=1)
                candidates.append(jnp.min(lam_vals, axis=1) * kmin)
            min_diff_cells = candidates[0]
            for c in candidates[1:]:
                min_diff_cells = jnp.minimum(min_diff_cells, c)
            # per-subdomain min
            import jax

            min_diff_sub = jax.ops.segment_min(
                min_diff_cells, jnp.asarray(ms.subdomain_of.astype(np.int64)),
                num_segments=ms.size(),
            )
            diam = jnp.asarray([ms.subdomain_diameter(ss) for ss in range(ms.size())])
            return (POINCARE * diam**2 / min_diff_sub) * resid_sub

        raise ValueError(f"unknown estimator {type_!r}; available: {cls.available()}")

    # ------------------------------------------------------------------
    @classmethod
    def _factors(cls, problem, parameters):
        if not problem.parametric():
            return 1.0, 1.0, 1.0, 1.0
        p = dict(parameters)
        mu, mu_bar, mu_hat = p["mu"], p["mu_bar"], p["mu_hat"]
        mu = problem.parse_parameter(mu)
        mu_bar = problem.parse_parameter(mu_bar)
        mu_hat = problem.parse_parameter(mu_hat)
        a_bar, g_bar = coefficient_bounds(problem.diffusion_factor, mu, mu_bar)
        a_hat, g_hat = coefficient_bounds(problem.diffusion_factor, mu, mu_hat)
        return float(a_bar), float(g_bar), float(a_hat), float(g_hat)

    @classmethod
    def estimate(cls, block_disc, u, type_, parameters: Optional[Dict] = None) -> float:
        parameters = dict(parameters or {})
        if type_ in ("eta_OS2014", "eta_OS2014_*"):
            star = type_.endswith("_*")
            problem = block_disc.problem
            a_bar, g_bar, a_hat, g_hat = cls._factors(problem, parameters)
            # plain: gamma_tilde = max(sqrt(gamma_hat), 1/sqrt(alpha_hat))
            # (block-swipdg.hh:786); star: 1/sqrt(alpha_hat) (:968-971)
            df_factor = (
                1.0 / math.sqrt(a_hat) if star
                else max(math.sqrt(g_hat), 1.0 / math.sqrt(a_hat))
            )
            nc = cls._component_subdomain_squares(block_disc, u, "eta_NC_OS2014", parameters)
            r = cls._component_subdomain_squares(
                block_disc, u, "eta_R_OS2014_*" if star else "eta_R_OS2014", parameters
            )
            df = cls._component_subdomain_squares(
                block_disc, u, "eta_DF_OS2014_*" if star else "eta_DF_OS2014", parameters
            )
            return (1.0 / math.sqrt(a_bar)) * (
                math.sqrt(g_bar) * float(jnp.sqrt(jnp.sum(nc)))
                + float(jnp.sqrt(jnp.sum(r)))
                + df_factor * float(jnp.sqrt(jnp.sum(df)))
            )
        vals = cls._component_subdomain_squares(block_disc, u, type_, parameters)
        return float(jnp.sqrt(jnp.sum(vals)))

    @classmethod
    def visualize(cls, block_disc, u, type_, filename: str,
                  parameters: Optional[Dict] = None) -> str:
        """Write the per-subdomain indicators as a subdomain-constant cell
        field (reference: visualize_indicators,
        test/linearelliptic-block-swipdg.hh:340-359)."""
        from ..utils.vtk import write_cell_data_vtu

        ind = cls.estimate_local(block_disc, u, type_, parameters)
        cell_field = ind[block_disc.ms_grid.subdomain_of]
        return write_cell_data_vtu(
            block_disc.ms_grid.grid, {type_: cell_field}, filename
        )

    @classmethod
    def estimate_local(cls, block_disc, u, type_, parameters: Optional[Dict] = None) -> np.ndarray:
        """Per-subdomain indicators (block-swipdg.hh:854-890): for the
        combined types, 3/sqrt(alpha) (sqrt(gamma) nc_T^2 + r_T^2 +
        gamma_tilde df_T^2) / eta^2."""
        parameters = dict(parameters or {})
        if type_ == "eta_OS2014":
            problem = block_disc.problem
            a_bar, g_bar, a_hat, g_hat = cls._factors(problem, parameters)
            gamma_tilde = max(math.sqrt(g_hat), 1.0 / math.sqrt(a_hat))
            nc = cls._component_subdomain_squares(block_disc, u, "eta_NC_OS2014", parameters)
            r = cls._component_subdomain_squares(block_disc, u, "eta_R_OS2014", parameters)
            df = cls._component_subdomain_squares(block_disc, u, "eta_DF_OS2014", parameters)
            indicators = (3.0 / math.sqrt(a_bar)) * (
                math.sqrt(g_bar) * nc + r + gamma_tilde * df
            )
            eta_sq = (
                (1.0 / math.sqrt(a_bar))
                * (
                    math.sqrt(g_bar) * float(jnp.sqrt(jnp.sum(nc)))
                    + float(jnp.sqrt(jnp.sum(r)))
                    + gamma_tilde * float(jnp.sqrt(jnp.sum(df)))
                )
            ) ** 2
            return np.asarray(indicators / eta_sq)
        if type_ == "eta_OS2014_*":
            # the reference's star indicators are sqrt(3/sqrt(alpha_bar) *
            # (sqrt(gamma_bar) nc_T^2 + r_T^2 + sqrt(alpha_hat) df_T^2)) and
            # are NOT normalized by eta^2 (block-swipdg.hh:1043-1063)
            problem = block_disc.problem
            a_bar, g_bar, a_hat, g_hat = cls._factors(problem, parameters)
            nc = cls._component_subdomain_squares(block_disc, u, "eta_NC_OS2014", parameters)
            r = cls._component_subdomain_squares(block_disc, u, "eta_R_OS2014_*", parameters)
            df = cls._component_subdomain_squares(block_disc, u, "eta_DF_OS2014_*", parameters)
            indicators = jnp.sqrt(
                (3.0 / math.sqrt(a_bar))
                * (math.sqrt(g_bar) * nc + r + math.sqrt(a_hat) * df)
            )
            return np.asarray(indicators)
        vals = cls._component_subdomain_squares(block_disc, u, type_, parameters)
        return np.asarray(vals / jnp.sum(vals))
