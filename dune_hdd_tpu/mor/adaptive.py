"""Adaptive LRBMS: estimator-driven online enrichment of local bases.

The workflow BASELINE.json lists as "OS2014 localization study: block-SWIPDG
DD with localized error estimator ... adaptive subdomain refinement", and the
algorithmic core of the LRBMS papers: solve reduced -> localize the OS2014
error estimator -> enrich the worst subdomain's basis with an oversampled
local correction solve (solve_for_local_correction) -> re-project.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .gram_schmidt import gram_schmidt
from .reductor import RBReductor, ReducedModel

__all__ = ["AdaptiveResult", "adaptive_lrbms", "doerfler_marking",
           "snapshot_local_bases"]


def snapshot_local_bases(block_disc, mu_train, local_product: str = "h1_semi",
                         solver_options: Optional[Dict] = None):
    """Per-subdomain bases from one detailed snapshot u(mu_train).

    The default rhs-only initialization leaves every subdomain outside the
    force support with an EMPTY basis (the localized rhs vanishes there);
    on SPE10 [20 4 1] that is 75 of 80 subdomains, so the initial reduced
    solution is zero on 94% of the domain and the adaptive loop starts from
    err == ||u||.  One training snapshot gives every subdomain a non-trivial
    basis — the LRBMS papers' standard initialization (greedy snapshots),
    reduced to a single parameter."""
    d = block_disc
    u = d.solve(mu_train, options=solver_options or {"type": "direct"})
    bases = []
    for ss in range(d.num_subdomains()):
        prod = d.get_local_product(ss, local_product).freeze({})
        bases.append(gram_schmidt(d.localize_vector(u, ss)[None, :], prod))
    return bases


def doerfler_marking(indicators: np.ndarray, theta: float) -> List[int]:
    """Bulk-chasing (Doerfler) marking: the smallest set of subdomains whose
    squared indicators sum to >= theta * total.  The standard marking of
    adaptive FEM/LRBMS; with many subdomains the one-worst-per-iteration
    strategy stalls (measured: flat trajectory on SPE10 [20 4 1], where 75 of
    80 subdomains start with an empty basis because the force is 3 local
    blobs and the localized rhs vanishes elsewhere)."""
    ind = np.maximum(np.asarray(indicators, dtype=float), 0.0)
    order = np.argsort(-ind, kind="stable")
    csum = np.cumsum(ind[order])
    total = csum[-1] if len(csum) else 0.0
    if total <= 0.0:
        return [int(np.argmax(ind))] if len(ind) else []
    k = int(np.searchsorted(csum, theta * total)) + 1
    return [int(s) for s in order[:k]]


@dataclass
class AdaptiveResult:
    reduced_model: ReducedModel
    basis: jnp.ndarray
    local_bases: List[jnp.ndarray]
    estimates: List[float] = field(default_factory=list)
    enriched_subdomains: List[int] = field(default_factory=list)
    true_errors: List[float] = field(default_factory=list)
    rb_bounds: List[float] = field(default_factory=list)


def adaptive_lrbms(
    block_disc,
    mu,
    estimator_parameters: Dict,
    initial_local_bases: Optional[Sequence[jnp.ndarray]] = None,
    target_estimate: float = 1e-3,
    max_enrichments: int = 10,
    local_product: str = "h1_semi",
    estimator_type: str = "eta_OS2014_*",
    solver_options: Optional[Dict] = None,
    track_true_errors: bool = False,
    verbose: bool = False,
    marking="worst",
    marking_estimator_type: Optional[str] = None,
    rb_bound: bool = True,
    rb_product: str = "energy",
) -> AdaptiveResult:
    """Enrich per-subdomain bases adaptively for one target parameter mu.

    Requires the discretization's ms_grid to have oversampling_layers > 0.

    ``marking``: "worst" enriches the single worst subdomain per iteration;
    ``("doerfler", theta)`` enriches the Doerfler bulk set (all corrections
    computed from the same current reduced solution — independent patch
    solves).  With many subdomains use Doerfler marking: one-worst stalls.

    ``marking_estimator_type``: indicator used for MARKING (stopping always
    uses ``estimator_type``).  On high-contrast cases with localized forcing
    the star residual term concentrates the eta_OS2014_* indicators on the
    force-support subdomains while the true error lives elsewhere (measured
    on SPE10 [20 4 1]: oracle marking converges, star marking stalls —
    scripts/diag_adaptive_spe10_deep.py); marking on a localization-faithful
    component (e.g. "eta_DF_OS2014") decouples where-to-enrich from the
    certified stopping bound, like the discrete localization study's
    indicator choice (OS2014_localization_study.cc:90-136).

    ``rb_bound``: also evaluate the *reduced-consistent* Riesz residual
    bound ||P^{-1}(f - A u_rb)||_P / sqrt(alpha_LB(mu)) each iteration
    (recorded in ``result.rb_bounds``).  Unlike eta_OS2014_* — whose eta_R
    term lives on the fixed detailed grid and therefore FLOORS (and can
    rise) under basis enrichment — this bound measures exactly the
    reduction error and falls with enrichment, so ``target_estimate``
    stopping is honest: the loop stops when EITHER the detailed-grid
    estimator OR the rb bound reaches the target.  This composes the
    reference's pyMOR-side greedy estimator (thermalblock_main.py:298-355
    test_quality semantics) with the LRBMS localization: OS2014 indicators
    decide WHERE to enrich, the Riesz bound decides WHEN to stop."""
    from ..estimators.block_swipdg import BlockSWIPDGEstimators

    d = block_disc
    S = d.num_subdomains()
    mu_p = d.problem.parse_parameter(mu) if d.parametric() else {}
    reductor = RBReductor(d)
    local_products = [d.get_local_product(ss, local_product).freeze({}) for ss in range(S)]
    nloc = [len(d._local_dof_map(ss)) for ss in range(S)]
    if initial_local_bases is not None:
        local_bases = [jnp.asarray(b) for b in initial_local_bases]
    else:
        # start from the localized rhs like the LRBMS greedy
        local_bases = [
            gram_schmidt(
                d.get_local_rhs(ss).freeze(mu_p)[None, :], local_products[ss]
            )
            for ss in range(S)
        ]

    def globalize(bases):
        rows = []
        for ss, lb in enumerate(bases):
            dofs = jnp.asarray(d._local_dof_map(ss))
            for v in lb:
                rows.append(jnp.zeros(d.space.num_dofs).at[dofs].set(v))
        return jnp.stack(rows) if rows else jnp.zeros((0, d.space.num_dofs))

    u_detailed = None
    if track_true_errors:
        u_detailed = d.solve(mu, options=solver_options or {"type": "direct"})

    riesz = None
    if rb_bound:
        from .residual import RieszResidualEstimator, min_theta_coercivity

        mu_bar = estimator_parameters.get("mu_bar", mu)
        coer = None
        if d.parametric():
            op_exp = d.get_operator().with_expanded_affine_part()
            coer = min_theta_coercivity(op_exp, d.problem.parse_parameter(mu_bar))
        kw = {"mu_bar": mu_bar} if d.get_product(rb_product).parametric() else {}
        riesz = RieszResidualEstimator(d, product=rb_product, coercivity=coer, **kw)

    basis = globalize(local_bases)
    rm = reductor.reduce(basis)
    result = AdaptiveResult(rm, basis, local_bases)
    for it in range(max_enrichments + 1):
        coeffs = rm.solve(mu_p)
        u_rb = rm.reconstruct(coeffs)
        eta = BlockSWIPDGEstimators.estimate(d, u_rb, estimator_type, estimator_parameters)
        result.estimates.append(float(eta))
        if riesz is not None:
            result.rb_bounds.append(riesz.offline(basis).estimate(mu_p, coeffs))
        if track_true_errors:
            e = u_detailed - u_rb
            pm = d.product_matrix("h1_semi")
            result.true_errors.append(float(jnp.sqrt(jnp.maximum(e @ pm.matvec(e), 0))))
        if verbose:
            msg = f"  adaptive it {it}: {estimator_type} = {eta:.3e}"
            if track_true_errors:
                msg += f"  (true h1 err {result.true_errors[-1]:.3e})"
            print(msg)
        certified = eta <= target_estimate or (
            riesz is not None and result.rb_bounds[-1] <= target_estimate
        )
        if certified or it == max_enrichments:
            break
        indicators = BlockSWIPDGEstimators.estimate_local(
            d, u_rb, marking_estimator_type or estimator_type,
            estimator_parameters
        )
        if marking == "worst":
            marked = [int(np.argmax(indicators))]
            result.enriched_subdomains.append(marked[0])
        else:
            kind, theta = marking
            if kind != "doerfler":
                raise ValueError(f"unknown marking {marking!r}")
            marked = doerfler_marking(indicators, float(theta))
            result.enriched_subdomains.append(marked)
        locals_ = [d.localize_vector(u_rb, ss) for ss in range(S)]
        for ss in marked:
            delta = d.solve_for_local_correction(locals_, ss, mu_p,
                                                 options=solver_options)
            stacked = (jnp.concatenate([local_bases[ss], delta[None, :]])
                       if local_bases[ss].shape[0] else delta[None, :])
            local_bases[ss] = gram_schmidt(stacked, local_products[ss])
        basis = globalize(local_bases)
        rm = reductor.reduce(basis)
    result.reduced_model = rm
    result.basis = basis
    result.local_bases = local_bases
    return result
