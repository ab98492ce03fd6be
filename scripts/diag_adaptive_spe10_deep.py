#!/usr/bin/env python
"""Deep-dive: WHY is the SPE10 [20 4 1] adaptive trajectory flat?

Separates three failure hypotheses:
  (a) the reduced Galerkin solve is far from the best approximation in the
      current basis (projection/solve problem),
  (b) the basis cannot represent u(mu) and corrections do not extend it in
      the right directions (correction problem),
  (c) the estimator's local indicators point at the wrong subdomains
      (marking problem) — tested with an ORACLE marking by true local error.

Usage: JAX_PLATFORMS=cpu python scripts/diag_adaptive_spe10_deep.py
"""
import json
import sys
import time

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.mor.gram_schmidt import gram_schmidt
from dune_hdd_tpu.mor.reductor import RBReductor
from dune_hdd_tpu.testcases import Spe10ParametricBlockModel1TestCase


def main():
    mu = {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1}
    tc = Spe10ParametricBlockModel1TestCase(
        mu, num_partitions=(20, 4), num_refinements=0, oversampling_layers=2)
    d = BlockSWIPDGDiscretization(
        tc.level_grid(0), tc.boundary_info(), tc.problem,
        num_partitions=(20, 4), oversampling_layers=2)
    S = d.num_subdomains()
    mu_p = d.problem.parse_parameter(0.1)
    u_det = d.solve(0.1, options={"type": "direct"})
    pm = d.product_matrix("h1_semi")

    def h1(v):
        return float(jnp.sqrt(jnp.maximum(v @ pm.matvec(v), 0.0)))

    print(f"||u(0.1)||_h1_semi = {h1(u_det):.4e}", flush=True)

    # snapshot basis at mu_train=1.0
    u_train = d.solve(1.0, options={"type": "direct"})
    local_bases = []
    for ss in range(S):
        prod = d.get_local_product(ss, "h1_semi").freeze({})
        local_bases.append(gram_schmidt(
            jnp.stack([d.localize_vector(u_train, ss)]), prod))

    def globalize(bases):
        rows = []
        for ss, lb in enumerate(bases):
            dofs = jnp.asarray(d._local_dof_map(ss))
            for v in lb:
                rows.append(jnp.zeros(d.space.num_dofs).at[dofs].set(v))
        return jnp.stack(rows)

    reductor = RBReductor(d)

    def galerkin_and_best(bases, tag):
        basis = globalize(bases)
        rm = reductor.reduce(basis)
        u_rb = rm.reconstruct(rm.solve(mu_p))
        e_gal = h1(u_det - u_rb)
        # best approximation in span(basis) w.r.t. h1_semi: solve the
        # normal equations with the (possibly singular) gram matrix
        G = np.asarray(basis @ jnp.stack([pm.matvec(b) for b in basis]).T)
        rhs = np.asarray(basis @ pm.matvec(u_det))
        coef, *_ = np.linalg.lstsq(G, rhs, rcond=1e-10)
        u_best = jnp.asarray(coef) @ basis
        e_best = h1(u_det - u_best)
        print(f"{tag}: galerkin err {e_gal:.4e}  best-approx err {e_best:.4e}"
              f"  (n={basis.shape[0]})", flush=True)
        return e_gal, e_best

    galerkin_and_best(local_bases, "snapshot basis")

    # per-subdomain true error of the snapshot-Galerkin solution
    basis = globalize(local_bases)
    rm = reductor.reduce(basis)
    u_rb = rm.reconstruct(rm.solve(mu_p))
    err = u_det - u_rb
    loc_err = []
    for ss in range(S):
        prod = d.get_local_product(ss, "h1_semi").freeze({})
        e = d.localize_vector(err, ss)
        loc_err.append(float(jnp.sqrt(jnp.maximum(e @ prod.matvec(e), 0))))
    loc_err = np.asarray(loc_err)
    top = np.argsort(loc_err)[::-1][:8]
    print("top-8 true-error subdomains:", top.tolist(),
          [f"{loc_err[t]:.3e}" for t in top], flush=True)

    from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
    ind = np.asarray(BlockSWIPDGEstimators.estimate_local(
        d, u_rb, "eta_OS2014_*", tc.estimator_parameters()))
    topi = np.argsort(ind)[::-1][:8]
    print("top-8 indicator subdomains:", topi.tolist(),
          [f"{ind[t]:.3e}" for t in topi], flush=True)

    # ORACLE enrichment: 3 rounds, enrich the 8 worst TRUE-error subdomains
    for it in range(3):
        basis = globalize(local_bases)
        rm = reductor.reduce(basis)
        u_rb = rm.reconstruct(rm.solve(mu_p))
        err = u_det - u_rb
        loc = []
        for ss in range(S):
            prod = d.get_local_product(ss, "h1_semi").freeze({})
            e = d.localize_vector(err, ss)
            loc.append(float(jnp.sqrt(jnp.maximum(e @ prod.matvec(e), 0))))
        marked = np.argsort(np.asarray(loc))[::-1][:8]
        locals_ = [d.localize_vector(u_rb, ss) for ss in range(S)]
        for ss in marked:
            delta = d.solve_for_local_correction(
                locals_, int(ss), mu_p, options={"type": "direct"})
            prod = d.get_local_product(int(ss), "h1_semi").freeze({})
            # how much of the local error does the correction capture?
            e_loc = d.localize_vector(err, int(ss))
            num = float(e_loc @ prod.matvec(delta))
            dn = float(jnp.sqrt(jnp.maximum(delta @ prod.matvec(delta), 0)))
            en = float(jnp.sqrt(jnp.maximum(e_loc @ prod.matvec(e_loc), 0)))
            cos = num / (dn * en) if dn * en > 0 else 0.0
            if it == 0:
                print(f"  ss={int(ss)} |delta|={dn:.3e} |e_loc|={en:.3e} "
                      f"cos(delta, e_loc)={cos:+.3f}", flush=True)
            stacked = (jnp.concatenate([local_bases[int(ss)], delta[None]])
                       if local_bases[int(ss)].shape[0] else delta[None])
            local_bases[int(ss)] = gram_schmidt(stacked, prod)
        galerkin_and_best(local_bases, f"oracle it {it}")


if __name__ == "__main__":
    main()
