#!/usr/bin/env python
"""Which local OS2014 indicator points at the TRUE-error subdomains on the
SPE10 [20 4 1] case?  (The star residual term concentrates on the force
blobs; the true error lives in the channel — scripts/diag_adaptive_spe10
_deep.py.)  Ranks each candidate marking indicator by its overlap with the
oracle (true local h1_semi error) top-k sets.

Usage: JAX_PLATFORMS=cpu python scripts/diag_marking_indicator.py
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
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

    u_train = d.solve(1.0, options={"type": "direct"})
    local_bases = []
    for ss in range(S):
        prod = d.get_local_product(ss, "h1_semi").freeze({})
        local_bases.append(gram_schmidt(
            jnp.stack([d.localize_vector(u_train, ss)]), prod))
    rows = []
    for ss, lb in enumerate(local_bases):
        dofs = jnp.asarray(d._local_dof_map(ss))
        for v in lb:
            rows.append(jnp.zeros(d.space.num_dofs).at[dofs].set(v))
    basis = jnp.stack(rows)
    rm = RBReductor(d).reduce(basis)
    u_rb = rm.reconstruct(rm.solve(mu_p))

    # oracle: true local h1_semi errors per subdomain
    e = u_det - u_rb
    true_loc = []
    for ss in range(S):
        el = d.localize_vector(e, ss)
        lp = d.get_local_product(ss, "h1_semi").freeze({})
        true_loc.append(float(jnp.sqrt(jnp.maximum(el @ lp.matvec(el), 0.0))))
    true_loc = np.asarray(true_loc)
    oracle8 = set(np.argsort(-true_loc)[:8].tolist())
    print(f"oracle top-8: {sorted(oracle8)}", flush=True)

    params = {"mu": mu_p, "mu_bar": mu_p, "mu_hat": mu_p,
              "mu_minimizing": mu_p}
    for type_ in ("eta_OS2014", "eta_OS2014_*", "eta_NC_OS2014",
                  "eta_DF_OS2014", "eta_DF_OS2014_*", "eta_R_OS2014",
                  "eta_R_OS2014_*"):
        t0 = time.time()
        ind = np.asarray(BlockSWIPDGEstimators.estimate_local(
            d, u_rb, type_, params))
        top8 = np.argsort(-ind)[:8].tolist()
        ov = len(oracle8 & set(top8))
        # Spearman-ish: correlation of ranks over all subdomains
        rr = np.corrcoef(np.argsort(np.argsort(-ind)),
                         np.argsort(np.argsort(-true_loc)))[0, 1]
        print(f"{type_:18s} top8={top8} overlap={ov}/8 rankcorr={rr:+.2f}"
              f" ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
