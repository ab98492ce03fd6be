#!/usr/bin/env python
"""Diagnose the adaptive-LRBMS trajectory on SPE10 [20 4 1] (VERDICT r3 #9).

Round-3 observation: 8 enrichments, flat trajectory.  Measured round 4
(2026-08-17, this script, rhs-only init + Doerfler 0.5): STILL flat — true
h1 error 34.76 -> 34.52 over 6 iterations, eta exploding 395 -> 2.6e4.
Diagnosis: the force is 3 local blobs, so only ~5 of 80 subdomains have a
nonzero localized rhs; with rhs-only initialization the reduced solution is
IDENTICALLY ZERO on ~94% of the domain and no handful of local corrections
can move the global error (the best-possible error in the span stays ~||u||).
The LRBMS papers initialize with LOCALIZED GLOBAL SNAPSHOTS (offline basis)
and use online enrichment to adapt — for parametric SPE10: train at mu=1
(channel off), adapt at mu=0.1 (channel on); enrichment then targets the
channel subdomains.

Usage: JAX_PLATFORMS=cpu python scripts/diag_adaptive_spe10.py [theta] [max_it]
       [mu_train ...] (default 1.0; "none" -> rhs-only init)
"""
import json
import sys
import time

import numpy as np

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.mor import adaptive_lrbms
from dune_hdd_tpu.testcases import Spe10ParametricBlockModel1TestCase


def main():
    theta = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    max_it = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    mu_train = sys.argv[3:] if len(sys.argv) > 3 else ["1.0"]
    mu = {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1}
    tc = Spe10ParametricBlockModel1TestCase(
        mu, num_partitions=(20, 4), num_refinements=0, oversampling_layers=2)
    d = BlockSWIPDGDiscretization(
        tc.level_grid(0), tc.boundary_info(), tc.problem,
        num_partitions=(20, 4), oversampling_layers=2)
    print(f"dofs={d.space.num_dofs} subdomains={d.num_subdomains()}")

    initial = None
    if mu_train != ["none"]:
        # offline basis: localized global snapshots (the LRBMS workflow)
        from dune_hdd_tpu.mor.gram_schmidt import gram_schmidt
        import jax.numpy as jnp

        snaps = [d.solve(float(m), options={"type": "direct"})
                 for m in mu_train]
        initial = []
        for ss in range(d.num_subdomains()):
            vecs = jnp.stack([d.localize_vector(u, ss) for u in snaps])
            prod = d.get_local_product(ss, "h1_semi").freeze({})
            initial.append(gram_schmidt(vecs, prod))
        print(f"snapshot init at mu_train={mu_train}: "
              f"{sum(b.shape[0] for b in initial)} vectors")

    t0 = time.time()
    res = adaptive_lrbms(
        d, mu["mu"], tc.estimator_parameters(),
        initial_local_bases=initial,
        max_enrichments=max_it, target_estimate=1e-6,
        track_true_errors=True, verbose=True,
        marking=("doerfler", theta),
    )
    # component etas of the final reduced solution (is eta_R the floor?)
    u_rb = res.reduced_model.reconstruct(
        res.reduced_model.solve(d.problem.parse_parameter(mu["mu"])))
    comps = {}
    for t in ("eta_NC_OS2014", "eta_R_OS2014", "eta_DF_OS2014"):
        comps[t] = float(BlockSWIPDGEstimators.estimate(
            d, u_rb, t, tc.estimator_parameters()))
    out = {
        "theta": theta,
        "estimates": res.estimates,
        "true_errors": res.true_errors,
        "marked_per_it": [len(m) if isinstance(m, list) else 1
                          for m in res.enriched_subdomains],
        "basis_size": int(res.basis.shape[0]),
        "final_components": comps,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
