#!/usr/bin/env python
"""Record the adaptive-LRBMS SPE10 [20 4 1] trajectory for the lock test.

The configuration that the round-3/4 forensics (scripts/diag_adaptive_spe10*)
identified as sound:
  * snapshot init at mu_train = 1.0 (rhs-only init leaves 75/80 subdomains
    with an empty basis — the force is 3 local blobs),
  * Doerfler bulk marking (one-worst stalls at 80 subdomains),
  * marking on eta_DF_OS2014 (the star residual term concentrates on the
    force-support subdomains while the true error lives in the channel;
    stopping still uses the certified eta_OS2014_*).

Prints the estimator + true-error trajectories to record in
studies/expectations.py (RECORDED — there is no reference recording of this
exact workflow; the reference's analog is the OS2014 localization study,
OS2014_localization_study.cc:90-136).

Usage: JAX_PLATFORMS=cpu python scripts/run_adaptive_spe10_lock.py [max_enr]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.mor import adaptive_lrbms, snapshot_local_bases
from dune_hdd_tpu.testcases import Spe10ParametricBlockModel1TestCase


def main():
    max_enr = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    mu = {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1}
    tc = Spe10ParametricBlockModel1TestCase(
        mu, num_partitions=(20, 4), num_refinements=0, oversampling_layers=2)
    d = BlockSWIPDGDiscretization(
        tc.level_grid(0), tc.boundary_info(), tc.problem,
        num_partitions=(20, 4), oversampling_layers=2)
    t0 = time.time()
    init = snapshot_local_bases(d, 1.0)
    print(f"snapshot init: {time.time()-t0:.1f}s", flush=True)
    res = adaptive_lrbms(
        d, 0.1, tc.estimator_parameters(),
        initial_local_bases=init,
        max_enrichments=max_enr, target_estimate=1e-6,
        marking=("doerfler", 0.85),
        track_true_errors=True, verbose=True,
        solver_options={"type": "direct"})
    print("estimates:", [f"{v:.6e}" for v in res.estimates], flush=True)
    print("rb_bounds:", [f"{v:.6e}" for v in res.rb_bounds], flush=True)
    print("true_errors:", [f"{v:.6e}" for v in res.true_errors], flush=True)
    print("enriched:", res.enriched_subdomains, flush=True)
    print(f"total {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
