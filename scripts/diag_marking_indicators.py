#!/usr/bin/env python
"""Which local indicator ranks subdomains like the TRUE local error?

From the snapshot-initialized reduced solution on SPE10 [20 4 1], print per
candidate indicator the top-10 subdomains, Spearman rank correlation with the
true local h1_semi errors, and the top-10 overlap — then run 3 Doerfler
rounds with the best candidate at theta in {0.5, 0.85}.

Usage: python scripts/diag_marking_indicators.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.mor import adaptive_lrbms, snapshot_local_bases
from dune_hdd_tpu.mor.reductor import RBReductor
from dune_hdd_tpu.testcases import Spe10ParametricBlockModel1TestCase


def spearman(a, b):
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def main():
    t0 = time.time()
    mu = {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1}
    tc = Spe10ParametricBlockModel1TestCase(
        mu, num_partitions=(20, 4), num_refinements=0, oversampling_layers=2)
    d = BlockSWIPDGDiscretization(
        tc.level_grid(0), tc.boundary_info(), tc.problem,
        num_partitions=(20, 4), oversampling_layers=2)
    S = d.num_subdomains()
    mu_p = d.problem.parse_parameter(0.1)
    u_det = d.solve(0.1, options={"type": "direct"})
    init = snapshot_local_bases(d, 1.0)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    def globalize(bases):
        rows = []
        for ss, lb in enumerate(bases):
            dofs = jnp.asarray(d._local_dof_map(ss))
            for v in lb:
                rows.append(jnp.zeros(d.space.num_dofs).at[dofs].set(v))
        return jnp.stack(rows)

    reductor = RBReductor(d)
    rm = reductor.reduce(globalize(init))
    u_rb = rm.reconstruct(rm.solve(mu_p))
    err = u_det - u_rb
    true_loc = []
    for ss in range(S):
        prod = d.get_local_product(ss, "h1_semi").freeze({})
        e = d.localize_vector(err, ss)
        true_loc.append(float(jnp.sqrt(jnp.maximum(e @ prod.matvec(e), 0))))
    true_loc = np.asarray(true_loc)
    top_true = set(np.argsort(true_loc)[::-1][:10].tolist())
    print("true top-10:", sorted(top_true),
          f"(max {true_loc.max():.3e})", flush=True)

    ep = tc.estimator_parameters()
    for ind_id in ("eta_NC_OS2014", "eta_R_OS2014", "eta_DF_OS2014",
                   "eta_OS2014", "eta_OS2014_*"):
        try:
            ind = np.asarray(BlockSWIPDGEstimators.estimate_local(
                d, u_rb, ind_id, ep))
        except Exception as exc:  # noqa: BLE001
            print(f"{ind_id}: unavailable ({exc})", flush=True)
            continue
        top = set(np.argsort(ind)[::-1][:10].tolist())
        print(f"{ind_id:16s} rho={spearman(ind, true_loc):+.3f} "
              f"overlap={len(top & top_true)}/10 top={sorted(top)}",
              flush=True)

    for ind_id, theta in (("eta_NC_OS2014", 0.85), ("eta_DF_OS2014", 0.85)):
        t1 = time.time()
        res = adaptive_lrbms(
            d, 0.1, ep, initial_local_bases=[b for b in init],
            max_enrichments=3, target_estimate=1e-6,
            marking=("doerfler", theta), marking_estimator_type=ind_id,
            track_true_errors=True, solver_options={"type": "direct"})
        print(f"{ind_id} theta={theta}: true "
              f"{[f'{v:.3e}' for v in res.true_errors]} "
              f"marked={res.enriched_subdomains} ({time.time()-t1:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
