"""OS2014 mu != 1 forensics (VERDICT r2 item 5, ROADMAP item 7).

Candidates for the reference's u(mu) at mu = 0.1 (where our eta_DF deviates
3-14% from the published [4 4 1] tables while mu = 1 matches exactly):

  affine   — our default: solve the self-weighted affine sum (swipdg.hh:222-249)
  frozen   — assemble the NONPARAMETRIC SWIPDG of the frozen problem at mu
             (weights/penalty from the full diffusion 1 + 0.675 sin)
  penalty1 — penalty_mu scheme frozen at ones

Published targets (test/linearelliptic-block-swipdg-expectations_os2014_
2daluconform.cxx:95-190, levels 0-1):
  (0.1,0.1,0.1): eta_DF 1.25/0.737, eta 1.97/1.18
  (0.1,0.1,1.0): eta_DF 1.01/1.21, eta_DF_* 1.16/0.690, eta 3.91/4.27
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/dune_hdd_tpu_jax_cache")

import numpy as np

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.discretizations.swipdg import SWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.problems.zero_boundary import ZeroBoundaryProblem
from dune_hdd_tpu.testcases import OS2014MultiscaleTestCase

PUBLISHED = {
    (0.1, 0.1, 0.1): {"eta_DF_OS2014": [1.25, 0.737], "eta_OS2014": [1.97, 1.18]},
    (0.1, 0.1, 1.0): {"eta_DF_OS2014": [1.01, 1.21],
                      "eta_DF_OS2014_*": [1.16, 0.690],
                      "eta_OS2014": [3.91, 4.27]},
}


def run(mus, level, variant):
    mu, mu_bar, mu_hat = mus
    tc = OS2014MultiscaleTestCase(
        {"mu": mu, "mu_bar": mu_bar, "mu_hat": mu_hat, "mu_minimizing": 0.1},
        num_partitions=(4, 4), num_refinements=level,
    )
    pars = tc.estimator_parameters()
    grid = tc.level_grid(level)
    d = BlockSWIPDGDiscretization(grid, tc.boundary_info(), tc.problem,
                                  num_partitions=(4, 4))
    if variant == "affine":
        u = d.solve(tc.parameters["mu"], options={"type": "direct"})
    elif variant == "frozen":
        frozen_problem = tc.problem.with_mu({"mu": np.asarray([mu])})
        df = SWIPDGDiscretization(grid, tc.boundary_info(), frozen_problem)
        u = df.solve({}, options={"type": "direct"})
    elif variant == "penalty1":
        dp = SWIPDGDiscretization(grid, tc.boundary_info(), tc.problem,
                                  scheme="penalty_mu")
        u = dp.solve(tc.parameters["mu"], options={"type": "direct"})
    out = {}
    for t in PUBLISHED[mus]:
        out[t] = float(BlockSWIPDGEstimators.estimate(d, u, t, pars))
    return out


def main():
    for mus in PUBLISHED:
        for level in (0, 1):
            row = {}
            for variant in ("affine", "frozen", "penalty1"):
                row[variant] = run(mus, level, variant)
            print(f"--- mus={mus} level={level}", flush=True)
            for t, pub in PUBLISHED[mus].items():
                line = f"  {t:18s} pub={pub[level]:7.3f}"
                for variant in row:
                    v = row[variant][t]
                    line += f"  {variant}={v:7.4f} ({(v/pub[level]-1)*100:+5.1f}%)"
                print(line, flush=True)


if __name__ == "__main__":
    main()
