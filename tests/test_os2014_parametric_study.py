"""OS2014 parametric convergence study (analog of the reference's
test/OS2014_parametric_convergence_study.cc: eta_DF comparison over
(mu, mu_bar, mu_hat) triples on the [4 4 1] partitioning).

Our discrete solutions differ slightly from the reference's at mu != 1
because the parametric SWIPDG penalty is frozen at a reference parameter
(penalty once, in the affine part) instead of the reference's per-component
self-weighted penalties (see ops/swipdg.py).  At mu = 1 the schemes coincide
and the values match the reference EXACTLY; elsewhere agreement is 0.05-5%.
OUR values are locked at 0.1%; proximity to the REFERENCE tables
(test/linearelliptic-block-swipdg-expectations_os2014_2daluconform.cxx:
95-190) is asserted at 8%.
"""
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.testcases import OS2014MultiscaleTestCase

# (mu, mu_bar, mu_hat) -> {type: ([our lvl0, our lvl1], [reference lvl0, lvl1])}
CASES = {
    (0.1, 0.1, 0.1): {
        "eta_DF_OS2014": ([1.26608, 0.736650], [1.25, 0.737]),
        "eta_DF_OS2014_*": ([1.26608, 0.736650], [1.25, 0.737]),
        "eta_OS2014": ([2.01309, 1.17973], [1.97, 1.18]),
    },
    (1.0, 1.0, 0.1): {  # mu = 1: scheme == nonparametric -> exact match
        "eta_DF_OS2014": ([1.35747, 1.33230], [1.36, 1.33]),
        "eta_DF_OS2014_*": ([0.413065, 0.204837], [0.413, 0.205]),
        "eta_OS2014": ([4.71077, 4.41936], [4.71, 4.42]),
    },
    (0.1, 0.1, 1.0): {
        "eta_DF_OS2014": ([1.06433, 1.21490], [1.01, 1.21]),
        "eta_DF_OS2014_*": ([1.18629, 0.689966], [1.16, 0.690]),
        "eta_OS2014": ([4.11271, 4.28493], [3.91, 4.27]),
    },
}


@pytest.mark.parametrize("mus", sorted(CASES))
def test_parametric_block_study(mus):
    mu, mu_bar, mu_hat = mus
    tc = OS2014MultiscaleTestCase(
        {"mu": mu, "mu_bar": mu_bar, "mu_hat": mu_hat, "mu_minimizing": 0.1},
        num_partitions=(4, 4),
        num_refinements=1,
    )
    pars = tc.estimator_parameters()
    for lvl in range(2):
        d = BlockSWIPDGDiscretization(
            tc.level_grid(lvl), tc.boundary_info(), tc.problem, num_partitions=(4, 4)
        )
        u = d.solve(tc.parameters["mu"], options={"type": "direct"})
        for t, (ours, ref) in CASES[mus].items():
            val = BlockSWIPDGEstimators.estimate(d, u, t, pars)
            assert val == pytest.approx(ours[lvl], rel=1e-3), (t, lvl)
            assert val == pytest.approx(ref[lvl], rel=0.08), (t, lvl, "reference")


def test_df_star_converges_df_stagnates():
    """The reference's structural observation: for mu != mu_hat the plain
    eta_DF stagnates while the star variant converges at rate ~1
    (BASELINE.md parametric table, rows (1, 1, 0.1))."""
    ours_df, _ref = CASES[(1.0, 1.0, 0.1)]["eta_DF_OS2014"]
    assert ours_df[1] / ours_df[0] > 0.9  # stagnation
    ours_star, _ref = CASES[(1.0, 1.0, 0.1)]["eta_DF_OS2014_*"]
    assert np.log2(ours_star[0] / ours_star[1]) > 0.9  # rate ~ 1
