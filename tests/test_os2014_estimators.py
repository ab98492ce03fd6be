"""OS2014 block estimator regression vs the reference expectation tables
(test/linearelliptic-block-swipdg-expectations_esv2007_2daluconform.cxx)."""
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.estimators.block_swipdg import BlockSWIPDGEstimators
from dune_hdd_tpu.functions import Testcase1ExactSolution
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.ops import error_norms
from dune_hdd_tpu.problems import ESV2007Problem

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}

# partitioning -> (eta_R_OS2014, eta_OS2014, eff_OS2014) at level 0
TABLE = {
    (1, 1): (5.79e-1, 1.10, 3.35),
    (2, 2): (2.89e-1, 8.10e-1, 2.47),
    (8, 8): (7.23e-2, 5.93e-1, 1.81),
}

# full reference tables (all 4 levels x 4 partitionings,
# ..._esv2007_2daluconform.cxx:33-137); level r grid = 2+2r bisections
DEEP = {
    (1, 1): {
        "eta_R_OS2014": [5.79e-01, 2.90e-01, 1.45e-01, 7.27e-02],
        "eta_OS2014": [1.10, 5.45e-01, 2.72e-01, 1.36e-01],
        "eff_OS2014": [3.35, 3.37, 3.38, 3.39],
    },
    (2, 2): {
        "eta_R_OS2014": [2.89e-01, 1.45e-01, 7.27e-02, 3.63e-02],
        "eta_OS2014": [8.10e-01, 4.00e-01, 1.99e-01, 9.94e-02],
        "eff_OS2014": [2.47, 2.47, 2.48, 2.48],
    },
    (4, 4): {
        "eta_R_OS2014": [1.45e-01, 7.26e-02, 3.63e-02, 1.82e-02],
        "eta_OS2014": [6.65e-01, 3.27e-01, 1.63e-01, 8.12e-02],
        "eff_OS2014": [2.03, 2.02, 2.02, 2.03],
    },
    (8, 8): {
        "eta_R_OS2014": [7.23e-02, 3.63e-02, 1.82e-02, 9.09e-03],
        "eta_OS2014": [5.93e-01, 2.91e-01, 1.45e-01, 7.21e-02],
        "eff_OS2014": [1.81, 1.80, 1.80, 1.80],
    },
}
COMMON = {
    "eta_NC_OS2014": [1.66e-01, 7.89e-02, 3.91e-02, 1.95e-02],
    "eta_DF_OS2014": [3.55e-01, 1.76e-01, 8.73e-02, 4.35e-02],
}


@pytest.mark.parametrize("part", sorted(TABLE))
def test_os2014_matches_reference_tables(part):
    ref_r, ref_os, ref_eff = TABLE[part]
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=part)
    u = d.solve(options={"type": "direct"})
    eta_r = BlockSWIPDGEstimators.estimate(d, u, "eta_R_OS2014")
    eta_os = BlockSWIPDGEstimators.estimate(d, u, "eta_OS2014")
    e = error_norms(d.space, u, Testcase1ExactSolution())
    assert eta_r == pytest.approx(ref_r, rel=5e-3)
    assert eta_os == pytest.approx(ref_os, rel=5e-3)
    assert eta_os / e["H1_semi"] == pytest.approx(ref_eff, rel=5e-3)


@pytest.mark.slow
@pytest.mark.parametrize("part", sorted(DEEP))
def test_os2014_full_reference_tables(part):
    """Every level of every partitioning of the reference block table
    (verdict item 10: all 4 levels x 4 partitionings; 3-digit rounding)."""
    for lvl in range(4):
        g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2 + 2 * lvl)
        d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=part)
        u = d.solve(options={"type": "direct"})
        e = error_norms(d.space, u, Testcase1ExactSolution())
        for t, vals in {**DEEP[part], **COMMON}.items():
            if t == "eff_OS2014":
                got = BlockSWIPDGEstimators.estimate(d, u, "eta_OS2014") / e["H1_semi"]
            else:
                got = BlockSWIPDGEstimators.estimate(d, u, t)
            assert got == pytest.approx(vals[lvl], rel=6e-3), (part, lvl, t)


def test_os2014_star_equals_plain_nonparametric():
    """For nonparametric problems the star variants coincide
    (eta_DF_OS2014 = eta_DF_OS2014_* in the tables, BASELINE.md)."""
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(2, 2))
    u = d.solve(options={"type": "direct"})
    df = BlockSWIPDGEstimators.estimate(d, u, "eta_DF_OS2014")
    df_star = BlockSWIPDGEstimators.estimate(d, u, "eta_DF_OS2014_*")
    assert df == pytest.approx(df_star, rel=1e-12)
    os_ = BlockSWIPDGEstimators.estimate(d, u, "eta_OS2014")
    os_star = BlockSWIPDGEstimators.estimate(d, u, "eta_OS2014_*")
    assert os_ == pytest.approx(os_star, rel=1e-12)


def test_os2014_estimate_local_per_subdomain():
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(2, 2))
    u = d.solve(options={"type": "direct"})
    ind = BlockSWIPDGEstimators.estimate_local(d, u, "eta_OS2014")
    assert ind.shape == (4,)
    assert (ind > 0).all()
    # reference scaling: sum of indicators ~ 3 * (sum of squares terms)/eta^2;
    # for the symmetric ESV2007 problem all four subdomains contribute equally
    # (up to quadrature error of the non-polynomial force: dune's conical
    # rules are not symmetric under the triangle symmetries)
    np.testing.assert_allclose(ind, ind[0], rtol=1e-5)


def test_unknown_type_rejected():
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(2, 2))
    u = d.solve(options={"type": "direct"})
    with pytest.raises(ValueError):
        BlockSWIPDGEstimators.estimate(d, u, "eta_bogus")


def test_indicator_visualization(tmp_path):
    import os

    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(2, 2))
    u = d.solve(options={"type": "direct"})
    path = BlockSWIPDGEstimators.visualize(d, u, "eta_OS2014", str(tmp_path / "ind"))
    assert os.path.isfile(path)
    assert "eta_OS2014" in open(path).read()
