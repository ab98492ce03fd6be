"""Localization study (OS2014_localization_study.cc analog)."""
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
from dune_hdd_tpu.functions import Testcase1ExactSolution
from dune_hdd_tpu.grid import alu_cube_grid
from dune_hdd_tpu.problems import ESV2007Problem
from dune_hdd_tpu.studies.localization import localization_study, true_local_indicators

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


def test_localization_esv2007_symmetric():
    """ESV2007 is symmetric: both distributions are uniform over a [2 2]
    partition and perfectly correlated."""
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(2, 2))
    u = d.solve(options={"type": "direct"})
    est, true, corr = localization_study(d, u, Testcase1ExactSolution())
    # rtol 1e-6: dune's conical quadrature rules are not symmetric under
    # the triangle symmetries, so the four quadrants differ by the (tiny)
    # quadrature error of the non-polynomial force
    np.testing.assert_allclose(true, 0.25, rtol=1e-6)
    np.testing.assert_allclose(est, 0.25, rtol=1e-6)


@pytest.mark.slow
def test_localization_orders_asymmetric_error():
    """Break the symmetry with a [4 1] partition: subdomains in the middle of
    [-1,1]^2 carry more energy error than the outer ones for cos*cos; the
    estimator must reproduce that ordering."""
    g = alu_cube_grid((-1, -1), (1, 1), (4, 4), refinements=2)
    d = BlockSWIPDGDiscretization(g, BI, ESV2007Problem(), num_partitions=(4, 1))
    u = d.solve(options={"type": "direct"})
    est, true, corr = localization_study(d, u, Testcase1ExactSolution())
    assert corr > 0.9, (est, true, corr)
    # left/right symmetric pairs carry equal shares, and the outer strips
    # carry more than the middle ones (the mixed derivative u_xy of cos*cos
    # peaks towards the corners); estimator and truth agree on the structure
    for dist in (est, true):
        np.testing.assert_allclose(dist[0], dist[3], rtol=1e-6)
        np.testing.assert_allclose(dist[1], dist[2], rtol=1e-6)
    assert (est[0] > est[1]) == (true[0] > true[1])
