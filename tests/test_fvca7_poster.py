"""FVCA7-poster workflow lock (test/OS2014-FVCA7-poster.cc:53-85):
the CLI block-study workflow (cli/main.py fvca7_poster_study) asserted
against the RECORDED expectation table — BlockSWIPDG on ESV2007 over
partitionings 1/4/16/64 subdomains, energy error + eta_OS2014 + efficiency
per level.  The efficiencies additionally reproduce the reference's
per-partitioning eff_OS2014 recordings to <1%."""
import numpy as np
import pytest

from dune_hdd_tpu.cli.main import fvca7_poster_study
from dune_hdd_tpu.studies.expectations import expected_results

REF_EFF_LEVEL0 = {  # reference eff_OS2014 rows, first level
    "[1 1 1]": 3.35, "[2 2 1]": 2.47, "[4 4 1]": 2.03, "[8 8 1]": 1.81,
}


@pytest.mark.slow
def test_fvca7_poster_workflow_matches_recorded_table():
    results = fvca7_poster_study()
    assert set(results) == set(REF_EFF_LEVEL0)
    for part, rows in results.items():
        for typ in ("energy", "eta_OS2014", "eff_OS2014"):
            exp = expected_results(f"FVCA7.poster.{part}", "alu_conforming",
                                   1, typ)
            assert exp is not None, (part, typ)
            np.testing.assert_allclose(rows[typ], exp, rtol=2e-3,
                                       err_msg=f"{part} {typ}")
        # and the reference's own eff recording (BASELINE.md row)
        assert abs(rows["eff_OS2014"][0] - REF_EFF_LEVEL0[part]) < 0.01 * 3.4
