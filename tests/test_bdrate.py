"""Compression-quality regression vs stored HM anchors (the north-star
BD-rate oracle, BASELINE.md "BD-rate parity" target).

tests/golden/bdrate.json stores the reference encoder's (bytes, PSNR)
points on the harness fixtures (tools/bdrate.py --quick --update-golden;
needs /tmp/hm binaries to refresh). This test re-runs OUR encoder on the
same fixtures and asserts the Bjontegaard delta against the stored HM
anchors stays under the recorded ceiling — so quality regressions fail CI
without needing HM at test time.
"""
import json
import os

import numpy as np
import pytest

import tools.bdrate as bd

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bdrate.json")

# Regression ceilings: current measured BD-rate + slack. Ratchet DOWN as
# the encoder improves; never loosen without a recorded justification.
CEILING_CLASSB = 14.0   # measured +11.1% (round 5: top-3 mode RD, NxN,
#                         residual quadtree, RD-aware SBH)
CEILING_LENSLET = 49.0  # measured +45.7% (round 5: pre-pass RD modes fed
#                         into the ISS scan, GT ring + exact corner bits)

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="bdrate golden not generated")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        g = json.load(f)
    assert g.get("quick"), "golden must be the --quick fixture"
    return g


def test_classb_intra_bdrate_ceiling(golden):
    frame = bd.classb_frame(640, 384)
    ours = bd.sweep(bd.run_ours_intra, frame, "ours")
    hm = golden["hm_classb_intra"]
    bdr = bd.bd_rate(hm["bytes"], hm["wpsnr"], ours["bytes"], ours["wpsnr"])
    assert bdr < CEILING_CLASSB, f"class-B BD-rate regressed: {bdr:+.2f}%"


def test_lenslet_iss_bdrate_ceiling(golden):
    frame = bd.lenslet_frame()
    ours = bd.sweep(bd.run_ours_iss, frame, "ours-iss", mi=16)
    hm = golden["hm_lenslet_iss"]
    bdr = bd.bd_rate(hm["bytes"], hm["wpsnr"], ours["bytes"], ours["wpsnr"])
    assert bdr < CEILING_LENSLET, f"lenslet BD-rate regressed: {bdr:+.2f}%"


def test_hm_anchor_curve_monotone(golden):
    """Guard the fixture quality: the HM anchor RD curves must be strictly
    monotone in rate and PSNR, or the Bjontegaard fit is meaningless (the
    round-2 fixture collapse)."""
    for key in ("hm_classb_intra", "hm_lenslet_iss"):
        r = np.array(golden[key]["bytes"], float)
        p = np.array(golden[key]["wpsnr"], float)
        assert (np.diff(r) < 0).all(), (key, r)
        assert (np.diff(p) < 0).all(), (key, p)
        # adjacent QP points must not collapse by >20x in rate
        assert (r[:-1] / r[1:] < 20).all(), (key, r)
