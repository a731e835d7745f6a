"""GT warp ops vs reference golden vectors (xPredGTLuma cases)."""
import json
import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

from hevc_hop_tpu.ops import warp

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hm_golden.json"


@pytest.fixture(scope="module")
def g():
    with open(GOLDEN) as f:
        return json.load(f)


def test_identity_warp():
    n = 8
    rng = np.random.default_rng(0)
    win = rng.integers(0, 256, (1, 2 * n, 2 * n)).astype(np.int32)
    gt = np.zeros((1, 4, 2), np.int32)
    out, safe = warp.warp_blocks(jnp.asarray(win), jnp.asarray(gt), n)
    # identity: central block of the window. Integer coordinate hits are
    # interior/positive here, so the block is still reference-safe.
    np.testing.assert_array_equal(
        np.asarray(out)[0], win[0, n // 2:n // 2 + n, n // 2:n // 2 + n])
    assert bool(safe[0])


def test_warp_golden(g):
    for case in g["gt_warp"]:
        n = case["n"]
        gtv = np.array(case["gt"], np.int32).reshape(1, 4, 2)
        win = np.array(case["win"], np.int32).reshape(1, 2 * n, 2 * n)
        out, safe = warp.warp_blocks(jnp.asarray(win), jnp.asarray(gtv), n)
        out = np.asarray(out)
        ref = np.array(case["dst"]).reshape(n, n)
        diff = np.abs(out[0] - ref)
        if bool(safe[0]):
            # exact integer arithmetic == the reference's float64 result
            # everywhere off the knife edges
            np.testing.assert_array_equal(out[0], ref)
        else:
            # knife-edge block: the reference's float64 may round either
            # way; exact-rational result within 1 LSB
            frac_exact = float((diff == 0).mean())
            assert diff.max() <= 1 and frac_exact > 0.9, (
                n, case["gt"], diff.max(), frac_exact)


def test_affine_mask():
    n = 8
    # a genuinely projective corner set must be flagged non-affine
    gt = np.array([[[0, 0], [2, 0], [0, 0], [0, 0]]], np.int32)
    cx, cy = warp.corners_from_offsets(jnp.asarray(gt), n)
    h = warp.calc_param_projective(cx, cy, warp.GRID * n, warp.GRID * n)
    assert not bool(warp.is_affine(h, eps=1e-6)[0])
    # affine set (corner2 = c1 + c3 - c0) passes
    gt2 = np.array([[[1, 1], [2, 0], [3, 2], [2, 3]]], np.int32)
    cx, cy = warp.corners_from_offsets(jnp.asarray(gt2), n)
    h2 = warp.calc_param_projective(cx, cy, warp.GRID * n, warp.GRID * n)
    assert bool(warp.is_affine(h2, eps=1e-5)[0])
