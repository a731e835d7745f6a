"""Bit-exactness tests vs golden fixtures generated from the reference HM
libraries (tests/golden/hm_golden.json, produced by a dump tool linking the
reference's TLibCommon — see BASELINE.md procedure)."""
import json
import pathlib

import numpy as np
import pytest

from hevc_hop_tpu.common import rom
from hevc_hop_tpu.ops import transform

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hm_golden.json"


@pytest.fixture(scope="module")
def g():
    with open(GOLDEN) as f:
        return json.load(f)


def test_dct_matrices_exact(g):
    for n in (4, 8, 16, 32):
        mine = rom.dct_matrix(n).ravel()
        ref = np.array(g[f"g_aiT{n}"])
        np.testing.assert_array_equal(mine, ref, err_msg=f"T{n}")


def test_quant_scales_exact(g):
    np.testing.assert_array_equal(rom.QUANT_SCALES, g["g_quantScales"])
    np.testing.assert_array_equal(rom.INV_QUANT_SCALES, g["g_invQuantScales"])


def test_chroma_qp_exact(g):
    np.testing.assert_array_equal(rom.CHROMA_QP_TABLE, g["g_aucChromaScale"])


def test_scan_orders_exact(g):
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        for st in (0, 1, 2):
            mine = rom.scan_raster_index(log2, st)
            ref = np.array(g["scans"][f"scan_{n}_{st}"])
            np.testing.assert_array_equal(mine, ref, err_msg=f"{n}x{n} s{st}")


def test_transform_pairs_bit_exact(g):
    for case in g["transforms"]:
        n, bd, dst = case["n"], case["bd"], bool(case["dst"])
        resi = np.array(case["resi"], np.int32).reshape(1, n, n)
        coeff = np.asarray(transform.fwd_transform(resi, bit_depth=bd,
                                                   use_dst=dst))
        np.testing.assert_array_equal(
            coeff.ravel(), case["coeff"], err_msg=f"fwd n={n} bd={bd} dst={dst}")
        cin = np.array(case["coeff_in"], np.int32).reshape(1, n, n)
        rout = np.asarray(transform.inv_transform(cin, bit_depth=bd,
                                                  use_dst=dst))
        np.testing.assert_array_equal(
            rout.ravel(), case["resi_out"],
            err_msg=f"inv n={n} bd={bd} dst={dst}")
