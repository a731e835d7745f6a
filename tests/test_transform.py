"""Transform/quant unit tests: structure, round-trip, known values.

Golden cross-checks against the reference binaries are in
test_golden_transform.py (generated fixtures).
"""
import numpy as np
import pytest

from hevc_hop_tpu.common import rom
from hevc_hop_tpu.ops import transform, quant


def test_dct4_matrix_known_values():
    t4 = rom.dct_matrix(4)
    expect = np.array([[64, 64, 64, 64],
                       [83, 36, -36, -83],
                       [64, -64, -64, 64],
                       [36, -83, 83, -36]])
    np.testing.assert_array_equal(t4, expect)


def test_dct8_matrix_known_rows():
    t8 = rom.dct_matrix(8)
    np.testing.assert_array_equal(t8[0], [64] * 8)
    np.testing.assert_array_equal(t8[1], [89, 75, 50, 18, -18, -50, -75, -89])
    np.testing.assert_array_equal(t8[4], [64, -64, -64, 64, 64, -64, -64, 64])
    np.testing.assert_array_equal(t8[7], [18, -50, 75, -89, 89, -75, 50, -18])


def test_dct_matrices_near_orthogonal():
    for n in (4, 8, 16, 32):
        t = rom.dct_matrix(n).astype(np.int64)
        g = t @ t.T
        scale = np.diag(g).astype(float)
        # rows should have (close to) equal norm and be near-orthogonal
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() / scale.mean() < 0.02, n


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bit_depth", [8, 10])
def test_transform_roundtrip(n, bit_depth):
    rng = np.random.default_rng(0)
    maxv = (1 << bit_depth) - 1
    resi = rng.integers(-maxv, maxv + 1, size=(5, n, n)).astype(np.int32)
    coef = np.asarray(transform.fwd_transform(resi, bit_depth=bit_depth))
    rec = np.asarray(transform.inv_transform(coef, bit_depth=bit_depth))
    err = np.abs(rec - resi)
    # integer transform round-trip error comes from the basis being only
    # approximately orthogonal; it scales with N and bit depth. Bit-exactness
    # vs the reference math is checked in test_golden_transform.py.
    assert err.max() <= max(2, n * (1 << (bit_depth - 8)) // 2), (
        n, bit_depth, err.max())


def test_dst_roundtrip():
    rng = np.random.default_rng(1)
    resi = rng.integers(-255, 256, size=(7, 4, 4)).astype(np.int32)
    coef = np.asarray(transform.fwd_transform(resi, use_dst=True))
    rec = np.asarray(transform.inv_transform(coef, use_dst=True))
    assert np.abs(rec - resi).max() <= 2


def test_dc_coefficient_position():
    # flat block -> all energy in DC
    resi = np.full((1, 8, 8), 100, np.int32)
    coef = np.array(transform.fwd_transform(resi))
    assert coef[0, 0, 0] != 0
    coef[0, 0, 0] = 0
    assert np.abs(coef).max() == 0


@pytest.mark.parametrize("qp", [0, 17, 22, 32, 37, 51])
@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_quant_dequant_contraction(qp, log2):
    n = 1 << log2
    rng = np.random.default_rng(qp + log2)
    coef = rng.integers(-20000, 20000, size=(3, n, n)).astype(np.int32)
    lev = np.asarray(quant.quant(coef, qp, log2))
    deq = np.asarray(quant.dequant(lev, qp, log2))
    # effective transform-domain quantizer step is 2^qbits / quantScale
    qbits = 14 + qp // 6 + (15 - 8 - log2)
    step = (1 << qbits) / float(rom.QUANT_SCALES[qp % 6])
    assert np.abs(deq - coef).max() <= step + 2, (qp, step)


def test_quant_zero_preserved():
    z = np.zeros((1, 8, 8), np.int32)
    assert np.abs(np.asarray(quant.quant(z, 30, 3))).max() == 0
    assert np.abs(np.asarray(quant.dequant(z, 30, 3))).max() == 0


def test_scan_diag_4x4():
    s = rom.scan_order(2, rom.SCAN_DIAG)
    # H.265 6.5.3 up-right diagonal for 4x4
    expect = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0), (0, 3), (1, 2),
              (2, 1), (3, 0), (1, 3), (2, 2), (3, 1), (2, 3), (3, 2), (3, 3)]
    assert [tuple(p) for p in s] == expect


def test_scan_sizes_complete():
    for log2 in (2, 3, 4, 5):
        for st in (rom.SCAN_DIAG, rom.SCAN_HOR, rom.SCAN_VER):
            s = rom.scan_order(log2, st)
            n = 1 << log2
            assert s.shape == (n * n, 2)
            assert len({(x, y) for x, y in s}) == n * n


def test_chroma_qp_table():
    assert rom.chroma_qp_from_luma(20) == 20
    assert rom.chroma_qp_from_luma(30) == 29
    assert rom.chroma_qp_from_luma(35) == 33
    assert rom.chroma_qp_from_luma(43) == 37
    assert rom.chroma_qp_from_luma(51) == 45
