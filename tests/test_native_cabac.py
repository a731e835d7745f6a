"""Native C++ CABAC/syntax runtime tests: golden byte-exactness, residual
round-trip fuzz, full slice-data round-trip fuzz."""
import json
import pathlib
import random

import numpy as np
import pytest

from hevc_hop_tpu.entropy import cabac, ctx_layout, native

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hm_golden.json"


@pytest.fixture(scope="module")
def lib():
    return native.get_lib()


@pytest.fixture(scope="module")
def g():
    with open(GOLDEN) as f:
        return json.load(f)


def test_num_ctx_matches(lib):
    assert lib.hevc_num_ctx() == ctx_layout.NUM_CTX


def test_native_engine_golden_byte_exact(lib, g):
    for stream in g["cabac_streams"]:
        states = np.array(
            [cabac.tables.init_state(stream["qp"], iv)
             for iv in stream["init_values"]], np.uint8)
        ops, cidx, bins = (np.array(stream["ops"], np.int32),
                           np.array(stream["cidx"], np.int32),
                           np.array(stream["bins"], np.int32))
        out = np.zeros(1 << 20, np.uint8)
        n = lib.cabac_encode_ops(states, len(states), ops, cidx, bins,
                                 len(ops), out, out.size)
        assert list(out[:n]) == stream["bytes"]
        # decode side round-trips
        vals = np.zeros(len(ops), np.int32)
        term = lib.cabac_decode_ops(states, len(states), ops, cidx, vals,
                                    len(ops), out[:n], n)
        assert term == 1
        np.testing.assert_array_equal(vals, bins)


def _rand_coefs(rng, n, density):
    c = np.zeros((n, n), np.int16)
    num = max(1, int(n * n * density))
    ys = rng.choices(range(n), k=num)
    xs = rng.choices(range(n), k=num)
    for y, x in zip(ys, xs):
        mag = min(int(rng.expovariate(0.08)) + 1, 30000)
        c[y, x] = mag if rng.random() < 0.5 else -mag
    return c


def test_residual_roundtrip_fuzz(lib):
    rng = random.Random(99)
    states = ctx_layout.init_states(2, 32)
    out = np.zeros(1 << 20, np.uint8)
    for trial in range(150):
        log2 = rng.choice([2, 3, 4, 5])
        c_idx = rng.choice([0, 0, 1, 2])
        if c_idx and log2 == 5:
            log2 = 4
        mode = rng.randrange(35)
        density = rng.choice([0.02, 0.1, 0.4, 0.9])
        coef = _rand_coefs(rng, 1 << log2, density)
        n = lib.residual_encode_one(states, np.ascontiguousarray(coef),
                                    log2, c_idx, mode, out, out.size)
        assert n > 0
        dec = np.zeros_like(coef)
        term = lib.residual_decode_one(states, dec, log2, c_idx, mode,
                                       out[:n], n)
        assert term == 1, (trial, log2, c_idx, mode)
        np.testing.assert_array_equal(dec, coef,
                                      err_msg=f"t{trial} n{1<<log2} c{c_idx}")


def test_slice_data_roundtrip_fuzz(lib):
    rng = random.Random(5)
    for trial in range(6):
        w, h = rng.choice([(64, 64), (96, 64), (64, 32), (128, 96)])
        maps = native.SliceMaps(w, h, ctb_log2=5)
        # random quadtree: depth per 32x32 CTU region
        for cy in range(0, h, 32):
            for cx in range(0, w, 32):
                d = rng.choice([0, 1, 1, 2])
                # assign uniform depth per CTU or mixed
                if rng.random() < 0.5:
                    maps.depth8[cy // 8:(cy + 32) // 8,
                                cx // 8:(cx + 32) // 8] = d
                else:
                    for sy in range(cy, min(cy + 32, h), 16):
                        for sx in range(cx, min(cx + 32, w), 16):
                            dd = rng.choice([1, 2, 2])
                            maps.depth8[sy // 8:(sy + 16) // 8,
                                        sx // 8:(sx + 16) // 8] = dd
        # modes: uniform per CU area; collect leaf CUs
        def leaves():
            out = []
            def rec(x, y, log2):
                size = 1 << log2
                if x >= w or y >= h:
                    return
                inside = x + size <= w and y + size <= h
                depth_here = maps.depth8[y // 8, x // 8]
                my_depth = 5 - log2
                split = (depth_here > my_depth) if inside else (log2 > 3)
                if split:
                    half = size // 2
                    for (yy, xx) in ((y, x), (y, x + half), (y + half, x),
                                     (y + half, x + half)):
                        rec(xx, yy, log2 - 1)
                else:
                    out.append((x, y, log2))
            for cy in range(0, h, 32):
                for cx in range(0, w, 32):
                    rec(cx, cy, 5)
            return out

        for (x, y, log2) in leaves():
            size = 1 << log2
            part_nxn = log2 == 3 and rng.random() < 0.4
            maps.part8[y // 8, x // 8] = 3 if part_nxn else 0
            n_pu = 4 if part_nxn else 1
            pu = size // 2 if part_nxn else size
            for i in range(n_pu):
                px, py = x + (i % 2) * pu, y + (i // 2) * pu
                maps.mode4[py // 4:(py + pu) // 4,
                           px // 4:(px + pu) // 4] = rng.randrange(35)
            if rng.random() < 0.7:
                cmode = 36  # DM
            else:
                # must come from the actual chroma candidate list
                luma0 = int(maps.mode4[y // 4, x // 4])
                clist = [0, 26, 10, 1]
                for k in range(4):
                    if clist[k] == luma0:
                        clist[k] = 34
                        break
                cmode = rng.choice(clist)
            maps.cmode8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = cmode
            # random coefficients per luma TU (TU = CU except NxN -> 4x4)
            if rng.random() < 0.8:
                tu = 4 if part_nxn else size
                for ty in range(y, y + size, tu):
                    for tx in range(x, x + size, tu):
                        if rng.random() < 0.8:
                            c = _rand_coefs(rng, tu, rng.choice([0.05, 0.3]))
                            maps.coef_y[ty:ty + tu, tx:tx + tu] = c
                            maps.cbf4_y[ty // 4:(ty + tu) // 4,
                                        tx // 4:(tx + tu) // 4] = (
                                np.abs(c).max() > 0)
            # chroma (TU at CU level, size/2 but min 4)
            csize = max(size // 2, 4)
            if rng.random() < 0.5:
                c = _rand_coefs(rng, csize, 0.1)
                maps.coef_cb[y // 2:y // 2 + csize, x // 2:x // 2 + csize] = c
                maps.cbf8_cb[y // 8:(y + size) // 8,
                             x // 8:(x + size) // 8] = np.abs(c).max() > 0
            if rng.random() < 0.5:
                c = _rand_coefs(rng, csize, 0.1)
                maps.coef_cr[y // 2:y // 2 + csize, x // 2:x // 2 + csize] = c
                maps.cbf8_cr[y // 8:(y + size) // 8,
                             x // 8:(x + size) // 8] = np.abs(c).max() > 0

        states = ctx_layout.init_states(2, 27)
        payload = native.encode_slice_data(states, maps)
        dec = native.decode_slice_data(states, payload, w, h, 5)

        np.testing.assert_array_equal(dec.depth8, maps.depth8, err_msg="depth")
        np.testing.assert_array_equal(dec.mode4, maps.mode4, err_msg="mode")
        np.testing.assert_array_equal(dec.part8, maps.part8, err_msg="part")
        np.testing.assert_array_equal(dec.cmode8, maps.cmode8, err_msg="cmode")
        np.testing.assert_array_equal(dec.cbf4_y, maps.cbf4_y, err_msg="cbfy")
        np.testing.assert_array_equal(dec.coef_y, maps.coef_y, err_msg="coefy")
        np.testing.assert_array_equal(dec.coef_cb, maps.coef_cb, err_msg="cb")
        np.testing.assert_array_equal(dec.coef_cr, maps.coef_cr, err_msg="cr")
