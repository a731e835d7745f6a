"""CABAC engine tests: tables vs golden dump, byte-exact stream replay vs the
reference encoder, and encode/decode round-trip fuzz."""
import json
import pathlib
import random

import numpy as np
import pytest

from hevc_hop_tpu.bitstream.bits import BitWriter
from hevc_hop_tpu.entropy import cabac, tables

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hm_golden.json"


@pytest.fixture(scope="module")
def g():
    with open(GOLDEN) as f:
        return json.load(f)


def test_engine_tables_exact(g):
    np.testing.assert_array_equal(tables.LPS_TABLE.ravel(), g["lps_table"])
    np.testing.assert_array_equal(tables.NEXT_STATE_MPS, g["next_state_mps"])
    np.testing.assert_array_equal(tables.NEXT_STATE_LPS, g["next_state_lps"])


def test_ctx_init_mapping_exact(g):
    for qp, iv, state in g["ctx_init_map"]:
        assert tables.init_state(qp, iv) == state, (qp, iv)


def test_golden_stream_byte_exact(g):
    for stream in g["cabac_streams"]:
        ctx = cabac.make_contexts(stream["init_values"], stream["qp"])
        w = BitWriter()
        enc = cabac.CabacEncoder(w)
        for op, ci, b in zip(stream["ops"], stream["cidx"], stream["bins"]):
            if op == 0:
                enc.encode_bin(ctx, ci, b)
            elif op == 1:
                enc.encode_bypass(b)
            else:
                enc.encode_bypass_bins(b, ci)  # ci = num bits here
        enc.encode_terminate(1)
        enc.finish()
        w.write_byte_alignment()
        assert list(w.get_bytes()) == stream["bytes"], stream["qp"]


def test_roundtrip_fuzz():
    rng = random.Random(1234)
    for trial in range(8):
        n_ctx = 6
        qp = rng.randrange(0, 52)
        ivs = [rng.randrange(0, 256) for _ in range(n_ctx)]
        ops = []
        for _ in range(rng.randrange(50, 900)):
            kind = rng.randrange(3)
            if kind == 0:
                ops.append(("ctx", rng.randrange(n_ctx), rng.randrange(2)))
            elif kind == 1:
                ops.append(("ep", None, rng.randrange(2)))
            else:
                nb = rng.randrange(1, 20)
                ops.append(("epn", nb, rng.randrange(1 << nb)))

        ctx = cabac.make_contexts(ivs, qp)
        w = BitWriter()
        enc = cabac.CabacEncoder(w)
        for kind, a, v in ops:
            if kind == "ctx":
                enc.encode_bin(ctx, a, v)
            elif kind == "ep":
                enc.encode_bypass(v)
            else:
                enc.encode_bypass_bins(v, a)
        enc.encode_terminate(1)
        enc.finish()
        w.write_byte_alignment()
        data = w.get_bytes()

        ctx2 = cabac.make_contexts(ivs, qp)
        dec = cabac.CabacDecoder(data)
        for i, (kind, a, v) in enumerate(ops):
            if kind == "ctx":
                got = dec.decode_bin(ctx2, a)
            elif kind == "ep":
                got = dec.decode_bypass()
            else:
                got = dec.decode_bypass_bins(a)
            assert got == v, (trial, i, kind)
        assert dec.decode_terminate() == 1
        assert ctx == ctx2  # decoder state tracked encoder state


def test_bitwriter_reader_roundtrip():
    from hevc_hop_tpu.bitstream.bits import BitReader
    rng = random.Random(7)
    w = BitWriter()
    vals = []
    for _ in range(300):
        kind = rng.randrange(3)
        if kind == 0:
            n = rng.randrange(1, 25)
            v = rng.randrange(1 << n)
            vals.append(("u", n, v))
            w.write(v, n)
        elif kind == 1:
            v = rng.randrange(100000)
            vals.append(("ue", None, v))
            w.write_ue(v)
        else:
            v = rng.randrange(-5000, 5000)
            vals.append(("se", None, v))
            w.write_se(v)
    w.write_byte_alignment()
    r = BitReader(w.get_bytes())
    for kind, n, v in vals:
        if kind == "u":
            assert r.read(n) == v
        elif kind == "ue":
            assert r.read_ue() == v
        else:
            assert r.read_se() == v


def test_ebsp_roundtrip():
    from hevc_hop_tpu.bitstream.bits import ebsp_to_rbsp, rbsp_to_ebsp
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02",
        b"\x00\x00\x02\x00\x00\x03",
        b"\x00\x00\x00\x00\x00\x00",
        bytes(range(256)) * 3,
        b"\xff\x00\x00\x03\x00\x00",
    ]
    rng = random.Random(3)
    cases += [bytes(rng.choices([0, 0, 0, 1, 2, 3, 255], k=200))
              for _ in range(20)]
    for rbsp in cases:
        assert ebsp_to_rbsp(rbsp_to_ebsp(rbsp)) == rbsp
        # no forbidden 00 00 0[0-2] pattern survives in ebsp (00 00 03 is
        # the legal escape)
        e = rbsp_to_ebsp(rbsp)
        for i in range(len(e) - 2):
            assert not (e[i] == 0 and e[i + 1] == 0 and e[i + 2] <= 2), e
