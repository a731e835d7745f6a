"""WPP (entropy_coding_sync) substreams: parallel per-CTU-row CABAC.

Reference: TEncSlice.cpp:1049,1158-1160 (context snapshot after the 2nd
CTU, per-row substreams), TDecSlice.cpp:262,371; entry points
TEncCavlc.cpp:1002 codeTilesWPPEntryPoint."""
import os
import subprocess

import numpy as np
import pytest

from hevc_hop_tpu.bitstream import nal
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
from hevc_hop_tpu.models.decoder import Decoder


def synth(w, h, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 80 * np.sin(xx / 11.0) * np.cos(yy / 13.0)
         + rng.normal(0, 7, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + 30 * np.cos(xx[::2, ::2] / 9.0)).clip(0, 255).astype(np.int32)
    cr = (128 - 25 * np.sin(yy[::2, ::2] / 8.0)).clip(0, 255).astype(np.int32)
    return y, cb, cr


def test_ep_wire_roundtrip():
    rng = np.random.default_rng(0)
    # craft data with start-code-emulation patterns at substream seams
    subs = [bytes([0, 0, 1, 5, 0, 0]) + bytes(rng.integers(0, 4, 20
                                                           ).astype(np.uint8))
            + b"\x81",
            bytes([0, 0, 0, 0, 2]) + b"\x80",
            bytes(rng.integers(0, 256, 33).astype(np.uint8)) + b"\x80"]
    data = b"".join(subs)
    wire = [len(s) + nal.ep_insert_count(s) for s in subs]
    back = nal.unwire_substream_sizes(data, wire[:-1])
    assert back == [len(s) for s in subs]


@pytest.mark.parametrize("w,h,qp", [(96, 96, 32), (160, 128, 27)])
def test_wpp_roundtrip(w, h, qp):
    y, cb, cr = synth(w, h)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp, wpp=True,
                                     sao=True))
    stream = enc.encode_frame(y, cb, cr)
    d = Decoder()
    d.decode_stream(stream)
    assert d.hash_ok == [True]
    assert d.picture_md5() == enc.recon_md5()
    # WPP changes only the entropy layer: recon must equal non-WPP
    enc2 = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp, wpp=False,
                                      sao=True))
    enc2.encode_frame(y, cb, cr)
    assert enc2.recon_md5() == enc.recon_md5()


HM_DEC = "/tmp/hm/bin/TAppDecoderStatic"


@pytest.mark.skipif(not os.path.exists(HM_DEC),
                    reason="reference decoder not built")
def test_hm_decodes_wpp_stream(tmp_path):
    from hevc_hop_tpu.io.yuv import write_yuv420
    w, h = 160, 96
    y, cb, cr = synth(w, h, seed=4)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30, wpp=True))
    stream = enc.encode_frame(y, cb, cr)
    bs = tmp_path / "wpp.bin"
    bs.write_bytes(stream)
    out = tmp_path / "dec.yuv"
    r = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(out)],
                       capture_output=True, timeout=60)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref = tmp_path / "recon.yuv"
    write_yuv420(str(ref), [enc.recon_yuv])
    assert out.read_bytes() == ref.read_bytes(), "HM decode != our recon"
