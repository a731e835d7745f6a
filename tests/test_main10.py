"""Main10 (bit_depth=10) end-to-end: encode -> our decode -> hash verify,
plus reference-decoder conformance (TypeDef.h:299-301 Pel range; SPS
bit_depth_luma/chroma_minus8)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_hop_tpu.io.yuv import write_yuv420
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
from hevc_hop_tpu.models.decoder import Decoder


def synth10(w, h, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (500 + 300 * np.sin(xx / 9.0) * np.cos(yy / 12.0)
         + rng.normal(0, 20, (h, w))).clip(0, 1023).astype(np.int32)
    cb = (512 + 120 * np.sin(xx[::2, ::2] / 14.0)).clip(0, 1023).astype(
        np.int32)
    cr = (512 - 100 * np.cos(yy[::2, ::2] / 10.0)).clip(0, 1023).astype(
        np.int32)
    return y, cb, cr


@pytest.mark.parametrize("qp", [27, 37])
def test_main10_roundtrip(qp):
    w, h = 96, 64
    y, cb, cr = synth10(w, h)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp,
                                     bit_depth=10))
    stream = enc.encode_frame(y, cb, cr)
    d = Decoder()
    d.decode_stream(stream)
    assert d.sps.bit_depth == 10
    assert d.hash_ok == [True]
    assert d.picture_md5() == enc.recon_md5()
    ry = d.pictures[0][0]
    assert ry.max() > 255, "10-bit range never used (weak fixture)"


HM_DEC = "/tmp/hm/bin/TAppDecoderStatic"


@pytest.mark.skipif(not os.path.exists(HM_DEC),
                    reason="reference decoder not built")
def test_hm_decodes_main10_stream(tmp_path):
    w, h = 96, 64
    y, cb, cr = synth10(w, h, seed=3)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30,
                                     bit_depth=10))
    stream = enc.encode_frame(y, cb, cr)
    bs = tmp_path / "m10.bin"
    bs.write_bytes(stream)
    out = tmp_path / "dec.yuv"
    r = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(out)],
                       capture_output=True, timeout=60)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref = tmp_path / "recon.yuv"
    write_yuv420(str(ref), [enc.recon_yuv], bit_depth=10)
    assert out.read_bytes() == ref.read_bytes(), "HM decode != our recon"
