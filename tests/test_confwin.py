"""Conformance window: non-multiple-of-8 picture sizes are coded at the
next MinCbSizeY multiple with SPS conf_win_*_offsets signalling the crop
(H.265 7.4.3.2; TVideoIOYuv conformance-window handling)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_hop_tpu.io.yuv import write_yuv420
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
from hevc_hop_tpu.models.decoder import Decoder


def synth(w, h, seed=6):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 70 * np.sin(xx / 8.0) * np.cos(yy / 11.0)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
    cb = np.full((h // 2, w // 2), 118, np.int32)
    cr = np.full((h // 2, w // 2), 135, np.int32)
    return y, cb, cr


@pytest.mark.parametrize("w,h", [(100, 52), (90, 66)])
def test_confwin_roundtrip(w, h):
    y, cb, cr = synth(w, h)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30))
    stream = enc.encode_frame(y, cb, cr)
    assert enc.sps.conf_win_right == (-w) % 8
    assert enc.sps.conf_win_bottom == (-h) % 8
    d = Decoder()
    pics = d.decode_stream(stream)
    assert d.hash_ok == [True]
    assert d.picture_md5() == enc.recon_md5()
    dy, dcb, dcr = pics[0]
    assert dy.shape == (h, w) and dcb.shape == (h // 2, w // 2)
    ry, rcb, rcr = enc.recon_yuv
    assert (dy == ry).all() and (dcb == rcb).all() and (dcr == rcr).all()


HM_DEC = "/tmp/hm/bin/TAppDecoderStatic"


@pytest.mark.skipif(not os.path.exists(HM_DEC),
                    reason="reference decoder not built")
def test_hm_decodes_confwin_stream(tmp_path):
    w, h = 100, 52
    y, cb, cr = synth(w, h, seed=2)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30))
    stream = enc.encode_frame(y, cb, cr)
    bs = tmp_path / "cw.bin"
    bs.write_bytes(stream)
    out = tmp_path / "dec.yuv"
    r = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(out)],
                       capture_output=True, timeout=60)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    # HM writes the CROPPED output
    ref = tmp_path / "recon.yuv"
    write_yuv420(str(ref), [enc.recon_yuv])
    assert out.read_bytes() == ref.read_bytes(), "HM decode != our recon"
