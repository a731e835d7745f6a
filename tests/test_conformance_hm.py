"""Cross-implementation conformance: our encoder's stream decoded by the
reference HM decoder must reconstruct bit-exactly to our encoder's recon.

Requires the reference binaries built in /tmp/hm (see BASELINE.md procedure +
.claude/skills/verify/SKILL.md); skipped if absent. Note: the reference
decoder needs a teardown guard patch for a null SS-ref picture
(TDecTop.cpp:123 area) to avoid a cleanup segfault — decoding itself is
untouched.
"""
import os
import subprocess

import numpy as np
import pytest

from hevc_hop_tpu.io.yuv import write_yuv420
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder

HM_DEC = "/tmp/hm/bin/TAppDecoderStatic"

pytestmark = pytest.mark.skipif(not os.path.exists(HM_DEC),
                                reason="reference decoder not built")


def synth(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (110 + 70 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + 40 * np.sin(xx[::2, ::2] / 15.0)).clip(0, 255).astype(np.int32)
    cr = (120 + (yy[::2, ::2] % 64)).clip(0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.parametrize("w,h,cu_log2,qp", [
    (64, 64, 4, 32),
    (64, 64, 3, 27),
    (96, 64, 5, 37),
    (128, 96, 4, 22),
])
def test_hm_decodes_our_stream(tmp_path, w, h, cu_log2, qp):
    y, cb, cr = synth(w, h, seed=w + h + qp)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp,
                                     cu_log2=cu_log2))
    stream = enc.encode_frame(y, cb, cr)
    bs = tmp_path / "s.bin"
    bs.write_bytes(stream)
    out = tmp_path / "dec.yuv"
    r = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(out)],
                       capture_output=True, timeout=60)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref = tmp_path / "recon.yuv"
    write_yuv420(str(ref), [enc.recon_yuv])
    assert out.read_bytes() == ref.read_bytes(), "HM decode != our recon"
