"""End-to-end all-intra encode -> decode -> exact reconstruction match.

This is the codec-standard integration oracle (SURVEY.md §4.1): the decoder's
output must be bit-identical to the encoder's reconstruction (picture MD5).
"""
import numpy as np
import pytest

from hevc_hop_tpu.models.decoder import Decoder
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder


def synth_frame(w, h, seed=0, kind="mix"):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "mix":
        y = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
             + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
    elif kind == "flat":
        y = np.full((h, w), 100, np.int32)
    elif kind == "noise":
        y = rng.integers(0, 256, (h, w)).astype(np.int32)
    else:  # edges
        y = ((xx // 16 + yy // 16) % 2 * 200 + 28).astype(np.int32)
    cb = (128 + 30 * np.sin(xx[::2, ::2] / 17.0)).clip(0, 255).astype(np.int32)
    cr = (128 - 25 * np.cos(yy[::2, ::2] / 11.0)).clip(0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.parametrize("cu_log2", [3, 4, 5])
@pytest.mark.parametrize("qp", [22, 32, 45])
def test_roundtrip_64x64(cu_log2, qp):
    y, cb, cr = synth_frame(64, 64, seed=cu_log2 * 100 + qp)
    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=qp,
                                     cu_log2=cu_log2))
    stream = enc.encode_frame(y, cb, cr)
    dec = Decoder()
    frames = dec.decode_stream(stream)
    assert len(frames) == 1
    dy, dcb, dcr = frames[0]
    ey, ecb, ecr = enc.recon_yuv
    np.testing.assert_array_equal(dy, ey, err_msg="luma")
    np.testing.assert_array_equal(dcb, ecb, err_msg="cb")
    np.testing.assert_array_equal(dcr, ecr, err_msg="cr")
    assert dec.picture_md5() == enc.recon_md5()


@pytest.mark.parametrize("kind", ["flat", "noise", "edges"])
def test_roundtrip_content_types(kind):
    y, cb, cr = synth_frame(96, 64, seed=7, kind=kind)
    enc = IntraEncoder(EncoderConfig(width=96, height=64, qp=30, cu_log2=4))
    stream = enc.encode_frame(y, cb, cr)
    dec = Decoder()
    (dy, dcb, dcr), = dec.decode_stream(stream)
    ey, ecb, ecr = enc.recon_yuv
    np.testing.assert_array_equal(dy, ey)
    np.testing.assert_array_equal(dcb, ecb)
    np.testing.assert_array_equal(dcr, ecr)


def test_quality_sane():
    """Recon must actually resemble the input (PSNR sanity)."""
    y, cb, cr = synth_frame(64, 64, seed=3)
    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=22, cu_log2=4))
    enc.encode_frame(y, cb, cr)
    ey, _, _ = enc.recon_yuv
    mse = np.mean((ey.astype(np.float64) - y) ** 2)
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 32, psnr
