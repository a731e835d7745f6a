"""End-to-end ISS (self-similarity / holoscopic) coding: encode -> decode ->
bit-exact recon hash, on synthetic lenslet content. The codec-standard
integration oracle (SURVEY.md §4.1: encoder recon must equal decoder out)."""
import numpy as np
import pytest

from hevc_hop_tpu.models.decoder import Decoder
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
from hevc_hop_tpu.models.ss_encoder import HoloConfig, HoloEncoder


def synth_lenslet(w, h, mi, seed=3):
    """Micro-image grid of period mi with slow drift + noise."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (mi, mi))
    yy, xx = np.mgrid[0:h, 0:w]
    y = (base[yy % mi, xx % mi] + 0.2 * xx + 0.1 * yy
         + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + base[yy[::2, ::2] % mi, xx[::2, ::2] % mi] // 8
          ).clip(0, 255).astype(np.int32)
    cr = (128 - base[(yy[::2, ::2] + 5) % mi, xx[::2, ::2] % mi] // 8
          ).clip(0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.parametrize("w,h,cu_log2,qp,mi,sr", [
    (96, 64, 4, 32, 13, 32),
    (64, 64, 3, 27, 8, 24),
    (128, 96, 4, 37, 15, 32),
])
def test_iss_roundtrip_bit_exact(w, h, cu_log2, qp, mi, sr):
    y, cb, cr = synth_lenslet(w, h, mi, seed=w + qp)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=qp, cu_log2=cu_log2,
                                 search_range=sr, mi_size=mi))
    stream = enc.encode_frame(y, cb, cr)
    dec = Decoder()
    dec.decode_stream(stream)
    assert dec.picture_md5() == enc.recon_md5()


def test_iss_beats_intra_on_lenslet():
    """SS prediction must exploit micro-image redundancy: ISS stream
    meaningfully smaller than the all-intra stream at equal QP."""
    w, h, mi, qp = 96, 64, 13, 32
    y, cb, cr = synth_lenslet(w, h, mi)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=qp, cu_log2=4,
                                 search_range=32, mi_size=mi))
    iss = enc.encode_frame(y, cb, cr)
    ienc = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp, cu_log2=4))
    intra = ienc.encode_frame(y, cb, cr)
    assert len(iss) < 0.6 * len(intra), (len(iss), len(intra))


def test_iss_quadtree_roundtrip_bit_exact():
    """Pre-pass-decided mixed CU quadtree (8/16/32) round-trips."""
    w, h, mi = 128, 96, 13
    y, cb, cr = synth_lenslet(w, h, mi, seed=7)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=32, quadtree=True,
                                 search_range=32, mi_size=mi))
    stream = enc.encode_frame(y, cb, cr)
    assert len(set(enc._depth8.ravel().tolist())) > 1
    dec = Decoder()
    dec.decode_stream(stream)
    assert dec.picture_md5() == enc.recon_md5()
    # quadtree must not lose to the uniform grid it replaces
    enc2 = HoloEncoder(HoloConfig(width=w, height=h, qp=32, quadtree=False,
                                  cu_log2=4, search_range=32, mi_size=mi))
    fixed = enc2.encode_frame(y, cb, cr)
    assert len(stream) < 1.05 * len(fixed), (len(stream), len(fixed))


def test_iss_no_deblock_roundtrip():
    w, h = 64, 64
    y, cb, cr = synth_lenslet(w, h, 13, seed=9)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=30, cu_log2=4,
                                 search_range=24, mi_size=13,
                                 deblocking=False))
    stream = enc.encode_frame(y, cb, cr)
    dec = Decoder()
    dec.decode_stream(stream)
    assert dec.picture_md5() == enc.recon_md5()


def synth_warped_lenslet(w, h, mi, seed=5):
    """Micro-image grid with a two-axis zoom gradient: pure translation
    mispredicts, GT warp compensates."""
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (mi * 4, mi * 4)).astype(np.float64)
    # box-smooth so sub-pixel warps matter
    k = np.ones((3, 3)) / 9.0
    for _ in range(2):
        base = np.pad(base, 1, mode="edge")
        base = sum(base[i:i + mi * 4, j:j + mi * 4] * k[i, j]
                   for i in range(3) for j in range(3))
    out = np.zeros((h, w))
    for by in range(0, h, mi):
        for bx in range(0, w, mi):
            s = 1.0 + 0.12 * (bx // mi) + 0.12 * (by // mi)
            ly, lx = np.mgrid[0:mi, 0:mi]
            sy = np.clip(ly * s, 0, mi * 4 - 1)
            sx = np.clip(lx * s, 0, mi * 4 - 1)
            y0, x0 = sy.astype(int), sx.astype(int)
            fy, fx = sy - y0, sx - x0
            y1 = np.clip(y0 + 1, 0, mi * 4 - 1)
            x1 = np.clip(x0 + 1, 0, mi * 4 - 1)
            out[by:by + mi, bx:bx + mi] = (
                (1 - fy) * ((1 - fx) * base[y0, x0] + fx * base[y0, x1])
                + fy * ((1 - fx) * base[y1, x0] + fx * base[y1, x1]))
    y = out.clip(0, 255).astype(np.int32)
    cb = np.full((h // 2, w // 2), 128, np.int32)
    cr = np.full((h // 2, w // 2), 128, np.int32)
    return y, cb, cr


def test_gt_roundtrip_and_engages():
    """HOP: GT warp CUs chosen on warped-lenslet content, bit-exact decode,
    and RD not worse than translation-only SS."""
    w, h, mi = 96, 64, 16
    y, cb, cr = synth_warped_lenslet(w, h, mi)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=37, cu_log2=4,
                                 search_range=32, mi_size=mi, gt=True))
    s = enc.encode_frame(y, cb, cr)
    assert int(enc.last_maps.gt8.sum()) >= 1, "GT never chosen"
    dec = Decoder()
    dec.decode_stream(s)
    assert dec.picture_md5() == enc.recon_md5()
    enc0 = HoloEncoder(HoloConfig(width=w, height=h, qp=37, cu_log2=4,
                                  search_range=32, mi_size=mi, gt=False))
    s0 = enc0.encode_frame(y, cb, cr)
    mse = ((enc.recon_yuv[0] - y) ** 2).mean()
    mse0 = ((enc0.recon_yuv[0] - y) ** 2).mean()
    # GT is an RD tool: it must not lose clearly on either axis (it may
    # trade a sliver of distortion for rate or vice versa)
    assert mse <= mse0 * 1.02 and len(s) <= len(s0) * 1.10, \
        (len(s), len(s0), mse, mse0)


def test_pss_sequence_roundtrip():
    """Low-delay holoscopic GOP: ISS IDR + PSS pictures (temporal L0[0] +
    SS ref appended last). Every decoded picture must match the encoder
    recon bit-exactly; temporal prediction must engage."""
    w, h, mi = 96, 64, 13
    rng = np.random.default_rng(7)
    y0, cb0, cr0 = synth_lenslet(w, h, mi)
    frames = []
    for t in range(3):
        y = np.roll(y0, t, axis=1) + rng.integers(-2, 3, (h, w))
        frames.append((y.clip(0, 255).astype(np.int32),
                       np.roll(cb0, t // 2, axis=1).astype(np.int32),
                       np.roll(cr0, t // 2, axis=1).astype(np.int32)))
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=32, cu_log2=4,
                                 search_range=24, search_range_t=8,
                                 mi_size=mi, gt=True))
    stream = enc.encode_sequence(frames)
    m = enc.last_maps
    assert ((m.pred4 == 0) & (m.ref4 == 0)).mean() > 0.3, \
        "temporal prediction never chosen"
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == 3
    for i, (py, pcb, pcr) in enumerate(pics):
        ey, ecb, ecr = enc.recon_history[i]
        assert np.array_equal(py, ey) and np.array_equal(pcb, ecb) \
            and np.array_equal(pcr, ecr), f"frame {i} mismatch"
