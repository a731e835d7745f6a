"""Picture-level R-lambda rate control (TEncRateCtrl.cpp analog)."""
import numpy as np

from hevc_hop_tpu.models.ratectrl import RateControl, \
    encode_rate_controlled


def synth(w, h, seed):
    # stationary statistics across the sequence (only the noise draw
    # varies) so picture-level model adaptation can be asserted tightly
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (110 + 70 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)
    cb = np.full((h // 2, w // 2), 120, np.int32)
    cr = np.full((h // 2, w // 2), 135, np.int32)
    return y, cb, cr


def test_model_monotonicity():
    rc_lo = RateControl(50_000, 30, 320, 240)
    rc_hi = RateControl(2_000_000, 30, 320, 240)
    assert rc_lo.pic_qp() > rc_hi.pic_qp(), \
        "lower target bitrate must pick a higher QP"


def test_rc_converges_toward_target():
    w, h = 160, 96
    frames = [synth(w, h, s) for s in range(8)]
    fps = 30.0
    target = 700_000.0   # bits/s
    streams, rc = encode_rate_controlled(frames, w, h, target, fps,
                                         deblocking=True)
    per_pic_target = target / fps
    first = rc.history[0][3]
    last = rc.history[-1][3]
    # adaptation moves realized bits toward the target
    assert abs(last - per_pic_target) <= abs(first - per_pic_target) * 1.05
    # and lands within 40% after a few pictures (picture-level RC only)
    assert abs(last - per_pic_target) / per_pic_target < 0.4
    # QP trajectory stays in range; once the model has settled (two
    # observations) moves are clamped to +-3 per picture
    qps = [hqp for (hqp, _, _, _) in rc.history]
    assert all(0 <= q <= 51 for q in qps)
    assert all(abs(a - b) <= 3 for a, b in zip(qps[2:], qps[3:]))
