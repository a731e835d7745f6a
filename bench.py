#!/usr/bin/env python
"""Headline benchmark: class-B (1920x1088) all-intra encode frames/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the reference HM encoder (single-threaded C++)
measured on this host — see tests/golden/measured_baseline.json and
BASELINE.md. Set BENCH_SMALL=1 for a quick smoke run (720x512).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def synth_class_b(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
         + 25 * np.sin((xx + yy) / 7.0)
         + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + 30 * np.sin(xx[::2, ::2] / 41.0)).clip(0, 255).astype(np.int32)
    cr = (128 - 28 * np.cos(yy[::2, ::2] / 37.0)).clip(0, 255).astype(np.int32)
    return y, cb, cr


def main() -> None:
    from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder

    small = os.environ.get("BENCH_SMALL") == "1"
    w, h = (720, 512) if small else (1920, 1088)
    y, cb, cr = synth_class_b(w, h)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=32, cu_log2=4))
    enc.encode_frame(y, cb, cr)  # warm-up/compile
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        enc.encode_frame(y, cb, cr)
        best = min(best, time.time() - t0)
    fps = 1.0 / best

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "golden", "measured_baseline.json")
    with open(base_path) as f:
        base = json.load(f)
    hm_fps = base["hm_intra_1080p_fps"]
    if small:
        hm_fps *= (1920 * 1088) / (w * h)  # HM is ~linear in pixels

    print(json.dumps({
        "metric": "intra_encode_fps_classB",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / hm_fps, 3),
    }))


if __name__ == "__main__":
    main()
