#!/usr/bin/env python
"""Headline benchmark: class-B (1920x1088) all-intra encode frames/s/chip,
on the production quadtree+SAO+RDOQ+SBH path (the same encoder the BD-rate
claims use), plus lenslet-ISS encode fps and decode fps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "lenslet_iss_fps": N, "lenslet_iss_vs_baseline": N,
   "decode_fps": N, "decode_vs_baseline": N}

vs_baseline values are relative to the reference HM binaries measured on
this host (tests/golden/measured_baseline.json, BASELINE.md). Set
BENCH_SMALL=1 for a quick smoke run (720x512, no extra metrics).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache: first-ever compile of the 1080p scan
# programs takes minutes; all later runs (and re-runs of this bench) load
# the executables from disk
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass


def synth_class_b(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
         + 25 * np.sin((xx + yy) / 7.0)
         + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + 30 * np.sin(xx[::2, ::2] / 41.0)).clip(0, 255).astype(np.int32)
    cr = (128 - 28 * np.cos(yy[::2, ::2] / 37.0)).clip(0, 255).astype(np.int32)
    return y, cb, cr


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder

    small = os.environ.get("BENCH_SMALL") == "1"
    w, h = (720, 512) if small else (1920, 1088)
    nfr = 4   # DISTINCT frames, encoded via the pipelined throughput path
    frames = [synth_class_b(w, h, seed=s) for s in range(nfr)]
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=32, sao=True))
    enc.encode_frames(frames)  # warm-up/compile every shape bucket
    t_enc = best_of(lambda: enc.encode_frames(frames)) / nfr
    fps = 1.0 / t_enc
    y, cb, cr = frames[0]

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "golden", "measured_baseline.json")
    with open(base_path) as f:
        base = json.load(f)
    hm_fps = base["hm_intra_1080p_fps"]
    if small:
        hm_fps *= (1920 * 1088) / (w * h)  # HM is ~linear in pixels

    out = {
        "metric": "intra_encode_fps_classB",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / hm_fps, 3),
    }

    if not small:
        # lenslet ISS (quadtree + SAO + GT, the flagship holoscopic path)
        from tools.bdrate import lenslet_frame
        from hevc_hop_tpu.models.ss_encoder import HoloConfig, HoloEncoder
        ly, lcb, lcr = lenslet_frame()
        lh, lw = ly.shape
        henc = HoloEncoder(HoloConfig(width=lw, height=lh, qp=32,
                                      mi_size=16, gt=True, search_range=32,
                                      quadtree=True, sao=True))
        henc.encode_frame(ly, lcb, lcr)
        t_ll = best_of(lambda: henc.encode_frame(ly, lcb, lcr))
        out["lenslet_iss_fps"] = round(1.0 / t_ll, 4)
        out["lenslet_iss_vs_baseline"] = round(
            (1.0 / t_ll) / base["hm_iss_lenslet_fps"], 3)

        # decode fps on the class-B stream
        from hevc_hop_tpu.models.decoder import Decoder
        stream = enc.encode_frame(y, cb, cr)

        def dec_once():
            d = Decoder()
            d.decode_stream(stream)

        dec_once()
        t_dec = best_of(dec_once)
        out["decode_fps"] = round(1.0 / t_dec, 4)
        out["decode_vs_baseline"] = round(
            (1.0 / t_dec) / base["hm_intra_1080p_decode_fps"], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
