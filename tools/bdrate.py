"""BD-rate / BD-PSNR harness vs the reference HM encoder.

Drives the in-container reference binaries (/tmp/hm/bin, rebuilt per
BASELINE.md) over QP {22,27,32,37} on synthetic class-B and lenslet
content, runs our encoder at the same QPs, and computes Bjontegaard
deltas (piecewise-cubic integration in the log-rate domain).

Usage:
    python tools/bdrate.py [--update-golden] [--quick]

Writes tests/golden/bdrate.json; tests/test_bdrate.py asserts our
encoder stays within the recorded ceiling of the stored HM anchors
(capability ref: TEncGOP.cpp:2383 xCalculateAddPSNR PSNR bookkeeping,
cfg/encoder_intra_main.cfg + cfg/3DHencoder_intra_main.cfg fixtures).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HM_ENC = "/tmp/hm/bin/TAppEncoderStatic"
QPS = (22, 27, 32, 37)
GOLDEN = os.path.join(os.path.dirname(__file__), os.pardir,
                      "tests", "golden", "bdrate.json")


# ---------------------------------------------------------------- content
def _octave_field(rng, w, h, scale, amp):
    """Band-limited random field: coarse gaussian grid, bilinear upsample."""
    gw, gh = w // scale + 2, h // scale + 2
    g = rng.normal(0, amp, (gh, gw))
    ys = np.arange(h) / scale
    xs = np.arange(w) / scale
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = g[y0][:, x0]
    b = g[y0][:, x0 + 1]
    c = g[y0 + 1][:, x0]
    d = g[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def classb_frame(w=1920, h=1088, seed=3):
    """Synthetic class-B-like natural frame: multi-octave band-limited
    texture + gradients + sensor noise. The octave spectrum keeps the HM
    RD curve monotone across QP 22-37 (a pure-sine fixture collapses at
    high QP, breaking the Bjontegaard cubic fit)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = 110 + 40 * np.sin(xx / 97.0) * np.cos(yy / 83.0)
    for scale, amp in ((64, 30), (24, 22), (8, 14), (3, 8)):
        y = y + _octave_field(rng, w, h, scale, amp)
    y = (y + rng.normal(0, 2.0, (h, w))).clip(0, 255).astype(np.int32)
    cb = (118 + _octave_field(rng, w // 2, h // 2, 32, 18)
          + _octave_field(rng, w // 2, h // 2, 8, 6)).clip(0, 255)
    cr = (132 + _octave_field(rng, w // 2, h // 2, 24, 16)
          + _octave_field(rng, w // 2, h // 2, 6, 5)).clip(0, 255)
    return y, cb.astype(np.int32), cr.astype(np.int32)


def lenslet_frame(w=512, h=384, mi=16, seed=5):
    """Synthetic lenslet light field: micro-image grid with smooth
    per-MI disparity drift + texture, the structure SS/HOP exploits."""
    rng = np.random.default_rng(seed)
    scene_w, scene_h = w * 2, h * 2
    sy, sx = np.mgrid[0:scene_h, 0:scene_w]
    scene = (100 + 70 * np.sin(sx / 23.0) * np.cos(sy / 17.0)
             + 40 * np.sin((sx - sy) / 31.0)
             + rng.normal(0, 4, (scene_h, scene_w))).clip(0, 255)
    y = np.zeros((h, w))
    for by in range(h // mi):
        for bx in range(w // mi):
            # per-microimage viewpoint shift (disparity ~ position)
            ox = int(bx * mi * 0.6) + 40
            oy = int(by * mi * 0.6) + 40
            y[by * mi:(by + 1) * mi, bx * mi:(bx + 1) * mi] = \
                scene[oy:oy + mi, ox:ox + mi]
    y = y.clip(0, 255).astype(np.int32)
    cb = (120 + 20 * np.sin(np.mgrid[0:h // 2, 0:w // 2][1] / 19.0)
          ).clip(0, 255).astype(np.int32)
    cr = (128 + 18 * np.cos(np.mgrid[0:h // 2, 0:w // 2][0] / 23.0)
          ).clip(0, 255).astype(np.int32)
    return y, cb, cr


# ---------------------------------------------------------------- metrics
def psnr(a, b, maxv=255.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2)
    return 99.0 if mse == 0 else 10.0 * np.log10(maxv * maxv / mse)


def weighted_psnr(src, rec):
    """JCT-VC combined (6*Y + Cb + Cr)/8 PSNR."""
    py = psnr(src[0], rec[0])
    pcb = psnr(src[1], rec[1])
    pcr = psnr(src[2], rec[2])
    return (6 * py + pcb + pcr) / 8.0, py


def bd_rate(rate_a, psnr_a, rate_b, psnr_b):
    """Bjontegaard delta-rate of B vs A (negative = B is better), cubic
    polyfit in (psnr -> log-rate), integrated over the overlap interval."""
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    ia = np.polyval(np.polyint(pa), hi) - np.polyval(np.polyint(pa), lo)
    ib = np.polyval(np.polyint(pb), hi) - np.polyval(np.polyint(pb), lo)
    return (np.exp((ib - ia) / (hi - lo)) - 1.0) * 100.0


def bd_psnr(rate_a, psnr_a, rate_b, psnr_b):
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(la, psnr_a, 3)
    pb = np.polyfit(lb, psnr_b, 3)
    lo = max(min(la), min(lb))
    hi = min(max(la), max(lb))
    ia = np.polyval(np.polyint(pa), hi) - np.polyval(np.polyint(pa), lo)
    ib = np.polyval(np.polyint(pb), hi) - np.polyval(np.polyint(pb), lo)
    return (ib - ia) / (hi - lo)


# ---------------------------------------------------------------- HM side
def write_yuv(path, planes):
    with open(path, "wb") as f:
        for p in planes:
            f.write(np.asarray(p, np.uint8).tobytes())


def run_hm(frame, qp, cfg_name, workdir, extra=()):
    """One HM encode; returns (bytes, wpsnr, y_psnr)."""
    y, cb, cr = frame
    h, w = y.shape
    src = os.path.join(workdir, "src.yuv")
    write_yuv(src, frame)
    bs = os.path.join(workdir, f"hm_q{qp}.bin")
    rec = os.path.join(workdir, f"hm_q{qp}_rec.yuv")
    cmd = [HM_ENC, "-c", f"/root/reference/cfg/{cfg_name}",
           "-i", src, "-b", bs, "-o", rec,
           "-wdt", str(w), "-hgt", str(h), "-f", "1", "-fr", "30",
           "-q", str(qp)] + list(extra)
    r = subprocess.run(cmd, capture_output=True, timeout=3600,
                       cwd=workdir)
    assert r.returncode == 0, r.stderr.decode()[-800:] + r.stdout.decode()[-800:]
    nbytes = os.path.getsize(bs)
    raw = np.fromfile(rec, np.uint8)
    ry = raw[:w * h].reshape(h, w)
    rcb = raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
    rcr = raw[w * h * 5 // 4:].reshape(h // 2, w // 2)
    wp, py = weighted_psnr(frame, (ry, rcb, rcr))
    return nbytes, wp, py


# ---------------------------------------------------------------- ours
def run_ours_intra(frame, qp):
    from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
    y, cb, cr = frame
    h, w = y.shape
    sao = (w % 32 == 0) and (h % 32 == 0)   # HM intra cfg runs SAO on
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=qp, sao=sao))
    stream = enc.encode_frame(y, cb, cr)
    wp, py = weighted_psnr(frame, enc.recon_yuv)
    return len(stream), wp, py


def run_ours_iss(frame, qp, mi):
    from hevc_hop_tpu.models.ss_encoder import HoloConfig, HoloEncoder
    y, cb, cr = frame
    h, w = y.shape
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=qp, mi_size=mi,
                                 gt=True, search_range=32, quadtree=True,
                                 sao=True))
    stream = enc.encode_frame(y, cb, cr)
    wp, py = weighted_psnr(frame, enc.recon_yuv)
    return len(stream), wp, py


def sweep(fn, frame, tag, **kw):
    rates, wpsnrs, ypsnrs = [], [], []
    for qp in QPS:
        nb, wp, py = fn(frame, qp, **kw)
        print(f"  {tag} qp={qp}: {nb} B, {wp:.3f} dB (Y {py:.3f})",
              flush=True)
        rates.append(nb)
        wpsnrs.append(wp)
        ypsnrs.append(py)
    return {"qps": list(QPS), "bytes": rates, "wpsnr": wpsnrs,
            "ypsnr": ypsnrs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-golden", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="small class-B proxy (640x384) for fast iteration")
    args = ap.parse_args()

    results = {}
    cb_frame = classb_frame(640, 384) if args.quick else classb_frame()
    ll_frame = lenslet_frame()

    with tempfile.TemporaryDirectory() as td:
        print("HM intra (class-B)...")
        results["hm_classb_intra"] = sweep(
            run_hm, cb_frame, "hm", cfg_name="encoder_intra_main.cfg",
            workdir=td)
        print("HM holoscopic intra (lenslet)...")
        results["hm_lenslet_iss"] = sweep(
            run_hm, ll_frame, "hm-iss", cfg_name="3DHencoder_intra_main.cfg",
            workdir=td, extra=("--MIsize=16",))

    print("ours intra (class-B)...")
    results["ours_classb_intra"] = sweep(run_ours_intra, cb_frame, "ours")
    print("ours ISS (lenslet)...")
    results["ours_lenslet_iss"] = sweep(run_ours_iss, ll_frame, "ours-iss",
                                        mi=16)

    for pair, (a, b) in {
        "classb_intra": ("hm_classb_intra", "ours_classb_intra"),
        "lenslet_iss": ("hm_lenslet_iss", "ours_lenslet_iss"),
    }.items():
        ra, rb = results[a], results[b]
        bdr = bd_rate(ra["bytes"], ra["wpsnr"], rb["bytes"], rb["wpsnr"])
        bdp = bd_psnr(ra["bytes"], ra["wpsnr"], rb["bytes"], rb["wpsnr"])
        results[f"bdrate_{pair}"] = round(float(bdr), 3)
        results[f"bdpsnr_{pair}"] = round(float(bdp), 4)
        print(f"BD-rate {pair}: {bdr:+.2f}% (BD-PSNR {bdp:+.3f} dB) "
              f"[ours vs HM; negative = ours better]")

    results["quick"] = bool(args.quick)
    if args.update_golden:
        with open(GOLDEN, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {GOLDEN}")
    else:
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith("bd")}, indent=1))


if __name__ == "__main__":
    main()
