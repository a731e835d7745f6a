"""All-intra HEVC encoder pipeline (round-1 scope: I slices, Main 8-bit).

Capability ref: TEncTop/TEncGOP/TEncSlice/TEncCu orchestration
(TEncGOP.cpp:338 compressGOP, TEncSlice.cpp:844 compressSlice,
TEncCu.cpp:371 xCompressCU). TPU-native structure instead of CU recursion:

  1. partition decision (currently uniform depth; DP tree pruning next)
  2. whole-frame wavefront recon as ONE lax.scan program
     (models/wavefront_scan.py) — luma + both chroma planes per step
  3. dense maps -> native C++ slice-data serializer -> NAL/AnnexB
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from hevc_hop_tpu.bitstream import nal, params
from hevc_hop_tpu.common import rom
from hevc_hop_tpu.common.types import NalUnitType, SliceType
from hevc_hop_tpu.entropy import ctx_layout, native
from hevc_hop_tpu.io import yuv as yuvio
from hevc_hop_tpu.models import wavefront_scan


@dataclasses.dataclass
class EncoderConfig:
    width: int = 64
    height: int = 64
    qp: int = 32
    bit_depth: int = 8
    ctb_log2: int = 5
    cu_log2: int = 4          # uniform CU size (until DP partitioning lands)
    strong_intra_smoothing: bool = True


class IntraEncoder:
    def __init__(self, cfg: EncoderConfig) -> None:
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0, \
            "pad input to multiples of 8 (conformance window TODO)"
        self.cfg = cfg
        self.sps = params.SPS(
            pic_width=cfg.width, pic_height=cfg.height,
            bit_depth=cfg.bit_depth, ctb_log2=cfg.ctb_log2,
            strong_intra_smoothing=cfg.strong_intra_smoothing)
        self.pps = params.PPS(init_qp=26)

    def headers(self) -> list:
        vps = params.VPS()
        return [
            nal.make_nal(NalUnitType.VPS_NUT, params.write_vps(vps)),
            nal.make_nal(NalUnitType.SPS_NUT, params.write_sps(self.sps)),
            nal.make_nal(NalUnitType.PPS_NUT, params.write_pps(self.pps)),
        ]

    def encode_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> bytes:
        """Encode one frame; returns the AnnexB byte stream (with headers).
        Reconstruction is kept in self.recon_yuv for hash checks."""
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        sched = wavefront_scan.build_uniform_schedule(
            w, h, cfg.ctb_log2, cfg.cu_log2)
        n = sched["n"]

        maps = native.SliceMaps(w, h, cfg.ctb_log2)
        maps.depth8[:] = cfg.ctb_log2 - cfg.cu_log2

        pad = 1 << cfg.ctb_log2
        org_y = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(y, jnp.int32))
        org_cb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cb, jnp.int32))
        org_cr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cr, jnp.int32))

        qp = cfg.qp
        qp_c = rom.chroma_qp_from_luma(qp)
        (ry, rcb, rcr, coef_y, coef_cb, coef_cr, modes,
         cbf_y, cbf_cb, cbf_cr) = wavefront_scan.scan_encode(
            org_y, org_cb, org_cr,
            jnp.asarray(sched["pos"]), jnp.asarray(sched["avail"]),
            jnp.asarray(sched["availc"]),
            n=n, qp=qp, qp_c=qp_c, bit_depth=cfg.bit_depth,
            strong=cfg.strong_intra_smoothing, h=h)

        maps.coef_y[:] = np.asarray(coef_y[:h], np.int16)
        maps.coef_cb[:] = np.asarray(coef_cb[:h // 2], np.int16)
        maps.coef_cr[:] = np.asarray(coef_cr[:h // 2], np.int16)
        self.recon_yuv = (np.asarray(ry[:h], np.int32),
                          np.asarray(rcb[:h // 2], np.int32),
                          np.asarray(rcr[:h // 2], np.int32))

        # scatter per-step outputs into the frame maps (vectorized over the
        # small per-CU offset grid)
        pos, valid = sched["pos"], sched["valid"]
        vm = valid.ravel()
        px = pos[..., 0].ravel()[vm]
        py = pos[..., 1].ravel()[vm]
        vals = {
            "mode": np.asarray(modes).ravel()[vm].astype(np.uint8),
            "cy": np.asarray(cbf_y).ravel()[vm].astype(np.uint8),
            "cb": np.asarray(cbf_cb).ravel()[vm].astype(np.uint8),
            "cr": np.asarray(cbf_cr).ravel()[vm].astype(np.uint8),
        }
        for dy in range(n // 4):
            for dx in range(n // 4):
                maps.mode4[py // 4 + dy, px // 4 + dx] = vals["mode"]
                maps.cbf4_y[py // 4 + dy, px // 4 + dx] = vals["cy"]
        for dy in range(n // 8):
            for dx in range(n // 8):
                maps.cbf8_cb[py // 8 + dy, px // 8 + dx] = vals["cb"]
                maps.cbf8_cr[py // 8 + dy, px // 8 + dx] = vals["cr"]

        # entropy: slice header + native slice data
        sh = params.SliceHeader(slice_type=SliceType.I, slice_qp=qp)
        hw = params.write_slice_header(sh, self.sps, self.pps)
        states = ctx_layout.init_states(int(SliceType.I), qp)
        payload = native.encode_slice_data(states, maps)
        hw.write_bytes(payload)
        slice_nal = nal.make_nal(NalUnitType.IDR_W_RADL, hw.get_bytes())
        return nal.annexb_wrap(self.headers() + [slice_nal])

    def recon_md5(self) -> bytes:
        y, cb, cr = self.recon_yuv
        return yuvio.picture_md5(y, cb, cr, self.cfg.bit_depth)
