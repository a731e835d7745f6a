"""All-intra HEVC encoder pipeline (round-1 scope: I slices, Main 8-bit).

Capability ref: TEncTop/TEncGOP/TEncSlice/TEncCu orchestration
(TEncGOP.cpp:338 compressGOP, TEncSlice.cpp:844 compressSlice,
TEncCu.cpp:371 xCompressCU). TPU-native structure instead of CU recursion:

  1. partition decision (currently uniform depth; DP tree pruning next)
  2. luma + chroma wavefront recon (models/wavefront.py batched steps)
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
from hevc_hop_tpu.models import wavefront


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
        self._zplane = wavefront.zaddr4_plane(cfg.width, cfg.height,
                                              cfg.ctb_log2)
        self._recon = None

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
        depth8 = np.full((h // 8, w // 8), cfg.ctb_log2 - cfg.cu_log2,
                         np.uint8)
        leaves = wavefront.leaves_from_depth(depth8, w, h, cfg.ctb_log2)
        sched = wavefront.Schedule(leaves, w, h, cfg.ctb_log2, self._zplane)

        maps = native.SliceMaps(w, h, cfg.ctb_log2)
        maps.depth8[:] = depth8

        pad = 1 << cfg.ctb_log2
        recon_y = jnp.zeros((h + pad, w), jnp.int32)
        coef_y = jnp.zeros((h + pad, w), jnp.int32)
        org_y = jnp.zeros((h + pad, w), jnp.int32)
        org_y = org_y.at[:h].set(jnp.asarray(y, jnp.int32))
        recon_c = [jnp.zeros((h // 2 + pad, w // 2), jnp.int32)
                   for _ in range(2)]
        coef_c = [jnp.zeros((h // 2 + pad, w // 2), jnp.int32)
                  for _ in range(2)]
        org_c = []
        for plane in (cb, cr):
            oc = jnp.zeros((h // 2 + pad, w // 2), jnp.int32)
            org_c.append(oc.at[:h // 2].set(jnp.asarray(plane, jnp.int32)))

        qp = cfg.qp
        qp_c = rom.chroma_qp_from_luma(qp)
        strong = cfg.strong_intra_smoothing

        for (n, pos, avail_l, avail_c) in sched.steps:
            b = pos.shape[0]
            bb = wavefront._bucket(b)
            posp = wavefront._pad(pos, bb)
            if bb != b:
                posp[b:] = (0, h)  # dummies write into the scratch margin
            avl = wavefront._pad(avail_l, bb)
            forced = np.full(bb, -1, np.int32)

            recon_y, coef_y, modes, cbf = wavefront.encode_step(
                recon_y, coef_y, org_y, jnp.asarray(posp, jnp.int32),
                jnp.asarray(avl), jnp.asarray(forced),
                n=n, qp=qp, c_idx=0, bit_depth=cfg.bit_depth,
                strong=strong, rdo_lambda_x1k=0)
            modes_np = np.asarray(modes[:b])
            cbf_np = np.asarray(cbf[:b])
            for i, (x0, y0) in enumerate(pos):
                maps.mode4[y0 // 4:(y0 + n) // 4,
                           x0 // 4:(x0 + n) // 4] = modes_np[i]
                maps.cbf4_y[y0 // 4:(y0 + n) // 4,
                            x0 // 4:(x0 + n) // 4] = cbf_np[i]

            # chroma (DM = luma mode), TU = CU/2
            nc = n // 2
            posc = posp // 2
            if bb != b:
                posc[b:] = (0, h // 2)
            avc = wavefront._pad(avail_c, bb)
            forced_c = wavefront._pad(modes_np.astype(np.int32), bb)
            for ci in range(2):
                recon_c[ci], coef_c[ci], _, cbfc = wavefront.encode_step(
                    recon_c[ci], coef_c[ci], org_c[ci],
                    jnp.asarray(posc, jnp.int32), jnp.asarray(avc),
                    jnp.asarray(forced_c),
                    n=nc, qp=qp_c, c_idx=ci + 1, bit_depth=cfg.bit_depth,
                    strong=strong, rdo_lambda_x1k=0)
                cbfc_np = np.asarray(cbfc[:b])
                cmap = maps.cbf8_cb if ci == 0 else maps.cbf8_cr
                for i, (x0, y0) in enumerate(pos):
                    cmap[y0 // 8:(y0 + n) // 8,
                         x0 // 8:(x0 + n) // 8] = cbfc_np[i]

        maps.coef_y[:] = np.asarray(coef_y[:h], np.int16)
        maps.coef_cb[:] = np.asarray(coef_c[0][:h // 2], np.int16)
        maps.coef_cr[:] = np.asarray(coef_c[1][:h // 2], np.int16)

        self.recon_yuv = (
            np.asarray(recon_y[:h], np.int32),
            np.asarray(recon_c[0][:h // 2], np.int32),
            np.asarray(recon_c[1][:h // 2], np.int32))

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
