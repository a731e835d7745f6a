"""All-intra HEVC encoder pipeline (round-1 scope: I slices, Main 8-bit).

Capability ref: TEncTop/TEncGOP/TEncSlice/TEncCu orchestration
(TEncGOP.cpp:338 compressGOP, TEncSlice.cpp:844 compressSlice,
TEncCu.cpp:371 xCompressCU). TPU-native structure instead of CU recursion:

  1. dense 35-mode SATD analysis at every CU size + quadtree DP
     partition/mode decision (models/partition.py) — batched XLA calls
  2. whole-frame wavefront recon (TU = CU) as ONE lax.scan program over
     topological levels, multi-size batches per step
     (models/wavefront_scan.py)
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
from hevc_hop_tpu.models import partition, wavefront, wavefront_scan
from hevc_hop_tpu.ops import deblock


@dataclasses.dataclass
class EncoderConfig:
    width: int = 64
    height: int = 64
    qp: int = 32
    bit_depth: int = 8
    ctb_log2: int = 5
    strong_intra_smoothing: bool = True
    deblocking: bool = True
    sao: bool = False
    # partition: None = quadtree DP (default); or fixed uniform CU log2
    cu_log2: int | None = None
    # mode decision: "analysis" (dense, original refs) or "rmd" (in-loop
    # SATD from recon refs)
    mode_decision: str = "analysis"


class IntraEncoder:
    def __init__(self, cfg: EncoderConfig) -> None:
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0, \
            "pad input to multiples of 8 (conformance window TODO)"
        self.cfg = cfg
        if cfg.sao:
            assert cfg.width % (1 << cfg.ctb_log2) == 0 \
                and cfg.height % (1 << cfg.ctb_log2) == 0, \
                "SAO stats tiling needs CTU-aligned dims (pad input)"
        self.sps = params.SPS(
            pic_width=cfg.width, pic_height=cfg.height,
            bit_depth=cfg.bit_depth, ctb_log2=cfg.ctb_log2,
            max_transform_hierarchy_depth_intra=0,
            sao_enabled=cfg.sao,
            strong_intra_smoothing=cfg.strong_intra_smoothing)
        self.pps = params.PPS(init_qp=26,
                              deblocking_disabled=not cfg.deblocking)

    def headers(self) -> list:
        vps = params.VPS()
        return [
            nal.make_nal(NalUnitType.VPS_NUT, params.write_vps(vps)),
            nal.make_nal(NalUnitType.SPS_NUT, params.write_sps(self.sps)),
            nal.make_nal(NalUnitType.PPS_NUT, params.write_pps(self.pps)),
        ]

    def _decide(self, y: np.ndarray):
        """Partition + shared-mode decision.
        Returns (depth8 [h/8,w/8] uint8, mode8 [h/8,w/8] int32 or None)."""
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        if cfg.cu_log2 is not None:
            depth8 = np.full((h // 8, w // 8),
                             cfg.ctb_log2 - cfg.cu_log2, np.uint8)
            return depth8, None   # in-loop RMD (TU = CU, one mode per CU)
        if cfg.mode_decision == "rmd":
            return np.full((h // 8, w // 8), cfg.ctb_log2 - 3, np.uint8), None
        # true-RD analysis at every CU size on a 32-aligned padded copy
        pw, ph = -w % 32, -h % 32
        yp = np.pad(y, ((0, ph), (0, pw)), mode="edge")
        ypj = jnp.asarray(yp)
        rd8, m8 = partition.rd_costs(ypj, 8, cfg.qp, cfg.bit_depth)
        rd16, m16 = partition.rd_costs(ypj, 16, cfg.qp, cfg.bit_depth)
        rd32, m32 = partition.rd_costs(ypj, 32, cfg.qp, cfg.bit_depth)
        depth, mode = partition.decide(rd8, rd16, rd32, m8, m16, m32,
                                       cfg.qp, cfg.ctb_log2)
        return (np.asarray(depth)[:h // 8, :w // 8].astype(np.uint8),
                np.asarray(mode)[:h // 8, :w // 8].astype(np.int32))

    def encode_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> bytes:
        """Encode one frame; returns the AnnexB byte stream (with headers).
        Reconstruction is kept in self.recon_yuv for hash checks."""
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        depth8, mode8 = self._decide(y)
        leaves = wavefront.leaves_from_depth(depth8, w, h, cfg.ctb_log2)
        sizes, data, nsteps = wavefront_scan.build_schedule(
            leaves, w, h, cfg.ctb_log2)

        maps = native.SliceMaps(w, h, cfg.ctb_log2, max_hier_depth=0)
        maps.depth8[:] = depth8
        for (x0, y0, log2) in leaves:
            maps.tu4[y0 // 4:(y0 + (1 << log2)) // 4,
                     x0 // 4:(x0 + (1 << log2)) // 4] = log2

        xs = {}
        for log2 in sizes:
            d = data[log2]
            if mode8 is None:
                m = np.full(d["pos"].shape[:2], -1, np.int32)
            else:
                px8 = np.where(d["valid"], d["pos"][..., 0], 0) // 8
                py8 = np.where(d["valid"], d["pos"][..., 1], 0) // 8
                m = np.where(d["valid"], mode8[py8, px8], 0).astype(np.int32)
            xs[log2] = (jnp.asarray(d["pos"]), jnp.asarray(d["avail"]),
                        jnp.asarray(d["availc"]), jnp.asarray(m))

        pad = 1 << cfg.ctb_log2
        org_y = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(y, jnp.int32))
        org_cb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cb, jnp.int32))
        org_cr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cr, jnp.int32))

        qp = cfg.qp
        qp_c = rom.chroma_qp_from_luma(qp)
        ry, rcb, rcr, coef_y, coef_cb, coef_cr, outs = \
            wavefront_scan.scan_encode(
                org_y, org_cb, org_cr, xs, sizes=sizes, qp=qp, qp_c=qp_c,
                bit_depth=cfg.bit_depth, strong=cfg.strong_intra_smoothing,
                h=h)

        maps.coef_y[:] = np.asarray(coef_y[:h], np.int16)
        maps.coef_cb[:] = np.asarray(coef_cb[:h // 2], np.int16)
        maps.coef_cr[:] = np.asarray(coef_cr[:h // 2], np.int16)
        ry, rcb, rcr = ry[:h], rcb[:h // 2], rcr[:h // 2]
        if cfg.deblocking:
            ry, rcb, rcr = deblock.deblock_frame(
                ry, rcb, rcr, jnp.asarray(maps.tu4), qp=qp, qp_c=qp_c,
                bit_depth=cfg.bit_depth)
        if cfg.sao:
            from hevc_hop_tpu.models import partition as _part
            from hevc_hop_tpu.ops import sao as saop
            ry, rcb, rcr = saop.rdo_and_apply(
                (y, cb, cr), (ry, rcb, rcr), maps, cfg.ctb_log2,
                _part.full_lambda(qp), cfg.bit_depth)
        self.recon_yuv = (np.asarray(ry, np.int32),
                          np.asarray(rcb, np.int32),
                          np.asarray(rcr, np.int32))

        # scatter per-block outputs into the frame maps
        for log2 in sizes:
            n = 1 << log2
            d = data[log2]
            best, cbf_y, cbf_cb, cbf_cr = outs[log2]
            vm = d["valid"].ravel()
            pxv = d["pos"][..., 0].ravel()[vm]
            pyv = d["pos"][..., 1].ravel()[vm]
            mv = np.asarray(best).ravel()[vm].astype(np.uint8)
            cyv = np.asarray(cbf_y).ravel()[vm].astype(np.uint8)
            cbv = np.asarray(cbf_cb).ravel()[vm].astype(np.uint8)
            crv = np.asarray(cbf_cr).ravel()[vm].astype(np.uint8)
            for dy in range(n // 4):
                for dx in range(n // 4):
                    maps.mode4[pyv // 4 + dy, pxv // 4 + dx] = mv
                    maps.cbf4_y[pyv // 4 + dy, pxv // 4 + dx] = cyv
            for dy in range(n // 8):
                for dx in range(n // 8):
                    maps.cbf8_cb[pyv // 8 + dy, pxv // 8 + dx] = cbv
                    maps.cbf8_cr[pyv // 8 + dy, pxv // 8 + dx] = crv

        # entropy: slice header + native slice data
        sh = params.SliceHeader(slice_type=SliceType.I, slice_qp=qp)
        hw = params.write_slice_header(sh, self.sps, self.pps)
        states = ctx_layout.init_states(int(SliceType.I), qp)
        payload = native.encode_slice_data(states, maps)
        hw.write_bytes(payload)
        slice_nal = nal.make_nal(NalUnitType.IDR_W_RADL, hw.get_bytes())
        # decoded-picture-hash SEI (TEncGOP.cpp:1789-1794)
        from hevc_hop_tpu.bitstream import sei
        digests = sei.plane_md5s(*self.recon_yuv, cfg.bit_depth)
        sei_nal = nal.make_nal(
            NalUnitType.SUFFIX_SEI_NUT,
            sei.write_sei([sei.SEIMessage(
                sei.PICTURE_HASH, sei.make_picture_hash_payload(digests))]))
        return nal.annexb_wrap(self.headers() + [slice_nal, sei_nal])

    def recon_md5(self) -> bytes:
        y, cb, cr = self.recon_yuv
        return yuvio.picture_md5(y, cb, cr, self.cfg.bit_depth)
