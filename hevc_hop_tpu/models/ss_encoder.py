"""Holoscopic (lenslet light-field) encoder: ISS slices with SS prediction.

Capability ref: the IT extension's HoloscopicIntra path — slice type ISS
(TEncSlice.cpp:292-308), the picture's own causal recon as the single L0
reference (TComSlice.cpp:366-377), full-search SS ME with causal validity
(TEncSearch.cpp:6224-6352), per-CU recon feeding later CUs' prediction
(TEncCu.cpp:870-880), VPS holoscopic extension signalling
(TEncCavlc.cpp:572-575), MI merge candidates via vps_holo_microimage_size
(TComDataCU.cpp:2642-2712).

TPU-native structure: intra + SS tournament fused into one lax.scan
wavefront (models/ss_scan.py); the native C++ serializer turns final MVs
into skip/merge/AMVP syntax (native/cabac.cpp code_inter_cu).
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
from hevc_hop_tpu.models import partition, ss_scan
from hevc_hop_tpu.ops import deblock


@dataclasses.dataclass
class HoloConfig:
    width: int = 64
    height: int = 64
    qp: int = 32
    bit_depth: int = 8
    ctb_log2: int = 5
    cu_log2: int = 4            # uniform CU grid (quadtree for ISS: TODO)
    search_range: int = 32      # SS full-search radius (SearchRange cfg)
    search_range_t: int = 16    # temporal ME radius (PSS frames)
    mi_size: int = 0            # micro-image size (MIsize cfg; 0 = off)
    gt: bool = True             # GT/HOP corner-warp refinement (IT_GT)
    strong_intra_smoothing: bool = True
    deblocking: bool = True
    sao: bool = False


class HoloEncoder:
    """All-ISS encoder (HoloscopicIntra:1 semantics, GOPSize 1)."""

    def __init__(self, cfg: HoloConfig) -> None:
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0
        assert cfg.cu_log2 >= 3, "ISS CUs are 8x8+ (4x4 NxN TODO)"
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
        self.vps = params.VPS(holo=True, holo_mi_size=cfg.mi_size)

    def headers(self) -> list:
        return [
            nal.make_nal(NalUnitType.VPS_NUT, params.write_vps(self.vps)),
            nal.make_nal(NalUnitType.SPS_NUT, params.write_sps(self.sps)),
            nal.make_nal(NalUnitType.PPS_NUT, params.write_pps(self.pps)),
        ]

    def encode_sequence(self, frames: list) -> bytes:
        """Low-delay holoscopic GOP: ISS IDR + PSS trail pictures
        (GOP type 'H', TEncGOP.cpp:623-626). frames: [(y, cb, cr), ...]."""
        out = [self.encode_frame(*frames[0])]
        self.recon_history = [self.recon_yuv]
        for poc, (y, cb, cr) in enumerate(frames[1:], start=1):
            out.append(self._encode_pss(y, cb, cr, poc))
            self.recon_history.append(self.recon_yuv)
        return b"".join(out)

    def encode_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> bytes:
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        n = 1 << cfg.cu_log2
        qp, qp_c = cfg.qp, rom.chroma_qp_from_luma(cfg.qp)
        radius = cfg.search_range

        leaves = [(x, yy, cfg.cu_log2)
                  for cy in range(0, h, 1 << cfg.ctb_log2)
                  for cx in range(0, w, 1 << cfg.ctb_log2)
                  for yy in range(cy, min(cy + (1 << cfg.ctb_log2), h), n)
                  for x in range(cx, min(cx + (1 << cfg.ctb_log2), w), n)]
        sizes, data, nsteps = ss_scan.build_schedule_ss(
            leaves, w, h, cfg.ctb_log2, radius)

        lam = partition.full_lambda(qp)
        zplane4 = ss_scan.wavefront.zaddr4_plane(w, h, cfg.ctb_log2)
        zmaxw, rate_maps, zmax2n, xs = {}, {}, {}, {}
        for log2 in sizes:
            nn = 1 << log2
            d = data[log2]
            zmaxw[log2] = jnp.asarray(ss_scan.zmax_win_px(zplane4, nn))
            rate_maps[log2] = jnp.asarray(
                ss_scan.mvd_rate_map(radius, nn, cfg.mi_size, lam))
            zmax2n[log2] = jnp.asarray(
                ss_scan.zmax_win_px(zplane4, 2 * nn, ifm=2)) if cfg.gt \
                else jnp.zeros((1, 1), jnp.int32)
            xs[log2] = (jnp.asarray(d["pos"]), jnp.asarray(d["avail"]),
                        jnp.asarray(d["availc"]), jnp.asarray(d["zcur"]))

        pad = 1 << cfg.ctb_log2
        org_y = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(y, jnp.int32))
        org_cb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cb, jnp.int32))
        org_cr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cr, jnp.int32))

        ry, rcb, rcr, coef_y, coef_cb, coef_cr, outs = ss_scan.scan_encode_iss(
            org_y, org_cb, org_cr, xs, zmaxw, rate_maps, zmax2n,
            sizes=sizes, qp=qp, qp_c=qp_c, bit_depth=cfg.bit_depth,
            strong=cfg.strong_intra_smoothing, w=w, h=h, radius=radius,
            gt=cfg.gt)

        maps = native.SliceMaps(w, h, cfg.ctb_log2, max_hier_depth=0)
        maps.slice_type = int(SliceType.ISS)
        maps.mi_size = cfg.mi_size
        maps.depth8[:] = cfg.ctb_log2 - cfg.cu_log2
        maps.tu4[:] = cfg.cu_log2
        maps.coef_y[:] = np.asarray(coef_y[:h], np.int16)
        maps.coef_cb[:] = np.asarray(coef_cb[:h // 2], np.int16)
        maps.coef_cr[:] = np.asarray(coef_cr[:h // 2], np.int16)

        for log2 in sizes:
            nn = 1 << log2
            d = data[log2]
            inter, mv, imode, cbf, cbf_b, cbf_r, gtflag, gtc = outs[log2]
            vm = d["valid"].ravel()
            px = d["pos"][..., 0].ravel()[vm]
            py = d["pos"][..., 1].ravel()[vm]
            iv = np.asarray(inter).ravel()[vm]
            mvx = np.asarray(mv[..., 0]).reshape(-1)[vm] * 4
            mvy = np.asarray(mv[..., 1]).reshape(-1)[vm] * 4
            mo = np.asarray(imode).ravel()[vm]
            gf = np.asarray(gtflag).ravel()[vm]
            gv = np.asarray(gtc).reshape(-1, 6)[vm]
            cy_ = np.asarray(cbf).ravel()[vm].astype(np.uint8)
            cbv = np.asarray(cbf_b).ravel()[vm].astype(np.uint8)
            crv = np.asarray(cbf_r).ravel()[vm].astype(np.uint8)
            for dy in range(nn // 4):
                for dx in range(nn // 4):
                    maps.pred4[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, 0, 1).astype(np.uint8)
                    maps.mode4[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, 1, mo).astype(np.uint8)
                    maps.mv4x[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, mvx, 0).astype(np.int16)
                    maps.mv4y[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, mvy, 0).astype(np.int16)
                    maps.cbf4_y[py // 4 + dy, px // 4 + dx] = cy_
            for dy in range(nn // 8):
                for dx in range(nn // 8):
                    maps.cbf8_cb[py // 8 + dy, px // 8 + dx] = cbv
                    maps.cbf8_cr[py // 8 + dy, px // 8 + dx] = crv
            # GT flag + 3 coded corner vectors live at the CU's first 8x8
            maps.gt8[py // 8, px // 8] = gf.astype(np.uint8)
            maps.gtv8[py // 8, px // 8] = \
                np.where(gf[:, None], gv, 0).astype(np.int16)

        ry, rcb, rcr = ry[:h], rcb[:h // 2], rcr[:h // 2]
        if cfg.deblocking:
            ry, rcb, rcr = deblock.deblock_frame(
                ry, rcb, rcr, jnp.asarray(maps.tu4), qp=qp, qp_c=qp_c,
                bit_depth=cfg.bit_depth, pred4=maps.pred4,
                cbf4=maps.cbf4_y, ref4=maps.ref4, mv4x=maps.mv4x,
                mv4y=maps.mv4y)
        if cfg.sao:
            from hevc_hop_tpu.ops import sao as saop
            ry, rcb, rcr = saop.rdo_and_apply(
                (y, cb, cr), (ry, rcb, rcr), maps, cfg.ctb_log2,
                partition.full_lambda(qp), cfg.bit_depth)
        self.recon_yuv = (np.asarray(ry, np.int32),
                          np.asarray(rcb, np.int32),
                          np.asarray(rcr, np.int32))

        self.last_maps = maps
        sh = params.SliceHeader(slice_type=SliceType.ISS, slice_qp=qp)
        hw = params.write_slice_header(sh, self.sps, self.pps)
        states = ctx_layout.init_states(int(SliceType.ISS), qp)
        payload = native.encode_slice_data_ss(states, maps)
        hw.write_bytes(payload)
        slice_nal = nal.make_nal(NalUnitType.IDR_W_RADL, hw.get_bytes())
        return nal.annexb_wrap(self.headers()
                               + [slice_nal, self._hash_sei()])

    def _encode_pss(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                    poc: int) -> bytes:
        """One PSS picture: L0 = [previous filtered recon, SS ref(last)]."""
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        n = 1 << cfg.cu_log2
        qp, qp_c = cfg.qp, rom.chroma_qp_from_luma(cfg.qp)
        radius = cfg.search_range

        leaves = [(x, yy, cfg.cu_log2)
                  for cy in range(0, h, 1 << cfg.ctb_log2)
                  for cx in range(0, w, 1 << cfg.ctb_log2)
                  for yy in range(cy, min(cy + (1 << cfg.ctb_log2), h), n)
                  for x in range(cx, min(cx + (1 << cfg.ctb_log2), w), n)]
        sizes, data, nsteps = ss_scan.build_schedule_ss(
            leaves, w, h, cfg.ctb_log2, radius)

        lam = partition.full_lambda(qp)
        zplane4 = ss_scan.wavefront.zaddr4_plane(w, h, cfg.ctb_log2)
        zmaxw, rate_maps, trate_maps, zmax2n, xs = {}, {}, {}, {}, {}
        for log2 in sizes:
            nn = 1 << log2
            d = data[log2]
            zmaxw[log2] = jnp.asarray(ss_scan.zmax_win_px(zplane4, nn))
            rate_maps[log2] = jnp.asarray(
                ss_scan.mvd_rate_map(radius, nn, cfg.mi_size, lam))
            trate_maps[log2] = jnp.asarray(
                ss_scan.mvd_rate_map(cfg.search_range_t, nn, 0, lam))
            zmax2n[log2] = jnp.asarray(
                ss_scan.zmax_win_px(zplane4, 2 * nn, ifm=2)) if cfg.gt \
                else jnp.zeros((1, 1), jnp.int32)
            xs[log2] = (jnp.asarray(d["pos"]), jnp.asarray(d["avail"]),
                        jnp.asarray(d["availc"]), jnp.asarray(d["zcur"]))

        pad = 1 << cfg.ctb_log2
        org_y = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(y, jnp.int32))
        org_cb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cb, jnp.int32))
        org_cr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(cr, jnp.int32))
        py_, pcb, pcr = self.recon_yuv
        ref_y = jnp.asarray(py_, jnp.int32)
        ref_cb = jnp.asarray(pcb, jnp.int32)
        ref_cr = jnp.asarray(pcr, jnp.int32)

        ry, rcb, rcr, coef_y, coef_cb, coef_cr, outs = \
            ss_scan.scan_encode_pss(
                org_y, org_cb, org_cr, ref_y, ref_cb, ref_cr,
                xs, zmaxw, rate_maps, trate_maps, zmax2n, sizes=sizes,
                qp=qp, qp_c=qp_c, bit_depth=cfg.bit_depth,
                strong=cfg.strong_intra_smoothing, w=w, h=h, radius=radius,
                radius_t=cfg.search_range_t, gt=cfg.gt)

        maps = native.SliceMaps(w, h, cfg.ctb_log2, max_hier_depth=0)
        maps.slice_type = int(SliceType.PSS)
        maps.mi_size = cfg.mi_size
        maps.num_ref = 2   # [temporal, SS(last)]
        maps.depth8[:] = cfg.ctb_log2 - cfg.cu_log2
        maps.tu4[:] = cfg.cu_log2
        maps.coef_y[:] = np.asarray(coef_y[:h], np.int16)
        maps.coef_cb[:] = np.asarray(coef_cb[:h // 2], np.int16)
        maps.coef_cr[:] = np.asarray(coef_cr[:h // 2], np.int16)

        for log2 in sizes:
            nn = 1 << log2
            d = data[log2]
            (inter, refsel, mv, imode, cbf, cbf_b, cbf_r,
             gtflag, gtc) = outs[log2]
            vm = d["valid"].ravel()
            px = d["pos"][..., 0].ravel()[vm]
            py = d["pos"][..., 1].ravel()[vm]
            iv = np.asarray(inter).ravel()[vm]
            rs = np.asarray(refsel).ravel()[vm]
            mvx = np.asarray(mv[..., 0]).reshape(-1)[vm] * 4
            mvy = np.asarray(mv[..., 1]).reshape(-1)[vm] * 4
            mo = np.asarray(imode).ravel()[vm]
            gf = np.asarray(gtflag).ravel()[vm]
            gv = np.asarray(gtc).reshape(-1, 6)[vm]
            cy_ = np.asarray(cbf).ravel()[vm].astype(np.uint8)
            cbv = np.asarray(cbf_b).ravel()[vm].astype(np.uint8)
            crv = np.asarray(cbf_r).ravel()[vm].astype(np.uint8)
            for dy in range(nn // 4):
                for dx in range(nn // 4):
                    maps.pred4[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, 0, 1).astype(np.uint8)
                    maps.mode4[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, 1, mo).astype(np.uint8)
                    maps.mv4x[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, mvx, 0).astype(np.int16)
                    maps.mv4y[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, mvy, 0).astype(np.int16)
                    maps.ref4[py // 4 + dy, px // 4 + dx] = \
                        np.where(iv, rs, 0).astype(np.uint8)
                    maps.cbf4_y[py // 4 + dy, px // 4 + dx] = cy_
            for dy in range(nn // 8):
                for dx in range(nn // 8):
                    maps.cbf8_cb[py // 8 + dy, px // 8 + dx] = cbv
                    maps.cbf8_cr[py // 8 + dy, px // 8 + dx] = crv
            maps.gt8[py // 8, px // 8] = gf.astype(np.uint8)
            maps.gtv8[py // 8, px // 8] = \
                np.where(gf[:, None], gv, 0).astype(np.int16)

        ry, rcb, rcr = ry[:h], rcb[:h // 2], rcr[:h // 2]
        if cfg.deblocking:
            ry, rcb, rcr = deblock.deblock_frame(
                ry, rcb, rcr, jnp.asarray(maps.tu4), qp=qp, qp_c=qp_c,
                bit_depth=cfg.bit_depth, pred4=maps.pred4,
                cbf4=maps.cbf4_y, ref4=maps.ref4, mv4x=maps.mv4x,
                mv4y=maps.mv4y)
        if cfg.sao:
            from hevc_hop_tpu.ops import sao as saop
            ry, rcb, rcr = saop.rdo_and_apply(
                (y, cb, cr), (ry, rcb, rcr), maps, cfg.ctb_log2,
                partition.full_lambda(qp), cfg.bit_depth)
        self.recon_yuv = (np.asarray(ry, np.int32),
                          np.asarray(rcb, np.int32),
                          np.asarray(rcr, np.int32))

        self.last_maps = maps
        sh = params.SliceHeader(slice_type=SliceType.PSS, slice_qp=qp,
                                idr=False, poc=poc,
                                num_ref_wire=maps.num_ref)
        hw = params.write_slice_header(sh, self.sps, self.pps)
        states = ctx_layout.init_states(int(SliceType.PSS), qp)
        payload = native.encode_slice_data_ss(states, maps)
        hw.write_bytes(payload)
        slice_nal = nal.make_nal(NalUnitType.TRAIL_R, hw.get_bytes())
        return nal.annexb_wrap([slice_nal, self._hash_sei()])

    def _hash_sei(self) -> bytes:
        from hevc_hop_tpu.bitstream import sei
        digests = sei.plane_md5s(*self.recon_yuv, self.cfg.bit_depth)
        return nal.make_nal(
            NalUnitType.SUFFIX_SEI_NUT,
            sei.write_sei([sei.SEIMessage(
                sei.PICTURE_HASH, sei.make_picture_hash_payload(digests))]))

    def recon_md5(self) -> bytes:
        y, cb, cr = self.recon_yuv
        return yuvio.picture_md5(y, cb, cr, self.cfg.bit_depth)
