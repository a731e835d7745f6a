"""HEVC decoder pipeline (round-1 scope: all-intra Main).

Capability ref: TDecTop.cpp:844 decode dispatch, TDecSlice/TDecCu recon.
Structure: native C++ parses the whole slice into dense maps; residuals are
dequantized + inverse-transformed densely (one batched XLA call per TU
size); prediction runs as a single lax.scan wavefront program when the CU
grid is uniform, falling back to per-step dispatch for mixed quadtrees.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hevc_hop_tpu.bitstream import nal, params
from hevc_hop_tpu.common import rom
from hevc_hop_tpu.common.types import NalUnitType, SliceType
from hevc_hop_tpu.entropy import ctx_layout, native
from hevc_hop_tpu.io import yuv as yuvio
from hevc_hop_tpu.ops import quant, transform
from hevc_hop_tpu.models import wavefront, wavefront_scan
from hevc_hop_tpu.ops import deblock


def _dense_residual(coef_plane: np.ndarray, leaves, qp: int, bit_depth: int,
                    chroma: bool) -> np.ndarray:
    """Dequant + inverse transform all TUs, batched per size."""
    sizes = {log2 for (_, _, log2) in leaves}
    if len(sizes) == 1:
        # uniform fast path: reshape the whole plane into blocks
        log2 = next(iter(sizes)) - (1 if chroma else 0)
        n = 1 << log2
        h, w = coef_plane.shape
        blocks = coef_plane.astype(np.int32).reshape(
            h // n, n, w // n, n).transpose(0, 2, 1, 3).reshape(-1, n, n)
        deq = quant.dequant(jnp.asarray(blocks), qp, log2, bit_depth)
        resi = np.asarray(transform.inv_transform(deq, bit_depth,
                                                  use_dst=False))
        return resi.reshape(h // n, w // n, n, n).transpose(
            0, 2, 1, 3).reshape(h, w)
    out = np.zeros_like(coef_plane, dtype=np.int32)
    by_size = {}
    for (x, y, log2) in leaves:
        if chroma:
            x, y, log2 = x // 2, y // 2, log2 - 1
        by_size.setdefault(log2, []).append((x, y))
    for log2, positions in by_size.items():
        n = 1 << log2
        blocks = np.stack([coef_plane[y:y + n, x:x + n]
                           for (x, y) in positions]).astype(np.int32)
        deq = quant.dequant(jnp.asarray(blocks), qp, log2, bit_depth)
        resi = np.asarray(transform.inv_transform(deq, bit_depth,
                                                  use_dst=False))
        for i, (x, y) in enumerate(positions):
            out[y:y + n, x:x + n] = resi[i]
    return out


class Decoder:
    def __init__(self) -> None:
        self.sps = None
        self.pps = None
        self.vps = None
        self.pictures = []
        self.hash_ok = []   # per decoded-picture-hash SEI verification

    def decode_stream(self, stream: bytes) -> list:
        """Decode an AnnexB stream; returns list of (y, cb, cr) frames."""
        from hevc_hop_tpu.bitstream import sei as seimod
        for (nal_type, rbsp) in nal.annexb_split(stream):
            if nal_type == NalUnitType.VPS_NUT:
                self.vps = params.parse_vps(rbsp)
            elif nal_type == NalUnitType.SPS_NUT:
                self.sps = params.parse_sps(rbsp)
            elif nal_type == NalUnitType.PPS_NUT:
                self.pps = params.parse_pps(rbsp)
            elif nal_type in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP,
                              NalUnitType.CRA_NUT, NalUnitType.TRAIL_R):
                self._decode_slice(rbsp, nal_type)
            elif nal_type in (NalUnitType.PREFIX_SEI_NUT,
                              NalUnitType.SUFFIX_SEI_NUT):
                for msg in seimod.parse_sei(rbsp):
                    if (msg.payload_type == seimod.PICTURE_HASH
                            and self.pictures):
                        # TDecGop.cpp:230 calcAndPrintHashStatus
                        self.hash_ok.append(seimod.verify_picture_hash(
                            msg.payload, *self.pictures[-1],
                            self.sps.bit_depth))
        return self.pictures

    def _decode_slice(self, rbsp: bytes, nal_type: int) -> None:
        sps, pps = self.sps, self.pps
        holo = bool(self.vps and self.vps.holo)
        sh = params.parse_slice_header(rbsp, sps, pps, nal_type, holo)
        assert sh.slice_type in (SliceType.I, SliceType.ISS,
                                 SliceType.PSS), "P/B slices TODO"
        w, h, bd = sps.pic_width, sps.pic_height, sps.bit_depth
        qp = sh.slice_qp
        states = ctx_layout.init_states(int(sh.slice_type), qp)
        if sh.slice_type == SliceType.PSS:
            # the signaled L0 count INCLUDES the virtual SS ref, which
            # replaces the LAST entry (TComSlice.cpp:497-506)
            num_ref = sh.num_ref_wire
            maps = native.decode_slice_data_ss(
                states, rbsp[sh.data_offset:], w, h, sps.ctb_log2,
                sps.max_transform_hierarchy_depth_intra,
                int(SliceType.PSS), self.vps.holo_mi_size, num_ref,
                sao_on=int(sps.sao_enabled),
                sbh=int(pps.sign_data_hiding))
        elif sh.slice_type == SliceType.ISS:
            maps = native.decode_slice_data_ss(
                states, rbsp[sh.data_offset:], w, h, sps.ctb_log2,
                sps.max_transform_hierarchy_depth_intra,
                int(SliceType.ISS), self.vps.holo_mi_size,
                sao_on=int(sps.sao_enabled),
                sbh=int(pps.sign_data_hiding))
        else:
            maps = native.decode_slice_data(
                states, rbsp[sh.data_offset:], w, h, sps.ctb_log2,
                max_hier_depth=sps.max_transform_hierarchy_depth_intra,
                sao_on=int(sps.sao_enabled),
                sbh=int(pps.sign_data_hiding))

        # reconstruction structure = TRANSFORM blocks (prediction is per-TU)
        leaves = wavefront.tu_blocks_from_maps(maps.depth8, maps.tu4,
                                               w, h, sps.ctb_log2)
        qp_c = rom.chroma_qp_from_luma(qp)
        resi_y = _dense_residual(maps.coef_y, leaves, qp, bd, False)
        resi_cb = _dense_residual(maps.coef_cb, leaves, qp_c, bd, True)
        resi_cr = _dense_residual(maps.coef_cr, leaves, qp_c, bd, True)

        assert min(log2 for (_, _, log2) in leaves) >= 3, \
            "4x4-TU (NxN) streams TODO"
        self._cur_qp = qp
        if sh.slice_type in (SliceType.ISS, SliceType.PSS):
            self._recon_ss(maps, leaves, resi_y, resi_cb, resi_cr)
        else:
            self._recon(maps, leaves, resi_y, resi_cb, resi_cr)

    def _recon(self, maps, leaves, resi_y, resi_cb, resi_cr) -> None:
        sps = self.sps
        w, h, bd = sps.pic_width, sps.pic_height, sps.bit_depth
        sizes, data, nsteps = wavefront_scan.build_schedule(
            leaves, w, h, sps.ctb_log2)
        xs = {}
        for log2 in sizes:
            d = data[log2]
            pos, valid = d["pos"], d["valid"]
            px = np.where(valid, pos[..., 0], 0)
            py = np.where(valid, pos[..., 1], 0)
            modes = maps.mode4[py // 4, px // 4].astype(np.int32)
            cm = maps.cmode8[py // 8, px // 8].astype(np.int32)
            cmodes = np.where(cm == 36, modes, cm)
            modes = np.where(valid, modes, 0)
            cmodes = np.where(valid, cmodes, 0)
            xs[log2] = (jnp.asarray(pos), jnp.asarray(d["avail"]),
                        jnp.asarray(d["availc"]), jnp.asarray(modes),
                        jnp.asarray(cmodes))

        pad = 1 << sps.ctb_log2
        rpy = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(resi_y))
        rpcb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(resi_cb))
        rpcr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(resi_cr))
        ry, rcb, rcr = wavefront_scan.scan_decode(
            rpy, rpcb, rpcr, xs, sizes=sizes, bit_depth=bd,
            strong=sps.strong_intra_smoothing, h=h)
        ry, rcb, rcr = ry[:h], rcb[:h // 2], rcr[:h // 2]
        if not self.pps.deblocking_disabled:
            from hevc_hop_tpu.common import rom as _rom
            qp_c = _rom.chroma_qp_from_luma(self._cur_qp)
            ry, rcb, rcr = deblock.deblock_frame(
                ry, rcb, rcr, jnp.asarray(maps.tu4), qp=self._cur_qp,
                qp_c=qp_c, bit_depth=bd,
                beta_off=self.pps.beta_offset_div2,
                tc_off=self.pps.tc_offset_div2)
        if self.sps.sao_enabled:
            from hevc_hop_tpu.ops import sao as saop
            ry, rcb, rcr = saop.apply_sao_frame(
                ry, rcb, rcr, maps.sao_type, maps.sao_off, maps.sao_band,
                self.sps.ctb_log2, bd)
        self.pictures.append((np.asarray(ry, np.int32),
                              np.asarray(rcb, np.int32),
                              np.asarray(rcr, np.int32)))

    def _recon_ss(self, maps, leaves, resi_y, resi_cb, resi_cr) -> None:
        """ISS reconstruction: MV-aware wavefront over intra + SS CUs.

        Mirror of TDecCu.cpp:454-476 (recon feeding the SS ref) — the
        schedule is built from the ACTUAL coded MV dependency rects, so
        independent CUs batch together regardless of z distance.
        """
        from hevc_hop_tpu.models import ss_scan
        sps = self.sps
        w, h, bd = sps.pic_width, sps.pic_height, sps.bit_depth

        pss = maps.slice_type == int(SliceType.PSS)
        ss_idx = maps.num_ref - 1
        arr = np.array(leaves, np.int32)
        rects = np.zeros((len(leaves), 4), np.int32)
        for i, (x, y, log2) in enumerate(leaves):
            if (maps.pred4[y // 4, x // 4] == 0
                    and maps.ref4[y // 4, x // 4] == ss_idx):  # SS PU
                n = 1 << log2
                mvx = int(maps.mv4x[y // 4, x // 4]) >> 2
                mvy = int(maps.mv4y[y // 4, x // 4]) >> 2
                if maps.gt8[y // 8, x // 8]:
                    # GT warp reads the clamped 2n window (+chroma slack)
                    f = 2
                    rects[i] = (x + mvx - n // 2 - f, y + mvy - n // 2 - f,
                                2 * n + 2 * f, 2 * n + 2 * f)
                else:
                    f = ss_scan.IFM
                    rects[i] = (x + mvx - f, y + mvy - f,
                                n + 2 * f, n + 2 * f)
        sizes, data, nsteps = ss_scan.build_schedule_ss(
            leaves, w, h, sps.ctb_log2, radius=0, mv_rect=rects)

        xs = {}
        for log2 in sizes:
            d = data[log2]
            pos, valid = d["pos"], d["valid"]
            px = np.where(valid, pos[..., 0], 0)
            py = np.where(valid, pos[..., 1], 0)
            modes = maps.mode4[py // 4, px // 4].astype(np.int32)
            cm = maps.cmode8[py // 8, px // 8].astype(np.int32)
            cmodes = np.where(cm == 36, modes, cm)
            inter = np.where(valid, maps.pred4[py // 4, px // 4] == 0,
                             False).astype(np.int32)
            ssf = inter * (maps.ref4[py // 4, px // 4] == ss_idx)
            tf = inter * (1 - (maps.ref4[py // 4, px // 4] == ss_idx))
            mvq = np.stack([maps.mv4x[py // 4, px // 4],
                            maps.mv4y[py // 4, px // 4]], -1).astype(np.int32)
            mvq = np.where(inter[..., None] != 0, mvq, 0)
            gtf = np.where(valid, maps.gt8[py // 8, px // 8],
                           0).astype(np.int32)
            gtv = maps.gtv8[py // 8, px // 8].astype(np.int32)
            gtv = np.where(gtf[..., None] != 0, gtv, 0)
            common = (jnp.asarray(pos), jnp.asarray(d["avail"]),
                      jnp.asarray(d["availc"]),
                      jnp.asarray(np.where(valid, modes, 0)),
                      jnp.asarray(np.where(valid, cmodes, 0)))
            if pss:
                xs[log2] = common + (jnp.asarray(ssf.astype(np.int32)),
                                     jnp.asarray(tf.astype(np.int32)),
                                     jnp.asarray(mvq), jnp.asarray(gtf),
                                     jnp.asarray(gtv))
            else:
                xs[log2] = common + (jnp.asarray(inter), jnp.asarray(mvq),
                                     jnp.asarray(gtf), jnp.asarray(gtv))

        pad = 1 << sps.ctb_log2
        rpy = jnp.zeros((h + pad, w), jnp.int32).at[:h].set(
            jnp.asarray(resi_y))
        rpcb = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(resi_cb))
        rpcr = jnp.zeros((h // 2 + pad, w // 2), jnp.int32).at[:h // 2].set(
            jnp.asarray(resi_cr))
        if pss:
            py_, pcb, pcr = self.pictures[-1]
            ry, rcb, rcr = ss_scan.scan_decode_pss(
                rpy, rpcb, rpcr, jnp.asarray(py_), jnp.asarray(pcb),
                jnp.asarray(pcr), xs, sizes=sizes, bit_depth=bd,
                strong=sps.strong_intra_smoothing, h=h)
        else:
            ry, rcb, rcr = ss_scan.scan_decode_ss(
                rpy, rpcb, rpcr, xs, sizes=sizes, bit_depth=bd,
                strong=sps.strong_intra_smoothing, h=h)
        ry, rcb, rcr = ry[:h], rcb[:h // 2], rcr[:h // 2]
        if not self.pps.deblocking_disabled:
            qp_c = rom.chroma_qp_from_luma(self._cur_qp)
            ry, rcb, rcr = deblock.deblock_frame(
                ry, rcb, rcr, jnp.asarray(maps.tu4), qp=self._cur_qp,
                qp_c=qp_c, bit_depth=bd,
                beta_off=self.pps.beta_offset_div2,
                tc_off=self.pps.tc_offset_div2, pred4=maps.pred4,
                cbf4=maps.cbf4_y, ref4=maps.ref4, mv4x=maps.mv4x,
                mv4y=maps.mv4y)
        if self.sps.sao_enabled:
            from hevc_hop_tpu.ops import sao as saop
            ry, rcb, rcr = saop.apply_sao_frame(
                ry, rcb, rcr, maps.sao_type, maps.sao_off, maps.sao_band,
                self.sps.ctb_log2, bd)
        self.pictures.append((np.asarray(ry, np.int32),
                              np.asarray(rcb, np.int32),
                              np.asarray(rcr, np.int32)))

    def picture_md5(self, idx: int = -1) -> bytes:
        y, cb, cr = self.pictures[idx]
        return yuvio.picture_md5(y, cb, cr, self.sps.bit_depth)
