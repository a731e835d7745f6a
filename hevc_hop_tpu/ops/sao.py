"""Sample Adaptive Offset: dense whole-frame apply + per-CTU stats + RDO.

Capability ref: TComSampleAdaptiveOffset.cpp (offsetBlock:365 EO0/90/135/45
+ BO, SAOProcess:709) and TEncSampleAdaptiveOffset.cpp (getStatistics:305,
decideBlkParams:762, mode RDO new/merge 569,706).

TPU-native formulation: classification is a handful of shifted comparisons
over the whole plane; the per-CTU type/offset fields are gathered per pixel,
so the apply is one fused elementwise pass. Encoder statistics are dense
per-category difference sums tile-reduced per CTU; the (tiny) per-CTU RDO
runs on host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# EO neighbor pairs per class (dy, dx): 0=hor, 1=ver, 2=135deg, 3=45deg
EO_NEIGHBORS = (((0, -1), (0, 1)),
                ((-1, 0), (1, 0)),
                ((-1, -1), (1, 1)),
                ((-1, 1), (1, -1)))
# edgeIdx lut: signs sum +2 -> category (TComSampleAdaptiveOffset offsetBlock)
EO_LUT = (1, 2, 0, 3, 4)


def _shifted(p, dy, dx):
    """Neighbor plane + validity mask (picture-boundary pixels invalid)."""
    h, w = p.shape
    n = jnp.roll(jnp.roll(p, -dy, 0), -dx, 1)
    vy = jnp.ones(h, bool)
    if dy < 0:
        vy = vy.at[:(-dy)].set(False)
    elif dy > 0:
        vy = vy.at[h - dy:].set(False)
    vx = jnp.ones(w, bool)
    if dx < 0:
        vx = vx.at[:(-dx)].set(False)
    elif dx > 0:
        vx = vx.at[w - dx:].set(False)
    return n, vy[:, None] & vx[None, :]


def _eo_cat(p, cls):
    """Per-pixel EO category (0..4) + validity for one class."""
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[cls]
    n0, v0 = _shifted(p, dy0, dx0)
    n1, v1 = _shifted(p, dy1, dx1)
    s = jnp.sign(p - n0) + jnp.sign(p - n1)
    cat = jnp.asarray(EO_LUT, jnp.int32)[(s + 2).astype(jnp.int32)]
    return cat, v0 & v1


@functools.partial(jax.jit, static_argnames=("ctb_log2", "bit_depth"))
def apply_sao_plane(pre, type_map, offs, band, ctb_log2: int,
                    bit_depth: int = 8):
    """Apply SAO to one plane.

    pre: [H, W] int32 deblocked samples (classification source AND input);
    type_map [ncty, nctx] int32 (0 off, 1 BO, 2+cls EO); offs
    [ncty, nctx, 4] int32; band [ncty, nctx] int32. Returns [H, W] int32.
    """
    h, w = pre.shape
    p = pre
    cyi = (jnp.arange(h) >> ctb_log2)[:, None]
    cxi = (jnp.arange(w) >> ctb_log2)[None, :]
    t = type_map[cyi, cxi]
    o = offs[cyi, cxi]                    # [H, W, 4]
    bpos = band[cyi, cxi]

    # BO: band = p >> (bd - 5); 4 consecutive bands from band position
    bidx = p >> (bit_depth - 5)
    rel = (bidx - bpos) & 31
    bo = jnp.where(rel < 4,
                   jnp.take_along_axis(
                       o, jnp.clip(rel, 0, 3)[..., None], -1)[..., 0], 0)
    out = jnp.where(t == 1, bo, 0)

    for cls in range(4):
        cat, valid = _eo_cat(p, cls)
        eo = jnp.where(
            (cat > 0) & valid,
            jnp.take_along_axis(
                o, jnp.clip(cat - 1, 0, 3)[..., None], -1)[..., 0], 0)
        out = jnp.where(t == 2 + cls, eo, out)
    return jnp.clip(p + out, 0, (1 << bit_depth) - 1)


@functools.partial(jax.jit, static_argnames=("ctb_log2",))
def _tile_sums(x, ctb_log2: int):
    h, w = x.shape
    c = 1 << ctb_log2
    return x.reshape(h // c, c, w // c, c).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("ctb_log2", "bit_depth"))
def sao_stats_plane(org, pre, ctb_log2: int, bit_depth: int = 8):
    """Per-CTU SAO statistics for one plane (getStatistics:305).

    org/pre: [H, W] int32 padded to CTU multiples with org==pre (so padding
    contributes count but zero diff — counts on padding slightly inflate
    the no-gain case, never invent gain). Returns (eo_cnt [ncty,nctx,4,4],
    eo_sum, bo_cnt [ncty,nctx,32], bo_sum) with EO cats 1..4 at index 0..3.
    """
    diff = (org - pre).astype(jnp.int32)
    eo_cnt, eo_sum = [], []
    for cls in range(4):
        cat, valid = _eo_cat(pre, cls)
        cnts, sums = [], []
        for k in range(1, 5):
            m = ((cat == k) & valid).astype(jnp.int32)
            cnts.append(_tile_sums(m, ctb_log2))
            sums.append(_tile_sums(m * diff, ctb_log2))
        eo_cnt.append(jnp.stack(cnts, -1))
        eo_sum.append(jnp.stack(sums, -1))
    bidx = pre >> (bit_depth - 5)
    bo_cnt, bo_sum = [], []
    for b in range(32):
        m = (bidx == b).astype(jnp.int32)
        bo_cnt.append(_tile_sums(m, ctb_log2))
        bo_sum.append(_tile_sums(m * diff, ctb_log2))
    return (jnp.stack(eo_cnt, -2), jnp.stack(eo_sum, -2),
            jnp.stack(bo_cnt, -1), jnp.stack(bo_sum, -1))


# ---------------------------------------------------------------------------
# Host-side RDO (tiny per-CTU problem; numpy)
# ---------------------------------------------------------------------------

def _best_offset(cnt, s, lam, lo, hi):
    """Scalar offset minimizing cnt*o^2 - 2*o*s + lam*rate(o)."""
    if cnt == 0:
        return 0, 0.0
    o0 = int(np.clip(np.round(s / cnt), lo, hi))
    best, bo = 0.0, 0
    step = 1 if o0 >= 0 else -1
    for o in range(0, o0 + step, step):
        c = cnt * o * o - 2.0 * o * s + lam * (abs(o) + 1)
        if c < best:
            best, bo = c, o
    return bo, best


def _params_cost(cnt4, sum4, offs, lam_bits=0.0):
    d = 0.0
    for k in range(4):
        d += cnt4[k] * offs[k] * offs[k] - 2.0 * offs[k] * sum4[k]
    return d + lam_bits


def choose_sao_params(stats_y, stats_cb, stats_cr, lam: float):
    """Per-CTU SAO decision incl. merge (decideBlkParams:762).

    stats_*: (eo_cnt, eo_sum, bo_cnt, bo_sum) numpy. Returns
    (merge [ncty,nctx], type3 [ncty,nctx,3], off [ncty,nctx,3,4],
    band [ncty,nctx,3]).
    """
    ncty, nctx = stats_y[0].shape[:2]
    merge = np.zeros((ncty, nctx), np.uint8)
    type3 = np.zeros((ncty, nctx, 3), np.uint8)
    off = np.zeros((ncty, nctx, 3, 4), np.int16)
    band = np.zeros((ncty, nctx, 3), np.uint8)
    comps = (stats_y, stats_cb, stats_cr)

    def comp_best(ci, cy, cx, force_type=None, force_cls=None):
        """Best (type, offs, band, cost) for one component of one CTU."""
        eo_cnt, eo_sum, bo_cnt, bo_sum = comps[ci]
        best = (0, np.zeros(4, np.int16), 0, 0.0)   # OFF
        classes = range(4) if force_cls is None else [force_cls]
        types = (1, 2) if force_type is None else [force_type]
        if 2 in types:
            for cls in classes:
                offs = np.zeros(4, np.int16)
                cost = lam * 4.0   # type + class rate
                for k in range(4):
                    lo, hi = (0, 7) if k < 2 else (-7, 0)
                    o, c = _best_offset(int(eo_cnt[cy, cx, cls, k]),
                                        float(eo_sum[cy, cx, cls, k]),
                                        lam, lo, hi)
                    offs[k] = o
                    cost += c
                if cost < best[3]:
                    best = (2 + cls, offs, 0, cost)
        if 1 in types:
            bo = np.zeros(32, np.int16)
            bc = np.zeros(32)
            for b in range(32):
                o, c = _best_offset(int(bo_cnt[cy, cx, b]),
                                    float(bo_sum[cy, cx, b]), lam, -7, 7)
                bo[b], bc[b] = o, c
            costs = np.array([bc[(s + np.arange(4)) % 32].sum()
                              for s in range(32)])
            s = int(np.argmin(costs))
            cost = costs[s] + lam * 7.0  # type + band position rate
            if cost < best[3]:
                best = (1, bo[(s + np.arange(4)) % 32].astype(np.int16),
                        s, cost)
        return best

    def eval_params(ci, cy, cx, t, offs, bpos):
        eo_cnt, eo_sum, bo_cnt, bo_sum = comps[ci]
        if t == 0:
            return 0.0
        if t >= 2:
            return _params_cost(eo_cnt[cy, cx, t - 2], eo_sum[cy, cx, t - 2],
                                offs)
        d = 0.0
        for k in range(4):
            b = (bpos + k) % 32
            d += (bo_cnt[cy, cx, b] * offs[k] * offs[k]
                  - 2.0 * offs[k] * bo_sum[cy, cx, b])
        return d

    for cy in range(ncty):
        for cx in range(nctx):
            # new params: luma free; cb/cr share type idx + EO class
            ty, oy, by, costy = comp_best(0, cy, cx)
            tcb, ocb, bcb, costcb = comp_best(1, cy, cx)
            tcls = None if tcb < 2 else tcb - 2
            tcr, ocr, bcr, costcr = comp_best(
                2, cy, cx, force_type=(tcb if tcb <= 1 else 2),
                force_cls=tcls)
            new_cost = costy + costcb + costcr + lam * 2.0
            cands = [(0, (ty, oy, by, tcb, ocb, bcb, tcr, ocr, bcr),
                      new_cost)]
            for mrg, (sy, sx) in ((1, (cy, cx - 1)), (2, (cy - 1, cx))):
                if sx < 0 or sy < 0:
                    continue
                cost = lam * 1.0
                for ci in range(3):
                    cost += eval_params(ci, cy, cx, type3[sy, sx, ci],
                                        off[sy, sx, ci],
                                        band[sy, sx, ci])
                cands.append((mrg, (type3[sy, sx, 0], off[sy, sx, 0],
                                    band[sy, sx, 0], type3[sy, sx, 1],
                                    off[sy, sx, 1], band[sy, sx, 1],
                                    type3[sy, sx, 2], off[sy, sx, 2],
                                    band[sy, sx, 2]), cost))
            mrg, prm, _ = min(cands, key=lambda c: c[2])
            merge[cy, cx] = mrg
            (type3[cy, cx, 0], off[cy, cx, 0], band[cy, cx, 0],
             type3[cy, cx, 1], off[cy, cx, 1], band[cy, cx, 1],
             type3[cy, cx, 2], off[cy, cx, 2], band[cy, cx, 2]) = prm
    return merge, type3, off, band


def rdo_and_apply(org_yuv, rec_yuv, maps, ctb_log2: int, lam: float,
                  bit_depth: int = 8):
    """Encoder-side SAO: stats -> per-CTU RDO -> fill maps.sao_* -> apply.

    org_yuv/rec_yuv: ((y, cb, cr)) numpy/jnp planes at true size (must be
    CTU multiples). Returns post-SAO (ry, rcb, rcr) jnp planes.
    """
    oy, ocb, ocr = (jnp.asarray(p, jnp.int32) for p in org_yuv)
    ry, rcb, rcr = (jnp.asarray(p, jnp.int32) for p in rec_yuv)
    st_y = [np.asarray(a) for a in sao_stats_plane(oy, ry, ctb_log2,
                                                   bit_depth)]
    st_cb = [np.asarray(a) for a in sao_stats_plane(ocb, rcb, ctb_log2 - 1,
                                                    bit_depth)]
    st_cr = [np.asarray(a) for a in sao_stats_plane(ocr, rcr, ctb_log2 - 1,
                                                    bit_depth)]
    merge, type3, off, band = choose_sao_params(st_y, st_cb, st_cr, lam)
    maps.sao_on = 1
    maps.sao_merge[:] = merge
    maps.sao_type[:] = type3
    maps.sao_off[:] = off
    maps.sao_band[:] = band
    return apply_sao_frame(ry, rcb, rcr, type3, off, band, ctb_log2,
                           bit_depth)


def apply_sao_frame(ry, rcb, rcr, type3, off, band, ctb_log2: int,
                    bit_depth: int = 8):
    """Apply resolved per-CTU SAO params to all three planes."""
    t_y = jnp.asarray(type3[:, :, 0].astype(np.int32))
    o_y = jnp.asarray(off[:, :, 0].astype(np.int32))
    b_y = jnp.asarray(band[:, :, 0].astype(np.int32))
    ry2 = apply_sao_plane(ry, t_y, o_y, b_y, ctb_log2, bit_depth)
    outs = [ry2]
    for ci, plane in ((1, rcb), (2, rcr)):
        t = jnp.asarray(type3[:, :, ci].astype(np.int32))
        o = jnp.asarray(off[:, :, ci].astype(np.int32))
        b = jnp.asarray(band[:, :, ci].astype(np.int32))
        outs.append(apply_sao_plane(plane, t, o, b, ctb_log2 - 1,
                                    bit_depth))
    return tuple(outs)
