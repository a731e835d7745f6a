"""In-loop deblocking filter as dense whole-frame tensor passes.

Replaces the reference's per-CTU edge loops (TComLoopFilter.cpp:129
loopFilterPic -> xDeblockCU -> xEdgeFilterLuma/Chroma) with two vectorized
passes: all vertical edges of the picture at once (adjacent 8-px edges touch
disjoint sample windows), then all horizontal edges on the vertically
filtered output — the same picture-level ordering the reference uses.

All-intra scope: boundary strength is 2 at every TU boundary on the 8x8
grid (bS derivation for inter MVs comes with the inter path). Math follows
H.265 8.7.2.5 exactly; beta/tc tables are golden-verified against the
reference (tests/golden/hm_golden.json deblock_beta/deblock_tc).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# H.265 Table 8-11
TC_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10,
     11, 13, 14, 16, 18, 20, 22, 24], np.int32)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11,
     12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38,
     40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], np.int32)


def _luma_edges(plane: jnp.ndarray, edge_on: jnp.ndarray, beta: int, tc: int,
                bit_depth: int) -> jnp.ndarray:
    """Filter all vertical 8-grid edges of `plane` [H, W].

    edge_on: [H//4, E] bool per 4-row segment per edge (E = W//8 - 1).
    """
    h, w = plane.shape
    e = w // 8 - 1
    if e <= 0:
        return plane
    maxv = (1 << bit_depth) - 1
    win = plane[:, 4:4 + e * 8].reshape(h, e, 8)      # p3..p0 q0..q3
    p3, p2, p1, p0 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    q0, q1, q2, q3 = win[..., 4], win[..., 5], win[..., 6], win[..., 7]

    seg = lambda a: a.reshape(h // 4, 4, e)
    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = seg(dp)[:, 0], seg(dp)[:, 3]
    dq0, dq3 = seg(dq)[:, 0], seg(dq)[:, 3]
    d = dp0 + dp3 + dq0 + dq3
    f_on = (d < beta) & edge_on                        # [H/4, E]

    def row_cond(r):
        sp = seg(p0)[:, r]
        sq = seg(q0)[:, r]
        c1 = 2 * (seg(dp)[:, r] + seg(dq)[:, r]) < (beta >> 2)
        c2 = (jnp.abs(seg(p3)[:, r] - sp) + jnp.abs(sq - seg(q3)[:, r])
              < (beta >> 3))
        c3 = jnp.abs(sp - sq) < ((5 * tc + 1) >> 1)
        return c1 & c2 & c3

    strong = row_cond(0) & row_cond(3) & f_on          # [H/4, E]
    weak = f_on & ~strong

    up = lambda a: jnp.repeat(a, 4, axis=0)            # segment -> rows
    strong_r = up(strong)
    weak_r = up(weak)

    # strong filter
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tc, p0 + 2 * tc)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc, p1 + 2 * tc)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tc, p2 + 2 * tc)
    sq0 = jnp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   q0 - 2 * tc, q0 + 2 * tc)
    sq1 = jnp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tc, q1 + 2 * tc)
    sq2 = jnp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                   q2 - 2 * tc, q2 + 2 * tc)

    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = weak_r & (jnp.abs(delta) < 10 * tc)
    d1 = jnp.clip(delta, -tc, tc)
    wp0 = jnp.clip(p0 + d1, 0, maxv)
    wq0 = jnp.clip(q0 - d1, 0, maxv)
    side_thresh = (beta + (beta >> 1)) >> 3
    dep = up((dp0 + dp3) < side_thresh) & w_on
    deq = up((dq0 + dq3) < side_thresh) & w_on
    tc2 = tc >> 1
    dpv = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + d1) >> 1, -tc2, tc2)
    dqv = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - d1) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dpv, 0, maxv)
    wq1 = jnp.clip(q1 + dqv, 0, maxv)

    np0 = jnp.where(strong_r, sp0, jnp.where(w_on, wp0, p0))
    np1 = jnp.where(strong_r, sp1, jnp.where(dep, wp1, p1))
    np2 = jnp.where(strong_r, sp2, p2)
    nq0 = jnp.where(strong_r, sq0, jnp.where(w_on, wq0, q0))
    nq1 = jnp.where(strong_r, sq1, jnp.where(deq, wq1, q1))
    nq2 = jnp.where(strong_r, sq2, q2)

    out = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    return plane.at[:, 4:4 + e * 8].set(out.reshape(h, e * 8))


def _chroma_edges(plane: jnp.ndarray, edge_on: jnp.ndarray, tc: int,
                  bit_depth: int) -> jnp.ndarray:
    """Filter vertical chroma edges (8-chroma-sample grid). plane [H, W],
    edge_on [H//4? , E] per 4-row segment? chroma uses per-row bS=2 edges;
    edge_on given per 4-row segment for map convenience."""
    h, w = plane.shape
    e = w // 8 - 1
    if e <= 0 or tc == 0:
        return plane
    maxv = (1 << bit_depth) - 1
    win = plane[:, 6:6 + e * 8].reshape(h, e, 8)   # p1 p0 q0 q1 + 4 pad
    p1, p0, q0, q1 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    on = jnp.repeat(edge_on, 4, axis=0)
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, maxv), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, maxv), q0)
    out = jnp.concatenate(
        [p1[..., None], np0[..., None], nq0[..., None], q1[..., None],
         win[..., 4:]], axis=-1)
    return plane.at[:, 6:6 + e * 8].set(out.reshape(h, e * 8))


@functools.partial(jax.jit, static_argnames=("qp", "qp_c", "bit_depth",
                                             "beta_off", "tc_off"))
def deblock_frame(y, cb, cr, tu4, qp: int, qp_c: int, bit_depth: int = 8,
                  beta_off: int = 0, tc_off: int = 0):
    """Deblock one frame. y [H,W], cb/cr [H/2,W/2], tu4 [H/4,W/4] leaf-TU
    log2 map. Returns filtered planes."""
    h, w = y.shape
    qb = min(max(qp + beta_off * 2, 0), 51)
    qt = min(max(qp + 2 + tc_off * 2, 0), 53)
    beta = int(BETA_TABLE[qb]) << (bit_depth - 8)
    tc = int(TC_TABLE[qt]) << (bit_depth - 8)
    qtc = min(max(qp_c + 2 + tc_off * 2, 0), 53)
    tc_c = int(TC_TABLE[qtc]) << (bit_depth - 8)

    tu4 = jnp.asarray(tu4, jnp.int32)

    def edge_mask_v(tum, grid, count):
        # edge at x = grid*(k+1); on iff x aligned to the right block's TU
        xs = (jnp.arange(count) + 1) * grid          # [E]
        sizes = 1 << tum[:, xs // 4]                 # [H/4, E]
        return (xs[None, :] % sizes) == 0

    def edge_mask_h(tum, grid, count):
        ys = (jnp.arange(count) + 1) * grid
        sizes = 1 << tum[ys // 4, :]                 # [E, W/4]
        return (ys[:, None] % sizes) == 0

    # ---- luma ----
    ev = edge_mask_v(tu4, 8, w // 8 - 1)             # [H/4, E]
    y = _luma_edges(y, ev, beta, tc, bit_depth)
    eh = edge_mask_h(tu4, 8, h // 8 - 1)             # [E, W/4]
    # per 4-col segment: transpose plane and reuse vertical machinery
    yt = y.T
    eh_seg = eh.T                                    # [W/4, E]
    y = _luma_edges(yt, eh_seg, beta, tc, bit_depth).T

    # ---- chroma (edges on the 8-chroma grid = 16 luma) ----
    if tc_c > 0:
        hc, wc = cb.shape
        ec = wc // 8 - 1
        if ec > 0:
            xs = (np.arange(ec) + 1) * 8             # chroma x
            evc = (jnp.asarray(xs)[None, :] * 2 %
                   (1 << tu4[::2, (jnp.asarray(xs) * 2) // 4])) == 0
            cb = _chroma_edges(cb, evc, tc_c, bit_depth)
            cr = _chroma_edges(cr, evc, tc_c, bit_depth)
        ehc = hc // 8 - 1
        if ehc > 0:
            ys = (np.arange(ehc) + 1) * 8
            ehm = (jnp.asarray(ys)[:, None] * 2 %
                   (1 << tu4[(jnp.asarray(ys) * 2) // 4, ::2])) == 0
            cb = _chroma_edges(cb.T, ehm.T, tc_c, bit_depth).T
            cr = _chroma_edges(cr.T, ehm.T, tc_c, bit_depth).T
    return y, cb, cr
