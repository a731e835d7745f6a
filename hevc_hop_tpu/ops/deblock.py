"""In-loop deblocking filter as dense whole-frame tensor passes.

Replaces the reference's per-CTU edge loops (TComLoopFilter.cpp:129
loopFilterPic -> xDeblockCU -> xEdgeFilterLuma/Chroma) with two vectorized
passes: all vertical edges of the picture at once (adjacent 8-px edges touch
disjoint sample windows), then all horizontal edges on the vertically
filtered output — the same picture-level ordering the reference uses.

Boundary strength follows TComLoopFilter.cpp:395 xGetBoundaryStrengthSingle:
2 when either side is intra, 1 at a TU edge with luma cbf on either side or
when refs/MVs differ by >= 1 full pel, else 0. Luma tc is BS-dependent
(DEFAULT_INTRA_TC_OFFSET*(bs-1)); chroma filters only BS==2 edges. Math
follows H.265 8.7.2.5 exactly; beta/tc tables are golden-verified against
the reference (tests/golden/hm_golden.json deblock_beta/deblock_tc).
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


def _luma_edges(plane: jnp.ndarray, edge_on: jnp.ndarray, beta: int,
                tc_seg: jnp.ndarray, bit_depth: int) -> jnp.ndarray:
    """Filter all vertical 8-grid edges of `plane` [H, W].

    edge_on: [H//4, E] bool per 4-row segment per edge (E = W//8 - 1).
    tc_seg:  [H//4, E] int32 per-segment tc (BS-dependent).
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
        c3 = jnp.abs(sp - sq) < ((5 * tc_seg + 1) >> 1)
        return c1 & c2 & c3

    strong = row_cond(0) & row_cond(3) & f_on          # [H/4, E]
    weak = f_on & ~strong

    up = lambda a: jnp.repeat(a, 4, axis=0)            # segment -> rows
    strong_r = up(strong)
    weak_r = up(weak)
    tc = up(tc_seg)                                    # [H, E]

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
                  bit_depth: int, rep: int = 2) -> jnp.ndarray:
    """Filter vertical chroma edges (8-chroma-sample grid). plane [H, W].

    edge_on is per decision segment (HM decides per 4-luma-sample part =
    2 chroma rows, TComLoopFilter xEdgeFilterChroma); `rep` chroma rows
    share each segment decision (rep=2 for the HM-exact granularity)."""
    h, w = plane.shape
    e = w // 8 - 1
    if e <= 0 or tc == 0:
        return plane
    maxv = (1 << bit_depth) - 1
    win = plane[:, 6:6 + e * 8].reshape(h, e, 8)   # p1 p0 q0 q1 + 4 pad
    p1, p0, q0, q1 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    on = jnp.repeat(edge_on, rep, axis=0)
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, maxv), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, maxv), q0)
    out = jnp.concatenate(
        [p1[..., None], np0[..., None], nq0[..., None], q1[..., None],
         win[..., 4:]], axis=-1)
    return plane.at[:, 6:6 + e * 8].set(out.reshape(h, e * 8))


def _edge_bs_v(tu4, pred4, cbf4, ref4, mv4x, mv4y, w: int):
    """Per-4-row-segment boundary strength for vertical 8-grid edges.

    Returns (edge_on [H/4, E], bs [H/4, E]) with E = w//8 - 1.
    xGetBoundaryStrengthSingle (TComLoopFilter.cpp:395) on dense maps.
    """
    e = w // 8 - 1
    xs = (jnp.arange(e) + 1) * 8                     # edge x positions
    cq = xs // 4                                     # q-side 4x4 map col
    sizes = 1 << tu4[:, cq]                          # [H/4, E]
    edge_on = (xs[None, :] % sizes) == 0
    if pred4 is None:                                # all-intra slice
        return edge_on, jnp.where(edge_on, 2, 0)
    ip = pred4[:, cq - 1] != 0
    iq = pred4[:, cq] != 0
    cbf = (cbf4[:, cq - 1] != 0) | (cbf4[:, cq] != 0)
    refdiff = ref4[:, cq - 1] != ref4[:, cq]
    mvdiff = ((jnp.abs(mv4x[:, cq - 1].astype(jnp.int32)
                       - mv4x[:, cq].astype(jnp.int32)) >= 4)
              | (jnp.abs(mv4y[:, cq - 1].astype(jnp.int32)
                         - mv4y[:, cq].astype(jnp.int32)) >= 4))
    bs = jnp.where(ip | iq, 2,
                   jnp.where(cbf | refdiff | mvdiff, 1, 0))
    return edge_on, jnp.where(edge_on, bs, 0)


@functools.partial(jax.jit, static_argnames=("qp", "qp_c", "bit_depth",
                                             "beta_off", "tc_off"))
def deblock_frame(y, cb, cr, tu4, qp: int, qp_c: int, bit_depth: int = 8,
                  beta_off: int = 0, tc_off: int = 0, pred4=None, cbf4=None,
                  ref4=None, mv4x=None, mv4y=None):
    """Deblock one frame. y [H,W], cb/cr [H/2,W/2], tu4 [H/4,W/4] leaf-TU
    log2 map. pred4/cbf4/ref4/mv4x/mv4y (all [H/4, W/4], MVs quarter-pel)
    drive BS derivation; all None = all-intra (BS=2 at TU edges)."""
    h, w = y.shape
    qb = min(max(qp + beta_off * 2, 0), 51)
    beta = int(BETA_TABLE[qb]) << (bit_depth - 8)
    # BS-dependent luma tc (DEFAULT_INTRA_TC_OFFSET = 2 per (bs-1))
    tc_bs = [int(TC_TABLE[min(max(qp + 2 * (bs - 1) + tc_off * 2, 0), 53)])
             << (bit_depth - 8) for bs in (1, 2)]
    qtc = min(max(qp_c + 2 + tc_off * 2, 0), 53)
    tc_c = int(TC_TABLE[qtc]) << (bit_depth - 8)

    tu4 = jnp.asarray(tu4, jnp.int32)
    maps = lambda m: None if m is None else jnp.asarray(m)
    pred4, cbf4 = maps(pred4), maps(cbf4)
    ref4, mv4x, mv4y = maps(ref4), maps(mv4x), maps(mv4y)

    def tc_of(bs):
        return jnp.where(bs == 2, tc_bs[1], jnp.where(bs == 1, tc_bs[0], 0))

    # ---- luma (vertical edges, then horizontal on the filtered output) ----
    ev, bs_v = _edge_bs_v(tu4, pred4, cbf4, ref4, mv4x, mv4y, w)
    y = _luma_edges(y, ev & (bs_v > 0), beta, tc_of(bs_v), bit_depth)
    t = lambda m: None if m is None else m.T
    eh, bs_h = _edge_bs_v(tu4.T, t(pred4), t(cbf4), t(ref4), t(mv4x),
                          t(mv4y), h)
    y = _luma_edges(y.T, eh & (bs_h > 0), beta, tc_of(bs_h), bit_depth).T

    # ---- chroma: only BS==2 edges on the 8-chroma (16-luma) grid ----
    if tc_c > 0:
        hc, wc = cb.shape
        if wc // 8 - 1 > 0:
            # luma edge j=2k+1 is the 16-grid edge; each 4-luma-row segment
            # decides 2 chroma rows (TComLoopFilter xEdgeFilterChroma
            # per-part granularity)
            evc = (bs_v[:, 1::2] == 2)[:, :wc // 8 - 1]
            cb = _chroma_edges(cb, evc, tc_c, bit_depth)
            cr = _chroma_edges(cr, evc, tc_c, bit_depth)
        if hc // 8 - 1 > 0:
            ehc = (bs_h[:, 1::2] == 2)[:, :hc // 8 - 1]
            cb = _chroma_edges(cb.T, ehc, tc_c, bit_depth).T
            cr = _chroma_edges(cr.T, ehc, tc_c, bit_depth).T
    return y, cb, cr
