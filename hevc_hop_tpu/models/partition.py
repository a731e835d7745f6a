"""CU quadtree partition + mode decision as dense tensor DP.

Replaces the reference's recursive RD tournament (TEncCu.cpp:371
xCompressCU: encode at depth d, recurse, compare) with the batched
formulation from SURVEY.md §7.1: all 35 SATD costs for every block of every
CU size are computed at once from original-pixel references, then the
quadtree choice is a bottom-up min-reduction over the cost tensors
(TU = CU, so per-size costs capture the prediction-distance effect of
larger blocks; rate terms are the HM lambda model, TEncSlice.cpp:338-430:
lambda = 0.57 * 2^((qp-12)/3), pred domain sqrt(lambda)).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from hevc_hop_tpu.ops import intra


MODE_BITS = 6.0    # approx: prev_intra_flag + 5-bit rem (MPM ignored here)
SPLIT_BITS = 2.0
CBF_BITS_PER_TU = 3.0  # cbf_y/cb/cr flags per extra TU after a split


def rmd_lambda(qp: int) -> float:
    return math.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0))


@functools.partial(jax.jit, static_argnames=("n", "bit_depth"))
def block_costs(y: jnp.ndarray, n: int, bit_depth: int = 8) -> jnp.ndarray:
    """[by, bx, 35] SATD of every intra mode for every nxn block, refs from
    original pixels (mode pre-decision; recon refs are used in the coding
    wavefront)."""
    h, w = y.shape
    mid = 1 << (bit_depth - 1)
    ext = jnp.full((h + 1, w + 1), mid, jnp.int32)
    ext = ext.at[1:, 1:].set(y.astype(jnp.int32))
    by, bx = h // n, w // n
    ys = (jnp.arange(by) * n)[:, None].repeat(bx, 1).reshape(-1) + 1
    xs = (jnp.arange(bx) * n)[None, :].repeat(by, 0).reshape(-1) + 1
    i = jnp.arange(2 * n)
    cyl = jnp.minimum(ys[:, None] + 2 * n - 1 - i[None], h)
    cxl = (xs - 1)[:, None].repeat(2 * n, 1)
    cy = jnp.concatenate([cyl, (ys - 1)[:, None],
                          (ys - 1)[:, None].repeat(2 * n, 1)], 1)
    cx = jnp.concatenate([cxl, (xs - 1)[:, None],
                          jnp.minimum(xs[:, None] + i[None], w)], 1)
    chains = ext[cy, cx]
    preds = intra.predict_all_modes(chains, n, 0, bit_depth, False)
    blocks = y.astype(jnp.int32).reshape(by, n, bx, n).transpose(
        0, 2, 1, 3).reshape(-1, n, n)
    return intra.satd(blocks[:, None], preds).reshape(by, bx, 35)


def full_lambda(qp: int) -> float:
    return 0.57 * 2.0 ** ((qp - 12) / 3.0)


@functools.partial(jax.jit, static_argnames=("n", "qp", "bit_depth"))
def rd_costs(y: jnp.ndarray, n: int, qp: int,
             bit_depth: int = 8):
    """True-RD cost per nxn block (TU = CU candidate): SATD-best mode,
    then actual transform/quant -> distortion (SSE after recon) + rate
    proxy from the quantized levels. Returns (cost [by,bx] float32,
    mode [by,bx] int32).

    This is the batched replacement for the reference's per-CU RD
    tournament residual step (TEncSearch.cpp:6622 encodeResAndCalcRdInterCU
    analog for intra): every candidate CU of a size is coded at once.
    """
    from hevc_hop_tpu.ops import quant as q_ops
    from hevc_hop_tpu.ops import transform as t_ops
    h, w = y.shape
    log2 = n.bit_length() - 1
    mid = 1 << (bit_depth - 1)
    ext = jnp.full((h + 1, w + 1), mid, jnp.int32)
    ext = ext.at[1:, 1:].set(y.astype(jnp.int32))
    by, bx = h // n, w // n
    ys = (jnp.arange(by) * n)[:, None].repeat(bx, 1).reshape(-1) + 1
    xs = (jnp.arange(bx) * n)[None, :].repeat(by, 0).reshape(-1) + 1
    i = jnp.arange(2 * n)
    cyl = jnp.minimum(ys[:, None] + 2 * n - 1 - i[None], h)
    cxl = (xs - 1)[:, None].repeat(2 * n, 1)
    cy = jnp.concatenate([cyl, (ys - 1)[:, None],
                          (ys - 1)[:, None].repeat(2 * n, 1)], 1)
    cx = jnp.concatenate([cxl, (xs - 1)[:, None],
                          jnp.minimum(xs[:, None] + i[None], w)], 1)
    chains = ext[cy, cx]
    preds = intra.predict_all_modes(chains, n, 0, bit_depth, False)
    blocks = y.astype(jnp.int32).reshape(by, n, bx, n).transpose(
        0, 2, 1, 3).reshape(-1, n, n)
    satd = intra.satd(blocks[:, None], preds)
    # full transform RD over the top-K SATD modes (the reference's RMD
    # shortlist -> full-RD tournament, TEncSearch.cpp:2389 estIntraPredQT
    # with g_aucIntraModeNumFast), not just the SATD argmin
    k = 3
    _, cand = jax.lax.top_k(-satd, k)                 # [B, K] mode ids
    cpred = jnp.take_along_axis(
        preds, cand[:, :, None, None], axis=1)        # [B, K, n, n]
    resi = blocks[:, None] - cpred
    use_dst = n == 4      # 4x4 intra luma codes through the DST
    rf = resi.reshape(-1, n, n)
    coef = t_ops.fwd_transform(rf, bit_depth, use_dst=use_dst)
    lev = q_ops.quant(coef, qp, log2, bit_depth, True)
    deq = q_ops.dequant(lev, qp, log2, bit_depth)
    rq = t_ops.inv_transform(deq, bit_depth, use_dst=use_dst)
    err = (rf - rq).astype(jnp.float32)
    dist = jnp.sum(err * err, axis=(1, 2))
    # rate proxy: per-nonzero cost ~ 3 + 2*log2(|level|), + per-TU overhead
    a = jnp.abs(lev).astype(jnp.float32)
    bits = jnp.sum(jnp.where(a > 0, 3.0 + 2.0 * jnp.log2(a + 1.0), 0.0),
                   axis=(1, 2))
    nz_any = jnp.any(lev != 0, axis=(1, 2))
    bits = bits + jnp.where(nz_any, 10.0, 1.0)  # last-pos/CG vs cbf=0
    lam = full_lambda(qp)
    costk = (dist + lam * bits).reshape(-1, k)
    ki = jnp.argmin(costk, axis=1)
    cost = jnp.take_along_axis(costk, ki[:, None], 1)[:, 0]
    mode = jnp.take_along_axis(cand, ki[:, None], 1)[:, 0].astype(jnp.int32)
    return cost.reshape(by, bx), mode.reshape(by, bx)


@functools.partial(jax.jit, static_argnames=("n", "qp", "bit_depth"))
def rd_costs_forced(y: jnp.ndarray, modes: jnp.ndarray, n: int, qp: int,
                    bit_depth: int = 8):
    """RD cost per nxn block COERCED to a given intra mode ([by,bx] int32)
    — the sub-TU arm of the residual-quadtree decision (xEstimateResidualQT,
    TEncSearch.cpp:6824: the CU keeps ONE prediction mode, the transform
    splits). Returns cost [by,bx] float32."""
    from hevc_hop_tpu.ops import quant as q_ops
    from hevc_hop_tpu.ops import transform as t_ops
    h, w = y.shape
    log2 = n.bit_length() - 1
    mid = 1 << (bit_depth - 1)
    ext = jnp.full((h + 1, w + 1), mid, jnp.int32)
    ext = ext.at[1:, 1:].set(y.astype(jnp.int32))
    by, bx = h // n, w // n
    ys = (jnp.arange(by) * n)[:, None].repeat(bx, 1).reshape(-1) + 1
    xs = (jnp.arange(bx) * n)[None, :].repeat(by, 0).reshape(-1) + 1
    i = jnp.arange(2 * n)
    cyl = jnp.minimum(ys[:, None] + 2 * n - 1 - i[None], h)
    cxl = (xs - 1)[:, None].repeat(2 * n, 1)
    cy = jnp.concatenate([cyl, (ys - 1)[:, None],
                          (ys - 1)[:, None].repeat(2 * n, 1)], 1)
    cx = jnp.concatenate([cxl, (xs - 1)[:, None],
                          jnp.minimum(xs[:, None] + i[None], w)], 1)
    chains = ext[cy, cx]
    pred = intra.predict_mode(chains, modes.reshape(-1), n, 0, bit_depth,
                              False)
    blocks = y.astype(jnp.int32).reshape(by, n, bx, n).transpose(
        0, 2, 1, 3).reshape(-1, n, n)
    resi = blocks - pred
    use_dst = n == 4
    coef = t_ops.fwd_transform(resi, bit_depth, use_dst=use_dst)
    lev = q_ops.quant(coef, qp, log2, bit_depth, True)
    deq = q_ops.dequant(lev, qp, log2, bit_depth)
    rq = t_ops.inv_transform(deq, bit_depth, use_dst=use_dst)
    err = (resi - rq).astype(jnp.float32)
    dist = jnp.sum(err * err, axis=(1, 2))
    a = jnp.abs(lev).astype(jnp.float32)
    bits = jnp.sum(jnp.where(a > 0, 3.0 + 2.0 * jnp.log2(a + 1.0), 0.0),
                   axis=(1, 2))
    nz_any = jnp.any(lev != 0, axis=(1, 2))
    bits = bits + jnp.where(nz_any, 10.0, 1.0)
    lam = full_lambda(qp)
    return (dist + lam * bits).reshape(by, bx)


def _sum4(a: jnp.ndarray) -> jnp.ndarray:
    return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).sum(axis=(1, 3))


def _up2(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)


@functools.partial(jax.jit, static_argnames=("qp", "ctb_log2"))
def decide(rd8, rd16, rd32, m8, m16, m32, qp: int, ctb_log2: int = 5):
    """Bottom-up DP over the quadtree with per-size RD cost tensors
    (rd* [by,bx] float, m* [by,bx] int32 best mode per candidate CU).
    Returns (depth8 [by8,bx8] int32, mode8 [by8,bx8] int32)."""
    lam = full_lambda(qp)
    mode_cost = lam * MODE_BITS
    split_cost = lam * SPLIT_BITS

    best8 = rd8 + mode_cost
    cu16 = rd16 + mode_cost
    split16 = _sum4(best8) + split_cost
    take16 = cu16 <= split16
    lvl16 = jnp.where(take16, cu16, split16)

    cu32 = rd32 + mode_cost
    split32 = _sum4(lvl16) + split_cost
    take32 = cu32 <= split32

    mode8 = jnp.where(_up2(take16), _up2(m16), m8)
    depth8 = jnp.where(_up2(take16), 1, 2)
    mode8 = jnp.where(_up2(_up2(take32)), _up2(_up2(m32)), mode8)
    depth8 = jnp.where(_up2(_up2(take32)), 0, depth8)
    return depth8.astype(jnp.int32), mode8.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("qp", "ctb_log2"))
def decide_nxn(rd4, rd8, rd16, rd32, m4, m8, m16, m32, qp: int,
               ctb_log2: int = 5):
    """DP as decide(), extended one level down: an 8x8 CU may code as NxN
    (four 4x4 PUs with their own modes + forced 4x4 TUs,
    TEncCu.cpp:1455 SIZE_NxN arm / TEncSearch intra_split).
    Returns (depth8 [by8,bx8] int32 with 3 = NxN, mode4 [by4,bx4] int32)."""
    lam = full_lambda(qp)
    mode_cost = lam * MODE_BITS
    split_cost = lam * SPLIT_BITS

    cu8 = rd8 + mode_cost
    # NxN: 4 modes + part_mode bin + 3 extra luma-cbf bins
    nxn8 = _sum4(rd4) + 4.0 * mode_cost + lam * 4.0
    take_nxn = nxn8 < cu8
    best8 = jnp.minimum(cu8, nxn8)

    cu16 = rd16 + mode_cost
    split16 = _sum4(best8) + split_cost
    take16 = cu16 <= split16
    lvl16 = jnp.where(take16, cu16, split16)

    cu32 = rd32 + mode_cost
    split32 = _sum4(lvl16) + split_cost
    take32 = cu32 <= split32

    depth8 = jnp.where(take_nxn, 3, 2)
    mode4 = jnp.where(_up2(take_nxn), m4, _up2(m8))
    depth8 = jnp.where(_up2(take16), 1, depth8)
    mode4 = jnp.where(_up2(_up2(take16)), _up2(_up2(m16)), mode4)
    depth8 = jnp.where(_up2(_up2(take32)), 0, depth8)
    mode4 = jnp.where(_up2(_up2(_up2(take32))), _up2(_up2(_up2(m32))),
                      mode4)
    return depth8.astype(jnp.int32), mode4.astype(jnp.int32)


TUSPLIT_BITS = 4.0   # split_transform_flag + 3 extra cbf bins


@functools.partial(jax.jit, static_argnames=("qp", "ctb_log2"))
def decide_rqt(rd4, rd8, rd16, rd32, rd8f16, rd16f32,
               m4, m8, m16, m32, qp: int, ctb_log2: int = 5):
    """decide_nxn() extended with the residual-quadtree arm: a 16x16 or
    32x32 CU may keep ONE prediction mode but split its transform into
    four half-size TUs (rd8f16/rd16f32 = forced-parent-mode sub-TU costs,
    xEstimateResidualQT analog). Returns (depth8 int32 (3 = NxN),
    mode4 [by4,bx4] int32, tulog8 [by8,bx8] int32 TU log2 per cell)."""
    lam = full_lambda(qp)
    mode_cost = lam * MODE_BITS
    split_cost = lam * SPLIT_BITS
    tu_cost = lam * TUSPLIT_BITS

    cu8 = rd8 + mode_cost
    nxn8 = _sum4(rd4) + 4.0 * mode_cost + lam * 4.0
    take_nxn = nxn8 < cu8
    best8 = jnp.minimum(cu8, nxn8)

    cu16 = rd16 + mode_cost
    cu16t = _sum4(rd8f16) + mode_cost + tu_cost
    take16t = cu16t < cu16
    bcu16 = jnp.minimum(cu16, cu16t)
    split16 = _sum4(best8) + split_cost
    take16 = bcu16 <= split16
    lvl16 = jnp.where(take16, bcu16, split16)

    cu32 = rd32 + mode_cost
    cu32t = _sum4(rd16f32) + mode_cost + tu_cost
    take32t = cu32t < cu32
    bcu32 = jnp.minimum(cu32, cu32t)
    split32 = _sum4(lvl16) + split_cost
    take32 = bcu32 <= split32

    depth8 = jnp.where(take_nxn, 3, 2)
    tulog8 = jnp.where(take_nxn, 2, 3)
    mode4 = jnp.where(_up2(take_nxn), m4, _up2(m8))
    depth8 = jnp.where(_up2(take16), 1, depth8)
    tulog8 = jnp.where(_up2(take16), jnp.where(_up2(take16t), 3, 4),
                       tulog8)
    mode4 = jnp.where(_up2(_up2(take16)), _up2(_up2(m16)), mode4)
    t32u = _up2(_up2(take32))
    depth8 = jnp.where(t32u, 0, depth8)
    tulog8 = jnp.where(t32u, jnp.where(_up2(_up2(take32t)), 4, 5), tulog8)
    mode4 = jnp.where(_up2(_up2(_up2(take32))), _up2(_up2(_up2(m32))),
                      mode4)
    return (depth8.astype(jnp.int32), mode4.astype(jnp.int32),
            tulog8.astype(jnp.int32))
