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
    mode = jnp.argmin(satd, axis=1).astype(jnp.int32)
    pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                               axis=1)[:, 0]
    resi = blocks - pred
    coef = t_ops.fwd_transform(resi, bit_depth, use_dst=False)
    lev = q_ops.quant(coef, qp, log2, bit_depth, True)
    deq = q_ops.dequant(lev, qp, log2, bit_depth)
    rq = t_ops.inv_transform(deq, bit_depth, use_dst=False)
    err = (resi - rq).astype(jnp.float32)
    dist = jnp.sum(err * err, axis=(1, 2))
    # rate proxy: per-nonzero cost ~ 3 + 2*log2(|level|), + per-TU overhead
    a = jnp.abs(lev).astype(jnp.float32)
    bits = jnp.sum(jnp.where(a > 0, 3.0 + 2.0 * jnp.log2(a + 1.0), 0.0),
                   axis=(1, 2))
    nz_any = jnp.any(lev != 0, axis=(1, 2))
    bits = bits + jnp.where(nz_any, 10.0, 1.0)  # last-pos/CG vs cbf=0
    lam = full_lambda(qp)
    cost = dist + lam * bits
    return cost.reshape(by, bx), mode.reshape(by, bx)


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
