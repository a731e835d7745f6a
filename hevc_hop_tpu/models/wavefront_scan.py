"""Whole-frame wavefront as a single on-device lax.scan program.

The step-per-dispatch wavefront (models/wavefront.py) pays one host->device
round trip per (wave, slot) — thousands per frame. Here the entire schedule
is baked into static tensors and the full sequential recon loop runs as ONE
compiled XLA program: lax.scan over steps, each step processing a padded
batch of blocks (gather chains -> predict -> T/Q/IQ/IT -> recon -> scatter)
for luma and both chroma planes.

Currently supports the uniform-CU-size schedule (the encoder default);
mixed-size quadtrees still use the step path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevc_hop_tpu.ops import intra, quant, transform
from hevc_hop_tpu.models import wavefront


@functools.lru_cache(maxsize=32)
def build_uniform_schedule(w: int, h: int, ctb_log2: int, cu_log2: int):
    """Static schedule tensors for a uniform-size CU grid.

    Returns dict of numpy arrays:
      pos   [S, B, 2]   block x,y (dummies -> (0, h) scratch row)
      avail [S, B, L]   luma chain availability
      availc[S, B, Lc]  chroma chain availability
      valid [S, B]      real block (not padding)
    """
    n = 1 << cu_log2
    depth8 = np.full((h // 8, w // 8), ctb_log2 - cu_log2, np.uint8)
    zplane = wavefront.zaddr4_plane(w, h, ctb_log2)
    leaves = wavefront.leaves_from_depth(depth8, w, h, ctb_log2)
    sched = wavefront.Schedule(leaves, w, h, ctb_log2, zplane)
    bmax = max(p.shape[0] for (_, p, _, _) in sched.steps)
    s = len(sched.steps)
    L, Lc = 4 * n + 1, 2 * n + 1
    pos = np.zeros((s, bmax, 2), np.int32)
    pos[:, :, 0] = 0
    pos[:, :, 1] = h  # scratch
    avail = np.zeros((s, bmax, L), bool)
    availc = np.zeros((s, bmax, Lc), bool)
    valid = np.zeros((s, bmax), bool)
    for i, (nn, p, al, ac) in enumerate(sched.steps):
        assert nn == n
        b = p.shape[0]
        pos[i, :b] = p
        avail[i, :b] = al
        availc[i, :b] = ac
        valid[i, :b] = True
    return dict(pos=pos, avail=avail, availc=availc, valid=valid, n=n,
                bmax=bmax, steps=s)


def _gather_chains(plane, pos, n, h):
    coords = jnp.asarray(
        wavefront.chain_coords(np.zeros((1, 2), np.int64), n))[0]
    cx = pos[:, 0:1] + coords[None, :, 0]
    cy = pos[:, 1:2] + coords[None, :, 1]
    w = plane.shape[1]
    return plane[jnp.clip(cy, 0, plane.shape[0] - 1),
                 jnp.clip(cx, 0, w - 1)]


def _block_idx(pos, n):
    b = pos.shape[0]
    rows = pos[:, 1:2, None] + jnp.arange(n)[None, :, None]
    cols = pos[:, 0:1, None].transpose(0, 2, 1) + jnp.arange(n)[None, None, :]
    return (jnp.broadcast_to(rows, (b, n, n)),
            jnp.broadcast_to(cols, (b, n, n)))


def _enc_plane(recon, coefp, orgp, pos, avail, forced, n, qp, c_idx,
               bit_depth, strong, h):
    log2 = n.bit_length() - 1
    chains = _gather_chains(recon, pos, n, h)
    chains = intra.substitute_refs(chains, avail, bit_depth)
    preds = intra.predict_all_modes(chains, n, c_idx, bit_depth, strong)
    rows, cols = _block_idx(pos, n)
    org = orgp[rows, cols]
    costs = intra.satd(org[:, None], preds)
    best = jnp.argmin(costs, axis=1).astype(jnp.int32)
    best = jnp.where(forced >= 0, forced, best)
    pred = jnp.take_along_axis(preds, best[:, None, None, None], axis=1)[:, 0]
    resi = org - pred
    use_dst = (n == 4 and c_idx == 0)
    coef = transform.fwd_transform(resi, bit_depth, use_dst)
    lev = quant.quant(coef, qp, log2, bit_depth, True)
    deq = quant.dequant(lev, qp, log2, bit_depth)
    rq = transform.inv_transform(deq, bit_depth, use_dst)
    rec = jnp.clip(pred + rq, 0, (1 << bit_depth) - 1)
    recon = recon.at[rows, cols].set(rec)
    coefp = coefp.at[rows, cols].set(lev)
    cbf = jnp.any(lev != 0, axis=(1, 2))
    return recon, coefp, best, cbf


@functools.partial(jax.jit, static_argnames=("n", "qp", "qp_c", "bit_depth",
                                             "strong", "h"))
def scan_encode(org_y, org_cb, org_cr, pos, avail, availc,
                n: int, qp: int, qp_c: int, bit_depth: int, strong: bool,
                h: int):
    """Single-program uniform-CU intra encode.

    org_*: padded planes ([h+pad, w] etc.). pos/avail/availc: schedule.
    Returns recon planes, coef planes, modes [S,B], cbf_y/cb/cr [S,B].
    """
    ry = jnp.zeros_like(org_y)
    rcb = jnp.zeros_like(org_cb)
    rcr = jnp.zeros_like(org_cr)
    cy_ = jnp.zeros_like(org_y)
    ccb = jnp.zeros_like(org_cb)
    ccr = jnp.zeros_like(org_cr)

    def step(carry, xs):
        ry, rcb, rcr, cy_, ccb, ccr = carry
        p, al, ac = xs
        forced = jnp.full((p.shape[0],), -1, jnp.int32)
        ry, cy_, best, cbf = _enc_plane(ry, cy_, org_y, p, al, forced,
                                        n, qp, 0, bit_depth, strong, h)
        pc = p // 2
        pc = pc.at[:, 1].set(jnp.where(p[:, 1] >= h, h // 2, pc[:, 1]))
        rcb, ccb, _, cbf_b = _enc_plane(rcb, ccb, org_cb, pc, ac, best,
                                        n // 2, qp_c, 1, bit_depth, strong,
                                        h // 2)
        rcr, ccr, _, cbf_r = _enc_plane(rcr, ccr, org_cr, pc, ac, best,
                                        n // 2, qp_c, 2, bit_depth, strong,
                                        h // 2)
        return (ry, rcb, rcr, cy_, ccb, ccr), (best, cbf, cbf_b, cbf_r)

    carry, outs = jax.lax.scan(step, (ry, rcb, rcr, cy_, ccb, ccr),
                               (pos, avail, availc))
    ry, rcb, rcr, cy_, ccb, ccr = carry
    modes, cbf_y, cbf_cb, cbf_cr = outs
    return ry, rcb, rcr, cy_, ccb, ccr, modes, cbf_y, cbf_cb, cbf_cr


@functools.partial(jax.jit, static_argnames=("n", "bit_depth", "strong", "h"))
def scan_decode(resi_y, resi_cb, resi_cr, pos, avail, availc, modes, cmodes,
                n: int, bit_depth: int, strong: bool, h: int):
    """Single-program uniform-CU intra decode (prediction + dense residual)."""
    ry = jnp.zeros_like(resi_y)
    rcb = jnp.zeros_like(resi_cb)
    rcr = jnp.zeros_like(resi_cr)

    def dec_plane(recon, resip, p, al, m, nn, c_idx, hh):
        chains = _gather_chains(recon, p, nn, hh)
        chains = intra.substitute_refs(chains, al, bit_depth)
        preds = intra.predict_all_modes(chains, nn, c_idx, bit_depth, strong)
        pred = jnp.take_along_axis(preds, m[:, None, None, None],
                                   axis=1)[:, 0]
        rows, cols = _block_idx(p, nn)
        rec = jnp.clip(pred + resip[rows, cols], 0, (1 << bit_depth) - 1)
        return recon.at[rows, cols].set(rec)

    def step(carry, xs):
        ry, rcb, rcr = carry
        p, al, ac, m, cm = xs
        ry = dec_plane(ry, resi_y, p, al, m, n, 0, h)
        pc = p // 2
        pc = pc.at[:, 1].set(jnp.where(p[:, 1] >= h, h // 2, pc[:, 1]))
        rcb = dec_plane(rcb, resi_cb, pc, ac, cm, n // 2, 1, h // 2)
        rcr = dec_plane(rcr, resi_cr, pc, ac, cm, n // 2, 2, h // 2)
        return (ry, rcb, rcr), None

    (ry, rcb, rcr), _ = jax.lax.scan(step, (ry, rcb, rcr),
                                     (pos, avail, availc, modes, cmodes))
    return ry, rcb, rcr
