"""Self-similarity (SS) search: masked full-search over the causal area.

Capability ref: TEncSearch.cpp:6262 xPatternSearch with the SS overloads —
causal range clamp (xSetSearchRange:6224), validity filtering via
NOT_VALID-poisoned reference samples (isValidPattern, TComRdCost.h:430-475)
and candidate ring buffer. The reference scans candidates serially per PU.

TPU-native formulation: the SAD/SSE cost over all (2R+1)^2 displacements of
a block is one batched correlation — SSE(d) = sum(org^2) + sum(ref_d^2)
- 2*corr(org, ref_d), where corr is a grouped convolution on the MXU and
the windowed ref energy is a ones-kernel convolution. Causality does not
need sentinel poisoning: a per-size sliding-max z-address plane gives the
exact "target window fully z-earlier" mask (H.265-order decodable, same
rule the reference's poisoning enforces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def zmax_plane_px(zaddr4: np.ndarray, n: int) -> np.ndarray:
    """Max z-address over every nxn window at FULL-PEL granularity.

    zaddr4: [H/4, W/4] int64. Window top-left (y, x) in pixels covers
    units [y//4 .. (y+n-1)//4]. Returns [H - n + 1, W - n + 1] int64.
    """
    h4, w4 = zaddr4.shape
    # upsample to pixels, then two separable sliding maxima of width n
    zp = np.repeat(np.repeat(zaddr4, 4, 0), 4, 1)
    from numpy.lib.stride_tricks import sliding_window_view
    zr = sliding_window_view(zp, n, axis=1).max(-1)
    return sliding_window_view(zr, n, axis=0).max(-1)


@functools.partial(jax.jit, static_argnames=("n", "radius"))
def ss_cost_map(windows: jnp.ndarray, org: jnp.ndarray, n: int,
                radius: int) -> jnp.ndarray:
    """SSE of every displacement in [-radius, radius]^2.

    windows: [B, n + 2*radius, n + 2*radius] int32 — recon samples around
    each block (top-left of window = block pos - radius; out-of-frame
    samples arbitrary, masked by the caller).
    org: [B, n, n] int32.
    Returns [B, 2*radius+1, 2*radius+1] int32 SSE per displacement
    (dy, dx), index [r + dy, r + dx].
    """
    w = windows.astype(jnp.float32)
    o = org.astype(jnp.float32)
    # correlation via batched conv: vmap a single-channel valid conv
    def corr1(win, ker):
        return jax.lax.conv_general_dilated(
            win[None, None], ker[None, None], (1, 1), "VALID",
            preferred_element_type=jnp.float32)[0, 0]

    corr = jax.vmap(corr1)(w, o)                      # [B, 2r+1, 2r+1]
    ones = jnp.ones((n, n), jnp.float32)
    ref2 = jax.lax.conv_general_dilated(
        (w * w)[:, None], ones[None, None], (1, 1), "VALID",
        preferred_element_type=jnp.float32)[:, 0]
    org2 = jnp.sum(o * o, axis=(1, 2))[:, None, None]
    sse = org2 + ref2 - 2.0 * corr
    return sse.astype(jnp.int32)


def ss_valid_mask(pos: np.ndarray, zcur: np.ndarray, zmax_px: np.ndarray,
                  n: int, radius: int, w: int, h: int) -> np.ndarray:
    """Causal validity of every displacement for each block (host-side,
    static per frame structure).

    pos: [B, 2] block positions; zcur: [B] z-address of each block;
    zmax_px: zmax_plane_px(zaddr4, n). Returns [B, 2r+1, 2r+1] bool.
    """
    b = pos.shape[0]
    d = np.arange(-radius, radius + 1)
    ty = pos[:, 1, None, None] + d[None, :, None]     # [B, 2r+1, 1]
    tx = pos[:, 0, None, None] + d[None, None, :]     # [B, 1, 2r+1]
    ty = np.broadcast_to(ty, (b, d.size, d.size))
    tx = np.broadcast_to(tx, (b, d.size, d.size))
    inb = (ty >= 0) & (tx >= 0) & (ty + n <= h) & (tx + n <= w)
    tyc = np.clip(ty, 0, h - n)
    txc = np.clip(tx, 0, w - n)
    zm = zmax_px[tyc, txc]
    return inb & (zm < zcur[:, None, None])
