"""GT (geometric transform / HOP) warp prediction ops.

Capability ref: TComPrediction.cpp:723-960 — xPredGTLuma fetches a 2Wx2H
reference window centered on the SS vector target, derives a 3x3 homography
from 4 corner offset vectors (calcParamProjective:807 / calcParamBilinear:862)
and inverse-maps every pixel of the central WxH block with bilinear
interpolation (ProjectiveTransform:904), clamped to the NSS window.

TPU-native formulation: corner-candidate sets are batched — params are
computed in closed form for B candidates at once and a single gather+lerp
evaluates all warped blocks. The affine restriction (IT_GT_AFFINE,
TypeDef.h:212: h[2]=h[5]=0 so only 3 corner vectors are coded) is a mask.

Arithmetic is float32 (the reference uses float64; the warp is
encoder/decoder-symmetric within this codec — see SURVEY.md §7.3.2 on the
reference's own cross-platform reproducibility caveat).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GRID = 2  # IT_GT_GRID_SIZE (TypeDef.h:228): corner grid is 2x block size


def calc_param_projective(cx: jnp.ndarray, cy: jnp.ndarray,
                          gw: int, gh: int) -> jnp.ndarray:
    """Homography params from 4 corner points (batched).

    cx, cy: [..., 4] corner coordinates on the (gw x gh) grid in the order
    top-left, top-right, bottom-right, bottom-left (ref corner order
    0,1,2,3 = TL, TR, BR, BL per xPredGTLuma corner setup).
    Returns h [..., 9] float32 (layout as the reference: Fx uses h0,h3,h6;
    Fy uses h1,h4,h7; denominator h2,h5,h8).
    """
    w = jnp.float32(gw - 1)
    h_ = jnp.float32(gh - 1)
    cx = cx.astype(jnp.float32)
    cy = cy.astype(jnp.float32)
    dx1 = cx[..., 1] - cx[..., 2]
    dx2 = cx[..., 3] - cx[..., 2]
    dx3 = cx[..., 0] - cx[..., 1] + cx[..., 2] - cx[..., 3]
    dy1 = cy[..., 1] - cy[..., 2]
    dy2 = cy[..., 3] - cy[..., 2]
    dy3 = cy[..., 0] - cy[..., 1] + cy[..., 2] - cy[..., 3]
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(den == 0, 1e-9, den)
    h2 = ((dx3 * dy2 - dx2 * dy3) / den) / w
    h5 = ((dx1 * dy3 - dx3 * dy1) / den) / h_
    h0 = (cx[..., 1] - cx[..., 0]) / w + h2 * cx[..., 1]
    h3 = (cx[..., 3] - cx[..., 0]) / h_ + h5 * cx[..., 3]
    h6 = cx[..., 0]
    h1 = (cy[..., 1] - cy[..., 0]) / w + h2 * cy[..., 1]
    h4 = (cy[..., 3] - cy[..., 0]) / h_ + h5 * cy[..., 3]
    h7 = cy[..., 0]
    h8 = jnp.ones_like(h0)
    return jnp.stack([h0, h1, h2, h3, h4, h5, h6, h7, h8], axis=-1)


def corners_from_offsets(gt: jnp.ndarray, n: int) -> tuple:
    """Corner grid coordinates from 4 offset vectors.

    gt: [..., 4, 2] integer corner offset vectors (hor, ver), step 1.
    Block size n; grid is GRID*n. Ref xPredGTLuma corner setup
    (TComPrediction.cpp:758-764). Returns (cx [...,4], cy [...,4]).
    """
    g = GRID * n
    base_x = jnp.asarray([0, g - 1, g - 1, 0], jnp.int32)
    base_y = jnp.asarray([0, 0, g - 1, g - 1], jnp.int32)
    return (gt[..., 0] + base_x, gt[..., 1] + base_y)


def is_affine(h: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """IT_GT_AFFINE acceptance mask (TEncSearch.cpp:4905-4908)."""
    return (jnp.abs(h[..., 2]) <= eps) & (jnp.abs(h[..., 5]) <= eps)


@functools.partial(jax.jit, static_argnames=("n", "bit_depth"))
def warp_blocks(windows: jnp.ndarray, h: jnp.ndarray, n: int,
                bit_depth: int = 8) -> jnp.ndarray:
    """Apply batched GT warps.

    windows: [B, 2n+W2, 2n+W2]?? — reference window of (2n x GRID) grid plus
    the NSS clamp margin. Layout: windows[b] covers grid coordinates
    [-nss .. g + nss) in both axes where g = GRID*n and nss = n (the NSS
    window = min(w,h)/2 * GRID = n*... ref: iNSSWindow = (n>>1)*GRID = n).
    So windows must be [B, g + 2*nss, g + 2*nss] = [B, 4n, 4n]... see
    make_window_slices. h: [B, 9]. Returns [B, n, n] int32 predictions.
    """
    b = windows.shape[0]
    g = GRID * n
    nss = n  # (min(w,h)>>1) * GRID with square blocks
    off = g // 2 - (g // GRID) // 2  # = n/2 offset into the grid
    xs = jnp.arange(off, off + n, dtype=jnp.float32)
    ys = jnp.arange(off, off + n, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    xg = xg[None]  # [1, n, n] x coordinate
    yg = yg[None]

    h0 = h[:, 0, None, None]
    h1 = h[:, 1, None, None]
    h2 = h[:, 2, None, None]
    h3 = h[:, 3, None, None]
    h4 = h[:, 4, None, None]
    h5 = h[:, 5, None, None]
    h6 = h[:, 6, None, None]
    h7 = h[:, 7, None, None]
    h8 = h[:, 8, None, None]
    den = h2 * xg + h5 * yg + h8
    fx = (h0 * xg + h3 * yg + h6) / den
    fy = (h1 * xg + h4 * yg + h7) / den

    # truncate toward zero (C cast). The reference computes in float64
    # where Fx/Fy/p/q are rationals with spacing >= 1/(2n-1); our float32
    # error (~1e-5) is snapped away so truncation boundaries match:
    # bias |Fx| upward by eps before the toward-zero cast, and zero-snap
    # fractional parts smaller than eps.
    eps = jnp.float32(1e-3)

    def trunc_tz(v):  # toward-zero truncation with magnitude bias
        a = jnp.trunc(jnp.abs(v) + eps)
        return (jnp.sign(v) * a).astype(jnp.int32)

    xi = trunc_tz(fx) - off
    yi = trunc_tz(fy) - off
    p = fx - off - xi.astype(jnp.float32)
    q = fy - off - yi.astype(jnp.float32)
    p = jnp.where(jnp.abs(p) < eps, 0.0, p)
    q = jnp.where(jnp.abs(q) < eps, 0.0, q)
    lim = nss // GRID + n - 1
    xi = jnp.clip(xi, -(nss // GRID), lim - 1)
    yi = jnp.clip(yi, -(nss // GRID), lim - 1)

    # window sample (X, Y) lives at windows[:, Y + margin, X + margin]:
    # the [B, 2n, 2n] window spans X in [-n/2, 3n/2) with the SS-target
    # block at its center, so margin = n/2
    margin = nss // GRID
    bi = jnp.arange(b)[:, None, None]
    a00 = windows[bi, yi + margin, xi + margin].astype(jnp.float32)
    a01 = windows[bi, yi + margin, xi + 1 + margin].astype(jnp.float32)
    a10 = windows[bi, yi + 1 + margin, xi + margin].astype(jnp.float32)
    a11 = windows[bi, yi + 1 + margin, xi + 1 + margin].astype(jnp.float32)
    aux = ((1.0 - q) * ((1.0 - p) * a00 + p * a01)
           + q * ((1.0 - p) * a10 + p * a11))
    aux = jnp.clip(aux, 0.0, float((1 << bit_depth) - 1))
    # round half-up as the reference ((Pel)(aux + 0.5)), with a
    # sub-spacing bias (true aux values are rationals with spacing
    # >= 1/(2n-1)^2 ~ 2.5e-4; f32 error ~1e-5)
    return jnp.trunc(aux + jnp.float32(0.5 + 1e-4)).astype(jnp.int32)
