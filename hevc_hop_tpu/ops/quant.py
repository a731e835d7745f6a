"""Scalar quantization / dequantization, batched and jittable.

Replaces TComTrQuant::xQuant / xDeQuant (TComTrQuant.cpp:993-1180) scalar
loops with whole-batch int32 tensor math. Dequant is normative (H.265 8.6.3,
flat scaling list m=16); forward quant follows HM's Q = (|c|*scale + off)>>qbits
dead-zone quantizer so coefficients match the reference encoder.

RDOQ (xRateDistOptQuant) is a separate, later op; this module is the plain
quantizer used by both and by the decoder-side dequant.
"""
from __future__ import annotations

import jax.numpy as jnp

from hevc_hop_tpu.common import rom
from hevc_hop_tpu.common.types import COEF_MIN, COEF_MAX


def quant(coef: jnp.ndarray, qp: int, log2_size: int, bit_depth: int = 8,
          is_intra_slice: bool = True) -> jnp.ndarray:
    """HM dead-zone quantizer. coef [..., N, N] int32 -> levels int32.

    qbits = QUANT_SHIFT + qp/6 + transformShift, offset 171/85 << (qbits-9)
    (intra/inter), exactly TComTrQuant.cpp:1040-1075.
    """
    per, rem = qp // 6, qp % 6
    tr_shift = rom.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = rom.QUANT_SHIFT + per + tr_shift
    scale = int(rom.QUANT_SCALES[rem])
    offset = (171 if is_intra_slice else 85) << (qbits - 9)
    sign = jnp.sign(coef)
    level = (jnp.abs(coef) * scale + offset) >> qbits
    return jnp.clip(sign * level, COEF_MIN, COEF_MAX)


def dequant(level: jnp.ndarray, qp: int, log2_size: int,
            bit_depth: int = 8) -> jnp.ndarray:
    """Normative dequant, flat scaling (H.265 8.6.3 with m[x][y]=16).

    d = Clip3(-32768, 32767,
              ((level * 16 * levelScale[qp%6] << (qp/6)) + (1 << (bd-1))) >> bd)
    with bd = bitDepth + log2(nTbS) - 5.
    """
    per, rem = qp // 6, qp % 6
    bd_shift = bit_depth + log2_size - 5
    scale = (int(rom.INV_QUANT_SCALES[rem]) * 16) << per
    d = (level * scale + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, COEF_MIN, COEF_MAX)
