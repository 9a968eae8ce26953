"""Quantization / dequantization, batched, bit-exact (common/quant.c:33-178).

All functions take coefficient arrays with arbitrary leading batch dims and
per-call mf/bias/dequant tables (host-derived in tables.QuantTables, passed
in as arrays so a single jitted encoder supports any QP via gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32


def quant(coef, mf, bias):
    """Deadzone quantization (QUANT_ONE, common/quant.c:33):
    level = sign(c) * ((bias + |c|) * mf >> 16).

    coef: (..., N) int32; mf/bias broadcastable to coef.
    """
    coef = coef.astype(I32)
    mf = mf.astype(I32)
    bias = bias.astype(I32)
    mag = ((bias + jnp.abs(coef)) * mf) >> 16
    return jnp.where(coef >= 0, mag, -mag)


def dequant(level, dmf, qp_div6, shift_base):
    """Dequantization (dequant_4x4 / dequant_8x8, common/quant.c:76-146).

    level: (..., N) int32 quantized coefficients.
    dmf:   dequant multipliers for qp%6 already gathered, broadcastable.
    qp_div6: scalar or broadcastable int (qp // 6).
    shift_base: 4 for the 4x4 transform, 6 for 8x8 — i_qbits = qp/6 - base.

    Works for traced qp: both shift directions are computed and selected.
    """
    level = level.astype(I32)
    dmf = dmf.astype(I32)
    qbits = qp_div6 - shift_base
    prod = level * dmf
    # left-shift branch (qbits >= 0)
    lhs = prod << jnp.maximum(qbits, 0)
    # right-shift branch with rounding (qbits < 0)
    neg = jnp.maximum(-qbits, 0)
    f = jnp.where(qbits < 0, 1 << jnp.maximum(neg - 1, 0), 0)
    rhs = (prod + f) >> neg
    return jnp.where(qbits >= 0, lhs, rhs)


def quant_dc(coef, mf0, bias0):
    """DC quantization: quant_4x4_dc / quant_2x2_dc (common/quant.c:58-74).
    Callers pass mf0 = quant_mf[qp][0] >> 1 and bias0 = bias[qp][0] << 1,
    as at encoder/macroblock.c:282-283,363."""
    return quant(coef, mf0, bias0)


def dequant_4x4_dc(level, dmf0, qp_div6):
    """dequant_4x4_dc (common/quant.c:148): applied after the inverse DC
    Hadamard; i_qbits = qp/6 - 6, single multiplier dmf0 = dequant_mf[qp%6][0]."""
    level = level.astype(I32)
    dmf0 = dmf0.astype(I32)
    qbits = qp_div6 - 6
    lhs = (level * (dmf0 << jnp.maximum(qbits, 0)))
    neg = jnp.maximum(-qbits, 0)
    f = jnp.where(qbits < 0, 1 << jnp.maximum(neg - 1, 0), 0)
    rhs = (level * dmf0 + f) >> neg
    return jnp.where(qbits >= 0, lhs, rhs)


def dequant_2x2_dc(hadamard_out, dmf0, qp_div6):
    """Chroma DC dequant after the inverse 2x2 Hadamard
    (idct_dequant_2x2_dc, encoder/macroblock.c:53-60):
    out = (x * dmf) >> (5 - qp/6), with dmf pre-shifted left when qp/6 > 5.
    No rounding term (matches the reference exactly).
    """
    x = hadamard_out.astype(I32)
    dmf0 = dmf0.astype(I32)
    qbits = qp_div6 - 5
    dmf_eff = dmf0 << jnp.maximum(qbits, 0)
    shift = jnp.maximum(-qbits, 0)
    return (x * dmf_eff) >> shift


def nonzero(level, axis=None):
    """1 if any coefficient is nonzero (the nz flags of quant_*)."""
    return jnp.any(level != 0, axis=axis)


# decimate-score run-cost tables (x264_decimate_table4/8,
# common/quant.c:203-210)
DECIMATE_TAB4 = (3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
DECIMATE_TAB8 = (3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1,
                 1, 1, 1, 1, 1, 1, 1, 1) + (0,) * 40


def decimate_score(levels_scan, table):
    """Batched x264_decimate_score_internal (common/quant.c:212-241):
    per block, 9 if any |level| > 1, else the sum over nonzero
    coefficients of table[run-of-zeros-below]. levels_scan: (..., C)
    int32 in scan order; table: tuple of run costs (len >= C). Returns
    (...,) int32 scores; a zero block scores 0."""
    C = levels_scan.shape[-1]
    nz = levels_scan != 0
    pos = jnp.arange(C, dtype=I32)
    # index of the previous nonzero strictly below each position
    marks = jnp.where(nz, pos, -1)
    prev_nz = jnp.concatenate(
        [jnp.full((*marks.shape[:-1], 1), -1, I32),
         jax.lax.cummax(marks, axis=marks.ndim - 1)[..., :-1]], axis=-1)
    run = pos - prev_nz - 1
    tab = jnp.asarray(table[:C], dtype=I32)
    per_coef = jnp.where(nz, tab[jnp.clip(run, 0, C - 1)], 0)
    score = per_coef.sum(axis=-1)
    big = jnp.any(jnp.abs(levels_scan) > 1, axis=-1)
    return jnp.where(big, 9, score)


def denoise(coef, offset):
    """Batched x264_denoise_dct (common/quant.c:180): shrink every AC
    coefficient toward zero by the adaptive per-position offset,
    accumulating per-position |coef| sums for the next offset update.
    Position 0 (DC) is passed through and not accumulated, as the
    reference's i=1 loop start.

    coef: (..., nblk, N) int32; offset: (N,) int32.
    Returns (denoised coef, sums (N,) float32)."""
    a = jnp.abs(coef)
    pos0 = jnp.arange(coef.shape[-1]) == 0
    sums = jnp.where(pos0, 0,
                     a.astype(jnp.float32).reshape(-1, coef.shape[-1])
                     .sum(axis=0))
    shrunk = jnp.maximum(a - offset, 0) * jnp.sign(coef)
    return jnp.where(pos0, coef, shrunk), sums


def nr_weight2():
    """The dct4/dct8 weight2 tables (common/dct.h FIX8 class patterns)
    used by the noise-reduction offset update. Returns ((16,), (64,))
    int64 raster-order weights."""
    import numpy as np
    w4c = np.array([800, 320, 128], np.int64)          # FIX8 3.125/1.25/0.5
    i = np.arange(16)
    j4 = (i & 1) + ((i >> 2) & 1)
    w8c = np.array([256, 201, 656, 227, 410, 363], np.int64)
    pat = np.array([[0, 3, 4, 3], [3, 1, 5, 1],
                    [4, 5, 2, 5], [3, 1, 5, 1]])
    y8, x8 = np.mgrid[0:8, 0:8]
    j8 = pat[y8 % 4, x8 % 4].ravel()
    return w4c[j4], w8c[j8]
