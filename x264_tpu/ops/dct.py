"""H.264 integer transforms, batched over leading dims (int32, bit-exact).

Forward/inverse 4x4 core transform, 4x4 / 2x2 DC Hadamards and the 8x8
transform pair. Semantics match the reference C (common/dct.c:39-345,
encoder/macroblock.c:30-86) but in the *spec* orientation: coefficients are
indexed [row][col] with Y[0][1] = horizontal frequency (the reference stores
the transpose internally and compensates in its scan tables; we keep spec
layout and use the spec zig-zag directly).

Pass ordering matters wherever a 1-D pass truncates intermediates (>>1):
the inverse transforms follow the spec order — horizontal (rows) first,
then vertical (columns) — which is what the reference's column-first loops
compute on its transposed storage.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

I32 = jnp.int32

# Forward core-transform matrix (spec 8.5.12 derivation)
_CF4 = np.array([[1, 1, 1, 1],
                 [2, 1, -1, -2],
                 [1, -1, -1, 1],
                 [1, -2, 2, -1]], dtype=np.int32)

# 4x4 Hadamard (luma DC), symmetric
_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], dtype=np.int32)

_H2 = np.array([[1, 1], [1, -1]], dtype=np.int32)


def _mm(a, b):
    return jnp.matmul(a.astype(I32), b.astype(I32))


def dct4x4(diff):
    """Forward 4x4 transform of residuals: Y = C d C^T. diff: (...,4,4).

    Equivalent to sub4x4_dct (common/dct.c:122) on a precomputed difference
    block (no truncation in the forward path, so pass order is free).
    """
    c = jnp.asarray(_CF4)
    return _mm(_mm(c, diff.astype(I32)), c.T)


def _idct4_1d(s):
    """Spec 8.5.12.2 1-D inverse butterfly along the last axis."""
    x0, x1, x2, x3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    e0 = x0 + x2
    e1 = x0 - x2
    e2 = (x1 >> 1) - x3
    e3 = x1 + (x3 >> 1)
    return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)


def idct4x4(coef):
    """Inverse 4x4 transform -> residual to add (includes (x+32)>>6).

    Matches add4x4_idct (common/dct.c:175) / spec 8.5.12.2 minus the final
    add+clip, which the caller fuses with the prediction.
    """
    t = _idct4_1d(coef.astype(I32))                              # rows
    t = jnp.swapaxes(_idct4_1d(jnp.swapaxes(t, -1, -2)), -1, -2)  # columns
    return (t + 32) >> 6


def hadamard4x4_fwd(dc):
    """Forward 4x4 Hadamard for i16x16 luma DC, with (x+1)>>1.

    Matches dct4x4dc (common/dct.c:39); exact butterflies, so orientation
    and pass order are free.
    """
    h = jnp.asarray(_H4)
    return (_mm(_mm(h, dc.astype(I32)), h) + 1) >> 1


def hadamard4x4_inv(dc):
    """Inverse 4x4 Hadamard (idct4x4dc, common/dct.c:73); no scaling."""
    h = jnp.asarray(_H4)
    return _mm(_mm(h, dc.astype(I32)), h)


def hadamard2x2(dc):
    """2x2 Hadamard, used both forward and inverse for chroma DC.

    dc: (..., 2, 2) raster [row][col]. Matches dct2x2dc /
    idct_dequant_2x2_dc's butterfly (encoder/macroblock.c:30-86) in spec
    orientation (coef[0][1] = horizontal difference).
    """
    h = jnp.asarray(_H2)
    return _mm(_mm(h, dc.astype(I32)), h)


# ----------------------------------------------------------------------
# 8x8 transform (high profile) — common/dct.c:239-345
# ----------------------------------------------------------------------

def _dct8_1d(s):
    """1-D 8-point forward transform along axis -1 (DCT8_1D macro,
    common/dct.c:239)."""
    x = [s[..., i] for i in range(8)]
    s07, s16, s25, s34 = x[0] + x[7], x[1] + x[6], x[2] + x[5], x[3] + x[4]
    a0, a1, a2, a3 = s07 + s34, s16 + s25, s07 - s34, s16 - s25
    d07, d16, d25, d34 = x[0] - x[7], x[1] - x[6], x[2] - x[5], x[3] - x[4]
    a4 = d16 + d25 + (d07 + (d07 >> 1))
    a5 = d07 - d34 - (d25 + (d25 >> 1))
    a6 = d07 + d34 - (d16 + (d16 >> 1))
    a7 = d16 - d25 + (d34 + (d34 >> 1))
    return jnp.stack([
        a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1), a5 + (a6 >> 2),
        a0 - a1, a6 - (a5 >> 2), (a2 >> 1) - a3, (a4 >> 2) - a7], axis=-1)


def dct8x8(diff):
    """Forward 8x8 transform (sub8x8_dct8, common/dct.c:266), spec layout.

    The forward 8x8 truncates intermediates, so pass order matters for
    exact parity with the reference: columns first, then rows (the
    reference's column-first loop on natural-orientation residuals).
    """
    diff = diff.astype(I32)
    t = jnp.swapaxes(_dct8_1d(jnp.swapaxes(diff, -1, -2)), -1, -2)  # columns
    return _dct8_1d(t)                                              # rows


def _idct8_1d(s):
    """1-D 8-point inverse butterfly along axis -1 (IDCT8_1D,
    common/dct.c:297 / spec 8.5.12.3)."""
    x = [s[..., i] for i in range(8)]
    a0 = x[0] + x[4]
    a2 = x[0] - x[4]
    a4 = (x[2] >> 1) - x[6]
    a6 = (x[6] >> 1) + x[2]
    b0, b2, b4, b6 = a0 + a6, a2 + a4, a2 - a4, a0 - a6
    a1 = -x[3] + x[5] - x[7] - (x[7] >> 1)
    a3 = x[1] + x[7] - x[3] - (x[3] >> 1)
    a5 = -x[1] + x[7] + x[5] + (x[5] >> 1)
    a7 = x[3] + x[5] + x[1] + (x[1] >> 1)
    b1 = (a7 >> 2) + a1
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    b7 = a7 - (a1 >> 2)
    return jnp.stack([
        b0 + b7, b2 + b5, b4 + b3, b6 + b1,
        b6 - b1, b4 - b3, b2 - b5, b0 - b7], axis=-1)


def idct8x8(coef):
    """Inverse 8x8 transform incl. the rounding term folded into coef[0][0]
    (add8x8_idct8, common/dct.c:324) minus the final add/clip.

    Spec order: rows first, then columns.
    """
    coef = jnp.asarray(coef).astype(I32)
    coef = coef.at[..., 0, 0].add(32)
    t = _idct8_1d(coef)                                             # rows
    t = jnp.swapaxes(_idct8_1d(jnp.swapaxes(t, -1, -2)), -1, -2)    # columns
    return t >> 6


def sub_pixels(src, pred):
    """Pixel difference (pixel_sub_wxh, common/dct.c:105)."""
    return src.astype(I32) - pred.astype(I32)


def add_clip(pred, res):
    """Reconstruct: clip(pred + residual) to [0,255]."""
    return jnp.clip(pred.astype(I32) + res, 0, 255)
