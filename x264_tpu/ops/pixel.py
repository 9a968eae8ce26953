"""Batched pixel comparison metrics (common/pixel.c).

SAD / SSD / SATD / SA8D / variance, operating on int32 pixel blocks with
arbitrary leading batch dims. These are the cost functions of motion
estimation and mode decision; on TPU they are evaluated for *many
candidates at once* (the generalisation of the reference's _x3/_x4 merged
functions, common/pixel.h:85-102).

SATD matches the reference's summation structure exactly: the 2-D 4x4
Hadamard abs-sum is computed per 4x4 block, halved (>>1) per 8x4 unit
(x264_pixel_satd_8x4, common/pixel.c:211) — or per 4x4 block for 4-wide
shapes (x264_pixel_satd_4x4, common/pixel.c:187) — then summed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

I32 = jnp.int32

_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], dtype=np.int32)


def sad(a, b, axes=(-2, -1)):
    """Sum of absolute differences over the trailing block dims."""
    return jnp.sum(jnp.abs(a.astype(I32) - b.astype(I32)), axis=axes)


def ssd(a, b, axes=(-2, -1)):
    d = a.astype(I32) - b.astype(I32)
    return jnp.sum(d * d, axis=axes)


def _tile44(x):
    """(..., H, W) -> (..., H//4, W//4, 4, 4)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 4, 4, w // 4, 4)
    return jnp.swapaxes(x, -3, -2)


def _abs_had44(diff):
    """Per-4x4 sum |H d H| . diff: (..., H, W) -> (..., H//4, W//4)."""
    t = _tile44(diff.astype(I32))
    h = jnp.asarray(_H4)
    had = jnp.matmul(jnp.matmul(h, t), h)
    return jnp.sum(jnp.abs(had), axis=(-2, -1))


def satd(a, b):
    """x264-equivalent SATD over (..., H, W) blocks; H%4==0, W%4==0.

    For W%8==0 shapes the >>1 happens per 8x4 unit; for 4-wide shapes per
    4x4 block — matching PIXEL_SATD_C composition (common/pixel.c:233-252).
    """
    d = a.astype(I32) - b.astype(I32)
    s44 = _abs_had44(d)                      # (..., H//4, W//4)
    w4 = a.shape[-1] // 4
    if w4 % 2 == 0:
        pair = s44.reshape(s44.shape[:-1] + (w4 // 2, 2)).sum(axis=-1)
        return jnp.sum(pair >> 1, axis=(-2, -1))
    return jnp.sum(s44 >> 1, axis=(-2, -1))


def sa8d_8x8(a, b):
    """8x8 SA8D: abs-sum of the 2-D 8x8 Hadamard of the diff, (+2)>>2
    (sa8d_8x8 + x264_pixel_sa8d_8x8, common/pixel.c:256-295)."""
    d = a.astype(I32) - b.astype(I32)
    h8 = _h8()
    had = jnp.matmul(jnp.matmul(h8, d), h8)
    return (jnp.sum(jnp.abs(had), axis=(-2, -1)) + 2) >> 2


def sa8d_16x16(a, b):
    """Sum of the four 8x8 SA8D abs-sums, then one (+2)>>2
    (x264_pixel_sa8d_16x16, common/pixel.c:297)."""
    d = a.astype(I32) - b.astype(I32)
    *lead, hh, ww = d.shape
    t = d.reshape(*lead, 2, 8, 2, 8).swapaxes(-3, -2)
    h8 = _h8()
    had = jnp.matmul(jnp.matmul(h8, t), h8)
    s = jnp.sum(jnp.abs(had), axis=(-4, -3, -2, -1))
    return (s + 2) >> 2


def _build_h8():
    h = np.array([[1]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    return h.astype(np.int32)


# cache the NumPy constant, not a jnp array: a jnp constant materialized
# during a trace is a tracer and must never escape into module state
_H8_NP = _build_h8()


def _h8():
    return jnp.asarray(_H8_NP)


def var(pix, shift):
    """Variance*N of a block: sqr - (sum*sum >> shift)
    (PIXEL_VAR_C, common/pixel.c:140-161); shift=8 for 16x16, 6 for 8x8."""
    p = pix.astype(I32)
    s = jnp.sum(p, axis=(-2, -1))
    sq = jnp.sum(p * p, axis=(-2, -1))
    return sq - ((s * s) >> shift)


# ssim_c1/c2 constants of ssim_end1 (common/pixel.c:464-466)
_SSIM_C1 = int(.01 * .01 * 255 * 255 * 64 + .5)
_SSIM_C2 = int(.03 * .03 * 255 * 255 * 64 * 63 + .5)


def ssim_sum(a, b):
    """x264 SSIM over overlapped 4x4 blocks (ssim_4x4x2_core + ssim_end1,
    common/pixel.c:435-513), whole-plane vectorized.

    a, b: (H, W) integer planes — callers pass the 2-pixel-offset region
    the reference uses (encoder/encoder.c:1048-1055). Returns the float32
    *sum* of per-position SSIM; divide by (W//4-1)*(H//4-1) for the mean.
    """
    h, w = a.shape
    hb, wb = h // 4, w // 4
    a4 = a[:hb * 4, :wb * 4].astype(I32).reshape(hb, 4, wb, 4)
    b4 = b[:hb * 4, :wb * 4].astype(I32).reshape(hb, 4, wb, 4)
    s1 = a4.sum(axis=(1, 3))
    s2 = b4.sum(axis=(1, 3))
    ss = (a4 * a4).sum(axis=(1, 3)) + (b4 * b4).sum(axis=(1, 3))
    s12 = (a4 * b4).sum(axis=(1, 3))

    def quad(x):
        return x[:-1, :-1] + x[:-1, 1:] + x[1:, :-1] + x[1:, 1:]

    f1, f2, fss, f12 = quad(s1), quad(s2), quad(ss), quad(s12)
    # int32 products exactly as ssim_end1 (all stay within int32 range),
    # float only for the final ratio — matches the C rounding behavior
    vars_ = fss * 64 - f1 * f1 - f2 * f2
    covar = f12 * 64 - f1 * f2
    num = ((2 * f1 * f2 + _SSIM_C1).astype(jnp.float32)
           * (2 * covar + _SSIM_C2).astype(jnp.float32))
    den = ((f1 * f1 + f2 * f2 + _SSIM_C1).astype(jnp.float32)
           * (vars_ + _SSIM_C2).astype(jnp.float32))
    return (num / den).sum()


def hadamard_ac(pix):
    """x264_pixel_hadamard_ac (common/pixel.c:306-358) batched over
    (..., H, W) tiles with H, W in {8, 16}: per 8x8 quadrant, sum of
    |4x4 Hadamard| coefs and |8x8 Hadamard| coefs, each minus the DC
    sum; quadrants added, then the macro's final >>1 (satd) / >>2
    (sa8d) shifts. Returns (satd_ac, sa8d_ac), each (...,) int32 —
    the complexity pair psy-RD differences (encoder/rdo.c:97-130)."""
    p = pix.astype(I32)
    *lead, hh, ww = p.shape
    t8 = p.reshape(*lead, hh // 8, 8, ww // 8, 8).swapaxes(-3, -2)
    h8 = _h8()
    had8 = jnp.matmul(jnp.matmul(h8, t8), h8)
    sum8 = jnp.abs(had8).sum(axis=(-2, -1))          # per 8x8 quadrant
    h4 = jnp.asarray(_H4)
    t4 = _tile44(t8)                                  # (.., qh, qw, 2,2,4,4)
    had4 = jnp.matmul(jnp.matmul(h4, t4), h4)
    sum4 = jnp.abs(had4).sum(axis=(-4, -3, -2, -1))
    dc = t8.sum(axis=(-2, -1))                        # == both DC sums
    satd_ac = (sum4 - dc).sum(axis=(-2, -1)) >> 1
    sa8d_ac = (sum8 - dc).sum(axis=(-2, -1)) >> 2
    return satd_ac, sa8d_ac


def ac_energy(tiles):
    """AC complexity of (..., 16, 16) tiles for the MB-level psy-RD
    term (the PIXEL_16x16 branch of ssd_plane, encoder/rdo.c:122-125):
    SATD(pix, 0) - (pixel_sum >> 1)."""
    z = jnp.zeros_like(tiles)
    return satd(tiles, z) - (tiles.astype(I32).sum(axis=(-2, -1)) >> 1)
