"""Batched intra predictors (common/predict.c:52-751), int32 bit-exact.

Instead of the reference's per-MB function-pointer dispatch, every mode is
computed for *all* macroblocks of a wavefront diagonal at once and the mode
decision is an argmin over masked costs (SURVEY.md §7 two-level decision).

Neighbor context comes in as flat vectors gathered from the reconstruction
state: ``top`` (the row above), ``left`` (the column to the left),
``topleft`` (corner pixel), plus availability flags. Unavailable-mode
outputs are garbage and must be masked by the caller via cost = +inf.

Bitstream mode numbering (spec == reference enums):
  I16x16: 0=V 1=H 2=DC 3=Plane   (x264 DC_LEFT/DC_TOP/DC_128 variants are
                                  folded into DC here, as the spec does)
  Chroma: 0=DC 1=H 2=V 3=Plane
"""

from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32


def _bcast_row(v, n):
    """(..., n) -> (..., n, n) with rows identical (vertical prediction)."""
    return jnp.broadcast_to(v[..., None, :], v.shape[:-1] + (n, n))


def _bcast_col(v, n):
    """(..., n) -> (..., n, n) with cols identical (horizontal prediction)."""
    return jnp.broadcast_to(v[..., :, None], v.shape[:-1] + (n, n))


def _dc_fill(dc, n):
    return jnp.broadcast_to(dc[..., None, None], dc.shape + (n, n))


def predict_16x16(top, left, topleft, has_top, has_left):
    """All four I16x16 predictions. top/left: (..., 16) int32; topleft: (...)
    ints; has_*: (...) bool. Returns (..., 4, 16, 16) int32 in [0,255]
    for available modes.

    DC handles the availability variants of predict_16x16_dc/_left/_top/_128
    (common/predict.c:52-96). Plane per common/predict.c:133-167.
    """
    top = top.astype(I32)
    left = left.astype(I32)
    topleft = jnp.asarray(topleft).astype(I32)

    v = _bcast_row(top, 16)
    h = _bcast_col(left, 16)

    st = jnp.sum(top, axis=-1)
    sl = jnp.sum(left, axis=-1)
    dc_both = (st + sl + 16) >> 5
    dc_left = (sl + 8) >> 4
    dc_top = (st + 8) >> 4
    dc = jnp.where(has_top & has_left, dc_both,
                   jnp.where(has_left, dc_left,
                             jnp.where(has_top, dc_top, 128)))
    dcp = _dc_fill(dc, 16)

    # Plane (uses topleft at i=7 of both sums)
    lext = jnp.concatenate([topleft[..., None], left], axis=-1)   # lext[1+i]=left[i]
    text = jnp.concatenate([topleft[..., None], top], axis=-1)
    i = jnp.arange(8, dtype=I32)
    w = i + 1
    hh = jnp.sum(w * (text[..., 9 + i] - text[..., 7 - i]), axis=-1)
    vv = jnp.sum(w * (lext[..., 9 + i] - lext[..., 7 - i]), axis=-1)
    a = 16 * (left[..., 15] + top[..., 15])
    b = (5 * hh + 32) >> 6
    c = (5 * vv + 32) >> 6
    x = jnp.arange(16, dtype=I32)
    y = jnp.arange(16, dtype=I32)
    plane = (a[..., None, None]
             + b[..., None, None] * (x[None, :] - 7)
             + c[..., None, None] * (y[:, None] - 7) + 16) >> 5
    plane = jnp.clip(plane, 0, 255)

    return jnp.stack([v, h, dcp, plane], axis=-3)


def predict_8x8c(top, left, topleft, has_top, has_left):
    """All four chroma 8x8 predictions. top/left: (..., 8). Returns
    (..., 4, 8, 8) for modes [DC, H, V, Plane].

    DC uses the quadrant rules of predict_8x8c_dc/_left/_top/_128
    (common/predict.c:176-263); Plane per common/predict.c:265-295.
    """
    top = top.astype(I32)
    left = left.astype(I32)
    topleft = jnp.asarray(topleft).astype(I32)

    s0 = jnp.sum(top[..., 0:4], axis=-1)
    s1 = jnp.sum(top[..., 4:8], axis=-1)
    s2 = jnp.sum(left[..., 0:4], axis=-1)
    s3 = jnp.sum(left[..., 4:8], axis=-1)

    both = jnp.stack([(s0 + s2 + 4) >> 3, (s1 + 2) >> 2,
                      (s3 + 2) >> 2, (s1 + s3 + 4) >> 3], axis=-1)
    onlyl = jnp.stack([(s2 + 2) >> 2, (s2 + 2) >> 2,
                       (s3 + 2) >> 2, (s3 + 2) >> 2], axis=-1)
    onlyt = jnp.stack([(s0 + 2) >> 2, (s1 + 2) >> 2,
                       (s0 + 2) >> 2, (s1 + 2) >> 2], axis=-1)
    none = jnp.full_like(both, 128)
    quad = jnp.where((has_top & has_left)[..., None], both,
                     jnp.where(has_left[..., None], onlyl,
                               jnp.where(has_top[..., None], onlyt, none)))
    # quad order: [dc0 (TL), dc1 (TR), dc2 (BL), dc3 (BR)]
    q = quad.reshape(quad.shape[:-1] + (2, 2))
    dcp = jnp.repeat(jnp.repeat(q, 4, axis=-1), 4, axis=-2)

    h = _bcast_col(left, 8)
    v = _bcast_row(top, 8)

    lext = jnp.concatenate([topleft[..., None], left], axis=-1)
    text = jnp.concatenate([topleft[..., None], top], axis=-1)
    i = jnp.arange(4, dtype=I32)
    w = i + 1
    hh = jnp.sum(w * (text[..., 5 + i] - text[..., 3 - i]), axis=-1)
    vv = jnp.sum(w * (lext[..., 5 + i] - lext[..., 3 - i]), axis=-1)
    a = 16 * (left[..., 7] + top[..., 7])
    b = (17 * hh + 16) >> 5
    c = (17 * vv + 16) >> 5
    x = jnp.arange(8, dtype=I32)
    y = jnp.arange(8, dtype=I32)
    plane = (a[..., None, None]
             + b[..., None, None] * (x[None, :] - 3)
             + c[..., None, None] * (y[:, None] - 3) + 16) >> 5
    plane = jnp.clip(plane, 0, 255)

    return jnp.stack([dcp, h, v, plane], axis=-3)


def mode_available_16x16(has_top, has_left):
    """(..., 4) bool mask over [V, H, DC, Plane]."""
    return jnp.stack(
        [has_top, has_left, jnp.ones_like(has_top), has_top & has_left],
        axis=-1)


def mode_available_8x8c(has_top, has_left):
    """(..., 4) bool mask over [DC, H, V, Plane]."""
    return jnp.stack(
        [jnp.ones_like(has_top), has_left, has_top, has_top & has_left],
        axis=-1)
