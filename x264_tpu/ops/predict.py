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


# ---------------------------------------------------------------------------
# 4x4 luma prediction (common/predict.c:310-498; spec 8.3.1.2)
#
# All 9 modes are expressed as one gather over a 13-entry edge vector
# e = [l3 l2 l1 l0 lt t0 t1 t2 t3 t4 t5 t6 t7] with per-position weights:
# F2(a,b,c) = (a+2b+c+2)>>2 -> (1,2,1); F1(a,b) = (2a+2b+2)>>2 -> (2,2,0);
# copy v = (4v+2)>>2 -> (4,0,0). DC is availability-dependent and patched
# separately. Mode numbering is the spec/bitstream order:
# 0=V 1=H 2=DC 3=DDL 4=DDR 5=VR 6=HD 7=VL 8=HU.
# ---------------------------------------------------------------------------

def _build_4x4_tables():
    import numpy as np
    L = lambda i: 3 - i
    T = lambda i: 5 + i
    LT = 4
    idx = np.zeros((9, 4, 4, 3), np.int64)
    wgt = np.zeros((9, 4, 4, 3), np.int64)

    def setp(m, x, y, *spec):
        if len(spec) == 1:                       # copy
            idx[m, y, x] = (spec[0],) * 3
            wgt[m, y, x] = (4, 0, 0)
        elif len(spec) == 2:                     # F1
            idx[m, y, x] = (spec[0], spec[1], spec[0])
            wgt[m, y, x] = (2, 2, 0)
        else:                                    # F2
            idx[m, y, x] = spec
            wgt[m, y, x] = (1, 2, 1)

    for x in range(4):
        for y in range(4):
            setp(0, x, y, T(x))                  # V
            setp(1, x, y, L(y))                  # H
            setp(2, x, y, T(0))                  # DC placeholder
    # DDL (predict_4x4_ddl)
    for x in range(4):
        for y in range(4):
            i = x + y
            if i < 6:
                setp(3, x, y, T(i), T(i + 1), T(i + 2))
            else:
                setp(3, x, y, T(6), T(7), T(7))
    # DDR
    for x in range(4):
        for y in range(4):
            d = x - y
            setp(4, x, y, LT + d - 1 if False else (4 + d - 1),
                 4 + d, 4 + d + 1)
    # VR (predict_4x4_vr)
    vr = {(0, 3): (L(2), L(1), L(0)), (0, 2): (L(1), L(0), LT),
          (0, 1): (L(0), LT, T(0)), (1, 3): (L(0), LT, T(0)),
          (0, 0): (LT, T(0)), (1, 2): (LT, T(0)),
          (1, 1): (LT, T(0), T(1)), (2, 3): (LT, T(0), T(1)),
          (1, 0): (T(0), T(1)), (2, 2): (T(0), T(1)),
          (2, 1): (T(0), T(1), T(2)), (3, 3): (T(0), T(1), T(2)),
          (2, 0): (T(1), T(2)), (3, 2): (T(1), T(2)),
          (3, 1): (T(1), T(2), T(3)), (3, 0): (T(2), T(3))}
    for (x, y), s in vr.items():
        setp(5, x, y, *s)
    # HD (predict_4x4_hd)
    hd = {(0, 3): (L(2), L(3)), (1, 3): (L(1), L(2), L(3)),
          (0, 2): (L(1), L(2)), (2, 3): (L(1), L(2)),
          (1, 2): (L(0), L(1), L(2)), (3, 3): (L(0), L(1), L(2)),
          (0, 1): (L(0), L(1)), (2, 2): (L(0), L(1)),
          (1, 1): (LT, L(0), L(1)), (3, 2): (LT, L(0), L(1)),
          (0, 0): (LT, L(0)), (2, 1): (LT, L(0)),
          (1, 0): (T(0), LT, L(0)), (3, 1): (T(0), LT, L(0)),
          (2, 0): (T(1), T(0), LT), (3, 0): (T(2), T(1), T(0))}
    for (x, y), s in hd.items():
        setp(6, x, y, *s)
    # VL (predict_4x4_vl)
    vl = {(0, 0): (T(0), T(1)), (0, 1): (T(0), T(1), T(2)),
          (1, 0): (T(1), T(2)), (0, 2): (T(1), T(2)),
          (1, 1): (T(1), T(2), T(3)), (0, 3): (T(1), T(2), T(3)),
          (2, 0): (T(2), T(3)), (1, 2): (T(2), T(3)),
          (2, 1): (T(2), T(3), T(4)), (1, 3): (T(2), T(3), T(4)),
          (3, 0): (T(3), T(4)), (2, 2): (T(3), T(4)),
          (3, 1): (T(3), T(4), T(5)), (2, 3): (T(3), T(4), T(5)),
          (3, 2): (T(4), T(5)), (3, 3): (T(4), T(5), T(6))}
    for (x, y), s in vl.items():
        setp(7, x, y, *s)
    # HU (predict_4x4_hu)
    hu = {(0, 0): (L(0), L(1)), (1, 0): (L(0), L(1), L(2)),
          (2, 0): (L(1), L(2)), (0, 1): (L(1), L(2)),
          (3, 0): (L(1), L(2), L(3)), (1, 1): (L(1), L(2), L(3)),
          (2, 1): (L(2), L(3)), (0, 2): (L(2), L(3)),
          (3, 1): (L(2), L(3), L(3)), (1, 2): (L(2), L(3), L(3)),
          (3, 2): (L(3),), (1, 3): (L(3),), (0, 3): (L(3),),
          (2, 2): (L(3),), (2, 3): (L(3),), (3, 3): (L(3),)}
    for (x, y), s in hu.items():
        setp(8, x, y, *s)
    return idx, wgt


_P4_IDX, _P4_WGT = _build_4x4_tables()


def predict_4x4(left, topleft, top, topright, has_top, has_left):
    """All nine 4x4 predictions. left: (..., 4) l0..l3 top-to-bottom;
    top: (..., 4) t0..t3; topright: (..., 4) t4..t7 — callers substitute
    t3 for unavailable top-right samples (spec 8.3.1.2.1). Returns
    (..., 9, 4, 4) int32; unavailable modes are garbage (mask by cost).
    """
    left = left.astype(I32)
    top = top.astype(I32)
    e = jnp.concatenate([left[..., ::-1],
                         jnp.asarray(topleft).astype(I32)[..., None],
                         top, topright.astype(I32)], axis=-1)
    g = e[..., jnp.asarray(_P4_IDX, I32)]               # (..., 9,4,4,3)
    p = (jnp.sum(g * jnp.asarray(_P4_WGT, I32), axis=-1) + 2) >> 2

    st = jnp.sum(top, axis=-1)
    sl = jnp.sum(left, axis=-1)
    dc = jnp.where(has_top & has_left, (st + sl + 4) >> 3,
                   jnp.where(has_left, (sl + 2) >> 2,
                             jnp.where(has_top, (st + 2) >> 2, 128)))
    p = p.at[..., 2, :, :].set(
        jnp.broadcast_to(dc[..., None, None], dc.shape + (4, 4)))
    return p


def mode_available_4x4(has_top, has_left):
    """(..., 9) mask over [V H DC DDL DDR VR HD VL HU]
    (predict_4x4_mode_available semantics)."""
    ht, hl = has_top, has_left
    both = ht & hl
    return jnp.stack([ht, hl, jnp.ones_like(ht), ht, both, both, both,
                      ht, hl], axis=-1)


# ---------------------------------------------------------------------------
# 8x8 luma prediction (High profile; common/predict.c:499-751; spec 8.3.2)
#
# Same gather-table scheme as 4x4, over the FILTERED 25-entry edge vector
# e' = [l7'..l0', lt', t0'..t15'] (spec 8.3.2.2.1 low-pass filters the
# reference samples before prediction — the x264_predict_8x8_filter role).
# The linear layout makes the T(-1)/L(-1) -> lt' wraparound of the VR/HD
# zVR==0 / zHD==0 rows fall out of the indexing automatically.
# ---------------------------------------------------------------------------

def predict_8x8_filter(left, topleft, top, topright, ht, hl, htl, htr):
    """Reference-sample filtering for Intra_8x8 (spec 8.3.2.2.1).

    left: (..., 8) l0..l7 top-to-bottom; top: (..., 8); topright: (..., 8)
    t8..t15; topleft: (...,); ht/hl/htl/htr: (...) bool availability.
    Unavailable top-right samples are substituted with t7 before
    filtering (the decoder applies the same rule, so substitution here
    is conformant only when htr mirrors the decoder's availability).
    Returns (l_f (...,8), tl_f (...,), t_f (...,16))."""
    left = left.astype(I32)
    top = top.astype(I32)
    tl = jnp.asarray(topleft).astype(I32)
    tr = jnp.where(htr[..., None], topright.astype(I32), top[..., 7:8])
    t16 = jnp.concatenate([top, jnp.broadcast_to(
        tr, top.shape[:-1] + (8,))], axis=-1)

    prev = jnp.concatenate(
        [jnp.where(htl[..., None], tl[..., None], t16[..., 0:1]),
         t16[..., :-1]], axis=-1)
    nxt = jnp.concatenate([t16[..., 1:], t16[..., 15:16]], axis=-1)
    t_f = (prev + 2 * t16 + nxt + 2) >> 2

    lprev = jnp.concatenate(
        [jnp.where(htl[..., None], tl[..., None], left[..., 0:1]),
         left[..., :-1]], axis=-1)
    lnxt = jnp.concatenate([left[..., 1:], left[..., 7:8]], axis=-1)
    l_f = (lprev + 2 * left + lnxt + 2) >> 2

    tl_f = jnp.where(
        ht & hl, (top[..., 0] + 2 * tl + left[..., 0] + 2) >> 2,
        jnp.where(ht, (3 * tl + top[..., 0] + 2) >> 2,
                  (3 * tl + left[..., 0] + 2) >> 2))
    return l_f, tl_f, t_f


def _build_8x8_tables():
    import numpy as np
    L = lambda i: 7 - i          # i = -1 -> 8 == LT (intentional)
    LT = 8
    T = lambda i: 9 + i          # i = -1 -> 8 == LT (intentional)
    idx = np.zeros((9, 8, 8, 3), np.int64)
    wgt = np.zeros((9, 8, 8, 3), np.int64)

    def setp(m, x, y, ids, ws):
        idx[m, y, x] = ids
        wgt[m, y, x] = ws

    F2 = (1, 2, 1)
    F1 = (2, 2, 0)
    CP = (4, 0, 0)
    for x in range(8):
        for y in range(8):
            setp(0, x, y, (T(x),) * 3, CP)              # V
            setp(1, x, y, (L(y),) * 3, CP)              # H
            setp(2, x, y, (T(0),) * 3, CP)              # DC placeholder
            # DDL (spec 8.3.2.2.5)
            if x == 7 and y == 7:
                setp(3, x, y, (T(14), T(15), T(15)), F2)
            else:
                i = x + y
                setp(3, x, y, (T(i), T(i + 1), T(i + 2)), F2)
            # DDR (8.3.2.2.6)
            if x > y:
                setp(4, x, y, (T(x - y - 2), T(x - y - 1), T(x - y)), F2)
            elif x < y:
                setp(4, x, y, (L(y - x - 2), L(y - x - 1), L(y - x)), F2)
            else:
                setp(4, x, y, (T(0), LT, L(0)), F2)
            # VR (8.3.2.2.7)
            zvr = 2 * x - y
            if zvr >= 0 and zvr % 2 == 0:
                setp(5, x, y, (T(x - (y >> 1) - 1), T(x - (y >> 1)),
                               T(x - (y >> 1) - 1)), F1)
            elif zvr >= 1:
                setp(5, x, y, (T(x - (y >> 1) - 2), T(x - (y >> 1) - 1),
                               T(x - (y >> 1))), F2)
            elif zvr == -1:
                setp(5, x, y, (L(0), LT, T(0)), F2)
            else:
                setp(5, x, y, (L(y - 2 * x - 1), L(y - 2 * x - 2),
                               L(y - 2 * x - 3)), F2)
            # HD (8.3.2.2.8)
            zhd = 2 * y - x
            if zhd >= 0 and zhd % 2 == 0:
                setp(6, x, y, (L(y - (x >> 1) - 1), L(y - (x >> 1)),
                               L(y - (x >> 1) - 1)), F1)
            elif zhd >= 1:
                setp(6, x, y, (L(y - (x >> 1) - 2), L(y - (x >> 1) - 1),
                               L(y - (x >> 1))), F2)
            elif zhd == -1:
                setp(6, x, y, (T(0), LT, L(0)), F2)
            else:
                setp(6, x, y, (T(x - 2 * y - 1), T(x - 2 * y - 2),
                               T(x - 2 * y - 3)), F2)
            # VL (8.3.2.2.9)
            if y % 2 == 0:
                setp(7, x, y, (T(x + (y >> 1)), T(x + (y >> 1) + 1),
                               T(x + (y >> 1))), F1)
            else:
                setp(7, x, y, (T(x + (y >> 1)), T(x + (y >> 1) + 1),
                               T(x + (y >> 1) + 2)), F2)
            # HU (8.3.2.2.10)
            zhu = x + 2 * y
            if zhu < 13 and zhu % 2 == 0:
                setp(8, x, y, (L(y + (x >> 1)), L(y + (x >> 1) + 1),
                               L(y + (x >> 1))), F1)
            elif zhu < 13:
                setp(8, x, y, (L(y + (x >> 1)), L(y + (x >> 1) + 1),
                               L(y + (x >> 1) + 2)), F2)
            elif zhu == 13:
                setp(8, x, y, (L(6), L(7), L(7)), F2)
            else:
                setp(8, x, y, (L(7),) * 3, CP)
    return idx, wgt


_P8_IDX, _P8_WGT = _build_8x8_tables()


def predict_8x8(l_f, tl_f, t_f, has_top, has_left):
    """All nine 8x8 predictions from the FILTERED edges
    (predict_8x8_filter). l_f: (..., 8); t_f: (..., 16); tl_f: (...).
    Returns (..., 9, 8, 8) int32; unavailable modes are garbage (mask
    via mode_available_8x8). Mode order matches 4x4:
    0=V 1=H 2=DC 3=DDL 4=DDR 5=VR 6=HD 7=VL 8=HU."""
    e = jnp.concatenate([l_f[..., ::-1].astype(I32),
                         jnp.asarray(tl_f).astype(I32)[..., None],
                         t_f.astype(I32)], axis=-1)
    g = e[..., jnp.asarray(_P8_IDX, I32)]               # (..., 9,8,8,3)
    p = (jnp.sum(g * jnp.asarray(_P8_WGT, I32), axis=-1) + 2) >> 2

    st = jnp.sum(t_f[..., :8], axis=-1)
    sl = jnp.sum(l_f, axis=-1)
    dc = jnp.where(has_top & has_left, (st + sl + 8) >> 4,
                   jnp.where(has_left, (sl + 4) >> 3,
                             jnp.where(has_top, (st + 4) >> 3, 128)))
    p = p.at[..., 2, :, :].set(
        jnp.broadcast_to(dc[..., None, None], dc.shape + (8, 8)))
    return p


def mode_available_8x8(has_top, has_left, has_topleft):
    """(..., 9) mask over [V H DC DDL DDR VR HD VL HU] for Intra_8x8.
    DDR/VR/HD read the filtered topleft, so they additionally require
    the topleft neighbor (x264's MB_TOPLEFT gate)."""
    ht, hl = has_top, has_left
    diag = ht & hl & has_topleft
    return jnp.stack([ht, hl, jnp.ones_like(ht), ht, diag, diag, diag,
                      ht, hl], axis=-1)
