"""Vectorized exact MV prediction over final block-level maps.

The reference predicts MVs incrementally through the per-MB neighbor
cache (x264_mb_predict_mv / _16x16 / _pskip, common/macroblock.c:28-153,
scan8 layout common/common.h:214-247). On TPU the whole frame's MVs are
final before syntax generation, so prediction becomes pure gathers on
4x4-granular maps:

  ref4: (4*mb_h, 4*mb_w) int32 — reference index per 4x4 block
        (-1 = intra; callers never store -2, the pad ring supplies it)
  mv4:  (4*mb_h, 4*mb_w, 2) int32 — qpel MV per 4x4 block (0 for intra)

Neighbor slots exactly mirror the scan8 cache semantics:
  - A = left block, B = top block, C = top + partition width,
    D = top-left; C falls back to D when the C slot is unavailable
    (outside the frame, or a cache slot raster order has not written —
    e.g. the bottom 16x8 partition's C, common/macroblock.c:41-45).
  - availability -2 only arises from the frame border here; slice/band
    boundaries are handled by the caller padding ref4 with -2 rows.

All functions return qpel MV predictor arrays on the MB grid.
"""

from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32


def median3(a, b, c):
    return a + b + c - jnp.minimum(a, jnp.minimum(b, c)) \
        - jnp.maximum(a, jnp.maximum(b, c))


def _pad_maps(ref4, mv4):
    """1-ring pad: outside-frame = ref -2, mv 0."""
    refp = jnp.pad(ref4, ((1, 1), (1, 1)), constant_values=-2)
    mvp = jnp.pad(mv4, ((1, 1), (1, 1), (0, 0)))
    return refp, mvp


def _gather(refp, mvp, r, c):
    """Fetch (ref, mv) at block coords (r, c) of the unpadded grid;
    r/c arrays may be -1 (resolves into the pad ring)."""
    return refp[r + 1, c + 1], mvp[r + 1, c + 1]


def _predict(ref_a, mv_a, ref_b, mv_b, ref_c, mv_c, i_ref):
    """The common median/count rule (x264_mb_predict_mv_16x16 tail)."""
    cnt = ((ref_a == i_ref).astype(I32) + (ref_b == i_ref).astype(I32)
           + (ref_c == i_ref).astype(I32))
    med = median3(mv_a, mv_b, mv_c)
    only = jnp.where((ref_a == i_ref)[..., None], mv_a,
                     jnp.where((ref_b == i_ref)[..., None], mv_b, mv_c))
    a_only = (ref_b == -2) & (ref_c == -2) & (ref_a != -2)
    return jnp.where((cnt > 1)[..., None], med,
                     jnp.where((cnt == 1)[..., None], only,
                               jnp.where(a_only[..., None], mv_a, med)))


def _slots_16x16(refp, mvp, mb_h, mb_w):
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    ref_a, mv_a = _gather(refp, mvp, gy, gx - 1)
    ref_b, mv_b = _gather(refp, mvp, gy - 1, gx)
    ref_c, mv_c = _gather(refp, mvp, gy - 1, gx + 4)
    ref_d, mv_d = _gather(refp, mvp, gy - 1, gx - 1)
    use_d = ref_c == -2
    ref_c = jnp.where(use_d, ref_d, ref_c)
    mv_c = jnp.where(use_d[..., None], mv_d, mv_c)
    return (ref_a, mv_a, ref_b, mv_b, ref_c, mv_c)


def predict_16x16(ref4, mv4, i_ref=0):
    """MVP for whole-MB partitions (x264_mb_predict_mv_16x16).
    Returns (mb_h, mb_w, 2)."""
    mb_h, mb_w = ref4.shape[0] // 4, ref4.shape[1] // 4
    refp, mvp = _pad_maps(ref4, mv4)
    a = _slots_16x16(refp, mvp, mb_h, mb_w)
    return _predict(*a, i_ref)


def predict_pskip(ref4, mv4):
    """P_Skip MV (x264_mb_predict_mv_pskip): zero when A/B is missing
    or is a zero-MV ref-0 block, else the 16x16 prediction."""
    mb_h, mb_w = ref4.shape[0] // 4, ref4.shape[1] // 4
    refp, mvp = _pad_maps(ref4, mv4)
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    ref_a, mv_a = _gather(refp, mvp, gy, gx - 1)
    ref_b, mv_b = _gather(refp, mvp, gy - 1, gx)
    a_zero = (ref_a == 0) & jnp.all(mv_a == 0, axis=-1)
    b_zero = (ref_b == 0) & jnp.all(mv_b == 0, axis=-1)
    force0 = (ref_a == -2) | (ref_b == -2) | a_zero | b_zero
    mvp16 = predict_16x16(ref4, mv4)
    return jnp.where(force0[..., None], 0, mvp16)


def spatial_direct(ref4_l0, mv4_l0, ref4_l1, mv4_l1,
                   col_ref4, col_mv4):
    """Spatial-direct MV derivation for B_Direct_16x16 / B_SKIP
    (x264_mb_predict_mv_direct16x16_spatial, common/mb.c; spec
    8.4.1.2.2 with direct_8x8_inference_flag=1).

    ref4_*/mv4_*: the current B frame's final per-4x4 maps per list.
    col_ref4/col_mv4: the colocated maps of RefPicList1[0] (the future
    reference's L0 field).

    Returns per-MB grids: (dref0, dref1, dmv0, dmv1, uniform) where
    refs are in {-1, 0} (-1 = list unused; both-unavailable resolves
    to bi zero-MV per spec), and `uniform` is True when all four 8x8
    quadrants derive the SAME mv pair — the only configurations this
    encoder emits as direct (the decoder derives the general per-
    quadrant form)."""
    mb_h, mb_w = ref4_l0.shape[0] // 4, ref4_l0.shape[1] // 4
    big = jnp.int32(1 << 20)

    def list_ref_mv(ref4, mv4):
        refp, mvp = _pad_maps(ref4, mv4)
        ra, mva, rb, mvb, rc, mvc = _slots_16x16(refp, mvp, mb_h, mb_w)
        # unsigned MIN3 over neighbor refs (<0 sorts last)
        r = jnp.minimum(jnp.minimum(jnp.where(ra < 0, big, ra),
                                    jnp.where(rb < 0, big, rb)),
                        jnp.where(rc < 0, big, rc))
        ref = jnp.where(r >= big, -1, r).astype(I32)
        mv = _predict(ra, mva, rb, mvb, rc, mvc, ref)
        mv = jnp.where((ref >= 0)[..., None], mv, 0)
        return ref, mv

    dref0, dmv0 = list_ref_mv(ref4_l0, mv4_l0)
    dref1, dmv1 = list_ref_mv(ref4_l1, mv4_l1)
    both_neg = (dref0 < 0) & (dref1 < 0)
    dref0 = jnp.where(both_neg, 0, dref0)
    dref1 = jnp.where(both_neg, 0, dref1)
    dmv0 = jnp.where(both_neg[..., None], 0, dmv0)
    dmv1 = jnp.where(both_neg[..., None], 0, dmv1)

    # colocated low-motion override per 8x8 quadrant: corner 4x4 blocks
    # (direct_8x8_inference); refCol==0 and |mvCol| <= 1 qpel
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    zs = []
    for dy, dx in ((0, 0), (0, 3), (3, 0), (3, 3)):
        cr = col_ref4[gy + dy, gx + dx]
        cmv = col_mv4[gy + dy, gx + dx]
        zs.append((cr == 0)
                  & (jnp.abs(cmv[..., 0]) <= 1)
                  & (jnp.abs(cmv[..., 1]) <= 1))
    z = jnp.stack(zs)                     # (4, mb_h, mb_w)
    # the both-unavailable branch returns before the colocated loop
    z_all = z.all(0) & ~both_neg
    z_any = z.any(0) & ~both_neg
    mv0_chg = (dref0 == 0) & jnp.any(dmv0 != 0, axis=-1)
    mv1_chg = (dref1 == 0) & jnp.any(dmv1 != 0, axis=-1)
    would_change = mv0_chg | mv1_chg
    uniform = (~would_change) | z_all | (~z_any)
    dmv0 = jnp.where((z_all & (dref0 == 0))[..., None], 0, dmv0)
    dmv1 = jnp.where((z_all & (dref1 == 0))[..., None], 0, dmv1)
    return dref0, dref1, dmv0, dmv1, uniform


def predict_16x8(ref4, mv4, i_ref=0):
    """MVPs for the two 16x8 partitions (x264_mb_predict_mv D_16x8:
    part 0 takes B outright when refs match, part 1 takes A).
    Returns (mvp0, mvp1), each (mb_h, mb_w, 2)."""
    mb_h, mb_w = ref4.shape[0] // 4, ref4.shape[1] // 4
    refp, mvp = _pad_maps(ref4, mv4)
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)

    # part 0 (rows 0-1): A/B/C as 16x16
    ref_a, mv_a, ref_b, mv_b, ref_c, mv_c = \
        _slots_16x16(refp, mvp, mb_h, mb_w)
    med0 = _predict(ref_a, mv_a, ref_b, mv_b, ref_c, mv_c, i_ref)
    mvp0 = jnp.where((ref_b == i_ref)[..., None], mv_b, med0)

    # part 1 (rows 2-3): A = (gy+2, gx-1); B = (gy+1, gx) in-MB;
    # C slot is never written in raster order -> always D = (gy+1, gx-1)
    ref_a1, mv_a1 = _gather(refp, mvp, gy + 2, gx - 1)
    ref_b1, mv_b1 = _gather(refp, mvp, gy + 1, gx)
    ref_c1, mv_c1 = _gather(refp, mvp, gy + 1, gx - 1)
    med1 = _predict(ref_a1, mv_a1, ref_b1, mv_b1, ref_c1, mv_c1, i_ref)
    mvp1 = jnp.where((ref_a1 == i_ref)[..., None], mv_a1, med1)
    return mvp0, mvp1


def predict_8x16(ref4, mv4, i_ref=0):
    """MVPs for the two 8x16 partitions (x264_mb_predict_mv D_8x16:
    part 0 takes A outright when refs match, part 1 takes C).
    Returns (mvp0, mvp1)."""
    mb_h, mb_w = ref4.shape[0] // 4, ref4.shape[1] // 4
    refp, mvp = _pad_maps(ref4, mv4)
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)

    # part 0 (cols 0-1): A = (gy, gx-1); B = (gy-1, gx);
    # C = (gy-1, gx+2) (top MB interior), D = (gy-1, gx-1)
    ref_a, mv_a = _gather(refp, mvp, gy, gx - 1)
    ref_b, mv_b = _gather(refp, mvp, gy - 1, gx)
    ref_c, mv_c = _gather(refp, mvp, gy - 1, gx + 2)
    ref_d, mv_d = _gather(refp, mvp, gy - 1, gx - 1)
    use_d = ref_c == -2
    ref_c = jnp.where(use_d, ref_d, ref_c)
    mv_c = jnp.where(use_d[..., None], mv_d, mv_c)
    med0 = _predict(ref_a, mv_a, ref_b, mv_b, ref_c, mv_c, i_ref)
    mvp0 = jnp.where((ref_a == i_ref)[..., None], mv_a, med0)

    # part 1 (cols 2-3): A = (gy, gx+1) in-MB; B = (gy-1, gx+2);
    # C = the top-right slot (gy-1, gx+4), D = (gy-1, gx+1)
    ref_a1, mv_a1 = _gather(refp, mvp, gy, gx + 1)
    ref_b1, mv_b1 = _gather(refp, mvp, gy - 1, gx + 2)
    ref_c1, mv_c1 = _gather(refp, mvp, gy - 1, gx + 4)
    ref_d1, mv_d1 = _gather(refp, mvp, gy - 1, gx + 1)
    use_d1 = ref_c1 == -2
    ref_c1 = jnp.where(use_d1, ref_d1, ref_c1)
    mv_c1 = jnp.where(use_d1[..., None], mv_d1, mv_c1)
    med1 = _predict(ref_a1, mv_a1, ref_b1, mv_b1, ref_c1, mv_c1, i_ref)
    mvp1 = jnp.where((ref_c1 == i_ref)[..., None], mv_c1, med1)
    return mvp0, mvp1


def predict_p8x8(ref4, mv4, i_ref=0):
    """MVPs for the four 8x8 sub-blocks of a P_8x8 MB
    (x264_mb_predict_mv with i_width 2 at scan8 idx 0/2/8/10 — no
    directional early-outs for 8x8, pure median rule). In-MB neighbor
    reads hit earlier sub-blocks only (final maps == sequential cache);
    sub 3's C slot is never written in raster order -> always D.
    Returns a list of four (mb_h, mb_w, 2) arrays in quadrant order
    TL, TR, BL, BR."""
    mb_h, mb_w = ref4.shape[0] // 4, ref4.shape[1] // 4
    refp, mvp = _pad_maps(ref4, mv4)
    gy = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    out = []
    for k, (oy, ox) in enumerate(((0, 0), (0, 2), (2, 0), (2, 2))):
        by, bx = gy + oy, gx + ox
        ref_a, mv_a = _gather(refp, mvp, by, bx - 1)
        ref_b, mv_b = _gather(refp, mvp, by - 1, bx)
        ref_d, mv_d = _gather(refp, mvp, by - 1, bx - 1)
        if k == 3:
            ref_c, mv_c = ref_d, mv_d
        else:
            ref_c, mv_c = _gather(refp, mvp, by - 1, bx + 2)
            use_d = ref_c == -2
            ref_c = jnp.where(use_d, ref_d, ref_c)
            mv_c = jnp.where(use_d[..., None], mv_d, mv_c)
        out.append(_predict(ref_a, mv_a, ref_b, mv_b, ref_c, mv_c,
                            i_ref))
    return out
