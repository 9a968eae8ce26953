"""Motion compensation: half-pel plane filtering and batched sub-pel
block fetches (common/mc.c).

The reference precomputes three half-pel-filtered copies of every
reconstructed reference plane (hpel_filter, common/mc.c:133-155) and
serves any quarter-pel position as the rounding average of two plane
samples (mc_luma + hpel_ref0/1 tables, common/mc.c:157-186) — which is
exactly the spec 8.4.2.2 interpolation. We keep that design because it
maps perfectly to TPU: the three plane filters are dense whole-plane
stencils (MXU/VPU friendly), and per-block MC becomes two gathers + an
average, batched over arbitrarily many (block, candidate) pairs for ME.

Frames are padded by PAD=32 edge-replicated pixels (PADH/PADV,
common/frame.h:27-31); edge replication is equivalent to the spec's
per-tap coordinate clamping, so MVs may point up to PAD-8 pixels outside
the picture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32

PAD = 32          # luma padding; chroma uses PAD // 2

# qpel phase -> source planes (common/mc.c:157-158); plane order:
# 0 = fpel, 1 = h (horizontal half), 2 = v (vertical half), 3 = c (center).
# _HPEL_REF1 is pre-fixed so that phases with no averaging (qpel_idx&5==0)
# average a sample with itself.
_HPEL_REF0 = np.array([0, 1, 1, 1, 0, 1, 1, 1, 2, 3, 3, 3, 0, 1, 1, 1],
                      dtype=np.int32)
_r1 = np.array([0, 0, 0, 0, 2, 2, 3, 2, 2, 2, 3, 2, 2, 2, 3, 2],
               dtype=np.int32)
_HPEL_REF1 = np.where(np.arange(16) & 5, _r1, _HPEL_REF0).astype(np.int32)


def pad_plane(plane, pad=PAD):
    """Edge-replicate (x264_frame_expand_border, common/frame.c:240)."""
    return jnp.pad(plane, pad, mode="edge")


def _tap6(a, axis):
    """Unrounded 6-tap (1,-5,20,20,-5,1) at half positions along `axis`;
    output length shrinks by 5."""
    def s(k, ln):
        return jax.lax.slice_in_dim(a, k, k + ln, axis=axis)

    ln = a.shape[axis] - 5
    return (s(0, ln) + s(5, ln)
            - 5 * (s(1, ln) + s(4, ln))
            + 20 * (s(2, ln) + s(3, ln)))


def hpel_planes(padded):
    """(Hp, Wp) padded plane -> (4, Hp, Wp) stack [fpel, h, v, c]
    (hpel_filter, common/mc.c:133-155; spec 8.4.2.2.1)."""
    p = jnp.pad(padded.astype(I32), 3, mode="edge")
    hp, wp = padded.shape
    # horizontal half positions (x + 0.5): taps x-2..x+3
    h_full = _tap6(p, 1)[3:3 + hp, 1:1 + wp]
    h = jnp.clip((h_full + 16) >> 5, 0, 255)
    # vertical half positions (y + 0.5), kept unrounded for the c plane;
    # extended in x so the horizontal tap over it is valid everywhere
    v_ext = _tap6(p, 0)[1:1 + hp]                 # (hp, wp + 6)
    v = jnp.clip((v_ext[:, 3:3 + wp] + 16) >> 5, 0, 255)
    c_full = _tap6(v_ext, 1)[:, 1:1 + wp]
    c = jnp.clip((c_full + 512) >> 10, 0, 255)
    return jnp.stack([padded.astype(I32), h, v, c])


def mc_luma(planes, ys, xs, mvs, bh: int, bw: int, ref_sel=None):
    """Batched quarter-pel luma fetch (mc_luma, common/mc.c:160).

    planes: (4, Hp, Wp) from hpel_planes — or, with `ref_sel`, a
    (4*n_refs, Hp, Wp) concatenation of per-reference hpel stacks and
    ref_sel a (...,) per-block reference index (the multi-ref fetch of
    x264_mb_mc, common/macroblock.c:1122: the plane set is chosen per
    partition by ref_idx). ys/xs: (...,) block top-left in unpadded
    frame coords. mvs: (..., 2) quarter-pel (x, y). Returns
    (..., bh, bw) int32 prediction."""
    mvx, mvy = mvs[..., 0], mvs[..., 1]
    fx, fy = mvx & 3, mvy & 3
    qidx = (fy << 2) + fx
    iy = ys + (mvy >> 2) + PAD
    ix = xs + (mvx >> 2) + PAD
    p0 = jnp.asarray(_HPEL_REF0)[qidx]
    p1 = jnp.asarray(_HPEL_REF1)[qidx]
    if ref_sel is not None:
        p0 = p0 + 4 * ref_sel
        p1 = p1 + 4 * ref_sel
    r0 = iy + (fy == 3)
    c1 = ix + (fx == 3)
    shape = qidx.shape

    def fetch(pl, base_y, base_x):
        # vmapped dynamic_slice = batched block DMA (much faster than an
        # element gather on TPU)
        def one(p, y0, x0):
            return jax.lax.dynamic_slice(planes, (p, y0, x0),
                                         (1, bh, bw))[0]

        out = jax.vmap(one)(pl.reshape(-1), base_y.reshape(-1),
                            base_x.reshape(-1))
        return out.reshape(*shape, bh, bw)

    a = fetch(p0, r0, ix)
    b = fetch(p1, iy, c1)
    return (a + b + 1) >> 1


def mc_chroma(padded, ys, xs, mvs, bh: int, bw: int, ref_sel=None):
    """Batched 1/8-pel bilinear chroma fetch (mc_chroma,
    common/mc.c:205). padded: chroma plane padded by PAD//2 — or, with
    `ref_sel`, a (n_refs, Hc, Wc) stack of padded planes with ref_sel a
    (...,) per-block reference index; ys/xs block top-left in unpadded
    chroma coords; mvs: (..., 2) — the luma quarter-pel MV
    reinterpreted as chroma eighth-pel."""
    cpad = PAD // 2
    mvx, mvy = mvs[..., 0], mvs[..., 1]
    d8x, d8y = mvx & 7, mvy & 7
    iy = ys + (mvy >> 3) + cpad
    ix = xs + (mvx >> 3) + cpad

    ca = ((8 - d8x) * (8 - d8y))[..., None, None]
    cb = (d8x * (8 - d8y))[..., None, None]
    cc = ((8 - d8x) * d8y)[..., None, None]
    cd = (d8x * d8y)[..., None, None]

    shape = iy.shape

    if ref_sel is None:
        def one(y0, x0):
            return jax.lax.dynamic_slice(padded, (y0, x0),
                                         (bh + 1, bw + 1))

        s = jax.vmap(one)(iy.reshape(-1), ix.reshape(-1))
    else:
        def one_r(r0, y0, x0):
            return jax.lax.dynamic_slice(padded, (r0, y0, x0),
                                         (1, bh + 1, bw + 1))[0]

        s = jax.vmap(one_r)(ref_sel.reshape(-1), iy.reshape(-1),
                            ix.reshape(-1))
    s = s.reshape(*shape, bh + 1, bw + 1)
    s00 = s[..., :bh, :bw]
    s01 = s[..., :bh, 1:]
    s10 = s[..., 1:, :bw]
    s11 = s[..., 1:, 1:]
    return (ca * s00 + cb * s01 + cc * s10 + cd * s11 + 32) >> 6


def avg(a, b):
    """Rounding average (pixel_avg, common/mc.c:34; bipred weight 32)."""
    return (a + b + 1) >> 1


def weighted_avg(a, b, w1):
    """Implicit weighted bipred (pixel_avg_weight_wxh, common/mc.c:69):
    log2_denom 5, w1 + w2 = 64."""
    return jnp.clip((a * w1 + b * (64 - w1) + 32) >> 6, 0, 255)
