"""Lowres lookahead costs — encoder/slicetype.c re-expressed for TPU.

The reference runs per-MB HEX motion search on half-resolution planes to
estimate frame coding costs (x264_slicetype_mb_cost,
encoder/slicetype.c:43-256): per 8x8 lowres block it takes
min(inter ME cost, intra prediction cost), sums interior blocks into
i_cost_est, and the scenecut/frame-type logic consumes the sums
(scenecut, slicetype.c:437-474).

TPU re-expression: the per-block HEX walk becomes one dense batched
search — every (dx, dy) in the window is a whole-plane shift + per-8x8
SAD reduction (pure VPU work, no gathers), and the intra ladder becomes
three batched predictions (DC/H/V) scored with SATD. One jitted program
returns the per-block cost planes; the host keeps only the sums.

Cost model mirrored from the reference:
  - inter: SAD + mv-bit cost, -2 skip adjust, +5 if mv != 0
    (slicetype.c:168-172)
  - intra: min-mode SATD + 5 intra penalty (slicetype.c:196-231)
  - per-block cost = min(inter, intra); only interior blocks counted
    (slicetype.c:243-247)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import pixel as opix
from ..ops import me as ome

I32 = jnp.int32

INTRA_PENALTY = 5   # slicetype.c:196 intra_penalty
NONZERO_MV_PENALTY = 5   # slicetype.c:170-171 (cost -= 2; += 5 if mv)


@jax.jit
def lowres_plane(y):
    """Half-res downsample by 2x2 mean (x264_frame_init_lowres,
    common/mc.c:306-357). y: (H, W) uint8 -> (H//2, W//2) int32."""
    h, w = y.shape
    p = y[: h & ~1, : w & ~1].astype(I32)
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
            + p[1::2, 1::2] + 2) >> 2


@functools.partial(jax.jit, static_argnums=(1, 2))
def lowres_planes_flat(yflat, h: int, w: int):
    """lowres_planes over a flat uint8 plane (2-D h2d pays a ~50x
    layout tax on tunneled devices; reshape on device is free)."""
    return lowres_planes(yflat.reshape(h, w))


@jax.jit
def lowres_planes(y):
    """All four phase-shifted lowres planes (x264_frame_init_lowres,
    common/mc.c:306-357): plane[2*pv+ph](i, j) averages the fullres 2x2
    at (2i+pv, 2j+ph), so a 1-fullres-pixel shift — a lowres *half*
    pixel — is exact, not interpolated.

    y: (H, W) uint8 -> (4, H//2, W//2) int32, order [00, 0h, v0, vh].
    """
    h, w = y.shape
    p = y[: h & ~1, : w & ~1].astype(I32)
    pp = jnp.pad(p, ((0, 1), (0, 1)), mode="edge")

    def ds(pv, ph):
        q = pp[pv:pv + (h & ~1), ph:ph + (w & ~1)]
        return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                + q[1::2, 1::2] + 2) >> 2

    return jnp.stack([ds(0, 0), ds(0, 1), ds(1, 0), ds(1, 1)])


def _pad8(low, bh, bw):
    """Edge-pad a lowres plane to (bh*8, bw*8)."""
    h, w = low.shape
    return jnp.pad(low, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")


@functools.partial(jax.jit, static_argnums=(1, 2))
def intra_cost_plane(low, bh: int, bw: int):
    """Per-8x8-block lowres intra cost: min(DC, H, V) SATD + penalty
    (the 8x8c prediction ladder of slicetype.c:196-231; DC/H/V are the
    dominant modes — plane adds little for a cost estimate).

    low: (h, w) int32 lowres plane. Returns (bh, bw) int32.
    """
    p = _pad8(low, bh, bw)
    tiles = p.reshape(bh, 8, bw, 8).swapaxes(1, 2)       # (bh,bw,8,8)

    # neighbor pixels: row above each block / column left of each block
    top = jnp.roll(p, 1, axis=0)[0::8]                    # (bh, w)
    top = top.reshape(bh, bw, 8)
    left = jnp.roll(p, 1, axis=1)[:, 0::8]                # (h, bw)
    left = left.reshape(bh, 8, bw).swapaxes(1, 2)         # (bh,bw,8)
    has_top = (jnp.arange(bh) > 0)[:, None, None]
    has_left = (jnp.arange(bw) > 0)[None, :, None]

    tsum = top.sum(-1, keepdims=True)
    lsum = left.sum(-1, keepdims=True)
    both = (tsum + lsum + 8) >> 4
    dc = jnp.where(has_top & has_left, both,
                   jnp.where(has_top, (tsum + 4) >> 3,
                             jnp.where(has_left, (lsum + 4) >> 3, 128)))
    pred_dc = jnp.broadcast_to(dc[..., None], tiles.shape)
    pred_v = jnp.broadcast_to(top[:, :, None, :], tiles.shape)
    pred_h = jnp.broadcast_to(left[:, :, :, None], tiles.shape)

    s_dc = opix.satd(tiles, pred_dc)
    s_v = jnp.where(jnp.squeeze(has_top, -1), opix.satd(tiles, pred_v),
                    jnp.int32(1 << 28))
    s_h = jnp.where(jnp.squeeze(has_left, -1), opix.satd(tiles, pred_h),
                    jnp.int32(1 << 28))
    return jnp.minimum(s_dc, jnp.minimum(s_v, s_h)) + INTRA_PENALTY


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def inter_cost_plane(low, ref_planes, bh: int, bw: int, r: int):
    """Per-8x8-block lowres inter cost: dense full-pel search over
    (2r+1)^2 displacements (the HEX walk of x264_me_search collapsed to
    its exhaustive endpoint), then a half-pel SATD re-score over the
    winner's 3x3 neighborhood through the exact phase planes
    (slicetype.c:43-185; subpel via lowres[1..3] like the reference's
    lowres hpel search).

    low: (h, w) current plane-0. ref_planes: (4, h, w) phase planes of
    the reference. Returns (cost (bh, bw) int32,
    mv (bh, bw, 2) half-pel lowres units).
    """
    cur = _pad8(low, bh, bw)
    H, W = bh * 8, bw * 8
    refs = jnp.stack([jnp.pad(_pad8(ref_planes[k], bh, bw), r, mode="edge")
                      for k in range(4)])
    ref0 = refs[0]
    dxs = jnp.arange(-r, r + 1, dtype=I32)

    def sad_row(_, dy):
        rows = jax.lax.dynamic_slice(ref0, (r + dy, 0), (H, W + 2 * r))

        def sad_dx(dx):
            s = jax.lax.dynamic_slice(rows, (0, r + dx), (H, W))
            d = jnp.abs(cur - s)
            return d.reshape(bh, 8, bw, 8).sum(axis=(1, 3))

        return None, jax.vmap(sad_dx)(dxs)

    _, sads = jax.lax.scan(sad_row, None, dxs)   # (dy, dx, bh, bw)

    cand = jnp.stack(jnp.meshgrid(dxs, dxs, indexing="xy"), axis=-1)
    cand = cand.reshape(-1, 2)                   # (NC, 2) (dx, dy)
    bits = ome.se_bits(cand[:, 0]) + ome.se_bits(cand[:, 1])
    nz = jnp.any(cand != 0, axis=-1)
    penalty = bits - 2 + jnp.where(nz, NONZERO_MV_PENALTY, 0)
    cost = sads.reshape(-1, bh, bw) + penalty[:, None, None]
    best = jnp.argmin(cost, axis=0)
    mv_fp = cand[best]                           # (bh, bw, 2) fullpel
    pen = jnp.take_along_axis(penalty[:, None, None]
                              * jnp.ones((1, bh, bw), I32),
                              best[None], axis=0)[0]

    # half-pel 3x3 SATD re-score (units: SATD, matching the intra plane).
    # All 9 half-pel offsets read inside ONE (4, 9, 9) window per block
    # anchored at full-pel (mv - 1): the phase plane (oy&1, ox&1) and the
    # in-window offset ((o>>1)+1) are static per candidate, so the fetch
    # is a single vmapped dynamic_slice — no element gathers.
    cur_tiles = cur.reshape(bh, 8, bw, 8).swapaxes(1, 2)
    by = (jnp.arange(bh, dtype=I32)[:, None] * 8
          + mv_fp[..., 1] - 1 + r).reshape(-1)
    bx = (jnp.arange(bw, dtype=I32)[None, :] * 8
          + mv_fp[..., 0] - 1 + r).reshape(-1)

    def one(y0, x0):
        return jax.lax.dynamic_slice(refs, (0, y0, x0), (4, 9, 9))

    win = jax.vmap(one)(by, bx).reshape(bh, bw, 4, 9, 9)
    best_cost = best_mv = None
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            plane = (oy & 1) * 2 + (ox & 1)
            r0, c0 = (oy >> 1) + 1, (ox >> 1) + 1
            tiles = win[:, :, plane, r0:r0 + 8, c0:c0 + 8]
            c = opix.satd(cur_tiles, tiles) + pen
            mv = jnp.stack([mv_fp[..., 0] * 2 + ox,
                            mv_fp[..., 1] * 2 + oy], axis=-1)
            if best_cost is None:
                best_cost, best_mv = c, mv
            else:
                upd = c < best_cost
                best_cost = jnp.where(upd, c, best_cost)
                best_mv = jnp.where(upd[..., None], mv, best_mv)
    return best_cost, best_mv


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def frame_costs_fused(lows, prev_planes, bh: int, bw: int, r: int):
    """One jitted program: intra plane + inter plane + interior sums.
    Returns a length-2 int32 array [icost_sum, pcost_sum] so the host
    pays a single small d2h (per-transfer latency dominates on tunneled
    devices)."""
    low = lows[0]
    icost = intra_cost_plane(low, bh, bw)
    pcost, _mv = inter_cost_plane(low, prev_planes, bh, bw, r)
    inner = (slice(1, -1), slice(1, -1)) if min(icost.shape) > 2 \
        else (slice(None), slice(None))
    ic = icost[inner]
    isum = ic.sum()
    psum = jnp.minimum(pcost[inner], ic).sum()
    return jnp.stack([isum, psum])


@functools.partial(jax.jit, static_argnums=(1, 2, 5, 6, 7))
def analyse_fused(yflat, h: int, w: int, prev_planes, have_prev,
                  bh: int, bw: int, r: int):
    """Whole lookahead step as ONE dispatch: flat-plane reshape, the 4
    phase lowres planes, and (when a previous frame exists) the fused
    intra/inter cost sums. Returns (lows, sums[2])."""
    lows = lowres_planes(yflat.reshape(h, w))
    if have_prev is None:
        icost = intra_cost_plane(lows[0], bh, bw)
        inner = (slice(1, -1), slice(1, -1)) if min(icost.shape) > 2 \
            else (slice(None), slice(None))
        s = icost[inner].sum()
        return lows, jnp.stack([s, s])
    return lows, frame_costs_fused(lows, prev_planes, bh, bw, r)


def frame_cost_sums(icost, pcost=None):
    """Interior-block sums (slicetype.c:243-247 excludes the border ring
    from i_cost_est). Returns (icost_sum, pcost_sum)."""
    inner = (slice(1, -1), slice(1, -1)) if min(icost.shape) > 2 \
        else (slice(None), slice(None))
    ic = icost[inner]
    isum = int(ic.sum())
    if pcost is None:
        return isum, isum
    pc = jnp.minimum(pcost[inner], ic)
    return isum, int(pc.sum())


# ---------------------------------------------------------------- b-adapt
# x264_slicetype_analyse B_ADAPT_FAST greedy (slicetype.c:545-573):
# untuned constants from the reference
INTER_THRESH = 300


def _fetch_blocks(planes, mv_hp, bh: int, bw: int, r: int):
    """(bh, bw, 8, 8) predicted blocks at half-pel lowres MVs through
    the exact phase planes (same trick as the re-score window)."""
    m = r + 1
    refs = jnp.stack([jnp.pad(_pad8(planes[k], bh, bw), m, mode="edge")
                      for k in range(4)])
    mvx, mvy = mv_hp[..., 0], mv_hp[..., 1]
    fx, fy = mvx >> 1, mvy >> 1          # arithmetic shift floors
    phase = (mvy & 1) * 2 + (mvx & 1)
    by = (jnp.arange(bh, dtype=I32) * 8)[:, None] \
        + jnp.clip(fy, -r, r) + m
    bx = (jnp.arange(bw, dtype=I32) * 8)[None, :] \
        + jnp.clip(fx, -r, r) + m

    def one(p, y0, x0):
        return jax.lax.dynamic_slice(refs, (p, y0, x0), (1, 8, 8))[0]

    return jax.vmap(one)(phase.reshape(-1), by.reshape(-1),
                         bx.reshape(-1)).reshape(bh, bw, 8, 8)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def badapt_first_fused(lows1, lows2, planes0, bh: int, bw: int, r: int):
    """The 4-cost first-B test (slicetype.c:546-556) as one program.

    lows1/lows2: phase planes of the first queued candidate and the
    newly arrived frame; planes0: phase planes of the last non-B
    reference. The B cost includes the bidirectional average candidate
    (x264_slicetype_mb_cost bi branch, slicetype.c:120-150) — the term
    that makes Bs strictly win on noisy content by averaging the two
    references' noise. Returns int32 [cost1p0, cost2p0, cost1b1,
    cost2p1, n_intra2] (interior sums; n_intra2 = blocks of frame2
    that go intra when predicted across the 2-gap)."""
    low1, low2 = lows1[0], lows2[0]
    i1 = intra_cost_plane(low1, bh, bw)
    i2 = intra_cost_plane(low2, bh, bw)
    c10, mv10 = inter_cost_plane(low1, planes0, bh, bw, r)
    c12, mv12 = inter_cost_plane(low1, lows2, bh, bw, r)
    c21, _ = inter_cost_plane(low2, lows1, bh, bw, r)
    c20, _ = inter_cost_plane(low2, planes0, bh, bw, r)
    # bi candidate: average of the two lists' best predictions
    pa = _fetch_blocks(planes0, mv10, bh, bw, r)
    pb = _fetch_blocks(lows2, mv12, bh, bw, r)
    cur1 = _pad8(low1, bh, bw).reshape(bh, 8, bw, 8).swapaxes(1, 2)
    pen = (ome.se_bits(mv10[..., 0]) + ome.se_bits(mv10[..., 1])
           + ome.se_bits(mv12[..., 0]) + ome.se_bits(mv12[..., 1]))
    bi = opix.satd(cur1, (pa + pb + 1) >> 1) + pen
    inner = (slice(1, -1), slice(1, -1)) if min(bh, bw) > 2 \
        else (slice(None), slice(None))
    cost1p0 = jnp.minimum(c10, i1)[inner].sum()
    cost2p0 = jnp.minimum(c21, i2)[inner].sum()
    cost2p1 = jnp.minimum(c20, i2)[inner].sum()
    cost1b1 = jnp.minimum(jnp.minimum(jnp.minimum(c10, c12), bi),
                          i1)[inner].sum()
    n_intra2 = (i2 < c20)[inner].sum()
    return jnp.stack([cost1p0, cost2p0, cost1b1, cost2p1,
                      n_intra2]).astype(I32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def badapt_ext_fused(lows_f, planes0, bh: int, bw: int, r: int):
    """Run-extension test (slicetype.c:563-572): P cost of the new
    frame across the whole would-be span + its intra share. Returns
    int32 [pcost_sum, n_intra, n_blocks]."""
    low = lows_f[0]
    i_ = intra_cost_plane(low, bh, bw)
    c, _ = inter_cost_plane(low, planes0, bh, bw, r)
    inner = (slice(1, -1), slice(1, -1)) if min(bh, bw) > 2 \
        else (slice(None), slice(None))
    pc = jnp.minimum(c, i_)[inner]
    return jnp.stack([pc.sum(), (i_ < c)[inner].sum(),
                      jnp.int32(pc.size)]).astype(I32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def b_seed_mvs_fused(lows_b, planes_l0, planes_l1, bh: int, bw: int,
                     r: int):
    """Lowres MV fields of a B candidate against both reference lists
    (the slicetype.c:153-166 lowres seeding trick): one lowres 8x8
    block == one fullres MB, and a lowres half-pel unit == one fullres
    pel, so mv*4 seeds the fullres qpel search directly. Returns
    (mv_l0, mv_l1), each (bh, bw, 2) int32 in fullres qpel units."""
    low = lows_b[0]
    _, mv0 = inter_cost_plane(low, planes_l0, bh, bw, r)
    _, mv1 = inter_cost_plane(low, planes_l1, bh, bw, r)
    # mv is in lowres half-pel units; one lowres half-pel step is one
    # fullres pel = 4 qpel units
    return mv0 * 4, mv1 * 4


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def b_cost_fused(lows_b, planes_l0, planes_l1, bh: int, bw: int,
                 r: int):
    """Estimated cost pair for the b-adapt-2 path search
    (x264_slicetype_path_cost's frame_cost terms, slicetype.c:360-434):
    [cost as a B between l0/l1 (incl. the bi-average candidate),
    cost as a P from l0] — interior sums, one program."""
    low = lows_b[0]
    i_ = intra_cost_plane(low, bh, bw)
    c0, mv0 = inter_cost_plane(low, planes_l0, bh, bw, r)
    c1, mv1 = inter_cost_plane(low, planes_l1, bh, bw, r)
    pa = _fetch_blocks(planes_l0, mv0, bh, bw, r)
    pb = _fetch_blocks(planes_l1, mv1, bh, bw, r)
    cur = _pad8(low, bh, bw).reshape(bh, 8, bw, 8).swapaxes(1, 2)
    pen = (ome.se_bits(mv0[..., 0]) + ome.se_bits(mv0[..., 1])
           + ome.se_bits(mv1[..., 0]) + ome.se_bits(mv1[..., 1]))
    bi = opix.satd(cur, (pa + pb + 1) >> 1) + pen
    inner = (slice(1, -1), slice(1, -1)) if min(bh, bw) > 2 \
        else (slice(None), slice(None))
    bcost = jnp.minimum(jnp.minimum(c0, c1),
                        jnp.minimum(bi, i_))[inner].sum()
    pcost = jnp.minimum(c0, i_)[inner].sum()
    return jnp.stack([bcost, pcost]).astype(I32)
