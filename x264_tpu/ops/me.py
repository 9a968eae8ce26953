"""Motion estimation (encoder/me.c re-expressed for TPU).

The reference walks DIA/HEX/UMH/ESA candidate patterns sequentially per
macroblock (x264_me_search_ref, encoder/me.c:156). On TPU the idiomatic
form is the ESA endpoint evaluated *densely for every macroblock at
once*: for each displacement (dx, dy) in the search window, the whole
frame is shifted and |cur - ref| is reduced per MB tile — no gathers,
pure VPU work, and the cost surface for all MBs falls out of one scan.
Sub-pel refinement (refine_subpel, encoder/me.c:680) becomes two batched
3x3 evaluations (half-pel then quarter-pel) through the hpel-plane fetch
of ops/mc.py, scored with SATD like the reference's subme>=2 ladder.

MV cost is lambda * (se-Golomb bit length of each mvd component)
(x264_mb_analyse_load_costs LUT semantics, encoder/analyse.c:182),
taken against a per-MB predictor supplied by the caller (the caller uses
the previous frame's MV field, mirroring the lookahead's
previous-frame-predictor trick, encoder/slicetype.c:153-166 — the exact
median predictor is only known after all MVs are final).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import mc as omc
from . import pixel as opix

I32 = jnp.int32


def se_bits(v):
    """Bit length of the signed Exp-Golomb code of v (bs_size_se)."""
    m = jnp.where(v > 0, 2 * v - 1, -2 * v).astype(I32)
    n = m + 1
    bl = jnp.zeros_like(n)
    for shift in (16, 8, 4, 2, 1):
        ge = n >= (1 << shift)
        bl = bl + jnp.where(ge, shift, 0)
        n = jnp.where(ge, n >> shift, n)
    return 2 * (bl + 1) - 1


def mv_cost_bits(mv, mvp):
    """Total se-Golomb bits of the mvd (both components), qpel units."""
    d = mv - mvp
    return se_bits(d[..., 0]) + se_bits(d[..., 1])


def fullpel_search(cur, ref_pad, mb_h: int, mb_w: int, me_range: int,
                   lam, mvp_qpel, pad: int = omc.PAD):
    """Exhaustive full-pel search over (2R+1)^2 displacements for every
    16x16 MB simultaneously.

    cur: (mb_h*16, mb_w*16) int32. ref_pad: edge-padded reference fpel
    plane (H+2*pad, W+2*pad). mvp_qpel: (mb_h, mb_w, 2) qpel predictor
    for the lambda*bits MV cost. Returns (mv_qpel, sad): best full-pel MV
    per MB in qpel units (mb_h, mb_w, 2) and its SAD.
    """
    H, W = mb_h * 16, mb_w * 16
    R = me_range
    dxs = jnp.arange(-R, R + 1, dtype=I32)
    cur = cur.astype(I32)

    def sad_row(_, dy):
        rows = jax.lax.dynamic_slice(ref_pad, (pad + dy, 0),
                                     (H, W + 2 * pad)).astype(I32)

        def sad_dx(dx):
            s = jax.lax.dynamic_slice(rows, (0, pad + dx), (H, W))
            d = jnp.abs(cur - s)
            return d.reshape(mb_h, 16, mb_w, 16).sum(axis=(1, 3))

        return None, jax.vmap(sad_dx)(dxs)       # (2R+1, mb_h, mb_w)

    _, sads = jax.lax.scan(sad_row, None, dxs)   # (dy, dx, mb_h, mb_w)

    cand = jnp.stack(jnp.meshgrid(dxs, dxs, indexing="xy"), axis=-1)
    # meshgrid(xy): cand[dyi, dxi] = (dx, dy); sads is [dyi, dxi]
    cand_q = cand.reshape(-1, 2) * 4                      # (NC, 2) qpel
    bits = mv_cost_bits(cand_q[:, None, None, :], mvp_qpel[None])
    cost = sads.reshape(-1, mb_h, mb_w) + lam * bits
    best = jnp.argmin(cost, axis=0)                       # (mb_h, mb_w)
    mv = cand_q[best]
    sad = jnp.take_along_axis(
        sads.reshape(-1, mb_h, mb_w), best[None], axis=0)[0]
    return mv, sad



def _win_slices(arr2d, by, bx, wy: int, wx: int):
    """Per-MB window extraction via vmapped dynamic_slice (lowered to
    batched block DMA — measured ~7x faster than an advanced-indexing
    element gather on TPU). by/bx: (...,) start coords (clamped by
    dynamic_slice semantics). Returns (..., wy, wx)."""
    shape = by.shape

    def one(y0, x0):
        return jax.lax.dynamic_slice(arr2d, (y0, x0), (wy, wx))

    out = jax.vmap(one)(by.reshape(-1), bx.reshape(-1))
    return out.reshape(*shape, wy, wx)


def _win_slices_planes(planes, pl, by, bx, wy: int, wx: int):
    """Like _win_slices but with a per-window plane index into a
    (P, H, W) stack."""
    shape = by.shape

    def one(p0, y0, x0):
        return jax.lax.dynamic_slice(planes, (p0, y0, x0),
                                     (1, wy, wx))[0]

    out = jax.vmap(one)(pl.reshape(-1), by.reshape(-1), bx.reshape(-1))
    return out.reshape(*shape, wy, wx)


def _half_plane(p):
    """2x downsample by 2x2 mean (the lowres filter of
    x264_frame_init_lowres, common/mc.c:306)."""
    h, w = p.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    q = p[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2)
    return (q.sum(axis=(1, 3)) + 2) >> 2


def hier_search(cur, ref_pad, mb_h: int, mb_w: int, me_range: int,
                lam, mvp_qpel, pad: int = omc.PAD):
    """Hierarchical full-pel search: dense coarse search at quarter
    resolution, then windowed full-res refinement around (a) the
    upscaled coarse winner, (b) the MV predictor, (c) the zero MV.

    This is the UMH insight (multi-stage: coarse grid then local
    refinement, encoder/me.c:307-447) re-expressed densely: the coarse
    stage is an exhaustive shifted-plane SAD at 1/4 the pixel count,
    and each refinement window is ONE gather per MB followed by a
    candidate-batched SAD — so the full-range (2R+1)^2 cost surface
    collapses to ~83 full-res candidate evaluations.

    Same signature/returns as fullpel_search: (mv_qpel, sad).
    """
    H, W = mb_h * 16, mb_w * 16
    R = me_range
    cur = cur.astype(I32)
    cur_tiles = cur.reshape(mb_h, 16, mb_w, 16).swapaxes(1, 2)

    # ---- stage 1: dense coarse search on half-res planes
    ref_q = _half_plane(ref_pad[pad:pad + H, pad:pad + W].astype(I32))
    cur_q = _half_plane(cur)
    rq = min((R + 1) // 2 + 1, pad // 2)
    Hq, Wq = H // 2, W // 2
    ref_qp = jnp.pad(ref_q, rq, mode="edge")
    dqs = jnp.arange(-rq, rq + 1, dtype=I32)

    def sad_row(_, dy):
        rows = jax.lax.dynamic_slice(ref_qp, (rq + dy, 0),
                                     (Hq, Wq + 2 * rq))

        def sad_dx(dx):
            s = jax.lax.dynamic_slice(rows, (0, rq + dx), (Hq, Wq))
            d = jnp.abs(cur_q - s)
            return d.reshape(mb_h, 8, mb_w, 8).sum(axis=(1, 3))

        return None, jax.vmap(sad_dx)(dqs)

    _, sads_q = jax.lax.scan(sad_row, None, dqs)
    cand_q = jnp.stack(jnp.meshgrid(dqs, dqs, indexing="xy"), axis=-1)
    cand_q = cand_q.reshape(-1, 2)
    # small bias toward the predictor keeps coarse ties stable
    bits_q = mv_cost_bits(cand_q[:, None, None, :] * 8, mvp_qpel[None])
    cost_q = sads_q.reshape(-1, mb_h, mb_w) * 4 + lam * bits_q
    best_q = jnp.argmin(cost_q, axis=0)
    mv_coarse = cand_q[best_q] * 2                  # (mb_h, mb_w, 2) fpel

    # ---- stage 2: windowed full-res refinement
    ys = jnp.arange(mb_h, dtype=I32)[:, None] * 16 \
        + jnp.zeros((1, mb_w), I32)
    xs = jnp.arange(mb_w, dtype=I32)[None, :] * 16 \
        + jnp.zeros((mb_h, 1), I32)

    def window_sads(center, m):
        """SADs of all (2m+1)^2 candidates around per-MB centers via one
        gather + a candidate-batched reduction (vectorized so the HLO
        stays small). center: (mb_h, mb_w, 2) fullpel.
        Returns (sads (NC, mb_h, mb_w), mvs (NC, mb_h, mb_w, 2))."""
        c = jnp.clip(center, -min(R, pad - m - 1), min(R, pad - m - 1))
        wn = 16 + 2 * m
        by = ys + c[..., 1] - m + pad
        bx = xs + c[..., 0] - m + pad
        win = _win_slices(ref_pad, by, bx, wn, wn).astype(I32)
        # per-candidate slice + immediate reduction: nothing the size of
        # a candidate stack is ever materialized (a stacked formulation
        # costs ~NC x frame of HBM traffic and dominated the search)
        sads = jnp.stack(
            [jnp.abs(cur_tiles - win[..., oy:oy + 16, ox:ox + 16])
             .sum(axis=(-2, -1))
             for oy in range(2 * m + 1) for ox in range(2 * m + 1)])
        offs = jnp.asarray([(ox, oy)
                            for oy in range(-m, m + 1)
                            for ox in range(-m, m + 1)], dtype=I32)
        mvs = c[None] + offs[:, None, None, :]
        return sads, mvs

    s1, m1 = window_sads(mv_coarse, 3)
    s2, m2 = window_sads((mvp_qpel + 2) >> 2, 2)
    s3, m3 = window_sads(jnp.zeros_like(mv_coarse), 1)
    sads = jnp.concatenate([s1, s2, s3], axis=0)     # (NC, mb_h, mb_w)
    mvq = jnp.concatenate([m1, m2, m3], axis=0) * 4
    cost = sads + lam * mv_cost_bits(mvq, mvp_qpel[None])
    best = jnp.argmin(cost, axis=0)
    best_mv = jnp.take_along_axis(
        mvq, best[None, ..., None], axis=0)[0]
    best_sad = jnp.take_along_axis(sads, best[None], axis=0)[0]
    return best_mv, best_sad


def subpel_refine_blocks(cur_blocks, planes, mv_qpel, lam, mvp_qpel,
                         ys, xs, bh: int = 16, bw: int = 16,
                         steps=(2, 1), ref_sel=None):
    """Batched sub-pel refinement for arbitrary-size blocks
    (refine_subpel, encoder/me.c:680), SATD-scored over the full qpel
    neighborhood of the full-pel optimum.

    Because `mv_qpel` comes from a full-pel search, every candidate's
    sub-pel phase is the *same for all blocks*: one window gather per
    hpel plane around each block's full-pel position suffices, and all
    candidate predictions become dense static slices of it (the
    hpel_ref0/1 plane-average scheme of mc_luma with static phases) —
    no per-candidate gathers.

    cur_blocks: (..., bh, bw); planes: (4, Hp, Wp) hpel stack — or,
    with `ref_sel` (a (...,) per-block reference index), a
    (4*n_refs, Hp, Wp) concatenation of per-reference hpel stacks;
    ys/xs: (...) block top-left pixel coords; mv_qpel: (..., 2)
    full-pel MV in qpel units. steps: (2,) = half-pel only (subme 2-3),
    (2, 1) = all quarter-pel within +-3 (subme >= 4).
    Returns (mv, satd) at the refined position.
    """
    pad = omc.PAD
    Wy, Wx = bh + 3, bw + 3
    by = ys + (mv_qpel[..., 1] >> 2) - 1 + pad
    bx = xs + (mv_qpel[..., 0] >> 2) - 1 + pad
    shape = by.shape

    if ref_sel is None:
        def one(y0, x0):      # all 4 hpel planes in one block DMA
            return jax.lax.dynamic_slice(planes, (0, y0, x0),
                                         (4, Wy, Wx))

        win = jax.vmap(one)(by.reshape(-1), bx.reshape(-1)) \
            .reshape(*shape, 4, Wy, Wx)
    else:
        def one_r(s0, y0, x0):  # the chosen reference's 4-plane group
            return jax.lax.dynamic_slice(planes, (s0, y0, x0),
                                         (4, Wy, Wx))

        win = jax.vmap(one_r)(4 * ref_sel.reshape(-1), by.reshape(-1),
                              bx.reshape(-1)) \
            .reshape(*shape, 4, Wy, Wx)
    win = jnp.moveaxis(win, -3, 0)         # (4, ..., Wy, Wx)

    if steps == (2,):
        offs = [(dx, dy) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]
    else:
        offs = [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)]

    ref0 = omc._HPEL_REF0
    ref1 = omc._HPEL_REF1
    satds, mvs = [], []
    for (ox, oy) in offs:
        fx, fy = ox & 3, oy & 3
        qidx = (fy << 2) | fx
        p0, p1 = int(ref0[qidx]), int(ref1[qidx])
        iy = 1 + (oy >> 2)
        ix = 1 + (ox >> 2)
        a = win[p0, ..., iy + (fy == 3):iy + (fy == 3) + bh, ix:ix + bw]
        b = win[p1, ..., iy:iy + bh, ix + (fx == 3):ix + (fx == 3) + bw]
        # reduce immediately: the (NC, ..., bh, bw) prediction stack is
        # never materialized
        satds.append(opix.satd(cur_blocks, (a + b + 1) >> 1))
        mvs.append(mv_qpel + jnp.asarray([ox, oy], I32))
    satd = jnp.stack(satds)                # (NC, ...)
    mvs = jnp.stack(mvs)                   # (NC, ..., 2)
    cost = satd + lam * mv_cost_bits(mvs, mvp_qpel[None])
    best = jnp.argmin(cost, axis=0)
    best_mv = jnp.take_along_axis(mvs, best[None, ..., None], axis=0)[0]
    best_satd = jnp.take_along_axis(satd, best[None], axis=0)[0]
    return best_mv, best_satd


def subpel_refine(cur_tiles, planes, mv_qpel, lam, mvp_qpel,
                  steps=(2, 1), ref_sel=None):
    """16x16-MB wrapper around subpel_refine_blocks."""
    mb_h, mb_w = cur_tiles.shape[:2]
    ys = (jnp.arange(mb_h, dtype=I32) * 16)[:, None] \
        + jnp.zeros((mb_w,), I32)
    xs = (jnp.arange(mb_w, dtype=I32) * 16)[None, :] \
        + jnp.zeros((mb_h, 1), I32)
    return subpel_refine_blocks(cur_tiles, planes, mv_qpel, lam,
                                mvp_qpel, ys, xs, 16, 16, steps,
                                ref_sel)


def partition_fullpel(cur_tiles, ref_pad, mv16_qpel, lam, mvp_qpel,
                      me_range: int, m: int = 3, pad: int = omc.PAD,
                      ref_sel=None, with_8x8: bool = False):
    """Best full-pel MVs for the 16x8 and 8x16 partitions of every MB,
    searched in a (2m+1)^2 window around the 16x16 full-pel winner (the
    reference seeds partition searches from the MB-level result too,
    encoder/analyse.c:1274-1404).

    cur_tiles: (mb_h, mb_w, 16, 16); mv16_qpel: (mb_h, mb_w, 2).
    ref_pad: edge-padded fpel reference plane — or, with `ref_sel`
    (a (mb_h, mb_w) per-MB reference index), an (n_refs, Hp, Wp) stack.
    Returns dict of qpel full-pel MVs: t/b (16x8 top/bottom),
    l/r (8x16 left/right), each (mb_h, mb_w, 2).
    """
    mb_h, mb_w = cur_tiles.shape[:2]
    ys = (jnp.arange(mb_h, dtype=I32) * 16)[:, None] \
        + jnp.zeros((mb_w,), I32)
    xs = (jnp.arange(mb_w, dtype=I32) * 16)[None, :] \
        + jnp.zeros((mb_h, 1), I32)
    R = me_range
    c = jnp.clip(mv16_qpel >> 2, -min(R, pad - m - 1), min(R, pad - m - 1))
    wn = 16 + 2 * m
    by = ys + c[..., 1] - m + pad
    bx = xs + c[..., 0] - m + pad
    if ref_sel is None:
        win = _win_slices(ref_pad, by, bx, wn, wn).astype(I32)
    else:
        win = _win_slices_planes(ref_pad, ref_sel, by, bx, wn, wn) \
            .astype(I32)
    # per-candidate diff reduced immediately into the four partition
    # half-sums (top/bottom rows, left/right cols) and, when requested,
    # the four 8x8 quadrant sums (P8x8 sub-blocks) — no candidate stack
    part_sads = {"t": [], "b": [], "l": [], "r": []}
    if with_8x8:
        for k in range(4):
            part_sads[f"q{k}"] = []
    for oy in range(2 * m + 1):
        for ox in range(2 * m + 1):
            d = jnp.abs(cur_tiles - win[..., oy:oy + 16, ox:ox + 16])
            hs = d.reshape(*d.shape[:-2], 2, 8, 2, 8).sum(axis=(-3, -1))
            part_sads["t"].append(hs[..., 0, :].sum(-1))
            part_sads["b"].append(hs[..., 1, :].sum(-1))
            part_sads["l"].append(hs[..., :, 0].sum(-1))
            part_sads["r"].append(hs[..., :, 1].sum(-1))
            if with_8x8:
                part_sads["q0"].append(hs[..., 0, 0])
                part_sads["q1"].append(hs[..., 0, 1])
                part_sads["q2"].append(hs[..., 1, 0])
                part_sads["q3"].append(hs[..., 1, 1])
    offs = jnp.asarray([(ox, oy)
                        for oy in range(-m, m + 1)
                        for ox in range(-m, m + 1)], dtype=I32)
    mvs = (c[None] + offs[:, None, None, :]) * 4       # qpel
    bits = mv_cost_bits(mvs, mvp_qpel[None])

    out = {}
    for key, sads in part_sads.items():
        cost = jnp.stack(sads) + lam * bits
        best = jnp.argmin(cost, axis=0)
        out[key] = jnp.take_along_axis(
            mvs, best[None, ..., None], axis=0)[0]
    return out


def chroma_rerank(cur_tiles, planes, cur_u, cur_v, cu_pad, cv_pad,
                  mv_qpel, lam, mvp_qpel, ref_sel=None,
                  center_satd=None):
    """b_chroma_me: re-rank the qpel diamond around the luma sub-pel
    winner with luma SATD + U/V SATD at the chroma-interpolated MV
    (the refine_subpel chroma term, encoder/me.c:61-66, which the
    reference applies in its 4-neighbor qpel diamond iterations at
    subme >= 5).

    Returns (mv, luma satd at the chosen position): the returned cost
    stays in luma units so the caller's cross-mode comparisons remain
    comparable (deviation: the reference carries the summed cost).

    cur_tiles: (mb_h, mb_w, 16, 16); cur_u/cur_v: (mb_h, mb_w, 8, 8);
    cu_pad/cv_pad: padded chroma ref plane(s) (stacked when ref_sel);
    center_satd: the caller's luma SATD at mv_qpel (from
    subpel_refine), saving the center's mc_luma+SATD re-evaluation.

    NB: the static-phase window trick of subpel_refine_blocks does NOT
    apply here — mv_qpel is the *sub-pel* winner, so each candidate's
    qpel phase varies per MB; predictions go through mc_luma (per-MB
    phase gathers).
    """
    mb_h, mb_w = cur_tiles.shape[:2]
    ys = (jnp.arange(mb_h, dtype=I32) * 16)[:, None] \
        + jnp.zeros((mb_w,), I32)
    xs = (jnp.arange(mb_w, dtype=I32) * 16)[None, :] \
        + jnp.zeros((mb_h, 1), I32)
    best_cost = best_mv = best_lsatd = None
    for (ox, oy) in ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)):
        mv = mv_qpel + jnp.asarray([ox, oy], I32)
        if ox == 0 and oy == 0 and center_satd is not None:
            lsatd = center_satd
        else:
            pl = omc.mc_luma(planes, ys, xs, mv, 16, 16,
                             ref_sel=ref_sel)
            lsatd = opix.satd(cur_tiles, pl)
        pu = omc.mc_chroma(cu_pad, ys >> 1, xs >> 1, mv, 8, 8,
                           ref_sel=ref_sel)
        pv = omc.mc_chroma(cv_pad, ys >> 1, xs >> 1, mv, 8, 8,
                           ref_sel=ref_sel)
        csatd = opix.satd(cur_u, pu) + opix.satd(cur_v, pv)
        cost = lsatd + csatd + lam * mv_cost_bits(mv, mvp_qpel)
        if best_cost is None:
            best_cost, best_mv, best_lsatd = cost, mv, lsatd
        else:
            upd = cost < best_cost
            best_cost = jnp.where(upd, cost, best_cost)
            best_mv = jnp.where(upd[..., None], mv, best_mv)
            best_lsatd = jnp.where(upd, lsatd, best_lsatd)
    return best_mv, best_lsatd
