"""In-loop deblocking filter as a TPU wavefront pass.

The reference filters macroblocks strictly in raster order (vertical
edges then horizontal edges per MB, x264_frame_deblock_row,
common/frame.c:621), because each MB's filtering reads pixels the left /
top / top-right neighbors' filtering already modified. The exact
dependency set of MB (y, x) is {(y, x-1), (y-1, x), (y-1, x+1)}, so the
slope-2 anti-diagonal wavefront d = x + 2*y is the maximal parallel
order: every step filters a whole diagonal of MBs batched (all 8 luma
edge positions + 4 chroma edge positions vectorized over the diagonal
and over the 16 pixel lines of each edge).

Boundary strengths (bS) and per-edge alpha/beta/tc0 depend only on
pre-filter metadata (qp / intra / nnz / mv / ref per 4x4 block,
DEBLOCK_STRENGTH macro in common/frame.c:697-742), so they are computed
frame-wide up front; the scan only moves pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

I32 = jnp.int32


def _tab(t):
    return jnp.asarray(np.asarray(t, np.int32))


def _lookup(table, idx):
    return table[jnp.clip(idx, 0, 51)]


def _edge_params(qp_p, qp_q, bs, alpha_off, beta_off):
    """alpha/beta/tc0 for edges with the given side QPs and strengths."""
    qp_avg = (qp_p + qp_q + 1) >> 1
    ia = qp_avg + alpha_off
    alpha = _lookup(_tab(tables.ALPHA_TABLE), ia)
    beta = _lookup(_tab(tables.BETA_TABLE), qp_avg + beta_off)
    tc0 = _tab(tables.TC0_TABLE)[jnp.clip(ia, 0, 51), jnp.minimum(bs, 3)]
    return alpha, beta, tc0


def _strengths(shift, intra4, nnz4, ref4, mv4, ref4_l1, mv4_l1, is_b,
               mb_edge):
    """bS on the 4x4 edge grid. shift: function returning the p-side
    (left / above) value of a (H4, W4, ...) array; entries whose p side
    falls outside the frame are masked to 0 by the caller."""
    intra_p = shift(intra4)
    any_intra = intra_p | intra4
    nz = (shift(nnz4) != 0) | (nnz4 != 0)
    mv_p, mv_q = shift(mv4), mv4

    def mv_differ(rp, rq, mp, mq):
        return ((rp != rq)
                | (jnp.abs(mp[..., 0] - mq[..., 0]) >= 4)
                | (jnp.abs(mp[..., 1] - mq[..., 1]) >= 4))

    mvd = mv_differ(shift(ref4), ref4, mv_p, mv_q)
    mvd = mvd | (is_b & mv_differ(shift(ref4_l1), ref4_l1,
                                  shift(mv4_l1), mv4_l1))
    bs = jnp.where(any_intra, jnp.where(mb_edge, 4, 3),
                   jnp.where(nz, 2, jnp.where(mvd, 1, 0)))
    return bs.astype(I32)


def _luma_filter(win, bs, tc0, alpha, beta, enable):
    """Filter across one luma edge. win: (K, 16, 8) pixel lines
    [p3 p2 p1 p0 q0 q1 q2 q3]; bs/tc0: (K, 16); alpha/beta: (K, 1);
    enable: (K, 1) bool. Returns the filtered window."""
    p3, p2, p1, p0 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    q0, q1, q2, q3 = win[..., 4], win[..., 5], win[..., 6], win[..., 7]
    fsf = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
           & (jnp.abs(q1 - q0) < beta) & (bs > 0) & enable)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # normal filter (bS 1..3)
    avg01 = (p0 + q0 + 1) >> 1
    np1 = p1 + jnp.clip(((p2 + avg01) >> 1) - p1, -tc0, tc0)
    nq1 = q1 + jnp.clip(((q2 + avg01) >> 1) - q1, -tc0, tc0)
    tc = tc0 + ap.astype(I32) + aq.astype(I32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    normal = [p2, jnp.where(ap, np1, p1), np0, nq0,
              jnp.where(aq, nq1, q1), q2]

    # strong filter (bS 4)
    short = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp0w = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    sp1 = (p2 + p1 + p0 + q0 + 2) >> 2
    sp2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    sp0n = (2 * p1 + p0 + q1 + 2) >> 2
    sq0w = (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3
    sq1 = (p0 + q0 + q1 + q2 + 2) >> 2
    sq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    sq0n = (2 * q1 + q0 + p1 + 2) >> 2
    wide_p = short & ap
    wide_q = short & aq
    strong = [jnp.where(wide_p, sp2, p2),
              jnp.where(wide_p, sp1, p1),
              jnp.where(wide_p, sp0w, sp0n),
              jnp.where(wide_q, sq0w, sq0n),
              jnp.where(wide_q, sq1, q1),
              jnp.where(wide_q, sq2, q2)]

    is4 = bs == 4
    out = [jnp.where(fsf, jnp.where(is4, s, n), o)
           for s, n, o in zip(strong, normal, [p2, p1, p0, q0, q1, q2])]
    return jnp.stack([p3] + out + [q3], axis=-1)


def _chroma_filter(win, bs, tc, alpha, beta, enable):
    """win: (K, 8, 4) lines [p1 p0 q0 q1]; tc already includes the +1."""
    p1, p0, q0, q1 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    fsf = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
           & (jnp.abs(q1 - q0) < beta) & (bs > 0) & enable)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p0 = jnp.where(fsf, jnp.where(is4, sp0, np0), p0)
    out_q0 = jnp.where(fsf, jnp.where(is4, sq0, nq0), q0)
    return jnp.stack([p1, out_p0, out_q0, q1], axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 1))
def deblock_frame(mb_h: int, mb_w: int, y, u, v, qp_mb, intra_mb,
                  nnz4, ref4, mv4, ref4_l1, mv4_l1, is_b,
                  alpha_off, beta_off, chroma_qp_offset):
    """Deblock a frame. y: (mb_h*16, mb_w*16) int32; u/v: chroma planes.

    qp_mb/intra_mb: (mb_h, mb_w); nnz4/ref4: (mb_h*4, mb_w*4);
    mv4: (mb_h*4, mb_w*4, 2) in quarter-pel; *_l1 idem for B slices
    (pass zeros + is_b=False otherwise). alpha_off/beta_off are the full
    offsets (2x the _div2 slice header values)."""
    H4, W4 = mb_h * 4, mb_w * 4
    intra4 = jnp.repeat(jnp.repeat(intra_mb.astype(bool), 4, 0), 4, 1)
    qp4 = jnp.repeat(jnp.repeat(qp_mb.astype(I32), 4, 0), 4, 1)
    qpc4 = _lookup(_tab(tables.CHROMA_QP_TABLE),
                   qp4 + chroma_qp_offset)

    x4 = jnp.arange(W4)
    y4 = jnp.arange(H4)
    mb_edge_v = (x4 % 4 == 0)[None, :]
    mb_edge_h = (y4 % 4 == 0)[:, None]

    def shift_left(a):
        return jnp.roll(a, 1, axis=1)

    def shift_up(a):
        return jnp.roll(a, 1, axis=0)

    bs_v = _strengths(shift_left, intra4, nnz4, ref4, mv4,
                      ref4_l1, mv4_l1, is_b, mb_edge_v)
    bs_v = jnp.where((x4 == 0)[None, :], 0, bs_v)
    bs_h = _strengths(shift_up, intra4, nnz4, ref4, mv4,
                      ref4_l1, mv4_l1, is_b, mb_edge_h)
    bs_h = jnp.where((y4 == 0)[:, None], 0, bs_h)

    av, bv, tv = _edge_params(shift_left(qp4), qp4, bs_v,
                              alpha_off, beta_off)
    ah, bh, th = _edge_params(shift_up(qp4), qp4, bs_h,
                              alpha_off, beta_off)
    avc, bvc, tvc = _edge_params(shift_left(qpc4), qpc4, bs_v,
                                 alpha_off, beta_off)
    ahc, bhc, thc = _edge_params(shift_up(qpc4), qpc4, bs_h,
                                 alpha_off, beta_off)
    tvc, thc = tvc + 1, thc + 1      # chroma tc = tc0 + 1

    yp = jnp.pad(y.astype(I32), 4)
    up = jnp.pad(u.astype(I32), 4)
    vp = jnp.pad(v.astype(I32), 4)

    K = min(mb_h, (mb_w + 1) // 2)
    D = mb_w + 2 * mb_h - 2
    r20 = jnp.arange(20)
    r12 = jnp.arange(12)
    r4 = jnp.arange(4)

    def seg_rep(a, rep):
        """(K, 4) per-segment -> (K, 4*rep) per-line."""
        return jnp.repeat(a, rep, axis=-1)

    def step(carry, d):
        yp, up, vp = carry
        ys = jnp.maximum(0, (d - mb_w + 2) // 2) + jnp.arange(K, dtype=I32)
        xs = d - 2 * ys
        valid = (ys < mb_h) & (xs >= 0) & (xs < mb_w)
        yc = jnp.clip(ys, 0, mb_h - 1)
        xc = jnp.clip(xs, 0, mb_w - 1)

        # gather per-MB edge metadata: [lane, edge, segment]
        g_y = 4 * yc[:, None, None]
        g_x = 4 * xc[:, None, None]
        idx_v = (g_y + r4[None, None, :], g_x + r4[None, :, None])
        idx_h = (g_y + r4[None, :, None], g_x + r4[None, None, :])

        def eg(arr, idx):
            return arr[idx[0], idx[1]]

        # luma patch (K, 20, 20); local coords -4..15 relative to the
        # MB — fetched as vmapped dynamic_slice (batched block DMA)
        def sl20(y0, x0):
            return jax.lax.dynamic_slice(yp, (y0, x0), (20, 20))

        patch = jax.vmap(sl20)(yc * 16, xc * 16)

        def run_edges(patch, bs_e, tc_e, a_e, b_e, first_ok):
            for e in range(4):
                en = (valid & (first_ok | (e > 0)))[:, None]
                win = patch[:, 4:20, 4 * e:4 * e + 8]
                win = _luma_filter(
                    win, seg_rep(bs_e[:, e], 4), seg_rep(tc_e[:, e], 4),
                    a_e[:, e][:, None], b_e[:, e][:, None], en)
                patch = patch.at[:, 4:20, 4 * e:4 * e + 8].set(win)
            return patch

        patch = run_edges(patch, eg(bs_v, idx_v), eg(tv, idx_v),
                          eg(av, idx_v)[:, :, 0], eg(bv, idx_v)[:, :, 0],
                          xs > 0)
        patch = jnp.swapaxes(patch, 1, 2)
        patch = run_edges(patch, eg(bs_h, idx_h), eg(th, idx_h),
                          eg(ah, idx_h)[:, :, 0], eg(bh, idx_h)[:, :, 0],
                          ys > 0)
        patch = jnp.swapaxes(patch, 1, 2)

        orow = (jnp.where(valid, yc, mb_h + 1) * 16)[:, None, None] \
            + r20[None, :, None]
        ocol = (xc * 16)[:, None, None] + r20[None, None, :]
        yp = yp.at[orow, ocol].set(patch, mode="drop")

        # chroma (both planes share strengths/params)
        crows = (yc * 8)[:, None, None] + r12[None, :, None]
        ccols = (xc * 8)[:, None, None] + r12[None, None, :]
        ocrow = (jnp.where(valid, yc, mb_h + 1) * 8)[:, None, None] \
            + r12[None, :, None]

        def run_chroma(cpatch, bs_e, tc_e, a_e, b_e, first_ok):
            for e in range(2):
                en = (valid & (first_ok | (e > 0)))[:, None]
                win = cpatch[:, 4:12, 4 * e + 2:4 * e + 6]
                win = _chroma_filter(
                    win, seg_rep(bs_e[:, 2 * e], 2),
                    seg_rep(tc_e[:, 2 * e], 2),
                    a_e[:, 2 * e][:, None], b_e[:, 2 * e][:, None], en)
                cpatch = cpatch.at[:, 4:12, 4 * e + 2:4 * e + 6].set(win)
            return cpatch

        def chroma_plane(pl):
            def sl12(y0, x0):
                return jax.lax.dynamic_slice(pl, (y0, x0), (12, 12))

            cpatch = jax.vmap(sl12)(yc * 8, xc * 8)
            cpatch = run_chroma(cpatch, eg(bs_v, idx_v), eg(tvc, idx_v),
                                eg(avc, idx_v)[:, :, 0],
                                eg(bvc, idx_v)[:, :, 0], xs > 0)
            cpatch = jnp.swapaxes(cpatch, 1, 2)
            cpatch = run_chroma(cpatch, eg(bs_h, idx_h), eg(thc, idx_h),
                                eg(ahc, idx_h)[:, :, 0],
                                eg(bhc, idx_h)[:, :, 0], ys > 0)
            cpatch = jnp.swapaxes(cpatch, 1, 2)
            return pl.at[ocrow, ccols].set(cpatch, mode="drop")

        up = chroma_plane(up)
        vp = chroma_plane(vp)
        return (yp, up, vp), None

    (yp, up, vp), _ = jax.lax.scan(step, (yp, up, vp),
                                   jnp.arange(D, dtype=I32))
    return (yp[4:-4, 4:-4], up[4:-4, 4:-4], vp[4:-4, 4:-4])
