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


def _skew(a, mb_h: int, mb_w: int, D: int, lead: int = 0):
    """(mb_h, mb_w, *rest) -> (D [+lead], mb_h, *rest) skewed so that
    slot [d + lead, y] holds entry (y, x = d - 2y). Implemented with the
    pad-flatten-reshape trick (zero data movement beyond one pad): with
    row length D+2, flat index y*(D+2)+x equals y*D + (x+2y), so a
    reshape to (mb_h, D) lands entry (y, x) at column d = x + 2y."""
    rest = a.shape[2:]
    ap = jnp.pad(a, [(0, 0), (0, D + 2 - mb_w)] + [(0, 0)] * len(rest))
    sk = ap.reshape(mb_h * (D + 2), *rest)[:mb_h * D] \
        .reshape(mb_h, D, *rest)
    sk = jnp.swapaxes(sk, 0, 1)
    if lead:
        sk = jnp.pad(sk, [(lead, 0)] + [(0, 0)] * (sk.ndim - 1))
    return sk


def _unskew(sk, mb_h: int, mb_w: int, D: int):
    """Inverse of _skew (no lead): (D, mb_h, *rest) -> (mb_h, mb_w, *rest)."""
    rest = sk.shape[2:]
    a = jnp.swapaxes(sk, 0, 1).reshape(mb_h * D, *rest)
    a = jnp.pad(a, [(0, 2 * mb_h)] + [(0, 0)] * len(rest))
    return a.reshape(mb_h, D + 2, *rest)[:, :mb_w]


def _shift_lane(a, fill=None):
    """Lane y takes lane y-1's value (lane 0 gets zeros)."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def deblock_frame(mb_h: int, mb_w: int, y, u, v, qp_mb, intra_mb,
                  nnz4, ref4, mv4, ref4_l1, mv4_l1, is_b,
                  alpha_off, beta_off, chroma_qp_offset, t8_mb=None):
    """Deblock a frame. y: (mb_h*16, mb_w*16) int32; u/v: chroma planes.

    qp_mb/intra_mb: (mb_h, mb_w); nnz4/ref4: (mb_h*4, mb_w*4);
    mv4: (mb_h*4, mb_w*4, 2) in quarter-pel; *_l1 idem for B slices
    (pass zeros + is_b=False otherwise). alpha_off/beta_off are the full
    offsets (2x the _div2 slice header values).

    Layout: tiles live in a skewed store S[d, y] with d = x + 2y, so one
    wavefront step is a contiguous dynamic_slice window of 4 diagonals —
    no element gathers/scatters anywhere in the scan (the per-step cost
    that made the gather/scatter formulation dispatch-bound)."""
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
    if t8_mb is not None:
        # luma edges interior to 8x8 transform blocks are not filtered
        # (spec 8.7: transform_size_8x8_flag; the reference skips edges
        # 1/3 in x264_frame_deblock_row when h->mb.b_transform_8x8)
        t84 = jnp.repeat(jnp.repeat(t8_mb.astype(bool), 4, 0), 4, 1)
        bs_v = jnp.where(t84 & ((x4 % 4 == 1) | (x4 % 4 == 3))[None, :],
                         0, bs_v)
        bs_h = jnp.where(t84 & ((y4 % 4 == 1) | (y4 % 4 == 3))[:, None],
                         0, bs_h)

    av, bv, tv = _edge_params(shift_left(qp4), qp4, bs_v,
                              alpha_off, beta_off)
    ah, bh, th = _edge_params(shift_up(qp4), qp4, bs_h,
                              alpha_off, beta_off)
    avc, bvc, tvc = _edge_params(shift_left(qpc4), qpc4, bs_v,
                                 alpha_off, beta_off)
    ahc, bhc, thc = _edge_params(shift_up(qpc4), qpc4, bs_h,
                                 alpha_off, beta_off)
    tvc, thc = tvc + 1, thc + 1      # chroma tc = tc0 + 1

    D = mb_w + 2 * mb_h - 2

    # ---- per-MB-edge metadata, skewed: [d, lane, edge(, seg)]
    def mb_vmeta(a):       # a[4y+seg, 4x+e] -> [y, x, e, seg]
        return a.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 3, 1)

    def mb_hmeta(a):       # a[4y+e, 4x+seg] -> [y, x, e, seg]
        return a.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)

    xs_meta = dict(
        bs_v=_skew(mb_vmeta(bs_v), mb_h, mb_w, D),
        tv=_skew(mb_vmeta(tv), mb_h, mb_w, D),
        av=_skew(mb_vmeta(av)[..., 0], mb_h, mb_w, D),
        bv=_skew(mb_vmeta(bv)[..., 0], mb_h, mb_w, D),
        bs_h=_skew(mb_hmeta(bs_h), mb_h, mb_w, D),
        th=_skew(mb_hmeta(th), mb_h, mb_w, D),
        ah=_skew(mb_hmeta(ah)[..., 0], mb_h, mb_w, D),
        bh=_skew(mb_hmeta(bh)[..., 0], mb_h, mb_w, D),
        tvc=_skew(mb_vmeta(tvc), mb_h, mb_w, D),
        avc=_skew(mb_vmeta(avc)[..., 0], mb_h, mb_w, D),
        bvc=_skew(mb_vmeta(bvc)[..., 0], mb_h, mb_w, D),
        thc=_skew(mb_hmeta(thc), mb_h, mb_w, D),
        ahc=_skew(mb_hmeta(ahc)[..., 0], mb_h, mb_w, D),
        bhc=_skew(mb_hmeta(bhc)[..., 0], mb_h, mb_w, D),
        d=jnp.arange(D, dtype=I32),
    )

    # ---- skewed tile stores (3 leading pad slots so the window
    # [d, d+3] = real diagonals [d-3, d] without start clamping)
    ty = y.astype(I32).reshape(mb_h, 16, mb_w, 16).swapaxes(1, 2)
    tu = u.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    tv_t = v.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    Sy = _skew(ty, mb_h, mb_w, D, lead=3)
    Su = _skew(tu, mb_h, mb_w, D, lead=3)
    Sv = _skew(tv_t, mb_h, mb_w, D, lead=3)

    lane = jnp.arange(mb_h, dtype=I32)

    def seg_rep(a, rep):
        """(K, 4) per-segment -> (K, 4*rep) per-line."""
        return jnp.repeat(a, rep, axis=-1)

    def step(carry, m):
        Sy, Su, Sv = carry
        d = m["d"]
        xpos = d - 2 * lane
        valid = (xpos >= 0) & (xpos < mb_w)
        ok_v0 = valid & (xpos > 0)     # frame-left edge off
        ok_h0 = valid & (lane > 0)     # frame-top edge off

        def build_patch(S, t: int, h: int):
            """Window of 4 diagonals -> (mb_h, t+h, t+h) halo patches.
            W[3]=own(d), W[2]=d-1 (left / top-right), W[1]=d-2 (top),
            W[0]=d-3 (top-left); h = halo (4)."""
            W = jax.lax.dynamic_slice(
                S, (d, 0, 0, 0), (4, mb_h, t, t))
            own = W[3]
            left = W[2][:, :, t - h:]
            topt = _shift_lane(W[1])[:, t - h:, :]
            tl = _shift_lane(W[0])[:, t - h:, t - h:]
            top_row = jnp.concatenate([tl, topt], axis=2)
            body = jnp.concatenate([left, own], axis=2)
            return W, jnp.concatenate([top_row, body], axis=1)

        def write_back(S, W, patch, t: int, h: int, hw: int):
            """Write own tile + left-tile last hw cols + top-tile last
            hw rows back into slots d..d+3 (real d-3..d). hw: written
            halo width (3 luma / 1 chroma)."""
            own_new = patch[:, h:, h:]
            left_new = W[2].at[:, :, t - hw:].set(
                patch[:, h:, h - hw:h])
            src_top = patch[:, h - hw:h, h:]          # lane y -> tile y-1
            top_new = W[1].at[:, t - hw:, :].set(
                jnp.concatenate([src_top[1:], W[1][mb_h - 1:, t - hw:, :]],
                                axis=0))
            upd = jnp.stack([top_new, left_new, own_new])
            return jax.lax.dynamic_update_slice(S, upd, (d + 1, 0, 0, 0))

        # ---- luma
        Wy, patch = build_patch(Sy, 16, 4)

        def run_edges(patch, bs_e, tc_e, a_e, b_e, first_ok):
            for e in range(4):
                en = (first_ok if e == 0 else valid)[:, None]
                win = patch[:, 4:20, 4 * e:4 * e + 8]
                win = _luma_filter(
                    win, seg_rep(bs_e[:, e], 4), seg_rep(tc_e[:, e], 4),
                    a_e[:, e][:, None], b_e[:, e][:, None], en)
                patch = patch.at[:, 4:20, 4 * e:4 * e + 8].set(win)
            return patch

        patch = run_edges(patch, m["bs_v"], m["tv"], m["av"], m["bv"],
                          ok_v0)
        patch = jnp.swapaxes(patch, 1, 2)
        patch = run_edges(patch, m["bs_h"], m["th"], m["ah"], m["bh"],
                          ok_h0)
        patch = jnp.swapaxes(patch, 1, 2)
        Sy = write_back(Sy, Wy, patch, 16, 4, 3)

        # ---- chroma (both planes share strengths/params)
        def run_chroma(cpatch, bs_e, tc_e, a_e, b_e, first_ok):
            for e in range(2):
                en = (first_ok if e == 0 else valid)[:, None]
                win = cpatch[:, 4:12, 4 * e + 2:4 * e + 6]
                win = _chroma_filter(
                    win, seg_rep(bs_e[:, 2 * e], 2),
                    seg_rep(tc_e[:, 2 * e], 2),
                    a_e[:, 2 * e][:, None], b_e[:, 2 * e][:, None], en)
                cpatch = cpatch.at[:, 4:12, 4 * e + 2:4 * e + 6].set(win)
            return cpatch

        def chroma_plane(S):
            W, cpatch = build_patch(S, 8, 4)
            cpatch = run_chroma(cpatch, m["bs_v"], m["tvc"], m["avc"],
                                m["bvc"], ok_v0)
            cpatch = jnp.swapaxes(cpatch, 1, 2)
            cpatch = run_chroma(cpatch, m["bs_h"], m["thc"], m["ahc"],
                                m["bhc"], ok_h0)
            cpatch = jnp.swapaxes(cpatch, 1, 2)
            return write_back(S, W, cpatch, 8, 4, 1)

        Su = chroma_plane(Su)
        Sv = chroma_plane(Sv)
        return (Sy, Su, Sv), None

    (Sy, Su, Sv), _ = jax.lax.scan(step, (Sy, Su, Sv), xs_meta)

    def unfold(S, t):
        tiles = _unskew(S[3:], mb_h, mb_w, D)
        return tiles.swapaxes(1, 2).reshape(mb_h * t, mb_w * t)

    return unfold(Sy, 16), unfold(Su, 8), unfold(Sv, 8)
