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


def subpel_refine(cur_tiles, planes, mv_qpel, lam, mvp_qpel,
                  steps=(2, 1)):
    """Batched sub-pel refinement (refine_subpel, encoder/me.c:680),
    SATD-scored over the full qpel neighborhood of the full-pel optimum.

    Because `mv_qpel` comes from the full-pel search, every candidate's
    sub-pel phase is the *same for all MBs*: one (4, mb, 20, 20) window
    gather around each MB's full-pel position suffices, and all
    candidate predictions become dense static slices of it (the
    hpel_ref0/1 plane-average scheme of mc_luma with static phases) —
    no per-candidate gathers.

    cur_tiles: (mb_h, mb_w, 16, 16); planes: (4, Hp, Wp) hpel stack;
    mv_qpel: (mb_h, mb_w, 2) full-pel MV in qpel units. steps selects
    the ladder: (2,) = half-pel positions only (subme 2-3), (2, 1) =
    all quarter-pel positions within +-3 (subme >= 4).
    Returns (mv, satd) at the refined position.
    """
    mb_h, mb_w = cur_tiles.shape[:2]
    pad = omc.PAD
    ys = (jnp.arange(mb_h, dtype=I32) * 16)[:, None] + jnp.zeros((mb_w,), I32)
    xs = (jnp.arange(mb_w, dtype=I32) * 16)[None, :] + jnp.zeros((mb_h, 1), I32)

    # one window per hpel plane around (fullpel - 1) .. (+17, +1 extra
    # column/row for the fx==3 / fy==3 second-plane offset)
    Wn = 19
    by = ys + (mv_qpel[..., 1] >> 2) - 1 + pad
    bx = xs + (mv_qpel[..., 0] >> 2) - 1 + pad
    rows = by[..., None, None] + jnp.arange(Wn)[:, None]
    cols = bx[..., None, None] + jnp.arange(Wn)[None, :]
    win = planes[:, rows, cols]            # (4, mb_h, mb_w, Wn, Wn)

    if steps == (2,):
        offs = [(dx, dy) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]
    else:
        offs = [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)]

    ref0 = omc._HPEL_REF0
    ref1 = omc._HPEL_REF1
    best_cost = best_mv = best_satd = None
    for (ox, oy) in offs:
        fx, fy = ox & 3, oy & 3
        qidx = (fy << 2) | fx
        p0, p1 = int(ref0[qidx]), int(ref1[qidx])
        iy = 1 + (oy >> 2)
        ix = 1 + (ox >> 2)
        a = win[p0, :, :, iy + (fy == 3):iy + (fy == 3) + 16, ix:ix + 16]
        b = win[p1, :, :, iy:iy + 16, ix + (fx == 3):ix + (fx == 3) + 16]
        pred = (a + b + 1) >> 1
        satd = opix.satd(cur_tiles, pred)
        mv = mv_qpel + jnp.asarray([ox, oy], I32)
        cost = satd + lam * mv_cost_bits(mv, mvp_qpel)
        if best_cost is None:
            best_cost, best_mv, best_satd = cost, mv, satd
        else:
            upd = cost < best_cost
            best_cost = jnp.where(upd, cost, best_cost)
            best_satd = jnp.where(upd, satd, best_satd)
            best_mv = jnp.where(upd[..., None], mv, best_mv)
    return best_mv, best_satd
