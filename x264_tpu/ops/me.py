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


_OFFS3 = jnp.asarray(
    [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], dtype=jnp.int32)


def subpel_refine(cur_tiles, planes, mv_qpel, lam, mvp_qpel,
                  steps=(2, 1)):
    """Batched sub-pel refinement (refine_subpel, encoder/me.c:680):
    one 3x3 half-pel pass then one 3x3 quarter-pel pass, SATD-scored.

    cur_tiles: (mb_h, mb_w, 16, 16); planes: (4, Hp, Wp) hpel stack;
    mv_qpel: (mb_h, mb_w, 2) starting (full-pel) MV in qpel units.
    Returns (mv, satd) at the refined position.
    """
    mb_h, mb_w = cur_tiles.shape[:2]
    ys = (jnp.arange(mb_h, dtype=I32) * 16)[:, None] + jnp.zeros((mb_w,), I32)
    xs = (jnp.arange(mb_w, dtype=I32) * 16)[None, :] + jnp.zeros((mb_h, 1), I32)

    mv = mv_qpel
    best_satd = None
    for step in steps:
        cand = mv[None] + _OFFS3[:, None, None, :] * step   # (9,mbh,mbw,2)
        pred = omc.mc_luma(planes, ys[None], xs[None], cand, 16, 16)
        satd = opix.satd(cur_tiles[None], pred)             # (9,mbh,mbw)
        cost = satd + lam * mv_cost_bits(cand, mvp_qpel[None])
        best = jnp.argmin(cost, axis=0)                     # (mbh,mbw)
        mv = jnp.take_along_axis(
            cand, best[None, ..., None], axis=0)[0]
        best_satd = jnp.take_along_axis(satd, best[None], axis=0)[0]
    return mv, best_satd
