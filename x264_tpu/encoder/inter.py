"""P-frame pipeline: motion estimation, inter prediction, inter/intra
mode decision, residual coding and MV field syntax derivation.

The reference's per-MB P path (x264_macroblock_analyse P branch,
encoder/analyse.c:1077-1519 + x264_macroblock_encode,
encoder/macroblock.c:475) is re-staged for TPU as:

1. Dense ME for every MB at once (ops/me.py) seeded by the previous
   frame's MV field — the decoupling trick the reference's own lookahead
   uses (encoder/slicetype.c:153-166), since the true median predictor
   is only known after all MVs are final.
2. Fully parallel inter residual path: MC fetch, 4x4 DCT, P-matrix
   quantization, reconstruction — no wavefront needed because inter
   prediction reads only the *reference* frame.
3. An anti-diagonal wavefront (as in intra.py) for the intra-in-P
   decision: I16x16 cost needs neighbor reconstruction, so the
   inter-vs-intra choice and intra reconstruction run per diagonal;
   inter MBs' recon tiles are pre-seeded so neighbors are always final.
4. Vectorized post-passes: exact median MV prediction / mvd
   (x264_mb_predict_mv_16x16, common/macroblock.c:96), P_Skip detection
   (x264_mb_predict_mv_pskip, common/macroblock.c:133), per-4x4
   nnz/ref/mv maps for the deblocker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as odct
from ..ops import mc as omc
from ..ops import me as ome
from ..ops import pixel as opix
from ..ops import predict as opred
from ..ops import quant as oquant
from .. import tables
from . import intra as eintra
from .intra import (_tile16, _untile, _blocks4_raster, _unblocks4,
                    _MODE_BITS_16, _BIG)

I32 = jnp.int32

# lambda multiplier penalizing the bigger intra mb_type ue() in P slices
# (~ the i_mb_bits term of the reference's RD comparison)
INTRA_PEN_BITS = 7


def make_qtab_p(qp_y: int, qp_c: int, qt: tables.QuantTables | None = None):
    """Intra tables (y_/c_) plus inter tables (py_/pc_): CQM_4PY/4PC with
    the inter deadzone (x264_cqm_init, common/set.c:68)."""
    qt = qt or tables.DEFAULT_QUANT
    out = eintra.make_qtab(qp_y, qp_c, qt)
    a = lambda x: jnp.asarray(np.asarray(x, np.int32))
    out.update(
        py_mf=a(qt.quant4_mf[tables.CQM_4PY, qp_y]),
        py_bias=a(qt.quant4_bias[tables.CQM_4PY, qp_y]),
        py_dmf=a(qt.dequant4_mf[tables.CQM_4PY, qp_y % 6]),
        py_qpdiv6=a(qp_y // 6),
        pc_mf=a(qt.quant4_mf[tables.CQM_4PC, qp_c]),
        pc_bias=a(qt.quant4_bias[tables.CQM_4PC, qp_c]),
        pc_dmf=a(qt.dequant4_mf[tables.CQM_4PC, qp_c % 6]),
        pc_dmf0=a(qt.dequant4_mf[tables.CQM_4PC, qp_c % 6][0]),
        pc_mf_dc=a(qt.quant4_mf[tables.CQM_4PC, qp_c][0] >> 1),
        pc_bias_dc=a(qt.quant4_bias[tables.CQM_4PC, qp_c][0] << 1),
        pc_qpdiv6=a(qp_c // 6),
    )
    return out


def median3(a, b, c):
    return a + b + c - jnp.minimum(a, jnp.minimum(b, c)) \
        - jnp.maximum(a, jnp.maximum(b, c))


def mv_prediction(mv, ref):
    """Vectorized 16x16 median MV prediction + P_Skip MV for the whole
    frame (x264_mb_predict_mv_16x16 / _pskip, common/macroblock.c:96-153).

    mv: (mb_h, mb_w, 2) final qpel MV field (0 where intra);
    ref: (mb_h, mb_w) final ref map (0 = inter ref0, -1 = intra).
    Returns (mvp, mv_skip): both (mb_h, mb_w, 2).
    """
    refp = jnp.pad(ref, ((1, 1), (1, 1)), constant_values=-2)
    mvp_ = jnp.pad(mv, ((1, 1), (1, 1), (0, 0)))
    a_r, a_mv = refp[1:-1, :-2], mvp_[1:-1, :-2]
    b_r, b_mv = refp[:-2, 1:-1], mvp_[:-2, 1:-1]
    c_r, c_mv = refp[:-2, 2:], mvp_[:-2, 2:]
    d_r, d_mv = refp[:-2, :-2], mvp_[:-2, :-2]
    use_d = c_r == -2
    c_r = jnp.where(use_d, d_r, c_r)
    c_mv = jnp.where(use_d[..., None], d_mv, c_mv)

    cnt = ((a_r == 0).astype(I32) + (b_r == 0).astype(I32)
           + (c_r == 0).astype(I32))
    med = median3(a_mv, b_mv, c_mv)
    only = jnp.where((a_r == 0)[..., None], a_mv,
                     jnp.where((b_r == 0)[..., None], b_mv, c_mv))
    a_only = (b_r == -2) & (c_r == -2) & (a_r != -2)
    mvp = jnp.where((cnt > 1)[..., None], med,
                    jnp.where((cnt == 1)[..., None], only,
                              jnp.where(a_only[..., None], a_mv, med)))

    a_zero = (a_r == 0) & jnp.all(a_mv == 0, axis=-1)
    b_zero = (b_r == 0) & jnp.all(b_mv == 0, axis=-1)
    force0 = (a_r == -2) | (b_r == -2) | a_zero | b_zero
    mv_skip = jnp.where(force0[..., None], 0, mvp)
    return mvp, mv_skip


def inter_luma_residual(fenc_tiles, pred_tiles, qtab):
    """Inter 16x16 luma residual: 16 full 4x4 DCT blocks, P-matrix quant
    (x264_macroblock_encode P path, encoder/macroblock.c:538-616).

    Returns (recon, blocks_z (mbh,mbw,16,16) zig-zag in z-scan block
    order, cbp_bits (mbh,mbw) 4-bit per-8x8 pattern)."""
    lead = fenc_tiles.shape[:-2]
    diff = fenc_tiles - pred_tiles
    blocks = _blocks4_raster(diff, 4)                   # (*,4,4,4,4)
    coef = odct.dct4x4(blocks)
    lv = oquant.quant(coef.reshape(*lead, 16, 16),
                      qtab["py_mf"], qtab["py_bias"])
    nz_blk = jnp.any(lv != 0, axis=-1).reshape(*lead, 4, 4)  # raster grid
    # 8x8 group bit: quadrant q covers raster rows 2q_y.., cols 2q_x
    grp = nz_blk.reshape(*lead, 2, 2, 2, 2).any(axis=(-3, -1))  # (*,2,2)
    cbp_bits = (grp[..., 0, 0] * 1 + grp[..., 0, 1] * 2
                + grp[..., 1, 0] * 4 + grp[..., 1, 1] * 8).astype(I32)
    deq = oquant.dequant(lv, qtab["py_dmf"], qtab["py_qpdiv6"], 4)
    res = odct.idct4x4(deq.reshape(*lead, 4, 4, 4, 4))
    recon = jnp.clip(fenc_tiles - diff + _unblocks4(res, 4), 0, 255)

    zorder = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    zig = jnp.asarray(tables.ZIGZAG4)
    blocks_z = lv[..., zorder, :][..., zig]
    return recon, blocks_z, cbp_bits


def encode_p_body(mb_h: int, mb_w: int, me_range: int,
                  y, u, v, ref_y, ref_u, ref_v, qtab, lam, mvp_seed,
                  subpel_steps=(2, 1), ref_prepadded: bool = False):
    """Encode one P frame (pre-deblock). All planes int32, MB-aligned;
    ref_* are the deblocked reference reconstruction. mvp_seed:
    (mb_h, mb_w, 2) qpel MV predictors for ME cost (previous frame's
    field). Returns the full per-MB output dict (see keys below).

    ref_prepadded: the caller already supplies PAD(=32, luma; 16 chroma)
    edge rows/cols around each ref plane — used by the MB-row-sharded
    path (parallel/rows.py), where the vertical pad of interior bands is
    *real halo pixels* from neighbor shards rather than edge replication
    (the i_mv_range_thread contract, encoder/encoder.c:557-578)."""
    K = min(mb_h, mb_w)
    D = mb_h + mb_w - 1

    y = y.astype(I32)
    y_tiles = _tile16(y, mb_h, mb_w)
    u_tiles = u.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    v_tiles = v.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)

    # ---------------------------------------------------------- stage 1: ME
    ref_pad = (ref_y.astype(I32) if ref_prepadded
               else omc.pad_plane(ref_y.astype(I32)))
    planes = omc.hpel_planes(ref_pad)
    mv_fp, sad_fp = ome.fullpel_search(y, ref_pad, mb_h, mb_w, me_range,
                                       lam, mvp_seed)
    if subpel_steps:
        mv, satd_inter = ome.subpel_refine(y_tiles, planes, mv_fp, lam,
                                           mvp_seed, steps=subpel_steps)
    else:      # subme 1: full-pel only (cost stays SAD-comparable)
        mv, satd_inter = mv_fp, sad_fp
    cost_inter = satd_inter + lam * ome.mv_cost_bits(mv, mvp_seed) \
        + lam  # ue(0) mb_type bit

    # ------------------------------------------------- stage 2: inter path
    ys = jnp.arange(mb_h, dtype=I32)[:, None] * 16 \
        + jnp.zeros((1, mb_w), I32)
    xs = jnp.arange(mb_w, dtype=I32)[None, :] * 16 \
        + jnp.zeros((mb_h, 1), I32)
    pred_y = omc.mc_luma(planes, ys, xs, mv, 16, 16)
    ref_u_pad = (ref_u.astype(I32) if ref_prepadded
                 else omc.pad_plane(ref_u.astype(I32), omc.PAD // 2))
    ref_v_pad = (ref_v.astype(I32) if ref_prepadded
                 else omc.pad_plane(ref_v.astype(I32), omc.PAD // 2))
    pred_u = omc.mc_chroma(ref_u_pad, ys >> 1, xs >> 1, mv, 8, 8)
    pred_v = omc.mc_chroma(ref_v_pad, ys >> 1, xs >> 1, mv, 8, 8)

    recon_inter_y, inter_blocks_z, inter_cbp = inter_luma_residual(
        y_tiles, pred_y, qtab)
    iru, idcu, iacu, inzau, inzdu = eintra.chroma_residual(
        u_tiles, pred_u, qtab, "pc")
    irv, idcv, iacv, inzav, inzdv = eintra.chroma_residual(
        v_tiles, pred_v, qtab, "pc")

    # -------------------------------------- stage 3: intra-in-P wavefront
    state = dict(
        ty=recon_inter_y, tu=iru, tv=irv,
        intra=jnp.zeros((mb_h, mb_w), bool),
        mode16=jnp.zeros((mb_h, mb_w), I32),
        modec=jnp.zeros((mb_h, mb_w), I32),
        luma_dc=jnp.zeros((mb_h, mb_w, 16), I32),
        luma_ac=jnp.zeros((mb_h, mb_w, 16, 16), I32),
        chroma_dc=jnp.zeros((mb_h, mb_w, 2, 4), I32),
        chroma_ac=jnp.zeros((mb_h, mb_w, 2, 4, 16), I32),
    )

    def diag_step(state, d):
        ysd = jnp.maximum(0, d - (mb_w - 1)) + jnp.arange(K, dtype=I32)
        xsd = d - ysd
        valid = (ysd < mb_h) & (xsd >= 0) & (xsd < mb_w)
        yc = jnp.clip(ysd, 0, mb_h - 1)
        xc = jnp.clip(xsd, 0, mb_w - 1)
        ym = jnp.clip(ysd - 1, 0, mb_h - 1)
        xm = jnp.clip(xsd - 1, 0, mb_w - 1)
        has_top = valid & (ysd > 0)
        has_left = valid & (xsd > 0)

        ty, tu, tv = state["ty"], state["tu"], state["tv"]
        fenc = y_tiles[yc, xc]
        top = ty[ym, xc, 15, :]
        left = ty[yc, xm, :, 15]
        topleft = ty[ym, xm, 15, 15]

        lp = eintra.luma_i16_path(fenc, top, left, topleft,
                                  has_top, has_left, qtab, lam)
        choose_intra = (lp["cost"] + lam * INTRA_PEN_BITS
                        < cost_inter[yc, xc])

        # chroma intra path (only scattered if intra wins)
        fu, fv = u_tiles[yc, xc], v_tiles[yc, xc]
        pu = opred.predict_8x8c(tu[ym, xc, 7, :], tu[yc, xm, :, 7],
                                tu[ym, xm, 7, 7], has_top, has_left)
        pv = opred.predict_8x8c(tv[ym, xc, 7, :], tv[yc, xm, :, 7],
                                tv[ym, xm, 7, 7], has_top, has_left)
        cavail = opred.mode_available_8x8c(has_top, has_left)
        ccost = jnp.where(cavail, opix.satd(fu[:, None], pu)
                          + opix.satd(fv[:, None], pv), _BIG)
        cmode = jnp.argmin(ccost, axis=-1).astype(I32)
        cpu = jnp.take_along_axis(pu, cmode[:, None, None, None], 1)[:, 0]
        cpv = jnp.take_along_axis(pv, cmode[:, None, None, None], 1)[:, 0]
        ru, dcu, acu, _, _ = eintra.chroma_residual(fu, cpu, qtab, "c")
        rv, dcv, acv, _, _ = eintra.chroma_residual(fv, cpv, qtab, "c")

        sel = valid & choose_intra
        oy = jnp.where(sel, yc, mb_h)   # drop non-intra / invalid lanes
        ox = jnp.where(sel, xc, mb_w)

        def scat(dst, val):
            return dst.at[oy, ox].set(val, mode="drop")

        state = dict(
            ty=scat(ty, lp["recon"]), tu=scat(tu, ru), tv=scat(tv, rv),
            intra=scat(state["intra"], jnp.ones_like(sel)),
            mode16=scat(state["mode16"], lp["mode"]),
            modec=scat(state["modec"], cmode),
            luma_dc=scat(state["luma_dc"], lp["dc_z"]),
            luma_ac=scat(state["luma_ac"], lp["ac_z"]),
            chroma_dc=scat(state["chroma_dc"], jnp.stack([dcu, dcv], 1)),
            chroma_ac=scat(state["chroma_ac"], jnp.stack([acu, acv], 1)),
        )
        return state, None

    state, _ = jax.lax.scan(diag_step, state, jnp.arange(D, dtype=I32))
    intra_mb = state["intra"]

    # --------------------------------------- stage 4: unify + syntax maps
    im = intra_mb[..., None, None]
    luma_blocks = jnp.where(im, state["luma_ac"], inter_blocks_z)
    luma_dc = jnp.where(intra_mb[..., None], state["luma_dc"], 0)
    chroma_dc = jnp.where(im, state["chroma_dc"],
                          jnp.stack([idcu, idcv], axis=2))
    chroma_ac = jnp.where(im[..., None], state["chroma_ac"],
                          jnp.stack([iacu, iacv], axis=2))

    cbp_i16 = jnp.any(state["luma_ac"] != 0, axis=(-2, -1))
    cbp_luma_bits = jnp.where(intra_mb,
                              jnp.where(cbp_i16, 15, 0), inter_cbp)
    cnz_ac = jnp.any(chroma_ac != 0, axis=(-3, -2, -1))
    cnz_dc = jnp.any(chroma_dc != 0, axis=(-2, -1))
    cbp_chroma = jnp.where(cnz_ac, 2, jnp.where(cnz_dc, 1, 0)).astype(I32)

    mv_final = jnp.where(intra_mb[..., None], 0, mv)
    ref_map = jnp.where(intra_mb, -1, 0).astype(I32)
    mvp, mv_skip = mv_prediction(mv_final, ref_map)
    mvd = mv_final - mvp
    skip = (~intra_mb) & (cbp_luma_bits == 0) & (cbp_chroma == 0) \
        & jnp.all(mv_final == mv_skip, axis=-1)

    # ---------------------------------------------- deblock input maps
    nnz_cnt = jnp.count_nonzero(luma_blocks, axis=-1).astype(I32)
    blk_coded = jnp.where(
        intra_mb[..., None], cbp_i16[..., None].astype(I32),
        (cbp_luma_bits[..., None]
         >> (jnp.arange(16, dtype=I32) // 4)) & 1)
    nnz_z = nnz_cnt * blk_coded                     # z-scan order
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    nnz_raster = jnp.zeros_like(nnz_z).at[..., R].set(nnz_z)
    # intra MBs additionally carry the I16 DC nnz (munge_cavlc_nnz
    # semantics, common/frame.c:362) — irrelevant for bS (intra => bS>=3)
    nnz4 = nnz_raster.reshape(mb_h, mb_w, 4, 4).swapaxes(1, 2) \
        .reshape(mb_h * 4, mb_w * 4)
    ref4 = jnp.repeat(jnp.repeat(ref_map, 4, 0), 4, 1)
    mv4 = jnp.repeat(jnp.repeat(mv_final, 4, 0), 4, 1)

    return dict(
        recon_y=_untile(state["ty"]),
        recon_u=_untile(state["tu"]),
        recon_v=_untile(state["tv"]),
        intra_mb=intra_mb, mode16=state["mode16"], modec=state["modec"],
        luma_dc=luma_dc, luma_blocks=luma_blocks,
        chroma_dc=chroma_dc, chroma_ac=chroma_ac,
        cbp_luma_bits=cbp_luma_bits, cbp_chroma=cbp_chroma,
        mv=mv_final, mvd=mvd, skip=skip,
        nnz4=nnz4, ref4=ref4, mv4=mv4,
    )
