"""P-frame pipeline: motion estimation, inter prediction, inter/intra
mode decision, residual coding and MV field syntax derivation.

The reference's per-MB P path (x264_macroblock_analyse P branch,
encoder/analyse.c:1077-1519 + x264_macroblock_encode,
encoder/macroblock.c:475) is re-staged for TPU as:

1. Hierarchical dense ME for every MB at once (ops/me.py) seeded by
   the previous frame's MV field — the decoupling trick the reference's
   own lookahead uses (encoder/slicetype.c:153-166), since the true
   median predictor is only known after all MVs are final. 16x8/8x16
   partitions are searched in windows around the MB winner and the MB
   partition type chosen by SATD+bits cost (encoder/analyse.c:1274).
2. Fully parallel inter residual path: per-partition MC fetch, 4x4 DCT,
   P-matrix quantization, reconstruction — no wavefront needed because
   inter prediction reads only the *reference* frame.
3. Bounded-depth parallel sweeps for the intra-in-P decision (see the
   stage-3 comment): K full-frame batched I16 evaluations replace the
   sequential per-MB wavefront; intra chains deeper than K demote to
   inter.
4. Vectorized post-passes: exact per-partition MV prediction / mvd on
   block-granular maps (encoder/mvpred.py; x264_mb_predict_mv,
   common/macroblock.c:28-153), P_Skip detection, per-4x4
   nnz/ref/mv/mvd maps for the deblocker and the CABAC contexts.
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
                    _MODE_BITS_16, _BIG, _q16, _qc)

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
        p8_mf=a(qt.quant8_mf[tables.CQM_8PY, qp_y]),
        p8_bias=a(qt.quant8_bias[tables.CQM_8PY, qp_y]),
        p8_dmf=a(qt.dequant8_mf[tables.CQM_8PY, qp_y % 6]),
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


def inter_luma_residual(fenc_tiles, pred_tiles, qtab,
                        lossless: bool = False, decimate: bool = False):
    """Inter 16x16 luma residual: 16 full 4x4 DCT blocks, P-matrix quant
    (x264_macroblock_encode P path, encoder/macroblock.c:538-616). When
    qtab carries a "trellis" const dict, the deadzone quant is replaced
    by the batched CABAC trellis (x264_quant_4x4 b_trellis switch,
    encoder/macroblock.c:87-95). decimate applies the DCT-decimation
    rules (encoder/macroblock.c:700-730): an 8x8 group with
    decimate-score < 4 is zeroed, a whole MB scoring < 6 loses all luma
    residual.

    When qtab carries "nr_offset4" (noise reduction,
    x264_denoise_dct, common/quant.c:180), each AC coefficient is
    shrunk toward zero by the adaptive per-position offset before
    quantization and the per-position |coef| sums are returned in
    qtab["nr_sum4"] for the host-side offset update. Deviation from the
    reference: sums cover every MB's inter residual (the batched
    pipeline computes residuals before mode selection), not just
    MBs finally coded inter.

    Returns (recon, blocks_z (mbh,mbw,16,16) zig-zag in z-scan block
    order, cbp_bits (mbh,mbw) 4-bit per-8x8 pattern)."""
    lead = fenc_tiles.shape[:-2]
    diff = fenc_tiles - pred_tiles
    blocks = _blocks4_raster(diff, 4)                   # (*,4,4,4,4)
    if lossless:
        # transform bypass: residual samples coded directly
        lv = blocks.reshape(*lead, 16, 16)
        nz_blk = jnp.any(lv != 0, axis=-1).reshape(*lead, 4, 4)
        grp = nz_blk.reshape(*lead, 2, 2, 2, 2).any(axis=(-3, -1))
        cbp_bits = (grp[..., 0, 0] * 1 + grp[..., 0, 1] * 2
                    + grp[..., 1, 0] * 4 + grp[..., 1, 1] * 8).astype(I32)
        recon = jnp.clip(fenc_tiles, 0, 255)
        zorder = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
        zig = jnp.asarray(tables.ZIGZAG4)
        blocks_z = lv[..., zorder, :][..., zig]
        return recon, blocks_z, cbp_bits
    coef = odct.dct4x4(blocks)
    if qtab.get("nr_offset4") is not None:
        cf, qtab["nr_sum4"] = oquant.denoise(
            coef.reshape(*lead, 16, 16), qtab["nr_offset4"])
        coef = cf.reshape(coef.shape)
    if qtab.get("trellis") is not None:
        from ..ops import trellis as otrellis
        zz = jnp.asarray(tables.ZIGZAG4)
        inv = jnp.asarray(np.argsort(tables.ZIGZAG4))
        cf = coef.reshape(-1, 16)
        tq = qtab.get("trellis_qp")   # per-MB QP rows (variance AQ)
        qpi = None if tq is None else jnp.repeat(tq.reshape(-1), 16)
        lv_scan = otrellis.trellis_scan(cf[:, zz], qtab["trellis"],
                                        qp_idx=qpi)
        lv = lv_scan[:, inv].reshape(*lead, 16, 16)
    else:
        lv = oquant.quant(coef.reshape(*lead, 16, 16),
                          _q16(qtab["py_mf"]), _q16(qtab["py_bias"]))
    if decimate:
        zigd = jnp.asarray(tables.ZIGZAG4)
        s = oquant.decimate_score(lv[..., zigd],
                                  oquant.DECIMATE_TAB4)       # (*,16)
        # raster block (row,col) -> 8x8 group (row//2, col//2)
        g = s.reshape(*lead, 2, 2, 2, 2).sum(axis=(-3, -1))   # (*,2,2)
        tot = g.sum(axis=(-2, -1))
        kill_g = (g < 4) | (tot < 6)[..., None, None]
        kill_blk = jnp.repeat(jnp.repeat(kill_g, 2, -2), 2, -1) \
            .reshape(*lead, 16)
        lv = jnp.where(kill_blk[..., None], 0, lv)
    nz_blk = jnp.any(lv != 0, axis=-1).reshape(*lead, 4, 4)  # raster grid
    # 8x8 group bit: quadrant q covers raster rows 2q_y.., cols 2q_x
    grp = nz_blk.reshape(*lead, 2, 2, 2, 2).any(axis=(-3, -1))  # (*,2,2)
    cbp_bits = (grp[..., 0, 0] * 1 + grp[..., 0, 1] * 2
                + grp[..., 1, 0] * 4 + grp[..., 1, 1] * 8).astype(I32)
    deq = oquant.dequant(lv, _q16(qtab["py_dmf"]),
                         _qc(qtab["py_qpdiv6"], 2), 4)
    res = odct.idct4x4(deq.reshape(*lead, 4, 4, 4, 4))
    recon = jnp.clip(fenc_tiles - diff + _unblocks4(res, 4), 0, 255)

    zorder = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    zig = jnp.asarray(tables.ZIGZAG4)
    blocks_z = lv[..., zorder, :][..., zig]
    return recon, blocks_z, cbp_bits


def inter_luma_residual8(fenc_tiles, pred_tiles, qtab,
                         decimate: bool = False):
    """Inter luma residual with the 8x8 transform (x264_macroblock_encode
    b_transform_8x8 branch, encoder/macroblock.c:538-558): 4 8x8 DCT
    blocks per MB, CQM_8PY quantization. decimate zeroes 8x8 blocks
    scoring < 4 and the whole MB when the total scores < 6
    (encoder/macroblock.c:643-667; skipped under trellis — 8x8 trellis
    is inherently optimal decimation, :630).

    Returns (recon, blocks8_z (..., 4, 64) scan-order coefficients in
    2x2-raster block order, cbp_bits 4-bit per-8x8 pattern)."""
    lead = fenc_tiles.shape[:-2]
    diff = fenc_tiles - pred_tiles
    blocks = diff.reshape(*lead, 2, 8, 2, 8).swapaxes(-3, -2)
    coef = odct.dct8x8(blocks)
    if qtab.get("nr_offset8") is not None:
        cf, qtab["nr_sum8"] = oquant.denoise(
            coef.reshape(*lead, 4, 64), qtab["nr_offset8"])
        coef = cf.reshape(coef.shape)
    if qtab.get("trellis8") is not None:
        from ..ops import trellis as otrellis
        z8 = jnp.asarray(tables.ZIGZAG8)
        inv8 = jnp.asarray(np.argsort(tables.ZIGZAG8))
        cf = coef.reshape(-1, 64)
        tq = qtab.get("trellis_qp")
        qpi = None if tq is None else jnp.repeat(tq.reshape(-1), 4)
        lv_scan = otrellis.trellis_scan(cf[:, z8], qtab["trellis8"],
                                        qp_idx=qpi)
        lv = lv_scan[:, inv8].reshape(*lead, 4, 64)
        decimate = False   # 8x8 trellis is optimal decimation (:630)
    else:
        lv = oquant.quant(coef.reshape(*lead, 4, 64),
                          _q16(qtab["p8_mf"]), _q16(qtab["p8_bias"]))
    if decimate:
        z8d = jnp.asarray(tables.ZIGZAG8)
        s = oquant.decimate_score(lv[..., z8d],
                                  oquant.DECIMATE_TAB8)    # (*,4)
        kill = (s < 4) | (s.sum(axis=-1) < 6)[..., None]
        lv = jnp.where(kill[..., None], 0, lv)
    nz_blk = jnp.any(lv != 0, axis=-1)                    # (*, 4)
    cbp_bits = (nz_blk[..., 0] * 1 + nz_blk[..., 1] * 2
                + nz_blk[..., 2] * 4 + nz_blk[..., 3] * 8).astype(I32)
    deq = oquant.dequant(lv, _q16(qtab["p8_dmf"]),
                         _qc(qtab["py_qpdiv6"], 2), 6)
    res = odct.idct8x8(deq.reshape(*lead, 2, 2, 8, 8))
    res_full = res.swapaxes(-3, -2).reshape(*lead, 16, 16)
    recon = jnp.clip(pred_tiles + res_full, 0, 255)
    z8 = jnp.asarray(tables.ZIGZAG8)
    blocks8_z = lv[..., z8]
    return recon, blocks8_z, cbp_bits


def encode_p_body(mb_h: int, mb_w: int, me_range: int,
                  y, u, v, ref_y, ref_u, ref_v, qtab, lam, mvp_seed,
                  subpel_steps=(2, 1), ref_prepadded: bool = False,
                  parts: bool = True, lossless: bool = False,
                  ref2_y=None, ref2_u=None, ref2_v=None,
                  n_refs: int = 1, t8: bool = False,
                  qp_map=None, qpc_map=None, decimate: bool = False,
                  rd: bool = False, p8x8: bool = False,
                  chroma_me: bool = False):
    """Encode one P frame (pre-deblock). All planes int32, MB-aligned;
    ref_* are the deblocked reference reconstruction. mvp_seed:
    (mb_h, mb_w, 2) qpel MV predictors for ME cost (previous frame's
    field). Returns the full per-MB output dict (see keys below).

    ref_prepadded: the caller already supplies PAD(=32, luma; 16 chroma)
    edge rows/cols around each ref plane — used by the MB-row-sharded
    path (parallel/rows.py), where the vertical pad of interior bands is
    *real halo pixels* from neighbor shards rather than edge replication
    (the i_mv_range_thread contract, encoder/encoder.c:557-578).

    n_refs=2: ref2_* is L0[1] (the older reference). ME runs per
    reference; the reference is chosen per MB at the full-pel stage
    (the i_ref loop of x264_mb_analyse_inter_p16x16,
    encoder/analyse.c:1100-1140) and all later fetches (sub-pel refine,
    partition search, MC) index the chosen reference's plane stack.
    Both partitions of a 16x8/8x16 MB share the MB's reference."""
    y = y.astype(I32)
    y_tiles = _tile16(y, mb_h, mb_w)
    u_tiles = u.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    v_tiles = v.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)

    # per-MB QP (variance AQ): replace the scalar-QP tables with row
    # gathers from the full 52-QP tables (intra CQMs for the intra-in-P
    # sweeps, inter CQMs for the MC residual paths)
    if qp_map is not None:
        from . import aq as eaq
        full = qtab["full"]
        qtab_i = dict(qtab)
        qtab_i.update(eaq.qtab_rows(full, qp_map.reshape(-1),
                                    qpc_map.reshape(-1), intra_cqm=True))
        qtab_p = dict(qtab)
        qtab_p.update(eaq.qtab_rows(full, qp_map, qpc_map,
                                    intra_cqm=False, inter_tabs=True))
        if qtab.get("trellis") is not None:
            # AQ trellis: per-MB QP rows into the 52-QP const stacks
            qtab_p["trellis_qp"] = qp_map
            qtab_p["trellis_qpc"] = qpc_map
        # the intra sweeps stay deadzone-quantized (the reference
        # trellises intra too; deviation documented in ops/trellis.py)
        for k in ("trellis", "trellis8", "trellis_pc", "trellis_pc_dc"):
            qtab_i.pop(k, None)
    else:
        qtab_i = qtab_p = qtab

    # ---------------------------------------------------------- stage 1: ME
    ref_pad = (ref_y.astype(I32) if ref_prepadded
               else omc.pad_plane(ref_y.astype(I32)))
    planes = omc.hpel_planes(ref_pad)
    mv_fp, sad_fp = ome.hier_search(y, ref_pad, mb_h, mb_w, me_range,
                                    lam, mvp_seed)
    if n_refs == 2:
        ref2_pad = (ref2_y.astype(I32) if ref_prepadded
                    else omc.pad_plane(ref2_y.astype(I32)))
        mv_fp2, sad_fp2 = ome.hier_search(y, ref2_pad, mb_h, mb_w,
                                          me_range, lam, mvp_seed)
        # per-MB reference choice at full-pel: SAD + MV bits + one bit
        # of ref_idx cost biasing toward L0[0] (REF_COST semantics,
        # encoder/analyse.c:1107)
        c_r0 = sad_fp + lam * ome.mv_cost_bits(mv_fp, mvp_seed)
        c_r1 = sad_fp2 + lam * (ome.mv_cost_bits(mv_fp2, mvp_seed) + 1)
        sel = (c_r1 < c_r0).astype(I32)          # (mb_h, mb_w)
        mv_fp = jnp.where((sel == 1)[..., None], mv_fp2, mv_fp)
        sad_fp = jnp.where(sel == 1, sad_fp2, sad_fp)
        planes = jnp.concatenate([planes, omc.hpel_planes(ref2_pad)], 0)
        refs_pad = jnp.stack([ref_pad, ref2_pad])
        ref_bits = sel
    else:
        sel = None
        refs_pad = ref_pad
        ref_bits = 0
    if subpel_steps:
        mv, satd_inter = ome.subpel_refine(y_tiles, planes, mv_fp, lam,
                                           mvp_seed, steps=subpel_steps,
                                           ref_sel=sel)
        if chroma_me:
            # b_chroma_me (refine_subpel chroma term, encoder/me.c:61):
            # re-rank the winner's qpel diamond with U/V SATD
            # included; the kept cost stays luma-only (see
            # ome.chroma_rerank)
            cme_u = (ref_u.astype(I32) if ref_prepadded
                     else omc.pad_plane(ref_u.astype(I32),
                                        omc.PAD // 2))
            cme_v = (ref_v.astype(I32) if ref_prepadded
                     else omc.pad_plane(ref_v.astype(I32),
                                        omc.PAD // 2))
            if n_refs == 2:
                cme_u = jnp.stack([
                    cme_u, ref2_u.astype(I32) if ref_prepadded
                    else omc.pad_plane(ref2_u.astype(I32),
                                       omc.PAD // 2)])
                cme_v = jnp.stack([
                    cme_v, ref2_v.astype(I32) if ref_prepadded
                    else omc.pad_plane(ref2_v.astype(I32),
                                       omc.PAD // 2)])
            mv, satd_inter = ome.chroma_rerank(
                y_tiles, planes, u_tiles, v_tiles, cme_u, cme_v,
                mv, lam, mvp_seed, ref_sel=sel,
                center_satd=satd_inter)
    else:      # subme 1: full-pel only (cost stays SAD-comparable)
        mv, satd_inter = mv_fp, sad_fp
    cost16 = satd_inter + lam * (ome.mv_cost_bits(mv, mvp_seed) + 1
                                 + ref_bits)

    ys = jnp.arange(mb_h, dtype=I32)[:, None] * 16 \
        + jnp.zeros((1, mb_w), I32)
    xs = jnp.arange(mb_w, dtype=I32)[None, :] * 16 \
        + jnp.zeros((mb_h, 1), I32)

    # --------------------------- stage 1b: 16x8 / 8x16 partition search
    # (inter_p16x8 / p8x16, encoder/analyse.c:1274-1404 — window search
    # seeded by the MB winner, then sub-pel SATD refine per partition)
    parts = parts and bool(subpel_steps)
    p8x8 = p8x8 and parts
    if parts:
        pf = ome.partition_fullpel(y_tiles, refs_pad, mv_fp, lam,
                                   mvp_seed, me_range, ref_sel=sel,
                                   with_8x8=p8x8)
        # both partitions of each split refined in ONE batched call
        # (leading axis 2), halving the gather/SATD dispatch count
        sel2s = None if sel is None else jnp.stack([sel, sel])
        mvp2 = jnp.stack([mvp_seed, mvp_seed])
        mv_tb, satd_tb = ome.subpel_refine_blocks(
            jnp.stack([y_tiles[..., :8, :], y_tiles[..., 8:, :]]),
            planes, jnp.stack([pf["t"], pf["b"]]), lam, mvp2,
            jnp.stack([ys, ys + 8]), jnp.stack([xs, xs]),
            8, 16, subpel_steps, ref_sel=sel2s)
        mv_lr, satd_lr = ome.subpel_refine_blocks(
            jnp.stack([y_tiles[..., :, :8], y_tiles[..., :, 8:]]),
            planes, jnp.stack([pf["l"], pf["r"]]), lam, mvp2,
            jnp.stack([ys, ys]), jnp.stack([xs, xs + 8]),
            16, 8, subpel_steps, ref_sel=sel2s)
        mv_t, mv_b = mv_tb[0], mv_tb[1]
        satd_t, satd_b = satd_tb[0], satd_tb[1]
        mv_l, mv_r = mv_lr[0], mv_lr[1]
        satd_l, satd_r = satd_lr[0], satd_lr[1]
        cost_168 = satd_t + satd_b + lam * (
            ome.mv_cost_bits(mv_t, mvp_seed)
            + ome.mv_cost_bits(mv_b, mvp_seed) + 3 + 2 * ref_bits)
        cost_816 = satd_l + satd_r + lam * (
            ome.mv_cost_bits(mv_l, mvp_seed)
            + ome.mv_cost_bits(mv_r, mvp_seed) + 3 + 2 * ref_bits)
        cost_list = [cost16, cost_168, cost_816]
        if p8x8:
            # P8x8: one batched sub-pel refine over the 4 quadrants
            # (x264_mb_analyse_inter_p8x8, encoder/analyse.c:1222-1272;
            # sub_mb_type fixed at L0_8x8 — no sub-8x8 splits)
            quads = jnp.stack([y_tiles[..., :8, :8], y_tiles[..., :8, 8:],
                               y_tiles[..., 8:, :8], y_tiles[..., 8:, 8:]])
            sel4 = None if sel is None else jnp.stack([sel] * 4)
            mvp4 = jnp.stack([mvp_seed] * 4)
            qys = jnp.stack([ys, ys, ys + 8, ys + 8])
            qxs = jnp.stack([xs, xs + 8, xs, xs + 8])
            mv_q, satd_q = ome.subpel_refine_blocks(
                quads, planes,
                jnp.stack([pf["q0"], pf["q1"], pf["q2"], pf["q3"]]),
                lam, mvp4, qys, qxs, 8, 8, subpel_steps, ref_sel=sel4)
            # mb_type ue(3)=5 bits + 4 sub_mb_type '1' bits
            cost_8x8 = satd_q.sum(0) + lam * (
                sum(ome.mv_cost_bits(mv_q[k], mvp_seed)
                    for k in range(4)) + 9 + 4 * ref_bits)
            cost_list.append(cost_8x8)
        costs = jnp.stack(cost_list)
        ptype = jnp.argmin(costs, axis=0).astype(I32)
        cost_inter = jnp.min(costs, axis=0)
    else:
        mv_t = mv_b = mv_l = mv_r = mv
        ptype = jnp.zeros((mb_h, mb_w), I32)
        cost_inter = cost16
    if not p8x8:
        mv_q = jnp.stack([mv] * 4)

    # partition MVs as (mb_h, mb_w, 2 parts, 2) — slot 0/1 per ptype
    mv_p0 = jnp.where((ptype == 1)[..., None], mv_t,
                      jnp.where((ptype == 2)[..., None], mv_l, mv))
    mv_p1 = jnp.where((ptype == 1)[..., None], mv_b,
                      jnp.where((ptype == 2)[..., None], mv_r, mv))

    # per-4x4 MV field from the partition layout (basis for MC maps,
    # deblock bS and exact MV prediction)
    br = jnp.arange(4, dtype=I32)
    in_p1 = jnp.where((ptype == 1)[..., None, None],
                      (br[:, None] >= 2),            # bottom rows
                      jnp.where((ptype == 2)[..., None, None],
                                (br[None, :] >= 2),  # right cols
                                jnp.zeros((4, 4), bool)))
    mv_blk = jnp.where(in_p1[..., None], mv_p1[:, :, None, None, :],
                       mv_p0[:, :, None, None, :])   # (mbh,mbw,4,4,2)
    # 4x4 cell -> 8x8 quadrant index (TL,TR,BL,BR)
    quad_idx = ((br[:, None] >= 2).astype(I32) * 2
                + (br[None, :] >= 2).astype(I32))    # (4,4)
    if p8x8:
        mv_q_mb = jnp.moveaxis(mv_q, 0, 2)           # (mbh,mbw,4,2)
        mv_blk = jnp.where((ptype == 3)[..., None, None, None],
                           mv_q_mb[:, :, quad_idx], mv_blk)

    # ------------------------------------------------- stage 2: inter path
    ref_u_pad = (ref_u.astype(I32) if ref_prepadded
                 else omc.pad_plane(ref_u.astype(I32), omc.PAD // 2))
    ref_v_pad = (ref_v.astype(I32) if ref_prepadded
                 else omc.pad_plane(ref_v.astype(I32), omc.PAD // 2))
    if n_refs == 2:
        ref_u_pad = jnp.stack([
            ref_u_pad, ref2_u.astype(I32) if ref_prepadded
            else omc.pad_plane(ref2_u.astype(I32), omc.PAD // 2)])
        ref_v_pad = jnp.stack([
            ref_v_pad, ref2_v.astype(I32) if ref_prepadded
            else omc.pad_plane(ref2_v.astype(I32), omc.PAD // 2)])

    def mcl(ys_, xs_, mv_, bh_, bw_):
        return omc.mc_luma(planes, ys_, xs_, mv_, bh_, bw_, ref_sel=sel)

    def mcc(cpad, ys_, xs_, mv_, bh_, bw_):
        return omc.mc_chroma(cpad, ys_, xs_, mv_, bh_, bw_, ref_sel=sel)

    pred16 = mcl(ys, xs, mv, 16, 16)
    pred_u16 = mcc(ref_u_pad, ys >> 1, xs >> 1, mv, 8, 8)
    pred_v16 = mcc(ref_v_pad, ys >> 1, xs >> 1, mv, 8, 8)
    if parts:
        p168 = jnp.concatenate([
            mcl(ys, xs, mv_t, 8, 16),
            mcl(ys + 8, xs, mv_b, 8, 16)], axis=-2)
        p816 = jnp.concatenate([
            mcl(ys, xs, mv_l, 16, 8),
            mcl(ys, xs + 8, mv_r, 16, 8)], axis=-1)
        sel1 = (ptype == 1)[..., None, None]
        sel2 = (ptype == 2)[..., None, None]
        pred_y = jnp.where(sel1, p168, jnp.where(sel2, p816, pred16))
        pu168 = jnp.concatenate([
            mcc(ref_u_pad, ys >> 1, xs >> 1, mv_t, 4, 8),
            mcc(ref_u_pad, (ys >> 1) + 4, xs >> 1, mv_b, 4, 8)],
            axis=-2)
        pv168 = jnp.concatenate([
            mcc(ref_v_pad, ys >> 1, xs >> 1, mv_t, 4, 8),
            mcc(ref_v_pad, (ys >> 1) + 4, xs >> 1, mv_b, 4, 8)],
            axis=-2)
        pu816 = jnp.concatenate([
            mcc(ref_u_pad, ys >> 1, xs >> 1, mv_l, 8, 4),
            mcc(ref_u_pad, ys >> 1, (xs >> 1) + 4, mv_r, 8, 4)],
            axis=-1)
        pv816 = jnp.concatenate([
            mcc(ref_v_pad, ys >> 1, xs >> 1, mv_l, 8, 4),
            mcc(ref_v_pad, ys >> 1, (xs >> 1) + 4, mv_r, 8, 4)],
            axis=-1)
        pred_u = jnp.where(sel1, pu168, jnp.where(sel2, pu816, pred_u16))
        pred_v = jnp.where(sel1, pv168, jnp.where(sel2, pv816, pred_v16))
        if p8x8:
            py8 = jnp.concatenate([
                jnp.concatenate([mcl(ys, xs, mv_q[0], 8, 8),
                                 mcl(ys, xs + 8, mv_q[1], 8, 8)],
                                axis=-1),
                jnp.concatenate([mcl(ys + 8, xs, mv_q[2], 8, 8),
                                 mcl(ys + 8, xs + 8, mv_q[3], 8, 8)],
                                axis=-1)], axis=-2)
            cy, cx = ys >> 1, xs >> 1

            def cquad(cpad):
                return jnp.concatenate([
                    jnp.concatenate([mcc(cpad, cy, cx, mv_q[0], 4, 4),
                                     mcc(cpad, cy, cx + 4, mv_q[1],
                                         4, 4)], axis=-1),
                    jnp.concatenate([mcc(cpad, cy + 4, cx, mv_q[2],
                                         4, 4),
                                     mcc(cpad, cy + 4, cx + 4, mv_q[3],
                                         4, 4)], axis=-1)], axis=-2)

            sel3 = (ptype == 3)[..., None, None]
            pred_y = jnp.where(sel3, py8, pred_y)
            pred_u = jnp.where(sel3, cquad(ref_u_pad), pred_u)
            pred_v = jnp.where(sel3, cquad(ref_v_pad), pred_v)
    else:
        pred_y, pred_u, pred_v = pred16, pred_u16, pred_v16

    decim = decimate and not lossless
    rd = rd and not lossless and qtab.get("rdbits") is not None
    if rd:
        from ..ops import rdcost as ordc
        rb = qtab["rdbits"]
        lam2 = qtab["rd_lam2"]
        # psy-RD (ssd_plane psy term, encoder/rdo.c:107-130): charge
        # the absolute AC-complexity difference between source and
        # reconstruction, scaled by f_psy_rd * lambda / 256
        psy = qtab.get("psy_rd")
        ce_psy = opix.ac_energy(y_tiles).astype(jnp.float32) \
            if psy is not None else None

        def psy_term(recon):
            if psy is None:
                return 0.0
            return psy * jnp.abs(
                opix.ac_energy(recon).astype(jnp.float32) - ce_psy)
    recon_inter_y, inter_blocks_z, inter_cbp = inter_luma_residual(
        y_tiles, pred_y, qtab_p, lossless, decimate=decim)
    if rd:
        bits4 = ordc.residual_bits_f8(
            inter_blocks_z.reshape(-1, 16), rb["cat2"]) \
            .reshape(mb_h, mb_w, 16).sum(-1)
        ssd4 = ordc.ssd_tiles(y_tiles, recon_inter_y) \
            + psy_term(recon_inter_y)
    if t8 and not lossless:
        # adaptive transform size (x264_mb_analyse_transform,
        # encoder/analyse.c:2109 / _rd:2127): under the RD ladder the
        # choice is true ssd + lambda2*bits of both residual codings;
        # otherwise the SA8D-vs-SATD heuristic
        recon8, blocks8_z, cbp8 = inter_luma_residual8(
            y_tiles, pred_y, qtab_p, decimate=decim)
        if rd:
            bits8 = ordc.residual_bits_f8(
                blocks8_z.reshape(-1, 64), rb["cat5"]) \
                .reshape(mb_h, mb_w, 4).sum(-1)
            ssd8 = ordc.ssd_tiles(y_tiles, recon8) + psy_term(recon8)
            t8_sel = ssd8 + lam2 * bits8 < ssd4 + lam2 * bits4
        else:
            t8_sel = opix.sa8d_16x16(y_tiles, pred_y) \
                < opix.satd(y_tiles, pred_y)
        m8 = t8_sel[..., None, None]
        recon_inter_y = jnp.where(m8, recon8, recon_inter_y)
        inter_blocks_z = jnp.where(m8, 0, inter_blocks_z)
        inter_cbp = jnp.where(t8_sel, cbp8, inter_cbp)
        if rd:
            luma_bits_i = jnp.where(t8_sel, bits8, bits4)
            luma_ssd_i = jnp.where(t8_sel, ssd8, ssd4)
    else:
        t8_sel = jnp.zeros((mb_h, mb_w), bool)
        blocks8_z = jnp.zeros((mb_h, mb_w, 4, 64), I32)
        if rd:
            luma_bits_i, luma_ssd_i = bits4, ssd4
    if decim:
        # joint two-channel chroma AC decimation, inter MBs only
        # (encoder/macroblock.c:320-332: score < 7 zeroes the AC of
        # both channels, the 2x2 DC always survives)
        au = eintra.chroma_ac_scan(u_tiles, pred_u, qtab_p, "pc")
        av = eintra.chroma_ac_scan(v_tiles, pred_v, qtab_p, "pc")
        csc = (oquant.decimate_score(au[..., 1:],
                                     oquant.DECIMATE_TAB4).sum(-1)
               + oquant.decimate_score(av[..., 1:],
                                       oquant.DECIMATE_TAB4).sum(-1))
        ac_kill = csc < 7
    else:
        ac_kill = None
    iru, idcu, iacu, inzau, inzdu = eintra.chroma_residual(
        u_tiles, pred_u, qtab_p, "pc", lossless, ac_kill=ac_kill)
    irv, idcv, iacv, inzav, inzdv = eintra.chroma_residual(
        v_tiles, pred_v, qtab_p, "pc", lossless, ac_kill=ac_kill)
    if rd:
        # whole-MB inter RD cost (x264_rd_cost_mb, encoder/rdo.c:139):
        # true SSD of the reconstruction + lambda2 * estimated bits of
        # residual levels, chroma DC/AC, and the mode/ref/mvd header
        cbits_i = (ordc.residual_bits_f8(
                       iacu.reshape(-1, 16)[:, 1:], rb["cat4"])
                   + ordc.residual_bits_f8(
                       iacv.reshape(-1, 16)[:, 1:], rb["cat4"])) \
            .reshape(mb_h, mb_w, 4).sum(-1)
        cdcb_i = (ordc.residual_bits_f8(idcu.reshape(-1, 4), rb["cat3"])
                  + ordc.residual_bits_f8(idcv.reshape(-1, 4),
                                          rb["cat3"])) \
            .reshape(mb_h, mb_w)
        chroma_ssd_i = (ordc.ssd_tiles(u_tiles, iru)
                        + ordc.ssd_tiles(v_tiles, irv))
        hdr_bits = (ome.mv_cost_bits(mv_p0, mvp_seed) + 4 + ref_bits
                    + jnp.where(ptype != 0,
                                ome.mv_cost_bits(mv_p1, mvp_seed)
                                + 2 + ref_bits, 0)).astype(jnp.float32)
        if p8x8:
            hdr8 = (sum(ome.mv_cost_bits(mv_q[k], mvp_seed)
                        for k in range(4))
                    + 9 + 4 * ref_bits).astype(jnp.float32)
            hdr_bits = jnp.where(ptype == 3, hdr8, hdr_bits)
        rd_cost_inter = (luma_ssd_i + chroma_ssd_i
                         + lam2 * (luma_bits_i + cbits_i + cdcb_i
                                   + 256.0 * hdr_bits))

    # ------------------- stage 3: intra-in-P by bounded-depth sweeps
    # The reference decides intra-vs-inter per MB inside the sequential
    # slice loop because intra prediction reads neighbor reconstruction.
    # TPU re-staging: (1) evaluate the I16 intra path for ALL MBs at once
    # with neighbors taken from the inter reconstruction (known in
    # parallel); (2) fix the intra/inter decision from those costs,
    # demoting intra MBs whose left/top/topleft *intra* dependency chain
    # is deeper than K_SWEEPS back to inter (rare in P frames — a mostly
    # intra frame becomes an IDR via scenecut anyway); (3) run K_SWEEPS
    # full-frame re-evaluations — after sweep t every kept intra MB with
    # chain depth <= t has bit-exact reconstruction, since depth-1 MBs
    # see only inter/border neighbors. Replaces a (mb_h+mb_w-1)-step
    # sequential wavefront with K fully parallel passes.
    K_SWEEPS = 3
    nK = mb_h * mb_w
    grid_y = jnp.arange(mb_h, dtype=I32)[:, None] + jnp.zeros((1, mb_w), I32)
    grid_x = jnp.arange(mb_w, dtype=I32)[None, :] + jnp.zeros((mb_h, 1), I32)
    ht_g = (grid_y > 0).reshape(nK)
    hl_g = (grid_x > 0).reshape(nK)
    fenc_flat = y_tiles.reshape(nK, 16, 16)
    fu_flat = u_tiles.reshape(nK, 8, 8)
    fv_flat = v_tiles.reshape(nK, 8, 8)

    def up(a, fill=0):
        return jnp.concatenate(
            [jnp.full_like(a[:1], fill), a[:-1]], axis=0)

    def lf(a, fill=0):
        return jnp.concatenate(
            [jnp.full_like(a[:, :1], fill), a[:, :-1]], axis=1)

    def eval_intra(ty, tu, tv, mode_sel=None, cmode_sel=None):
        """One parallel sweep: full I16 + chroma intra path for every MB
        against the current reconstruction state (grids of tiles)."""
        top = up(ty)[:, :, 15, :].reshape(nK, 16)
        left = lf(ty)[:, :, :, 15].reshape(nK, 16)
        topleft = lf(up(ty))[:, :, 15, 15].reshape(nK)
        lp = eintra.luma_i16_path(fenc_flat, top, left, topleft,
                                  ht_g, hl_g, qtab_i, lam, lossless,
                                  mode_sel=mode_sel, decimate=decim)
        pu = opred.predict_8x8c(up(tu)[:, :, 7, :].reshape(nK, 8),
                                lf(tu)[:, :, :, 7].reshape(nK, 8),
                                lf(up(tu))[:, :, 7, 7].reshape(nK),
                                ht_g, hl_g)
        pv = opred.predict_8x8c(up(tv)[:, :, 7, :].reshape(nK, 8),
                                lf(tv)[:, :, :, 7].reshape(nK, 8),
                                lf(up(tv))[:, :, 7, 7].reshape(nK),
                                ht_g, hl_g)
        if cmode_sel is None:
            cavail = opred.mode_available_8x8c(ht_g, hl_g)
            ccost = jnp.where(cavail, opix.satd(fu_flat[:, None], pu)
                              + opix.satd(fv_flat[:, None], pv), _BIG)
            cmode = jnp.argmin(ccost, axis=-1).astype(I32)
        else:
            cmode = cmode_sel
        cpu = jnp.take_along_axis(pu, cmode[:, None, None, None], 1)[:, 0]
        cpv = jnp.take_along_axis(pv, cmode[:, None, None, None], 1)[:, 0]
        ru, dcu, acu, _, _ = eintra.chroma_residual(fu_flat, cpu, qtab_i,
                                                    "c", lossless)
        rv, dcv, acv, _, _ = eintra.chroma_residual(fv_flat, cpv, qtab_i,
                                                    "c", lossless)
        return lp, cmode, ru, rv, dcu, dcv, acu, acv

    recon_u_tiles = iru
    recon_v_tiles = irv
    ty, tu, tv = recon_inter_y, recon_u_tiles, recon_v_tiles
    intra_mb = None
    lp = cmode = ru = rv = dcu = dcv = acu = acv = None
    mode_fix = cmode_fix = None
    for t in range(K_SWEEPS):
        lp, cmode, ru, rv, dcu, dcv, acu, acv = eval_intra(
            ty, tu, tv, mode_fix, cmode_fix)
        if mode_fix is None:
            mode_fix, cmode_fix = lp["mode"], cmode
        if intra_mb is None:
            # decision pass: fix the choice, then demote unresolvable
            # deep chains (depth > K_SWEEPS). Under the RD ladder
            # (subme >= 6) the comparison is true whole-MB
            # ssd + lambda2*bits on both sides (x264_intra_rd,
            # encoder/analyse.c:845); below it, SATD + lambda*bits.
            if rd:
                ibits = (ordc.residual_bits_f8(lp["dc_z"], rb["cat0"])
                         + ordc.residual_bits_f8(
                             lp["ac_z"].reshape(-1, 16)[:, 1:],
                             rb["cat1"]).reshape(nK, 16).sum(-1)
                         + ordc.residual_bits_f8(
                             jnp.concatenate([acu, acv], 0)
                             .reshape(-1, 16)[:, 1:], rb["cat4"])
                         .reshape(2, nK, 4).sum(axis=(0, 2))
                         + ordc.residual_bits_f8(
                             jnp.concatenate([dcu, dcv], 0)
                             .reshape(-1, 4), rb["cat3"])
                         .reshape(2, nK).sum(0))
                issd = (ordc.ssd_tiles(fenc_flat, lp["recon"])
                        + ordc.ssd_tiles(fu_flat, ru)
                        + ordc.ssd_tiles(fv_flat, rv))
                if psy is not None:
                    issd = issd + psy * jnp.abs(
                        opix.ac_energy(lp["recon"]).astype(jnp.float32)
                        - ce_psy.reshape(nK))
                # ~9 bits of I16 mb_type (pred+cbp folded in, P-slice
                # ue) + chroma pred mode
                cost_i_rd = issd + lam2 * (ibits + 256.0 * 9)
                choose = (cost_i_rd < rd_cost_inter.reshape(nK)) \
                    .reshape(mb_h, mb_w)
            else:
                choose = (lp["cost"] + lam * INTRA_PEN_BITS
                          < cost_inter.reshape(nK)).reshape(mb_h, mb_w)
            resolved = ~choose
            for _ in range(K_SWEEPS):
                resolved = resolved | (choose
                                       & up(resolved, True)
                                       & lf(resolved, True)
                                       & up(lf(resolved, True), True))
            intra_mb = choose & resolved
        m = intra_mb[..., None, None]
        ty = jnp.where(m, lp["recon"].reshape(mb_h, mb_w, 16, 16),
                       recon_inter_y)
        tu = jnp.where(m, ru.reshape(mb_h, mb_w, 8, 8), recon_u_tiles)
        tv = jnp.where(m, rv.reshape(mb_h, mb_w, 8, 8), recon_v_tiles)

    state = dict(
        ty=ty, tu=tu, tv=tv,
        mode16=jnp.where(intra_mb, lp["mode"].reshape(mb_h, mb_w), 0),
        modec=jnp.where(intra_mb, cmode.reshape(mb_h, mb_w), 0),
        luma_dc=jnp.where(intra_mb[..., None],
                          lp["dc_z"].reshape(mb_h, mb_w, 16), 0),
        luma_ac=jnp.where(intra_mb[..., None, None],
                          lp["ac_z"].reshape(mb_h, mb_w, 16, 16), 0),
        chroma_dc=jnp.where(intra_mb[..., None, None],
                            jnp.stack([dcu, dcv], 1)
                            .reshape(mb_h, mb_w, 2, 4), 0),
        chroma_ac=jnp.where(intra_mb[..., None, None, None],
                            jnp.stack([acu, acv], 1)
                            .reshape(mb_h, mb_w, 2, 4, 16), 0),
    )

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

    # final per-block maps (the macroblock_cache_save analogue): intra
    # blocks carry mv 0 / ref -1 / mvd 0
    from . import mvpred
    im1 = intra_mb[..., None]
    mv_blk_final = jnp.where(intra_mb[..., None, None, None], 0, mv_blk)
    ref_sel_map = (jnp.zeros((mb_h, mb_w), I32) if sel is None
                   else jnp.where(intra_mb, 0, sel))
    ref_map = jnp.where(intra_mb, -1, ref_sel_map).astype(I32)
    ref4 = jnp.repeat(jnp.repeat(ref_map, 4, 0), 4, 1)
    mv4 = mv_blk_final.swapaxes(1, 2).reshape(mb_h * 4, mb_w * 4, 2)

    # exact per-partition MV prediction on the final maps
    # (x264_mb_predict_mv / _pskip, common/macroblock.c:28-153);
    # i_ref is the MB's own chosen reference — neighbor ref matching
    # works on actual ref_idx values
    mvp16 = mvpred.predict_16x16(ref4, mv4, i_ref=ref_sel_map)
    mv_skip = mvpred.predict_pskip(ref4, mv4)
    ptype_f = jnp.where(intra_mb, 0, ptype)
    mv16_final = jnp.where(im1, 0, mv)
    mv_p0f = jnp.where(im1, 0, mv_p0)
    mv_p1f = jnp.where(im1, 0, mv_p1)
    if parts:
        mvp_t_, mvp_b_ = mvpred.predict_16x8(ref4, mv4,
                                             i_ref=ref_sel_map)
        mvp_l_, mvp_r_ = mvpred.predict_8x16(ref4, mv4,
                                             i_ref=ref_sel_map)
        mvd0 = jnp.where((ptype_f == 1)[..., None], mv_p0f - mvp_t_,
                         jnp.where((ptype_f == 2)[..., None],
                                   mv_p0f - mvp_l_, mv16_final - mvp16))
        mvd1 = jnp.where((ptype_f == 1)[..., None], mv_p1f - mvp_b_,
                         jnp.where((ptype_f == 2)[..., None],
                                   mv_p1f - mvp_r_, 0))
    else:
        mvd0 = mv16_final - mvp16
        mvd1 = jnp.zeros_like(mvd0)
    if p8x8:
        # P_8x8 sub-block mvds against the exact per-sub medians
        mvp_subs = mvpred.predict_p8x8(ref4, mv4, i_ref=ref_sel_map)
        is8 = (ptype_f == 3)[..., None, None]
        mvd_sub = jnp.stack(
            [mv_q_mb[:, :, k] - mvp_subs[k] for k in range(4)], axis=2)
        mvd_sub = jnp.where(is8, mvd_sub, 0)
        mv_sub = jnp.where(is8, mv_q_mb, 0)
        mvd0 = jnp.where((ptype_f == 3)[..., None], 0, mvd0)
        mvd1 = jnp.where((ptype_f == 3)[..., None], 0, mvd1)
    else:
        mvd_sub = jnp.zeros((mb_h, mb_w, 4, 2), I32)
        mv_sub = jnp.zeros((mb_h, mb_w, 4, 2), I32)
    mvd0 = jnp.where(im1, 0, mvd0)
    # P_SKIP implies ref_idx 0 (spec 8.4.1.1) — a ref-1 MB cannot skip
    skip = (~intra_mb) & (ptype_f == 0) & (cbp_luma_bits == 0) \
        & (cbp_chroma == 0) & (ref_sel_map == 0) \
        & jnp.all(mv16_final == mv_skip, axis=-1)

    # per-4x4 mvd map for the CABAC context derivation
    # (x264_cabac_mb_mvd_cpn amvd, encoder/cabac.c:397-401); skip MBs
    # cache mvd 0
    ns = (~skip)[..., None, None, None]
    mvd_blk = jnp.where(in_p1[..., None], mvd1[:, :, None, None, :],
                        mvd0[:, :, None, None, :]) * ns
    if p8x8:
        mvd_blk = jnp.where((ptype_f == 3)[..., None, None, None],
                            mvd_sub[:, :, quad_idx], mvd_blk)
    mvd_blk = jnp.where(intra_mb[..., None, None, None], 0, mvd_blk)
    mvd4 = mvd_blk.swapaxes(1, 2).reshape(mb_h * 4, mb_w * 4, 2)

    # transform_size_8x8_flag is only present when CBP luma is nonzero
    # (encoder/cabac.c:975-977); an uncoded MB decodes as 4x4, so the
    # effective map must match for deblock/context purposes
    t8_mb = t8_sel & (~intra_mb) & (~skip) & (cbp_luma_bits > 0)

    # ---------------------------------------------- deblock input maps
    nnz_cnt = jnp.count_nonzero(luma_blocks, axis=-1).astype(I32)
    blk_coded = jnp.where(
        intra_mb[..., None], cbp_i16[..., None].astype(I32),
        (cbp_luma_bits[..., None]
         >> (jnp.arange(16, dtype=I32) // 4)) & 1)
    nnz_z = nnz_cnt * blk_coded                     # z-scan order
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    nnz_raster = jnp.zeros_like(nnz_z).at[..., R].set(nnz_z)
    if t8:
        # each 4x4 cell of an 8x8-transform MB carries the covering
        # 8x8 block's coefficient count (munge_cavlc_nnz semantics,
        # common/frame.c:362 — bS and cbf contexts read these)
        nnz8_cnt = jnp.count_nonzero(blocks8_z, axis=-1).astype(I32)
        nnz8_cells = jnp.repeat(jnp.repeat(
            nnz8_cnt.reshape(mb_h, mb_w, 2, 2), 2, axis=-2), 2, axis=-1)
        nnz_raster = jnp.where(t8_mb[..., None],
                               nnz8_cells.reshape(mb_h, mb_w, 16),
                               nnz_raster)
    # intra MBs additionally carry the I16 DC nnz (munge_cavlc_nnz
    # semantics, common/frame.c:362) — irrelevant for bS (intra => bS>=3)
    nnz4 = nnz_raster.reshape(mb_h, mb_w, 4, 4).swapaxes(1, 2) \
        .reshape(mb_h * 4, mb_w * 4)

    out = dict(
        t8_mb=t8_mb, luma8_z=blocks8_z,
        recon_y=_untile(state["ty"]),
        recon_u=_untile(state["tu"]),
        recon_v=_untile(state["tv"]),
        intra_mb=intra_mb, mode16=state["mode16"], modec=state["modec"],
        luma_dc=luma_dc, luma_blocks=luma_blocks,
        chroma_dc=chroma_dc, chroma_ac=chroma_ac,
        cbp_luma_bits=cbp_luma_bits, cbp_chroma=cbp_chroma,
        mv=mv16_final, mvd=mvd0, mvd1=mvd1, ptype=ptype_f,
        mv_sub=mv_sub, mvd_sub=mvd_sub,
        mvd4=mvd4, skip=skip,
        nnz4=nnz4, ref4=ref4, mv4=mv4, ref_idx=ref_sel_map,
    )
    # noise-reduction |coef| sums stashed by the residual passes
    # (x264 nr_residual_sum; consumed by Encoder._nr_update)
    for k in ("nr_sum4", "nr_sum8"):
        if qtab_p.get(k) is not None:
            out[k] = qtab_p[k]
    return out


def encode_b_body(mb_h: int, mb_w: int, me_range: int,
                  y, u, v, l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
                  qtab, lam, mvp_seed, subpel_steps=(2, 1),
                  lossless: bool = False,
                  col_ref4=None, col_mv4=None, mvp_seed_l1=None,
                  ref_prepadded: bool = False):
    """Encode one B frame (pre-deblock): B_SKIP / B_Direct_16x16 plus
    the 16x16 L0 / L1 / BI modes plus intra — the B ladder of
    x264_mb_analyse_b (encoder/analyse.c b16x16:1549 + direct:1515).

    l0_* is the past reference, l1_* the future reference (both
    deblocked reconstructions, MB-aligned). Bipred uses the plain
    rounding average (PPS weighted_bipred_idc 0, x264 pixel_avg).

    col_ref4/col_mv4: the colocated L0 maps of RefPicList1[0] (the
    future reference's per-4x4 ref/mv field) for the spatial-direct
    low-motion override; None disables direct/skip (e.g. unavailable
    colocated state). Direct selection is re-staged for TPU: derive
    the spatial-direct config for every MB from the provisional final
    maps, accept it where it is quadrant-uniform and cheaper, and
    resolve neighbor-dependency chains with bounded-depth parallel
    sweeps (the same scheme as intra-in-P) — deeper chains demote to
    the explicit 16x16 mode, which is always conformant.

    Returns the per-MB output dict (keys mirror encode_p_body with
    bmode/use_l0/use_l1/mvd_l1/direct_mb/per-list maps added).
    """
    y = y.astype(I32)
    y_tiles = _tile16(y, mb_h, mb_w)
    u_tiles = u.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    v_tiles = v.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)

    ys = jnp.arange(mb_h, dtype=I32)[:, None] * 16 \
        + jnp.zeros((1, mb_w), I32)
    xs = jnp.arange(mb_w, dtype=I32)[None, :] * 16 \
        + jnp.zeros((mb_h, 1), I32)

    # ---------------------------------------- stage 1: ME on both lists
    # (each list with its own distance-scaled seed; L1's points backward)
    if mvp_seed_l1 is None:
        mvp_seed_l1 = mvp_seed

    def me_list(ry, ru, rv, seed):
        ref_pad = (ry.astype(I32) if ref_prepadded
                   else omc.pad_plane(ry.astype(I32)))
        planes = omc.hpel_planes(ref_pad)
        mv_fp, sad_fp = ome.hier_search(y, ref_pad, mb_h, mb_w,
                                        me_range, lam, seed)
        if subpel_steps:
            mv, satd = ome.subpel_refine(y_tiles, planes, mv_fp, lam,
                                         seed, steps=subpel_steps)
        else:
            mv, satd = mv_fp, sad_fp
        pred = omc.mc_luma(planes, ys, xs, mv, 16, 16)
        ru_pad = (ru.astype(I32) if ref_prepadded
                  else omc.pad_plane(ru.astype(I32), omc.PAD // 2))
        rv_pad = (rv.astype(I32) if ref_prepadded
                  else omc.pad_plane(rv.astype(I32), omc.PAD // 2))
        pu = omc.mc_chroma(ru_pad, ys >> 1, xs >> 1, mv, 8, 8)
        pv = omc.mc_chroma(rv_pad, ys >> 1, xs >> 1, mv, 8, 8)
        return mv, satd, pred, pu, pv, (planes, ru_pad, rv_pad)

    mv0, satd0, pred0, pu0, pv0, fetch0 = me_list(l0_y, l0_u, l0_v,
                                                  mvp_seed)
    mv1, satd1, pred1, pu1, pv1, fetch1 = me_list(l1_y, l1_u, l1_v,
                                                  mvp_seed_l1)
    pred_bi = omc.avg(pred0, pred1)
    satd_bi = opix.satd(y_tiles, pred_bi)

    bits0 = ome.mv_cost_bits(mv0, mvp_seed)
    bits1 = ome.mv_cost_bits(mv1, mvp_seed_l1)
    # mb_type ue lengths: L0/L1 = 3 bits (ue 1/2), BI = 5 (ue 3)
    cost_l0 = satd0 + lam * (bits0 + 3)
    cost_l1 = satd1 + lam * (bits1 + 3)
    cost_bi = satd_bi + lam * (bits0 + bits1 + 5)
    costs = jnp.stack([cost_l0, cost_l1, cost_bi])
    bmode = jnp.argmin(costs, axis=0).astype(I32)   # 0=L0 1=L1 2=BI
    cost_inter = jnp.min(costs, axis=0)

    sel1 = (bmode == 1)[..., None, None]
    sel2 = (bmode == 2)[..., None, None]
    pred_y = jnp.where(sel2, pred_bi, jnp.where(sel1, pred1, pred0))
    pred_u = jnp.where(sel2, omc.avg(pu0, pu1),
                       jnp.where(sel1, pu1, pu0))
    pred_v = jnp.where(sel2, omc.avg(pv0, pv1),
                       jnp.where(sel1, pv1, pv0))

    # ------------------ stage 2: residual pass 1 (explicit modes only)
    # feeds the intra decision's neighbor reconstruction; the coded
    # residual is produced by pass 2 after direct selection. B slices
    # always DCT-decimate (b_decimate, encoder/macroblock.c:479)
    decim = not lossless
    recon_inter_y, _, _ = inter_luma_residual(
        y_tiles, pred_y, qtab, lossless, decimate=decim)
    iru, _, _, _, _ = eintra.chroma_residual(u_tiles, pred_u,
                                             qtab, "pc", lossless)
    irv, _, _, _, _ = eintra.chroma_residual(v_tiles, pred_v,
                                             qtab, "pc", lossless)

    # ------------------- stage 3: intra-in-B by bounded-depth sweeps
    # (same machinery as encode_p_body stage 3)
    K_SWEEPS = 3
    nK = mb_h * mb_w
    grid_y = jnp.arange(mb_h, dtype=I32)[:, None] + jnp.zeros((1, mb_w), I32)
    grid_x = jnp.arange(mb_w, dtype=I32)[None, :] + jnp.zeros((mb_h, 1), I32)
    ht_g = (grid_y > 0).reshape(nK)
    hl_g = (grid_x > 0).reshape(nK)
    fenc_flat = y_tiles.reshape(nK, 16, 16)
    fu_flat = u_tiles.reshape(nK, 8, 8)
    fv_flat = v_tiles.reshape(nK, 8, 8)

    def up(a, fill=0):
        return jnp.concatenate(
            [jnp.full_like(a[:1], fill), a[:-1]], axis=0)

    def lf(a, fill=0):
        return jnp.concatenate(
            [jnp.full_like(a[:, :1], fill), a[:, :-1]], axis=1)

    def eval_intra(ty, tu, tv, mode_sel=None, cmode_sel=None):
        top = up(ty)[:, :, 15, :].reshape(nK, 16)
        left = lf(ty)[:, :, :, 15].reshape(nK, 16)
        topleft = lf(up(ty))[:, :, 15, 15].reshape(nK)
        lp = eintra.luma_i16_path(fenc_flat, top, left, topleft,
                                  ht_g, hl_g, qtab, lam, lossless,
                                  mode_sel=mode_sel, decimate=decim)
        pu = opred.predict_8x8c(up(tu)[:, :, 7, :].reshape(nK, 8),
                                lf(tu)[:, :, :, 7].reshape(nK, 8),
                                lf(up(tu))[:, :, 7, 7].reshape(nK),
                                ht_g, hl_g)
        pv = opred.predict_8x8c(up(tv)[:, :, 7, :].reshape(nK, 8),
                                lf(tv)[:, :, :, 7].reshape(nK, 8),
                                lf(up(tv))[:, :, 7, 7].reshape(nK),
                                ht_g, hl_g)
        if cmode_sel is None:
            cavail = opred.mode_available_8x8c(ht_g, hl_g)
            ccost = jnp.where(cavail, opix.satd(fu_flat[:, None], pu)
                              + opix.satd(fv_flat[:, None], pv), _BIG)
            cmode = jnp.argmin(ccost, axis=-1).astype(I32)
        else:
            cmode = cmode_sel
        cpu = jnp.take_along_axis(pu, cmode[:, None, None, None], 1)[:, 0]
        cpv = jnp.take_along_axis(pv, cmode[:, None, None, None], 1)[:, 0]
        ru, dcu, acu, _, _ = eintra.chroma_residual(fu_flat, cpu, qtab,
                                                    "c", lossless)
        rv, dcv, acv, _, _ = eintra.chroma_residual(fv_flat, cpv, qtab,
                                                    "c", lossless)
        return lp, cmode, ru, rv, dcu, dcv, acu, acv

    # intra DECISION: one eval against the explicit-mode recon state,
    # then fix the choice + demote unresolvable chains (as in P)
    lp0 = eval_intra(recon_inter_y, iru, irv)[0]
    choose = (lp0["cost"] + lam * INTRA_PEN_BITS
              < cost_inter.reshape(nK)).reshape(mb_h, mb_w)
    resolved = ~choose
    for _ in range(K_SWEEPS):
        resolved = resolved | (choose
                               & up(resolved, True)
                               & lf(resolved, True)
                               & up(lf(resolved, True), True))
    intra_mb = choose & resolved

    # --------------- stage 3.5: B_SKIP / B_Direct_16x16 selection
    # (x264_mb_analyse_b direct branch; see docstring for the sweep
    # re-staging). Chosen-mode per-MB config first:
    from . import mvpred
    use_l0_c = (~intra_mb) & ((bmode == 0) | (bmode == 2))
    use_l1_c = (~intra_mb) & ((bmode == 1) | (bmode == 2))
    ref_l0_c = jnp.where(use_l0_c, 0, -1).astype(I32)
    ref_l1_c = jnp.where(use_l1_c, 0, -1).astype(I32)
    mv_l0_c = jnp.where(use_l0_c[..., None], mv0, 0)
    mv_l1_c = jnp.where(use_l1_c[..., None], mv1, 0)

    def exp4(a):
        return jnp.repeat(jnp.repeat(a, 4, axis=0), 4, axis=1)

    direct_mb = jnp.zeros((mb_h, mb_w), bool)
    cfg = dict(r0=ref_l0_c, r1=ref_l1_c, m0=mv_l0_c, m1=mv_l1_c)
    if col_ref4 is not None:
        planes0 = fetch0[0]
        planes1 = fetch1[0]
        # Cost decision from the provisional (chosen-mode) derivation:
        # MC + SATD once. The values coded are finalized below by an
        # exact wavefront, so a stale cost only affects mode quality,
        # never conformance.
        d0, d1, dm0, dm1, uni = mvpred.spatial_direct(
            exp4(ref_l0_c), exp4(mv_l0_c),
            exp4(ref_l1_c), exp4(mv_l1_c),
            col_ref4, col_mv4)
        du0 = d0 >= 0
        du1 = d1 >= 0
        dp0 = omc.mc_luma(planes0, ys, xs, dm0, 16, 16)
        dp1 = omc.mc_luma(planes1, ys, xs, dm1, 16, 16)
        dpred = jnp.where((du0 & du1)[..., None, None],
                          omc.avg(dp0, dp1),
                          jnp.where(du0[..., None, None], dp0, dp1))
        dcost = opix.satd(y_tiles, dpred) + lam
        want = (~intra_mb) & (dcost < cost_inter)

        # Exact sequential semantics via a slope-2 MB wavefront: the
        # derivation reads A/B/C/D neighbors (left, top-left, top,
        # top-right), so anti-diagonal d = 2y + x orders every MB
        # after all its dependencies. Each step re-derives (cheap
        # gathers + median — no MC) and commits that diagonal's MBs;
        # an MB whose FINAL derivation is not quadrant-uniform falls
        # back to its explicit mode at its own step.
        gym = jnp.arange(mb_h, dtype=I32)[:, None] \
            + jnp.zeros((1, mb_w), I32)
        gxm = jnp.arange(mb_w, dtype=I32)[None, :] \
            + jnp.zeros((mb_h, 1), I32)
        diag = 2 * gym + gxm

        def wave_step(carry, dstep):
            r0, r1, m0, m1, acc = carry
            e0, e1, em0, em1, euni = mvpred.spatial_direct(
                exp4(r0), exp4(m0), exp4(r1), exp4(m1),
                col_ref4, col_mv4)
            m = want & euni & (diag == dstep)
            carry = (jnp.where(m, e0, r0),
                     jnp.where(m, e1, r1),
                     jnp.where(m[..., None], em0, m0),
                     jnp.where(m[..., None], em1, m1),
                     acc | m)
            return carry, None

        init = (ref_l0_c, ref_l1_c, mv_l0_c, mv_l1_c, direct_mb)
        (r0f, r1f, m0f, m1f, direct_mb), _ = jax.lax.scan(
            wave_step, init,
            jnp.arange(2 * mb_h + mb_w - 2 + 1, dtype=I32))
        cfg = dict(r0=r0f, r1=r1f, m0=m0f, m1=m1f)

    # final per-MB prediction config (maps match the decoder cache)
    ref_l0, ref_l1 = cfg["r0"], cfg["r1"]
    mv_l0, mv_l1 = cfg["m0"], cfg["m1"]
    pu0_pf = ref_l0 >= 0            # prediction flags incl. direct
    pu1_pf = ref_l1 >= 0

    # ------------------ stage 3.6: residual pass 2 on the final pred
    if col_ref4 is not None:
        planes0, cu0, cv0 = fetch0
        planes1, cu1, cv1 = fetch1
        q0 = omc.mc_luma(planes0, ys, xs, mv_l0, 16, 16)
        q1 = omc.mc_luma(planes1, ys, xs, mv_l1, 16, 16)
        qu0 = omc.mc_chroma(cu0, ys >> 1, xs >> 1, mv_l0, 8, 8)
        qu1 = omc.mc_chroma(cu1, ys >> 1, xs >> 1, mv_l1, 8, 8)
        qv0 = omc.mc_chroma(cv0, ys >> 1, xs >> 1, mv_l0, 8, 8)
        qv1 = omc.mc_chroma(cv1, ys >> 1, xs >> 1, mv_l1, 8, 8)
        bi = (pu0_pf & pu1_pf)[..., None, None]
        u0 = pu0_pf[..., None, None]
        pred_y = jnp.where(bi, omc.avg(q0, q1), jnp.where(u0, q0, q1))
        pred_u = jnp.where(bi, omc.avg(qu0, qu1),
                           jnp.where(u0, qu0, qu1))
        pred_v = jnp.where(bi, omc.avg(qv0, qv1),
                           jnp.where(u0, qv0, qv1))
    recon_inter_y, inter_blocks_z, inter_cbp = inter_luma_residual(
        y_tiles, pred_y, qtab, lossless, decimate=decim)
    if decim:
        au = eintra.chroma_ac_scan(u_tiles, pred_u, qtab, "pc")
        av = eintra.chroma_ac_scan(v_tiles, pred_v, qtab, "pc")
        csc = (oquant.decimate_score(au[..., 1:],
                                     oquant.DECIMATE_TAB4).sum(-1)
               + oquant.decimate_score(av[..., 1:],
                                       oquant.DECIMATE_TAB4).sum(-1))
        ac_kill = csc < 7
    else:
        ac_kill = None
    iru, idcu, iacu, _, _ = eintra.chroma_residual(
        u_tiles, pred_u, qtab, "pc", lossless, ac_kill=ac_kill)
    irv, idcv, iacv, _, _ = eintra.chroma_residual(
        v_tiles, pred_v, qtab, "pc", lossless, ac_kill=ac_kill)

    # --------------- stage 3.7: intra value sweeps (decision fixed)
    ty, tu, tv = recon_inter_y, iru, irv
    lp = cmode = ru = rv = dcu = dcv = acu = acv = None
    mode_fix = cmode_fix = None
    for t in range(K_SWEEPS):
        lp, cmode, ru, rv, dcu, dcv, acu, acv = eval_intra(
            ty, tu, tv, mode_fix, cmode_fix)
        if mode_fix is None:
            mode_fix, cmode_fix = lp["mode"], cmode
        m = intra_mb[..., None, None]
        ty = jnp.where(m, lp["recon"].reshape(mb_h, mb_w, 16, 16),
                       recon_inter_y)
        tu = jnp.where(m, ru.reshape(mb_h, mb_w, 8, 8), iru)
        tv = jnp.where(m, rv.reshape(mb_h, mb_w, 8, 8), irv)

    im = intra_mb[..., None, None]
    im1 = intra_mb[..., None]
    luma_blocks = jnp.where(im, lp["ac_z"].reshape(mb_h, mb_w, 16, 16),
                            inter_blocks_z)
    luma_dc = jnp.where(im1, lp["dc_z"].reshape(mb_h, mb_w, 16), 0)
    chroma_dc = jnp.where(im,
                          jnp.stack([dcu, dcv], 1)
                          .reshape(mb_h, mb_w, 2, 4),
                          jnp.stack([idcu, idcv], axis=2))
    chroma_ac = jnp.where(im[..., None],
                          jnp.stack([acu, acv], 1)
                          .reshape(mb_h, mb_w, 2, 4, 16),
                          jnp.stack([iacu, iacv], axis=2))

    cbp_i16 = jnp.any(lp["ac_z"].reshape(mb_h, mb_w, 16, 16) != 0,
                      axis=(-2, -1))
    cbp_luma_bits = jnp.where(intra_mb,
                              jnp.where(cbp_i16, 15, 0), inter_cbp)
    cnz_ac = jnp.any(chroma_ac != 0, axis=(-3, -2, -1))
    cnz_dc = jnp.any(chroma_dc != 0, axis=(-2, -1))
    cbp_chroma = jnp.where(cnz_ac, 2, jnp.where(cnz_dc, 1, 0)).astype(I32)

    # --------------------------- stage 4: per-list maps + MV syntax
    bmode_f = jnp.where(intra_mb, -1, bmode)
    # syntax flags: which lists code an mvd (direct/skip code none)
    use_l0 = (~intra_mb) & (~direct_mb) & ((bmode == 0) | (bmode == 2))
    use_l1 = (~intra_mb) & (~direct_mb) & ((bmode == 1) | (bmode == 2))
    ref4_l0 = exp4(jnp.where(intra_mb, -1, ref_l0).astype(I32))
    ref4_l1 = exp4(jnp.where(intra_mb, -1, ref_l1).astype(I32))
    mv4_l0 = exp4(mv_l0)
    mv4_l1 = exp4(mv_l1)

    mvp_l0 = mvpred.predict_16x16(ref4_l0, mv4_l0)
    mvp_l1 = mvpred.predict_16x16(ref4_l1, mv4_l1)
    mvd_l0 = jnp.where(use_l0[..., None], mv_l0 - mvp_l0, 0)
    mvd_l1 = jnp.where(use_l1[..., None], mv_l1 - mvp_l1, 0)
    mvd4_l0 = jnp.repeat(jnp.repeat(mvd_l0, 4, 0), 4, 1)
    mvd4_l1 = jnp.repeat(jnp.repeat(mvd_l1, 4, 0), 4, 1)

    # B_SKIP: direct config with no coded residual (spec 7.4.4)
    cnz_ac_s = jnp.any(jnp.stack([iacu, iacv], axis=2) != 0,
                       axis=(-3, -2, -1))
    cnz_dc_s = jnp.any(jnp.stack([idcu, idcv], axis=2) != 0,
                       axis=(-2, -1))
    skip = direct_mb & (inter_cbp == 0) & ~cnz_ac_s & ~cnz_dc_s

    # deblock maps (is_b path needs both lists)
    nnz_cnt = jnp.count_nonzero(luma_blocks, axis=-1).astype(I32)
    blk_coded = jnp.where(
        intra_mb[..., None], cbp_i16[..., None].astype(I32),
        (cbp_luma_bits[..., None]
         >> (jnp.arange(16, dtype=I32) // 4)) & 1)
    nnz_z = nnz_cnt * blk_coded
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    nnz_raster = jnp.zeros_like(nnz_z).at[..., R].set(nnz_z)
    nnz4 = nnz_raster.reshape(mb_h, mb_w, 4, 4).swapaxes(1, 2) \
        .reshape(mb_h * 4, mb_w * 4)

    return dict(
        recon_y=_untile(ty), recon_u=_untile(tu), recon_v=_untile(tv),
        intra_mb=intra_mb,
        mode16=jnp.where(intra_mb, lp["mode"].reshape(mb_h, mb_w), 0),
        modec=jnp.where(intra_mb, cmode.reshape(mb_h, mb_w), 0),
        luma_dc=luma_dc, luma_blocks=luma_blocks,
        chroma_dc=chroma_dc, chroma_ac=chroma_ac,
        cbp_luma_bits=cbp_luma_bits, cbp_chroma=cbp_chroma,
        bmode=bmode_f, use_l0=use_l0, use_l1=use_l1,
        mvd_l0=mvd_l0, mvd_l1=mvd_l1,
        mvd4_l0=mvd4_l0, mvd4_l1=mvd4_l1,
        mv=mv_l0, skip=skip, direct_mb=direct_mb,
        nnz4=nnz4, ref4=ref4_l0, mv4=mv4_l0,
        ref4_l1=ref4_l1, mv4_l1=mv4_l1,
    )
