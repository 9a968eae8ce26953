"""Jitted all-intra (I16x16 + chroma) frame pipeline.

The reference encodes macroblocks strictly sequentially because intra
prediction reads the reconstruction of the left/top neighbors
(x264_slice_write hot loop, encoder/encoder.c:1141). On TPU we restructure
this as a *wavefront*: macroblocks on the same anti-diagonal (x + y = d)
have no mutual dependency, so each `lax.scan` step encodes a whole
diagonal batched — predictions, SATD mode decision, DCT, quant, dequant,
IDCT and reconstruction all vectorized over the diagonal
(SURVEY.md §7 design stance).

Per-MB semantics mirror x264_mb_analyse_intra (encoder/analyse.c:612) with
mbcmp=SATD, x264_mb_encode_i16x16 and x264_mb_encode_8x8_chroma
(encoder/macroblock.c:117-364).

The pipeline emits quantized, zig-zag-scanned coefficient planes; entropy
coding consumes them (device→host today, device-side scan planned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as odct
from ..ops import predict as opred
from ..ops import pixel as opix
from ..ops import quant as oquant
from .. import tables

I32 = jnp.int32

# ue() bit cost of the fixed-up mode index (x264_mb_analyse_intra's
# lambda * bs_size_ue term, encoder/analyse.c:677)
_MODE_BITS_16 = np.array([1, 3, 3, 5], dtype=np.int32)
_BIG = np.int32(1 << 28)


def _tile16(plane, mb_h, mb_w):
    """(H, W) -> (mb_h, mb_w, 16, 16)."""
    return plane.reshape(mb_h, 16, mb_w, 16).swapaxes(1, 2)


def _untile(tiles):
    mb_h, mb_w, th, tw = tiles.shape
    return tiles.swapaxes(1, 2).reshape(mb_h * th, mb_w * tw)


def _blocks4_raster(block, n):
    """(..., n*4, n*4) -> (..., n, n, 4, 4) raster block order."""
    s = block.shape[:-2]
    x = block.reshape(*s, n, 4, n, 4)
    return jnp.swapaxes(x, -3, -2)


def _unblocks4(blocks, n):
    s = blocks.shape[:-4]
    return jnp.swapaxes(blocks, -3, -2).reshape(*s, n * 4, n * 4)


def luma_i16_path(fenc, top, left, topleft, has_top, has_left, qtab, lam,
                  lossless: bool = False, mode_sel=None,
                  decimate: bool = False):
    """I16x16 luma: mode decision + residual + reconstruction for a batch
    of MBs (x264_mb_analyse_intra, encoder/analyse.c:612 +
    x264_mb_encode_i16x16, encoder/macroblock.c:184).

    fenc: (K, 16, 16); top/left: (K, 16); topleft: (K,).
    mode_sel: optional (K,) fixed modes — skips the 4-mode SATD scoring
    (value-only re-evaluation sweeps reuse the decision pass's modes).
    Returns dict(cost, mode, recon, dc_z, ac_z, cbp) — dc_z (K, 16) and
    ac_z (K, 16, 16) zig-zag coefficients in z-scan block order.
    """
    K = fenc.shape[0]
    zig = jnp.asarray(tables.ZIGZAG4)

    preds = opred.predict_16x16(top, left, topleft, has_top, has_left)
    if mode_sel is None:
        avail = opred.mode_available_16x16(has_top, has_left)
        satd = opix.satd(fenc[:, None], preds)       # (K,4)
        cost = satd + lam * jnp.asarray(_MODE_BITS_16)
        cost = jnp.where(avail, cost, _BIG)
        mode = jnp.argmin(cost, axis=-1).astype(I32)
        best_cost = jnp.min(cost, axis=-1)
    else:
        mode = mode_sel.astype(I32)
        best_cost = jnp.zeros((K,), I32)
    pred = jnp.take_along_axis(
        preds, mode[:, None, None, None], axis=1)[:, 0]

    # i16x16 residual path (x264_mb_encode_i16x16,
    # encoder/macroblock.c:117)
    diff = fenc - pred
    if lossless:
        # transform bypass (x264_mb_encode_i16x16 lossless branch,
        # encoder/macroblock.c:186-200): coefficients ARE the residual
        # samples; sample 0 of each 4x4 rides the DC list
        blocks = _blocks4_raster(diff, 4)            # (K,4,4,4,4)
        dc_raster = blocks[..., 0, 0]                # (K,4,4)
        ac = blocks.at[..., 0, 0].set(0)
        blk_nz = jnp.any(ac != 0, axis=(-2, -1))
        cbp_luma = jnp.any(blk_nz, axis=(-2, -1))
        recon = jnp.clip(pred + _unblocks4(blocks, 4), 0, 255)
        zorder = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
        ac_z = ac.reshape(K, 16, 16)[:, zorder][:, :, zig]
        dc_z = dc_raster.reshape(K, 16)[:, zig]
        return dict(cost=best_cost, mode=mode, recon=recon,
                    dc_z=dc_z, ac_z=ac_z, cbp=cbp_luma)
    blocks = _blocks4_raster(diff, 4)            # (K,4,4,4,4) raster
    coef = odct.dct4x4(blocks)
    dc_raster = coef[..., 0, 0]                  # (K,4,4)
    ac = coef.at[..., 0, 0].set(0)

    ac_lv = oquant.quant(
        ac.reshape(K, 16, 16), _q16(qtab["y_mf"]), _q16(qtab["y_bias"])
    ).reshape(K, 4, 4, 4, 4)
    if decimate:
        # I16x16 AC decimation in P/B slices (x264_mb_encode_i16x16,
        # encoder/macroblock.c:193-241): total score15 < 6 zeroes the
        # AC of the whole MB (the DC plane always survives)
        s = oquant.decimate_score(
            ac_lv.reshape(K, 16, 16)[..., zig][..., 1:],
            oquant.DECIMATE_TAB4).sum(-1)
        ac_lv = jnp.where((s < 6)[:, None, None, None, None], 0, ac_lv)
    blk_nz = jnp.any(ac_lv != 0, axis=(-2, -1))  # (K,4,4)
    cbp_luma = jnp.any(blk_nz, axis=(-2, -1))    # (K,)

    ac_deq = oquant.dequant(
        ac_lv.reshape(K, 16, 16), _q16(qtab["y_dmf"]),
        _qc(qtab["y_qpdiv6"], 2), 4
    ).reshape(K, 4, 4, 4, 4)

    dc_had = odct.hadamard4x4_fwd(dc_raster)
    dc_lv = oquant.quant_dc(dc_had, _qc(qtab["y_mf_dc"], 2),
                            _qc(qtab["y_bias_dc"], 2))
    dc_rec = oquant.dequant_4x4_dc(
        odct.hadamard4x4_inv(dc_lv), _qc(qtab["y_dmf0"], 2),
        _qc(qtab["y_qpdiv6"], 2))

    full = odct.idct4x4(ac_deq.at[..., 0, 0].set(dc_rec))
    dconly = jnp.broadcast_to(
        ((dc_rec + 32) >> 6)[..., None, None], full.shape)
    res = jnp.where(cbp_luma[:, None, None, None, None], full, dconly)
    recon = jnp.clip(pred + _unblocks4(res, 4), 0, 255)

    # zig-zag outputs: block order = z-scan within MB
    zorder = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    ac_z = ac_lv.reshape(K, 16, 16)[:, zorder][:, :, zig]
    dc_z = dc_lv.reshape(K, 16)[:, zig]
    return dict(cost=best_cost, mode=mode, recon=recon,
                dc_z=dc_z, ac_z=ac_z, cbp=cbp_luma)


def chroma_residual(fencc, cpred, qtab, pfx="c", lossless: bool = False,
                    ac_kill=None):
    """Chroma 8x8 residual path for one channel, arbitrary leading dims
    (x264_mb_encode_8x8_chroma, encoder/macroblock.c:272).

    Returns (recon, dc_out (*,4), ac_out (*,4,16) zig-zag, nz_ac, nz_dc).
    qtab keys are read with the given prefix ("c" intra, "pc" inter).
    ac_kill: optional per-MB bool (lead dims) zeroing the AC levels —
    the chroma DCT-decimation decision (encoder/macroblock.c:332), made
    jointly over both channels by the caller (see chroma_ac_scan).
    """
    zig = jnp.asarray(tables.ZIGZAG4)
    lead = fencc.shape[:-2]
    cdiff = fencc - cpred
    cblocks = _blocks4_raster(cdiff, 2)       # (*,2,2,4,4)
    if lossless:
        # bypass (x264_mb_encode_8x8_chroma lossless branch)
        cdc = cblocks[..., 0, 0]
        cac = cblocks.at[..., 0, 0].set(0)
        cnz_ac = jnp.any(cac != 0, axis=(-4, -3, -2, -1))
        cnz_dc = jnp.any(cdc != 0, axis=(-2, -1))
        crecon = jnp.clip(cpred + _unblocks4(cblocks, 2), 0, 255)
        cdc_out = cdc.reshape(*lead, 4)
        cac_out = cac.reshape(*lead, 4, 16)[..., zig]
        return crecon, cdc_out, cac_out, cnz_ac, cnz_dc
    ccoef = odct.dct4x4(cblocks)
    cdc = ccoef[..., 0, 0]                    # (*,2,2)
    cac = ccoef.at[..., 0, 0].set(0)
    tc_ac = qtab.get(f"trellis_{pfx}")
    if tc_ac is not None:
        # chroma AC trellis (x264_quant_4x4_trellis DCT_CHROMA_AC,
        # encoder/macroblock.c:310-311): cat 4, scan positions 1..15
        from ..ops import trellis as otrellis
        sc = cac.reshape(-1, 16)[:, zig]
        tq = qtab.get("trellis_qpc")
        qpi = None if tq is None else jnp.repeat(tq.reshape(-1), 4)
        lv15 = otrellis.trellis_scan(sc[:, 1:], tc_ac, qp_idx=qpi)
        lv_scan = jnp.concatenate(
            [jnp.zeros_like(lv15[:, :1]), lv15], axis=1)
        inv = jnp.asarray(np.argsort(tables.ZIGZAG4))
        cac_lv = lv_scan[:, inv].reshape(*lead, 2, 2, 4, 4)
    else:
        cac_lv = oquant.quant(
            cac.reshape(*lead, 4, 16), _q16(qtab[f"{pfx}_mf"]),
            _q16(qtab[f"{pfx}_bias"])
        ).reshape(*lead, 2, 2, 4, 4)
    if ac_kill is not None:
        cac_lv = jnp.where(ac_kill[..., None, None, None, None],
                           0, cac_lv)
    cnz_ac = jnp.any(cac_lv != 0, axis=(-4, -3, -2, -1))   # (*,)
    cac_deq = oquant.dequant(
        cac_lv.reshape(*lead, 4, 16), _q16(qtab[f"{pfx}_dmf"]),
        _qc(qtab[f"{pfx}_qpdiv6"], 2), 4
    ).reshape(*lead, 2, 2, 4, 4)
    cdc_had = odct.hadamard2x2(cdc)
    tc_dc = qtab.get(f"trellis_{pfx}_dc")
    if tc_dc is not None:
        # chroma DC trellis (x264_quant_dc_trellis DCT_CHROMA_DC,
        # encoder/macroblock.c:325-326): cat 3, 4 coefs, raster scan
        from ..ops import trellis as otrellis
        tq = qtab.get("trellis_qpc")
        qpi = None if tq is None else tq.reshape(-1)
        cdc_lv = otrellis.trellis_scan(
            cdc_had.reshape(-1, 4), tc_dc,
            qp_idx=qpi).reshape(cdc_had.shape)
    else:
        cdc_lv = oquant.quant_dc(cdc_had, _qc(qtab[f"{pfx}_mf_dc"], 2),
                                 _qc(qtab[f"{pfx}_bias_dc"], 2))
    cnz_dc = jnp.any(cdc_lv != 0, axis=(-2, -1))
    cdc_rec = oquant.dequant_2x2_dc(
        odct.hadamard2x2(cdc_lv), _qc(qtab[f"{pfx}_dmf0"], 2),
        _qc(qtab[f"{pfx}_qpdiv6"], 2))
    cfull = odct.idct4x4(cac_deq.at[..., 0, 0].set(cdc_rec))
    cdconly = jnp.broadcast_to(
        ((cdc_rec + 32) >> 6)[..., None, None], cfull.shape)
    cres = jnp.where(cnz_ac[..., None, None, None, None], cfull, cdconly)
    crecon = jnp.clip(cpred + _unblocks4(cres, 2), 0, 255)
    # outputs: dc in spec scan [c00,c01,c10,c11]; ac zig-zag,
    # block order raster (== spec chroma 4x4 block order)
    cdc_out = cdc_lv.reshape(*lead, 4)
    cac_out = cac_lv.reshape(*lead, 4, 16)[..., zig]
    return crecon, cdc_out, cac_out, cnz_ac, cnz_dc


def chroma_ac_scan(fencc, cpred, qtab, pfx="pc"):
    """Quantized chroma AC levels in zig-zag scan, (*, 4, 16) — the
    inputs to the joint two-channel decimate-score decision
    (encoder/macroblock.c:320-332). The DCT+quant (or trellis) here
    duplicates the chroma_residual computation verbatim so XLA CSE
    folds them."""
    zig = jnp.asarray(tables.ZIGZAG4)
    lead = fencc.shape[:-2]
    cblocks = _blocks4_raster(fencc - cpred, 2)
    ccoef = odct.dct4x4(cblocks)
    cac = ccoef.at[..., 0, 0].set(0)
    tc_ac = qtab.get(f"trellis_{pfx}")
    if tc_ac is not None:
        from ..ops import trellis as otrellis
        sc = cac.reshape(-1, 16)[:, zig]
        tq = qtab.get("trellis_qpc")
        qpi = None if tq is None else jnp.repeat(tq.reshape(-1), 4)
        lv15 = otrellis.trellis_scan(sc[:, 1:], tc_ac, qp_idx=qpi)
        lv_scan = jnp.concatenate(
            [jnp.zeros_like(lv15[:, :1]), lv15], axis=1)
        return lv_scan.reshape(*lead, 4, 16)
    lv = oquant.quant(cac.reshape(*lead, 4, 16), _q16(qtab[f"{pfx}_mf"]),
                      _q16(qtab[f"{pfx}_bias"]))
    return lv[..., zig]


@functools.partial(jax.jit, static_argnums=(0, 1, 7, 8, 9))
def encode_i16_frame(mb_h: int, mb_w: int, y, u, v, qtab, lam,
                     i4x4: bool = False, lossless: bool = False,
                     i8x8: bool = False):
    """Encode one intra frame (I16x16, optionally with the I4x4/I8x8
    ladders).

    y: (mb_h*16, mb_w*16) int32; u, v: (mb_h*8, mb_w*8) int32.
    qtab: dict of quant table arrays (see core.make_qtab).
    lam: int32 lambda for mode cost.
    i4x4: also evaluate I_4x4 per MB and pick the cheaper type
    (x264_mb_analyse_intra ladder, encoder/analyse.c:612-843).
    i8x8: also evaluate I_8x8 (High profile). The 8x8 edge FILTER reads
    top-right-MB samples the x+y wavefront never has, so I8x8 frames run
    slope-2 diagonals (d = x + 2y — the reference's own frame-thread
    dependency offset, doc/threads.txt), which also legalizes the 4x4
    z5 top-right.

    Returns dict of per-MB arrays. `luma_ac` holds the per-4x4 block
    coefficients (z-scan, zig-zag): AC-only for I16x16 MBs, full 16
    coefficients for I4x4 MBs; I8x8 MBs carry `luma8_z`/`t8_mb` with
    `i4_mb` still true (I_NxN); `i4_modes` holds replicated 8x8 modes.
    """
    if i8x8:
        K = min(mb_h, (mb_w + 2) // 2)
        D = mb_w + 2 * mb_h - 2
    else:
        K = min(mb_h, mb_w)        # max wavefront width
        D = mb_h + mb_w - 1        # number of diagonals
    zig = jnp.asarray(tables.ZIGZAG4)

    y_tiles = _tile16(y.astype(I32), mb_h, mb_w)
    u_tiles = u.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    v_tiles = v.astype(I32).reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    qtab_frame = qtab

    state = dict(
        ty=jnp.zeros((mb_h, mb_w, 16, 16), I32),
        tu=jnp.zeros((mb_h, mb_w, 8, 8), I32),
        tv=jnp.zeros((mb_h, mb_w, 8, 8), I32),
        mode16=jnp.zeros((mb_h, mb_w), I32),
        modec=jnp.zeros((mb_h, mb_w), I32),
        luma_dc=jnp.zeros((mb_h, mb_w, 16), I32),
        luma_ac=jnp.zeros((mb_h, mb_w, 16, 16), I32),
        chroma_dc=jnp.zeros((mb_h, mb_w, 2, 4), I32),
        chroma_ac=jnp.zeros((mb_h, mb_w, 2, 4, 16), I32),
        i4_mb=jnp.zeros((mb_h, mb_w), bool),
        i4_modes=jnp.full((mb_h, mb_w, 4, 4), 2, I32),
        cbp_luma_bits=jnp.zeros((mb_h, mb_w), I32),
    )
    if i8x8:
        state["t8_mb"] = jnp.zeros((mb_h, mb_w), bool)
        state["luma8_z"] = jnp.zeros((mb_h, mb_w, 4, 64), I32)

    def diag_step(state, d):
        if i8x8:
            ys = jnp.maximum(0, (d - (mb_w - 1) + 1) // 2) \
                + jnp.arange(K, dtype=I32)
            xs = d - 2 * ys
        else:
            ys = jnp.maximum(0, d - (mb_w - 1)) + jnp.arange(K, dtype=I32)
            xs = d - ys
        valid = (ys < mb_h) & (xs >= 0) & (xs < mb_w)
        yc = jnp.clip(ys, 0, mb_h - 1)
        xc = jnp.clip(xs, 0, mb_w - 1)

        # per-MB (AQ) quant tables: gather this diagonal's rows; scalar
        # QP tables ((16,), (), ...) pass through untouched
        qtab = {k: (v[yc, xc] if (hasattr(v, "ndim") and v.ndim >= 2
                                  and v.shape[:2] == (mb_h, mb_w))
                    else v)
                for k, v in qtab_frame.items() if k != "full"}
        ym = jnp.clip(ys - 1, 0, mb_h - 1)
        xm = jnp.clip(xs - 1, 0, mb_w - 1)
        has_top = valid & (ys > 0)
        has_left = valid & (xs > 0)

        ty, tu, tv = state["ty"], state["tu"], state["tv"]

        # ------------------------------------------------ luma
        fenc = y_tiles[yc, xc]                       # (K,16,16)
        top = ty[ym, xc, 15, :]                      # (K,16)
        left = ty[yc, xm, :, 15]
        topleft = ty[ym, xm, 15, 15]

        lp = luma_i16_path(fenc, top, left, topleft, has_top, has_left,
                           qtab, lam, lossless)
        mode, recon = lp["mode"], lp["recon"]
        dc_z, ac_z = lp["dc_z"], lp["ac_z"]
        cbp_bits = jnp.where(lp["cbp"], 15, 0).astype(I32)
        use_i4 = jnp.zeros_like(has_top)
        i4_modes_sel = jnp.full((K, 4, 4), 2, I32)
        best_cost = lp["cost"]

        if i4x4 or i8x8:
            nmt = jnp.where(has_top[:, None],
                            state["i4_modes"][ym, xc, 3, :], 2)
            nml = jnp.where(has_left[:, None],
                            state["i4_modes"][yc, xm, :, 3], 2)
        if i4x4:
            lp4 = luma_i4_path(fenc, top, topleft, left, nmt, nml,
                               has_top, has_left, qtab, lam, lossless)
            use_i4 = valid & (lp4["cost"] < best_cost)
            sel = use_i4[:, None, None]
            recon = jnp.where(sel, lp4["recon"], recon)
            ac_z = jnp.where(sel, lp4["blocks_z"], ac_z)
            dc_z = jnp.where(use_i4[:, None], 0, dc_z)
            cbp_bits = jnp.where(use_i4, lp4["cbp_bits"], cbp_bits)
            i4_modes_sel = jnp.where(sel, lp4["modes"], i4_modes_sel)
            best_cost = jnp.minimum(best_cost, lp4["cost"])

        use_i8 = jnp.zeros_like(has_top)
        if i8x8:
            # top-right MB bottom row (block 1's top-right samples —
            # legal here because the slope-2 wavefront finished it)
            xp = jnp.clip(xs + 1, 0, mb_w - 1)
            tr8 = ty[ym, xp, 15, 0:8]
            has_tr = valid & (ys > 0) & (xs < mb_w - 1)
            lp8 = luma_i8_path(fenc, top, topleft, left, tr8, nmt, nml,
                               has_top, has_left, has_tr, qtab, lam)
            use_i8 = valid & (lp8["cost"] < best_cost)
            sel8 = use_i8[:, None, None]
            recon = jnp.where(sel8, lp8["recon"], recon)
            ac_z = jnp.where(sel8, 0, ac_z)
            dc_z = jnp.where(use_i8[:, None], 0, dc_z)
            cbp_bits = jnp.where(use_i8, lp8["cbp_bits"], cbp_bits)
            # replicate the 8x8 modes into the 4x4 grid (spec 8.3.2.1
            # neighbor-mode derivation; x264 caches the same way)
            rep8 = jnp.repeat(jnp.repeat(lp8["modes"], 2, axis=1),
                              2, axis=2)
            i4_modes_sel = jnp.where(sel8, rep8, i4_modes_sel)
            use_i4 = use_i4 | use_i8     # i4_mb means I_NxN
            blocks8_sel = jnp.where(use_i8[:, None, None],
                                    lp8["blocks8_z"], 0)

        # ------------------------------------------------ chroma
        def chroma_path(t_ref, c_tiles):
            fencc = c_tiles[yc, xc]
            ctop = t_ref[ym, xc, 7, :]
            cleft = t_ref[yc, xm, :, 7]
            ctl = t_ref[ym, xm, 7, 7]
            cpreds = opred.predict_8x8c(ctop, cleft, ctl, has_top, has_left)
            csatd = opix.satd(fencc[:, None], cpreds)
            return fencc, cpreds, csatd

        fu, pu, su = chroma_path(tu, u_tiles)
        fv, pv, sv = chroma_path(tv, v_tiles)
        cavail = opred.mode_available_8x8c(has_top, has_left)
        ccost = jnp.where(cavail, su + sv, _BIG)
        cmode = jnp.argmin(ccost, axis=-1).astype(I32)

        def chroma_encode(fencc, cpreds):
            cpred = jnp.take_along_axis(
                cpreds, cmode[:, None, None, None], axis=1)[:, 0]
            return chroma_residual(fencc, cpred, qtab, "c", lossless)

        ru, dcu, acu, nzau, nzdu = chroma_encode(fu, pu)
        rv, dcv, acv, nzav, nzdv = chroma_encode(fv, pv)

        # ------------------------------------------------ scatter
        oy = jnp.where(valid, yc, mb_h)   # out-of-bounds -> dropped
        ox = jnp.where(valid, xc, mb_w)

        def scat(dst, val):
            return dst.at[oy, ox].set(val, mode="drop")

        new_state = dict(
            ty=scat(ty, recon),
            tu=scat(tu, ru),
            tv=scat(tv, rv),
            mode16=scat(state["mode16"], mode),
            modec=scat(state["modec"], cmode),
            luma_dc=scat(state["luma_dc"], dc_z),
            luma_ac=scat(state["luma_ac"], ac_z),
            chroma_dc=scat(state["chroma_dc"],
                           jnp.stack([dcu, dcv], axis=1)),
            chroma_ac=scat(state["chroma_ac"],
                           jnp.stack([acu, acv], axis=1)),
            i4_mb=scat(state["i4_mb"], use_i4),
            i4_modes=scat(state["i4_modes"], i4_modes_sel),
            cbp_luma_bits=scat(state["cbp_luma_bits"], cbp_bits),
        )
        if i8x8:
            new_state["t8_mb"] = scat(state["t8_mb"], use_i8)
            new_state["luma8_z"] = scat(state["luma8_z"], blocks8_sel)
        return new_state, None

    state, _ = jax.lax.scan(diag_step, state, jnp.arange(D, dtype=I32))

    out = dict(
        recon_y=_untile(state["ty"]),
        recon_u=_untile(state["tu"]),
        recon_v=_untile(state["tv"]),
        mode16=state["mode16"],
        modec=state["modec"],
        luma_dc=state["luma_dc"],
        luma_ac=state["luma_ac"],
        chroma_dc=state["chroma_dc"],
        chroma_ac=state["chroma_ac"],
        i4_mb=state["i4_mb"],
        i4_modes=state["i4_modes"],
        cbp_luma_bits=state["cbp_luma_bits"],
    )
    if i8x8:
        out["t8_mb"] = state["t8_mb"]
        out["luma8_z"] = state["luma8_z"]
    return out


def _q16(t):
    """Quant-table normalizer: scalar-QP tables (N,) pass through; AQ
    per-MB tables (*lead, N) gain one singleton block axis so they
    broadcast over (*lead, n_blocks, N) coefficient arrays."""
    t = jnp.asarray(t)
    if t.ndim <= 1:
        return t
    return t.reshape(*t.shape[:-1], 1, t.shape[-1])


def _qc(t, axes: int):
    """Per-MB scalar normalizer: () passes through; (*lead,) gains
    `axes` trailing singleton dims."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        return t
    return t.reshape(*t.shape, *([1] * axes))


def make_qtab(qp_y: int, qp_c: int, qt: tables.QuantTables | None = None):
    """Gather the per-QP table slices the jitted pipeline needs.

    Luma uses CQM_4IY, chroma CQM_4IC; DC multipliers follow
    encoder/macroblock.c:282 (mf[0]>>1, bias[0]<<1).
    """
    qt = qt or tables.DEFAULT_QUANT
    a = lambda x: jnp.asarray(np.asarray(x, np.int32))
    return dict(
        y_mf=a(qt.quant4_mf[tables.CQM_4IY, qp_y]),
        y_bias=a(qt.quant4_bias[tables.CQM_4IY, qp_y]),
        y_dmf=a(qt.dequant4_mf[tables.CQM_4IY, qp_y % 6]),
        y_dmf0=a(qt.dequant4_mf[tables.CQM_4IY, qp_y % 6][0]),
        y_mf_dc=a(qt.quant4_mf[tables.CQM_4IY, qp_y][0] >> 1),
        y_bias_dc=a(qt.quant4_bias[tables.CQM_4IY, qp_y][0] << 1),
        y_qpdiv6=a(qp_y // 6),
        c_mf=a(qt.quant4_mf[tables.CQM_4IC, qp_c]),
        c_bias=a(qt.quant4_bias[tables.CQM_4IC, qp_c]),
        c_dmf=a(qt.dequant4_mf[tables.CQM_4IC, qp_c % 6]),
        c_dmf0=a(qt.dequant4_mf[tables.CQM_4IC, qp_c % 6][0]),
        c_mf_dc=a(qt.quant4_mf[tables.CQM_4IC, qp_c][0] >> 1),
        c_bias_dc=a(qt.quant4_bias[tables.CQM_4IC, qp_c][0] << 1),
        c_qpdiv6=a(qp_c // 6),
        # I8x8 (High profile, CQM_8IY)
        y8_mf=a(qt.quant8_mf[tables.CQM_8IY, qp_y]),
        y8_bias=a(qt.quant8_bias[tables.CQM_8IY, qp_y]),
        y8_dmf=a(qt.dequant8_mf[tables.CQM_8IY, qp_y % 6]),
    )


# z-scan blocks whose top-right samples are not yet decoded in block
# order: the spec substitutes t3 (8.3.1.2.1) on both encoder and decoder
_TR_SUBST_Z = (3, 7, 11, 13, 15)
# z 5's top-right lies in the top-right *MB*, which raster decode order
# has but the anti-diagonal wavefront does not: DDL/VL are simply never
# chosen there (a conformant restriction, no substitution mismatch)
_TR_MASK_Z = (5,)

# mode bits: 1 if most-probable, else 1+3 (prev_intra4x4_pred_mode
# syntax, encoder/cavlc.c:395-404)
_I4_COST_BITS = 24   # mb-level signalling cost (x264_mb_analyse_intra)


def luma_i4_path(fenc, top_row, topleft_px, left_col,
                 nbr_modes_top, nbr_modes_left, has_top, has_left,
                 qtab, lam, lossless: bool = False):
    """I4x4 luma: 16 blocks in z-scan order, sequential (each reads the
    reconstruction of its decoded neighbors), vectorized over a batch of
    MBs (x264_mb_analyse_intra i4x4 ladder, encoder/analyse.c:707-843 +
    x264_mb_encode_i4x4, encoder/macroblock.c:116).

    fenc: (K,16,16); top_row/left_col: (K,16) from neighbor MB recon;
    topleft_px: (K,); nbr_modes_top/left: (K,4) neighbor-MB block modes
    (2 where the neighbor is absent or not I4x4).
    Returns dict(cost, modes (K,4,4) raster, blocks_z (K,16,16) zig-zag
    full-coefficient blocks in z-scan order, recon (K,16,16),
    cbp_bits (K,), nnz_z (K,16)).
    """
    K = fenc.shape[0]
    zig = jnp.asarray(tables.ZIGZAG4)
    ext = jnp.zeros((K, 17, 21), I32)
    ext = ext.at[:, 0, 0].set(topleft_px)
    ext = ext.at[:, 0, 1:17].set(top_row)
    ext = ext.at[:, 0, 17:21].set(
        jnp.broadcast_to(top_row[:, 15:16], (K, 4)))
    ext = ext.at[:, 1:17, 0].set(left_col)

    modes_r = jnp.full((K, 4, 4), 2, I32)    # raster grid, DC default
    total_cost = jnp.zeros(K, I32)
    blocks_z = jnp.zeros((K, 16, 16), I32)
    nnz_z = jnp.zeros((K, 16), I32)
    recon_parts = {}

    mode_ids = jnp.arange(9, dtype=I32)
    for z in range(16):
        bx, by = int(tables.LUMA4x4_BLOCK_XY[z][0]), \
            int(tables.LUMA4x4_BLOCK_XY[z][1])
        t = ext[:, 4 * by, 1 + 4 * bx:5 + 4 * bx]
        tl = ext[:, 4 * by, 4 * bx]
        l = ext[:, 1 + 4 * by:5 + 4 * by, 4 * bx]
        if z in _TR_SUBST_Z or z in _TR_MASK_Z:
            tr = jnp.broadcast_to(t[:, 3:4], (K, 4))
        else:
            tr = ext[:, 4 * by, 5 + 4 * bx:9 + 4 * bx]

        ht = has_top if by == 0 else jnp.ones_like(has_top)
        hl = has_left if bx == 0 else jnp.ones_like(has_left)
        # edge rows/cols of ext are only valid when the neighbor exists;
        # unavailable-mode costs are masked below so garbage is inert

        preds = opred.predict_4x4(l, tl, t, tr, ht, hl)   # (K,9,4,4)
        avail = opred.mode_available_4x4(ht, hl)
        if z in _TR_MASK_Z:
            avail = avail.at[:, 3].set(False).at[:, 7].set(False)

        lmode = modes_r[:, by, bx - 1] if bx > 0 else nbr_modes_left[:, by]
        tmode = modes_r[:, by - 1, bx] if by > 0 else nbr_modes_top[:, bx]
        mpm = jnp.minimum(lmode, tmode)

        fb = fenc[:, 4 * by:4 * by + 4, 4 * bx:4 * bx + 4]
        satd = opix.satd(fb[:, None], preds)              # (K,9)
        bits = jnp.where(mode_ids[None, :] == mpm[:, None], 1, 4)
        cost = jnp.where(avail, satd + lam * bits, _BIG)
        mode = jnp.argmin(cost, axis=-1).astype(I32)
        total_cost = total_cost + jnp.min(cost, axis=-1)
        pred = jnp.take_along_axis(
            preds, mode[:, None, None, None], axis=1)[:, 0]

        if lossless:
            lv = (fb - pred).reshape(K, 16)
            nnz = jnp.count_nonzero(lv, axis=-1).astype(I32)
            rec = jnp.clip(fb, 0, 255)
        else:
            coef = odct.dct4x4(fb - pred)
            lv = oquant.quant(coef.reshape(K, 16), qtab["y_mf"],
                              qtab["y_bias"])
            nnz = jnp.count_nonzero(lv, axis=-1).astype(I32)
            deq = oquant.dequant(lv, qtab["y_dmf"],
                                 _qc(qtab["y_qpdiv6"], 1), 4)
            rec = jnp.clip(pred + odct.idct4x4(deq.reshape(K, 4, 4)),
                           0, 255)

        ext = ext.at[:, 1 + 4 * by:5 + 4 * by, 1 + 4 * bx:5 + 4 * bx] \
            .set(rec)
        modes_r = modes_r.at[:, by, bx].set(mode)
        blocks_z = blocks_z.at[:, z].set(lv[:, zig])
        nnz_z = nnz_z.at[:, z].set(nnz)

    cbp8 = (nnz_z.reshape(K, 4, 4).sum(axis=-1) > 0)      # per z-group
    cbp_bits = (cbp8[:, 0] * 1 + cbp8[:, 1] * 2
                + cbp8[:, 2] * 4 + cbp8[:, 3] * 8).astype(I32)
    # uncoded groups drop their residual: zero them so recon == decoder
    keep = jnp.repeat(cbp8, 4, axis=1)                    # (K,16) z-scan
    blocks_z = blocks_z * keep[..., None]
    nnz_z = nnz_z * keep

    # rebuild recon honoring dropped groups (pred of later blocks used
    # the undropped recon — matching the decoder requires re-walking, so
    # instead drop is only applied when the whole group quantized to
    # zero anyway; nonzero groups are never dropped (no decimation yet)
    recon = ext[:, 1:17, 1:17]

    return dict(cost=total_cost + lam * _I4_COST_BITS, modes=modes_r,
                blocks_z=blocks_z, recon=recon,
                cbp_bits=cbp_bits, nnz_z=nnz_z)


# mb-level signalling cost for I8x8 (mb_type bin + transform flag +
# shorter per-block mode list than I4x4)
_I8_COST_BITS = 10


def luma_i8_path(fenc, top_row, topleft_px, left_col, tr8,
                 nbr_modes_top, nbr_modes_left, has_top, has_left,
                 has_tr, qtab, lam):
    """I8x8 luma: 4 blocks in z-scan (== 2x2 raster) order, sequential
    (each reads decoded-neighbor reconstruction), vectorized over a
    batch of MBs (x264_mb_analyse_intra i8x8 ladder,
    encoder/analyse.c:683-706 + x264_mb_encode_i8x8,
    encoder/macroblock.c:158; prediction spec 8.3.2 via
    ops/predict.predict_8x8_filter / predict_8x8).

    fenc: (K,16,16); top_row/left_col: (K,16) neighbor-MB recon;
    topleft_px: (K,); tr8: (K,8) bottom row of the TOP-RIGHT MB (block
    1's top-right samples — callers must schedule the wavefront so the
    top-right MB is already reconstructed, see encode_i16_frame's
    slope-2 diagonals); nbr_modes_top/left: (K,4) neighbor 4x4-grid
    modes. Returns dict(cost, modes (K,2,2), blocks8_z (K,4,64) 8x8
    scan-order coefficients, recon (K,16,16), cbp_bits (K,)).
    """
    from ..ops import predict as opred8
    K = fenc.shape[0]
    zig8 = jnp.asarray(tables.ZIGZAG8)
    ones = jnp.ones_like(has_top)
    zeros = jnp.zeros_like(has_top)
    ext = jnp.zeros((K, 17, 25), I32)
    ext = ext.at[:, 0, 0].set(topleft_px)
    ext = ext.at[:, 0, 1:17].set(top_row)
    ext = ext.at[:, 0, 17:25].set(tr8)
    ext = ext.at[:, 1:17, 0].set(left_col)

    modes8 = jnp.full((K, 2, 2), 2, I32)
    total_cost = jnp.zeros(K, I32)
    blocks8_z = jnp.zeros((K, 4, 64), I32)
    mode_ids = jnp.arange(9, dtype=I32)
    # availability per block: (ht, hl, htl, htr); block 3's top-right
    # lies in the not-yet-decoded right MB on BOTH sides -> substituted
    flag_sets = ((has_top, has_left, has_top & has_left, has_top),
                 (has_top, ones, has_top, has_tr),
                 (ones, has_left, has_left, ones),
                 (ones, ones, ones, zeros))
    for z, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        ht, hl, htl, htr = flag_sets[z]
        r0, c0 = 8 * by, 8 * bx
        t = ext[:, r0, c0 + 1:c0 + 9]
        tr = ext[:, r0, c0 + 9:c0 + 17]
        l = ext[:, r0 + 1:r0 + 9, c0]
        tl = ext[:, r0, c0]
        lf, tlf, tf = opred8.predict_8x8_filter(l, tl, t, tr,
                                                ht, hl, htl, htr)
        preds = opred8.predict_8x8(lf, tlf, tf, ht, hl)
        avail = opred8.mode_available_8x8(ht, hl, htl)

        lmode = modes8[:, by, bx - 1] if bx else nbr_modes_left[:, 2 * by]
        tmode = modes8[:, by - 1, bx] if by else nbr_modes_top[:, 2 * bx]
        mpm = jnp.minimum(lmode, tmode)

        fb = fenc[:, r0:r0 + 8, c0:c0 + 8]
        sa8d = opix.sa8d_8x8(fb[:, None], preds)          # (K,9)
        bits = jnp.where(mode_ids[None, :] == mpm[:, None], 1, 4)
        cost = jnp.where(avail, sa8d + lam * bits, _BIG)
        mode = jnp.argmin(cost, axis=-1).astype(I32)
        total_cost = total_cost + jnp.min(cost, axis=-1)
        pred = jnp.take_along_axis(
            preds, mode[:, None, None, None], axis=1)[:, 0]

        coef = odct.dct8x8(fb - pred)
        lv = oquant.quant(coef.reshape(K, 64), qtab["y8_mf"],
                          qtab["y8_bias"])
        deq = oquant.dequant(lv, qtab["y8_dmf"],
                             _qc(qtab["y_qpdiv6"], 1), 6)
        rec = jnp.clip(pred + odct.idct8x8(deq.reshape(K, 8, 8)),
                       0, 255)
        ext = ext.at[:, r0 + 1:r0 + 9, c0 + 1:c0 + 9].set(rec)
        modes8 = modes8.at[:, by, bx].set(mode)
        blocks8_z = blocks8_z.at[:, z].set(lv[:, zig8])

    cbp8 = jnp.any(blocks8_z != 0, axis=-1)               # (K,4) z==raster
    cbp_bits = (cbp8[:, 0] * 1 + cbp8[:, 1] * 2
                + cbp8[:, 2] * 4 + cbp8[:, 3] * 8).astype(I32)
    return dict(cost=total_cost + lam * _I8_COST_BITS, modes=modes8,
                blocks8_z=blocks8_z, recon=ext[:, 1:17, 1:17],
                cbp_bits=cbp_bits)
