"""Device-side CABAC bin-operation generation (the parallel 90% of the
entropy coder; the serial arithmetic FSM runs in native/cabac.c).

Whole-slice MB syntax is expanded into fixed per-MB slot planes of
packed bin ops (pad-kind where a bin is absent), then compacted on
device to a dense stream — the CABAC twin of the CAVLC
(value,length)-plane scheme in entropy/device.py. Context indices and
binarizations follow spec 9.3.2/9.3.3 exactly as realized in
encoder/cabac.c (x264_cabac_mb_type:64, cbf_ctxidxinc:508,
block_residual_write_cabac:584).

Op packing (uint32): kind<<29 | b<<17 | a  (see entropy/cabac.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U32 = jnp.uint32

(KIND_DECISION, KIND_BYPASS, KIND_UE, KIND_TERMINAL, KIND_PAD, KIND_ONES,
 KIND_SIGMAP, KIND_LEVEL) = range(8)
PAD_OP = np.uint32(KIND_PAD << 29)

# residual context bases per ctxBlockCat (frame coding):
# cat 0 luma DC, 1 luma AC, 2 luma 4x4, 3 chroma DC, 4 chroma AC
# (significant_coeff_flag_offset etc, encoder/cabac.c:541-549)
SIG_BASE = np.array([105, 120, 134, 149, 152], np.int32)
LAST_BASE = np.array([166, 181, 195, 210, 213], np.int32)
LVL_BASE = np.array([227, 237, 247, 257, 266], np.int32)

# level node-context machine (coeff_abs_level*_ctx, encoder/cabac.c:570-581)
L1_CTX = np.array([1, 2, 3, 4, 0, 0, 0, 0], np.int32)
GT1_CTX = np.array([5, 5, 5, 5, 6, 7, 8, 9], np.int32)
NODE_TRANS = np.array([[1, 2, 3, 3, 4, 5, 6, 7],
                       [4, 4, 4, 4, 5, 6, 7, 7]], np.int32)


def op(kind, a, b):
    """Pack ops elementwise; a/b may be arrays or ints (b also bool)."""
    a = jnp.asarray(a).astype(U32)
    b = jnp.asarray(b).astype(U32)
    return (jnp.uint32(kind << 29)) | (b << 17) | a


def _sel(active, ops):
    return jnp.where(active, ops, PAD_OP)


def block_slot_count(C: int) -> int:
    return 2 + C


def residual_block_ops(coeffs, cat: int, cbf_ctx, coded):
    """Packed ops for N residual blocks (block_residual_write_cabac,
    encoder/cabac.c:584): CBF, significance map, levels.

    The sig/last maps and the per-coefficient level binarization are
    expanded by the serial engine (native/cabac.c) from two compact op
    kinds, so a coded block costs 2 + n_coeff ops instead of
    1 + 2(C-1) + 5C slots:
      KIND_SIGMAP: a = significance mask (bits i < C-1),
                   b = cat | last << 3  — emits the sig/last decisions
                   and resets the level node-context machine;
      KIND_LEVEL:  a = |level| - 1, b = sign — emits the unary prefix /
                   exp-Golomb suffix / sign, advancing the node machine.

    coeffs: (N, C) int32 in scan order; cbf_ctx: (N,) the 2*nzb+nza
    increment; coded: (N,) bool — block present in the bitstream.
    Returns (N, block_slot_count(C)) uint32.
    """
    N, C = coeffs.shape
    coeffs = coeffs.astype(I32)
    nz = coeffs != 0
    total = nz.sum(axis=1).astype(I32)
    has = total > 0
    pos = jnp.arange(C, dtype=I32)
    last = jnp.max(jnp.where(nz, pos, -1), axis=1)

    slots = [_sel(coded, op(KIND_DECISION, 85 + 4 * cat + cbf_ctx, has))]

    write_res = coded & has
    mask = (nz[:, :C - 1].astype(I32)
            * (1 << pos[:C - 1])[None, :]).sum(axis=1)
    slots.append(_sel(write_res,
                      op(KIND_SIGMAP, mask, cat | (last << 3))))

    # levels in reverse scan order (descending position of nonzeros)
    order = jnp.argsort(-jnp.where(nz, pos, -1), axis=1, stable=True)
    lvl = jnp.take_along_axis(coeffs, order, axis=1)
    for j in range(C):
        active = write_res & (j < total)
        l = lvl[:, j]
        slots.append(_sel(active,
                          op(KIND_LEVEL,
                             jnp.minimum(jnp.abs(l) - 1, 0x1FFFF),
                             l < 0)))
    return jnp.stack(slots, axis=1)


def residual_block_ops8(coeffs, coded):
    """Packed ops for N luma 8x8 residual blocks (ctxBlockCat 5,
    block_residual_write_cabac 8x8 branch, encoder/cabac.c:769): no
    coded_block_flag (CBP covers it); the 63-bit significance mask
    crosses as FOUR KIND_SIGMAP parts (16 bits each, part index in
    b[10:9]) that the serial engine reassembles, then per-coefficient
    KIND_LEVEL ops as in the 4x4 layout.

    coeffs: (N, 64) int32 in 8x8 scan order; coded: (N,) bool.
    Returns (N, 68) uint32.
    """
    N, C = coeffs.shape
    assert C == 64
    coeffs = coeffs.astype(I32)
    nz = coeffs != 0
    total = nz.sum(axis=1).astype(I32)
    has = total > 0
    pos = jnp.arange(C, dtype=I32)
    last = jnp.max(jnp.where(nz, pos, -1), axis=1)
    write_res = coded & has

    slots = []
    nzb = nz[:, :C - 1].astype(I32)
    for part in range(4):
        lo = 16 * part
        hi = min(lo + 16, C - 1)
        mask = (nzb[:, lo:hi]
                * (1 << (pos[:hi - lo]))[None, :]).sum(axis=1)
        slots.append(_sel(write_res,
                          op(KIND_SIGMAP, mask,
                             5 | (last << 3) | (part << 9))))

    order = jnp.argsort(-jnp.where(nz, pos, -1), axis=1, stable=True)
    lvl = jnp.take_along_axis(coeffs, order, axis=1)
    for j in range(C):
        active = write_res & (j < total)
        l = lvl[:, j]
        slots.append(_sel(active,
                          op(KIND_LEVEL,
                             jnp.minimum(jnp.abs(l) - 1, 0x1FFFF),
                             l < 0)))
    return jnp.stack(slots, axis=1)


def _dqp_slots(out, has_dqp, nmb):
    """mb_qp_delta bins (x264_cabac_mb_qp_delta, encoder/cabac.c:271):
    mapped-unary val (dqp>0 -> 2dqp-1 else -2dqp, folded mod 52) at
    ctxs [60+c0, 62, 63, 63...], c0 = previous MB coded a nonzero dqp.
    Returns a list of 1 or 4 slot arrays."""
    dqp = out.get("dqp")
    if dqp is None:
        return [_sel(has_dqp, op(KIND_DECISION, jnp.full(nmb, 60, I32),
                                 0))]
    dqp_f = dqp.reshape(nmb).astype(I32)
    c0 = out["dqp_prev_nz"].reshape(nmb).astype(I32)
    val = jnp.where(dqp_f > 0, 2 * dqp_f - 1, -2 * dqp_f)
    val = jnp.where((val >= 51) & (val != 52), 103 - val, val)
    return [
        _sel(has_dqp, op(KIND_DECISION, 60 + c0, val > 0)),
        _sel(has_dqp & (val >= 1),
             op(KIND_DECISION, jnp.full(nmb, 62, I32), val > 1)),
        _sel(has_dqp & (val >= 3),
             op(KIND_ONES, jnp.full(nmb, 63, I32),
                jnp.clip(val - 2, 0, 4095))),
        _sel(has_dqp & (val >= 2),
             op(KIND_DECISION, jnp.full(nmb, 63, I32), 0)),
    ]


def _nbr_grids(flag_map, unavail):
    """(left, top) neighbor values on a grid; outside-frame = unavail."""
    a = jnp.full_like(flag_map, unavail)
    a = a.at[:, 1:].set(flag_map[:, :-1])
    b = jnp.full_like(flag_map, unavail)
    b = b.at[1:, :].set(flag_map[:-1, :])
    return a, b


def i4_pred_mode_ops(i4_mb, i4_modes, mb_h: int, mb_w: int, i8_mb=None):
    """Per-block intra pred-mode bins in z-scan order, 4 slots per block
    (x264_cabac_mb_intra4x4_pred_mode, encoder/cabac.c:199). i4_mb marks
    4x4-transform I_NxN MBs (16 blocks each); i8_mb (optional) marks
    I8x8 MBs (4 blocks each, same 68/69 contexts — spec 9.3.3.1.1.10
    uses one context set for both; neighbor modes come from the same
    4x4-granularity grid, which callers fill with the replicated 8x8
    modes for I8x8 MBs per spec 8.3.2.1)."""
    from .. import tables

    nmb = mb_h * mb_w
    grid = i4_modes.swapaxes(1, 2).reshape(mb_h * 4, mb_w * 4)
    lg = jnp.full_like(grid, 2).at[:, 1:].set(grid[:, :-1])
    tg = jnp.full_like(grid, 2).at[1:, :].set(grid[:-1, :])
    mpm = jnp.minimum(lg, tg)
    eq = grid == mpm
    rem = grid - (grid > mpm)

    def to_z(g):
        z = g.reshape(mb_h, 4, mb_w, 4).swapaxes(1, 2).reshape(nmb, 16)
        return z[:, jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)]

    eq_z, rem_z = to_z(eq), to_z(rem)
    i4f = i4_mb.reshape(nmb)
    slots = []
    for i in range(16):
        act = i4f
        slots.append(_sel(act, op(KIND_DECISION, jnp.full(nmb, 68, I32),
                                  eq_z[:, i])))
        for k in range(3):
            slots.append(_sel(act & ~eq_z[:, i],
                              op(KIND_DECISION, jnp.full(nmb, 69, I32),
                                 (rem_z[:, i] >> k) & 1)))
    if i8_mb is not None:
        t8f = i8_mb.reshape(nmb)
        def to_r(g):
            return g.reshape(mb_h, 4, mb_w, 4).swapaxes(1, 2) \
                .reshape(nmb, 16)
        eq_r, rem_r = to_r(eq), to_r(rem)
        # 8x8 z-scan blocks -> top-left 4x4 cell in MB raster coords
        for cell in (0, 2, 8, 10):
            slots.append(_sel(t8f,
                              op(KIND_DECISION, jnp.full(nmb, 68, I32),
                                 eq_r[:, cell])))
            for k in range(3):
                slots.append(_sel(t8f & ~eq_r[:, cell],
                                  op(KIND_DECISION,
                                     jnp.full(nmb, 69, I32),
                                     (rem_r[:, cell] >> k) & 1)))
    return jnp.stack(slots, axis=1)


def i16_slice_ops(out, mb_h: int, mb_w: int, t8_mode: bool = False):
    """Packed op planes for a whole intra CABAC slice (I16x16 + I4x4),
    flattened in syntax order (x264_macroblock_write_cabac intra paths,
    encoder/cabac.c:781-1025 + per-MB end_of_slice terminal)."""
    from .. import tables

    nmb = mb_h * mb_w
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    luma_dc = out["luma_dc"].reshape(nmb, 16)
    luma_ac = out["luma_ac"].reshape(nmb, 16, 16)
    chroma_dc = out["chroma_dc"].reshape(nmb, 2, 4)
    chroma_ac = out["chroma_ac"].reshape(nmb, 2, 4, 16)
    mode16 = out["mode16"].reshape(nmb).astype(I32)
    modec = out["modec"].reshape(mb_h, mb_w).astype(I32)

    i4_mb = out.get("i4_mb")
    if i4_mb is None:
        i4_mb = jnp.zeros((mb_h, mb_w), bool)
        i4_modes = jnp.full((mb_h, mb_w, 4, 4), 2, I32)
        cbp_l_bits = jnp.where(
            jnp.any(luma_ac[..., 1:] != 0, axis=(-2, -1)), 15, 0
        ).astype(I32).reshape(mb_h, mb_w)
    else:
        i4_modes = out["i4_modes"]
        cbp_l_bits = out["cbp_luma_bits"].astype(I32)
    i4f = i4_mb.reshape(nmb)
    cbp_lf = cbp_l_bits.reshape(nmb)
    cbp_luma16 = (~i4f) & (cbp_lf > 0)

    # I8x8: i4_mb means I_NxN; t8_mb distinguishes the transform
    t8_mb = out.get("t8_mb")
    if t8_mb is None:
        t8_mb = jnp.zeros((mb_h, mb_w), bool)
    t8f = t8_mb.reshape(nmb)

    cnz_ac = jnp.any(chroma_ac[..., 1:] != 0, axis=(-3, -2, -1))
    cnz_dc = jnp.any(chroma_dc != 0, axis=(-2, -1))
    cbp_chroma = jnp.where(cnz_ac, 2, jnp.where(cnz_dc, 1, 0)).astype(I32)

    ymb, xmb = jnp.mgrid[0:mb_h, 0:mb_w]
    avail_l = (xmb > 0).reshape(nmb)
    avail_t = (ymb > 0).reshape(nmb)

    # ---- mb_type: ctxInc counts available non-I4x4 neighbors
    ni4_l, ni4_t = _nbr_grids((~i4_mb).astype(I32), 0)
    ctx_mbtype = 3 + (avail_l & (ni4_l.reshape(nmb) > 0)).astype(I32) \
        + (avail_t & (ni4_t.reshape(nmb) > 0)).astype(I32)
    t8l, t8t = _nbr_grids(t8_mb.astype(I32), 0)
    tctx = (399 + t8l + t8t).reshape(nmb)
    h = [
        op(KIND_DECISION, ctx_mbtype, ~i4f),
        # transform_size_8x8_flag for I_NxN when the PPS enables 8x8
        # (x264_cabac_mb_transform_size, encoder/cabac.c:369 + :826-828)
        (_sel(i4f, op(KIND_DECISION, tctx, t8f))
         if t8_mode else jnp.full((nmb,), PAD_OP)),
        _sel(~i4f, jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,))),
        _sel(~i4f, op(KIND_DECISION, jnp.full(nmb, 6, I32), cbp_luma16)),
        _sel(~i4f, op(KIND_DECISION, jnp.full(nmb, 7, I32),
                      cbp_chroma > 0)),
        _sel((~i4f) & (cbp_chroma > 0),
             op(KIND_DECISION, jnp.full(nmb, 8, I32), cbp_chroma == 2)),
        _sel(~i4f, op(KIND_DECISION, jnp.full(nmb, 9, I32), mode16 >> 1)),
        _sel(~i4f, op(KIND_DECISION, jnp.full(nmb, 10, I32), mode16 & 1)),
    ]
    header1 = jnp.stack(h, axis=1)

    pm_ops = i4_pred_mode_ops(i4_mb & ~t8_mb, i4_modes, mb_h, mb_w,
                              i8_mb=t8_mb)

    h2 = []
    cm_l, cm_t = _nbr_grids(modec, 0)
    cctx = (64 + (cm_l != 0).astype(I32) + (cm_t != 0).astype(I32)) \
        .reshape(nmb)
    cm = modec.reshape(nmb)
    h2.append(op(KIND_DECISION, cctx, cm > 0))
    h2.append(_sel(cm > 0, op(KIND_DECISION, jnp.full(nmb, 67, I32),
                              cm > 1)))
    h2.append(_sel(cm > 1, op(KIND_DECISION, jnp.full(nmb, 67, I32),
                              cm > 2)))
    # ---- cbp for I_4x4 (x264_cabac_mb_cbp_luma/chroma ctx formulas)
    cbp_all = cbp_l_bits
    cbl_l, cbl_t = _nbr_grids(cbp_all, -1)
    ctx0 = 76 - ((cbl_l >> 1) & 1) - ((cbl_t >> 1) & 2)
    ctx1 = 76 - ((cbp_all >> 0) & 1) - ((cbl_t >> 2) & 2)
    ctx2 = 76 - ((cbl_l >> 3) & 1) - ((cbp_all << 1) & 2)
    ctx3 = 76 - ((cbp_all >> 2) & 1) - ((cbp_all >> 0) & 2)
    for k, cx in enumerate((ctx0, ctx1, ctx2, ctx3)):
        h2.append(_sel(i4f, op(KIND_DECISION, cx.reshape(nmb),
                               (cbp_lf >> k) & 1)))
    cbc_all = cbp_chroma.reshape(mb_h, mb_w)
    cbc_l, cbc_t = _nbr_grids(cbc_all, -1)
    c0 = 77 + ((cbc_l > 0) & (cbc_l != -1)).astype(I32) \
        + 2 * ((cbc_t > 0) & (cbc_t != -1)).astype(I32)
    c1 = 77 + 4 + (cbc_l == 2).astype(I32) + 2 * (cbc_t == 2).astype(I32)
    h2.append(_sel(i4f, op(KIND_DECISION, c0.reshape(nmb),
                           cbp_chroma > 0)))
    h2.append(_sel(i4f & (cbp_chroma > 0),
                   op(KIND_DECISION, c1.reshape(nmb), cbp_chroma == 2)))
    # mb_qp_delta (x264_cabac_mb_qp_delta, encoder/cabac.c:271)
    has_dqp = (~i4f) | (cbp_lf > 0) | (cbp_chroma > 0)
    h2.extend(_dqp_slots(out, has_dqp, nmb))
    header2 = jnp.stack(h2, axis=1)

    # ---- CBF neighbor contexts (cbf_ctxidxinc, encoder/cabac.c:508)
    dc_nz = (jnp.any(luma_dc != 0, axis=-1).reshape(mb_h, mb_w)
             & (~i4_mb)).astype(I32)
    a, b = _nbr_grids(dc_nz, 1)          # unavailable -> 1 (intra slice)
    ctx_dc = (2 * b + a).reshape(nmb)

    grp_bit = (cbp_lf[:, None] >> (jnp.arange(16, dtype=I32) // 4)) & 1
    blk_coded = grp_bit > 0
    counts_z = (jnp.count_nonzero(luma_ac, axis=-1) > 0).astype(I32) \
        * blk_coded
    counts_raster = jnp.zeros_like(counts_z).at[:, R].set(counts_z)
    luma8_z = out.get("luma8_z")
    if luma8_z is not None:
        # I8x8 neighbors expose the 8x8 block's coded status on every
        # covered 4x4 cell (the nnz4-replication rule of the P path)
        c8 = jnp.any(luma8_z.reshape(nmb, 4, 64) != 0,
                     axis=-1).astype(I32)
        cellmap = jnp.asarray(
            [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])
        counts_raster = jnp.where(t8f[:, None], c8[:, cellmap],
                                  counts_raster)
    lmap = counts_raster.reshape(mb_h, mb_w, 4, 4).swapaxes(1, 2) \
        .reshape(mb_h * 4, mb_w * 4)
    a, b = _nbr_grids(lmap, 1)
    ctx_ac_raster = 2 * b + a
    ctx_ac = ctx_ac_raster.reshape(mb_h, 4, mb_w, 4).swapaxes(1, 2) \
        .reshape(nmb, 16)[:, R]

    ctx_cdc = []
    ctx_cac = []
    for ch in range(2):
        dcm = (chroma_dc[:, ch] != 0).any(-1).reshape(mb_h, mb_w).astype(I32)
        a, b = _nbr_grids(dcm, 1)
        ctx_cdc.append((2 * b + a).reshape(nmb))
        acm = (jnp.count_nonzero(chroma_ac[:, ch, :, 1:], axis=-1) > 0) \
            .astype(I32).reshape(mb_h, mb_w, 2, 2).swapaxes(1, 2) \
            .reshape(mb_h * 2, mb_w * 2)
        a, b = _nbr_grids(acm, 1)
        ctx_cac.append((2 * b + a).reshape(mb_h, 2, mb_w, 2)
                       .swapaxes(1, 2).reshape(nmb, 4))
    ctx_cdc = jnp.stack(ctx_cdc, axis=1)              # (nmb, 2)
    ctx_cac = jnp.stack(ctx_cac, axis=1)              # (nmb, 2, 4)

    # ---- residual blocks (I16: DC cat0 + AC cat1; I4x4: cat2 full)
    dc_ops = residual_block_ops(luma_dc, 0, ctx_dc, ~i4f)
    ac15 = residual_block_ops(
        luma_ac[..., 1:].reshape(nmb * 16, 15), 1,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat((~i4f) & (cbp_lf > 0), 16))
    full16 = residual_block_ops(
        luma_ac.reshape(nmb * 16, 16), 2,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat(i4f & ~t8f, 16) & blk_coded.reshape(nmb * 16))
    w15, w16 = ac15.shape[1], full16.shape[1]
    ac15p = jnp.concatenate(
        [ac15, jnp.full((nmb * 16, w16 - w15), PAD_OP)], axis=1)
    blk_ops = jnp.where(jnp.repeat(i4f, 16)[:, None], full16, ac15p) \
        .reshape(nmb, -1)
    if luma8_z is not None:
        # I8x8 residual: 4 cat-5 blocks ride the same luma slot region
        cbp8 = ((cbp_lf[:, None] >> jnp.arange(4, dtype=I32)) & 1) > 0
        ops8 = residual_block_ops8(
            luma8_z.reshape(nmb * 4, 64),
            jnp.repeat(t8f, 4) & cbp8.reshape(nmb * 4)).reshape(nmb, -1)
        pad8 = jnp.full((nmb, blk_ops.shape[1] - ops8.shape[1]), PAD_OP)
        blk_ops = jnp.where(t8f[:, None],
                            jnp.concatenate([ops8, pad8], axis=1),
                            blk_ops)
    cdc_ops = residual_block_ops(
        chroma_dc.reshape(nmb * 2, 4), 3,
        ctx_cdc.reshape(nmb * 2), jnp.repeat(cbp_chroma > 0, 2))
    cac_ops = residual_block_ops(
        chroma_ac[..., 1:].reshape(nmb * 8, 15), 4,
        ctx_cac.reshape(nmb * 8), jnp.repeat(cbp_chroma == 2, 8))

    # ---- end_of_slice terminal after every MB but the last (the final
    # terminal(1) is emitted by the engine flush)
    is_last = jnp.arange(nmb) == nmb - 1
    term = _sel(~is_last, jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,)))

    allops = jnp.concatenate([
        header1,
        pm_ops,
        header2,
        dc_ops,
        blk_ops,
        cdc_ops.reshape(nmb, -1),
        cac_ops.reshape(nmb, -1),
        term[:, None]], axis=1)
    return allops.ravel()


def compact_ops(ops_flat, cap: int):
    """Drop pad ops, keeping order. Returns (ops[:cap], count).
    (A searchsorted/gather formulation was tried and measured SLOWER
    than this scatter at 23M-op planes; a hierarchical compaction is
    the open optimization here.)"""
    keep = (ops_flat >> 29) != KIND_PAD
    pos = jnp.cumsum(keep.astype(I32)) - 1
    dst = jnp.where(keep, pos, cap)
    out = jnp.zeros(cap, U32).at[dst].set(ops_flat, mode="drop")
    return out, keep.sum()


# halfword transfer format: d2h of the op stream dominates the frame
# wall on tunneled devices (~10 MB/s), so ops cross as 16-bit halfwords
# packed in pairs into uint32. Per-op layout (bit 15 = extended flag):
#   compact (1 hw):  0 | kind<<12 | payload12, where payload12 packs
#                    (b << HW_A_BITS[kind]) | a — covers decisions,
#                    levels, terminals, short bypass/ue/ones;
#   extended (3 hw): (0x8000 | kind<<12 | b), (a & 0x7FFF), (a >> 15)
#                    — continuation halfwords always have bit15 = 0, so
#                    the host parse is branch-free/vectorized.
# The host expands this back to the 32-bit op stream (cabac.unpack_hw)
# before the serial engine; native/cabac.c is unchanged.
HW_A_BITS = np.array([11, 8, 9, 11, 0, 9, 0, 11], np.int32)


def hw_pack(cops, n, cap_hw: int):
    """Halfword-pack a compacted op stream (cops from compact_ops,
    first n entries live). Returns (packed uint32[cap_hw // 2] with two
    halfwords per word, low halfword first; n_hw)."""
    cap_hw = cap_hw + (cap_hw & 1)          # pair packing needs even
    kind = (cops >> 29).astype(I32)
    a = (cops & jnp.uint32(0x1FFFF)).astype(I32)
    b = ((cops >> 17) & jnp.uint32(0xFFF)).astype(I32)
    valid = jnp.arange(cops.shape[0]) < n
    abits = jnp.asarray(HW_A_BITS)[kind]
    small = (a < (1 << abits)) & (b < (1 << (12 - abits)))
    hw0 = jnp.where(small,
                    (kind << 12) | (b << abits) | a,
                    0x8000 | (kind << 12) | b)
    nhw = jnp.where(valid, jnp.where(small, 1, 3), 0)
    off = jnp.cumsum(nhw) - nhw
    ext = valid & ~small
    buf = jnp.zeros(cap_hw, I32)
    buf = buf.at[jnp.where(valid, off, cap_hw)].set(hw0, mode="drop")
    buf = buf.at[jnp.where(ext, off + 1, cap_hw)].set(a & 0x7FFF,
                                                      mode="drop")
    buf = buf.at[jnp.where(ext, off + 2, cap_hw)].set(a >> 15,
                                                      mode="drop")
    pairs = buf.reshape(-1, 2).astype(U32)
    words = pairs[:, 0] | (pairs[:, 1] << 16)
    return words, nhw.sum()


# mvd unary context ladder (x264_cabac_mb_mvd_cpn ctxes, encoder/cabac.c)
# per-position ctx offsets for unary bins 1..8 relative to the component
# base (40 for x, 47 for y): 3,4,5,6,6,6,6,6
_MVD_TERM_OFF = np.array([0, 3, 4, 5, 6, 6, 6, 6, 6], np.int32)


def _mvd_component_ops(mvd_c, base: int, inc, active):
    """8 slots of UEG3 mvd binarization for one component
    (x264_cabac_mb_mvd_cpn, encoder/cabac.c:444).

    mvd_c/inc/active: (N,). Returns list of 8 op arrays."""
    a = jnp.abs(mvd_c)
    s0 = _sel(active, op(KIND_DECISION, base + inc, a > 0))
    u1 = _sel(active & (a >= 2), op(KIND_DECISION, jnp.int32(base + 3), 1))
    u2 = _sel(active & (a >= 3), op(KIND_DECISION, jnp.int32(base + 4), 1))
    u3 = _sel(active & (a >= 4), op(KIND_DECISION, jnp.int32(base + 5), 1))
    ones = jnp.clip(jnp.minimum(a - 1, 8) - 3, 0, 5)
    run = _sel(active & (ones > 0), op(KIND_ONES, jnp.int32(base + 6), ones))
    term_ctx = base + jnp.asarray(_MVD_TERM_OFF)[jnp.clip(a, 0, 8)]
    term = _sel(active & (a >= 1) & (a < 9), op(KIND_DECISION, term_ctx, 0))
    ue = _sel(active & (a >= 9), op(KIND_UE, jnp.maximum(a - 9, 0), 3))
    sign = _sel(active & (a >= 1), op(KIND_BYPASS, mvd_c < 0, 1))
    return [s0, u1, u2, u3, run, term, ue, sign]


def _cbf_ctx_from_grid(grid, intra_cur_grid):
    """CBF ctxIdxInc on a block grid: neighbor nonzero flags, with
    outside-frame resolving to the *current* MB's intra flag
    (the 0x7f/0x80 masking of cbf_ctxidxinc, encoder/cabac.c:508)."""
    a, b = _nbr_grids(grid, 2)            # 2 = outside sentinel
    ia = jnp.where(a == 2, intra_cur_grid, a)
    ib = jnp.where(b == 2, intra_cur_grid, b)
    return 2 * ib + ia


def p_slice_ops(out, mb_h: int, mb_w: int, n_refs: int = 1,
                t8_mode: bool = False):
    """Packed op planes for a whole P CABAC slice
    (x264_macroblock_write_cabac P branch + x264_cabac_mb_skip,
    encoder/cabac.c:300-306,781-1025). n_refs=2 adds the per-partition
    ref_idx_l0 unary bins (x264_cabac_mb_ref, encoder/cabac.c:228)."""
    from .. import tables

    nmb = mb_h * mb_w
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    intra = out["intra_mb"].reshape(mb_h, mb_w)
    skip = out["skip"].reshape(mb_h, mb_w)
    cbp_l = out["cbp_luma_bits"].reshape(mb_h, mb_w).astype(I32)
    cbp_c = out["cbp_chroma"].reshape(mb_h, mb_w).astype(I32)
    luma_blocks = out["luma_blocks"].reshape(nmb, 16, 16)
    luma_dc = out["luma_dc"].reshape(nmb, 16)
    chroma_dc = out["chroma_dc"].reshape(nmb, 2, 4)
    chroma_ac = out["chroma_ac"].reshape(nmb, 2, 4, 16)
    mvd = out["mvd"].reshape(nmb, 2)
    mode16 = out["mode16"].reshape(nmb).astype(I32)
    modec = jnp.where(intra, out["modec"].reshape(mb_h, mb_w), 0).astype(I32)
    ptype_g = out.get("ptype")
    ptype_g = (jnp.zeros((mb_h, mb_w), I32) if ptype_g is None
               else out["ptype"].astype(I32))
    ptype_f = ptype_g.reshape(nmb)
    mvd1 = out.get("mvd1")
    mvd1 = (jnp.zeros((nmb, 2), I32) if mvd1 is None
            else out["mvd1"].reshape(nmb, 2))
    mvd4 = out.get("mvd4")
    if mvd4 is None:
        mvd4 = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)

    intra_f = intra.reshape(nmb)
    skip_f = skip.reshape(nmb)
    coded = ~skip_f
    inter_f = coded & ~intra_f
    cbp_lf = cbp_l.reshape(nmb)
    cbp_cf = cbp_c.reshape(nmb)

    slots = []

    # ---- mb_skip_flag (ctx 11 + non-skip neighbors)
    nonskip = (~skip).astype(I32)
    a, b = _nbr_grids(nonskip, 0)          # unavailable contributes 0
    skip_ctx = (11 + a + b).reshape(nmb)
    slots.append(op(KIND_DECISION, skip_ctx, skip_f))

    # ---- mb_type: P_L0 prefix bins (x264_cabac_mb_type P branch,
    # encoder/cabac.c:86-113): 16x16 = (14,0)(15,0)(16,0);
    # 16x8 = (14,0)(15,1)(17,1); 8x16 = (14,0)(15,1)(17,0);
    # P_8x8 = (14,0)(15,0)(16,1)
    p8_f = ptype_f == 3
    slots.append(_sel(coded, op(KIND_DECISION, jnp.full(nmb, 14, I32),
                                intra_f)))
    slots.append(_sel(inter_f, op(KIND_DECISION, jnp.full(nmb, 15, I32),
                                  (ptype_f == 1) | (ptype_f == 2))))
    slots.append(_sel(inter_f & ((ptype_f == 0) | p8_f),
                      op(KIND_DECISION, jnp.full(nmb, 16, I32), p8_f)))
    slots.append(_sel(inter_f & ((ptype_f == 1) | (ptype_f == 2)),
                      op(KIND_DECISION, jnp.full(nmb, 17, I32),
                         ptype_f == 1)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 17, I32), 1)))
    slots.append(_sel(intra_f,
                      jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,))))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 18, I32),
                                  cbp_lf > 0)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 19, I32),
                                  cbp_cf > 0)))
    slots.append(_sel(intra_f & (cbp_cf > 0),
                      op(KIND_DECISION, jnp.full(nmb, 19, I32), cbp_cf == 2)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 20, I32),
                                  mode16 >> 1)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 20, I32),
                                  mode16 & 1)))

    # ---- intra chroma pred mode
    cm_l, cm_t = _nbr_grids(modec, 0)
    cctx = (64 + (cm_l != 0).astype(I32) + (cm_t != 0).astype(I32)) \
        .reshape(nmb)
    cm = modec.reshape(nmb)
    slots.append(_sel(intra_f, op(KIND_DECISION, cctx, cm > 0)))
    slots.append(_sel(intra_f & (cm > 0),
                      op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 1)))
    slots.append(_sel(intra_f & (cm > 1),
                      op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 2)))

    # ---- sub_mb_type x4 (x264_cabac_mb_sub_p_partition: D_L0_8x8 is
    # one '1' bin at ctx 21; encoder/cabac.c:309-312,877-880)
    p8_g = ptype_g == 3
    for _ in range(4):
        slots.append(_sel(inter_f & p8_f,
                          op(KIND_DECISION, jnp.full(nmb, 21, I32), 1)))

    gy4 = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx4 = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    # first block of each partition/sub-block: p0 at (4Y, 4X); p1 at
    # (4Y+2, 4X) for 16x8, (4Y, 4X+2) for 8x16 and P8x8 sub 1;
    # P8x8 subs 2/3 at (4Y+2, 4X) / (4Y+2, 4X+2)
    pr1 = jnp.where(ptype_g == 1, gy4 + 2, gy4)
    pc1 = jnp.where((ptype_g == 2) | p8_g, gx4 + 2, gx4)
    part_pos = ((gy4, gx4), (pr1, pc1),
                (gy4 + 2, gx4), (gy4 + 2, gx4 + 2))
    part_act = (inter_f, inter_f & (ptype_f != 0),
                inter_f & p8_f, inter_f & p8_f)

    if n_refs > 1:
        # ---- ref_idx_l0 per partition (x264_cabac_mb_ref,
        # encoder/cabac.c:228-246): ctx = (refA>0) + 2*(refB>0) from
        # the partition's left/top 4x4 cache slots; unary bins at
        # 54+ctx, continuation ctx (ctx>>2)+4 = 4 for ctx<4 -> 58.
        # Skip/intra neighbors cache ref 0 / -1, so ref>0 covers the
        # !skip test of the reference for P slices.
        ref_idx = out["ref_idx"].reshape(nmb).astype(I32)
        ref4 = out["ref4"]
        ref4p = jnp.pad(ref4, ((1, 1), (1, 1)), constant_values=-1)
        for act, (pr, pc) in zip(part_act, part_pos):
            ra = ref4p[pr + 1, pc] > 0           # (pr, pc-1)
            rb = ref4p[pr, pc + 1] > 0           # (pr-1, pc)
            rctx = (54 + ra.astype(I32)
                    + 2 * rb.astype(I32)).reshape(nmb)
            slots.append(_sel(act, op(KIND_DECISION, rctx, ref_idx > 0)))
            slots.append(_sel(act & (ref_idx > 0),
                              op(KIND_DECISION, jnp.full(nmb, 58, I32),
                                 0)))

    # ---- mvd (inter): per partition in syntax order; ctx inc from the
    # partition's left/top 4x4 neighbor |mvd| (x264_cabac_mb_mvd_cpn
    # amvd, encoder/cabac.c:397-401, from the 4x4 mvd cache)
    mvd4p = jnp.pad(mvd4, ((1, 1), (1, 1), (0, 0)))
    mvd_sub = out.get("mvd_sub")
    mvd_sub = (jnp.zeros((nmb, 4, 2), I32) if mvd_sub is None
               else out["mvd_sub"].reshape(nmb, 4, 2))
    mvd_k = (jnp.where(p8_f[:, None], mvd_sub[:, 0], mvd),
             jnp.where(p8_f[:, None], mvd_sub[:, 1], mvd1),
             mvd_sub[:, 2], mvd_sub[:, 3])
    part_list = tuple(
        (mvd_k[k], part_act[k], *part_pos[k]) for k in range(4))
    for mvdp, act, pr, pc in part_list:
        for comp, base in ((0, 40), (1, 47)):
            a_n = jnp.abs(mvd4p[pr + 1, pc, comp])        # (pr, pc-1)
            b_n = jnp.abs(mvd4p[pr, pc + 1, comp])        # (pr-1, pc)
            amvd = (a_n + b_n).reshape(nmb)
            inc = (amvd > 2).astype(I32) + (amvd > 32).astype(I32)
            slots.extend(_mvd_component_ops(mvdp[:, comp], base, inc, act))

    # ---- coded_block_pattern (inter only; x264_cabac_mb_cbp_luma/chroma)
    cbp_all = jnp.where(skip, 0, cbp_l)     # per-MB luma cbp
    cbl_l, cbl_t = _nbr_grids(cbp_all, -1)
    ctx0 = 76 - ((cbl_l >> 1) & 1) - ((cbl_t >> 1) & 2)
    ctx1 = 76 - ((cbp_all >> 0) & 1) - ((cbl_t >> 2) & 2)
    ctx2 = 76 - ((cbl_l >> 3) & 1) - ((cbp_all << 1) & 2)
    ctx3 = 76 - ((cbp_all >> 2) & 1) - ((cbp_all >> 0) & 2)
    for k, cx in enumerate((ctx0, ctx1, ctx2, ctx3)):
        slots.append(_sel(inter_f, op(KIND_DECISION, cx.reshape(nmb),
                                      (cbp_lf >> k) & 1)))
    cbc_all = jnp.where(skip, 0, cbp_c)
    cbc_l, cbc_t = _nbr_grids(cbc_all, -1)
    c0 = 77 + ((cbc_l > 0) & (cbc_l != -1)).astype(I32) \
        + 2 * ((cbc_t > 0) & (cbc_t != -1)).astype(I32)
    c1 = 77 + 4 + (cbc_l == 2).astype(I32) + 2 * (cbc_t == 2).astype(I32)
    slots.append(_sel(inter_f, op(KIND_DECISION, c0.reshape(nmb),
                                  cbp_cf > 0)))
    slots.append(_sel(inter_f & (cbp_cf > 0),
                      op(KIND_DECISION, c1.reshape(nmb), cbp_cf == 2)))

    # ---- transform_size_8x8_flag (ctx 399 + 8x8 neighbors; present
    # for inter MBs with coded luma when the PPS enables 8x8,
    # encoder/cabac.c:975-977 + x264_cabac_mb_transform_size:369)
    if t8_mode:
        t8_g = out["t8_mb"].reshape(mb_h, mb_w)
        t8_f = t8_g.reshape(nmb)
        t8l, t8t = _nbr_grids(t8_g.astype(I32), 0)
        tctx = (399 + t8l + t8t).reshape(nmb)
        slots.append(_sel(inter_f & (cbp_lf > 0),
                          op(KIND_DECISION, tctx, t8_f)))
    else:
        t8_f = jnp.zeros(nmb, bool)

    # ---- mb_qp_delta
    has_dqp = coded & (intra_f | (cbp_lf > 0) | (cbp_cf > 0))
    slots.extend(_dqp_slots(out, has_dqp, nmb))

    header = jnp.stack(slots, axis=1)

    # ---- residual CBF contexts
    intra4 = jnp.repeat(jnp.repeat(intra.astype(I32), 4, 0), 4, 1)
    intra2 = jnp.repeat(jnp.repeat(intra.astype(I32), 2, 0), 2, 1)

    dcflag = jnp.where(intra, jnp.any(luma_dc != 0, axis=-1)
                       .reshape(mb_h, mb_w), False).astype(I32)
    a, b = _nbr_grids(dcflag, 1)           # unavailable -> 1 (cbp>>8 of -1)
    ctx_dc = (2 * b + a).reshape(nmb)

    grp_bit = (cbp_lf[:, None] >> (jnp.arange(16, dtype=I32) // 4)) & 1
    blk_coded = jnp.where(intra_f[:, None], (cbp_lf > 0)[:, None],
                          grp_bit > 0)
    # neighbor cbf flags come from the final nnz4 map (carries the 8x8
    # per-cell counts for transform-8x8 MBs)
    lmap = (out["nnz4"] > 0).astype(I32)
    ctx_ac_raster = _cbf_ctx_from_grid(lmap, intra4)
    ctx_ac = ctx_ac_raster.reshape(mb_h, 4, mb_w, 4).swapaxes(1, 2) \
        .reshape(nmb, 16)[:, R]

    ctx_cdc = []
    ctx_cac = []
    for ch in range(2):
        dcm = jnp.where(cbp_c > 0,
                        (chroma_dc[:, ch] != 0).any(-1).reshape(mb_h, mb_w),
                        False).astype(I32)
        a, b = _nbr_grids(dcm, 2)
        ia = jnp.where(a == 2, intra.astype(I32), a)
        ib = jnp.where(b == 2, intra.astype(I32), b)
        ctx_cdc.append((2 * ib + ia).reshape(nmb))
        acm = ((jnp.count_nonzero(chroma_ac[:, ch, :, 1:], axis=-1) > 0)
               .astype(I32) * (cbp_cf == 2)[:, None]) \
            .reshape(mb_h, mb_w, 2, 2).swapaxes(1, 2) \
            .reshape(mb_h * 2, mb_w * 2)
        ctx_cac.append(_cbf_ctx_from_grid(acm, intra2)
                       .reshape(mb_h, 2, mb_w, 2)
                       .swapaxes(1, 2).reshape(nmb, 4))
    ctx_cdc = jnp.stack(ctx_cdc, axis=1)
    ctx_cac = jnp.stack(ctx_cac, axis=1)

    # ---- residual blocks (two layouts, selected per MB)
    dc_ops = residual_block_ops(luma_dc, 0, ctx_dc, intra_f)
    ac15 = residual_block_ops(
        luma_blocks[:, :, 1:].reshape(nmb * 16, 15), 1,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat(intra_f & (cbp_lf > 0), 16))
    full16 = residual_block_ops(
        luma_blocks.reshape(nmb * 16, 16), 2,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat(inter_f & ~t8_f, 16) & (grp_bit > 0).reshape(nmb * 16))
    # unified per-block slot width: pad the 15-coeff layout
    w15, w16 = ac15.shape[1], full16.shape[1]
    ac15p = jnp.concatenate(
        [ac15, jnp.full((nmb * 16, w16 - w15), PAD_OP)], axis=1)
    blk_ops = jnp.where(jnp.repeat(intra_f, 16)[:, None], ac15p, full16) \
        .reshape(nmb, -1)
    if t8_mode:
        # 8x8 residual layout (4 cat-5 blocks, 68 slots each) rides the
        # same 288-slot luma region, selected per MB
        cbp8 = ((cbp_lf[:, None] >> jnp.arange(4, dtype=I32)) & 1) > 0
        ops8 = residual_block_ops8(
            out["luma8_z"].reshape(nmb * 4, 64),
            jnp.repeat(t8_f, 4) & cbp8.reshape(nmb * 4)).reshape(nmb, -1)
        pad8 = jnp.full((nmb, blk_ops.shape[1] - ops8.shape[1]), PAD_OP)
        blk_ops = jnp.where(t8_f[:, None],
                            jnp.concatenate([ops8, pad8], axis=1),
                            blk_ops)

    cdc_ops = residual_block_ops(
        chroma_dc.reshape(nmb * 2, 4), 3,
        ctx_cdc.reshape(nmb * 2), jnp.repeat(coded & (cbp_cf > 0), 2))
    cac_ops = residual_block_ops(
        chroma_ac[..., 1:].reshape(nmb * 8, 15), 4,
        ctx_cac.reshape(nmb * 8), jnp.repeat(coded & (cbp_cf == 2), 8))

    is_last = jnp.arange(nmb) == nmb - 1
    term = _sel(~is_last, jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,)))

    allops = jnp.concatenate([
        header,
        dc_ops,
        blk_ops,
        cdc_ops.reshape(nmb, -1),
        cac_ops.reshape(nmb, -1),
        term[:, None]], axis=1)
    return allops.ravel()


def b_slice_ops(out, mb_h: int, mb_w: int, t8_mode: bool = False):
    """Packed op planes for a whole B CABAC slice
    (x264_macroblock_write_cabac B branch + x264_cabac_mb_type B table
    + x264_cabac_mb_skip, encoder/cabac.c:123-190,300-306): B_SKIP via
    the skip flag, B_Direct_16x16 as the single mb_type bin 0, then
    D_16x16 L0/L1/BI + I16x16."""
    from .. import tables

    nmb = mb_h * mb_w
    R = jnp.asarray(tables.LUMA4x4_RASTER_OF_Z)
    intra = out["intra_mb"].reshape(mb_h, mb_w)
    skip = out["skip"].reshape(mb_h, mb_w)
    direct = out["direct_mb"].reshape(mb_h, mb_w)
    cbp_l = out["cbp_luma_bits"].reshape(mb_h, mb_w).astype(I32)
    cbp_c = out["cbp_chroma"].reshape(mb_h, mb_w).astype(I32)
    luma_blocks = out["luma_blocks"].reshape(nmb, 16, 16)
    luma_dc = out["luma_dc"].reshape(nmb, 16)
    chroma_dc = out["chroma_dc"].reshape(nmb, 2, 4)
    chroma_ac = out["chroma_ac"].reshape(nmb, 2, 4, 16)
    mode16 = out["mode16"].reshape(nmb).astype(I32)
    modec = jnp.where(intra, out["modec"].reshape(mb_h, mb_w), 0).astype(I32)
    bmode = out["bmode"].reshape(nmb).astype(I32)
    use_l0 = out["use_l0"].reshape(nmb)
    use_l1 = out["use_l1"].reshape(nmb)
    mvd_l0 = out["mvd_l0"].reshape(nmb, 2)
    mvd_l1 = out["mvd_l1"].reshape(nmb, 2)

    intra_f = intra.reshape(nmb)
    skip_f = skip.reshape(nmb)
    direct_f = direct.reshape(nmb)
    coded = ~skip_f
    interc_f = coded & ~intra_f          # codes cbp/residual
    expl_f = interc_f & ~direct_f        # codes mb_type bins 1+ / mvd
    cbp_lf = cbp_l.reshape(nmb)
    cbp_cf = cbp_c.reshape(nmb)

    slots = []

    # ---- mb_skip_flag: B ctx base 24 + non-skip neighbors
    nonskip = (~skip).astype(I32)
    a, b = _nbr_grids(nonskip, 0)
    skip_ctx = (24 + a + b).reshape(nmb)
    slots.append(op(KIND_DECISION, skip_ctx, skip_f))

    # ---- mb_type (D_16x16 rows of the i_mb_bits table):
    # B_Direct_16x16 {0}; L0 {1,0,0}, L1 {1,0,1}, BI {1,1,0,0,0,0};
    # intra prefix {1,1,1,1,0,1} + I16 suffix at ctx 32..35. Bin-0 ctx
    # counts available neighbors that are not B_SKIP/B_DIRECT.
    nds = (~(skip | direct)).astype(I32)
    a, b = _nbr_grids(nds, 0)
    ctx0 = (27 + a + b).reshape(nmb)
    is_bi = expl_f & (bmode == 2)
    slots.append(_sel(coded, op(KIND_DECISION, ctx0, ~direct_f)))  # bin0
    slots.append(_sel(coded & ~direct_f,
                      op(KIND_DECISION, jnp.full(nmb, 30, I32),
                         intra_f | is_bi)))                  # bin1
    # bin2: ctx 32 when bin1==0, else 31
    slots.append(_sel(expl_f & ~is_bi,
                      op(KIND_DECISION, jnp.full(nmb, 32, I32),
                         bmode == 1)))
    slots.append(_sel(is_bi, op(KIND_DECISION, jnp.full(nmb, 31, I32), 0)))
    slots.append(_sel(is_bi, op(KIND_DECISION, jnp.full(nmb, 32, I32), 0)))
    slots.append(_sel(is_bi, op(KIND_DECISION, jnp.full(nmb, 32, I32), 0)))
    slots.append(_sel(is_bi, op(KIND_DECISION, jnp.full(nmb, 32, I32), 0)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 31, I32), 1)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 32, I32), 1)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 32, I32), 0)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 32, I32), 1)))
    # intra I16 suffix (x264_cabac_mb_type_intra at 32+0..32+3)
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 32, I32), 1)))
    slots.append(_sel(intra_f,
                      jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,))))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 33, I32),
                                  cbp_lf > 0)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 34, I32),
                                  cbp_cf > 0)))
    slots.append(_sel(intra_f & (cbp_cf > 0),
                      op(KIND_DECISION, jnp.full(nmb, 34, I32),
                         cbp_cf == 2)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 35, I32),
                                  mode16 >> 1)))
    slots.append(_sel(intra_f, op(KIND_DECISION, jnp.full(nmb, 35, I32),
                                  mode16 & 1)))

    # ---- intra chroma pred mode
    cm_l, cm_t = _nbr_grids(modec, 0)
    cctx = (64 + (cm_l != 0).astype(I32) + (cm_t != 0).astype(I32)) \
        .reshape(nmb)
    cm = modec.reshape(nmb)
    slots.append(_sel(intra_f, op(KIND_DECISION, cctx, cm > 0)))
    slots.append(_sel(intra_f & (cm > 0),
                      op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 1)))
    slots.append(_sel(intra_f & (cm > 1),
                      op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 2)))

    # ---- mvd per list (l0 then l1); ctx from the same-list mvd cache
    gy4 = jnp.arange(mb_h, dtype=I32)[:, None] * 4 \
        + jnp.zeros((1, mb_w), I32)
    gx4 = jnp.arange(mb_w, dtype=I32)[None, :] * 4 \
        + jnp.zeros((mb_h, 1), I32)
    for mvdp, act, mvd4 in ((mvd_l0, use_l0, out["mvd4_l0"]),
                            (mvd_l1, use_l1, out["mvd4_l1"])):
        mvd4p = jnp.pad(mvd4, ((1, 1), (1, 1), (0, 0)))
        for comp, base in ((0, 40), (1, 47)):
            a_n = jnp.abs(mvd4p[gy4 + 1, gx4, comp])
            b_n = jnp.abs(mvd4p[gy4, gx4 + 1, comp])
            amvd = (a_n + b_n).reshape(nmb)
            inc = (amvd > 2).astype(I32) + (amvd > 32).astype(I32)
            slots.extend(_mvd_component_ops(mvdp[:, comp], base, inc, act))

    # ---- coded_block_pattern (inter only)
    cbp_all = cbp_l
    cbl_l, cbl_t = _nbr_grids(cbp_all, -1)
    ctx0b = 76 - ((cbl_l >> 1) & 1) - ((cbl_t >> 1) & 2)
    ctx1b = 76 - ((cbp_all >> 0) & 1) - ((cbl_t >> 2) & 2)
    ctx2b = 76 - ((cbl_l >> 3) & 1) - ((cbp_all << 1) & 2)
    ctx3b = 76 - ((cbp_all >> 2) & 1) - ((cbp_all >> 0) & 2)
    for k, cx in enumerate((ctx0b, ctx1b, ctx2b, ctx3b)):
        slots.append(_sel(interc_f, op(KIND_DECISION, cx.reshape(nmb),
                                       (cbp_lf >> k) & 1)))
    cbc_all = cbp_c
    cbc_l, cbc_t = _nbr_grids(cbc_all, -1)
    c0 = 77 + ((cbc_l > 0) & (cbc_l != -1)).astype(I32) \
        + 2 * ((cbc_t > 0) & (cbc_t != -1)).astype(I32)
    c1 = 77 + 4 + (cbc_l == 2).astype(I32) + 2 * (cbc_t == 2).astype(I32)
    slots.append(_sel(interc_f, op(KIND_DECISION, c0.reshape(nmb),
                                   cbp_cf > 0)))
    slots.append(_sel(interc_f & (cbp_cf > 0),
                      op(KIND_DECISION, c1.reshape(nmb), cbp_cf == 2)))

    # ---- transform_size_8x8_flag (always 0 in B slices v1)
    if t8_mode:
        slots.append(_sel(interc_f & (cbp_lf > 0),
                          op(KIND_DECISION, jnp.full(nmb, 399, I32), 0)))

    # ---- mb_qp_delta (0 under CQP)
    has_dqp = coded & (intra_f | (cbp_lf > 0) | (cbp_cf > 0))
    slots.append(_sel(has_dqp, op(KIND_DECISION, jnp.full(nmb, 60, I32), 0)))

    header = jnp.stack(slots, axis=1)

    # ---- residual CBF contexts (identical structure to p_slice_ops)
    intra4 = jnp.repeat(jnp.repeat(intra.astype(I32), 4, 0), 4, 1)
    intra2 = jnp.repeat(jnp.repeat(intra.astype(I32), 2, 0), 2, 1)

    dcflag = jnp.where(intra, jnp.any(luma_dc != 0, axis=-1)
                       .reshape(mb_h, mb_w), False).astype(I32)
    a, b = _nbr_grids(dcflag, 1)
    ctx_dc = (2 * b + a).reshape(nmb)

    grp_bit = (cbp_lf[:, None] >> (jnp.arange(16, dtype=I32) // 4)) & 1
    blk_coded = jnp.where(intra_f[:, None], (cbp_lf > 0)[:, None],
                          grp_bit > 0)
    counts_z = (jnp.count_nonzero(luma_blocks, axis=-1) > 0).astype(I32) \
        * blk_coded
    counts_raster = jnp.zeros_like(counts_z).at[:, R].set(counts_z)
    lmap = counts_raster.reshape(mb_h, mb_w, 4, 4).swapaxes(1, 2) \
        .reshape(mb_h * 4, mb_w * 4)
    ctx_ac_raster = _cbf_ctx_from_grid(lmap, intra4)
    ctx_ac = ctx_ac_raster.reshape(mb_h, 4, mb_w, 4).swapaxes(1, 2) \
        .reshape(nmb, 16)[:, R]

    ctx_cdc = []
    ctx_cac = []
    for ch in range(2):
        dcm = jnp.where(cbp_c > 0,
                        (chroma_dc[:, ch] != 0).any(-1).reshape(mb_h, mb_w),
                        False).astype(I32)
        a, b = _nbr_grids(dcm, 2)
        ia = jnp.where(a == 2, intra.astype(I32), a)
        ib = jnp.where(b == 2, intra.astype(I32), b)
        ctx_cdc.append((2 * ib + ia).reshape(nmb))
        acm = ((jnp.count_nonzero(chroma_ac[:, ch, :, 1:], axis=-1) > 0)
               .astype(I32) * (cbp_cf == 2)[:, None]) \
            .reshape(mb_h, mb_w, 2, 2).swapaxes(1, 2) \
            .reshape(mb_h * 2, mb_w * 2)
        ctx_cac.append(_cbf_ctx_from_grid(acm, intra2)
                       .reshape(mb_h, 2, mb_w, 2)
                       .swapaxes(1, 2).reshape(nmb, 4))
    ctx_cdc = jnp.stack(ctx_cdc, axis=1)
    ctx_cac = jnp.stack(ctx_cac, axis=1)

    dc_ops = residual_block_ops(luma_dc, 0, ctx_dc, intra_f)
    ac15 = residual_block_ops(
        luma_blocks[:, :, 1:].reshape(nmb * 16, 15), 1,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat(intra_f & (cbp_lf > 0), 16))
    full16 = residual_block_ops(
        luma_blocks.reshape(nmb * 16, 16), 2,
        ctx_ac.reshape(nmb * 16),
        jnp.repeat(interc_f, 16) & (grp_bit > 0).reshape(nmb * 16))
    w15, w16 = ac15.shape[1], full16.shape[1]
    ac15p = jnp.concatenate(
        [ac15, jnp.full((nmb * 16, w16 - w15), PAD_OP)], axis=1)
    blk_ops = jnp.where(jnp.repeat(intra_f, 16)[:, None], ac15p, full16) \
        .reshape(nmb, -1)

    cdc_ops = residual_block_ops(
        chroma_dc.reshape(nmb * 2, 4), 3,
        ctx_cdc.reshape(nmb * 2), jnp.repeat(cbp_cf > 0, 2))
    cac_ops = residual_block_ops(
        chroma_ac[..., 1:].reshape(nmb * 8, 15), 4,
        ctx_cac.reshape(nmb * 8), jnp.repeat(cbp_cf == 2, 8))

    is_last = jnp.arange(nmb) == nmb - 1
    term = _sel(~is_last, jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,)))

    allops = jnp.concatenate([
        header,
        dc_ops,
        blk_ops,
        cdc_ops.reshape(nmb, -1),
        cac_ops.reshape(nmb, -1),
        term[:, None]], axis=1)
    return allops.ravel()
