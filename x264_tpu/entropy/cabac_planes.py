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

KIND_DECISION, KIND_BYPASS, KIND_UE, KIND_TERMINAL, KIND_PAD, KIND_ONES = \
    range(6)
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
    return 1 + 2 * (C - 1) + 5 * C


def residual_block_ops(coeffs, cat: int, cbf_ctx, coded):
    """Packed ops for N residual blocks (block_residual_write_cabac,
    encoder/cabac.c:584): CBF, significance map, levels.

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
    sigmap_size = jnp.minimum(last + 1, C - 1)
    for i in range(C - 1):
        active = write_res & (i < sigmap_size)
        slots.append(_sel(active,
                          op(KIND_DECISION, SIG_BASE[cat] + i, nz[:, i])))
        slots.append(_sel(active & nz[:, i],
                          op(KIND_DECISION, LAST_BASE[cat] + i, i == last)))

    # levels in reverse scan order (descending position of nonzeros)
    order = jnp.argsort(-jnp.where(nz, pos, -1), axis=1, stable=True)
    lvl = jnp.take_along_axis(coeffs, order, axis=1)
    node = jnp.zeros(N, I32)
    l1 = jnp.asarray(L1_CTX)
    gt1 = jnp.asarray(GT1_CTX)
    tr = jnp.asarray(NODE_TRANS)
    base = int(LVL_BASE[cat])
    for j in range(C):
        active = write_res & (j < total)
        l = lvl[:, j]
        absm1 = jnp.abs(l) - 1
        prefix = jnp.minimum(absm1, 14)
        c1 = base + l1[node]
        cg = base + gt1[node]
        slots.append(_sel(active, op(KIND_DECISION, c1, prefix > 0)))
        ones = jnp.maximum(prefix - 1, 0)
        slots.append(_sel(active & (ones > 0), op(KIND_ONES, cg, ones)))
        slots.append(_sel(active & (prefix > 0) & (prefix < 14),
                          op(KIND_DECISION, cg, 0)))
        slots.append(_sel(active & (prefix >= 14),
                          op(KIND_UE, jnp.maximum(absm1 - 14, 0), 0)))
        slots.append(_sel(active, op(KIND_BYPASS, l < 0, 1)))
        node = jnp.where(active, tr[(prefix > 0).astype(I32), node], node)
    return jnp.stack(slots, axis=1)


def _nbr_grids(flag_map, unavail):
    """(left, top) neighbor values on a grid; outside-frame = unavail."""
    a = jnp.full_like(flag_map, unavail)
    a = a.at[:, 1:].set(flag_map[:, :-1])
    b = jnp.full_like(flag_map, unavail)
    b = b.at[1:, :].set(flag_map[:-1, :])
    return a, b


def i16_slice_ops(out, mb_h: int, mb_w: int):
    """Packed op planes for a whole I16x16 CABAC slice, flattened in
    syntax order (x264_macroblock_write_cabac I_16x16 path,
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

    cbp_luma = jnp.any(luma_ac[..., 1:] != 0, axis=(-2, -1))   # (nmb,)
    cnz_ac = jnp.any(chroma_ac[..., 1:] != 0, axis=(-3, -2, -1))
    cnz_dc = jnp.any(chroma_dc != 0, axis=(-2, -1))
    cbp_chroma = jnp.where(cnz_ac, 2, jnp.where(cnz_dc, 1, 0)).astype(I32)

    ymb, xmb = jnp.mgrid[0:mb_h, 0:mb_w]
    avail_l = (xmb > 0).reshape(nmb)
    avail_t = (ymb > 0).reshape(nmb)

    # ---- header slots (11)
    ctx_mbtype = 3 + avail_l.astype(I32) + avail_t.astype(I32)
    h = [
        op(KIND_DECISION, ctx_mbtype, 1),          # not I_4x4
        jnp.broadcast_to(op(KIND_TERMINAL, 0, 0), (nmb,)),  # not I_PCM
        op(KIND_DECISION, jnp.full(nmb, 6, I32), cbp_luma),
        op(KIND_DECISION, jnp.full(nmb, 7, I32), cbp_chroma > 0),
        _sel(cbp_chroma > 0,
             op(KIND_DECISION, jnp.full(nmb, 8, I32), cbp_chroma == 2)),
        op(KIND_DECISION, jnp.full(nmb, 9, I32), mode16 >> 1),
        op(KIND_DECISION, jnp.full(nmb, 10, I32), mode16 & 1),
    ]
    cm_l, cm_t = _nbr_grids(modec, 0)
    cctx = (64 + (cm_l != 0).astype(I32) + (cm_t != 0).astype(I32)) \
        .reshape(nmb)
    cm = modec.reshape(nmb)
    h.append(op(KIND_DECISION, cctx, cm > 0))
    h.append(_sel(cm > 0, op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 1)))
    h.append(_sel(cm > 1, op(KIND_DECISION, jnp.full(nmb, 67, I32), cm > 2)))
    # dqp = 0 under CQP; ctx 60 since last_dqp == 0
    # (x264_cabac_mb_qp_delta, encoder/cabac.c:271)
    h.append(op(KIND_DECISION, jnp.full(nmb, 60, I32), 0))
    header = jnp.stack(h, axis=1)

    # ---- CBF neighbor contexts (cbf_ctxidxinc, encoder/cabac.c:508)
    dc_nz = jnp.any(luma_dc != 0, axis=-1).reshape(mb_h, mb_w).astype(I32)
    a, b = _nbr_grids(dc_nz, 1)          # unavailable -> 1 (intra slice)
    ctx_dc = (2 * b + a).reshape(nmb)

    counts_z = (jnp.count_nonzero(luma_ac[..., 1:], axis=-1) > 0).astype(I32)
    counts_raster = jnp.zeros_like(counts_z).at[:, R].set(counts_z)
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

    # ---- residual blocks
    ones = jnp.ones(nmb, bool)
    dc_ops = residual_block_ops(luma_dc, 0, ctx_dc, ones)
    ac_ops = residual_block_ops(
        luma_ac[..., 1:].reshape(nmb * 16, 15), 1,
        ctx_ac.reshape(nmb * 16), jnp.repeat(cbp_luma, 16))
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
        header,
        dc_ops,
        ac_ops.reshape(nmb, -1),
        cdc_ops.reshape(nmb, -1),
        cac_ops.reshape(nmb, -1),
        term[:, None]], axis=1)
    return allops.ravel()


def compact_ops(ops_flat, cap: int):
    """Drop pad ops, keeping order. Returns (ops[:cap], count)."""
    keep = (ops_flat >> 29) != KIND_PAD
    pos = jnp.cumsum(keep.astype(I32)) - 1
    dst = jnp.where(keep, pos, cap)
    out = jnp.zeros(cap, U32).at[dst].set(ops_flat, mode="drop")
    return out, keep.sum()
