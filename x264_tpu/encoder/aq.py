"""Adaptive quantization (variance AQ) + per-MB QP plumbing.

x264_adaptive_quant_frame (encoder/ratecontrol.c:231-249): per MB,
energy = sum of pixel variances of the Y 16x16 + U/V 8x8 blocks and
qp_offset = strength * 1.0397 * (log2(energy) - 14.427); the per-MB QP
is clip(round(frame_qp + offset), qp_min, qp_max).

The per-MB QP changes quant/dequant tables per MB (row gathers from the
full 52-QP tables), the deblock QP map, and adds mb_qp_delta syntax.
Effective-QP semantics (spec 7.4.5: MBs without a mb_qp_delta element
inherit QPy_prev) are realized with a vectorized forward fill.

Deviations from the reference (documented):
  - no +-1 hysteresis toward the previous MB's QP (a raster-sequential
    micro-optimization of dqp bits, x264_adaptive_quant:257);
  - the empty-I16x16 forced dqp=0 trick is not applied (the true dqp is
    coded; conformant, costs a few bits on flat frames).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

I32 = jnp.int32


def full_tables(qt: tables.QuantTables):
    """Device copies of the full per-QP quant tables for row gathers."""
    a = lambda x: jnp.asarray(np.asarray(x, np.int32))
    return dict(
        q4_mf=a(qt.quant4_mf), q4_bias=a(qt.quant4_bias),
        dq4_mf=a(qt.dequant4_mf),
        q8_mf=a(qt.quant8_mf), q8_bias=a(qt.quant8_bias),
        dq8_mf=a(qt.dequant8_mf),
        cqp=a(tables.CHROMA_QP_TABLE),
    )


def qp_map_from_planes(y_tiles, u_tiles, v_tiles, qp_frame, strength,
                       qp_min: int, qp_max: int, chroma_qp_offset):
    """(mb_h, mb_w) per-MB luma QP map + chroma QP map."""
    def var(t, logn):
        t = t.astype(jnp.int64) if False else t.astype(I32)
        s = t.sum(axis=(-2, -1))
        ss = (t * t).reshape(*t.shape[:-2], -1)
        # block the partial sums to stay exact in int32
        ss = ss.reshape(*ss.shape[:-1], -1, 64).sum(axis=-1) \
            .astype(jnp.float32).sum(axis=-1)
        return ss - (s.astype(jnp.float32) ** 2) / (1 << logn)

    energy = var(y_tiles, 8) + var(u_tiles, 6) + var(v_tiles, 6)
    energy = jnp.maximum(energy, 1.0)
    qp_adj = strength * 1.0397 * (jnp.log2(energy) - 14.427)
    qp_map = jnp.clip(jnp.round(qp_frame + qp_adj), qp_min, qp_max) \
        .astype(I32)
    cqp_tab = jnp.asarray(tables.CHROMA_QP_TABLE)
    qpc_map = cqp_tab[jnp.clip(qp_map + chroma_qp_offset, 0, 51)]
    return qp_map, qpc_map


def dqp_syntax(qp_map, has_dqp, slice_qp):
    """Vectorized raster forward-fill: per-MB (dqp, effective qp,
    prev-mb dqp-nonzero flag for the CABAC ctx).

    qp_map/has_dqp: (mb_h, mb_w); MBs without a dqp element keep
    QPy_prev (spec 7.4.5), which deblocking reads."""
    shape = qp_map.shape
    q = qp_map.reshape(-1)
    hd = has_dqp.reshape(-1)
    n = q.shape[0]
    idx = jnp.where(hd, jnp.arange(n, dtype=I32), -1)
    last_incl = jax.lax.cummax(idx)                   # last coded <= i
    prev_idx = jnp.concatenate(
        [jnp.full((1,), -1, I32), last_incl[:-1]])    # last coded < i
    prev_qp = jnp.where(prev_idx >= 0,
                        q[jnp.maximum(prev_idx, 0)], slice_qp)
    dqp = jnp.where(hd, q - prev_qp, 0)
    qp_eff = jnp.where(last_incl >= 0,
                       q[jnp.maximum(last_incl, 0)], slice_qp)
    prev_dqp_nz = jnp.concatenate(
        [jnp.zeros((1,), bool), (dqp != 0)[:-1]])
    return (dqp.reshape(shape), qp_eff.reshape(shape),
            prev_dqp_nz.reshape(shape))


def qtab_rows(full, qp_map, qpc_map, intra_cqm: bool,
              inter_tabs: bool = False):
    """Build a per-MB qtab dict with the same keys the residual paths
    read: 16/64-wide tables get shape (*lead, 16|64), per-MB scalars
    (*lead,). The residual paths normalize shapes at their call sites
    (scalar-QP tables stay 1-D/0-D)."""
    iy = tables.CQM_4IY if intra_cqm else tables.CQM_4PY
    ic = tables.CQM_4IC if intra_cqm else tables.CQM_4PC
    q4, b4, d4 = full["q4_mf"], full["q4_bias"], full["dq4_mf"]
    out = {}
    pre_y = "py" if inter_tabs else "y"
    pre_c = "pc" if inter_tabs else "c"
    out[f"{pre_y}_mf"] = q4[iy][qp_map]
    out[f"{pre_y}_bias"] = b4[iy][qp_map]
    out[f"{pre_y}_dmf"] = d4[iy][qp_map % 6]
    out[f"{pre_y}_qpdiv6"] = qp_map // 6
    out[f"{pre_c}_mf"] = q4[ic][qpc_map]
    out[f"{pre_c}_bias"] = b4[ic][qpc_map]
    out[f"{pre_c}_dmf"] = d4[ic][qpc_map % 6]
    out[f"{pre_c}_qpdiv6"] = qpc_map // 6
    out[f"{pre_c}_dmf0"] = d4[ic][qpc_map % 6, 0]
    out[f"{pre_c}_mf_dc"] = q4[ic][qpc_map, 0] >> 1
    out[f"{pre_c}_bias_dc"] = b4[ic][qpc_map, 0] << 1
    if not inter_tabs:
        out["y_dmf0"] = d4[iy][qp_map % 6, 0]
        out["y_mf_dc"] = q4[iy][qp_map, 0] >> 1
        out["y_bias_dc"] = b4[iy][qp_map, 0] << 1
        out["y8_mf"] = full["q8_mf"][tables.CQM_8IY][qp_map]
        out["y8_bias"] = full["q8_bias"][tables.CQM_8IY][qp_map]
        out["y8_dmf"] = full["dq8_mf"][tables.CQM_8IY][qp_map % 6]
    else:
        out["p8_mf"] = full["q8_mf"][tables.CQM_8PY][qp_map]
        out["p8_bias"] = full["q8_bias"][tables.CQM_8PY][qp_map]
        out["p8_dmf"] = full["dq8_mf"][tables.CQM_8PY][qp_map % 6]
    return out


def se_codes(v):
    """(value, length) of the signed exp-Golomb code of v, vectorized
    (bs_write_se semantics)."""
    m = jnp.where(v > 0, 2 * v - 1, -2 * v).astype(I32) + 1   # ue(x)+1
    bl = jnp.zeros_like(m)
    n = m
    for shift in (16, 8, 4, 2, 1):
        ge = n >= (1 << shift)
        bl = bl + jnp.where(ge, shift, 0)
        n = jnp.where(ge, n >> shift, n)
    length = 2 * bl + 1
    return m, length
