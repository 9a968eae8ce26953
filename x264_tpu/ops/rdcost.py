"""Batched RD-cost machinery — the x264_rd_cost_mb role
(encoder/rdo.c:139-244) re-staged for TPU.

The reference prices a candidate mode by running the entropy writer in
size-only mode over the whole MB (RDO_SKIP_BS includes of cavlc/cabac.c,
rdo.c:24-60) and charging ssd + (bits * lambda2 >> 8). Here the
residual-bit term is computed for EVERY MB of the frame at once from
the quantized level planes, using the same slice-initial-state CABAC
entropy tables the trellis uses (ops/trellis.make_consts): per-position
significance/last flag costs plus the 8-node level-context machine
walked over the scan (a 16/64-step unrolled vector loop).

Deviations (documented, quality-only — they shift both candidates
equally or by fractions of a bit):
  - contexts are priced from slice-initial CABAC states, not the live
    per-MB state (same tradeoff as the batched trellis);
  - CAVLC streams reuse the CABAC entropy model as the bit estimate;
  - header bits (mb_type/ref/cbp) enter as per-mode constants, mvd
    bits via the exp-Golomb length (the lambda-bits model the SATD
    ladder already used), both in 1/256-bit units.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import trellis as otrellis

I32 = jnp.int32
F32 = jnp.float32


def residual_bits_f8(lv_scan, tc):
    """Estimated CABAC bits (1/256 units) to code each block's levels.

    lv_scan: (N, C) int32 signed levels in scan order; tc: a
    trellis.make_consts dict for the matching category (sig/last/l1/
    unary tables are read; quant tables ignored). Returns (N,) f32.

    Mirrors block_residual_write_cabac (encoder/cabac.c:584-781): sig
    flags for scan positions <= last (capped at C-2), last flags at
    significant positions, then levels in reverse scan order through
    the 8-node context machine. An all-zero block returns 0 (the
    caller charges the coded_block_flag / CBP separately).
    """
    N, C = lv_scan.shape
    nz = lv_scan != 0
    pos = jnp.arange(C, dtype=I32)
    last = jnp.max(jnp.where(nz, pos, -1), axis=1)        # (N,)
    bits = jnp.zeros((N,), F32)

    # significance + last flags (forward order, independent of levels)
    for i in range(C - 1):
        on = i <= last
        nz_i = nz[:, i]
        bits = bits + jnp.where(
            on, jnp.where(nz_i, tc["sig"][i, 1], tc["sig"][i, 0]), 0.0)
        bits = bits + jnp.where(
            on & nz_i,
            jnp.where(last == i, tc["last"][i, 1], tc["last"][i, 0]),
            0.0)

    # levels in reverse scan order through the node machine
    node = jnp.zeros((N,), I32)
    trans = jnp.asarray(otrellis.NODE_TRANS)              # (2, 8)
    l1 = tc["l1"]                                         # (8, 2)
    unary = tc["unary"]                                   # (8, 15)
    sign_f8 = jnp.float32(1 << otrellis.CABAC_SIZE_BITS)
    for i in range(C - 1, -1, -1):
        lv = jnp.abs(lv_scan[:, i])
        nz_i = lv > 0
        prefix = jnp.clip(lv - 1, 0, 14)
        gt1 = prefix > 0
        c_l1 = l1[node, gt1.astype(I32)]
        c_un = unary[node, prefix]
        big = jnp.where(lv >= 15,
                        otrellis._ue_big_f8(jnp.maximum(lv - 15, 0)),
                        0).astype(F32)
        step = c_l1 + jnp.where(gt1, c_un + big, sign_f8)
        bits = bits + jnp.where(nz_i, step, 0.0)
        node = jnp.where(nz_i, trans[gt1.astype(I32), node], node)
    return bits


def ssd_tiles(a_tiles, b_tiles):
    """Per-MB SSD over (..., H, W) tiles -> (...) float32."""
    d = (a_tiles - b_tiles).astype(F32)
    return (d * d).sum(axis=(-2, -1))


def lambda2_f8(qp: int) -> float:
    """RD lambda2 scaled so cost = ssd + bits_f8 * this (bits_f8 in
    1/256 units). Mirrors x264_lambda2_tab = pow(lambda,2)*.9*256
    (encoder/analyse.c:151-158) with cost = ssd + (bits*l2+128)>>8."""
    from .. import tables
    lam = float(tables.LAMBDA_TABLE[qp])
    return 0.9 * lam * lam / 256.0
