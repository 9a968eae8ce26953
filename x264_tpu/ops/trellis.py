"""CABAC trellis quantization — batched 8-state Viterbi over
coefficients (quant_trellis_cabac semantics, encoder/rdo.c:411-628),
re-staged for TPU: every residual block of the frame runs the trellis
simultaneously; the 16-position scan is an unrolled loop of vector ops
over (8 nodes, N blocks).

Cost model (mirroring the reference's formulation):
  score = sum_i d_i^2 * w2_i  +  (f8_bits * lambda2) >> 4
where d = |dct_coef| - unquant(level) in the *forward*-transform domain
(unquant4_mf is quant's direct inverse, common/set.c:147), w2 are the
inverse-squared DCT scale factors (x264_dct4_weight2_tab semantics,
derived from the 4x4 core-transform row norms 4/10), and f8_bits are
CABAC bit estimates in 1/256 units from the state-machine entropy.

Deviations from the reference (documented, quality-only):
  - level contexts (coeff_abs_level1/gt1) are estimated from the
    slice-initial CABAC states instead of per-node evolving state
    copies — the batched trellis cannot thread live per-MB states;
  - candidate levels are {q, q-1} with no deadzone, as the reference.

The per-position significance/last contexts ARE exact for 4x4 blocks
(each position has its own context, so no state evolution matters —
the same observation the reference exploits).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .. import tables
from ..entropy import cabac_tables as CT

I32 = jnp.int32
F32 = jnp.float32

CABAC_SIZE_BITS = 8
LAMBDA_BITS = 4

# level node-context machine (same tables as the entropy writers)
L1_CTX = np.array([1, 2, 3, 4, 0, 0, 0, 0], np.int32)
GT1_CTX = np.array([5, 5, 5, 5, 6, 7, 8, 9], np.int32)
NODE_TRANS = np.array([[1, 2, 3, 3, 4, 5, 6, 7],
                       [4, 4, 4, 4, 5, 6, 7, 7]], np.int32)
SIG_BASE = np.array([105, 120, 134, 149, 152], np.int32)
LAST_BASE = np.array([166, 181, 195, 210, 213], np.int32)
LVL_BASE = np.array([227, 237, 247, 257, 266], np.int32)

# inverse-squared 4x4 DCT scale factors in raster order
# (row norms^2 of the core transform are 4 and 10; FIX8 of
# 800/(n_u*n_v) reproduces 3.125 / 1.25 / 0.5)
_N2 = np.array([4, 10, 4, 10], np.float64)
DCT4_WEIGHT2 = np.round(
    256.0 * 800.0 / (_N2[:, None] * _N2[None, :]) / 16.0
).astype(np.int32).reshape(16)


@functools.lru_cache()
def entropy_f8():
    """(128, 2) CABAC bit cost (1/256 units) of coding bin b from
    combined state s = mps<<6 | pstate, from the state machine's
    probability model p_LPS(sigma) = 0.5 * alpha^sigma,
    alpha = (0.01875/0.5)^(1/63) (spec 9.3.3.2.1.1 design)."""
    alpha = (0.01875 / 0.5) ** (1.0 / 63.0)
    sigma = np.arange(64)
    plps = 0.5 * alpha ** sigma
    ent_lps = -np.log2(plps) * 256.0
    ent_mps = -np.log2(1.0 - plps) * 256.0
    out = np.zeros((128, 2), np.int32)
    for s in range(128):
        # combined representation (mirrored low half, as the RANGE_LPS
        # layout): s < 64 -> MPS 0, pStateIdx 63-s; else MPS 1, s-64
        mps = s >> 6
        st = (s - 64) if mps else (63 - s)
        out[s, mps] = int(round(ent_mps[st]))
        out[s, 1 - mps] = int(round(ent_lps[st]))
    return out


@functools.lru_cache()
def size_unary():
    """(15, 128) f8 bit cost of a unary level prefix (prefix-1 ones +
    terminator if prefix<14) + sign, starting from gt1 state s —
    including the state evolution along the run (x264_rdo_init
    semantics, encoder/rdo.c:326-344, re-derived from the FSM)."""
    ent = entropy_f8()
    trans = CT.TRANSITION
    size = np.zeros((15, 128), np.int32)
    for prefix in range(15):
        for s0 in range(128):
            s, f8 = s0, 0
            for _ in range(1, prefix):
                f8 += ent[s, 1]
                s = trans[s][1]
            if 0 < prefix < 14:
                f8 += ent[s, 0]
            f8 += 1 << CABAC_SIZE_BITS          # sign bypass
            size[prefix, s0] = f8
    return size


def lambda2(qp: int, intra: bool) -> int:
    """encoder/rdo.c:363-380 formulas: .85^2 (inter) / .65^2 (intra)
    * 2^(qp/3 + 10 - LAMBDA_BITS)."""
    f = 0.65 ** 2 if intra else 0.85 ** 2
    return max(1, int(round(f * 2.0 ** (qp / 3.0 + 10 - LAMBDA_BITS))))


def _ue_big_f8(v):
    """bs_size_ue_big(v) << 8: exp-Golomb bit length of large suffixes."""
    n = v + 1
    bl = jnp.zeros_like(n)
    for shift in (16, 8, 4, 2, 1):
        ge = n >= (1 << shift)
        bl = bl + jnp.where(ge, shift, 0)
        n = jnp.where(ge, n >> shift, n)
    return (2 * bl + 1) << CABAC_SIZE_BITS


def make_consts(qp: int, cat: int, cqm_list: int, slice_is_i: bool,
                cabac_init_idc: int = 0, intra: bool = False,
                qt: tables.QuantTables | None = None):
    """Host-side static inputs for trellis_4x4 at one (qp, category):
    quant/unquant/weights in scan order + bit-cost tables from the
    slice-initial CABAC states."""
    qt = qt or tables.DEFAULT_QUANT
    states = CT.init_states(slice_is_i, qp, cabac_init_idc)
    ent = entropy_f8()
    C = 15 if cat in (1, 4) else 16
    zz = tables.ZIGZAG4
    if cat == 1:          # AC block: scan positions 1..15
        order = zz[1:]
    else:
        order = zz
    qmf = qt.quant4_mf[cqm_list, qp][order].astype(np.int64)
    uqmf = qt.unquant4_mf[cqm_list, qp][order].astype(np.int64)
    w2 = DCT4_WEIGHT2[order].astype(np.int64)

    sig_bits = np.zeros((C, 2), np.int32)
    last_bits = np.zeros((C, 2), np.int32)
    for i in range(C - 1):
        sig_bits[i] = ent[states[SIG_BASE[cat] + i]]
        last_bits[i] = ent[states[LAST_BASE[cat] + i]]

    base = LVL_BASE[cat]
    l1_bits = np.zeros((8, 2), np.int32)     # [node][prefix>0]
    un_node = np.zeros((8, 15), np.int32)    # [node][prefix] unary+sign
    for j in range(8):
        l1_bits[j] = ent[states[base + L1_CTX[j]]]
        un_node[j] = size_unary()[:, states[base + GT1_CTX[j]]]
    lam2 = lambda2(qp, intra)
    lam2f = lam2 / (1 << (CABAC_SIZE_BITS - LAMBDA_BITS))
    return dict(qmf=jnp.asarray(qmf), uqmf=jnp.asarray(uqmf),
                w2=jnp.asarray(w2, np.float32),
                sig=jnp.asarray(sig_bits, np.float32),
                last=jnp.asarray(last_bits, np.float32),
                l1=jnp.asarray(l1_bits, np.float32),
                unary=jnp.asarray(un_node, np.float32),
                lam2=jnp.float32(lam2f))


def trellis_4x4(coefs_scan, tc, C: int = 16):
    """Run the batched trellis. coefs_scan: (N, C) int32 raw forward-DCT
    coefficients in scan order; tc: the make_consts dict (arrays may be
    traced — every per-position constant is indexed statically). Returns
    (N, C) int32 optimal signed levels in scan order."""
    N = coefs_scan.shape[0]
    assert coefs_scan.shape[1] == C
    sign = jnp.where(coefs_scan < 0, -1, 1).astype(I32)
    ac = jnp.abs(coefs_scan)
    f = 1 << 15
    q = ((ac.astype(jnp.int64) * tc["qmf"][None, :] + f) >> 16) \
        .astype(I32)                                  # no deadzone

    BIG = jnp.float32(1e30)
    score = jnp.full((8, N), BIG, F32).at[0].set(0.0)
    # level history: per position, per node: chosen level + parent node
    hist_lvl = []
    hist_par = []

    l1 = tc["l1"]          # (8,2)
    unary = tc["unary"]    # (8,15)
    tr = jnp.asarray(NODE_TRANS)

    lam2f = tc["lam2"]
    zerof = jnp.float32(0.0)

    for i in range(C - 1, -1, -1):
        qi = q[:, i]                                   # (N,)
        ci = ac[:, i]
        sig0 = tc["sig"][i, 0] if i < C - 1 else zerof
        sig1 = tc["sig"][i, 1] if i < C - 1 else zerof
        last0 = tc["last"][i, 0] if i < C - 1 else zerof
        last1 = tc["last"][i, 1] if i < C - 1 else zerof

        # per destination node: list of (score, lvl, par) contributions;
        # the j -> dest map is STATIC within each of the 3 transition
        # classes (zero: j->j, lvl==1: TRANS[0], lvl>1: TRANS[1]), so the
        # scatter-min is a static permutation + min-tree
        contribs = [[] for _ in range(8)]

        for cand in range(2):                          # q, q-1
            lvl = jnp.maximum(qi - cand, 0)            # (N,)
            unq = ((tc["uqmf"][i] * lvl.astype(jnp.int64) + 128) >> 8) \
                .astype(I32)
            d = (ci - unq).astype(F32)
            ssd = d * d * tc["w2"][i]
            is1 = lvl == 1
            isg = lvl > 1
            isz = lvl == 0
            prefix = jnp.minimum(lvl - 1, 14)
            ue_f8 = jnp.where(lvl >= 15,
                              _ue_big_f8(jnp.maximum(lvl - 15, 0)),
                              0).astype(F32)
            del d
            if cand == 1:
                # candidate q-1 duplicates q when q==0; drop the dupe
                isz = isz & (qi > 0)
            for j in range(8):
                last_j = last1 if j == 0 else last0
                b1 = sig1 + last_j + l1[j, 1] \
                    + unary[j][jnp.clip(prefix, 0, 14)] \
                    + ue_f8                              # lvl > 1
                bA = sig1 + last_j + l1[j, 0] \
                    + jnp.float32(1 << CABAC_SIZE_BITS)  # lvl == 1
                bZ = sig0 if j > 0 else zerof            # lvl == 0
                base = score[j] + ssd
                contribs[j].append(
                    (jnp.where(isz, base + bZ * lam2f, BIG), lvl, j))
                contribs[int(NODE_TRANS[0][j])].append(
                    (jnp.where(is1, base + bA * lam2f, BIG), lvl, j))
                contribs[int(NODE_TRANS[1][j])].append(
                    (jnp.where(isg, base + b1 * lam2f, BIG), lvl, j))

        new_score = jnp.full((8, N), BIG, F32)
        new_lvl = jnp.zeros((8, N), I32)
        new_par = jnp.zeros((8, N), I32)
        for dest in range(8):
            s_d = jnp.full((N,), BIG, F32)
            l_d = jnp.zeros((N,), I32)
            p_d = jnp.zeros((N,), I32)
            for (s_c, l_c, p_c) in contribs[dest]:
                upd = s_c < s_d
                s_d = jnp.where(upd, s_c, s_d)
                l_d = jnp.where(upd, l_c, l_d)
                p_d = jnp.where(upd, p_c, p_d)
            new_score = new_score.at[dest].set(s_d)
            new_lvl = new_lvl.at[dest].set(l_d)
            new_par = new_par.at[dest].set(p_d)
        score = new_score
        hist_lvl.append(new_lvl)
        hist_par.append(new_par)

    # backtrack from the best final node; history index k corresponds
    # to position i = C-1-k, so walk it in reverse
    best = jnp.argmin(score, axis=0)                   # (N,)
    levels = []
    node = best
    for k in range(C - 1, -1, -1):                     # position 0 first
        lv = jnp.take_along_axis(hist_lvl[k], node[None], axis=0)[0]
        node = jnp.take_along_axis(hist_par[k], node[None], axis=0)[0]
        levels.append(lv)
    out = jnp.stack(levels, axis=1)                    # (N, C) pos 0..C-1
    return out * sign
