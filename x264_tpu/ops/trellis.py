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
# per-category context bases + coefficient counts (spec 9.3.3.1.1.9;
# cat 5 = luma 8x8 with the Table 9-43 shared significance contexts)
CAT_C = np.array([16, 15, 16, 4, 15, 64], np.int32)
SIG_BASE = np.array([105, 120, 134, 149, 152, 402], np.int32)
LAST_BASE = np.array([166, 181, 195, 210, 213, 417], np.int32)
LVL_BASE = np.array([227, 237, 247, 257, 266, 426], np.int32)
SIG_MAP8 = np.array([
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12],
    np.int32)
LAST_MAP8 = np.minimum(np.arange(63) >> 2, 8).astype(np.int32)

# inverse-squared 4x4 DCT scale factors in raster order
# (row norms^2 of the core transform are 4 and 10; FIX8 of
# 800/(n_u*n_v) reproduces 3.125 / 1.25 / 0.5)
_N2 = np.array([4, 10, 4, 10], np.float64)
DCT4_WEIGHT2 = np.round(
    256.0 * 800.0 / (_N2[:, None] * _N2[None, :]) / 16.0
).astype(np.int32).reshape(16)

# inverse-squared 8x8 DCT scale factors, raster order
# (x264_dct8_weight2_tab semantics, common/dct.h:67-84, re-derived
# numerically from THIS repo's dct8x8 basis row norms: per-axis class
# values {1.0, 0.78466, 2.56, 0.88581, 1.6, 1.4173} in the period-4
# even/odd pattern of the 8-point transform)
_W8_AXIS = np.array([1.0, 0.941175, 1.6 ** 0.5, 0.941175] * 2)
DCT8_WEIGHT2 = np.round(
    256.0 * (_W8_AXIS[:, None] * _W8_AXIS[None, :]) ** 2
).astype(np.int32).reshape(64)


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


def _consts_np(qp: int, cat: int, cqm_list: int, slice_is_i: bool,
               cabac_init_idc: int, intra: bool,
               qt: tables.QuantTables, state_qp: int | None = None):
    """NumPy consts for one (qp, category) — see make_consts.
    state_qp: QP used for the CABAC context initialization (the SLICE
    QP — chroma categories quantize at the chroma QP but the live
    contexts the reference reads were initialized at the slice QP)."""
    states = CT.init_states(slice_is_i,
                            qp if state_qp is None else state_qp,
                            cabac_init_idc)
    ent = entropy_f8()
    C = int(CAT_C[cat])
    dc = cat in (0, 3)
    if cat == 5:
        order = tables.ZIGZAG8
        qmf = qt.quant8_mf[cqm_list, qp][order].astype(np.int64)
        uqmf = qt.unquant8_mf[cqm_list, qp][order].astype(np.int64)
        w2 = DCT8_WEIGHT2[order].astype(np.int64)
    else:
        zz = tables.ZIGZAG4
        order = (zz[1:] if cat in (1, 4)       # AC: scan 1..15
                 else (np.arange(4) if cat == 3 else zz))
        if dc:
            # DC trellis quant/unquant (quant_trellis_cabac dc path,
            # encoder/rdo.c:498,551): mf[0]>>1, unquant[0]<<1, flat
            # SSD weight 256
            qmf = np.full(C, qt.quant4_mf[cqm_list, qp][0] >> 1,
                          np.int64)
            uqmf = np.full(C, qt.unquant4_mf[cqm_list, qp][0] << 1,
                           np.int64)
            w2 = np.full(C, 256, np.int64)
        else:
            qmf = qt.quant4_mf[cqm_list, qp][order].astype(np.int64)
            uqmf = qt.unquant4_mf[cqm_list, qp][order].astype(np.int64)
            w2 = DCT4_WEIGHT2[order].astype(np.int64)

    sig_bits = np.zeros((C, 2), np.int32)
    last_bits = np.zeros((C, 2), np.int32)
    for i in range(C - 1):
        if cat == 5:
            si, li = SIG_MAP8[i], LAST_MAP8[i]
        elif cat == 3:
            si = li = min(i, 2)   # chroma DC ctxIdxInc = Min(i, 2)
        else:
            si = li = i
        sig_bits[i] = ent[states[SIG_BASE[cat] + si]]
        last_bits[i] = ent[states[LAST_BASE[cat] + li]]

    base = LVL_BASE[cat]
    l1_bits = np.zeros((8, 2), np.int32)     # [node][prefix>0]
    un_node = np.zeros((8, 15), np.int32)    # [node][prefix] unary+sign
    for j in range(8):
        l1_bits[j] = ent[states[base + L1_CTX[j]]]
        un_node[j] = size_unary()[:, states[base + GT1_CTX[j]]]
    lam2 = lambda2(qp, intra)
    lam2f = lam2 / (1 << (CABAC_SIZE_BITS - LAMBDA_BITS))
    return dict(qmf=qmf, uqmf=uqmf, w2=np.asarray(w2, np.float32),
                sig=np.asarray(sig_bits, np.float32),
                last=np.asarray(last_bits, np.float32),
                l1=np.asarray(l1_bits, np.float32),
                unary=np.asarray(un_node, np.float32),
                lam2=np.float32(lam2f))


def make_consts(qp: int, cat: int, cqm_list: int, slice_is_i: bool,
                cabac_init_idc: int = 0, intra: bool = False,
                qt: tables.QuantTables | None = None,
                state_qp: int | None = None):
    """Host-side static inputs for trellis_scan at one (qp, category):
    quant/unquant/weights in scan order + bit-cost tables from the
    slice-initial CABAC states. Categories (spec ctxBlockCat): 0 luma
    DC, 1 luma AC, 2 luma 4x4, 3 chroma DC (2x2), 4 chroma AC,
    5 luma 8x8."""
    qt = qt or tables.DEFAULT_QUANT
    c = _consts_np(qp, cat, cqm_list, slice_is_i, cabac_init_idc,
                   intra, qt, state_qp)
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                else jnp.float32(v)) for k, v in c.items()}


def make_consts_all_qp(cat: int, cqm_list: int, slice_is_i: bool,
                       cabac_init_idc: int = 0, intra: bool = False,
                       qt: tables.QuantTables | None = None):
    """All 52 QPs stacked on a leading axis — the per-MB-QP (variance
    AQ) form; trellis_scan row-gathers with qp_idx."""
    qt = qt or tables.DEFAULT_QUANT
    rows = [_consts_np(q, cat, cqm_list, slice_is_i, cabac_init_idc,
                       intra, qt) for q in range(52)]
    return {k: jnp.asarray(np.stack([r[k] for r in rows]))
            for k in rows[0]}


def trellis_scan(coefs_scan, tc, C: int = None, qp_idx=None):
    """Run the batched trellis. coefs_scan: (N, C) int32 raw forward-DCT
    coefficients in scan order; tc: the make_consts dict (arrays may be
    traced — every per-position constant is indexed statically).
    qp_idx: optional (N,) int32 per-block QP rows into a
    make_consts_all_qp dict (the variance-AQ form). Returns (N, C)
    int32 optimal signed levels in scan order."""
    N = coefs_scan.shape[0]
    if qp_idx is not None:
        tc = {k: v[qp_idx] for k, v in tc.items()}    # (N, ...) rows
    shared = tc["qmf"].ndim == 1
    C = coefs_scan.shape[1] if C is None else C
    assert coefs_scan.shape[1] == C

    def at(name, i, b=None):
        t = tc[name]
        if b is None:
            return t[i] if shared else t[:, i]
        return t[i, b] if shared else t[:, i, b]

    def at_l1(j, b):
        return tc["l1"][j, b] if shared else tc["l1"][:, j, b]

    def at_unary(j, prefix):
        if shared:
            return tc["unary"][j][jnp.clip(prefix, 0, 14)]
        return jnp.take_along_axis(
            tc["unary"][:, j], jnp.clip(prefix, 0, 14)[:, None],
            axis=1)[:, 0]

    sign = jnp.where(coefs_scan < 0, -1, 1).astype(I32)
    ac = jnp.abs(coefs_scan)
    f = 1 << 15
    qmf = tc["qmf"] if not shared else tc["qmf"][None, :]
    q = ((ac.astype(jnp.int64) * qmf + f) >> 16) \
        .astype(I32)                                  # no deadzone

    BIG = jnp.float32(1e30)
    score = jnp.full((8, N), BIG, F32).at[0].set(0.0)
    # level history: per position, per node: chosen level + parent node
    hist_lvl = []
    hist_par = []

    lam2f = tc["lam2"]     # scalar, or (N,) in the per-MB-QP form
    zerof = jnp.float32(0.0)

    for i in range(C - 1, -1, -1):
        qi = q[:, i]                                   # (N,)
        ci = ac[:, i]
        sig0 = at("sig", i, 0) if i < C - 1 else zerof
        sig1 = at("sig", i, 1) if i < C - 1 else zerof
        last0 = at("last", i, 0) if i < C - 1 else zerof
        last1 = at("last", i, 1) if i < C - 1 else zerof

        # per destination node: list of (score, lvl, par) contributions;
        # the j -> dest map is STATIC within each of the 3 transition
        # classes (zero: j->j, lvl==1: TRANS[0], lvl>1: TRANS[1]), so the
        # scatter-min is a static permutation + min-tree
        contribs = [[] for _ in range(8)]

        for cand in range(2):                          # q, q-1
            lvl = jnp.maximum(qi - cand, 0)            # (N,)
            unq = ((at("uqmf", i) * lvl.astype(jnp.int64) + 128) >> 8) \
                .astype(I32)
            d = (ci - unq).astype(F32)
            ssd = d * d * at("w2", i)
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
                b1 = sig1 + last_j + at_l1(j, 1) \
                    + at_unary(j, prefix) \
                    + ue_f8                              # lvl > 1
                bA = sig1 + last_j + at_l1(j, 0) \
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


# back-compat name (cat-2 4x4 was the first user)
trellis_4x4 = trellis_scan
