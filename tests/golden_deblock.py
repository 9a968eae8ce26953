"""Golden scalar model of the H.264 in-loop deblocking filter.

From-scratch implementation of spec section 8.7 semantics, matching the
behavioral contract of the reference's deblock pass
(x264_frame_deblock_row, common/frame.c:621; filters at
common/frame.c:420-583): per-macroblock raster order, vertical edges
before horizontal edges, bS derivation from intra/nnz/mv/ref deltas.

This is the oracle for x264_tpu.ops.deblock and is also reused by the
reference decoder (tests/refdec) so the encoder-vs-decoder round trip
covers the loop filter.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from x264_tpu import tables as T  # noqa: E402


def _clip3(x, lo, hi):
    return max(lo, min(hi, x))


def _filter_luma_normal(line, alpha, beta, tc0):
    """One 8-pixel line across an edge: [p3 p2 p1 p0 q0 q1 q2 q3].
    Normal filter (bS 1..3). Returns the line (possibly modified)."""
    p2, p1, p0 = int(line[1]), int(line[2]), int(line[3])
    q0, q1, q2 = int(line[4]), int(line[5]), int(line[6])
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return line
    tc = tc0
    if abs(p2 - p0) < beta:
        line[2] = p1 + _clip3(((p2 + ((p0 + q0 + 1) >> 1)) >> 1) - p1,
                              -tc0, tc0)
        tc += 1
    if abs(q2 - q0) < beta:
        line[5] = q1 + _clip3(((q2 + ((p0 + q0 + 1) >> 1)) >> 1) - q1,
                              -tc0, tc0)
        tc += 1
    delta = _clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    line[3] = _clip3(p0 + delta, 0, 255)
    line[4] = _clip3(q0 - delta, 0, 255)
    return line


def _filter_luma_strong(line, alpha, beta):
    """Strong (intra, bS=4) luma filter on one 8-pixel line."""
    p3, p2, p1, p0 = (int(line[0]), int(line[1]), int(line[2]), int(line[3]))
    q0, q1, q2, q3 = (int(line[4]), int(line[5]), int(line[6]), int(line[7]))
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return line
    if abs(p0 - q0) < (alpha >> 2) + 2:
        if abs(p2 - p0) < beta:
            line[3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
            line[2] = (p2 + p1 + p0 + q0 + 2) >> 2
            line[1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        else:
            line[3] = (2 * p1 + p0 + q1 + 2) >> 2
        if abs(q2 - q0) < beta:
            line[4] = (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3
            line[5] = (p0 + q0 + q1 + q2 + 2) >> 2
            line[6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        else:
            line[4] = (2 * q1 + q0 + p1 + 2) >> 2
    else:
        line[3] = (2 * p1 + p0 + q1 + 2) >> 2
        line[4] = (2 * q1 + q0 + p1 + 2) >> 2
    return line


def _filter_chroma_normal(line, alpha, beta, tc):
    """[p1 p0 q0 q1], chroma normal filter (tc = tc0+1 per spec)."""
    p1, p0, q0, q1 = int(line[0]), int(line[1]), int(line[2]), int(line[3])
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return line
    delta = _clip3((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    line[1] = _clip3(p0 + delta, 0, 255)
    line[2] = _clip3(q0 - delta, 0, 255)
    return line


def _filter_chroma_strong(line, alpha, beta):
    p1, p0, q0, q1 = int(line[0]), int(line[1]), int(line[2]), int(line[3])
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return line
    line[1] = (2 * p1 + p0 + q1 + 2) >> 2
    line[2] = (2 * q1 + q0 + p1 + 2) >> 2
    return line


def _tab_idx(x):
    return int(np.clip(x, 0, 51))


def _edge_bs(intra_p, intra_q, mb_edge, nnz_p, nnz_q,
             ref_p, ref_q, mv_p, mv_q,
             ref_p1=None, ref_q1=None, mv_p1=None, mv_q1=None):
    """Boundary strength for one 4-sample segment."""
    if intra_p or intra_q:
        return 4 if mb_edge else 3
    if nnz_p or nnz_q:
        return 2
    if (ref_p != ref_q or abs(mv_p[0] - mv_q[0]) >= 4
            or abs(mv_p[1] - mv_q[1]) >= 4):
        return 1
    if ref_p1 is not None:
        if (ref_p1 != ref_q1 or abs(mv_p1[0] - mv_q1[0]) >= 4
                or abs(mv_p1[1] - mv_q1[1]) >= 4):
            return 1
    return 0


def deblock_frame(Y, U, V, qp_mb, intra_mb, nnz4=None, ref4=None, mv4=None,
                  ref4_l1=None, mv4_l1=None,
                  alpha_off=0, beta_off=0, chroma_qp_offset=0,
                  t8_mb=None):
    """Deblock one frame in place (arrays are modified and also returned).

    Y: (mb_h*16, mb_w*16); U, V: (mb_h*8, mb_w*8) integer arrays.
    qp_mb, intra_mb: (mb_h, mb_w).
    nnz4: (mb_h*4, mb_w*4) per-4x4 nonzero-coefficient flags.
    ref4 / mv4: (mb_h*4, mb_w*4) and (mb_h*4, mb_w*4, 2) list-0 refs/MVs.
    alpha_off / beta_off: full offsets (2 * the _div2 slice-header fields).
    """
    mb_h, mb_w = np.asarray(qp_mb).shape
    if nnz4 is None:
        nnz4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    if ref4 is None:
        ref4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    if mv4 is None:
        mv4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)
    Y = np.asarray(Y)
    U = np.asarray(U)
    V = np.asarray(V)

    def bs_of(y4q, x4q, y4p, x4p, mb_edge):
        args = [bool(intra_mb[y4p // 4, x4p // 4]),
                bool(intra_mb[y4q // 4, x4q // 4]), mb_edge,
                int(nnz4[y4p, x4p]), int(nnz4[y4q, x4q]),
                int(ref4[y4p, x4p]), int(ref4[y4q, x4q]),
                mv4[y4p, x4p], mv4[y4q, x4q]]
        if ref4_l1 is not None:
            args += [int(ref4_l1[y4p, x4p]), int(ref4_l1[y4q, x4q]),
                     mv4_l1[y4p, x4p], mv4_l1[y4q, x4q]]
        return _edge_bs(*args)

    def luma_edge(my, mx, e, vertical, qp_avg, bs):
        ia = _tab_idx(qp_avg + alpha_off)
        alpha = int(T.ALPHA_TABLE[ia])
        beta = int(T.BETA_TABLE[_tab_idx(qp_avg + beta_off)])
        if alpha == 0 or beta == 0:
            return
        y0, x0 = my * 16, mx * 16
        for d in range(16):
            s = bs[d // 4]
            if s == 0:
                continue
            if vertical:
                sl = Y[y0 + d, x0 + 4 * e - 4: x0 + 4 * e + 4]
            else:
                sl = Y[y0 + 4 * e - 4: y0 + 4 * e + 4, x0 + d]
            if s == 4:
                _filter_luma_strong(sl, alpha, beta)
            else:
                _filter_luma_normal(sl, alpha, beta,
                                    int(T.TC0_TABLE[ia, s]))

    def chroma_edge(my, mx, e, vertical, qpc_avg, bs):
        ia = _tab_idx(qpc_avg + alpha_off)
        alpha = int(T.ALPHA_TABLE[ia])
        beta = int(T.BETA_TABLE[_tab_idx(qpc_avg + beta_off)])
        if alpha == 0 or beta == 0:
            return
        y0, x0 = my * 8, mx * 8
        for P in (U, V):
            for d in range(8):
                s = bs[d // 2]
                if s == 0:
                    continue
                if vertical:
                    sl = P[y0 + d, x0 + 4 * e - 2: x0 + 4 * e + 2]
                else:
                    sl = P[y0 + 4 * e - 2: y0 + 4 * e + 2, x0 + d]
                if s == 4:
                    _filter_chroma_strong(sl, alpha, beta)
                else:
                    _filter_chroma_normal(sl, alpha, beta,
                                          int(T.TC0_TABLE[ia, s]) + 1)

    def cqp(q):
        return int(T.CHROMA_QP_TABLE[_tab_idx(q + chroma_qp_offset)])

    for my in range(mb_h):
        for mx in range(mb_w):
            qp = int(qp_mb[my, mx])
            for vertical in (True, False):
                for e in range(4):
                    if e == 0 and (mx == 0 if vertical else my == 0):
                        continue
                    # luma edges interior to 8x8 transform blocks are
                    # not filtered (spec 8.7 transform_size_8x8_flag);
                    # chroma is untouched (edges 1/3 are luma-only)
                    if (e in (1, 3) and t8_mb is not None
                            and bool(t8_mb[my, mx])):
                        continue
                    if vertical:
                        qpn = int(qp_mb[my, mx - 1]) if e == 0 else qp
                        bs = [bs_of(4 * my + i, 4 * mx + e,
                                    4 * my + i, 4 * mx + e - 1, e == 0)
                              for i in range(4)]
                    else:
                        qpn = int(qp_mb[my - 1, mx]) if e == 0 else qp
                        bs = [bs_of(4 * my + e, 4 * mx + i,
                                    4 * my + e - 1, 4 * mx + i, e == 0)
                              for i in range(4)]
                    luma_edge(my, mx, e, vertical, (qp + qpn + 1) >> 1, bs)
                    if e in (0, 2):
                        chroma_edge(my, mx, e // 2, vertical,
                                    (cqp(qp) + cqp(qpn) + 1) >> 1, bs)
    return Y, U, V
