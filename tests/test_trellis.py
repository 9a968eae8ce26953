"""Trellis quantization: batched Viterbi vs a scalar DP golden model,
plus the end-to-end property (quant_trellis_cabac contract,
encoder/rdo.c:411): at equal QP the trellis stream is smaller than the
deadzone stream at comparable PSNR, and it still decodes bit-exactly."""

import numpy as np
import pytest

from x264_tpu import tables
from x264_tpu.ops import trellis as TR


def scalar_trellis(coefs_scan, tc_np, C=16):
    """Scalar DP with the same cost model (independent control flow:
    forward position loop over dense (node -> best) maps)."""
    qmf, uqmf, w2 = tc_np["qmf"], tc_np["uqmf"], tc_np["w2"]
    sig, last = tc_np["sig"], tc_np["last"]
    l1, unary, lam2f = tc_np["l1"], tc_np["unary"], tc_np["lam2"]
    sign = np.where(coefs_scan < 0, -1, 1)
    ac = np.abs(coefs_scan)
    BIG = 1e30
    # states: score per node + path (list of (pos, level))
    nodes = {0: (0.0, [])}
    for i in range(C - 1, -1, -1):
        q = int((int(ac[i]) * int(qmf[i]) + (1 << 15)) >> 16)
        cands = sorted({q, max(q - 1, 0)})
        new = {}
        for j, (sc, path) in nodes.items():
            for lvl in cands:
                unq = (int(uqmf[i]) * lvl + 128) >> 8
                d = float(int(ac[i]) - unq)
                ssd = d * d * float(w2[i])
                s0 = float(sig[i, 0]) if i < C - 1 else 0.0
                s1 = float(sig[i, 1]) if i < C - 1 else 0.0
                la = (float(last[i, 1]) if j == 0 else float(last[i, 0])) \
                    if i < C - 1 else 0.0
                if lvl == 0:
                    bits = s0 if j > 0 else 0.0
                    nxt = j
                else:
                    prefix = min(lvl - 1, 14)
                    if prefix > 0:
                        lb = float(l1[j, 1]) + float(unary[j, prefix])
                        if lvl >= 15:
                            v = lvl - 15
                            lb += (2 * int(np.floor(np.log2(v + 1))) + 1) \
                                * 256
                        nxt = TR.NODE_TRANS[1][j]
                    else:
                        lb = float(l1[j, 0]) + 256.0
                        nxt = TR.NODE_TRANS[0][j]
                    bits = s1 + la + lb
                cost = sc + ssd + bits * float(lam2f)
                if nxt not in new or cost < new[nxt][0]:
                    new[nxt] = (cost, path + [(i, lvl)])
        nodes = new
    best = min(nodes.values(), key=lambda t: t[0])
    out = np.zeros(C, np.int64)
    for pos, lvl in best[1]:
        out[pos] = lvl
    return out * sign


def _tc_numpy(tc):
    return {k: np.asarray(v) for k, v in tc.items()}


@pytest.mark.parametrize("qp", [20, 26, 34])
def test_trellis_matches_scalar_dp(qp):
    tc = TR.make_consts(qp, 2, tables.CQM_4PY, slice_is_i=False)
    tc_np = _tc_numpy(tc)
    rng = np.random.default_rng(qp)
    # mix of magnitudes: flat, textured, and one large-coef block
    coefs = np.concatenate([
        rng.integers(-40, 41, (40, 16)),
        rng.integers(-400, 401, (20, 16)),
        rng.integers(-6, 7, (40, 16)),
        np.zeros((4, 16), int),
    ]).astype(np.int32)
    got = np.asarray(TR.trellis_4x4(coefs, tc))
    for n in range(coefs.shape[0]):
        want = scalar_trellis(coefs[n], tc_np)
        np.testing.assert_array_equal(got[n], want, err_msg=f"block {n}")


def test_trellis_beats_deadzone_bits():
    """End-to-end: CIF IPPP with --trellis 1 must produce a smaller
    stream than deadzone quant at equal QP with PSNR within 0.15 dB,
    and still decode bit-exactly (the refdec closure)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from refdec.decoder import decode_annexb
    from x264_tpu import Encoder, EncoderParams
    from x264_tpu.encoder.core import Frame

    rng = np.random.default_rng(3)
    w, h = 176, 144
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(4):
        y = ((xx // 2 + yy // 3 + 3 * t) % 190
             + rng.integers(0, 50, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + (xx[::2, ::2] % 30)).clip(0, 255).astype(np.uint8)
        v = (120 + (yy[::2, ::2] % 30)).clip(0, 255).astype(np.uint8)
        frames.append(Frame(y, u, v))

    def run(trellis, qp):
        from x264_tpu.params import ANALYSE_I4x4
        p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                          i_log_level=0, i_keyint_max=50)
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = qp
        p.analyse.i_trellis = trellis
        # pin intra to I16+I4: this test isolates trellis-vs-deadzone
        # INTER quantization; the I8x8 ladder (deadzone either way)
        # only adds RD-plane noise to the comparison
        p.analyse.intra = ANALYSE_I4x4
        enc = Encoder(p)
        stream = enc.headers()
        bits = 0
        psnr = []
        recons = []
        for f in frames:
            ef = enc.encode(f)
            if ef:
                stream += ef.payload
                bits += ef.bits
                recons.append(ef.recon)
        for ef in enc.flush():
            stream += ef.payload
            bits += ef.bits
            recons.append(ef.recon)
        for f, r in zip(frames, recons):
            e = (f.y.astype(np.int64) - r.y.astype(np.int64))
            psnr.append(10 * np.log10(255**2 * e.size / max((e*e).sum(), 1)))
        return stream, bits, float(np.mean(psnr)), recons

    # trellis trades distortion for rate along its lambda (it may land
    # on either side of the same-QP deadzone point), so judge on the RD
    # plane: the trellis point must sit on or above the deadzone RD
    # curve (piecewise-linear through qp 29/30/31) at its own bitrate
    pts = sorted(run(0, qp)[1:3] for qp in (29, 30, 31))   # (bits, psnr)
    s1, b1, p1, recons = run(1, 30)
    (bl, pl), (bm, pm), (bh, ph) = pts
    assert bl <= b1 <= bh, (b1, bl, bh)
    if b1 <= bm:
        t = (b1 - bl) / max(bm - bl, 1)
        interp = pl + t * (pm - pl)
    else:
        t = (b1 - bm) / max(bh - bm, 1)
        interp = pm + t * (ph - pm)
    assert p1 >= interp - 0.03, (p1, interp, b1, pts)
    decoded = decode_annexb(s1)
    assert len(decoded) == len(recons)
    for d, r in zip(decoded, recons):
        np.testing.assert_array_equal(np.asarray(d.y, np.int64),
                                      np.asarray(r.y, np.int64))
