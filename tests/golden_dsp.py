"""Golden NumPy model of the H.264 DSP primitives.

Independent, loop-level transcription of the spec semantics (checked
against the reference C's behavior, common/dct.c, common/quant.c,
common/predict.c, common/pixel.c). The checkasm-style tests compare the
batched JAX ops against these scalar loops on random blocks — the same
oracle pattern as tools/checkasm.c:222-1441.

Everything here is deliberately written differently from the JAX ops
(scalar loops vs. matmul/butterfly formulations) so a transcription error
in one implementation cannot hide in the other.
"""

import numpy as np


def clip8(x):
    return max(0, min(255, int(x)))


# ---------------------------------------------------------------- transforms

def dct4x4(d):
    """Y = C d C^T by explicit summation."""
    C = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]])
    return C @ np.asarray(d, dtype=np.int64) @ C.T


def idct4x4(c):
    """Spec 8.5.12.2: rows then columns, (x+32)>>6."""
    c = np.asarray(c, dtype=np.int64)
    e = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        e0 = c[i][0] + c[i][2]
        e1 = c[i][0] - c[i][2]
        e2 = (c[i][1] >> 1) - c[i][3]
        e3 = c[i][1] + (c[i][3] >> 1)
        e[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    r = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        g0 = e[0][j] + e[2][j]
        g1 = e[0][j] - e[2][j]
        g2 = (e[1][j] >> 1) - e[3][j]
        g3 = e[1][j] + (e[3][j] >> 1)
        r[:, j] = [g0 + g3, g1 + g2, g1 - g2, g0 - g3]
    return (r + 32) >> 6


def hadamard4x4_fwd(d):
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]])
    return ((H @ np.asarray(d, dtype=np.int64) @ H) + 1) >> 1


def hadamard4x4_inv(d):
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]])
    return H @ np.asarray(d, dtype=np.int64) @ H


def hadamard2x2(d):
    H = np.array([[1, 1], [1, -1]])
    return H @ np.asarray(d, dtype=np.int64) @ H


def dct8x8(d):
    """Columns then rows, literal DCT8_1D (common/dct.c:239)."""
    d = np.asarray(d, dtype=np.int64)

    def f1d(s):
        s07, s16, s25, s34 = s[0] + s[7], s[1] + s[6], s[2] + s[5], s[3] + s[4]
        a0, a1, a2, a3 = s07 + s34, s16 + s25, s07 - s34, s16 - s25
        d07, d16, d25, d34 = s[0] - s[7], s[1] - s[6], s[2] - s[5], s[3] - s[4]
        a4 = d16 + d25 + (d07 + (d07 >> 1))
        a5 = d07 - d34 - (d25 + (d25 >> 1))
        a6 = d07 + d34 - (d16 + (d16 >> 1))
        a7 = d16 - d25 + (d34 + (d34 >> 1))
        return np.array([a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1),
                         a5 + (a6 >> 2), a0 - a1, a6 - (a5 >> 2),
                         (a2 >> 1) - a3, (a4 >> 2) - a7], dtype=np.int64)

    t = np.stack([f1d(d[:, j]) for j in range(8)], axis=1)   # columns
    return np.stack([f1d(t[i, :]) for i in range(8)], axis=0)  # rows


def idct8x8(c):
    c = np.asarray(c, dtype=np.int64).copy()
    c[0][0] += 32

    def i1d(s):
        a0 = s[0] + s[4]
        a2 = s[0] - s[4]
        a4 = (s[2] >> 1) - s[6]
        a6 = (s[6] >> 1) + s[2]
        b0, b2, b4, b6 = a0 + a6, a2 + a4, a2 - a4, a0 - a6
        a1 = -s[3] + s[5] - s[7] - (s[7] >> 1)
        a3 = s[1] + s[7] - s[3] - (s[3] >> 1)
        a5 = -s[1] + s[7] + s[5] + (s[5] >> 1)
        a7 = s[3] + s[5] + s[1] + (s[1] >> 1)
        b1 = (a7 >> 2) + a1
        b3 = a3 + (a5 >> 2)
        b5 = (a3 >> 2) - a5
        b7 = a7 - (a1 >> 2)
        return np.array([b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                         b6 - b1, b4 - b3, b2 - b5, b0 - b7], dtype=np.int64)

    t = np.stack([i1d(c[i, :]) for i in range(8)], axis=0)     # rows
    r = np.stack([i1d(t[:, j]) for j in range(8)], axis=1)     # columns
    return r >> 6


# ---------------------------------------------------------------- quant

def quant(coef, mf, bias):
    coef = np.asarray(coef, dtype=np.int64).ravel()
    mf = np.broadcast_to(np.asarray(mf, dtype=np.int64).ravel(), coef.shape)
    bias = np.broadcast_to(np.asarray(bias, dtype=np.int64).ravel(), coef.shape)
    out = np.zeros_like(coef)
    for i, c in enumerate(coef):
        if c > 0:
            out[i] = (bias[i] + c) * mf[i] >> 16
        else:
            out[i] = -((bias[i] - c) * mf[i] >> 16)
    return out


def dequant(level, dmf, qp, shift_base):
    level = np.asarray(level, dtype=np.int64).ravel()
    dmf = np.broadcast_to(np.asarray(dmf, dtype=np.int64).ravel(), level.shape)
    qbits = qp // 6 - shift_base
    if qbits >= 0:
        return (level * dmf) << qbits
    f = 1 << (-qbits - 1)
    return (level * dmf + f) >> (-qbits)


def dequant_4x4_dc(level, dmf0, qp):
    level = np.asarray(level, dtype=np.int64)
    qbits = qp // 6 - 6
    if qbits >= 0:
        return level * (dmf0 << qbits)
    f = 1 << (-qbits - 1)
    return (level * dmf0 + f) >> (-qbits)


def dequant_2x2_dc(x, dmf0, qp):
    x = np.asarray(x, dtype=np.int64)
    qbits = qp // 6 - 5
    if qbits > 0:
        dmf0 = dmf0 << qbits
        qbits = 0
    return (x * dmf0) >> (-qbits)


# ---------------------------------------------------------------- predict

def predict_16x16(mode, top, left, topleft, has_top, has_left):
    """mode in [0=V,1=H,2=DC,3=P]; returns (16,16) or None if unavailable."""
    p = np.zeros((16, 16), dtype=np.int64)
    top = np.asarray(top, dtype=np.int64)
    left = np.asarray(left, dtype=np.int64)
    if mode == 0:
        if not has_top:
            return None
        p[:, :] = top[None, :]
    elif mode == 1:
        if not has_left:
            return None
        p[:, :] = left[:, None]
    elif mode == 2:
        if has_top and has_left:
            dc = (top.sum() + left.sum() + 16) >> 5
        elif has_left:
            dc = (left.sum() + 8) >> 4
        elif has_top:
            dc = (top.sum() + 8) >> 4
        else:
            dc = 128
        p[:, :] = dc
    else:
        if not (has_top and has_left):
            return None
        H = sum((i + 1) * (top[8 + i] - (top[6 - i] if i < 7 else topleft))
                for i in range(8))
        V = sum((i + 1) * (left[8 + i] - (left[6 - i] if i < 7 else topleft))
                for i in range(8))
        a = 16 * (left[15] + top[15])
        b = (5 * H + 32) >> 6
        c = (5 * V + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = clip8((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    return p


def predict_8x8c(mode, top, left, topleft, has_top, has_left):
    """mode in [0=DC,1=H,2=V,3=P]."""
    p = np.zeros((8, 8), dtype=np.int64)
    top = np.asarray(top, dtype=np.int64)
    left = np.asarray(left, dtype=np.int64)
    if mode == 0:
        s0, s1 = top[0:4].sum(), top[4:8].sum()
        s2, s3 = left[0:4].sum(), left[4:8].sum()
        if has_top and has_left:
            dc = [(s0 + s2 + 4) >> 3, (s1 + 2) >> 2,
                  (s3 + 2) >> 2, (s1 + s3 + 4) >> 3]
        elif has_left:
            dc = [(s2 + 2) >> 2, (s2 + 2) >> 2, (s3 + 2) >> 2, (s3 + 2) >> 2]
        elif has_top:
            dc = [(s0 + 2) >> 2, (s1 + 2) >> 2, (s0 + 2) >> 2, (s1 + 2) >> 2]
        else:
            dc = [128] * 4
        p[0:4, 0:4] = dc[0]
        p[0:4, 4:8] = dc[1]
        p[4:8, 0:4] = dc[2]
        p[4:8, 4:8] = dc[3]
    elif mode == 1:
        if not has_left:
            return None
        p[:, :] = left[:, None]
    elif mode == 2:
        if not has_top:
            return None
        p[:, :] = top[None, :]
    else:
        if not (has_top and has_left):
            return None
        H = sum((i + 1) * (top[4 + i] - (top[2 - i] if i < 3 else topleft))
                for i in range(4))
        V = sum((i + 1) * (left[4 + i] - (left[2 - i] if i < 3 else topleft))
                for i in range(4))
        a = 16 * (left[7] + top[7])
        b = (17 * H + 16) >> 5
        c = (17 * V + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y, x] = clip8((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
    return p


# ---------------------------------------------------------------- pixel

def satd_4x4(a, b):
    d = np.asarray(a, dtype=np.int64) - np.asarray(b, dtype=np.int64)
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]])
    return int(np.abs(H @ d @ H).sum()) >> 1


def satd(a, b):
    """x264 composition: >>1 per 8x4 unit when width allows, else per 4x4."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    h, w = a.shape
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]])
    total = 0
    if w % 8 == 0:
        for y in range(0, h, 4):
            for x in range(0, w, 8):
                s = 0
                for xx in (x, x + 4):
                    d = a[y:y + 4, xx:xx + 4] - b[y:y + 4, xx:xx + 4]
                    s += int(np.abs(H @ d @ H).sum())
                total += s >> 1
    else:
        for y in range(0, h, 4):
            for x in range(0, w, 4):
                total += satd_4x4(a[y:y + 4, x:x + 4], b[y:y + 4, x:x + 4])
    return total


def sad(a, b):
    return int(np.abs(np.asarray(a, dtype=np.int64)
                      - np.asarray(b, dtype=np.int64)).sum())


def ssd(a, b):
    d = np.asarray(a, dtype=np.int64) - np.asarray(b, dtype=np.int64)
    return int((d * d).sum())


def _f1(a, b):
    return (a + b + 1) >> 1


def _f2(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def predict_4x4(mode, left, topleft, top, topright, has_top, has_left):
    """Scalar spec model of the nine 4x4 luma predictions
    (common/predict.c:310-498; mode order 0=V 1=H 2=DC 3=DDL 4=DDR 5=VR
    6=HD 7=VL 8=HU). left l0..l3 top-down; topright t4..t7 (callers
    substitute t3 when unavailable). Returns (4,4) or None."""
    l0, l1, l2, l3 = [int(x) for x in left]
    t0, t1, t2, t3 = [int(x) for x in top]
    t4, t5, t6, t7 = [int(x) for x in topright]
    lt = int(topleft)
    S = np.zeros((4, 4), np.int64)
    if mode == 0:
        if not has_top:
            return None
        S[:, :] = np.asarray(top, np.int64)[None, :]
    elif mode == 1:
        if not has_left:
            return None
        S[:, :] = np.asarray(left, np.int64)[:, None]
    elif mode == 2:
        if has_top and has_left:
            d = (t0 + t1 + t2 + t3 + l0 + l1 + l2 + l3 + 4) >> 3
        elif has_left:
            d = (l0 + l1 + l2 + l3 + 2) >> 2
        elif has_top:
            d = (t0 + t1 + t2 + t3 + 2) >> 2
        else:
            d = 128
        S[:, :] = d
    elif mode == 3:
        if not has_top:
            return None
        v = [_f2(t0, t1, t2), _f2(t1, t2, t3), _f2(t2, t3, t4),
             _f2(t3, t4, t5), _f2(t4, t5, t6), _f2(t5, t6, t7),
             _f2(t6, t7, t7)]
        for y in range(4):
            for x in range(4):
                S[y, x] = v[x + y]
    elif mode == 4:
        if not (has_top and has_left):
            return None
        m = {3: _f2(t3, t2, t1), 2: _f2(t2, t1, t0), 1: _f2(t1, t0, lt),
             0: _f2(t0, lt, l0), -1: _f2(lt, l0, l1), -2: _f2(l0, l1, l2),
             -3: _f2(l1, l2, l3)}
        for y in range(4):
            for x in range(4):
                S[y, x] = m[x - y]
    elif mode == 5:
        if not (has_top and has_left):
            return None
        A = {(0, 3): _f2(l2, l1, l0), (0, 2): _f2(l1, l0, lt),
             (0, 1): _f2(l0, lt, t0), (1, 3): _f2(l0, lt, t0),
             (0, 0): _f1(lt, t0), (1, 2): _f1(lt, t0),
             (1, 1): _f2(lt, t0, t1), (2, 3): _f2(lt, t0, t1),
             (1, 0): _f1(t0, t1), (2, 2): _f1(t0, t1),
             (2, 1): _f2(t0, t1, t2), (3, 3): _f2(t0, t1, t2),
             (2, 0): _f1(t1, t2), (3, 2): _f1(t1, t2),
             (3, 1): _f2(t1, t2, t3), (3, 0): _f1(t2, t3)}
        for (x, y), v in A.items():
            S[y, x] = v
    elif mode == 6:
        if not (has_top and has_left):
            return None
        A = {(0, 3): _f1(l2, l3), (1, 3): _f2(l1, l2, l3),
             (0, 2): _f1(l1, l2), (2, 3): _f1(l1, l2),
             (1, 2): _f2(l0, l1, l2), (3, 3): _f2(l0, l1, l2),
             (0, 1): _f1(l0, l1), (2, 2): _f1(l0, l1),
             (1, 1): _f2(lt, l0, l1), (3, 2): _f2(lt, l0, l1),
             (0, 0): _f1(lt, l0), (2, 1): _f1(lt, l0),
             (1, 0): _f2(t0, lt, l0), (3, 1): _f2(t0, lt, l0),
             (2, 0): _f2(t1, t0, lt), (3, 0): _f2(t2, t1, t0)}
        for (x, y), v in A.items():
            S[y, x] = v
    elif mode == 7:
        if not has_top:
            return None
        A = {(0, 0): _f1(t0, t1), (0, 1): _f2(t0, t1, t2),
             (1, 0): _f1(t1, t2), (0, 2): _f1(t1, t2),
             (1, 1): _f2(t1, t2, t3), (0, 3): _f2(t1, t2, t3),
             (2, 0): _f1(t2, t3), (1, 2): _f1(t2, t3),
             (2, 1): _f2(t2, t3, t4), (1, 3): _f2(t2, t3, t4),
             (3, 0): _f1(t3, t4), (2, 2): _f1(t3, t4),
             (3, 1): _f2(t3, t4, t5), (2, 3): _f2(t3, t4, t5),
             (3, 2): _f1(t4, t5), (3, 3): _f2(t4, t5, t6)}
        for (x, y), v in A.items():
            S[y, x] = v
    elif mode == 8:
        if not has_left:
            return None
        A = {(0, 0): _f1(l0, l1), (1, 0): _f2(l0, l1, l2),
             (2, 0): _f1(l1, l2), (0, 1): _f1(l1, l2),
             (3, 0): _f2(l1, l2, l3), (1, 1): _f2(l1, l2, l3),
             (2, 1): _f1(l2, l3), (0, 2): _f1(l2, l3),
             (3, 1): _f2(l2, l3, l3), (1, 2): _f2(l2, l3, l3)}
        for (x, y), v in A.items():
            S[y, x] = v
        for (x, y) in [(3, 2), (1, 3), (0, 3), (2, 2), (2, 3), (3, 3)]:
            S[y, x] = l3
    else:
        return None
    return S


# ---- Intra_8x8 (High profile; spec 8.3.2) --------------------------------

def predict_8x8_filter(left, topleft, top16, ht, hl, htl):
    """Spec 8.3.2.2.1 reference-sample filtering. top16: 16 samples with
    any top-right substitution already applied. Returns (lf, tlf, tf)."""
    t = np.zeros(16, np.int64)
    for x in range(16):
        pm1 = topleft if (x == 0 and htl) else top16[max(x - 1, 0)]
        pp1 = top16[min(x + 1, 15)]
        t[x] = (pm1 + 2 * top16[x] + pp1 + 2) >> 2
    lf = np.zeros(8, np.int64)
    for y in range(8):
        pm1 = topleft if (y == 0 and htl) else left[max(y - 1, 0)]
        pp1 = left[min(y + 1, 7)]
        lf[y] = (pm1 + 2 * left[y] + pp1 + 2) >> 2
    if ht and hl:
        tlf = (top16[0] + 2 * topleft + left[0] + 2) >> 2
    elif ht:
        tlf = (3 * topleft + top16[0] + 2) >> 2
    else:
        tlf = (3 * topleft + left[0] + 2) >> 2
    return lf, int(tlf), t


def predict_8x8(mode, lf, tlf, t, ht, hl):
    """Spec 8.3.2.2.2-8.3.2.2.10 per-pixel 8x8 prediction from the
    filtered edges. Returns (8,8) int64 or None if mode unavailable."""
    htl = True  # callers gate DDR/VR/HD availability themselves
    avail = [ht, hl, True, ht, ht and hl, ht and hl, ht and hl, ht, hl]
    if not avail[mode]:
        return None
    p = np.zeros((8, 8), np.int64)
    t_ = lambda i: tlf if i < 0 else t[i]
    l_ = lambda i: tlf if i < 0 else lf[i]
    for y in range(8):
        for x in range(8):
            if mode == 0:
                p[y, x] = t[x]
            elif mode == 1:
                p[y, x] = lf[y]
            elif mode == 3:                      # DDL
                if x == 7 and y == 7:
                    p[y, x] = (t[14] + 3 * t[15] + 2) >> 2
                else:
                    i = x + y
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
            elif mode == 4:                      # DDR
                if x > y:
                    p[y, x] = (t_(x - y - 2) + 2 * t_(x - y - 1)
                               + t[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (l_(y - x - 2) + 2 * l_(y - x - 1)
                               + lf[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * tlf + lf[0] + 2) >> 2
            elif mode == 5:                      # VR
                zvr = 2 * x - y
                i = x - (y >> 1)
                if zvr >= 0 and zvr % 2 == 0:
                    p[y, x] = (t_(i - 1) + t[i] + 1) >> 1
                elif zvr >= 1:
                    p[y, x] = (t_(i - 2) + 2 * t_(i - 1) + t[i] + 2) >> 2
                elif zvr == -1:
                    p[y, x] = (lf[0] + 2 * tlf + t[0] + 2) >> 2
                else:
                    p[y, x] = (l_(y - 2 * x - 1) + 2 * l_(y - 2 * x - 2)
                               + l_(y - 2 * x - 3) + 2) >> 2
            elif mode == 6:                      # HD
                zhd = 2 * y - x
                i = y - (x >> 1)
                if zhd >= 0 and zhd % 2 == 0:
                    p[y, x] = (l_(i - 1) + lf[i] + 1) >> 1
                elif zhd >= 1:
                    p[y, x] = (l_(i - 2) + 2 * l_(i - 1) + lf[i] + 2) >> 2
                elif zhd == -1:
                    p[y, x] = (t[0] + 2 * tlf + lf[0] + 2) >> 2
                else:
                    p[y, x] = (t_(x - 2 * y - 1) + 2 * t_(x - 2 * y - 2)
                               + t_(x - 2 * y - 3) + 2) >> 2
            elif mode == 7:                      # VL
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
            elif mode == 8:                      # HU
                zhu = x + 2 * y
                i = y + (x >> 1)
                if zhu < 13 and zhu % 2 == 0:
                    p[y, x] = (lf[i] + lf[i + 1] + 1) >> 1
                elif zhu < 13:
                    p[y, x] = (lf[i] + 2 * lf[i + 1] + lf[i + 2] + 2) >> 2
                elif zhu == 13:
                    p[y, x] = (lf[6] + 3 * lf[7] + 2) >> 2
                else:
                    p[y, x] = lf[7]
    if mode == 2:                                # DC
        if ht and hl:
            p[:] = (t[:8].sum() + lf.sum() + 8) >> 4
        elif hl:
            p[:] = (lf.sum() + 4) >> 3
        elif ht:
            p[:] = (t[:8].sum() + 4) >> 3
        else:
            p[:] = 128
    return p
