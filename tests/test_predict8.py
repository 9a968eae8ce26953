"""Golden test for the Intra_8x8 predictors: the batched gather-table
kernel (ops/predict.predict_8x8 + predict_8x8_filter) against a direct
scalar transcription of spec 8.3.2.2 (independent formulation — per-pixel
loops over the clause formulas)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from x264_tpu.ops import predict as opred  # noqa: E402


def spec_filter(left, tl, top16, ht, hl, htl):
    """Spec 8.3.2.2.1 (top-right substitution already applied in top16)."""
    t = np.zeros(16, np.int64)
    for x in range(16):
        pm1 = tl if (x == 0 and htl) else top16[max(x - 1, 0)]
        pp1 = top16[min(x + 1, 15)]
        t[x] = (pm1 + 2 * top16[x] + pp1 + 2) >> 2
    lf = np.zeros(8, np.int64)
    for y in range(8):
        pm1 = tl if (y == 0 and htl) else left[max(y - 1, 0)]
        pp1 = left[min(y + 1, 7)]
        lf[y] = (pm1 + 2 * left[y] + pp1 + 2) >> 2
    if ht and hl:
        tlf = (top16[0] + 2 * tl + left[0] + 2) >> 2
    elif ht:
        tlf = (3 * tl + top16[0] + 2) >> 2
    else:
        tlf = (3 * tl + left[0] + 2) >> 2
    return lf, tlf, t


def spec_predict(lf, tlf, t, ht, hl):
    """Spec 8.3.2.2.2-8.3.2.2.10 per-pixel formulas."""
    p = np.zeros((9, 8, 8), np.int64)
    for y in range(8):
        for x in range(8):
            p[0, y, x] = t[x]
            p[1, y, x] = lf[y]
            # DDL
            if x == 7 and y == 7:
                p[3, y, x] = (t[14] + 3 * t[15] + 2) >> 2
            else:
                i = x + y
                p[3, y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
            # DDR (index -1 == p'[-1,-1], the filtered topleft)
            t_ = lambda i: tlf if i < 0 else t[i]
            l_ = lambda i: tlf if i < 0 else lf[i]
            if x > y:
                p[4, y, x] = (t_(x - y - 2) + 2 * t_(x - y - 1)
                              + t[x - y] + 2) >> 2
            elif x < y:
                p[4, y, x] = (l_(y - x - 2) + 2 * l_(y - x - 1)
                              + lf[y - x] + 2) >> 2
            else:
                p[4, y, x] = (t[0] + 2 * tlf + lf[0] + 2) >> 2
            # VR
            zvr = 2 * x - y
            i = x - (y >> 1)
            if zvr >= 0 and zvr % 2 == 0:
                a = tlf if i - 1 < 0 else t[i - 1]
                p[5, y, x] = (a + t[i] + 1) >> 1
            elif zvr >= 1:
                a = tlf if i - 2 < 0 else t[i - 2]
                p[5, y, x] = (a + 2 * t[i - 1] + t[i] + 2) >> 2
            elif zvr == -1:
                p[5, y, x] = (lf[0] + 2 * tlf + t[0] + 2) >> 2
            else:
                p[5, y, x] = (l_(y - 2 * x - 1) + 2 * l_(y - 2 * x - 2)
                              + l_(y - 2 * x - 3) + 2) >> 2
            # HD
            zhd = 2 * y - x
            i = y - (x >> 1)
            if zhd >= 0 and zhd % 2 == 0:
                a = tlf if i - 1 < 0 else lf[i - 1]
                p[6, y, x] = (a + lf[i] + 1) >> 1
            elif zhd >= 1:
                a = tlf if i - 2 < 0 else lf[i - 2]
                p[6, y, x] = (a + 2 * lf[i - 1] + lf[i] + 2) >> 2
            elif zhd == -1:
                p[6, y, x] = (t[0] + 2 * tlf + lf[0] + 2) >> 2
            else:
                p[6, y, x] = (t_(x - 2 * y - 1) + 2 * t_(x - 2 * y - 2)
                              + t_(x - 2 * y - 3) + 2) >> 2
            # VL
            i = x + (y >> 1)
            if y % 2 == 0:
                p[7, y, x] = (t[i] + t[i + 1] + 1) >> 1
            else:
                p[7, y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
            # HU
            zhu = x + 2 * y
            i = y + (x >> 1)
            if zhu < 13 and zhu % 2 == 0:
                p[8, y, x] = (lf[i] + lf[i + 1] + 1) >> 1
            elif zhu < 13:
                p[8, y, x] = (lf[i] + 2 * lf[i + 1] + lf[i + 2] + 2) >> 2
            elif zhu == 13:
                p[8, y, x] = (lf[6] + 3 * lf[7] + 2) >> 2
            else:
                p[8, y, x] = lf[7]
    # DC
    if ht and hl:
        dc = (t[:8].sum() + lf.sum() + 8) >> 4
    elif hl:
        dc = (lf.sum() + 4) >> 3
    elif ht:
        dc = (t[:8].sum() + 4) >> 3
    else:
        dc = 128
    p[2] = dc
    return p


@pytest.mark.parametrize("ht,hl,htl,htr", [
    (True, True, True, True), (True, True, True, False),
    (True, True, False, True), (True, False, False, True),
    (False, True, False, False), (False, False, False, False),
])
def test_predict_8x8_golden(ht, hl, htl, htr):
    rng = np.random.default_rng(hash((ht, hl, htl, htr)) & 0xFFFF)
    K = 32
    left = rng.integers(0, 256, (K, 8))
    top = rng.integers(0, 256, (K, 8))
    tr = rng.integers(0, 256, (K, 8))
    tl = rng.integers(0, 256, K)

    f = lambda b: jnp.full((K,), b)
    lf, tlf, tf = opred.predict_8x8_filter(
        jnp.asarray(left), jnp.asarray(tl), jnp.asarray(top),
        jnp.asarray(tr), f(ht), f(hl), f(htl), f(htr))
    got = np.asarray(opred.predict_8x8(lf, tlf, tf, f(ht), f(hl)))
    avail = np.asarray(opred.mode_available_8x8(f(ht), f(hl), f(htl)))

    for k in range(K):
        t16 = np.concatenate(
            [top[k], tr[k] if htr else np.full(8, top[k][7])])
        slf, stlf, st = spec_filter(left[k], tl[k], t16, ht, hl, htl)
        np.testing.assert_array_equal(np.asarray(lf[k]), slf)
        np.testing.assert_array_equal(np.asarray(tf[k]), st)
        if htl:
            assert int(tlf[k]) == stlf
        want = spec_predict(slf, stlf, st, ht, hl)
        for m in range(9):
            if avail[k, m]:
                np.testing.assert_array_equal(got[k, m], want[m],
                                              err_msg=f"mode {m}")
