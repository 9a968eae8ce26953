"""Golden scalar model of H.264 sub-pel motion compensation.

Implemented directly from spec 8.4.2.2 (Table 8-12 quarter-sample
positions, per-tap coordinate clamping) — deliberately a *different*
construction from the encoder's hpel-plane-average scheme
(x264_tpu.ops.mc / common/mc.c:157-186), so agreement between the two is
a real oracle. Also used by the reference decoder for P/B slices.
"""

from __future__ import annotations

import numpy as np


def _clip255(x):
    return np.clip(x, 0, 255)


def _ref(plane, y, x):
    h, w = plane.shape
    return plane[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)].astype(np.int64)


_T = np.array([1, -5, 20, 20, -5, 1], dtype=np.int64)


def _htap(plane, y, x):
    """Unrounded horizontal 6-tap at (y, x + 0.5)."""
    return sum(_T[k] * _ref(plane, y, x + k - 2) for k in range(6))


def _vtap(plane, y, x):
    """Unrounded vertical 6-tap at (y + 0.5, x)."""
    return sum(_T[k] * _ref(plane, y + k - 2, x) for k in range(6))


def mc_luma(plane, y0, x0, mvx, mvy, bh, bw):
    """Quarter-pel prediction block, spec 8.4.2.2.1/8.4.2.2.2."""
    plane = np.asarray(plane)
    fy, fx = mvy & 3, mvx & 3
    yI = y0 + (mvy >> 2) + np.arange(bh)[:, None]
    xI = x0 + (mvx >> 2) + np.arange(bw)[None, :]

    G = _ref(plane, yI, xI)
    if fx == 0 and fy == 0:
        return G

    b = _clip255((_htap(plane, yI, xI) + 16) >> 5)
    h = _clip255((_vtap(plane, yI, xI) + 16) >> 5)
    if fy == 0:  # a, b, c
        if fx == 2:
            return b
        A = G if fx == 1 else _ref(plane, yI, xI + 1)
        return (A + b + 1) >> 1
    if fx == 0:  # d, h, n
        if fy == 2:
            return h
        A = G if fy == 1 else _ref(plane, yI + 1, xI)
        return (A + h + 1) >> 1

    # center positions need j (20-bit intermediate) and/or m, s
    j1 = sum(_T[k] * _vtap(plane, yI, xI + k - 2) for k in range(6))
    j = _clip255((j1 + 512) >> 10)
    m = _clip255((_vtap(plane, yI, xI + 1) + 16) >> 5)
    s = _clip255((_htap(plane, yI + 1, xI) + 16) >> 5)

    if fx == 2 and fy == 2:
        return j
    if fx == 2:  # f, q
        A = b if fy == 1 else s
        return (A + j + 1) >> 1
    if fy == 2:  # i, k
        A = h if fx == 1 else m
        return (A + j + 1) >> 1
    # e, g, p, r: diagonal averages of the two nearest half positions
    hb = b if fy == 1 else s
    hv = h if fx == 1 else m
    return (hb + hv + 1) >> 1


def mc_chroma(plane, y0, x0, mvx, mvy, bh, bw):
    """Eighth-pel bilinear chroma prediction, spec 8.4.2.2.2."""
    plane = np.asarray(plane)
    dx, dy = mvx & 7, mvy & 7
    yI = y0 + (mvy >> 3) + np.arange(bh)[:, None]
    xI = x0 + (mvx >> 3) + np.arange(bw)[None, :]
    A = _ref(plane, yI, xI)
    B = _ref(plane, yI, xI + 1)
    C = _ref(plane, yI + 1, xI)
    D = _ref(plane, yI + 1, xI + 1)
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B
            + (8 - dx) * dy * C + dx * dy * D + 32) >> 6
