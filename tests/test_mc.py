"""Device sub-pel MC vs. the spec-derived golden model (checkasm check_mc
analogue): all 16 luma qpel phases, all 64 chroma phases, MVs pointing
outside the picture."""

import numpy as np
import pytest

import golden_mc as GM
from x264_tpu.ops import mc as OMC


@pytest.fixture(scope="module")
def ref_frame():
    rng = np.random.default_rng(42)
    h, w = 96, 128
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    c = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    planes = np.asarray(OMC.hpel_planes(OMC.pad_plane(y)))
    cpad = np.asarray(OMC.pad_plane(c, OMC.PAD // 2))
    return y, c, planes, cpad


def test_mc_luma_all_phases(ref_frame):
    y, _, planes, _ = ref_frame
    h, w = y.shape
    rng = np.random.default_rng(0)
    N = 128
    ys = rng.integers(0, h - 16, N).astype(np.int32)
    xs = rng.integers(0, w - 16, N).astype(np.int32)
    # every qpel phase + integer parts spanning negative/positive
    mvs = np.stack([rng.integers(-40, 41, N), rng.integers(-40, 41, N)],
                   axis=-1).astype(np.int32)
    mvs[:16, 0] = np.arange(16) % 4 - 8      # force all 16 phases
    mvs[:16, 1] = np.arange(16) // 4 + 5
    out = np.asarray(OMC.mc_luma(planes, ys, xs, mvs, 16, 16))
    for n in range(N):
        gold = GM.mc_luma(y, int(ys[n]), int(xs[n]),
                          int(mvs[n, 0]), int(mvs[n, 1]), 16, 16)
        np.testing.assert_array_equal(out[n], gold, err_msg=str(mvs[n]))


def test_mc_luma_small_blocks(ref_frame):
    y, _, planes, _ = ref_frame
    rng = np.random.default_rng(1)
    for (bh, bw) in [(8, 8), (4, 4), (8, 4), (4, 8), (16, 8), (8, 16)]:
        N = 32
        ys = rng.integers(0, y.shape[0] - bh, N).astype(np.int32)
        xs = rng.integers(0, y.shape[1] - bw, N).astype(np.int32)
        mvs = np.stack([rng.integers(-30, 31, N), rng.integers(-30, 31, N)],
                       axis=-1).astype(np.int32)
        out = np.asarray(OMC.mc_luma(planes, ys, xs, mvs, bh, bw))
        for n in range(N):
            gold = GM.mc_luma(y, int(ys[n]), int(xs[n]),
                              int(mvs[n, 0]), int(mvs[n, 1]), bh, bw)
            np.testing.assert_array_equal(out[n], gold)


def test_mc_chroma_all_phases(ref_frame):
    _, c, _, cpad = ref_frame
    h, w = c.shape
    rng = np.random.default_rng(2)
    N = 128
    ys = rng.integers(0, h - 8, N).astype(np.int32)
    xs = rng.integers(0, w - 8, N).astype(np.int32)
    mvs = np.stack([rng.integers(-60, 61, N), rng.integers(-60, 61, N)],
                   axis=-1).astype(np.int32)
    mvs[:64, 0] = np.arange(64) % 8 - 16     # all 64 phase pairs
    mvs[:64, 1] = np.arange(64) // 8 + 9
    out = np.asarray(OMC.mc_chroma(cpad, ys, xs, mvs, 8, 8))
    for n in range(N):
        gold = GM.mc_chroma(c, int(ys[n]), int(xs[n]),
                            int(mvs[n, 0]), int(mvs[n, 1]), 8, 8)
        np.testing.assert_array_equal(out[n], gold, err_msg=str(mvs[n]))


def test_mc_out_of_frame(ref_frame):
    """MVs pushing blocks into the replicated border (up to 24 px)."""
    y, c, planes, cpad = ref_frame
    h, w = y.shape
    cases = [(0, 0, -24 * 4 - 2, -24 * 4 - 3),
             (h - 16, w - 16, 24 * 4 + 1, 24 * 4 + 2),
             (0, w - 16, 23 * 4 + 3, -24 * 4),
             (h - 16, 0, -24 * 4 + 1, 24 * 4 + 3)]
    ys = np.array([cs[0] for cs in cases], np.int32)
    xs = np.array([cs[1] for cs in cases], np.int32)
    mvs = np.array([[cs[3], cs[2]] for cs in cases], np.int32)
    out = np.asarray(OMC.mc_luma(planes, ys, xs, mvs, 16, 16))
    outc = np.asarray(OMC.mc_chroma(cpad, ys // 2, xs // 2, mvs, 8, 8))
    for n in range(len(cases)):
        gold = GM.mc_luma(y, int(ys[n]), int(xs[n]),
                          int(mvs[n, 0]), int(mvs[n, 1]), 16, 16)
        np.testing.assert_array_equal(out[n], gold)
        goldc = GM.mc_chroma(c, int(ys[n]) // 2, int(xs[n]) // 2,
                             int(mvs[n, 0]), int(mvs[n, 1]), 8, 8)
        np.testing.assert_array_equal(outc[n], goldc)


def test_weighted_avg():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (4, 8, 8)).astype(np.int32)
    b = rng.integers(0, 256, (4, 8, 8)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(OMC.avg(a, b)),
                                  (a + b + 1) >> 1)
    for w1 in (16, 32, 48):
        got = np.asarray(OMC.weighted_avg(a, b, w1))
        exp = np.clip((a * w1 + b * (64 - w1) + 32) >> 6, 0, 255)
        np.testing.assert_array_equal(got, exp)
