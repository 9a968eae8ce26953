"""DCT decimation (common/quant.c:195-251 decimate scores + the
encoder/macroblock.c:544-730 application rules): kernel fuzz against a
scalar spec model, plus e2e bit savings + decode closure."""

import numpy as np
import pytest

from x264_tpu.ops import quant as oquant
from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb


def scalar_decimate_score(dct, table):
    """Direct transcription of x264_decimate_score_internal
    (common/quant.c:212-241)."""
    idx = len(dct) - 1
    while idx >= 0 and dct[idx] == 0:
        idx -= 1
    score = 0
    while idx >= 0:
        if abs(dct[idx]) > 1:
            return 9
        idx -= 1
        run = 0
        while idx >= 0 and dct[idx] == 0:
            idx -= 1
            run += 1
        score += table[run]
    return score


@pytest.mark.parametrize("C,table", [(16, oquant.DECIMATE_TAB4),
                                     (15, oquant.DECIMATE_TAB4),
                                     (64, oquant.DECIMATE_TAB8)])
def test_decimate_score_fuzz(C, table):
    rng = np.random.default_rng(42 + C)
    # mostly-sparse small levels (the regime decimation operates in)
    blocks = np.zeros((256, C), np.int32)
    for i in range(256):
        n = rng.integers(0, 6)
        pos = rng.choice(C, size=n, replace=False)
        blocks[i, pos] = rng.integers(-3, 4, n)
    got = np.asarray(oquant.decimate_score(blocks, table))
    want = np.array([scalar_decimate_score(b, table) for b in blocks])
    np.testing.assert_array_equal(got, want)


def noisy_sequence(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 256) \
        .astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, t * 2, axis=1).astype(np.int32)
        y = np.clip(y + rng.integers(-6, 7, (h, w)), 0, 255) \
            .astype(np.uint8)
        u = np.clip(120 + rng.integers(-5, 6, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(90 + rng.integers(-5, 6, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def _encode(frames, w, h, decimate, cabac):
    p = EncoderParams(i_width=w, i_height=h, b_cabac=cabac,
                      i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    p.analyse.b_dct_decimate = decimate
    p.analyse.b_transform_8x8 = False
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
    return stream, recons


@pytest.mark.parametrize("cabac", [False, True])
def test_decimate_saves_bits_and_closes(cabac):
    w, h = 80, 64
    frames = noisy_sequence(w, h, 4)
    s_on, r_on = _encode(frames, w, h, True, cabac)
    s_off, _ = _encode(frames, w, h, False, cabac)
    # noise at qp30 produces many lone +-1 coefficients: decimation
    # must strictly shrink the stream
    assert len(s_on) < len(s_off)
    decoded = decode_annexb(s_on)
    for i, (d, r) in enumerate(zip(decoded, r_on)):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl} cabac={cabac}")
