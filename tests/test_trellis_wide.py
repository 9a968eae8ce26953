"""Trellis coverage beyond P luma 4x4 (x264_quant_{4x4,8x8,dc}_trellis,
encoder/rdo.c:632-661): the 8x8 cat-5 trellis, chroma AC/DC trellis,
and the AQ x trellis combination (52-QP const stacks, row-gathered per
MB) — each with decode closure."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb

W, H = 80, 64


def noisy_frames(n, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(H) * 3, np.arange(W) * 2) % 256) \
        .astype(np.uint8)
    out = []
    for t in range(n):
        y = np.clip(np.roll(base, t * 2, 1).astype(int)
                    + rng.integers(-8, 9, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(120 + rng.integers(-6, 7, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(90 + rng.integers(-6, 7, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        out.append(Frame(y, u, v))
    return out


def run(frames, qp=None, aq=0, trellis=0, t8=True, bframes=0):
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0,
                      i_scenecut_threshold=0, i_bframe=bframes)
    from x264_tpu.params import B_ADAPT_NONE
    p.i_bframe_adaptive = B_ADAPT_NONE
    if qp is not None:
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = qp
    p.rc.i_aq_mode = aq
    p.analyse.i_trellis = trellis
    p.analyse.b_transform_8x8 = t8
    p.analyse.i_subpel_refine = 5      # isolate trellis from RD ladder
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)
    return stream, recons


def _closure(stream, recons):
    dec = decode_annexb(stream)
    assert len(dec) == len(recons)
    for i, (d, r) in enumerate(zip(dec, recons)):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl}")


def test_trellis_8x8_chroma_closure_and_rd():
    frames = noisy_frames(4)
    s_no, _ = run(frames, qp=30, trellis=0)
    s_tr, r_tr = run(frames, qp=30, trellis=1)
    assert s_tr != s_no
    _closure(s_tr, r_tr)


def test_trellis_with_aq_closure():
    frames = noisy_frames(4, seed=9)
    s, r = run(frames, aq=1, trellis=1)
    _closure(s, r)


def test_trellis_aq_b_closure():
    frames = noisy_frames(5, seed=5)
    s, r = run(frames, aq=1, trellis=1, bframes=2)
    _closure(s, r)
