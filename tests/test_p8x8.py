"""P8x8 partitions (x264_mb_analyse_inter_p8x8, encoder/analyse.c:
1222-1272 + sub_mb_type syntax 7.3.5.2): selection on busy content,
bit savings, and decode closure in both entropy coders."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb

W, H = 80, 64


def busy_frames(n, seed=21):
    """Every 8x8 cell translates with its OWN velocity: 8x8 MC matches
    each cell exactly while any single 16x16/16x8/8x16 MV can track at
    most part of the MB — the P8x8 use case distilled."""
    rng = np.random.default_rng(seed)
    base = (rng.integers(0, 255, (H + 64, W + 64))).astype(np.uint8)
    vels = rng.integers(-2, 3, (H // 8, W // 8, 2))
    frames = []
    for t in range(n):
        y = np.zeros((H, W), np.uint8)
        for qy in range(H // 8):
            for qx in range(W // 8):
                dy = 24 + int(vels[qy, qx, 0]) * t
                dx = 24 + int(vels[qy, qx, 1]) * t
                y[qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8] = \
                    base[qy * 8 + dy:qy * 8 + dy + 8,
                         qx * 8 + dx:qx * 8 + dx + 8]
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode(frames, cabac, p8x8=True, nref=1):
    from x264_tpu.params import (ANALYSE_I4x4, ANALYSE_PSUB16x16,
                                 B_ADAPT_NONE)
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      i_log_level=0, i_scenecut_threshold=0,
                      i_frame_reference=nref)
    p.i_bframe_adaptive = B_ADAPT_NONE
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    p.analyse.i_subpel_refine = 5
    p.analyse.b_transform_8x8 = False
    if not p8x8:
        # 16x16-only inter (the pre-P8x8 ladder)
        p.analyse.inter = ANALYSE_I4x4 | ANALYSE_PSUB16x16
    enc = Encoder(p)
    enc._p8x8 = p8x8      # isolate the P8x8 axis (parts stay on)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
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


@pytest.mark.parametrize("cabac", [False, True])
def test_p8x8_closure_and_gain(cabac):
    frames = busy_frames(4)
    s_on, r_on = encode(frames, cabac, p8x8=True)
    s_off, _ = encode(frames, cabac, p8x8=False)
    _closure(s_on, r_on)
    # busy multi-object content: the 4-MV mode must pay
    assert len(s_on) < len(s_off), (len(s_on), len(s_off))


def test_p8x8_multiref_cabac_closure():
    frames = busy_frames(5, seed=4)
    s, r = encode(frames, True, p8x8=True, nref=2)
    _closure(s, r)
