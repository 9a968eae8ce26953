"""Lossless (qp=0 transform bypass) tests — the BASELINE.json bit-exact
acceptance: with qpprime_y_zero_transform_bypass the reconstruction and
the decoded stream must equal the SOURCE exactly.

Reference: lossless paths of encoder/macroblock.c:415-474 and the SPS
flag wiring of x264_sps_init; spec 8.5.15.
"""

import numpy as np
import pytest

from x264_tpu.params import EncoderParams, PROFILE_HIGH444
from x264_tpu.encoder.core import Encoder, Frame

from refdec.decoder import Decoder
from refdec.bits import split_annexb

W, H = 96, 80


def clip(n=4, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (120 + 70 * np.sin(yy / 13.0) + 50 * np.cos(xx / 11.0)
            + rng.normal(0, 9, (H, W))).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, (t, 2 * t), axis=(0, 1))
        u = ((xx[::2, ::2] + 7 * t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] * 2 - t) % 256).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


@pytest.mark.parametrize("cabac", [False, True])
def test_lossless_roundtrip(cabac):
    frames = clip()
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      i_log_level=0, i_keyint_max=16,
                      i_scenecut_threshold=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 0
    enc = Encoder(p)
    assert enc._lossless
    assert enc.sps.profile_idc == PROFILE_HIGH444
    assert enc.sps.qpprime_y_zero_transform_bypass
    stream = enc.headers()
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        # encoder reconstruction must equal the source exactly
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(ef.recon, pl), np.int64),
                np.asarray(getattr(f, pl), np.int64),
                err_msg=f"recon != source ({ef.frame_type}, {pl}, "
                        f"cabac={cabac})")
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(frames)
    for i, (d, f) in enumerate(zip(dec.frames, frames)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(f, pl), np.int64),
                err_msg=f"decode != source (frame {i}, {pl}, "
                        f"cabac={cabac})")


def test_lossless_profile_gating():
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 0
    p.i_bframe = 2
    p.validate()
    assert p.i_bframe == 0          # lossless gates B off for now
    assert p.profile() == PROFILE_HIGH444
