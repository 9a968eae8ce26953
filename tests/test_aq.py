"""Variance AQ + mb_qp_delta end-to-end: per-MB QP streams (CABAC and
CAVLC, I and P slices) must decode bit-exactly through the reference
decoder, and a detail-vs-flat frame must show a QP spread in the
decoder's per-MB QP map (x264_adaptive_quant_frame contract,
encoder/ratecontrol.c:231)."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import Decoder
from refdec.bits import split_annexb


def _frames(n, w, h, seed=5):
    """Left half flat, right half textured — the AQ regime."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        flat = np.full((h, w // 2), 96 + 2 * t)
        tex = (rng.integers(0, 256, (h, w // 2))
               + xx[:, : w // 2]) % 256
        y = np.concatenate([flat, tex], axis=1)
        u = (128 + xx[::2, ::2] // 8) % 256
        v = (128 + yy[::2, ::2] // 8) % 256
        out.append(Frame(y.astype(np.uint8), u.astype(np.uint8),
                         v.astype(np.uint8)))
    return out


@pytest.mark.parametrize("cabac", [True, False])
def test_aq_roundtrip_and_qp_spread(cabac):
    w, h = 160, 96
    frames = _frames(3, w, h)
    p = EncoderParams(i_width=w, i_height=h, b_cabac=cabac,
                      i_log_level=0, i_keyint_max=50)
    p.rc.i_rc_method = 1            # CRF (AQ is disabled under CQP)
    p.rc.f_rf_constant = 28.0
    p.rc.i_aq_mode = 1
    p.rc.f_aq_strength = 1.0
    enc = Encoder(p)
    assert enc._aq, "AQ did not engage"
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        if ef:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)

    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    outs = dec.frames
    assert len(outs) == len(recons)
    for i, (d, r) in enumerate(zip(outs, recons)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl} cabac={cabac}")
    # the flat and textured halves must land on different QPs
    qp_map = dec.last_pic["qp_mb"]
    assert len(np.unique(qp_map)) >= 2, qp_map
    flat_qp = qp_map[:, : qp_map.shape[1] // 2].mean()
    tex_qp = qp_map[:, qp_map.shape[1] // 2:].mean()
    assert tex_qp > flat_qp + 1.0, (flat_qp, tex_qp)


def test_aq_off_identical_to_before():
    """aq-mode 0 must not change the stream (plumbing is inert)."""
    w, h = 96, 64
    frames = _frames(2, w, h, seed=8)

    def run(aq):
        p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                          i_log_level=0, i_keyint_max=50)
        p.rc.i_rc_method = 1
        p.rc.f_rf_constant = 26.0
        p.rc.i_aq_mode = aq
        enc = Encoder(p)
        data = b""
        for f in frames:
            ef = enc.encode(f)
            if ef:
                data += ef.payload
        for ef in enc.flush():
            data += ef.payload
        return data

    # aq off twice: deterministic
    assert run(0) == run(0)
