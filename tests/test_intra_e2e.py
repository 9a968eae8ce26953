"""End-to-end all-intra encode test (BASELINE.json config 1).

Encode a synthetic CIF frame, decode the produced Annex-B stream with the
from-scratch reference decoder, and require the decode to equal the
encoder's internal reconstruction EXACTLY — the doc/regression_test.txt
method with tests/refdec standing in for the JM decoder.
"""

import numpy as np
import pytest

from x264_tpu import EncoderParams, Encoder
from x264_tpu.encoder.core import Frame
from refdec import decode_annexb


def synth_frame(w, h, seed=7):
    """Gradient + texture + flat areas: exercises DC/V/H/Plane modes and
    both empty and busy residual blocks."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 255 // max(1, w - 1) // 2 + yy * 100 // max(1, h - 1)
         + rng.integers(0, 24, (h, w))).clip(0, 255).astype(np.uint8)
    y[h // 4:h // 2, w // 4:w // 2] = 128          # flat patch
    u = (128 + (xx[::2, ::2] % 32) - 16 + rng.integers(0, 8, (h // 2, w // 2))
         ).clip(0, 255).astype(np.uint8)
    v = (128 - (yy[::2, ::2] % 32) + 16 - rng.integers(0, 8, (h // 2, w // 2))
         ).clip(0, 255).astype(np.uint8)
    return y, u, v


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("qp,deblock", [(18, True), (26, False), (26, True),
                                        (38, True)])
def test_intra_cif_roundtrip(qp, deblock):
    w, h = 352, 288
    y, u, v = synth_frame(w, h)
    p = EncoderParams(i_width=w, i_height=h, b_cabac=False,
                      b_deblocking_filter=deblock)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    ef = enc.encode(Frame(y, u, v))
    stream = enc.headers() + ef.payload

    frames = decode_annexb(stream)
    assert len(frames) == 1
    dec = frames[0]
    np.testing.assert_array_equal(dec.y, ef.recon.y.astype(np.uint8))
    np.testing.assert_array_equal(dec.u, ef.recon.u.astype(np.uint8))
    np.testing.assert_array_equal(dec.v, ef.recon.v.astype(np.uint8))

    # quality sanity: recon should resemble the source
    p_y = psnr(dec.y, y)
    assert p_y > 28 if qp <= 26 else p_y > 22, p_y


def test_intra_small_sizes():
    """Non-CIF geometries incl. cropping (width/height not MB-aligned)."""
    for (w, h) in [(64, 64), (48, 32), (40, 24)]:
        y, u, v = synth_frame(w, h, seed=3)
        p = EncoderParams(i_width=w, i_height=h, b_cabac=False)
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = 30
        enc = Encoder(p)
        ef = enc.encode(Frame(y, u, v))
        dec = decode_annexb(enc.headers() + ef.payload)[0]
        np.testing.assert_array_equal(dec.y, ef.recon.y.astype(np.uint8))
        np.testing.assert_array_equal(dec.u, ef.recon.u.astype(np.uint8))
        np.testing.assert_array_equal(dec.v, ef.recon.v.astype(np.uint8))
