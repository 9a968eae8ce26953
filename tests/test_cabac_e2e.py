"""CABAC end-to-end: encode all-intra with the CABAC entropy path
(device bin-op planes + native arithmetic coder), decode with the
reference decoder's CABAC engine, require decode == reconstruction.
Also checks the headline CABAC property: smaller than CAVLC at equal QP
(the ~10-15% win that makes it the reference's default,
encoder/cabac.c)."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb


def _mkframe(rng, w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx // 3 + yy // 2) % 220 + rng.integers(0, 36, (h, w))
         ).clip(0, 255).astype(np.uint8)
    u = (128 + (xx[::2, ::2] % 40) - 20).astype(np.uint8)
    v = (128 - (yy[::2, ::2] % 40) + 20).astype(np.uint8)
    return Frame(y, u, v)


def encode(frames, w, h, qp, cabac, deblock=True):
    p = EncoderParams(i_width=w, i_height=h, b_cabac=cabac,
                      b_deblocking_filter=deblock, i_log_level=0,
                      i_keyint_max=1)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
    return stream, recons


@pytest.mark.parametrize("qp,deblock", [(26, True), (18, False), (38, True)])
def test_cabac_intra_roundtrip(qp, deblock):
    rng = np.random.default_rng(5)
    w, h = 80, 64
    frames = [_mkframe(rng, w, h) for _ in range(2)]
    stream, recons = encode(frames, w, h, qp, True, deblock)
    decoded = decode_annexb(stream)
    assert len(decoded) == 2
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl} qp={qp}")


def test_cabac_crop_roundtrip():
    rng = np.random.default_rng(6)
    w, h = 68, 52
    frames = [_mkframe(rng, w, h)]
    stream, recons = encode(frames, w, h, 26, True)
    d = decode_annexb(stream)[0]
    np.testing.assert_array_equal(np.asarray(d.y, np.int64),
                                  np.asarray(recons[0].y, np.int64))
    np.testing.assert_array_equal(np.asarray(d.u, np.int64),
                                  np.asarray(recons[0].u, np.int64))
    np.testing.assert_array_equal(np.asarray(d.v, np.int64),
                                  np.asarray(recons[0].v, np.int64))


def test_cabac_beats_cavlc():
    rng = np.random.default_rng(7)
    w, h = 160, 96
    frames = [_mkframe(rng, w, h)]
    s_cabac, _ = encode(frames, w, h, 26, True)
    s_cavlc, _ = encode(frames, w, h, 26, False)
    # identical reconstruction path, so only entropy coding differs
    assert len(s_cabac) < len(s_cavlc), (len(s_cabac), len(s_cavlc))


def _moving(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = big[3 * t:3 * t + h, 2 * t + (t % 2):2 * t + (t % 2) + w].copy()
        if t >= 2:
            y[8:32, 4:44] = (40 + 5 * t) % 255
        u = ((y[::2, ::2].astype(int) + 30) % 250).astype(np.uint8)
        v = ((255 - y[1::2, ::2].astype(int)) % 250).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


@pytest.mark.parametrize("qp,deblock", [(26, True), (30, False)])
def test_cabac_ippp_roundtrip(qp, deblock):
    """P-slice CABAC: skip flags, P mb_type, UEG3 mvd, inter CBP +
    residual contexts — decode must equal the encoder reconstruction."""
    w, h = 80, 64
    frames = _moving(w, h, 4)
    p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                      b_deblocking_filter=deblock, i_log_level=0,
                      i_keyint_max=250)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    recons, types = [], []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
        types.append(ef.frame_type)
    assert types == ["IDR", "P", "P", "P"]
    decoded = decode_annexb(stream)
    assert len(decoded) == 4
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} ({types[i]}) plane {pl} qp={qp} "
                        f"deblock={deblock}")


def test_cabac_ippp_with_skips():
    """Static scene under CABAC: P frames are nearly all mb_skip_flag=1
    and must still roundtrip."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 255, (64, 80)).astype(np.uint8)
    u = rng.integers(0, 255, (32, 40)).astype(np.uint8)
    v = rng.integers(0, 255, (32, 40)).astype(np.uint8)
    frames = [Frame(y, u, v) for _ in range(3)]
    p = EncoderParams(i_width=80, i_height=64, b_cabac=True,
                      b_deblocking_filter=False, i_log_level=0,
                      i_keyint_max=250)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
    decoded = decode_annexb(stream)
    np.testing.assert_array_equal(np.asarray(decoded[2].y, np.int64),
                                  np.asarray(recons[2].y, np.int64))
    np.testing.assert_array_equal(np.asarray(decoded[2].u, np.int64),
                                  np.asarray(recons[2].u, np.int64))
