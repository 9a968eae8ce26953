"""P-frame end-to-end: encode IPPP, decode with the reference decoder,
require decode == encoder reconstruction bit-exactly (the
doc/regression_test.txt method, extended to inter per SURVEY §7 step 4).
Also fuzzes the vectorized MV prediction against the scalar spec model.
"""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import Decoder, decode_annexb


def moving_sequence(w, h, n, seed=0):
    """Textured background with a moving block + noise: exercises skip
    (static areas), inter (translation) and intra (occlusion) MBs."""
    rng = np.random.default_rng(seed)
    big = (rng.integers(0, 255, (h + 64, w + 64))).astype(np.uint8)
    frames = []
    for t in range(n):
        dx, dy = 2 * t + (t % 2), 3 * t  # sub-MB translation
        y = np.asarray(big[dy:dy + h, dx:dx + w])
        y = y.copy()
        # occluding box that appears midway (forces intra/heavy residual)
        if t >= 2:
            y[8:8 + 24, 4:4 + 40] = (40 + 5 * t) % 255
        u = ((y[::2, ::2].astype(int) + 30) % 250).astype(np.uint8)
        v = ((255 - y[1::2, ::2].astype(int)) % 250).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode_stream(frames, w, h, qp, deblock):
    p = EncoderParams(i_width=w, i_height=h, b_cabac=False,
                      b_deblocking_filter=deblock, i_log_level=0,
                      i_keyint_max=250)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    recons, types, sizes = [], [], []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
        types.append(ef.frame_type)
        sizes.append(len(ef.payload))
    return stream, recons, types, sizes


@pytest.mark.parametrize("qp,deblock", [(26, False), (26, True),
                                        (18, True), (38, False)])
def test_ippp_roundtrip(qp, deblock):
    w, h = 80, 64
    frames = moving_sequence(w, h, 4)
    stream, recons, types, sizes = encode_stream(frames, w, h, qp, deblock)
    assert types == ["IDR", "P", "P", "P"]

    decoded = decode_annexb(stream)
    assert len(decoded) == 4
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for plane in ("y", "u", "v"):
            got = np.asarray(d.__dict__[plane], np.int64)
            want = np.asarray(getattr(r, plane), np.int64)
            assert got.shape == want.shape
            np.testing.assert_array_equal(
                got, want, err_msg=f"frame {i} ({types[i]}) plane {plane} "
                f"qp={qp} deblock={deblock}")


def test_ippp_crop_roundtrip():
    """Non-MB-aligned size exercises padding + SPS cropping with P MBs."""
    w, h = 68, 52
    frames = moving_sequence(w, h, 3, seed=3)
    stream, recons, types, _ = encode_stream(frames, w, h, 26, True)
    decoded = decode_annexb(stream)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        np.testing.assert_array_equal(
            np.asarray(d.y, np.int64), np.asarray(r.y, np.int64),
            err_msg=f"frame {i}")
        np.testing.assert_array_equal(
            np.asarray(d.u, np.int64), np.asarray(r.u, np.int64))
        np.testing.assert_array_equal(
            np.asarray(d.v, np.int64), np.asarray(r.v, np.int64))


def test_p_frames_cheaper_than_intra():
    """Inter coding must beat all-intra on translating content at the
    same QP (the point of P frames)."""
    w, h = 80, 64
    frames = moving_sequence(w, h, 4)
    _, _, _, sizes = encode_stream(frames, w, h, 26, True)
    assert all(s < sizes[0] * 0.8 for s in sizes[1:]), sizes


def test_static_scene_skips():
    """A perfectly static scene must code P frames almost entirely as
    skips (a few bytes per frame)."""
    rng = np.random.default_rng(7)
    y = rng.integers(0, 255, (64, 80)).astype(np.uint8)
    u = rng.integers(0, 255, (32, 40)).astype(np.uint8)
    v = rng.integers(0, 255, (32, 40)).astype(np.uint8)
    frames = [Frame(y, u, v) for _ in range(3)]
    # deblock off: with it on, ref != source so residuals never vanish
    stream, recons, types, sizes = encode_stream(frames, 80, 64, 26, False)
    assert types[1] == "P"
    assert sizes[1] < 32 and sizes[2] < 32, sizes
    decoded = decode_annexb(stream)
    np.testing.assert_array_equal(np.asarray(decoded[2].y, np.int64),
                                  np.asarray(recons[2].y, np.int64))


def test_mv_prediction_matches_scalar_spec():
    """Fuzz: vectorized mv_prediction (encoder) == scalar median/pskip
    model (decoder), including intra holes and borders."""
    import jax.numpy as jnp
    from x264_tpu.encoder.inter import mv_prediction

    rng = np.random.default_rng(42)
    dec = Decoder()
    for trial in range(8):
        mb_h, mb_w = rng.integers(1, 7), rng.integers(1, 7)
        ref = np.where(rng.random((mb_h, mb_w)) < 0.25, -1, 0)
        mv = rng.integers(-32, 33, (mb_h, mb_w, 2))
        # sprinkle exact zero MVs (pskip trigger paths)
        zmask = rng.random((mb_h, mb_w)) < 0.3
        mv[zmask] = 0
        mv[ref == -1] = 0
        mvp_v, skip_v = mv_prediction(jnp.asarray(mv), jnp.asarray(ref))
        mvp_v, skip_v = np.asarray(mvp_v), np.asarray(skip_v)
        for my in range(mb_h):
            for mx in range(mb_w):
                want = dec._mvp_16x16(ref.astype(np.int64),
                                      mv.astype(np.int64), my, mx)
                np.testing.assert_array_equal(
                    mvp_v[my, mx], want,
                    err_msg=f"mvp trial {trial} mb ({my},{mx})")
                wskip = dec._mv_pskip(ref.astype(np.int64),
                                      mv.astype(np.int64), my, mx)
                np.testing.assert_array_equal(
                    skip_v[my, mx], wskip,
                    err_msg=f"pskip trial {trial} mb ({my},{mx})")
