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
    """Fuzz: vectorized mvpred (encoder, block-granular maps) == the
    scalar spec model in the reference decoder, for 16x16, pskip and
    the 16x8/8x16 partition rules, including intra holes, partitioned
    neighbors and borders."""
    from x264_tpu.encoder import mvpred

    rng = np.random.default_rng(42)
    dec = Decoder()
    for trial in range(8):
        mb_h, mb_w = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        # random per-MB partition layout with block-granular fields
        ref4 = np.zeros((mb_h * 4, mb_w * 4), np.int64)
        mv4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        for my in range(mb_h):
            for mx in range(mb_w):
                r, c = my * 4, mx * 4
                if rng.random() < 0.2:           # intra MB
                    ref4[r:r + 4, c:c + 4] = -1
                    continue
                pt = int(rng.integers(0, 3))
                mva = rng.integers(-32, 33, 2)
                mvb = rng.integers(-32, 33, 2)
                if rng.random() < 0.3:
                    mva[:] = 0
                if pt == 0:
                    mv4[r:r + 4, c:c + 4] = mva
                elif pt == 1:
                    mv4[r:r + 2, c:c + 4] = mva
                    mv4[r + 2:r + 4, c:c + 4] = mvb
                else:
                    mv4[r:r + 4, c:c + 2] = mva
                    mv4[r:r + 4, c + 2:c + 4] = mvb

        mvp16 = np.asarray(mvpred.predict_16x16(ref4, mv4))
        skipv = np.asarray(mvpred.predict_pskip(ref4, mv4))
        t0, t1 = mvpred.predict_16x8(ref4, mv4)
        l0, l1 = mvpred.predict_8x16(ref4, mv4)
        t0, t1, l0, l1 = (np.asarray(x) for x in (t0, t1, l0, l1))
        for my in range(mb_h):
            for mx in range(mb_w):
                np.testing.assert_array_equal(
                    mvp16[my, mx], dec._mvp_16x16(ref4, mv4, my, mx),
                    err_msg=f"mvp16 trial {trial} mb ({my},{mx})")
                np.testing.assert_array_equal(
                    skipv[my, mx], dec._mv_pskip(ref4, mv4, my, mx),
                    err_msg=f"pskip trial {trial} mb ({my},{mx})")
                for part, got in ((0, t0), (1, t1)):
                    np.testing.assert_array_equal(
                        got[my, mx],
                        dec._mvp_part(ref4, mv4, my, mx, 1, part),
                        err_msg=f"16x8 p{part} trial {trial} "
                                f"mb ({my},{mx})")
                for part, got in ((0, l0), (1, l1)):
                    np.testing.assert_array_equal(
                        got[my, mx],
                        dec._mvp_part(ref4, mv4, my, mx, 2, part),
                        err_msg=f"8x16 p{part} trial {trial} "
                                f"mb ({my},{mx})")
