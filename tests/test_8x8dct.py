"""8x8 transform (High profile) end-to-end: --8x8dct CABAC streams must
decode bit-exactly through the reference decoder, actually use the 8x8
transform, and signal High profile; the deblocker must skip interior
8x8 edges (golden parity)."""

import numpy as np
import pytest

import golden_deblock as GD
from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from x264_tpu.ops import deblock as OD
from refdec.decoder import decode_annexb, Decoder
from refdec.bits import split_annexb


def _frames(n, w, h, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx + yy) // 3) % 220
    out = []
    for t in range(n):
        # piecewise-smooth 8x8 fields on top of a gradient: the MC
        # residual is then smooth per 8x8 block — the regime where the
        # 8x8 transform wins SA8D-vs-SATD
        blocks = rng.integers(-20, 21, (h // 8, w // 8))
        fld = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        y = np.clip(base + fld + 2 * t, 0, 255)
        u = (128 + xx[::2, ::2] // 4) % 256
        v = (128 + yy[::2, ::2] // 4) % 256
        out.append(Frame(y.astype(np.uint8), u.astype(np.uint8),
                         v.astype(np.uint8)))
    return out


def test_8x8dct_roundtrip_and_usage():
    w, h = 128, 96
    frames = _frames(4, w, h)
    p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                      i_log_level=0, i_keyint_max=50)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    p.analyse.b_transform_8x8 = True
    enc = Encoder(p)
    assert enc.params.analyse.b_transform_8x8
    assert enc.pps.transform_8x8_mode
    from x264_tpu.params import PROFILE_HIGH
    assert enc.sps.profile_idc == PROFILE_HIGH
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
                err_msg=f"frame {i} plane {pl}")
    # at least one P MB must actually have used the 8x8 transform
    assert dec.last_pic["t8_map"].any(), "8x8 transform never chosen"


def test_8x8dct_smaller_on_smooth_content():
    """On smooth content the 8x8 transform should not hurt: stream at
    most ~2% larger, and typically smaller (x264 --8x8dct rationale)."""
    w, h = 128, 96
    frames = _frames(4, w, h)

    def run(t8):
        p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                          i_log_level=0, i_keyint_max=50)
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = 30
        p.analyse.b_transform_8x8 = t8
        enc = Encoder(p)
        bits = 0
        for f in frames:
            ef = enc.encode(f)
            if ef:
                bits += ef.bits
        for ef in enc.flush():
            bits += ef.bits
        return bits

    b4, b8 = run(False), run(True)
    assert b8 <= b4 * 1.02, (b8, b4)


def test_deblock_t8_golden_parity():
    rng = np.random.default_rng(21)
    mb_h, mb_w = 4, 6
    h, w = mb_h * 16, mb_w * 16
    base = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1))
    y = np.clip(np.repeat(np.repeat(base, 8, 0), 8, 1)[:h, :w]
                + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int32)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    qp_mb = rng.integers(24, 36, (mb_h, mb_w)).astype(np.int32)
    intra_mb = rng.random((mb_h, mb_w)) < 0.3
    nnz4 = (rng.random((mb_h * 4, mb_w * 4)) < 0.4).astype(np.int32)
    ref4 = rng.integers(0, 2, (mb_h * 4, mb_w * 4)).astype(np.int32)
    mv4 = (rng.integers(0, 3, (mb_h * 4, mb_w * 4, 2)) * 4).astype(np.int32)
    t8 = rng.random((mb_h, mb_w)) < 0.5

    gy, gu, gv = GD.deblock_frame(
        y.copy(), u.copy(), v.copy(), qp_mb, intra_mb, nnz4, ref4, mv4,
        t8_mb=t8)
    z4 = np.zeros_like(ref4)
    zmv = np.zeros_like(mv4)
    dy, du, dv = OD.deblock_frame(
        mb_h, mb_w, y, u, v, qp_mb, intra_mb, nnz4, ref4, mv4,
        z4, zmv, False, 0, 0, 0, t8_mb=t8)
    np.testing.assert_array_equal(np.asarray(dy), gy)
    np.testing.assert_array_equal(np.asarray(du), gu)
    np.testing.assert_array_equal(np.asarray(dv), gv)
