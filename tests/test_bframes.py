"""B-frame tests: IbP GOP structure, decode closure for CAVLC and
CABAC, the closed-GOP promotion at IDR boundaries, and the bitrate-
benefit criterion (IbP < IPPP at equal QP on smooth motion).

Reference behavior: B slice syntax (encoder/cavlc.c:485-560,
encoder/cabac.c:123-190), frame reorder/POC (encoder/encoder.c:1444-1457),
B rate control (ratecontrol.c:1419-1452).
"""

import numpy as np
import pytest

from x264_tpu.params import EncoderParams, B_ADAPT_NONE
from x264_tpu.encoder.core import Encoder, Frame

from refdec.decoder import Decoder
from refdec.bits import split_annexb

W, H = 96, 80


def motion_clip(n=5, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 50 * np.sin(yy / 11.0) + 40 * np.cos(xx / 13.0)
            + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, (t, 2 * t), axis=(0, 1))
        u = np.full((H // 2, W // 2), 118, np.uint8)
        v = np.full((H // 2, W // 2), 134, np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode_all(frames, cabac, bframes=1, qp=28, keyint=16):
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      i_log_level=0, i_keyint_max=keyint,
                      i_bframe=bframes, i_scenecut_threshold=0)
    p.i_bframe_adaptive = B_ADAPT_NONE
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    outs = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            outs.append(ef)
    outs += enc.flush()
    enc.close()
    for ef in outs:
        stream += ef.payload
    return stream, outs


@pytest.mark.parametrize("cabac", [False, True])
def test_ibp_structure_and_decode(cabac):
    frames = motion_clip(5)
    stream, outs = encode_all(frames, cabac)
    types = [o.frame_type for o in outs]
    assert types == ["IDR", "P", "B", "P", "B"], types

    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    decoded = dec.frames
    assert len(decoded) == 5
    for i, (d, o) in enumerate(zip(decoded, outs)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(o.recon, pl), np.int64),
                err_msg=f"decode-order frame {i} ({types[i]}) plane "
                        f"{pl} cabac={cabac}")


def test_b_uses_fewer_bits_than_p():
    """B at equal QP must beat IPPP where prediction is hard (bipred
    averages away noise). NB: on trivially-skippable content IPPP still
    wins until B_SKIP/B_DIRECT land (x264's B gains there come from
    direct/skip, common/macroblock.c:223-358 — next on the roadmap)."""
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(yy / 7.0) * np.cos(xx / 9.0)).astype(float)
    frames = []
    for t in range(7):
        y = np.clip(np.roll(base, (t, 2 * t), axis=(0, 1))
                    + rng.normal(0, 12, (H, W)), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 118, np.uint8)
        v = np.full((H // 2, W // 2), 134, np.uint8)
        frames.append(Frame(y, u, v))
    s_bp, _ = encode_all(frames, cabac=True, bframes=1, qp=32)
    s_pp, _ = encode_all(frames, cabac=True, bframes=0, qp=32)
    assert len(s_bp) < len(s_pp), (len(s_bp), len(s_pp))


def test_closed_gop_at_idr():
    """A buffered B candidate is promoted to P when the next frame is
    an IDR (closed GOP — no B references across the IDR)."""
    frames = motion_clip(6)
    p = EncoderParams(i_width=W, i_height=H, b_cabac=True,
                      i_log_level=0, i_keyint_max=4, i_keyint_min=1,
                      i_bframe=1, i_scenecut_threshold=0)
    p.i_bframe_adaptive = B_ADAPT_NONE
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    enc = Encoder(p)
    stream = enc.headers()
    outs = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            outs.append(ef)
    outs += enc.flush()
    enc.close()
    types = [o.frame_type for o in outs]
    # displays 0..5, keyint 4: IDR@0, P/B pair, P@3 closes, IDR@4, ...
    assert types[0] == "IDR"
    assert "B" in types
    assert types.count("IDR") >= 2, types
    # a B never directly precedes an IDR in decode order with open refs:
    # the closed-GOP rule guarantees decodability — prove it end to end
    for o in outs:
        stream += o.payload
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    decoded = dec.frames
    assert len(decoded) == len(outs)
    for i, (d, o) in enumerate(zip(decoded, outs)):
        np.testing.assert_array_equal(
            np.asarray(d.y, np.int64), np.asarray(o.recon.y, np.int64),
            err_msg=f"frame {i} ({types[i]})")


def test_flush_promotes_trailing_b():
    frames = motion_clip(4)   # last frame has no future ref -> P
    stream, outs = encode_all(frames, cabac=False)
    types = [o.frame_type for o in outs]
    assert types == ["IDR", "P", "B", "P"], types


@pytest.mark.parametrize("bframes", [2, 3])
def test_b_runs_decode_bit_exact(bframes):
    """Ib..bP runs (encoder/encoder.c:1444-1457 reorder): encode order
    P-first then its B run in display order; decode must match the
    reconstruction bit-exactly and display indices must cover 0..n-1."""
    n = 9
    frames = motion_clip(n)
    stream, outs = encode_all(frames, cabac=True, bframes=bframes)
    types = [o.frame_type for o in outs]
    assert types[0] == "IDR"
    assert types.count("B") >= bframes, types
    # display-order coverage
    disp = sorted(o.display_idx for o in outs)
    assert disp == list(range(n)), disp

    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(outs)
    # decoder emits in decode order == outs order
    for i, (d, o) in enumerate(zip(dec.frames, outs)):
        np.testing.assert_array_equal(
            np.asarray(d.y, np.int64), np.asarray(o.recon.y, np.int64),
            err_msg=f"frame {i} ({o.frame_type})")


def test_b_run_closed_gop_at_idr():
    """A forced IDR mid-run promotes the newest queued candidate to P
    and drains the earlier ones as its B run (closing-GOP demotion,
    slicetype.c:597-635)."""
    frames = motion_clip(8)
    p = EncoderParams(i_width=W, i_height=H, b_cabac=True,
                      i_log_level=0, i_keyint_max=16, i_bframe=3,
                      i_scenecut_threshold=0)
    p.i_bframe_adaptive = B_ADAPT_NONE
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 28
    enc = Encoder(p)
    stream = enc.headers()
    outs = []
    for i, f in enumerate(frames):
        ef = enc.encode(f, forced_type="IDR" if i == 5 else None)
        if ef is not None:
            outs.append(ef)
    outs += enc.flush()
    for ef in outs:
        stream += ef.payload
    types = [o.frame_type for o in outs]
    assert types.count("IDR") == 2, types
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(outs)
    for i, (d, o) in enumerate(zip(dec.frames, outs)):
        np.testing.assert_array_equal(
            np.asarray(d.y, np.int64), np.asarray(o.recon.y, np.int64),
            err_msg=f"frame {i} ({o.frame_type})")
