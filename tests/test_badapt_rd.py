"""Adaptive B placement (b-adapt-1 greedy over device lowres costs,
slicetype.c:545-573), lowres-seeded B ME, and the subme>=6 RD-cost
mode-decision ladder (x264_rd_cost_mb semantics)."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb

W, H = 80, 64


def pan_frames(n, cut_at=None, seed=11):
    """Smooth pan over texture + independent per-frame sensor noise
    (the regime where bi-prediction averaging makes Bs pay); an
    optional hard content cut."""
    rng = np.random.default_rng(seed)
    big = (rng.integers(0, 255, (H + 64, W + 4 * n + 64))).astype(np.uint8)
    big2 = (rng.integers(0, 255, (H + 64, W + 4 * n + 64))).astype(np.uint8)
    frames = []
    for t in range(n):
        src = big2 if (cut_at is not None and t >= cut_at) else big
        y = np.asarray(src[16:16 + H, 4 * t:4 * t + W]).astype(np.int32)
        y = np.clip(y + rng.integers(-10, 11, (H, W)), 0, 255) \
            .astype(np.uint8)
        u = ((y[::2, ::2].astype(int) + 40) % 250).astype(np.uint8)
        v = ((y[1::2, ::2].astype(int) + 90) % 250).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode_all(frames, badapt=True, bframes=2, qp=30, subme=6):
    from x264_tpu.params import B_ADAPT_FAST, B_ADAPT_NONE
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0,
                      i_keyint_max=50, i_bframe=bframes,
                      i_scenecut_threshold=0)
    p.i_bframe_adaptive = B_ADAPT_FAST if badapt else B_ADAPT_NONE
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    p.analyse.i_subpel_refine = subme
    enc = Encoder(p)
    stream = enc.headers()
    outs = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            outs.append(ef)
            stream += ef.payload
    for ef in enc.flush():
        outs.append(ef)
        stream += ef.payload
    return stream, outs


def _assert_closure(stream, outs):
    decoded = decode_annexb(stream)
    assert len(decoded) == len(outs)
    for i, (d, o) in enumerate(zip(decoded, outs)):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(o.recon, pl), np.int64),
                err_msg=f"frame {i} ({o.frame_type}) plane {pl}")


def test_badapt_uses_bs_on_pan_and_closes():
    stream, outs = encode_all(pan_frames(7), badapt=True)
    types = [o.frame_type for o in outs]
    assert types[0] == "IDR"
    assert "B" in types, types   # smooth pan: the greedy should pay Bs
    _assert_closure(stream, outs)


def test_badapt_no_b_across_cut():
    # hard content cut at frame 3: predicting across it is hopeless,
    # so the greedy must not keep extending a B run over the cut
    stream, outs = encode_all(pan_frames(7, cut_at=3), badapt=True)
    # map decode order back to display order
    disp = sorted(outs, key=lambda o: o.display_idx)
    t_at_cut = disp[3].frame_type
    assert t_at_cut in ("P", "IDR"), \
        [f"{o.display_idx}:{o.frame_type}" for o in disp]
    _assert_closure(stream, outs)


def test_rd_ladder_changes_stream_and_closes():
    frames = pan_frames(5)
    s5, o5 = encode_all(frames, badapt=False, bframes=0, subme=5)
    s7, o7 = encode_all(frames, badapt=False, bframes=0, subme=7)
    assert s5 != s7          # subme 5 vs 7 must differ now (RD ladder)
    _assert_closure(s7, o7)
    _assert_closure(s5, o5)


def test_psy_rd_changes_stream():
    frames = pan_frames(4)
    from x264_tpu.params import B_ADAPT_NONE

    def enc(psy):
        p = EncoderParams(i_width=W, i_height=H, i_log_level=0,
                          i_bframe=0, i_scenecut_threshold=0)
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = 33
        p.analyse.i_subpel_refine = 7
        p.analyse.f_psy_rd = psy
        e = Encoder(p)
        s = e.headers()
        outs = []
        for f in frames:
            ef = e.encode(f)
            if ef is not None:
                s += ef.payload
                outs.append(ef)
        for ef in e.flush():
            s += ef.payload
            outs.append(ef)
        return s, outs

    s_on, o_on = enc(1.0)
    s_off, _ = enc(0.0)
    assert s_on != s_off
    _assert_closure(s_on, o_on)
