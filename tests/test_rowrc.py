"""Row-level VBV rate control (the x264_ratecontrol_mb role,
encoder/ratecontrol.c:922-1006, planned pre-encode over the per-MB-QP
machinery): under buffer pressure later MB rows ramp QP up, shrinking
frames that would overflow — with decode closure (the row profile rides
the mb_qp_delta syntax)."""

import numpy as np

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import decode_annexb

W, H = 80, 96


def hard_frames(n, seed=13):
    """Easy lead-in then a hard complexity spike: the regime where a
    small VBV buffer forces intra-frame QP adaptation (the frame QP is
    still mid-range, so row offsets have headroom)."""
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(H) * 5, np.arange(W) * 3) % 256) \
        .astype(np.int32)
    out = []
    for t in range(n):
        if t < 2:       # easy: smooth pan
            y = np.roll(base, 3 * t, 1).astype(np.uint8)
        else:           # spike: heavy noise
            y = np.clip(np.roll(base, 3 * t, 1)
                        + rng.integers(-60, 61, (H, W)), 0, 255) \
                .astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 90, np.uint8)
        out.append(Frame(y, u, v))
    return out


def encode(frames, rowrc=True):
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0,
                      i_scenecut_threshold=0)
    from x264_tpu.params import RC_ABR
    p.rc.i_rc_method = RC_ABR
    p.rc.i_bitrate = 300
    p.rc.i_vbv_max_bitrate = 300
    p.rc.i_vbv_buffer_size = 30       # ~2.5 frame budgets
    p.analyse.i_subpel_refine = 5
    enc = Encoder(p)
    enc._rowrc = rowrc
    stream = enc.headers()
    outs = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            outs.append(ef)
    for ef in enc.flush():
        stream += ef.payload
        outs.append(ef)
    return stream, outs


def test_row_offsets_shape_and_gate():
    from x264_tpu.encoder.ratecontrol import RateControl
    p = EncoderParams(i_width=W, i_height=H)
    p.rc.i_vbv_max_bitrate = 100
    p.rc.i_vbv_buffer_size = 50
    p.validate()
    rc = RateControl(p)
    rc.last_satd = 5e5
    rc.pred["P"].update(1e6, 10.0, 5e5)   # teach: frames are huge
    off = rc.row_qp_offsets("P", 26, H // 16)
    assert off is not None and off.shape == (H // 16,)
    assert off[0] == 0 and off[-1] >= 1    # monotone ramp
    assert np.all(np.diff(off) >= 0)
    # no VBV -> flat
    p2 = EncoderParams(i_width=W, i_height=H).validate()
    assert RateControl(p2).row_qp_offsets("P", 26, 6) is None


def test_rowrc_caps_frames_and_closes():
    frames = hard_frames(5)
    s_on, o_on = encode(frames, rowrc=True)
    s_off, o_off = encode(frames, rowrc=False)
    # P frames under pressure must shrink vs the frame-level-only run
    p_on = [o.bits for o in o_on if o.frame_type == "P"]
    p_off = [o.bits for o in o_off if o.frame_type == "P"]
    assert sum(p_on) < sum(p_off), (p_on, p_off)
    decoded = decode_annexb(s_on)
    assert len(decoded) == len(o_on)
    for i, (d, o) in enumerate(zip(decoded, o_on)):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(o.recon, pl), np.int64),
                err_msg=f"frame {i} plane {pl}")
