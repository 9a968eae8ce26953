"""Rate-control behavior tests (encoder/ratecontrol.c analogue).

Contract tested (not bit parity — the reference publishes no RC
vectors): CRF bits decrease monotonically with crf; ABR converges to
the requested bitrate within tolerance; VBV caps frame sizes; the
2-pass stats file round-trips; scenecut fires on a cut and not on a
pan; CQP remains byte-stable.
"""

import os

import numpy as np
import pytest

from x264_tpu.params import EncoderParams, RC_CQP, RC_CRF, RC_ABR
from x264_tpu.encoder import ratecontrol as rcmod
from x264_tpu.encoder.core import Encoder, Frame


W, H, NF = 128, 96, 12


def make_clip(w=W, h=H, n=NF, cut_at=None, seed=0):
    """Panning textured clip; optional hard scene change at `cut_at`."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    tex2 = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    frames = []
    for t in range(n):
        src = tex2 if (cut_at is not None and t >= cut_at) else tex
        y = ((src[t:t + h, 2 * t:2 * t + w] + xx // 4) % 255) \
            .astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode_bits(params, frames):
    enc = Encoder(params)
    sizes, qps, types = [], [], []
    for f in frames:
        out = enc.encode(f)
        sizes.append(len(out.payload))
        types.append(out.frame_type)
        qps.append(enc.rc.last_qp)
    enc.close()
    return sizes, qps, types, enc


def base_params(**kw):
    p = EncoderParams(i_width=W, i_height=H, b_cabac=False,
                      i_log_level=0, i_keyint_max=6, i_keyint_min=2,
                      **kw)
    return p


# ------------------------------------------------------------------ unit
def test_qscale_roundtrip():
    for qp in (0, 10, 26, 40, 51):
        assert abs(rcmod.qscale2qp(rcmod.qp2qscale(qp)) - qp) < 1e-9


def test_predictor_converges():
    pred = rcmod.Predictor()
    # feed a consistent bits = 2.0 * satd / qscale relation
    for _ in range(20):
        pred.update(bits=2.0 * 1000 / 5.0, qscale=5.0, satd=1000)
    assert abs(pred.predict(5.0, 1000) - 400) / 400 < 0.05


def test_stats_file_roundtrip(tmp_path):
    path = str(tmp_path / "st.log")
    p = base_params()
    p.rc.i_rc_method = RC_CRF
    p.rc.b_stat_write = True
    p.rc.psz_stat_out = path
    frames = make_clip()
    _, qps, types, enc = encode_bits(p, frames)
    assert os.path.exists(path)
    entries = rcmod.read_stats(path)
    assert len(entries) == NF
    assert [e.frame_type for e in entries] == \
        ["I" if t == "IDR" else t for t in types]
    assert [int(e.qp) for e in entries] == qps


def test_init_pass2_hits_target():
    # synthetic pass-1: constant complexity, qp 30, 1000 tex bits
    entries = [rcmod.RateControlEntry("P", tex_bits=1000, misc_bits=50,
                                      qp=30, cplx=5000.0)
               for _ in range(100)]
    # ask for 2x the pass-1 rate -> new qp must drop, predicted total
    # must land on target
    rcmod.init_pass2(entries, bits_per_frame=2100.0, qcomp=0.6,
                     qp_min=10, qp_max=51)
    q1 = rcmod.qp2qscale(30)
    tot = sum(e.tex_bits * q1 / rcmod.qp2qscale(e.new_qp) + e.misc_bits
              for e in entries)
    assert abs(tot - 210000) / 210000 < 0.05
    assert all(e.new_qp < 30 for e in entries)


def test_scenecut_detection():
    p = base_params()
    rc = rcmod.RateControl(p)
    frames = make_clip(cut_at=6)
    cuts = []
    for i, f in enumerate(frames):
        if rc.analyse_frame(np.asarray(f.y))["scenecut"]:
            cuts.append(i)
    assert 6 in cuts
    # the smooth pan before the cut must not fire
    assert not any(c in (2, 3, 4, 5) for c in cuts)


# ------------------------------------------------------------------ e2e
def test_crf_monotonic():
    frames = make_clip()
    totals = []
    for crf in (18.0, 28.0, 38.0):
        p = base_params()
        p.rc.i_rc_method = RC_CRF
        p.rc.f_rf_constant = crf
        sizes, qps, _, _ = encode_bits(p, frames)
        totals.append(sum(sizes))
        assert all(10 <= q <= 51 for q in qps)
    assert totals[0] > totals[1] > totals[2]


def test_abr_hits_bitrate():
    frames = make_clip(n=24)
    target_kbps = 400
    p = base_params()
    p.i_fps_num, p.i_fps_den = 25, 1
    p.rc.i_rc_method = RC_ABR
    p.rc.i_bitrate = target_kbps
    sizes, qps, _, _ = encode_bits(p, frames)
    got_kbps = sum(sizes) * 8 * 25 / len(frames) / 1000
    assert 0.5 * target_kbps < got_kbps < 2.0 * target_kbps, got_kbps


def test_abr_requires_bitrate():
    p = base_params()
    p.rc.i_rc_method = RC_ABR
    p.rc.i_bitrate = 0
    with pytest.raises(ValueError):
        Encoder(p)


def test_vbv_caps_frames():
    frames = make_clip(n=12)
    p = base_params()
    p.i_fps_num = 25
    p.rc.i_rc_method = RC_ABR
    p.rc.i_bitrate = 300
    p.rc.i_vbv_max_bitrate = 300
    p.rc.i_vbv_buffer_size = 150   # half a second of buffer
    sizes, qps, _, enc = encode_bits(p, frames)
    assert enc.rc.vbv
    # after warmup the predictor must keep P frames near buffer rate
    late_p = [s * 8 for s in sizes[7:]]
    assert max(late_p) < 4 * (300_000 / 25)


def test_two_pass_flow(tmp_path):
    path = str(tmp_path / "2p.log")
    frames = make_clip(n=12)
    # pass 1: CRF with stats out
    p1 = base_params()
    p1.rc.i_rc_method = RC_CRF
    p1.rc.b_stat_write = True
    p1.rc.psz_stat_out = path
    encode_bits(p1, frames)
    # pass 2: ABR replay at a chosen target
    p2 = base_params()
    p2.i_fps_num = 25
    p2.rc.i_rc_method = RC_ABR
    p2.rc.i_bitrate = 500
    p2.rc.b_stat_read = True
    p2.rc.psz_stat_in = path
    sizes, qps, _, _ = encode_bits(p2, frames)
    got_kbps = sum(sizes) * 8 * 25 / len(frames) / 1000
    assert 0.4 * 500 < got_kbps < 2.5 * 500, got_kbps


def test_cqp_unchanged_by_rc():
    """CQP must stay flat-QP and deterministic (regression lock)."""
    frames = make_clip(n=4)
    p = base_params()
    p.rc.i_rc_method = RC_CQP
    p.rc.i_qp_constant = 26
    s1, q1, _, _ = encode_bits(p, frames)
    p2 = base_params()
    p2.rc.i_rc_method = RC_CQP
    p2.rc.i_qp_constant = 26
    s2, q2, _, _ = encode_bits(p2, frames)
    assert s1 == s2 and q1 == q2
    assert all(q == 26 for q in q1)


def test_zone_bitrate_factor_no_ratchet():
    """A b=F zone must apply a one-time qscale scale per frame, not a
    compounding per-frame QP shift (advisor finding r2; x264 zones scale
    the rate factor once, ratecontrol.c:1186-1194)."""
    frames = make_clip(n=12)
    p = base_params()
    p.rc.i_rc_method = RC_CRF
    enc = Encoder(p)
    enc.rc.zones = [(4, 9, "b", 2.0)]
    qps = []
    for f in frames:
        enc.encode(f)
        qps.append(enc.rc.last_qp)
    enc.close()
    in_zone = qps[5:9]
    # inside the zone QP drops by ~6*log2(2)=6 and stays flat: it must
    # not walk monotonically toward qp_min
    assert max(in_zone) - min(in_zone) <= 3, qps
    assert min(in_zone) > p.rc.i_qp_min, qps
    # and the zone must actually lower QP vs the surrounding frames
    assert np.mean(in_zone) < np.mean([qps[2], qps[3]]), qps


def test_zone_force_qp():
    frames = make_clip(n=8)
    p = base_params()
    p.rc.i_rc_method = RC_CRF
    enc = Encoder(p)
    enc.rc.zones = [(2, 4, "q", 33)]
    qps = []
    for f in frames:
        enc.encode(f)
        qps.append(enc.rc.last_qp)
    enc.close()
    assert qps[2] == qps[3] == qps[4] == 33, qps
    assert qps[6] != 33 or qps[7] != 33
