"""Multi-reference P frames (--ref 2): per-MB L0 reference choice,
ref_idx_l0 syntax in CAVLC and CABAC, slice-header active-count
override after IDR (x264_mb_analyse_inter_p16x16 i_ref loop,
encoder/analyse.c:1100-1140; x264_cabac_mb_ref, encoder/cabac.c:228).

The flash sequence alternates an overlay between two patterns, so the
two-frames-back reference matches the overlay region exactly while the
previous frame does not — the canonical case multi-ref wins.
"""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from refdec.decoder import Decoder
from refdec.bits import split_annexb

W, H = 96, 80


def flash_sequence(n, seed=0):
    """Static textured base + an overlay band alternating between two
    noise patterns each frame (period 2)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (H, W)).astype(np.uint8)
    pat = [rng.integers(0, 255, (32, W)).astype(np.uint8) for _ in range(2)]
    frames = []
    for t in range(n):
        y = base.copy()
        y[32:64] = pat[t % 2]
        u = ((y[::2, ::2].astype(int) + 30) % 250).astype(np.uint8)
        v = ((255 - y[1::2, ::2].astype(int)) % 250).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode_stream(frames, cabac, ref=2, qp=26, bframes=0):
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      b_deblocking_filter=True, i_log_level=0,
                      i_keyint_max=250, i_bframe=bframes)
    p.i_frame_reference = ref
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    recons, types, bits = [], [], 0
    outs = [enc.encode(f) for f in frames] + list(enc.flush())
    for ef in outs:
        if ef is None:
            continue
        stream += ef.payload
        recons.append((ef.display_idx, ef.recon))
        types.append(ef.frame_type)
        bits += ef.bits
    return stream, recons, types, bits


def decode_all(stream):
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    return dec


@pytest.mark.parametrize("cabac", [False, True])
def test_multiref_roundtrip_and_selection(cabac):
    frames = flash_sequence(5)
    stream, recons, types, _ = encode_stream(frames, cabac)
    assert types == ["IDR", "P", "P", "P", "P"]

    dec = decode_all(stream)
    assert len(dec.frames) == 5
    for i, (d, (_, r)) in enumerate(zip(dec.frames, recons)):
        for plane in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, plane), np.int64),
                np.asarray(getattr(r, plane), np.int64),
                err_msg=f"frame {i} ({types[i]}) plane {plane} "
                f"cabac={cabac}")

    # the last P's overlay band must have picked L0[1]; the static
    # background stays on L0[0] (skip implies ref 0)
    ref_f = dec.last_pic["ref_f"]
    band = ref_f[8:16]            # 4x4-block rows of pixel rows 32..64
    assert (band == 1).any(), "no MB selected the older reference"
    outside = np.concatenate([ref_f[:7], ref_f[17:]])
    inter_outside = outside[outside >= 0]
    assert (inter_outside == 0).all()


def test_multiref_saves_bits():
    """On flash content ref=2 must code the overlay via the matching
    older reference instead of intra/heavy residual."""
    frames = flash_sequence(5)
    _, _, _, bits2 = encode_stream(frames, cabac=False, ref=2)
    _, _, _, bits1 = encode_stream(frames, cabac=False, ref=1)
    assert bits2 < bits1 * 0.8, (bits2, bits1)


def test_multiref_with_bframes_roundtrip():
    """--ref 2 --bframes 1: B slices override the active count back to
    1 ref per list while P uses 2."""
    frames = flash_sequence(6, seed=1)
    stream, recons, types, _ = encode_stream(frames, cabac=True,
                                             bframes=1)
    assert "B" in types
    dec = decode_all(stream)
    assert len(dec.frames) == 6
    # dec.frames and recons are both in decode order
    for i, (d, (_, r)) in enumerate(zip(dec.frames, recons)):
        np.testing.assert_array_equal(
            np.asarray(d.y, np.int64), np.asarray(r.y, np.int64),
            err_msg=f"decode-order frame {i} ({types[i]})")


def test_ref_clamp_logged():
    """--ref > 2 clamps to 2 (x264_validate_parameters contract)."""
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0)
    p.i_frame_reference = 5
    p.validate()
    assert p.i_frame_reference == 2
