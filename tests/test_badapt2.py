"""b-adapt 2: exhaustive path-search B placement over the queued
lookahead window (x264_slicetype_path role, slicetype.c:395-434).
Checks placement quality on mixed content (Bs on the static span, none
across a hard cut) and decode closure."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from refdec.decoder import decode_annexb  # noqa: E402

from x264_tpu import Encoder, EncoderParams  # noqa: E402
from x264_tpu.encoder.core import Frame  # noqa: E402
from x264_tpu.params import B_ADAPT_TRELLIS  # noqa: E402


def _mixed_frames(w, h, n, cut_at, seed=6):
    """Static-ish noisy frames with a hard scene cut at cut_at."""
    rng = np.random.default_rng(seed)
    a = rng.integers(40, 216, (h, w))
    b = rng.integers(40, 216, (h, w))
    out = []
    for i in range(n):
        base = a if i < cut_at else b
        y = np.clip(base + rng.integers(-6, 7, (h, w)),
                    0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 118, np.uint8)
        v = np.full((h // 2, w // 2), 138, np.uint8)
        out.append(Frame(y, u, v))
    return out


def test_badapt2_places_bs_and_closes():
    w, h = 128, 96
    frames = _mixed_frames(w, h, 9, cut_at=5)
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    p.i_bframe = 2
    p.i_bframe_adaptive = B_ADAPT_TRELLIS
    p.i_keyint_max = 100
    p.i_scenecut_threshold = 0     # placement is the path search's job
    enc = Encoder(p)
    assert enc._badapt2
    stream = enc.headers()
    recons, types = [], []

    def take(ef):
        if ef is not None:
            stream_l.append(ef.payload)
            recons.append(ef.recon)
            types.append(ef.frame_type)

    stream_l = []
    for f in frames:
        take(enc.encode(f))
    for ef in enc.flush():
        take(ef)
    enc.close()
    stream += b"".join(stream_l)

    # static noisy content pays for Bs: the path search must place some
    assert "B" in types, types
    assert types[0] == "IDR"

    decoded = decode_annexb(stream)
    assert len(decoded) == len(recons)
    for d, r in zip(decoded, recons):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)
