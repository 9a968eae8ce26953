"""Chroma ME (b_chroma_me, refine_subpel chroma term,
encoder/me.c:61-66): with chroma-rich content the chroma-aware re-rank
must change motion choices, reduce chroma distortion at similar rate,
and keep decode closure."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from refdec.decoder import decode_annexb  # noqa: E402

from x264_tpu import Encoder, EncoderParams  # noqa: E402
from x264_tpu.encoder.core import Frame  # noqa: E402


def _frames(w, h, n, seed=8):
    """Luma nearly flat, chroma strongly textured and panning: the
    luma-only search is indifferent among qpel candidates while chroma
    prefers the true motion."""
    rng = np.random.default_rng(seed)
    cu = rng.integers(0, 255, (h // 2 + 16, w // 2 + 16))
    cv = rng.integers(0, 255, (h // 2 + 16, w // 2 + 16))
    ybase = rng.integers(118, 138, (h + 16, w + 16))
    out = []
    for i in range(n):
        y = ybase[i:i + h, i:i + w].astype(np.uint8)
        u = cu[i:i + h // 2, i:i + w // 2].astype(np.uint8)
        v = cv[i:i + h // 2, i:i + w // 2].astype(np.uint8)
        out.append(Frame(y, u, v))
    return out


def _run(frames, w, h, chroma_me):
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    p.analyse.b_chroma_me = chroma_me
    enc = Encoder(p)
    assert enc._chroma_me == chroma_me
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)
    enc.close()
    ssd_c = 0
    for f, r in zip(frames, recons):
        for pl in ("u", "v"):
            d = (np.asarray(getattr(f, pl), np.int64)
                 - np.asarray(getattr(r, pl), np.int64))
            ssd_c += int((d * d).sum())
    return stream, recons, ssd_c


def test_chroma_me_improves_chroma_and_closes():
    w, h = 128, 96
    frames = _frames(w, h, 4)
    s_on, r_on, ssd_on = _run(frames, w, h, True)
    s_off, _, ssd_off = _run(frames, w, h, False)

    # the chroma term must actually change decisions on this content
    assert s_on != s_off
    # and chroma reconstruction error must not get worse
    assert ssd_on <= ssd_off, (ssd_on, ssd_off)

    decoded = decode_annexb(s_on)
    assert len(decoded) == len(r_on)
    for d, r in zip(decoded, r_on):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)
