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
    """Consistent true motion with a fractional phase: the whole scene
    pans 0.5 luma px/frame horizontally (mv_x = 2 qpel — within the
    +-1-qpel chroma re-rank window of the luma winner). Luma is weak
    and noisy so its sub-pel refine errs by +-1 qpel; chroma is strong
    and smooth so the chroma term disambiguates. (Analytic sinusoids
    give exact fractional shifts without resampling.)"""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    yc, xc = np.mgrid[0:h // 2, 0:w // 2]
    out = []
    for t in range(n):
        sh = 0.5 * t  # luma px
        y = (128 + 5 * np.sin(2 * np.pi * (xx + sh) / 7.3)
             + 4 * np.sin(2 * np.pi * yy / 11.0)
             + rng.normal(0, 3, (h, w)))
        u = (128 + 90 * np.sin(2 * np.pi * (xc + sh / 2) / 5.1)
             + 20 * np.sin(2 * np.pi * yc / 6.7))
        v = (128 + 90 * np.cos(2 * np.pi * (xc + sh / 2) / 4.3)
             + 20 * np.cos(2 * np.pi * yc / 8.1))
        out.append(Frame(np.clip(y, 0, 255).astype(np.uint8),
                         np.clip(u, 0, 255).astype(np.uint8),
                         np.clip(v, 0, 255).astype(np.uint8)))
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
    ssd = 0
    for f, r in zip(frames, recons):
        for pl in ("y", "u", "v"):
            d = (np.asarray(getattr(f, pl), np.int64)
                 - np.asarray(getattr(r, pl), np.int64))
            ssd += int((d * d).sum())
    return stream, recons, ssd


def test_chroma_me_improves_rd_and_closes():
    w, h = 128, 96
    qp = 26
    frames = _frames(w, h, 4)
    s_on, r_on, ssd_on = _run(frames, w, h, True)
    s_off, _, ssd_off = _run(frames, w, h, False)

    # the chroma term must actually change decisions on this content
    assert s_on != s_off
    # and the joint RD cost (what the term optimizes: x264 adds the
    # chroma SATD into the same satd + lambda*bits objective) must
    # improve — lambda2 = (0.85 * 2^((qp-12)/3))^2, x264_lambda2_tab
    lam2 = (0.85 * 2 ** ((qp - 12) / 3.0)) ** 2
    rd_on = ssd_on + lam2 * 8 * len(s_on)
    rd_off = ssd_off + lam2 * 8 * len(s_off)
    assert rd_on < rd_off, (ssd_on, len(s_on), ssd_off, len(s_off))

    decoded = decode_annexb(s_on)
    assert len(decoded) == len(r_on)
    for d, r in zip(decoded, r_on):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)
