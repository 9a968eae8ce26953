"""I8x8 intra (High profile) end-to-end: encode IDR frames with the
I8x8 ladder enabled, require the reference decoder to reproduce the
encoder's reconstruction bit-exactly, and require I_8x8 MBs to actually
be selected (common/predict.c:499-751 + encoder/analyse.c i8x8 ladder
parity)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from refdec.decoder import decode_annexb  # noqa: E402

from x264_tpu import Encoder, EncoderParams  # noqa: E402
from x264_tpu.encoder.core import Frame  # noqa: E402
from x264_tpu.params import ANALYSE_I4x4, ANALYSE_I8x8  # noqa: E402


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        # directional gradients + low-frequency noise: detail enough to
        # beat I16, smooth enough that 8x8 beats 4x4 on signalling
        base = ((yy * 2 + xx * 3 + 7 * i) // 2) % 256
        low = rng.integers(-20, 20, (h // 8 + 1, w // 8 + 1))
        noise = np.kron(low, np.ones((8, 8)))[:h, :w]
        y = np.clip(base + noise, 0, 255).astype(np.uint8)
        u = np.clip(128 + (xx[::2, ::2] // 4) + rng.integers(-4, 4),
                    0, 255).astype(np.uint8)
        v = np.clip(128 - (yy[::2, ::2] // 4) + rng.integers(-4, 4),
                    0, 255).astype(np.uint8)
        out.append(Frame(y, u, v))
    return out


def _encode(p, frames):
    enc = Encoder(p)
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
    return stream, recons


def _assert_closure(stream, recons):
    decoded = decode_annexb(stream)
    assert len(decoded) == len(recons)
    for d, r in zip(decoded, recons):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)


def _base_params(w=128, h=96):
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 1            # all-IDR: exercise the I8x8 path hard
    return p


def test_i8x8_only_ladder_closure():
    """intra = I8x8 (no I4x4): every non-I16 MB is I_8x8."""
    p = _base_params()
    p.analyse.intra = ANALYSE_I8x8
    frames = _frames(128, 96, 2)
    stream, recons = _encode(p, frames)
    enc = Encoder(p)
    assert enc._i8x8 and not enc._i4x4
    _assert_closure(stream, recons)


def test_i8x8_full_ladder_selects_and_closes():
    """Default-style ladder (I16 + I4x4 + I8x8): closure plus at least
    one I_8x8 MB chosen on 8x8-friendly content."""
    from x264_tpu.encoder import pipeline as epipe
    p = _base_params()
    p.analyse.intra = ANALYSE_I4x4 | ANALYSE_I8x8
    frames = _frames(128, 96, 2)
    stream, recons = _encode(p, frames)
    _assert_closure(stream, recons)

    # count t8 MBs via the pipeline directly (same inputs)
    from x264_tpu.encoder import intra as eintra
    from x264_tpu import tables
    import jax.numpy as jnp
    qp = 26
    qtab = eintra.make_qtab(qp, tables.chroma_qp(qp, 0))
    out = eintra.encode_i16_frame(
        96 // 16, 128 // 16,
        jnp.asarray(frames[0].y, jnp.int32),
        jnp.asarray(frames[0].u, jnp.int32),
        jnp.asarray(frames[0].v, jnp.int32),
        qtab, int(tables.LAMBDA_TABLE[qp]), True, False, True)
    assert int(np.asarray(out["t8_mb"]).sum()) > 0


def test_i8x8_with_aq_closure():
    """I8x8 composes with variance AQ (per-MB QP rows feed the 8x8
    quant tables via aq.qtab_rows)."""
    p = _base_params()
    p.rc.i_rc_method = 1          # CRF so AQ stays on
    p.rc.f_rf_constant = 26.0
    p.rc.i_aq_mode = 1
    p.analyse.intra = ANALYSE_I4x4 | ANALYSE_I8x8
    frames = _frames(128, 96, 2, seed=9)
    stream, recons = _encode(p, frames)
    _assert_closure(stream, recons)
