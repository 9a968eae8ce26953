"""Noise reduction (--nr): the adaptive coefficient shrinkage of
x264_denoise_dct (common/quant.c:180) + x264_noise_reduction_update
(encoder/macroblock.c:890). Checks the denoise kernel against a scalar
model, that offsets adapt over frames and P-frame bits drop on noisy
content, and that decode closure holds (NR is pre-quant: the decoder
needs no knowledge of it)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from refdec.decoder import decode_annexb  # noqa: E402

from x264_tpu import Encoder, EncoderParams  # noqa: E402
from x264_tpu.encoder.core import Frame  # noqa: E402
from x264_tpu.ops import quant as oq  # noqa: E402


def test_denoise_kernel_vs_scalar():
    rng = np.random.default_rng(0)
    coef = rng.integers(-500, 500, (7, 3, 16))
    off = rng.integers(0, 60, 16)
    got, sums = oq.denoise(jnp.asarray(coef), jnp.asarray(off))
    got = np.asarray(got)
    want = coef.copy()
    wsum = np.zeros(16)
    for b in range(7):
        for k in range(3):
            for i in range(1, 16):     # x264's loop starts at i=1
                lv = abs(int(coef[b, k, i]))
                wsum[i] += lv
                lv = max(lv - int(off[i]), 0)
                want[b, k, i] = lv if coef[b, k, i] >= 0 else -lv
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(np.asarray(sums), wsum, rtol=1e-6)


def _noisy_frames(w, h, n, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 196, (h, w))
    out = []
    for _ in range(n):
        y = np.clip(base + rng.integers(-14, 15, (h, w)),
                    0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        out.append(Frame(y, u, v))
    return out


def test_nr_adapts_saves_bits_and_closes():
    w, h = 128, 96
    frames = _noisy_frames(w, h, 5)

    def run(nr):
        p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = 24
        p.i_keyint_max = 50
        p.analyse.i_noise_reduction = nr
        enc = Encoder(p)
        stream = enc.headers()
        recons, pbits = [], 0
        for f in frames:
            ef = enc.encode(f)
            if ef is not None:
                stream += ef.payload
                recons.append(ef.recon)
                if ef.frame_type == "P":
                    pbits += ef.bits
        for ef in enc.flush():
            stream += ef.payload
            recons.append(ef.recon)
        off4 = enc._nr_off[0].copy() if enc._nr else None
        enc.close()
        return stream, recons, pbits, off4

    s_nr, r_nr, bits_nr, off4 = run(1200)
    _, _, bits_plain, _ = run(0)

    # offsets adapted away from zero after the P frames
    assert off4 is not None and off4[1:].max() > 0
    # static noisy content: shrinking noise coefficients saves P bits
    assert bits_nr < bits_plain
    # decoder closure (NR changes coefficients, not syntax)
    decoded = decode_annexb(s_nr)
    assert len(decoded) == len(r_nr)
    for d, r in zip(decoded, r_nr):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)
