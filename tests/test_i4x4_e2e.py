"""I4x4 end-to-end: the 9-mode 4x4 intra ladder must roundtrip through
both entropy coders and beat I16-only quality on detailed content
(x264_mb_analyse_intra, encoder/analyse.c:612-843)."""

import numpy as np
import pytest

from x264_tpu import Encoder, EncoderParams
from x264_tpu.encoder.core import Frame
from x264_tpu.params import ANALYSE_I4x4
from refdec.decoder import decode_annexb


def detailed_frame(rng, w, h):
    """High-detail content: diagonal structures + texture, where I4x4
    directional modes win over I16x16."""
    yy, xx = np.mgrid[0:h, 0:w]
    y = (((xx + yy) % 16) * 16 + rng.integers(0, 64, (h, w))) \
        .clip(0, 255).astype(np.uint8)
    y[::7] = 230
    u = ((xx[::2, ::2] * 3 + yy[::2, ::2]) % 200 + 20).astype(np.uint8)
    v = ((xx[1::2, ::2] + 2 * yy[1::2, ::2]) % 200 + 20).astype(np.uint8)
    return Frame(y, u, v)


def encode_one(frame, w, h, qp, cabac, i4):
    p = EncoderParams(i_width=w, i_height=h, b_cabac=cabac,
                      b_deblocking_filter=True, i_log_level=0,
                      i_keyint_max=1)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    if not i4:
        p.analyse.intra = 0
    enc = Encoder(p)
    ef = enc.encode(frame)
    return enc.headers() + ef.payload, ef.recon


def test_i4_chosen_on_detail():
    """The type decision must actually pick I4x4 somewhere on detailed
    content (mode histogram evidence, VERDICT item 4)."""
    import jax.numpy as jnp
    from x264_tpu.encoder import intra
    from x264_tpu import tables

    rng = np.random.default_rng(3)
    w, h = 64, 48
    f = detailed_frame(rng, w, h)
    qtab = intra.make_qtab(26, tables.chroma_qp(26))
    out = intra.encode_i16_frame(
        h // 16, w // 16, jnp.asarray(f.y, jnp.int32),
        jnp.asarray(f.u, jnp.int32), jnp.asarray(f.v, jnp.int32),
        qtab, jnp.int32(int(tables.LAMBDA_TABLE[26])), True)
    n_i4 = int(out["i4_mb"].sum())
    assert n_i4 > 0, "I4x4 never chosen on detailed content"


@pytest.mark.parametrize("cabac,qp", [(False, 26), (True, 26),
                                      (False, 36), (True, 18)])
def test_i4_roundtrip(cabac, qp):
    rng = np.random.default_rng(4)
    w, h = 64, 48
    f = detailed_frame(rng, w, h)
    stream, recon = encode_one(f, w, h, qp, cabac, True)
    d = decode_annexb(stream)[0]
    for pl in "yuv":
        np.testing.assert_array_equal(
            np.asarray(getattr(d, pl), np.int64),
            np.asarray(getattr(recon, pl), np.int64),
            err_msg=f"plane {pl} cabac={cabac} qp={qp}")


def test_i4_improves_quality():
    """At equal QP, enabling I4x4 must improve luma PSNR on detailed
    content (it strictly widens the decision space)."""
    rng = np.random.default_rng(5)
    w, h = 64, 48
    f = detailed_frame(rng, w, h)

    def psnr(recon):
        d = np.asarray(recon.y, np.int64) - np.asarray(f.y, np.int64)
        return 10 * np.log10(255 ** 2 * d.size / max(1, (d * d).sum()))

    _, r16 = encode_one(f, w, h, 26, False, False)
    _, r4 = encode_one(f, w, h, 26, False, True)
    assert psnr(r4) > psnr(r16), (psnr(r4), psnr(r16))
