"""Custom quantization matrices: JM-file parsing (common/set.c:244
parity), PPS scaling-list round-trip (spec 7.3.2.1.1.1), and full
encode + decode closure under JVT and custom matrices."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from refdec.decoder import decode_annexb, parse_pps  # noqa: E402
from refdec.bits import split_annexb, unescape  # noqa: E402

from x264_tpu import Encoder, EncoderParams, cqm  # noqa: E402
from x264_tpu.encoder.core import Frame  # noqa: E402


def test_parse_jm_file():
    text = """# comment line
INTRA4X4_LUMA =
 8,9,10,11,
 9,10,11,12,
 10,11,12,13,  # inline comment
 11,12,13,14

INTER4X4_LUMA :
 0
INTRA8X8_LUMA =
""" + ",".join(str(16 + (i % 5)) for i in range(64)) + "\n"
    got = cqm.parse_jm_file(text)
    np.testing.assert_array_equal(
        got["cqm_4iy"],
        np.array([8, 9, 10, 11, 9, 10, 11, 12,
                  10, 11, 12, 13, 11, 12, 13, 14]))
    # first coefficient 0 -> JVT default (x264_cqm_parse_jmlist)
    np.testing.assert_array_equal(got["cqm_4py"], cqm.JVT_4PY)
    # missing section -> flat
    np.testing.assert_array_equal(got["cqm_4ic"], np.full(16, 16))
    assert got["cqm_8iy"].shape == (64,)


def test_parse_jm_rejects_bad():
    with pytest.raises(ValueError):
        cqm.parse_jm_file("INTRA4X4_LUMA = 1,2,3")
    with pytest.raises(ValueError):
        cqm.parse_jm_file("INTRA4X4_LUMA = " +
                          ",".join(["300"] * 16))


def _frames(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 8, w + 8))
    out = []
    for i in range(n):
        y = base[i:i + h, i:i + w].astype(np.uint8)
        u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
        out.append(Frame(y, u, v))
    return out


def _roundtrip(p, frames):
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
    decoded = decode_annexb(stream)
    assert len(decoded) == len(recons)
    for d, r in zip(decoded, recons):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64), err_msg=pl)
    return stream


def test_pps_scaling_list_roundtrip():
    """PPS writer -> refdec parser recovers the raster matrices."""
    p = EncoderParams(i_width=64, i_height=48, i_log_level=0)
    p.i_cqm_preset = cqm.CQM_CUSTOM
    rng = np.random.default_rng(0)
    p.cqm = dict(
        cqm_4iy=rng.integers(1, 255, 16),
        cqm_4py=rng.integers(1, 255, 16),
        cqm_4ic=rng.integers(1, 255, 16),
        cqm_4pc=rng.integers(1, 255, 16),
        cqm_8iy=rng.integers(1, 255, 64),
        cqm_8py=rng.integers(1, 255, 64),
    )
    enc = Encoder(p)
    hdrs = enc.headers()
    nals = split_annexb(hdrs)
    pps_nal = [n for n in nals if (n[0] & 0x1F) == 8][0]
    info = parse_pps(unescape(pps_nal[1:]))
    from x264_tpu import tables as T
    np.testing.assert_array_equal(info.scaling4[T.CQM_4IY],
                                  p.cqm["cqm_4iy"])
    np.testing.assert_array_equal(info.scaling4[T.CQM_4PC],
                                  p.cqm["cqm_4pc"])
    np.testing.assert_array_equal(info.scaling8[T.CQM_8PY],
                                  p.cqm["cqm_8py"])


def test_jvt_preset_closure():
    """--cqm jvt: encode IPP + decode closure with non-flat matrices
    (CAVLC and CABAC share the dequant path)."""
    p = EncoderParams(i_width=96, i_height=64, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 27
    p.i_cqm_preset = cqm.CQM_JVT
    _roundtrip(p, _frames(96, 64, 3))


def test_custom_cqm_closure_with_trellis():
    """Custom matrices flow through quant, dequant, AND the trellis
    unquant tables (make_consts reads qt)."""
    p = EncoderParams(i_width=96, i_height=64, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    p.analyse.i_trellis = 1
    p.i_cqm_preset = cqm.CQM_CUSTOM
    p.cqm = dict(cqm_4iy=cqm.JVT_4IY, cqm_4py=np.full(16, 20),
                 cqm_8iy=cqm.JVT_8IY, cqm_8py=cqm.JVT_8PY)
    _roundtrip(p, _frames(96, 64, 3, seed=11))
