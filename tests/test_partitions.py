"""P-partition (16x8 / 8x16) tests: the partition decision fires on
split-motion content, the streams decode bit-exact (CAVLC + CABAC), and
the block-granular MV syntax maps are consistent.

Reference behavior: inter_p16x8/p8x16 analysis (encoder/analyse.c:1274),
partition mb_types + per-partition mvd syntax (encoder/cavlc.c:393-428,
encoder/cabac.c:86-107,447), partition MV prediction
(common/macroblock.c:28-94).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from x264_tpu.params import EncoderParams
from x264_tpu.encoder.core import Encoder, Frame
from x264_tpu.encoder import inter
from x264_tpu import tables

from refdec.decoder import Decoder
from refdec.bits import split_annexb

W, H = 96, 96


def split_motion_frames(n=3, axis=1, boundary=40, seed=5):
    """Texture whose two halves move in opposite directions, with the
    split INSIDE an MB row/col so only a 16x8/8x16 partition can track
    both halves."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 55 * np.sin(yy / 9.0) + 45 * np.cos(xx / 7.0)
            + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        a = np.roll(base, 3 * t, axis=axis)
        b = np.roll(base, -3 * t, axis=axis)
        y = a.copy()
        if axis == 1:
            y[boundary:] = b[boundary:]
        else:
            y[:, boundary:] = b[:, boundary:]
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def test_partition_decision_fires():
    """encode_p_body picks 16x8 partitions on vertically-split motion."""
    f = split_motion_frames(3, axis=1, boundary=40)
    mb_h, mb_w = H // 16, W // 16
    qtab = inter.make_qtab_p(28, tables.chroma_qp(28))
    lam = int(tables.LAMBDA_TABLE[28])
    zero = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    to = lambda x: jnp.asarray(np.asarray(x, np.int32))
    out = inter.encode_p_body(
        mb_h, mb_w, 16, to(f[2].y), to(f[2].u), to(f[2].v),
        to(f[1].y), to(f[1].u), to(f[1].v), qtab, lam, zero,
        (2, 1), parts=True)
    ptype = np.asarray(out["ptype"])
    # the boundary runs through MB row 2 (y=40): those MBs need 16x8
    assert (ptype[2] == 1).sum() >= 2, ptype
    # mv4 map carries distinct MVs inside partitioned MBs
    mv4 = np.asarray(out["mv4"])
    row = np.where(ptype[2] == 1)[0][0]
    assert not np.array_equal(mv4[8, row * 4], mv4[11, row * 4])


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.parametrize("axis,boundary", [(1, 40), (0, 40)])
def test_partition_stream_decodes(cabac, axis, boundary):
    frames = split_motion_frames(4, axis=axis, boundary=boundary)
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      i_log_level=0, i_keyint_max=16,
                      i_scenecut_threshold=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 28
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    decoded = dec.frames
    assert len(decoded) == len(frames)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl} cabac={cabac} "
                        f"axis={axis}")


def test_parts_off_still_decodes():
    """parts disabled (inter flags without PSUB16x16) stays 16x16-only."""
    from x264_tpu.params import ANALYSE_PSUB16x16
    frames = split_motion_frames(3)
    p = EncoderParams(i_width=W, i_height=H, b_cabac=True,
                      i_log_level=0, i_keyint_max=16,
                      i_scenecut_threshold=0)
    p.analyse.inter &= ~ANALYSE_PSUB16x16
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 28
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        stream += ef.payload
        recons.append(ef.recon)
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    decoded = dec.frames
    for d, r in zip(decoded, recons):
        np.testing.assert_array_equal(np.asarray(d.y, np.int64),
                                      np.asarray(r.y, np.int64))
