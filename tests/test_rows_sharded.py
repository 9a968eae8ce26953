"""MB-row-sharded (multi-slice) encode tests — parallel/rows.py.

Validates the TPU slice-parallel design on the 8-device CPU mesh:
the stream carries one slice per row band (first_mb_in_slice > 0,
disable_deblocking_filter_idc=2), the reference decoder reproduces the
encoder's reconstruction bit-exactly (the doc/regression_test.txt
closure), and the collective halo-exchange path is deterministic.
"""

import numpy as np
import pytest

import jax

from x264_tpu.params import EncoderParams
from x264_tpu.encoder.core import Encoder, Frame

from refdec.decoder import Decoder
from refdec.bits import split_annexb


W, H = 128, 128        # mb 8x8 -> 4 shards x 2 MB rows


def make_frames(n=4, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    tex = rng.integers(0, 256, (H + 32, W + 32)).astype(np.int32)
    frames = []
    for t in range(n):
        y = ((tex[2 * t:2 * t + H, 3 * t:3 * t + W] + xx // 5) % 256) \
            .astype(np.uint8)
        u = ((xx[::2, ::2] + 3 * t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] - 2 * t) % 256).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def encode(shards, deblock=True, qp=26, n=4, cabac=False, refs=1):
    p = EncoderParams(i_width=W, i_height=H, b_cabac=cabac,
                      b_deblocking_filter=deblock, i_log_level=0,
                      i_keyint_max=8, i_mb_row_shards=shards,
                      i_frame_reference=refs)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in make_frames(n):
        out = enc.encode(f)
        stream += out.payload
        recons.append((np.asarray(out.recon.y), np.asarray(out.recon.u),
                       np.asarray(out.recon.v)))
    return stream, recons, enc


@pytest.fixture(scope="module")
def sharded():
    assert len(jax.devices()) >= 4
    return encode(shards=4)


def test_mesh_active(sharded):
    _, _, enc = sharded
    assert enc._rows_mesh is not None
    assert enc._n_shards == 4


def test_slice_structure(sharded):
    stream, _, _ = sharded
    firsts = []
    for nal in split_annexb(stream):
        if (nal[0] & 0x1F) in (1, 5):
            from refdec.bits import BitReader, unescape
            br = BitReader(unescape(nal[1:]))
            firsts.append(br.ue())
    # 4 frames x 4 band slices, bands start at MB rows 0/2/4/6 (x8 wide)
    assert firsts == [0, 16, 32, 48] * 4


def test_sharded_decode_matches_recon(sharded):
    stream, recons, _ = sharded
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(recons)
    for i, (df, (ry, ru, rv)) in enumerate(zip(dec.frames, recons)):
        assert np.array_equal(np.asarray(df.y, np.int32), ry), f"Y f{i}"
        assert np.array_equal(np.asarray(df.u, np.int32), ru), f"U f{i}"
        assert np.array_equal(np.asarray(df.v, np.int32), rv), f"V f{i}"


def test_sharded_deterministic(sharded):
    stream, _, _ = sharded
    stream2, _, _ = encode(shards=4)
    assert stream == stream2


def test_sharded_no_deblock_decode():
    stream, recons, _ = encode(shards=2, deblock=False, n=3)
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    for df, (ry, ru, rv) in zip(dec.frames, recons):
        assert np.array_equal(np.asarray(df.y, np.int32), ry)


def test_sharded_cabac_decode_matches_recon():
    """CABAC MB-row sharding: per-band op streams, fresh contexts per
    slice (spec 9.3.1) — decode closure on the 4-shard mesh."""
    stream, recons, enc = encode(shards=4, n=3, cabac=True)
    assert enc._rows_mesh is not None
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(recons)
    for i, (df, (ry, ru, rv)) in enumerate(zip(dec.frames, recons)):
        assert np.array_equal(np.asarray(df.y, np.int32), ry), f"Y f{i}"
        assert np.array_equal(np.asarray(df.u, np.int32), ru), f"U f{i}"
        assert np.array_equal(np.asarray(df.v, np.int32), rv), f"V f{i}"


def test_sharded_cabac_deterministic():
    s1, _, _ = encode(shards=4, n=2, cabac=True)
    s2, _, _ = encode(shards=4, n=2, cabac=True)
    assert s1 == s2


def test_sharded_cabac_multiref_decode():
    """--ref 2 composes with the sharded CABAC path: both references'
    halos ride the ppermute exchange and the per-band ref_idx syntax
    decodes bit-exactly."""
    assert len(jax.devices()) >= 4
    stream, recons, enc = encode(shards=4, cabac=True, refs=2, n=4)
    assert enc.params.i_frame_reference == 2
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(recons)
    for i, (df, (ry, ru, rv)) in enumerate(zip(dec.frames, recons)):
        np.testing.assert_array_equal(
            np.asarray(df.y, np.int64), np.asarray(ry, np.int64),
            err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(
            np.asarray(df.u, np.int64), np.asarray(ru, np.int64),
            err_msg=f"frame {i} U")


def test_sharded_cabac_composed_b_aq_t8():
    """The composed sharded config (VERDICT round-4 item 5): B runs +
    8x8 transform + variance AQ + 2 refs on the CABAC band path, with
    decode closure (per-band dqp origins == per-slice QP state)."""
    from x264_tpu.params import B_ADAPT_NONE
    p = EncoderParams(i_width=W, i_height=H, b_cabac=True,
                      i_log_level=0, i_keyint_max=8,
                      i_mb_row_shards=4, i_frame_reference=2,
                      i_bframe=2, i_scenecut_threshold=0,
                      i_frame_parallel=2)   # band path pipelines too
    p.i_bframe_adaptive = B_ADAPT_NONE
    p.rc.i_aq_mode = 1
    p.analyse.b_transform_8x8 = True
    p.analyse.i_subpel_refine = 5
    enc = Encoder(p)
    assert enc._rows_mesh is not None
    stream = enc.headers()
    recons = []
    for f in make_frames(6):
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(recons)
    for i, (d, r) in enumerate(zip(dec.frames, recons)):
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl}")


def test_sharded_uneven_mb_height_pads():
    """mb_height that does NOT divide the shard count: the encoder pads
    the coded height to a band multiple (edge-replicated rows hidden by
    the SPS crop window) instead of dropping shards. 9 MB rows across 4
    shards -> 3 pad rows, 4 bands of 3; input height additionally
    non-MB-aligned (138 px) so both crop sources compose."""
    w, h = 64, 138                      # 9 MB rows, 6 px MB-align crop
    p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                      i_log_level=0, i_keyint_max=8,
                      i_mb_row_shards=4)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)
    assert enc._rows_mesh is not None and enc._n_shards == 4
    assert p.i_mb_height_pad == 3 and p.mb_height == 12
    rng = np.random.default_rng(5)
    tex = rng.integers(0, 256, (h + 32, w + 32)).astype(np.int32)
    stream = enc.headers()
    recons = []
    frames = []
    for t in range(4):
        y = (tex[2 * t:2 * t + h, 3 * t:3 * t + w] % 256).astype(np.uint8)
        u = ((tex[:h // 2, :w // 2] + t) % 256).astype(np.uint8)
        v = ((tex[1:1 + h // 2, 1:1 + w // 2] - t) % 256).astype(np.uint8)
        f = Frame(y, u, v)
        frames.append(f)
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    assert len(dec.frames) == len(recons)
    for i, (d, r) in enumerate(zip(dec.frames, recons)):
        assert np.asarray(d.y).shape == (h, w)
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(d, pl), np.int64),
                np.asarray(getattr(r, pl), np.int64),
                err_msg=f"frame {i} plane {pl}")
