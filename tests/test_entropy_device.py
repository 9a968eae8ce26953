"""Device-side entropy path: byte-identical to the host CAVLC coder.

Fuzz residual_codes (jnp) against cavlc_vec.residual_codes (NumPy), the
device packer against BitWriter.pack, the fused pipeline's bytes against
the round-1 host slice writer, and a default-parameters encode against
the reference decoder (the round-1 b_cabac default bug regression).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from x264_tpu.entropy import cavlc_vec as host
from x264_tpu.entropy import device as dev
from x264_tpu.entropy.bitstream import BitWriter, nal_escape


def _rand_coeffs(rng, n, c, density, mag):
    coef = rng.integers(-mag, mag + 1, size=(n, c))
    mask = rng.random((n, c)) < density
    return (coef * mask).astype(np.int64)


@pytest.mark.parametrize("c,dc", [(16, False), (15, False), (4, True)])
def test_residual_codes_matches_host(c, dc):
    rng = np.random.default_rng(7)
    for density in (0.05, 0.3, 0.9):
        for mag in (1, 5, 3000):
            coef = _rand_coeffs(rng, 500, c, density, mag)
            nc = (np.full(500, -1) if dc
                  else rng.integers(0, 17, 500)).astype(np.int64)
            hv, hl, _ = host.residual_codes(coef, nc)
            dv, dl = dev.residual_codes(jnp.asarray(coef, jnp.int32),
                                        jnp.asarray(nc, jnp.int32))
            np.testing.assert_array_equal(np.asarray(dl), hl)
            np.testing.assert_array_equal(np.asarray(dv), hv)
            assert int(np.asarray(dl).max()) <= 32


def test_pack_matches_bitwriter():
    rng = np.random.default_rng(3)
    n = 4000
    lens = rng.integers(0, 33, n)
    lens[rng.random(n) < 0.4] = 0
    vals = np.array([rng.integers(0, 1 << min(int(l), 31)) if l else 0
                     for l in lens], dtype=np.int64)

    bw = BitWriter()
    bw.put_codes(vals, lens)
    bw.put(1, 1)  # stop bit
    pad = (-bw.bit_pos) % 8
    if pad:
        bw.put(0, pad)
    expect = bw.pack()

    av = np.concatenate([vals, [1]]).astype(np.int32)
    al = np.concatenate([lens, [1]]).astype(np.int32)
    cap = (int(al.sum()) + 31) // 32 + 2
    words, nbits = dev.pack_codes(jnp.asarray(av), jnp.asarray(al), cap)
    got = dev.words_to_bytes(np.asarray(words), int(nbits))
    assert got == expect


def test_nal_escape_vectorized():
    rng = np.random.default_rng(5)
    cases = [
        b"", b"\x00", b"\x00\x00", b"\x00\x00\x00", b"\x00\x00\x03",
        b"\x00\x00\x00\x00", b"\x00\x00\x00\x00\x00\x01",
        b"\x01\x00\x00\x02\x00\x00\x00\x03", bytes(range(256)),
        bytes(rng.integers(0, 4, 200).astype(np.uint8)),
    ]
    for payload in cases:
        out = bytearray()
        zeros = 0
        for byte in payload:
            if zeros >= 2 and byte <= 3:
                out.append(3)
                zeros = 0
            out.append(byte)
            zeros = zeros + 1 if byte == 0 else 0
        assert nal_escape(payload) == bytes(out), payload


def _mkframe(rng, w, h):
    from x264_tpu.encoder.core import Frame
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return Frame(y, u, v)


def test_fused_pipeline_bytes_match_host_writer():
    from x264_tpu import EncoderParams, Encoder

    rng = np.random.default_rng(11)
    w, h = 96, 64
    frame = _mkframe(rng, w, h)
    for qp in (10, 26, 40):
        p = EncoderParams(i_width=w, i_height=h, b_cabac=False,
                          b_deblocking_filter=False, i_log_level=0)
        p.analyse.intra = 0     # host writer speaks I16x16 only
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = qp
        enc = Encoder(p)
        got = enc.encode(frame).payload

        # round-1 host path on the same coefficients
        from x264_tpu.encoder import intra
        from x264_tpu import tables
        from x264_tpu.encoder.core import pad_plane
        enc2 = Encoder(p)
        mb_w, mb_h = p.mb_width, p.mb_height
        y = pad_plane(np.asarray(frame.y, np.int32), mb_h * 16, mb_w * 16)
        u = pad_plane(np.asarray(frame.u, np.int32), mb_h * 8, mb_w * 8)
        v = pad_plane(np.asarray(frame.v, np.int32), mb_h * 8, mb_w * 8)
        qp_c = tables.chroma_qp(qp, 0)
        out = intra.encode_i16_frame(mb_h, mb_w, y, u, v,
                                     enc2._qtab(qp, qp_c),
                                     int(tables.LAMBDA_TABLE[qp]))
        out = {k: np.asarray(val) for k, val in out.items()}
        expect = enc2._write_i_slice(out, qp, mb_w, mb_h)
        assert got == expect, f"qp={qp}"


def test_default_params_stream_decodes():
    """Defaults must produce a spec-valid stream (round-1 bug: b_cabac
    default claimed CABAC in the PPS while writing CAVLC data)."""
    from x264_tpu import EncoderParams, Encoder
    from refdec.decoder import decode_annexb

    rng = np.random.default_rng(13)
    w, h = 80, 48
    frame = _mkframe(rng, w, h)
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    enc = Encoder(p)
    ef = enc.encode(frame)
    stream = enc.headers() + ef.payload
    frames = decode_annexb(stream)
    assert len(frames) == 1
    rec = ef.recon
    np.testing.assert_array_equal(frames[0].y, rec.y)
    np.testing.assert_array_equal(frames[0].u, rec.u)
    np.testing.assert_array_equal(frames[0].v, rec.v)
