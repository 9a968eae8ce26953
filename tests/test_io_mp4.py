"""MP4 muxer (io/mp4.py), threaded reader (io/reader.py) and the
runtime reconfig surface — the muxers.c:441-860 + encoder_reconfig
analogues."""

import io
import struct

import numpy as np
import pytest

from x264_tpu.io.mp4 import MP4Writer, avcc_record
from x264_tpu.io.reader import ThreadedReader


def _boxes(data):
    """Top-level (type, payload) boxes."""
    out, off = [], 0
    while off < len(data):
        size = struct.unpack(">I", data[off:off + 4])[0]
        out.append((data[off + 4:off + 8], data[off + 8:off + size]))
        off += size
    return out


def _find(payload, typ):
    for t, p in _boxes(payload):
        if t == typ:
            return p
    return None


SPS = bytes([0x67, 66, 0, 30, 0xDE, 0xAD, 0xBE, 0xEF])
PPS = bytes([0x68, 0xCE, 0x38, 0x80])
HDRS = b"\x00\x00\x00\x01" + SPS + b"\x00\x00\x00\x01" + PPS


def _write(samples, fps=(25, 1), reorder=False):
    buf = io.BytesIO()
    w = MP4Writer(buf, 64, 48, *fps)
    w.set_headers(HDRS)
    for i in range(samples):
        disp = i if not reorder else [0, 2, 1, 3, 4][i % 5] + 5 * (i // 5)
        w.write_frame(b"\x00\x00\x00\x01"
                      + bytes([0x65 if i == 0 else 0x41, 1, 2, i]),
                      i == 0, disp)
    w.close()
    return buf.getvalue()


def test_mp4_structure():
    data = _write(5)
    tops = _boxes(data)
    assert [t for t, _ in tops] == [b"ftyp", b"mdat", b"moov"]
    moov = tops[2][1]
    trak = _find(moov, b"trak")
    stbl = _find(_find(_find(trak, b"mdia"), b"minf"), b"stbl")
    stsz = _find(stbl, b"stsz")
    n = struct.unpack(">I", stsz[8:12])[0]
    assert n == 5
    sizes = struct.unpack(">5I", stsz[12:32])
    # each sample: 4-byte length prefix + 4 payload bytes
    assert all(s == 8 for s in sizes)
    # chunk offset points at the first sample inside mdat
    stco = _find(stbl, b"stco")
    off = struct.unpack(">I", stco[8:12])[0]
    assert struct.unpack(">I", data[off:off + 4])[0] == 4
    assert data[off + 4] == 0x65
    # no ctts when decode order == display order
    assert _find(stbl, b"ctts") is None


def test_mp4_ctts_on_reorder():
    data = _write(5, reorder=True)
    moov = _boxes(data)[2][1]
    stbl = _find(_find(_find(_find(moov, b"trak"), b"mdia"),
                       b"minf"), b"stbl")
    ctts = _find(stbl, b"ctts")
    assert ctts is not None
    n = struct.unpack(">I", ctts[4:8])[0]
    assert n == 5
    offs = [struct.unpack(">I", ctts[8 + 8 * i + 4:16 + 8 * i])[0]
            for i in range(n)]
    # display [0,2,1,3,4] at decode [0..4], dts shift 1:
    # offset_i = (disp_i - i + 1) * sample_dur, all unsigned
    assert offs == [1, 2, 0, 1, 1]
    assert min(offs) == 0


def test_avcc_record_layout():
    rec = avcc_record(SPS, PPS)
    assert rec[0] == 1 and rec[1:4] == SPS[1:4]
    assert rec[4] == 0xFF and rec[5] == 0xE1
    ls = struct.unpack(">H", rec[6:8])[0]
    assert rec[8:8 + ls] == SPS


class _FakeReader:
    width, height = 8, 8

    def __init__(self, n, fail_at=None):
        self.n, self.i, self.fail_at = n, 0, fail_at

    def __iter__(self):
        return self

    def __next__(self):
        if self.fail_at is not None and self.i == self.fail_at:
            raise IOError("boom")
        if self.i >= self.n:
            raise StopIteration
        self.i += 1
        z = np.full((8, 8), self.i, np.uint8)
        return z, z[:4, :4], z[:4, :4]


def test_threaded_reader_passthrough():
    r = ThreadedReader(_FakeReader(7), depth=3)
    frames = [y[0, 0] for (y, u, v) in r]
    assert frames == list(range(1, 8))
    assert r.width == 8   # metadata passthrough


def test_threaded_reader_error_propagates():
    r = ThreadedReader(_FakeReader(7, fail_at=3))
    got = []
    with pytest.raises(IOError):
        for (y, u, v) in r:
            got.append(int(y[0, 0]))
    assert got == [1, 2, 3]


def test_encoder_reconfig():
    from x264_tpu.params import EncoderParams
    from x264_tpu.encoder.core import Encoder
    p = EncoderParams(i_width=64, i_height=48)
    p.rc.i_rc_method = 0  # CQP
    p.rc.i_qp_constant = 30
    enc = Encoder(p)
    q = EncoderParams(i_width=64, i_height=48)
    q.analyse.i_me_range = 8
    q.analyse.i_subpel_refine = 2
    q.i_deblocking_filter_alphac0 = 2
    q.rc.i_qp_min, q.rc.i_qp_max = 12, 40
    enc.reconfig(q)
    assert enc.params.analyse.i_me_range == 8
    assert enc._subpel == (2,)
    assert enc._rd is False
    assert enc.params.i_deblocking_filter_alphac0 == 2
    assert enc.params.rc.i_qp_max == 40


def test_sps_full_vui_roundtrip():
    """Full VUI write (SAR + signal type + bitstream restriction,
    encoder/set.c:285-362): the SPS grows, stays parseable, and the
    e2e stream still decodes."""
    from x264_tpu.params import EncoderParams
    from x264_tpu.encoder.core import Encoder, Frame
    from refdec.decoder import decode_annexb

    p = EncoderParams(i_width=64, i_height=48, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 30
    p.analyse.i_subpel_refine = 5
    base = Encoder(p).headers()

    q = EncoderParams(i_width=64, i_height=48, i_log_level=0)
    q.rc.i_rc_method = 0
    q.rc.i_qp_constant = 30
    q.analyse.i_subpel_refine = 5
    q.vui_sar_width, q.vui_sar_height = 16, 11   # idc 4
    q.vui_b_fullrange = True
    enc = Encoder(q)
    hdr = enc.headers()
    assert hdr != base
    z = np.full((48, 64), 128, np.uint8)
    c = np.full((24, 32), 128, np.uint8)
    stream = hdr
    ef = enc.encode(Frame(z, c, c))
    stream += ef.payload
    decoded = decode_annexb(stream)
    assert len(decoded) == 1
    np.testing.assert_array_equal(
        np.asarray(decoded[0].y, np.int64),
        np.asarray(ef.recon.y, np.int64))
