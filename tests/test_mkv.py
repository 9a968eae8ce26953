"""MKV muxer structural tests (matroska.c analogue).

Checks the EBML primitives against the spec encodings and that a muxed
file parses back: EBML header with matroska doctype, one AVC track whose
avcC round-trips the SPS/PPS, clusters split at keyframes, and
length-prefixed sample payloads that re-split into the original NALs.
"""

import io
import struct

from x264_tpu.io import mkv


def test_ebml_size_encodings():
    assert mkv.ebml_size(0) == b"\x80"
    assert mkv.ebml_size(0x7E) == b"\xfe"
    assert mkv.ebml_size(0x7F) == b"\x40\x7f"
    assert mkv.ebml_size(0x3FFE) == b"\x7f\xfe"
    assert mkv.ebml_size(0x4000) == b"\x20\x40\x00"
    assert mkv.ebml_size(0x10000000) == b"\x01" + struct.pack(
        ">Q", 0x10000000)[1:]


def test_split_nals():
    a = b"\x00\x00\x00\x01" + bytes([0x67, 1, 2]) \
        + b"\x00\x00\x01" + bytes([0x68, 3]) \
        + b"\x00\x00\x00\x01" + bytes([0x65, 9, 9, 9])
    nals = mkv.split_nals(a)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    assert nals[2] == bytes([0x65, 9, 9, 9])


def test_avcc_roundtrip():
    sps = bytes([0x67, 66, 0xC0, 30, 0xAA])
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    rec = mkv.avcc_record(sps, pps)
    assert rec[0] == 1
    assert rec[1:4] == sps[1:4]
    nsps = rec[5] & 0x1F
    assert nsps == 1
    ls = struct.unpack(">H", rec[6:8])[0]
    assert rec[8:8 + ls] == sps
    off = 8 + ls
    assert rec[off] == 1
    lp = struct.unpack(">H", rec[off + 1:off + 3])[0]
    assert rec[off + 3:off + 3 + lp] == pps


def _parse_elements(buf, pos, end):
    """Minimal EBML parser for verification."""
    out = []
    while pos < end:
        # element ID: leading-one length
        b0 = buf[pos]
        idlen = 1
        for i in range(4):
            if b0 & (0x80 >> i):
                idlen = i + 1
                break
        eid = int.from_bytes(buf[pos:pos + idlen], "big")
        pos += idlen
        b0 = buf[pos]
        szlen = 1
        for i in range(8):
            if b0 & (0x80 >> i):
                szlen = i + 1
                break
        size = int.from_bytes(buf[pos:pos + szlen], "big")
        size &= (1 << (7 * szlen)) - 1
        pos += szlen
        out.append((eid, pos, size))
        pos += size
    return out


def test_mux_structure():
    sps = bytes([0x67, 66, 0xC0, 30, 0xAA, 0xBB])
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    hdr = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps
    f = io.BytesIO()
    w = mkv.MKVWriter(f, 64, 48, 25, 1)
    w.set_headers(hdr)
    idr = b"\x00\x00\x00\x01" + bytes([0x65]) + b"payload-idr"
    pfr = b"\x00\x00\x00\x01" + bytes([0x41]) + b"payload-p"
    w.write_frame(idr, True)
    w.write_frame(pfr, False)
    w.write_frame(idr, True)     # starts a second cluster
    w.close()
    buf = f.getvalue()

    top = _parse_elements(buf, 0, len(buf))
    assert top[0][0] == 0x1A45DFA3          # EBML header
    assert top[1][0] == 0x18538067          # Segment
    eid, spos, ssize = top[1]
    seg = _parse_elements(buf, spos, spos + ssize)
    ids = [e[0] for e in seg]
    assert 0x1549A966 in ids                # Info
    assert 0x1654AE6B in ids                # Tracks
    clusters = [e for e in seg if e[0] == 0x1F43B675]
    assert len(clusters) == 2               # split at the second IDR

    # first cluster: timecode + 2 SimpleBlocks
    cpos, csize = clusters[0][1], clusters[0][2]
    inner = _parse_elements(buf, cpos, cpos + csize)
    blocks = [e for e in inner if e[0] == 0xA3]
    assert len(blocks) == 2
    # SimpleBlock payload: track vint, rel-tc, flags, then 4-byte
    # length-prefixed NAL
    bpos = blocks[0][1]
    assert buf[bpos] == 0x81
    assert buf[bpos + 3] & 0x80             # keyframe flag
    nlen = struct.unpack(">I", buf[bpos + 4:bpos + 8])[0]
    nal = buf[bpos + 8:bpos + 8 + nlen]
    assert nal == bytes([0x65]) + b"payload-idr"


def test_long_interval_splits_cluster():
    """A keyframe interval beyond the int16 relative-timecode range must
    start a new cluster instead of overflowing struct.pack('>h')."""
    sps = bytes([0x67, 66, 0xC0, 30, 0xAA, 0xBB])
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    hdr = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps
    f = io.BytesIO()
    w = mkv.MKVWriter(f, 64, 48, 1, 1)      # 1 fps -> 1000 ms per frame
    w.set_headers(hdr)
    idr = b"\x00\x00\x00\x01" + bytes([0x65]) + b"i"
    pfr = b"\x00\x00\x00\x01" + bytes([0x41]) + b"p"
    w.write_frame(idr, True)
    for _ in range(40):                     # 40 s > 32.767 s
        w.write_frame(pfr, False)
    w.close()                               # must not raise
    buf = f.getvalue()
    top = _parse_elements(buf, 0, len(buf))
    eid, spos, ssize = top[1]
    seg = _parse_elements(buf, spos, spos + ssize)
    clusters = [e for e in seg if e[0] == 0x1F43B675]
    assert len(clusters) >= 2
