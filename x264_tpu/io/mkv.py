"""Minimal Matroska (.mkv) muxer — the analogue of matroska.c
(mk_create_writer / mk_write_frame) + the MKV glue in muxers.c:861-1007.

Writes one H.264 video track. Frames are stored as Matroska SimpleBlocks
in a single Cluster per keyframe interval; codec private data is the
avcC record built from the SPS/PPS NALs (the reference builds the same
record in write_header_mkv, muxers.c:880-934).

EBML references: Matroska spec (public); element IDs are normative
constants, mirrored from matroska.c:24-120.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------- EBML core
def ebml_id(x: int) -> bytes:
    """Element IDs are written verbatim (they encode their own length)."""
    out = []
    while x:
        out.append(x & 0xFF)
        x >>= 8
    return bytes(reversed(out))


def ebml_size(n: int) -> bytes:
    """EBML variable-size integer (mk_write_size, matroska.c:141-160)."""
    if n < 0x7F:
        return bytes([0x80 | n])
    if n < 0x3FFF:
        return bytes([0x40 | (n >> 8), n & 0xFF])
    if n < 0x1FFFFF:
        return bytes([0x20 | (n >> 16), (n >> 8) & 0xFF, n & 0xFF])
    if n < 0x0FFFFFFF:
        return struct.pack(">I", 0x10000000 | n)
    return bytes([0x01]) + struct.pack(">Q", n)[1:]


def elem(eid: int, payload: bytes) -> bytes:
    return ebml_id(eid) + ebml_size(len(payload)) + payload


def uint_payload(v: int) -> bytes:
    out = struct.pack(">Q", v).lstrip(b"\0")
    return out if out else b"\0"


def elem_uint(eid: int, v: int) -> bytes:
    return elem(eid, uint_payload(v))


def elem_str(eid: int, s: str) -> bytes:
    return elem(eid, s.encode())


def elem_float(eid: int, v: float) -> bytes:
    return elem(eid, struct.pack(">f", v))


# --------------------------------------------------- annex-B <-> avcC helpers
def split_nals(annexb: bytes) -> list[bytes]:
    """Split an Annex-B byte stream into raw NAL payloads."""
    nals = []
    i = 0
    n = len(annexb)
    starts = []
    while i < n - 3:
        if annexb[i] == 0 and annexb[i + 1] == 0:
            if annexb[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i < n - 4 and annexb[i + 2] == 0 and annexb[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, body) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nals.append(annexb[body:end])
    return nals


def avcc_record(sps: bytes, pps: bytes) -> bytes:
    """ISO 14496-15 AVCDecoderConfigurationRecord
    (write_header_mkv, muxers.c:892-934)."""
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


def to_length_prefixed(nals: list[bytes]) -> bytes:
    return b"".join(struct.pack(">I", len(n)) + n for n in nals)


# ------------------------------------------------------------------ writer
class MKVWriter:
    """mk_create_writer + mk_write_frame + mk_close (matroska.c)."""

    TIMESCALE = 1_000_000     # ns per tick -> 1 ms ticks

    def __init__(self, f, width: int, height: int,
                 fps_num: int, fps_den: int):
        self.f = f
        self.w, self.h = width, height
        self.frame_dur_ms = 1000.0 * fps_den / max(1, fps_num)
        self.headers = None       # (sps, pps) raw NAL payloads
        self.frames = []          # (timecode_ms, key, payload)
        self.n = 0

    def set_headers(self, annexb_headers: bytes):
        """Receives the encoder's SPS+PPS(+SEI) Annex-B blob."""
        sps = pps = None
        for nal in split_nals(annexb_headers):
            t = nal[0] & 0x1F
            if t == 7 and sps is None:
                sps = nal
            elif t == 8 and pps is None:
                pps = nal
        if sps is None or pps is None:
            raise ValueError("SPS/PPS not found in header blob")
        self.headers = (sps, pps)

    def write_frame(self, annexb: bytes, keyframe: bool,
                    display_idx: int | None = None):
        """display_idx: presentation position (B-frames arrive in decode
        order; the SimpleBlock timecode must be presentation time)."""
        nals = [n for n in split_nals(annexb)
                if (n[0] & 0x1F) not in (7, 8)]   # headers live in avcC
        d = self.n if display_idx is None or display_idx < 0 \
            else display_idx
        tc = int(round(d * self.frame_dur_ms))
        self.frames.append((tc, keyframe, to_length_prefixed(nals)))
        self.n += 1

    # -- file assembly (single pass at close; the reference streams
    # clusters incrementally — buffered here for simplicity, the output
    # bytes are equivalent)
    def close(self):
        SEGMENT, INFO, TRACKS, CLUSTER = (0x18538067, 0x1549A966,
                                          0x1654AE6B, 0x1F43B675)
        ebml_hdr = elem(0x1A45DFA3, b"".join([
            elem_uint(0x4286, 1),          # EBMLVersion
            elem_uint(0x42F7, 1),          # EBMLReadVersion
            elem_uint(0x42F2, 4),          # EBMLMaxIDLength
            elem_uint(0x42F3, 8),          # EBMLMaxSizeLength
            elem_str(0x4282, "matroska"),  # DocType
            elem_uint(0x4287, 2),          # DocTypeVersion
            elem_uint(0x4285, 2),          # DocTypeReadVersion
        ]))
        last_tc = self.frames[-1][0] if self.frames else 0
        info = elem(INFO, b"".join([
            elem_uint(0x2AD7B1, self.TIMESCALE),
            elem_str(0x4D80, "x264_tpu"),       # MuxingApp
            elem_str(0x5741, "x264_tpu"),       # WritingApp
            elem_float(0x4489, float(last_tc + self.frame_dur_ms)),
        ]))
        sps, pps = self.headers
        video = elem(0xE0, b"".join([
            elem_uint(0xB0, self.w), elem_uint(0xBA, self.h),
        ]))
        track = elem(0xAE, b"".join([
            elem_uint(0xD7, 1),                 # TrackNumber
            elem_uint(0x73C5, 1),               # TrackUID
            elem_uint(0x83, 1),                 # TrackType video
            elem_str(0x86, "V_MPEG4/ISO/AVC"),  # CodecID
            elem(0x63A2, avcc_record(sps, pps)),
            elem_uint(0x23E383,
                      int(self.frame_dur_ms * self.TIMESCALE)),
            video,
        ]))
        tracks = elem(TRACKS, track)

        clusters = []
        cluster_blocks: list[bytes] = []
        cluster_tc = 0
        for tc, key, payload in self.frames:
            # new cluster on keyframes, and whenever the int16 relative
            # timecode of SimpleBlock would overflow (long keyint at low
            # fps) — matroska muxers split clusters the same way
            if cluster_blocks and (key or tc - cluster_tc > 32767):
                clusters.append(elem(CLUSTER, b"".join(
                    [elem_uint(0xE7, cluster_tc)] + cluster_blocks)))
                cluster_blocks = []
            if not cluster_blocks:
                cluster_tc = tc
            rel = tc - cluster_tc
            sb = (bytes([0x81])                      # track 1 (vint)
                  + struct.pack(">h", rel)
                  + bytes([0x80 if key else 0x00])   # flags
                  + payload)
            cluster_blocks.append(elem(0xA3, sb))    # SimpleBlock
        if cluster_blocks:
            clusters.append(elem(CLUSTER, b"".join(
                [elem_uint(0xE7, cluster_tc)] + cluster_blocks)))

        seg_payload = info + tracks + b"".join(clusters)
        self.f.write(ebml_hdr)
        self.f.write(ebml_id(SEGMENT) + ebml_size(len(seg_payload)))
        self.f.write(seg_payload)
