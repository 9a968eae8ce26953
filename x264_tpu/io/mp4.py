"""Minimal MP4 (ISO BMFF) muxer — the analogue of the GPAC-backed MP4
output in muxers.c:648-860 (open_file_mp4 / write_nalu_mp4 /
set_eop_mp4 / close_file_mp4), written from scratch against the
ISO/IEC 14496-12/-15 box layout (public spec; no GPAC).

Writes one AVC video track: ftyp + mdat (length-prefixed samples in
decode order) + moov with an avc1 sample entry carrying the
avcC record (SPS/PPS), stts/stss/stsc/stsz/stco tables and a v0 ctts
box when B-frames reorder presentation (the reference sets the same
composition offsets via gf_isom_add_sample CTS-DTS deltas).
"""

from __future__ import annotations

import struct

from .mkv import split_nals, to_length_prefixed


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version)
                + struct.pack(">I", flags)[1:] + payload)


def avcc_record(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (14496-15 5.2.4.1; the reference
    builds it via gf_odf_avc_cfg_* in p_write_nalu, muxers.c:720-760)."""
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


class MP4Writer:
    """Buffered single-track MP4 writer; same call surface as MKVWriter
    (set_headers / write_frame / close)."""

    def __init__(self, f, width: int, height: int,
                 fps_num: int, fps_den: int):
        self.f = f
        self.w, self.h = width, height
        self.timescale = max(1, fps_num)
        self.sample_dur = max(1, fps_den)
        self.headers = None
        self.samples = []          # (payload, keyframe, display_idx)
        self.n = 0

    def set_headers(self, annexb_headers: bytes):
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
        nals = [n for n in split_nals(annexb)
                if (n[0] & 0x1F) not in (7, 8)]
        d = self.n if display_idx is None or display_idx < 0 \
            else display_idx
        self.samples.append((to_length_prefixed(nals), keyframe, d))
        self.n += 1

    # ------------------------------------------------------------ assembly
    def close(self):
        sps, pps = self.headers
        mdat_payload = b"".join(s[0] for s in self.samples)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isomiso2avc1mp41")
        # chunk offset = where sample data starts in the file:
        # ftyp + mdat header (8 bytes)
        mdat_off = len(ftyp) + 8
        moov = self._moov(sps, pps, mdat_off)
        self.f.write(ftyp)
        self.f.write(_box(b"mdat", mdat_payload))
        self.f.write(moov)

    def _stbl(self, sps, pps, mdat_off: int) -> bytes:
        n = len(self.samples)
        avc1 = _box(b"avc1", struct.pack(">6xH", 1)   # data_ref_index
                    + struct.pack(">HH12x", 0, 0)
                    + struct.pack(">HH", self.w, self.h)
                    + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
                    + struct.pack(">IH", 0, 1)        # frame_count
                    + bytes(32)                       # compressorname
                    + struct.pack(">Hh", 0x18, -1)
                    + _box(b"avcC", avcc_record(sps, pps)))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
        stts = _full(b"stts", 0, 0, struct.pack(
            ">III", 1, n, self.sample_dur))
        keys = [i + 1 for i, s in enumerate(self.samples) if s[1]]
        stss = _full(b"stss", 0, 0, struct.pack(">I", len(keys))
                     + b"".join(struct.pack(">I", k) for k in keys))
        # all samples in one chunk
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", len(s[0])) for s in self.samples))
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off))
        boxes = [stsd, stts, stss, stsc, stsz, stco]
        # ctts only when decode order != presentation order (B-frames);
        # v0 offsets are unsigned, so shift by the max decode lead
        if any(s[2] != i for i, s in enumerate(self.samples)):
            shift = max(i - s[2] for i, s in enumerate(self.samples))
            ctts = b"".join(
                struct.pack(">II", 1, (s[2] - i + shift) * self.sample_dur)
                for i, s in enumerate(self.samples))
            boxes.insert(2, _full(b"ctts", 0, 0,
                                  struct.pack(">I", n) + ctts))
        return _box(b"stbl", b"".join(boxes))

    def _moov(self, sps, pps, mdat_off: int) -> bytes:
        n = len(self.samples)
        dur = n * self.sample_dur
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, self.timescale, dur)
            + struct.pack(">IH2x8x", 0x00010000, 0x0100)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
            + struct.pack(">I", 2))                    # next_track_ID
        tkhd = _full(b"tkhd", 0, 7, struct.pack(
            ">IIIII", 0, 0, 1, 0, dur)
            + struct.pack(">8xhh hh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", self.w << 16, self.h << 16))
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIII", 0, 0, self.timescale, dur)
            + struct.pack(">HH", 0x55C4, 0))           # lang 'und'
        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                     + bytes(12) + b"x264_tpu video\0")
        vmhd = _full(b"vmhd", 0, 1, bytes(8))
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full(b"url ", 0, 1, b""))
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf
                    + self._stbl(sps, pps, mdat_off))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)
