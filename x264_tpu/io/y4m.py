"""Y4M / raw YUV demux + raw Annex-B mux (muxers.c:63-214,533-570).

The reference supports raw-YUV, Y4M and AVIS inputs and raw/.mp4/.mkv
outputs; here Y4M + raw YUV in (optionally via the read-ahead thread
wrapper in io/reader.py), raw .264 out here, MKV in io/mkv.py and MP4
in io/mp4.py.
"""

from __future__ import annotations

import numpy as np


class Y4MReader:
    """open_file_y4m / read_frame_y4m (muxers.c:138-334)."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        header = b""
        while not header.endswith(b"\n"):
            c = self.f.read(1)
            if not c:
                raise ValueError("bad y4m header")
            header += c
        fields = header.decode().strip().split()
        if fields[0] != "YUV4MPEG2":
            raise ValueError("not a y4m file")
        self.width = self.height = 0
        self.fps_num, self.fps_den = 25, 1
        for fld in fields[1:]:
            tag, val = fld[0], fld[1:]
            if tag == "W":
                self.width = int(val)
            elif tag == "H":
                self.height = int(val)
            elif tag == "F":
                n, d = val.split(":")
                self.fps_num, self.fps_den = int(n), int(d)
            elif tag == "C" and not val.startswith("420"):
                raise ValueError(f"unsupported colorspace {val}")
        self.frame_size = self.width * self.height * 3 // 2

    def __iter__(self):
        return self

    def __next__(self):
        line = b""
        while not line.endswith(b"\n"):
            c = self.f.read(1)
            if not c:
                raise StopIteration
            line += c
        if not line.startswith(b"FRAME"):
            raise ValueError("bad frame header")
        data = self.f.read(self.frame_size)
        if len(data) < self.frame_size:
            raise StopIteration
        return _split_planes(data, self.width, self.height)

    def close(self):
        self.f.close()


class YUVReader:
    """Raw planar I420 reader (open_file_yuv, muxers.c:63)."""

    def __init__(self, path: str, width: int, height: int):
        self.f = open(path, "rb")
        self.width, self.height = width, height
        self.fps_num, self.fps_den = 25, 1
        self.frame_size = width * height * 3 // 2

    def __iter__(self):
        return self

    def __next__(self):
        data = self.f.read(self.frame_size)
        if len(data) < self.frame_size:
            raise StopIteration
        return _split_planes(data, self.width, self.height)

    def close(self):
        self.f.close()


def _split_planes(data: bytes, w: int, h: int):
    buf = np.frombuffer(data, dtype=np.uint8)
    y = buf[:w * h].reshape(h, w)
    u = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
    v = buf[w * h + w * h // 4:].reshape(h // 2, w // 2)
    return y, u, v


def write_y4m(path: str, frames, width: int, height: int,
              fps=(25, 1)):
    """Write frames (list of (y,u,v)) as Y4M — used by --dump-yuv checks."""
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
                f"Ip A0:0 C420mpeg2\n".encode())
        for (y, u, v) in frames:
            f.write(b"FRAME\n")
            f.write(np.asarray(y, np.uint8).tobytes())
            f.write(np.asarray(u, np.uint8).tobytes())
            f.write(np.asarray(v, np.uint8).tobytes())
