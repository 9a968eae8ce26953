"""Bit reader + NAL split for the reference test decoder."""

from __future__ import annotations


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def bit(self) -> int:
        return self.u(1)

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 40:
                raise ValueError("bad ue")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def te(self, x: int) -> int:
        if x == 1:
            return 1 - self.bit()
        return self.ue()

    def more_rbsp_data(self) -> bool:
        # true if there are bits before the rbsp_stop_bit
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        # find last set bit in stream (stop bit)
        last = total - 1
        while last >= 0:
            byte = self.data[last >> 3]
            if (byte >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last

    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0


def split_annexb(stream: bytes):
    """Yield raw NAL units (header byte + EBSP) from an Annex-B stream."""
    i = 0
    starts = []
    n = len(stream)
    while i < n - 2:
        if stream[i] == 0 and stream[i + 1] == 0:
            if stream[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i < n - 3 and stream[i + 2] == 0 and stream[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    nals = []
    for k, s in enumerate(starts):
        if k + 1 < len(starts):
            e = starts[k + 1] - 3
            if e > s and stream[e - 1] == 0:  # 4-byte start code
                e -= 1
        else:
            e = n
        nals.append(stream[s:e])
    return nals


def unescape(ebsp: bytes) -> bytes:
    """Remove emulation-prevention 0x03 bytes."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < len(ebsp) and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)
