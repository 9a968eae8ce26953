"""CABAC engine front-end: packed bin-op stream -> encoded bytes.

The op stream is produced vectorized (device-side, cabac_planes.py); the
sequential arithmetic coding runs in the native C engine
(native/cabac.c) with a pure-Python fallback of identical semantics
(spec 9.3.4 / common/cabac.c:807-926).

Packed op (uint32): kind = op >> 29, b = (op >> 17) & 0xFFF,
a = op & 0x1FFFF. Kinds: 0 decision(ctx=a, bin=b), 1 raw bypass
(value=a, nbits=b), 2 ue-bypass(value=a, exp_bits=b), 3 terminal(0),
4 pad, 5 repeated 1-bins (ctx=a, count=b).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import cabac_tables as CT
from .. import native

(KIND_DECISION, KIND_BYPASS, KIND_UE, KIND_TERMINAL, KIND_PAD,
 KIND_ONES) = range(6)

A_BITS, B_BITS = 17, 12
A_MAX, B_MAX = (1 << A_BITS) - 1, (1 << B_BITS) - 1


def pack_op(kind, a, b):
    """Pack op fields (works on ints or arrays)."""
    return (kind << 29) | (b << 17) | a


def encode_ops(states: np.ndarray, ops: np.ndarray,
               prev_byte: int) -> tuple[bytes, int]:
    """Run the arithmetic coder over the packed op stream.

    states: uint8[460] (mutated); prev_byte: the last slice-header byte
    (the carry sink — x264_cabac_putbyte writes p[-1], common/cabac.c:841).
    Returns (payload bytes, fixed-up prev_byte).
    """
    ops = np.ascontiguousarray(ops, np.uint32)
    n = len(ops)
    lib = native.load()
    if lib is not None:
        # worst-case output bound: <=2 bytes per decision/terminal op,
        # plus bypass payloads (<= (12+17)/8 bytes each), plus flush
        cap = 64 + 2 * n + 6 * int((ops >> 29 == KIND_ONES).sum()) \
            + 8 * int(((ops >> 29) == KIND_UE).sum() +
                      ((ops >> 29) == KIND_BYPASS).sum())
        out = np.zeros(cap, np.uint8)
        out[0] = prev_byte
        st = np.ascontiguousarray(states, np.uint8)
        nbytes = lib.cabac_encode(
            st.ctypes.data_as(ctypes.c_char_p),
            CT.RANGE_LPS.ctypes.data_as(ctypes.c_char_p),
            CT.TRANSITION.ctypes.data_as(ctypes.c_char_p),
            ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n, out.ctypes.data_as(ctypes.c_char_p))
        states[:] = st
        return out[1:1 + nbytes].tobytes(), int(out[0])

    enc = PyCabacEncoder(states, prev_byte)
    for op in ops:
        op = int(op)
        k, b, a = op >> 29, (op >> 17) & B_MAX, op & A_MAX
        if k == KIND_DECISION:
            enc.decision(a, b & 1)
        elif k == KIND_ONES:
            for _ in range(b):
                enc.decision(a, 1)
        elif k == KIND_BYPASS:
            for j in range(b - 1, -1, -1):
                enc.bypass((a >> j) & 1)
        elif k == KIND_UE:
            enc.ue_bypass(a, b)
        elif k == KIND_TERMINAL:
            enc.terminal0()
    enc.flush()
    return bytes(enc.out[1:]), enc.out[0]


class PyCabacEncoder:
    """Bit-identical Python engine (fallback / tests)."""

    def __init__(self, states: np.ndarray, prev_byte: int):
        self.states = states
        self.low = 0
        self.range = 0x01FE
        self.queue = -1
        self.outstanding = 0
        self.out = bytearray([prev_byte])

    def _putbyte(self):
        if self.queue >= 8:
            out = self.low >> (self.queue + 2)
            self.low &= (4 << self.queue) - 1
            self.queue -= 8
            if (out & 0xFF) == 0xFF:
                self.outstanding += 1
            else:
                carry = out >> 8
                self.out[-1] = (self.out[-1] + carry) & 0xFF
                while self.outstanding:
                    self.out.append((carry - 1) & 0xFF)
                    self.outstanding -= 1
                self.out.append(out & 0xFF)

    def _renorm(self):
        while self.range < 0x100:
            self.range <<= 1
            self.low <<= 1
            self.queue += 1
        self._putbyte()

    def decision(self, ctx: int, b: int):
        s = int(self.states[ctx])
        lps = int(CT.RANGE_LPS[s][(self.range >> 6) & 3])
        self.range -= lps
        if b != (s >> 6):
            self.low += self.range
            self.range = lps
        self.states[ctx] = CT.TRANSITION[s][b]
        self._renorm()

    def bypass(self, b: int):
        self.low <<= 1
        if b:
            self.low += self.range
        self.queue += 1
        self._putbyte()

    def ue_bypass(self, val: int, exp_bits: int):
        k = exp_bits
        while val >= (1 << k):
            val -= 1 << k
            k += 1
        x = (((1 << (k - exp_bits)) - 1) << (k + 1)) + val
        k = 2 * k + 1 - exp_bits
        i = ((k - 1) & 7) + 1
        while True:
            k -= i
            self.low <<= i
            self.low += ((x >> k) & 0xFF) * self.range
            self.queue += i
            self._putbyte()
            i = 8
            if k <= 0:
                break

    def terminal0(self):
        self.range -= 2
        self._renorm()

    def flush(self):
        self.low += self.range - 2
        self.low |= 1
        self.low <<= 9
        self.queue += 9
        self._putbyte()
        self._putbyte()
        self.low <<= 8 - self.queue
        self.queue = 8
        self._putbyte()
        while self.outstanding:
            self.out.append(0xFF)
            self.outstanding -= 1


class CabacDecoder:
    """Arithmetic decoder (spec 9.3.3.2) over the x264 combined-state
    representation — used by the reference decoder for verification."""

    def __init__(self, data: bytes, states: np.ndarray):
        self.data = data
        self.states = states
        self.bitpos = 0
        self.range = 510
        self.offset = self._read(9)

    def _read(self, n):
        v = 0
        for _ in range(n):
            byte = (self.data[self.bitpos >> 3]
                    if (self.bitpos >> 3) < len(self.data) else 0)
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def decision(self, ctx: int) -> int:
        s = int(self.states[ctx])
        lps = int(CT.RANGE_LPS[s][(self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            b = 1 - (s >> 6)
            self.offset -= self.range
            self.range = lps
        else:
            b = s >> 6
        self.states[ctx] = CT.TRANSITION[s][b]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read(1)
        return b

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._read(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def ue_bypass(self, exp_bits: int) -> int:
        k = exp_bits
        v = 0
        while self.bypass():
            v += 1 << k
            k += 1
        while k > 0:
            k -= 1
            v += self.bypass() << k
        return v

    def terminal(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read(1)
        return 0
