"""CAVLC residual coder fuzz: encoder (x264_tpu.entropy.cavlc) against the
spec decoder (tests/refdec), random sparse blocks, exact roundtrip + exact
bit-consumption (desync detection via sentinel bit)."""

import numpy as np

from x264_tpu.entropy.bitstream import BitWriter, nal_escape
from x264_tpu.entropy.cavlc import write_block_residual
from refdec.bits import BitReader, unescape
from refdec.decoder import decode_residual


def test_residual_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for trial in range(4000):
        n = int(rng.choice([4, 15, 16]))
        density = rng.uniform(0, 1)
        if trial % 3 == 0:
            coeffs = np.where(rng.random(n) < density,
                              rng.integers(-3, 4, n), 0)
        else:
            coeffs = np.where(rng.random(n) < density,
                              rng.integers(-2200, 2200, n), 0)
        nc = -1 if n == 4 else int(rng.integers(0, 17))
        bs = BitWriter()
        write_block_residual(bs, coeffs, nc, high_profile=True)
        bs.put(1, 1)  # sentinel
        br = BitReader(bs.pack())
        dec = decode_residual(br, nc, n)
        np.testing.assert_array_equal(dec, coeffs)
        assert br.pos == bs.bit_pos - 1, "bit desync"


def test_nal_escape_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        # biased towards zeros to hit emulation patterns
        raw = bytes(int(b) for b in
                    np.where(rng.random(64) < 0.6, 0,
                             rng.integers(0, 256, 64)))
        assert unescape(nal_escape(raw)) == raw
