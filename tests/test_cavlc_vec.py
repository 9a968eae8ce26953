"""Vectorized CAVLC (cavlc_vec) vs scalar coder (cavlc): identical bits."""

import numpy as np

from x264_tpu.entropy.bitstream import BitWriter
from x264_tpu.entropy.cavlc import write_block_residual
from x264_tpu.entropy import cavlc_vec


def test_residual_vec_matches_scalar():
    rng = np.random.default_rng(7)
    for C in (4, 15, 16):
        N = 3000
        density = rng.random((N, 1))
        coeffs = np.where(rng.random((N, C)) < density,
                          rng.integers(-2200, 2200, (N, C)), 0)
        small = rng.random(N) < 0.5
        coeffs[small] = np.where(rng.random((small.sum(), C)) < 0.5,
                                 rng.integers(-3, 4, (small.sum(), C)), 0)
        nc = (np.full(N, -1) if C == 4
              else rng.integers(0, 17, N))

        v, l, _ = cavlc_vec.residual_codes(coeffs, nc)
        for i in range(N):
            bs_ref = BitWriter()
            write_block_residual(bs_ref, coeffs[i], int(nc[i]),
                                 high_profile=True)
            bs_vec = BitWriter()
            bs_vec.put_codes(v[i], l[i])
            assert bs_ref.pack() == bs_vec.pack(), (C, i, coeffs[i])
            assert bs_ref.bit_pos == bs_vec.bit_pos


def test_ue_se_codes():
    bs_ref = BitWriter()
    for x in range(300):
        bs_ref.ue(x)
    for x in range(-150, 150):
        bs_ref.se(x)
    v1, l1 = cavlc_vec.ue_codes(np.arange(300))
    v2, l2 = cavlc_vec.se_codes(np.arange(-150, 150))
    bs_vec = BitWriter()
    bs_vec.put_codes(v1, l1)
    bs_vec.put_codes(v2, l2)
    assert bs_ref.pack() == bs_vec.pack()
