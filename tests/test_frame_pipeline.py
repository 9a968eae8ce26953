"""Frame-pipeline (i_frame_parallel) tests: the delayed-output contract
and bit-exactness vs the synchronous path (the b_deterministic analogue
of the reference's frame threading, doc/threads.txt:10-17)."""

import numpy as np

from x264_tpu.params import EncoderParams
from x264_tpu.encoder.core import Encoder, Frame

W, H, N = 128, 96, 8


def clip():
    fs = []
    for t in range(N):
        y = ((np.arange(H)[:, None] * 3 + np.arange(W)[None, :] + t * 7)
             % 256).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        fs.append(Frame(y, u, v))
    return fs


def encode_all(frame_parallel, cabac=True):
    p = EncoderParams(i_width=W, i_height=H, i_log_level=0,
                      i_keyint_max=6, b_cabac=cabac,
                      i_frame_parallel=frame_parallel)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)
    outs = []
    delayed = 0
    for f in clip():
        ef = enc.encode(f)
        if ef is None:
            delayed += 1
        else:
            outs.append(ef)
    outs += enc.flush()
    enc.close()
    return outs, delayed


def test_pipeline_bit_exact_cabac():
    sync, d0 = encode_all(1)
    pipe, d1 = encode_all(2)
    assert d0 == 0 and d1 == 1          # one frame in flight
    assert len(sync) == len(pipe) == N
    assert [o.frame_type for o in sync] == [o.frame_type for o in pipe]
    for a, b in zip(sync, pipe):
        assert a.payload == b.payload


def test_pipeline_bit_exact_cavlc():
    sync, _ = encode_all(1, cabac=False)
    pipe, _ = encode_all(3, cabac=False)
    assert len(pipe) == N
    for a, b in zip(sync, pipe):
        assert a.payload == b.payload
