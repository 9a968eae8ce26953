"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current benchmark: all-intra 1080p encode throughput on one chip
(device pipeline + host entropy), the round-1 slice of the BASELINE.json
north-star (1080p frames/s/chip). vs_baseline compares against x264's
single-thread all-intra throughput on its 2009 reference hardware
(no published number exists — BASELINE.md documents "published": {} —
so vs_baseline is reported against a 25 fps realtime bar).
"""

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax
    from x264_tpu import EncoderParams, Encoder
    from x264_tpu.encoder.core import Frame

    w, h = 1920, 1080
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(4):
        y = ((xx // 3 + yy // 2 + t * 8) % 200 + rng.integers(0, 24, (h, w))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + (xx[::2, ::2] % 40) - 20).clip(0, 255).astype(np.uint8)
        v = (128 - (yy[::2, ::2] % 40) + 20).clip(0, 255).astype(np.uint8)
        frames.append(Frame(y, u, v))

    p = EncoderParams(i_width=w, i_height=h, b_cabac=False,
                      b_deblocking_filter=False)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)

    enc.encode(frames[0])  # warmup + compile
    t0 = time.time()
    n = 0
    for f in frames[1:]:
        enc.encode(f)
        n += 1
    dt = time.time() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "1080p_allintra_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
    }))


if __name__ == "__main__":
    main()
