"""Quick RD check: deadzone vs trellis across QPs on a CIF clip.
Prints (qp, kbits, psnr) per config so the trellis tradeoff is judged
on the RD plane, not at fixed QP."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from x264_tpu import Encoder, EncoderParams              # noqa: E402
from x264_tpu.encoder.core import Frame                  # noqa: E402


def make_frames(n=6, w=352, h=288):
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx // 2 + yy // 3) % 190).astype(np.int32)
    noise = rng.integers(0, 50, (h + 16, w + 16))
    frames = []
    for t in range(n):
        y = (base + noise[t:t + h, 2 * t:2 * t + w]).clip(0, 255) \
            .astype(np.uint8)
        u = (128 + (xx[::2, ::2] % 30)).astype(np.uint8)
        v = (120 + (yy[::2, ::2] % 30)).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def run(frames, w, h, qp, trellis):
    p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                      i_log_level=0, i_keyint_max=50)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    p.analyse.i_trellis = trellis
    enc = Encoder(p)
    bits = 0
    recons = []
    for f in frames:
        ef = enc.encode(f)
        if ef:
            bits += ef.bits
            recons.append((f, ef.recon))
    for ef in enc.flush():
        bits += ef.bits
    # map recons back to source frames in order
    psnr = []
    for f, r in recons:
        e = f.y.astype(np.int64) - np.asarray(r.y, np.int64)
        psnr.append(10 * np.log10(255 ** 2 * e.size / max((e * e).sum(), 1)))
    return bits / 1000.0, float(np.mean(psnr))


def main():
    w, h = 352, 288
    frames = make_frames(8, w, h)
    for trellis in (0, 1):
        for qp in (26, 28, 30, 32):
            kb, ps = run(frames, w, h, qp, trellis)
            print(f"trellis={trellis} qp={qp}: {kb:8.1f} kbits  "
                  f"PSNR-Y {ps:6.3f}", flush=True)


if __name__ == "__main__":
    main()
