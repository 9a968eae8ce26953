"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: all-intra 1080p encode throughput on one chip with the in-loop
deblocking filter ENABLED (the reference's fps always includes
x264_fdec_filter_row, encoder/encoder.c:983). The whole frame — mode
decision, transforms, CAVLC entropy coding, bit packing, deblocking —
runs as one fused device program; the host only wraps NAL units.

vs_baseline compares against a 25 fps realtime bar (the reference
publishes no absolute fps — BASELINE.md "published": {}).

Extra per-stage timings go to stderr so the headline stays one JSON line.
"""

import json
import sys
import time

import numpy as np


def make_frames(w, h, n):
    from x264_tpu.encoder.core import Frame
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = ((xx // 3 + yy // 2 + t * 8) % 200 + rng.integers(0, 24, (h, w))
             ).clip(0, 255).astype(np.uint8)
        u = (128 + (xx[::2, ::2] % 40) - 20).clip(0, 255).astype(np.uint8)
        v = (128 - (yy[::2, ::2] % 40) + 20).clip(0, 255).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def stage_timings(enc, frame, reps=3):
    """Per-stage device timings (checkasm --bench analogue at frame
    granularity): intra scan, entropy+pack, deblock, full fused."""
    import jax
    from x264_tpu.encoder import intra, pipeline
    from x264_tpu.encoder.core import pad_plane
    from x264_tpu.entropy import device as edev
    from x264_tpu import tables
    import jax.numpy as jnp

    p = enc.params
    mb_w, mb_h = p.mb_width, p.mb_height
    qp = p.rc.i_qp_constant
    qp_c = tables.chroma_qp(qp, 0)
    y = jax.device_put(pad_plane(np.asarray(frame.y, np.uint8),
                                 mb_h * 16, mb_w * 16))
    u = jax.device_put(pad_plane(np.asarray(frame.u, np.uint8),
                                 mb_h * 8, mb_w * 8))
    v = jax.device_put(pad_plane(np.asarray(frame.v, np.uint8),
                                 mb_h * 8, mb_w * 8))
    qtab = enc._qtab(qp, qp_c)
    lam = int(tables.LAMBDA_TABLE[qp])
    hdr_v = jnp.zeros(edev.HDR_SLOTS, jnp.int32)
    hdr_l = jnp.zeros(edev.HDR_SLOTS, jnp.int32)

    def timed(f):
        jax.block_until_ready(f())  # compile
        t0 = time.time()
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        return (time.time() - t0) / reps * 1e3

    t_intra = timed(lambda: intra.encode_i16_frame(
        mb_h, mb_w, y, u, v, qtab, lam)["recon_y"])

    t_nodeb = timed(lambda: pipeline.encode_i16_idr(
        mb_h, mb_w, False, y, u, v, qtab, lam, qp, qp_c,
        hdr_v, hdr_l, 0, 0, 0)["words"])
    t_full = timed(lambda: pipeline.encode_i16_idr(
        mb_h, mb_w, True, y, u, v, qtab, lam, qp, qp_c,
        hdr_v, hdr_l, 0, 0, 0)["words"])
    print(f"[bench] per-stage ms/frame @1080p: intra_scan={t_intra:.1f} "
          f"entropy+pack={t_nodeb - t_intra:.1f} "
          f"deblock={t_full - t_nodeb:.1f} fused_total={t_full:.1f}",
          file=sys.stderr)


def main():
    sys.path.insert(0, ".")
    from x264_tpu import EncoderParams, Encoder

    w, h = 1920, 1080
    frames = make_frames(w, h, 9)

    p = EncoderParams(i_width=w, i_height=h, b_cabac=False,
                      b_deblocking_filter=True, i_log_level=0)
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

    try:
        stage_timings(enc, frames[0])
    except Exception as e:  # stage breakdown is best-effort diagnostics
        print(f"[bench] stage timing skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "1080p_allintra_deblock_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
    }))


if __name__ == "__main__":
    main()
