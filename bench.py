"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: 1080p IPPP encode throughput on one chip with the DEFAULT
feature set — CABAC entropy, in-loop deblocking, motion-compensated P
frames (1 IDR + 8 P) — i.e. the configuration closest to the
reference's defaults (common/common.c:39-144: CABAC on, deblock on,
P frames). Mode decision, ME, transforms, reconstruction, deblocking
and CABAC bin generation run fused on device; the serial arithmetic
FSM runs in the native C engine on host.

vs_baseline compares against a 25 fps realtime bar (the reference
publishes no absolute fps — BASELINE.md "published": {}).

Extra per-stage timings go to stderr so the headline stays one JSON line.
"""

import json
import sys
import time

import numpy as np

import jax

# persistent compile cache: first bench run on a machine compiles the
# 1080p pipelines once; later runs start hot (env vars are not honored
# in jax 0.9 — config.update is required)
jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def make_frames(w, h, n):
    from x264_tpu.encoder.core import Frame
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx // 3 + yy // 2) % 200).astype(np.int32)
    noise = rng.integers(0, 24, (h + 32, w + 32))
    frames = []
    for t in range(n):
        # global pan + static texture: exercises ME/skip/inter paths
        y = (base + noise[t:t + h, 2 * t:2 * t + w]).clip(0, 255) \
            .astype(np.uint8)
        u = (128 + (xx[::2, ::2] % 40) - 20).clip(0, 255).astype(np.uint8)
        v = (128 - (yy[::2, ::2] % 40) + 20).clip(0, 255).astype(np.uint8)
        frames.append(Frame(y, u, v))
    return frames


def run_encoder(frames, w, h, cabac, deblock, keyint, warm=1,
                frame_parallel=3):
    from x264_tpu import EncoderParams, Encoder
    p = EncoderParams(i_width=w, i_height=h, b_cabac=cabac,
                      b_deblocking_filter=deblock, i_log_level=0,
                      i_keyint_max=keyint,
                      i_frame_parallel=frame_parallel)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)
    outs = []
    for f in frames[:warm]:
        outs.append(enc.encode(f))   # warmup + compile (IDR path)
    if keyint > 1 and len(frames) > warm:
        outs.append(enc.encode(frames[warm]))  # compile the P path too
        warm += 1
    t0 = time.time()
    n = 0
    bits = 0
    for f in frames[warm:]:
        ef = enc.encode(f)
        if ef is not None:
            bits += ef.bits
        n += 1
    for ef in enc.flush():
        bits += ef.bits
    dt = time.time() - t0
    return n / dt, bits / max(n, 1)


def stage_timings(w, h):
    """Per-stage device timings (checkasm --bench analogue at frame
    granularity)."""
    import jax
    import jax.numpy as jnp
    from x264_tpu.encoder import intra, inter, pipeline
    from x264_tpu.encoder.core import pad_plane
    from x264_tpu.entropy import device as edev
    from x264_tpu import tables

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    qp = 26
    qp_c = tables.chroma_qp(qp, 0)
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 255, (mb_h * 16, mb_w * 16))
                       .astype(np.int32))
    u = jax.device_put(rng.integers(0, 255, (mb_h * 8, mb_w * 8))
                       .astype(np.int32))
    v = jax.device_put(rng.integers(0, 255, (mb_h * 8, mb_w * 8))
                       .astype(np.int32))
    ry = jax.device_put(rng.integers(0, 255, (mb_h * 16, mb_w * 16))
                        .astype(np.int32))
    qtab = inter.make_qtab_p(qp, qp_c)
    lam = jnp.int32(int(tables.LAMBDA_TABLE[qp]))
    mvp0 = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    hdr_v = jnp.zeros(edev.HDR_SLOTS, jnp.int32)
    hdr_l = jnp.zeros(edev.HDR_SLOTS, jnp.int32)

    def timed(f, reps=3):
        jax.block_until_ready(f())  # compile
        t0 = time.time()
        r = None
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        return (time.time() - t0) / reps * 1e3

    from x264_tpu.ops import me as ome

    t_intra = timed(lambda: intra.encode_i16_frame(
        mb_h, mb_w, y, u, v, qtab, lam, True)["recon_y"])
    t_i_full = timed(lambda: pipeline.encode_i16_idr(
        mb_h, mb_w, True, True, False, y, u, v, qtab, lam, qp, qp_c,
        hdr_v, hdr_l, 0, 0, 0)["words"])
    me_jit = jax.jit(lambda yy, rr, mm: ome.fullpel_search(
        yy, jnp.pad(rr, 32, mode="edge"), mb_h, mb_w, 16, lam, mm))
    t_me = timed(lambda: me_jit(y, ry, mvp0)[0])
    t_p_full = timed(lambda: pipeline.encode_p_cabac(
        mb_h, mb_w, 16, True, (2, 1), True, False, 1, y, u, v, ry, u, v,
        qtab, lam, qp, qp_c, 0, 0, 0, mvp0)["ops"])
    print(f"[bench] per-stage ms/frame @{w}x{h}: intra_scan={t_intra:.1f} "
          f"idr_fused={t_i_full:.1f} me_fullpel={t_me:.1f} "
          f"p_cabac_fused={t_p_full:.1f}", file=sys.stderr)


def main():
    sys.path.insert(0, ".")
    w, h = 1920, 1080
    frames = make_frames(w, h, 11)

    fps, bpf = run_encoder(frames, w, h, cabac=True, deblock=True,
                           keyint=250)
    nmb = ((w + 15) // 16) * ((h + 15) // 16)
    # utilization context: MB throughput vs the level-4.0 decoder
    # ceiling (encoder/set.c:520) — makes the perf gap visible as a
    # single ratio, per the round-2 review ask
    print(f"[bench] 1080p IPPP CABAC+deblock: {fps:.2f} fps "
          f"({bpf / 8:.0f} B/frame); {fps * nmb:.0f} MB/s "
          f"(= {100 * fps * nmb / 245760:.1f}% of the L4.0 245760 MB/s "
          f"rate)", file=sys.stderr)

    try:
        fps_ai, _ = run_encoder(frames[:5], w, h, cabac=False, deblock=True,
                                keyint=1)
        print(f"[bench] 1080p all-intra CAVLC+deblock: {fps_ai:.2f} fps",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] all-intra detail skipped: {e}", file=sys.stderr)

    try:
        stage_timings(w, h)
    except Exception as e:  # stage breakdown is best-effort diagnostics
        print(f"[bench] stage timing skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "1080p_ippp_cabac_deblock_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
    }))


if __name__ == "__main__":
    main()
