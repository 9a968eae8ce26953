"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline: 1080p IPPP encode throughput on one chip with the DEFAULT
feature set — CABAC entropy, in-loop deblocking, 8x8 transform, DCT
decimation, the subme-6 RD mode-decision ladder, motion-compensated P
frames — i.e. the configuration closest to the reference's defaults
(common/common.c:39-144). Mode decision, ME, transforms,
reconstruction, deblocking and CABAC bin generation run fused on
device; the serial arithmetic FSM runs in the native C engine on host.

The detail block decomposes one steady-state P frame into
device-compute ms, d2h transfer ms+bytes, and host entropy-tail ms,
and reports min/median per-frame wall times over the timed window —
so a tunnel-bound e2e number is distinguishable from a compute-bound
one in the artifact itself.

vs_baseline compares against a 25 fps realtime bar (the reference
publishes no absolute fps — BASELINE.md "published": {}).

Extra per-stage timings go to stderr so the headline stays one JSON line.
"""

import json
import statistics
import sys
import time

import numpy as np

import jax

# persistent compile cache: first bench run on a machine compiles the
# 1080p pipelines once; later runs start hot (env vars are not honored
# in jax 0.9 — config.update is required)
jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N_FRAMES = 19          # 1 IDR warm + 2 P compile/warm + 16 timed


def make_frames(w, h, n):
    from x264_tpu.encoder.core import Frame
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx // 3 + yy // 2) % 200).astype(np.int32)
    noise = rng.integers(0, 24, (h + 32, w + 2 * n + 32))
    frames = []
    for t in range(n):
        # global pan + static texture: exercises ME/skip/inter paths
        y = (base + noise[t % 32:t % 32 + h, 2 * t:2 * t + w]) \
            .clip(0, 255).astype(np.uint8)
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
    if keyint > 1 and len(frames) > warm + 1:
        # compile + warm the P path (first P runs single-ref)
        outs.append(enc.encode(frames[warm]))
        outs.append(enc.encode(frames[warm + 1]))
        warm += 2
    t0 = time.time()
    n = 0
    bits = 0
    per_frame = []
    for f in frames[warm:]:
        tf = time.time()
        ef = enc.encode(f)
        per_frame.append(time.time() - tf)
        if ef is not None:
            bits += ef.bits
        n += 1
    for ef in enc.flush():
        bits += ef.bits
    dt = time.time() - t0
    return n / dt, bits / max(n, 1), per_frame


def split_timings(w, h):
    """Decompose one steady-state default-config P frame into device /
    transfer / host components (the artifact-level split the round-4
    verdict required)."""
    import jax.numpy as jnp
    from x264_tpu import EncoderParams, Encoder
    from x264_tpu.encoder import pipeline
    from x264_tpu import tables
    from x264_tpu.entropy import cabac as ecabac
    from x264_tpu.entropy import cabac_tables as ctab

    qp = 26
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = qp
    enc = Encoder(p)                      # defaults: t8+decimate+rd
    mb_w, mb_h = p.mb_width, p.mb_height
    qp_c = tables.chroma_qp(qp, 0)
    rng = np.random.default_rng(1)
    y = jax.device_put(rng.integers(0, 255, mb_h * 16 * mb_w * 16)
                       .astype(np.uint8))
    u = jax.device_put(rng.integers(0, 255, mb_h * 8 * mb_w * 8)
                       .astype(np.uint8))
    v = jax.device_put(rng.integers(0, 255, mb_h * 8 * mb_w * 8)
                       .astype(np.uint8))
    ry = jax.device_put(rng.integers(0, 255, (mb_h * 16, mb_w * 16))
                        .astype(np.int32))
    ru = jax.device_put(rng.integers(0, 255, (mb_h * 8, mb_w * 8))
                        .astype(np.int32))
    rv = jax.device_put(rng.integers(0, 255, (mb_h * 8, mb_w * 8))
                        .astype(np.int32))
    qtab = enc._qtab_p(qp, qp_c)
    lam = jnp.int32(int(tables.LAMBDA_TABLE[qp]))
    mvp0 = jnp.zeros((mb_h, mb_w, 2), jnp.int32)

    def pfull():
        return pipeline.encode_p_cabac(
            mb_h, mb_w, enc._me_range, True, enc._subpel, True, False,
            1, y, u, v, ry, ru, rv, qtab, lam, qp, qp_c, 0, 0, 0, mvp0,
            t8=enc._t8, decimate=True, rd=enc._rd,
            crop_w=w, crop_h=h, with_metrics=True)

    out = jax.block_until_ready(pfull())      # compile
    _ = int(np.asarray(out["host32"][0]))
    t0 = time.time()
    reps = 3
    for _r in range(reps):
        out = pfull()
        # on the tunneled remote backend block_until_ready can return
        # before remote execution finishes (it would misattribute the
        # device time to the first fetch below); a 1-element fetch of
        # an output forces true completion at ~1 RTT of overhead
        _ = int(np.asarray(out["host32"][0]))
    dev_ms = (time.time() - t0) / reps * 1e3

    # d2h: host32 then the halfword-packed op stream in tunnel-safe
    # chunks (hw_pack: ~2 B per typical op instead of 4)
    t0 = time.time()
    h32 = np.asarray(out["host32"])
    n_hw = int(h32[0])
    nw = (n_hw + 1) // 2
    CH = 131072
    parts = []
    for k in range(0, nw, CH):
        parts.append(np.asarray(out["ops"][k:k + CH]))
    words = (np.concatenate(parts)[:nw] if parts
             else np.zeros(0, np.uint32))
    d2h_ms = (time.time() - t0) * 1e3
    d2h_bytes = nw * 4 + h32.nbytes

    # host entropy tail: unpack + native CABAC over the op stream
    t0 = time.time()
    ops = ecabac.unpack_hw(words, n_hw)
    states = ctab.init_states(False, qp, 0)
    ecabac.encode_ops(states, ops, 0xFF)
    host_ms = (time.time() - t0) * 1e3
    return dict(device_ms=round(dev_ms, 1), d2h_ms=round(d2h_ms, 1),
                d2h_bytes=d2h_bytes, host_ms=round(host_ms, 1),
                n_ops=int(len(ops)), n_hw=n_hw)


def cif_tpu_smoke():
    """One-CIF encode + reference-decoder closure ON THE ACTIVE
    BACKEND — catches chip/platform breakage the CPU suite can't
    (round-4 verdict weak #9)."""
    sys.path.insert(0, "tests")
    from refdec.decoder import decode_annexb
    from x264_tpu import EncoderParams, Encoder

    w, h = 352, 288
    frames = make_frames(w, h, 3)
    p = EncoderParams(i_width=w, i_height=h, i_log_level=0)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 28
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    for f in frames:
        ef = enc.encode(f)
        if ef is not None:
            stream += ef.payload
            recons.append(ef.recon)
    for ef in enc.flush():
        stream += ef.payload
        recons.append(ef.recon)
    decoded = decode_annexb(stream)
    for d, r in zip(decoded, recons):
        for pl in ("y", "u", "v"):
            if not np.array_equal(np.asarray(getattr(d, pl), np.int64),
                                  np.asarray(getattr(r, pl), np.int64)):
                return False
    return len(decoded) == len(recons)


def main():
    sys.path.insert(0, ".")
    w, h = 1920, 1080
    frames = make_frames(w, h, N_FRAMES)
    detail = {}

    try:
        ok = cif_tpu_smoke()
        detail["cif_smoke"] = "ok" if ok else "MISMATCH"
        print(f"[bench] CIF smoke (encode+decode closure on this "
              f"backend): {detail['cif_smoke']}", file=sys.stderr)
    except Exception as e:
        detail["cif_smoke"] = f"error: {e}"
        print(f"[bench] CIF smoke failed: {e}", file=sys.stderr)

    fps, bpf, per_frame = run_encoder(frames, w, h, cabac=True,
                                      deblock=True, keyint=250)
    if per_frame:
        detail["frame_ms_min"] = round(min(per_frame) * 1e3, 1)
        detail["frame_ms_median"] = round(
            statistics.median(per_frame) * 1e3, 1)
        detail["frames_timed"] = len(per_frame)
    nmb = ((w + 15) // 16) * ((h + 15) // 16)
    # utilization context: MB throughput vs the level-4.0 decoder
    # ceiling (encoder/set.c:520)
    print(f"[bench] 1080p IPPP CABAC+deblock (t8+decimate+RD): "
          f"{fps:.2f} fps ({bpf / 8:.0f} B/frame); {fps * nmb:.0f} MB/s "
          f"(= {100 * fps * nmb / 245760:.1f}% of the L4.0 245760 MB/s "
          f"rate); frame ms min={detail.get('frame_ms_min')} "
          f"median={detail.get('frame_ms_median')}", file=sys.stderr)

    try:
        detail.update(split_timings(w, h))
        print(f"[bench] P-frame split @1080p: device={detail['device_ms']}"
              f" ms, d2h={detail['d2h_ms']} ms ({detail['d2h_bytes']} B),"
              f" host-tail={detail['host_ms']} ms", file=sys.stderr)
    except Exception as e:
        print(f"[bench] split timing skipped: {e}", file=sys.stderr)

    try:
        fps_ai, _, _ = run_encoder(frames[:5], w, h, cabac=False,
                                   deblock=True, keyint=1)
        detail["all_intra_fps"] = round(fps_ai, 2)
        print(f"[bench] 1080p all-intra CAVLC+deblock: {fps_ai:.2f} fps",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] all-intra detail skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "1080p_ippp_cabac_deblock_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
