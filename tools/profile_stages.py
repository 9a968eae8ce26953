"""Fine-grained per-stage device timings for the P/I pipelines at 1080p.

Diagnostic tool (checkasm --bench analogue): times each sub-stage of the
fused P-frame program separately so the optimization targets are visible.
Run on the real chip:  python tools/profile_stages.py [WxH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from x264_tpu.encoder import intra, inter, pipeline          # noqa: E402
from x264_tpu.entropy import cabac_planes, device as edev    # noqa: E402
from x264_tpu.ops import me as ome, mc as omc                # noqa: E402
from x264_tpu.ops import deblock as odeblock                 # noqa: E402
from x264_tpu import tables                                  # noqa: E402

I32 = jnp.int32


def timed(f, reps=3, name=None):
    r = jax.block_until_ready(f())  # compile
    t0 = time.time()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    ms = (time.time() - t0) / reps * 1e3
    if name:
        print(f"{name:24s} {ms:10.2f} ms", flush=True)
    return ms


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    w, h = (int(x) for x in wh.split("x"))
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    qp = 26
    qp_c = tables.chroma_qp(qp, 0)
    rng = np.random.default_rng(0)
    mk = lambda hh, ww: jax.device_put(
        rng.integers(0, 255, (hh, ww)).astype(np.int32))
    y, u, v = mk(mb_h * 16, mb_w * 16), mk(mb_h * 8, mb_w * 8), \
        mk(mb_h * 8, mb_w * 8)
    ry, ru, rv = mk(mb_h * 16, mb_w * 16), mk(mb_h * 8, mb_w * 8), \
        mk(mb_h * 8, mb_w * 8)
    qtab = inter.make_qtab_p(qp, qp_c)
    lam = jnp.int32(int(tables.LAMBDA_TABLE[qp]))
    mvp0 = jnp.zeros((mb_h, mb_w, 2), I32)

    res = {}

    # --- ME stages
    pad_jit = jax.jit(lambda r: omc.pad_plane(r))
    ref_pad = jax.block_until_ready(pad_jit(ry))
    res["pad_ref"] = timed(lambda: pad_jit(ry), name="pad_ref")
    hpel_jit = jax.jit(omc.hpel_planes)
    planes = jax.block_until_ready(hpel_jit(ref_pad))
    res["hpel_planes"] = timed(lambda: hpel_jit(ref_pad), name="hpel_planes")
    fp_jit = jax.jit(lambda: ome.fullpel_search(y, ref_pad, mb_h, mb_w,
                                                16, lam, mvp0))
    mv_fp = jax.block_until_ready(fp_jit())[0]
    res["me_fullpel_r16"] = timed(fp_jit, name="me_fullpel_r16")
    hier_jit = jax.jit(lambda: ome.hier_search(y, ref_pad, mb_h, mb_w,
                                               16, lam, mvp0))
    res["me_hier_r16"] = timed(hier_jit, name="me_hier_r16")
    y_tiles = y.reshape(mb_h, 16, mb_w, 16).swapaxes(1, 2)
    sp_jit = jax.jit(lambda: ome.subpel_refine(y_tiles, planes, mv_fp,
                                               lam, mvp0, steps=(2, 1)))
    res["me_subpel"] = timed(sp_jit, name="me_subpel")

    # --- full P body (everything pre-entropy)
    body_jit = jax.jit(lambda: inter.encode_p_body(
        mb_h, mb_w, 16, y, u, v, ry, ru, rv, qtab, lam, mvp0, (2, 1)))

    out = jax.block_until_ready(body_jit())
    res["p_body_total"] = timed(body_jit, name="p_body_total")

    # --- the intra-in-P wavefront alone: body minus parallel stages is
    # hard to isolate; time the all-intra scan as its proxy
    res["i16_i4_wavefront"] = timed(lambda: intra.encode_i16_frame(
        mb_h, mb_w, y, u, v, qtab, lam, True)["recon_y"], name="i16_i4_wavefront")
    res["i16_wavefront"] = timed(lambda: intra.encode_i16_frame(
        mb_h, mb_w, y, u, v, qtab, lam, False)["recon_y"], name="i16_wavefront")

    # --- entropy planes + compaction
    ops_jit = jax.jit(lambda: cabac_planes.p_slice_ops(out, mb_h, mb_w))
    ops = jax.block_until_ready(ops_jit())
    res["cabac_plane_gen"] = timed(ops_jit, name="cabac_plane_gen")
    cap = pipeline.cabac_capacity(mb_h * mb_w)

    comp_jit = jax.jit(lambda o: cabac_planes.compact_ops(o, cap))
    cops, n_ops = jax.block_until_ready(comp_jit(ops))
    res["cabac_compact"] = timed(lambda: comp_jit(ops), name="cabac_compact")

    # --- deblock
    qp_mb = jnp.broadcast_to(jnp.int32(qp), (mb_h, mb_w))
    db_jit = jax.jit(lambda: odeblock.deblock_frame(
        mb_h, mb_w, out["recon_y"], out["recon_u"], out["recon_v"],
        qp_mb, out["intra_mb"], out["nnz4"], out["ref4"], out["mv4"],
        out["ref4"] * 0, out["mv4"] * 0, False, 0, 0, 0))
    res["deblock"] = timed(db_jit, name="deblock")

    # --- fused P + host tail
    fused_jit = lambda: pipeline.encode_p_cabac(
        mb_h, mb_w, 16, True, (2, 1), True, False, 1, y, u, v, ry, ru, rv,
        qtab, lam, qp, qp_c, 0, 0, 0, mvp0)
    o2 = fused_jit()
    jax.block_until_ready(o2["ops"])
    res["p_cabac_fused_total"] = timed(lambda: fused_jit()["ops"], name="p_cabac_fused_total")

    n = int(o2["n_ops"])
    t0 = time.time()
    ops_host = np.asarray(o2["ops"][:n])
    res["d2h_ops_transfer"] = (time.time() - t0) * 1e3
    res["n_ops"] = n

    from x264_tpu.entropy import cabac as ecabac
    from x264_tpu.entropy import cabac_tables as ctab
    states = ctab.init_states(False, qp, 0)
    t0 = time.time()
    payload, _ = ecabac.encode_ops(states, ops_host, 0)
    res["host_cabac_fsm"] = (time.time() - t0) * 1e3
    res["payload_bytes"] = len(payload)

    for k, val in res.items():
        unit = "" if k in ("n_ops", "payload_bytes") else " ms"
        print(f"{k:24s} {val:10.2f}{unit}")


if __name__ == "__main__":
    main()
