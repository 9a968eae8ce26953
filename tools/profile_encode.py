"""Host-side wall breakdown of one Encoder.encode()+finalize cycle at
1080p on bench content — attributes the gap between device-fused time
and end-to-end fps. Run on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    sys.path.insert(0, ".")
    import bench
    from x264_tpu import EncoderParams, Encoder

    w, h = 1920, 1080
    frames = bench.make_frames(w, h, 8)
    p = EncoderParams(i_width=w, i_height=h, b_cabac=True,
                      b_deblocking_filter=True, i_log_level=0,
                      i_keyint_max=250, i_frame_parallel=2)
    p.rc.i_rc_method = 0
    p.rc.i_qp_constant = 26
    enc = Encoder(p)

    # warm both paths
    enc.encode(frames[0])
    enc.encode(frames[1])
    for ef in enc.flush():
        pass

    # h2d cost of the input (uint8 vs int32)
    yy = frames[2].y
    t0 = time.time(); jax.block_until_ready(jax.device_put(yy))
    t_u8 = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(jax.device_put(yy.astype(np.int32)))
    t_i32 = time.time() - t0
    print(f"h2d y-plane: uint8 {t_u8*1e3:.1f} ms   int32 {t_i32*1e3:.1f} ms")

    import x264_tpu.encoder.core as core

    # instrument one P-frame submit+finalize with syncs
    for i, f in enumerate(frames[2:6]):
        t0 = time.time()
        sc = enc.rc.analyse_frame(f.y, gop_size=enc._since_idr)["scenecut"]
        t_la = time.time() - t0

        t0 = time.time()
        qp = enc.rc.start("P", frame_idx=enc.frame_count)
        enc.poc = 2 * enc._disp_since_idr
        pend = enc._submit_p(f, qp)
        pend["ftype"] = "P"
        pend.update(frame=f, qp=qp, disp=0, rc_rceq=enc.rc.last_rceq,
                    rc_satd=enc.rc.last_satd)
        enc.frame_count += 1
        enc._advance_gop(False)
        t_submit_async = time.time() - t0

        t0 = time.time()
        jax.block_until_ready(pend["out"]["ops"])
        t_device = time.time() - t0

        t0 = time.time()
        n_ops = int(pend["out"]["n_ops"])     # halfword count (hw_pack)
        t_nops = time.time() - t0

        t0 = time.time()
        words = np.asarray(pend["out"]["ops"][:(n_ops + 1) // 2])
        t_d2h = time.time() - t0

        from x264_tpu.entropy import cabac as ecabac
        from x264_tpu.entropy import cabac_tables as ctab
        t0 = time.time()
        ops = ecabac.unpack_hw(words, n_ops)
        states = ctab.init_states(False, qp, 0)
        payload, _ = ecabac.encode_ops(states, ops, pend["hdr_bytes"][-1])
        t_fsm = time.time() - t0

        t0 = time.time()
        n_intra = int(pend["out"]["intra_mb"].sum())
        n_skip = int(pend["out"]["skip"].sum())
        t_counts = time.time() - t0

        from x264_tpu.encoder import stats as estats
        t0 = time.time()
        m = estats.frame_metrics(np.asarray(f.y), np.asarray(f.u),
                                 np.asarray(f.v), pend["recon"].y,
                                 pend["recon"].u, pend["recon"].v, w, h)
        jax.block_until_ready(m)
        t_metrics = time.time() - t0

        print(f"frame {i}: lookahead={t_la*1e3:7.1f} "
              f"submit_async={t_submit_async*1e3:7.1f} "
              f"device_wait={t_device*1e3:7.1f} n_ops={n_ops} "
              f"nops_sync={t_nops*1e3:6.1f} d2h={t_d2h*1e3:7.1f} "
              f"fsm={t_fsm*1e3:6.1f} counts={t_counts*1e3:6.1f} "
              f"metrics={t_metrics*1e3:7.1f} "
              f"payload={len(payload)}")


if __name__ == "__main__":
    main()
