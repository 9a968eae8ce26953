"""Rate-distortion comparison vs the reference x264 encoder.

Builds the first PSNR-vs-bitrate evidence for the BASELINE.json north
star ("quality >= x264 defaults"). Protocol per the reference tooling
(x264.c:890-898, encoder/encoder.c:2061-2080): both encoders report
their own global PSNR over the encoder-side reconstruction (== decoder
output, proven separately by the refdec closure tests) and the stream
bitrate.

Usage:
  python tools/rd_compare.py [--ref-bin /tmp/x264ref/x264]
                             [--clip /tmp/rd_cif.y4m] [--qps 22,26,30,34]
                             [--ref-args "..."] [--our-args "..."]

Build the reference binary first (pure C, modern-gcc-safe flags):
  cp -r /root/reference/x264-snapshot-20090216-2245 /tmp/x264ref
  cd /tmp/x264ref && chmod -R u+rwx . && bash ./configure --disable-asm
  sed -i 's/^CFLAGS=.*/& -O1 -fno-strict-aliasing/' config.mak && make
"""

import argparse
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_clip(path, w=352, h=288, n=24, seed=3):
    """Synthetic natural-ish clip: smooth fields + texture + motion."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 60 * np.sin(yy / 23.0) + 50 * np.cos(xx / 31.0))
    tex = rng.normal(0, 6, (h + 64, w + 64))
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
        for t in range(n):
            ox, oy = 2 * t, t
            y = np.clip(base + tex[oy:oy + h, ox:ox + w] * 4
                        + 30 * np.sin((xx + 3 * t) / 17.0)
                        * np.cos((yy - 2 * t) / 13.0), 0, 255) \
                .astype(np.uint8)
            u = np.clip(110 + 40 * np.sin((xx[::2, ::2] + t * 2) / 37.0),
                        0, 255).astype(np.uint8)
            v = np.clip(140 + 40 * np.cos((yy[::2, ::2] - t) / 41.0),
                        0, 255).astype(np.uint8)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def make_clip720(path, w=1280, h=720, n=16, seed=11):
    """Richer 720p synthetic scene (no real footage ships in this
    environment): multi-scale textured background with film grain, a
    global pan, and two locally-moving high-detail objects — exercises
    ME, partitions, AQ (flat sky vs detail) and the 8x8 transform."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    # background: sky gradient + hills (low freq) + grass band (high freq)
    big = rng.normal(0, 1, (h // 16 + 8, w // 16 + 8))
    big = np.repeat(np.repeat(big, 16, 0), 16, 1)
    mid = rng.normal(0, 1, (h // 4 + 32, w // 4 + 32))
    mid = np.repeat(np.repeat(mid, 4, 0), 4, 1)
    fine = rng.normal(0, 1, (h + 64, w + 128))
    obj = (rng.integers(0, 255, (64, 64)) // 2 + 64).astype(np.float64)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
        for t in range(n):
            px = 3 * t                       # global pan
            sky = 170 - yy * 60.0 / h
            hills = 12 * big[8:8 + h, (px // 8):(px // 8) + w]
            band = (yy > h * 0.62)
            grass = band * (10 * mid[16:16 + h, (px // 2):(px // 2) + w]
                            + 14 * fine[32:32 + h, px:px + w])
            y = sky + hills + grass + rng.normal(0, 1.2, (h, w))
            for k, (ox, oy) in enumerate(((200 + 7 * t, 150 + 2 * t),
                                          (800 - 5 * t, 300 + 3 * t))):
                y[oy:oy + 64, ox:ox + 64] = obj + 6 * np.sin(t + k)
            y = np.clip(y, 0, 255).astype(np.uint8)
            u = np.clip(128 - 25 * (1 - yy[::2, ::2] / h)
                        + 6 * mid[:h // 2, px // 2:px // 2 + w // 2],
                        0, 255).astype(np.uint8)
            v = np.clip(118 + 18 * (yy[::2, ::2] / h)
                        + 6 * mid[8:8 + h // 2,
                                  px // 2:px // 2 + w // 2],
                        0, 255).astype(np.uint8)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def run_ref(binary, clip, qp, extra):
    out = subprocess.run(
        [binary, "-q", str(qp), "-o", "/dev/null", clip] + extra,
        capture_output=True, text=True, timeout=600)
    text = out.stdout + out.stderr
    m = re.search(r"PSNR Mean Y:([\d.]+) U:([\d.]+) V:([\d.]+) "
                  r"Avg:([\d.]+) Global:([\d.]+) kb/s:([\d.]+)", text)
    if not m:
        raise RuntimeError(f"no PSNR line in x264 output:\n{text[-800:]}")
    return dict(psnr_y=float(m.group(1)), psnr_avg=float(m.group(4)),
                psnr_glob=float(m.group(5)), kbps=float(m.group(6)))


def run_ours(clip, qp, extra):
    from x264_tpu.params import EncoderParams, RC_CQP
    from x264_tpu.encoder.core import Encoder, Frame
    from x264_tpu.io.y4m import Y4MReader

    r = Y4MReader(clip)
    p = EncoderParams(i_width=r.width, i_height=r.height,
                      i_fps_num=r.fps_num, i_fps_den=r.fps_den,
                      i_log_level=0, i_frame_parallel=2)
    p.rc.i_rc_method = RC_CQP
    p.rc.i_qp_constant = qp
    for kv in extra:
        k, _, val = kv.partition("=")
        p.parse(k, val)
    enc = Encoder(p)
    for (y, u, v) in r:
        enc.encode(Frame(y, u, v))
    enc.flush()
    s = enc.close()
    r.close()
    psnr = s.get("psnr", {})
    return dict(psnr_y=psnr.get("y", 0.0), psnr_avg=psnr.get("avg", 0.0),
                psnr_glob=psnr.get("global", psnr.get("avg", 0.0)),
                kbps=s["kb/s"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-bin", default="/tmp/x264ref/x264")
    ap.add_argument("--clip", default="/tmp/rd_cif.y4m")
    ap.add_argument("--qps", default="22,26,30,34")
    ap.add_argument("--ref-args", default="",
                    help="extra reference CLI args, space separated")
    ap.add_argument("--our-args", default="",
                    help="extra x264_tpu params, name=value space sep")
    ap.add_argument("--res", default="cif", choices=("cif", "720p"),
                    help="which synthetic clip to generate when --clip "
                         "does not exist")
    args = ap.parse_args()

    if args.res == "720p" and args.clip == "/tmp/rd_cif.y4m":
        args.clip = "/tmp/rd_720p.y4m"
    if not os.path.exists(args.clip):
        (make_clip720 if args.res == "720p" else make_clip)(args.clip)
    qps = [int(q) for q in args.qps.split(",")]
    ref_extra = args.ref_args.split() if args.ref_args else []
    our_extra = args.our_args.split() if args.our_args else []

    rows = []
    for qp in qps:
        ref = run_ref(args.ref_bin, args.clip, qp, ref_extra)
        ours = run_ours(args.clip, qp, our_extra)
        rows.append((qp, ref, ours))
        print(f"qp={qp:2d}  ref: {ref['kbps']:8.1f} kb/s "
              f"Y {ref['psnr_y']:6.3f} Avg {ref['psnr_avg']:6.3f}   "
              f"ours: {ours['kbps']:8.1f} kb/s Y {ours['psnr_y']:6.3f} "
              f"Avg {ours['psnr_avg']:6.3f}", flush=True)

    # simple BD-style summary: PSNR-Y delta at matched bitrate via
    # piecewise-linear interpolation of the reference curve
    print()
    for qp, ref, ours in rows:
        refs = sorted((r["kbps"], r["psnr_y"]) for _, r, _ in rows)
        xs = [a for a, _ in refs]
        ys = [b for _, b in refs]
        ref_y_at = np.interp(ours["kbps"], xs, ys)
        print(f"qp={qp:2d}: ours Y {ours['psnr_y']:6.3f} at "
              f"{ours['kbps']:7.1f} kb/s vs ref-interp "
              f"{ref_y_at:6.3f}  (delta {ours['psnr_y'] - ref_y_at:+.3f} dB)")


if __name__ == "__main__":
    main()
