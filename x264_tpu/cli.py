"""Command-line front-end — the analogue of x264.c (main:88, Parse, Encode).

Usage:
    python -m x264_tpu.cli input.y4m -o out.264 [options]
    python -m x264_tpu.cli input.yuv --input-res 352x288 -o out.264 --qp 26
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .params import EncoderParams, RC_CQP, RC_CRF, RC_ABR, ME_NAMES
from .encoder.core import Encoder, Frame
from .io.y4m import Y4MReader, YUVReader, write_y4m


def build_argparser():
    ap = argparse.ArgumentParser(
        prog="x264_tpu", description="TPU-native H.264 encoder")
    ap.add_argument("input", help="input .y4m or raw .yuv (i420)")
    ap.add_argument("-o", "--output", required=True, help="output .264")
    ap.add_argument("--input-res", help="WxH for raw YUV input")
    ap.add_argument("--threaded-input", action="store_true",
                    help="read-ahead input thread (open_file_thread, "
                    "muxers.c:441)")
    ap.add_argument("--fps", type=float, default=None)
    ap.add_argument("--frames", type=int, default=0,
                    help="max frames to encode (0 = all)")
    # rate control
    ap.add_argument("-q", "--qp", type=int, default=None,
                    help="constant QP (CQP mode)")
    ap.add_argument("--crf", type=float, default=None)
    ap.add_argument("-B", "--bitrate", type=int, default=None)
    ap.add_argument("-p", "--pass", dest="rc_pass", type=int, choices=(1, 2),
                    default=None, help="2-pass mode: 1 = write stats, "
                    "2 = read stats (x264 -p)")
    ap.add_argument("--stats", default="x264_tpu_2pass.log",
                    help="2-pass stats file path")
    ap.add_argument("--scenecut", type=int, default=40,
                    help="scenecut threshold (0 = off)")
    ap.add_argument("--qpfile", default=None,
                    help="force frame types/QPs from a file of "
                    "'<frame> <type> <qp>' lines (x264 --qpfile)")
    ap.add_argument("--zones", default=None,
                    help="start,end,q=N or start,end,b=F zones "
                    "(x264 --zones; / separated)")
    # structure
    ap.add_argument("-I", "--keyint", type=int, default=250)
    ap.add_argument("-i", "--min-keyint", type=int, default=25)
    ap.add_argument("-b", "--bframes", type=int, default=0)
    ap.add_argument("-r", "--ref", type=int, default=1)
    # features
    ap.add_argument("--no-cabac", action="store_true")
    ap.add_argument("--no-deblock", action="store_true")
    ap.add_argument("--no-8x8dct", action="store_true")
    ap.add_argument("-m", "--subme", type=int, default=6)
    ap.add_argument("--me", choices=ME_NAMES, default="hex")
    ap.add_argument("--merange", type=int, default=16)
    ap.add_argument("--trellis", type=int, default=0)
    ap.add_argument("--nr", type=int, default=0,
                    help="noise reduction strength (0 off)")
    ap.add_argument("--cqm", choices=("flat", "jvt"), default="flat",
                    help="quantization matrix preset")
    ap.add_argument("--cqmfile", default=None,
                    help="JM-format custom quantization matrix file")
    ap.add_argument("--aq-mode", type=int, default=1)
    ap.add_argument("--aq-strength", type=float, default=1.0)
    ap.add_argument("--psy-rd", type=float, default=1.0,
                    help="psychovisual RD strength (needs subme >= 6)")
    ap.add_argument("--b-adapt", type=int, default=1, choices=(0, 1, 2),
                    help="adaptive B placement (0 off, 1 fast greedy)")
    ap.add_argument("--b-bias", type=int, default=0,
                    help="bias toward B frames (-100..100)")
    ap.add_argument("--no-dct-decimate", action="store_true")
    ap.add_argument("--no-fast-pskip", action="store_true")
    ap.add_argument("--no-psnr", action="store_true")
    ap.add_argument("--no-ssim", action="store_true")
    ap.add_argument("--ipratio", type=float, default=1.4)
    ap.add_argument("--pbratio", type=float, default=1.3)
    ap.add_argument("--chroma-qp-offset", type=int, default=0)
    ap.add_argument("--qpmin", type=int, default=10)
    ap.add_argument("--qpmax", type=int, default=51)
    ap.add_argument("--qpstep", type=int, default=4)
    ap.add_argument("--ratetol", type=float, default=1.0)
    ap.add_argument("--qcomp", type=float, default=0.6)
    ap.add_argument("--vbv-maxrate", type=int, default=0)
    ap.add_argument("--vbv-bufsize", type=int, default=0)
    ap.add_argument("--vbv-init", type=float, default=0.9)
    ap.add_argument("--deadzone-inter", type=int, default=21)
    ap.add_argument("--deadzone-intra", type=int, default=11)
    ap.add_argument("--level", type=int, default=-1,
                    help="level_idc * 10 (e.g. 40 for 4.0); -1 = auto")
    ap.add_argument("--deblock-params", default="0:0", metavar="A:B",
                    help="deblock alpha:beta offsets (x264 -f)")
    ap.add_argument("--sar", default=None, metavar="W:H",
                    help="sample aspect ratio (VUI)")
    ap.add_argument("--fullrange", action="store_true",
                    help="full-range samples (VUI)")
    ap.add_argument("--shards", type=int, default=1,
                    help="MB-row device shards (slice-per-band "
                    "multi-chip path)")
    ap.add_argument("-A", "--partitions", default="default",
                    help="partitions: comma list of "
                    "p8x8,p4x4,b8x8,i8x8,i4x4 / all / none "
                    "(p8x8 covers 16x8/8x16/8x8, as x264)")
    ap.add_argument("--frame-parallel", type=int, default=2,
                    help="frames in flight (device compute overlaps the "
                    "host entropy tail; the i_threads frame-pipeline "
                    "analogue, doc/threads.txt)")
    # debug
    ap.add_argument("--dump-yuv", help="write reconstruction to .y4m "
                    "(doc/regression_test.txt flow)")
    ap.add_argument("--quiet", action="store_true")
    return ap


def params_from_args(args, width, height, fps_num, fps_den) -> EncoderParams:
    p = EncoderParams(i_width=width, i_height=height,
                      i_fps_num=fps_num, i_fps_den=fps_den)
    if args.qp is not None:
        p.rc.i_rc_method = RC_CQP
        p.rc.i_qp_constant = args.qp
    elif args.bitrate is not None:
        p.rc.i_rc_method = RC_ABR
        p.rc.i_bitrate = args.bitrate
    elif args.crf is not None:
        p.rc.i_rc_method = RC_CRF
        p.rc.f_rf_constant = args.crf
    p.i_keyint_max = args.keyint
    p.i_keyint_min = args.min_keyint
    p.i_bframe = args.bframes
    p.i_frame_reference = args.ref
    p.b_cabac = not args.no_cabac
    p.b_deblocking_filter = not args.no_deblock
    p.analyse.b_transform_8x8 = not args.no_8x8dct
    p.analyse.i_subpel_refine = args.subme
    p.analyse.i_me_method = ME_NAMES.index(args.me)
    p.analyse.i_me_range = args.merange
    p.analyse.i_trellis = args.trellis
    p.analyse.i_noise_reduction = args.nr
    p.i_cqm_preset = {"flat": 0, "jvt": 1}[args.cqm]
    if args.cqmfile:
        p.psz_cqm_file = args.cqmfile
    p.rc.i_aq_mode = args.aq_mode
    p.rc.f_aq_strength = args.aq_strength
    p.analyse.f_psy_rd = args.psy_rd
    p.i_bframe_adaptive = args.b_adapt
    p.i_bframe_bias = max(-100, min(100, args.b_bias))
    p.analyse.b_dct_decimate = not args.no_dct_decimate
    p.analyse.b_fast_pskip = not args.no_fast_pskip
    p.analyse.b_psnr = not args.no_psnr
    p.analyse.b_ssim = not args.no_ssim
    p.rc.f_ip_factor = args.ipratio
    p.rc.f_pb_factor = args.pbratio
    p.analyse.i_chroma_qp_offset = args.chroma_qp_offset
    p.rc.i_qp_min = args.qpmin
    p.rc.i_qp_max = args.qpmax
    p.rc.i_qp_step = args.qpstep
    p.rc.f_rate_tolerance = args.ratetol
    p.rc.f_qcompress = args.qcomp
    p.rc.i_vbv_max_bitrate = args.vbv_maxrate
    p.rc.i_vbv_buffer_size = args.vbv_bufsize
    p.rc.f_vbv_buffer_init = args.vbv_init
    p.analyse.i_luma_deadzone = (args.deadzone_inter,
                                 args.deadzone_intra)
    p.i_level_idc = args.level
    try:
        a_off, b_off = args.deblock_params.split(":")
        p.i_deblocking_filter_alphac0 = int(a_off)
        p.i_deblocking_filter_beta = int(b_off)
    except ValueError:
        pass
    p.i_mb_row_shards = args.shards
    if args.sar:
        try:
            sw, sh = args.sar.split(":")
            p.vui_sar_width, p.vui_sar_height = int(sw), int(sh)
        except ValueError:
            pass
    p.vui_b_fullrange = args.fullrange
    if args.partitions != "default":
        from .params import (ANALYSE_I4x4, ANALYSE_I8x8,
                             ANALYSE_PSUB16x16, ANALYSE_PSUB8x8,
                             ANALYSE_BSUB16x16)
        toks = {t.strip() for t in args.partitions.split(",")}
        if "all" in toks:
            flags = (ANALYSE_I4x4 | ANALYSE_I8x8 | ANALYSE_PSUB16x16
                     | ANALYSE_PSUB8x8 | ANALYSE_BSUB16x16)
        elif "none" in toks:
            flags = 0
        else:
            flags = 0
            if "i4x4" in toks:
                flags |= ANALYSE_I4x4
            if "i8x8" in toks:
                flags |= ANALYSE_I8x8
            if "p8x8" in toks:
                flags |= ANALYSE_PSUB16x16
            if "p4x4" in toks:
                flags |= ANALYSE_PSUB16x16 | ANALYSE_PSUB8x8
            if "b8x8" in toks:
                flags |= ANALYSE_BSUB16x16
        p.analyse.inter = flags
        p.analyse.intra = flags & (ANALYSE_I4x4 | ANALYSE_I8x8)
    p.i_scenecut_threshold = args.scenecut
    p.i_frame_parallel = args.frame_parallel
    if args.rc_pass == 1:
        p.rc.b_stat_write = True
        p.rc.psz_stat_out = args.stats
    elif args.rc_pass == 2:
        p.rc.b_stat_read = True
        p.rc.psz_stat_in = args.stats
    return p


def parse_qpfile(path):
    """parse_qpfile (x264.c:711-746): '<frame> <type> <qp>' lines;
    type in I/i/P (K = IDR alias); qp -1 = let RC choose."""
    forced = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            n = int(parts[0])
            t = {"I": "IDR", "K": "IDR", "i": "I", "P": "P"}.get(
                parts[1], None)
            qp = int(parts[2]) if len(parts) > 2 else -1
            forced[n] = (t, None if qp < 0 else qp)
    return forced


def parse_zones(spec):
    """--zones start,end,q=N / start,end,b=F (x264_ratecontrol zones,
    encoder/ratecontrol.c:601-715; only QP/bitrate-factor overrides)."""
    zones = []
    for z in spec.split("/"):
        parts = z.split(",")
        start, end = int(parts[0]), int(parts[1])
        opt = parts[2]
        if opt.startswith("q="):
            zones.append((start, end, "q", int(opt[2:])))
        elif opt.startswith("b="):
            zones.append((start, end, "b", float(opt[2:])))
        else:
            raise ValueError(f"bad zone: {z}")
    return zones


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.input.endswith(".y4m"):
        reader = Y4MReader(args.input)
        width, height = reader.width, reader.height
        fps_num, fps_den = reader.fps_num, reader.fps_den
    else:
        if not args.input_res:
            print("raw YUV input requires --input-res WxH", file=sys.stderr)
            return 1
        w, h = args.input_res.lower().split("x")
        width, height = int(w), int(h)
        fps_num, fps_den = 25, 1
        reader = YUVReader(args.input, width, height)
    if args.threaded_input:
        from .io.reader import ThreadedReader
        reader = ThreadedReader(reader)
    if args.fps:
        fps_num, fps_den = int(args.fps * 1000), 1000

    p = params_from_args(args, width, height, fps_num, fps_den)
    enc = Encoder(p)

    t0 = time.time()
    n = 0
    total_bits = 0
    recons = []
    # output container dispatch on extension (the p_write_nalu /
    # mux fn-pointer slots of x264.c:68-78; .264 = write_nalu_bsf,
    # .mkv = the matroska writer, .mp4 = the BMFF writer)
    mkv = None
    with open(args.output, "wb") as out:
        if args.output.endswith(".mkv"):
            from .io.mkv import MKVWriter
            mkv = MKVWriter(out, width, height, fps_num, fps_den)
            mkv.set_headers(enc.headers())
        elif args.output.endswith(".mp4"):
            from .io.mp4 import MP4Writer
            mkv = MP4Writer(out, width, height, fps_num, fps_den)
            mkv.set_headers(enc.headers())
        else:
            out.write(enc.headers())
        qpfile = parse_qpfile(args.qpfile) if args.qpfile else {}
        if args.zones:
            # zones live inside RC (get_qscale order) so a bitrate-factor
            # zone scales the frame qscale once instead of compounding
            enc.rc.zones = parse_zones(args.zones)
        def emit(ef):
            nonlocal total_bits
            if ef is None:      # frame delayed in the pipeline
                return
            if mkv is not None:
                mkv.write_frame(ef.payload, ef.frame_type == "IDR",
                                ef.display_idx)
            else:
                out.write(ef.payload)
            total_bits += ef.bits
            if args.dump_yuv:
                recons.append((ef.display_idx,
                               (ef.recon.y, ef.recon.u, ef.recon.v)))

        for (y, u, v) in reader:
            ftype, fqp = qpfile.get(n, (None, None))
            emit(enc.encode(Frame(y, u, v), forced_type=ftype,
                            forced_qp=fqp))
            n += 1
            if not args.quiet and n % 10 == 0:
                el = time.time() - t0
                print(f"\r{n} frames, {n/el:.2f} fps", end="", file=sys.stderr)
            if args.frames and n >= args.frames:
                break
        for ef in enc.flush():   # drain delayed frames (x264.c:870-873)
            emit(ef)
        if mkv is not None:
            mkv.close()
    el = time.time() - t0
    fps = fps_num / fps_den
    kbps = total_bits * fps / max(n, 1) / 1000
    if not args.quiet:
        print(f"\nencoded {n} frames, {n/max(el,1e-9):.2f} fps, "
              f"{kbps:.2f} kb/s", file=sys.stderr)
    enc.close()   # prints the PSNR/SSIM/frame-type report (x264_print_stats)
    if args.dump_yuv:
        # display order (B-frames are delivered in decode order)
        ordered = [r for _, r in sorted(recons, key=lambda t: t[0])]
        write_y4m(args.dump_yuv, ordered, width, height,
                  (fps_num, fps_den))
    reader.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
