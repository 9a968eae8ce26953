"""Encoder orchestration — the analogue of encoder/encoder.c.

Open/encode/close lifecycle (x264_encoder_open:623, x264_encoder_encode:1362,
x264_encoder_close:1878): parameter validation, header generation, frame-type
decision, dispatch of per-frame work to the jitted TPU pipelines, and
entropy-coding + NAL assembly of the device-produced coefficient planes.
"""

from __future__ import annotations

import numpy as np

from ..params import EncoderParams, RC_CQP
from .. import tables
from . import ratecontrol as rcmod
from ..headers import SPS, PPS, SliceHeader, SLICE_I, SLICE_P
from ..entropy.bitstream import BitWriter, nal_unit, NAL_SLICE_IDR, NAL_SLICE
from ..entropy.cavlc_vec import i16_slice_codes as cavlc_vec_i16_slice
from ..entropy import device as edev
from ..ops import deblock as odeblock
from . import intra
from . import inter
from . import pipeline
from . import stats as estats


def pad_plane(plane: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Edge-replicate to MB-aligned size (expand_border_mod16,
    common/frame.c:310-330)."""
    h, w = plane.shape
    out = np.empty((target_h, target_w), dtype=plane.dtype)
    out[:h, :w] = plane
    if w < target_w:
        out[:h, w:] = plane[:, w - 1:w]
    if h < target_h:
        out[h:, :] = out[h - 1:h, :]
    return out


class Frame:
    """A picture in planar 8-bit 4:2:0 (x264_picture_t analogue)."""

    def __init__(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        self.y, self.u, self.v = y, u, v

    @property
    def shape(self):
        return self.y.shape


class EncodedFrame:
    def __init__(self, payload: bytes, frame_type: str, recon: Frame,
                 bits: int, display_idx: int = -1):
        self.payload = payload
        self.frame_type = frame_type
        self.recon = recon
        self.bits = bits
        # display (input) order index: with B-frames the encode/decode
        # order differs; muxers and --dump-yuv key on this
        self.display_idx = display_idx


class Encoder:
    """x264_encoder_open / encode / close."""

    def __init__(self, params: EncoderParams):
        self.params = params.validate()
        p = self.params
        self.sps = SPS.from_params(p)
        self.pps = PPS.from_params(p)
        self.frame_num = 0
        self.idr_pic_id = 0
        self.poc = 0
        self.frame_count = 0
        from .. import cqm as xcqm
        _sl4, _sl8 = xcqm.scaling_lists(p.i_cqm_preset, p.cqm)
        self.qt = tables.QuantTables(
            luma_deadzone_inter=p.analyse.i_luma_deadzone[0],
            luma_deadzone_intra=p.analyse.i_luma_deadzone[1],
            scaling_list4=_sl4, scaling_list8=_sl8)
        self._qtab_cache = {}
        self._qtab_p_cache = {}
        # DPB: deblocked reconstruction of the reference frame + the MV
        # field used to seed the next frame's ME (device-resident)
        self._ref = None
        self._prev_mv = None
        self._gop_pos = 0
        self._last_mb_counts = None
        # ME window clamped so every candidate + subpel tap stays inside
        # the PAD=32 frame border (the reference instead clamps per-MB,
        # x264_mb_analyse_init, encoder/analyse.c:220)
        self._me_range = min(p.analyse.i_me_range, 24)
        from ..params import ANALYSE_I4x4
        self._i4x4 = bool(p.analyse.intra & ANALYSE_I4x4)
        # subme ladder -> sub-pel refinement stages (the subpel_iterations
        # table role, encoder/me.c:34-44): 1 = full-pel, 2-3 = half-pel,
        # >=4 = half+quarter
        from ..params import ANALYSE_PSUB16x16, RC_CQP as _CQP
        self._parts = bool(p.analyse.inter & ANALYSE_PSUB16x16)
        # P8x8 belongs to PSUB16x16 (x264.h: "p16x8, p8x16, p8x8") and
        # is therefore on in the reference defaults; sub-8x8 splits
        # (PSUB8x8) are not built (validate logs)
        self._p8x8 = self._parts
        # adaptive 8x8 transform (High profile; CABAC P slices v1)
        self._t8 = bool(p.analyse.b_transform_8x8)
        # I8x8 intra ladder in I slices (High profile; params gates it
        # to CABAC + t8 + unsharded)
        from ..params import ANALYSE_I8x8
        self._i8x8 = bool(p.analyse.intra & ANALYSE_I8x8)
        # variance AQ (per-MB QP + mb_qp_delta syntax)
        from ..params import AQ_NONE
        self._aq = p.rc.i_aq_mode != AQ_NONE
        self._full_tabs = None
        if self._aq or (p.rc.i_vbv_buffer_size > 0
                        and p.rc.i_vbv_max_bitrate > 0):
            # full 52-QP table stacks: needed for per-MB QP rows by
            # variance AQ and/or the row-RC VBV profile
            from . import aq as eaq
            import jax.numpy as jnp
            self._full_tabs = eaq.full_tables(self.qt)
            self._aq_strength = jnp.float32(p.rc.f_aq_strength)
            self._aq_kw = dict(aq=self._aq,
                               aq_qp_min=int(p.rc.i_qp_min),
                               aq_qp_max=int(p.rc.i_qp_max))
        else:
            self._aq_kw = {}
        # lossless transform bypass (qpprime_y_zero_transform_bypass;
        # encoder/macroblock.c:415-474)
        self._lossless = (p.rc.i_rc_method == _CQP
                          and p.rc.i_qp_constant == 0)
        # per-row VBV QP adaptation (x264_ratecontrol_mb analogue,
        # planned pre-encode; P frames, unsharded path)
        self._rowrc = (p.rc.i_vbv_buffer_size > 0
                       and p.rc.i_vbv_max_bitrate > 0
                       and p.i_mb_row_shards <= 1)
        # 52-QP trellis const stacks (built lazily when AQ + trellis)
        self._trellis_full = None
        sp = p.analyse.i_subpel_refine
        self._subpel = () if sp <= 1 else ((2,) if sp <= 3 else (2, 1))
        # subme >= 6 enables the true RD-cost mode decision ladder
        # (i_mbrd, x264_mb_analyse_init semantics)
        self._rd = sp >= 6 and not self._lossless
        # chroma ME term in the sub-pel refine (b_chroma_me at
        # subme >= 5, the reference's own gate)
        self._chroma_me = bool(p.analyse.b_chroma_me and sp >= 5)
        # MB-row sharding across devices: one slice per row band
        # (parallel/rows.py; the i_threads/slice-threading analogue)
        self._rows_mesh = None
        if p.i_mb_row_shards > 1:
            import jax
            n = min(p.i_mb_row_shards, len(jax.devices()))
            mb_h0 = (p.i_height + 15) // 16
            # uneven mb_height: pad the coded height to a band multiple
            # (edge-replicated rows hidden by the SPS crop window) —
            # but each band must still be >= 2 MB rows (band*16 >= the
            # 32-px halo the ppermute exchange carries)
            while n > 1 and ((mb_h0 + (-mb_h0 % n)) // n) * 16 < 32:
                n -= 1
            if n > 1:
                p.i_mb_height_pad = -mb_h0 % n
                if p.i_mb_height_pad and p.i_log_level >= 2:
                    from .. import log as xlog
                    xlog.log(xlog.LOG_INFO,
                             f"padding coded height by "
                             f"{p.i_mb_height_pad} MB rows so "
                             f"{mb_h0} rows split across {n} bands "
                             "(cropped by the SPS window)")
                from ..parallel import rows as prows
                self._rows_mesh = prows.make_rows_mesh(n)
                self._n_shards = n
            elif p.i_log_level >= 2:
                from .. import log as xlog
                xlog.log(xlog.LOG_INFO, "mb-row sharding unavailable "
                         f"(shards={p.i_mb_row_shards}, "
                         f"mb_h={mb_h0}); encoding unsharded")
        # noise reduction (x264_denoise_dct, common/quant.c:180 +
        # x264_noise_reduction_update, encoder/macroblock.c:890):
        # adaptive per-position coefficient shrinkage on inter luma
        self._nr = int(p.analyse.i_noise_reduction)
        if self._nr and (self._rows_mesh is not None or self._lossless):
            from .. import log as xlog
            xlog.log(xlog.LOG_INFO, "noise reduction is off in the "
                     "sharded/lossless paths")
            self._nr = 0
        if self._nr:
            from ..ops import quant as _oq
            self._nr_w = _oq.nr_weight2()
            self._nr_sum = [np.zeros(16, np.float64),
                            np.zeros(64, np.float64)]
            self._nr_cnt = [0.0, 0.0]
            self._nr_off = [np.zeros(16, np.int32),
                            np.zeros(64, np.int32)]
        self.stats = estats.Stats(
            p.i_width, p.i_height, p.i_fps_num / max(1, p.i_fps_den),
            b_psnr=p.analyse.b_psnr, b_ssim=p.analyse.b_ssim)
        # PSNR/SSIM computed inside the fused pipelines; everything the
        # host needs per frame crosses in one host32 vector (each d2h
        # costs ~25-60ms latency on tunneled devices)
        self._with_metrics = bool(p.analyse.b_psnr or p.analyse.b_ssim)
        self._crop = dict(crop_w=p.i_width, crop_h=p.i_height,
                          with_metrics=self._with_metrics)
        # frame pipelining (the doc/threads.txt frame-thread analogue):
        # with i_frame_parallel > 1, encode() submits the device program
        # and returns the *previous* frame once its host entropy tail is
        # done — the serial CABAC/CAVLC host work for frame N-1 then
        # overlaps the device compute of frame N (async dispatch).
        # Delayed-output contract matches x264_encoder_encode (a call may
        # return no frame; flush() drains, x264.c:870-873).
        self._pending: list = []
        self._delay = max(0, p.i_frame_parallel - 1)
        if self._rows_mesh is not None and not p.b_cabac:
            self._delay = 0   # sharded CAVLC finalizes synchronously
        # B-frame state: one display-buffered candidate (x264 delays
        # inputs in frames.next until slicetype_decide promotes them,
        # encoder/encoder.c:1423-1457); _prev_ref is the past reference
        # (L0) once the future reference (L1 = _ref) is encoded
        self._bframes = p.i_bframe
        self._bqueue = []
        # adaptive B placement over device lowres costs: b-adapt 1 is
        # the fast greedy (slicetype.c:545-573), b-adapt 2 the
        # exhaustive path search over the queued window
        # (x264_slicetype_path, slicetype.c:395-434); both use
        # lowres-seeded B ME
        from ..params import B_ADAPT_NONE, B_ADAPT_TRELLIS
        self._badapt = (self._bframes > 0
                        and p.i_bframe_adaptive != B_ADAPT_NONE)
        self._badapt2 = (self._bframes > 0
                         and p.i_bframe_adaptive == B_ADAPT_TRELLIS)
        self._la_ref_lows = None    # lowres planes of last non-B ref
        self._la_prev_lows = None   # ... of the reference before it
        self._la_bh = p.mb_height
        self._la_bw = p.mb_width
        self._la_r = max(4, min(12, p.analyse.i_me_range // 2))
        self._prev_ref = None
        self._ref_maps = None   # (ref4, mv4) of _ref, for B direct
        self._disp_since_idr = 0
        self._disp_abs = 0       # absolute display (input) counter
        # rate control (x264_ratecontrol_new, encoder/ratecontrol.c:267)
        self.rc = rcmod.RateControl(p)
        self._since_idr = 0
        # lowres analysis is needed for non-CQP RC (complexity) and for
        # scenecut detection; skip it when neither applies
        self._analyse_lowres = (p.rc.i_rc_method != RC_CQP
                                or (p.i_scenecut_threshold > 0
                                    and p.i_keyint_max > 1))

    # ----------------------------------------------------------- reconfig
    def reconfig(self, new_params: EncoderParams) -> None:
        """x264_encoder_reconfig (encoder/encoder.c:816-879): apply the
        runtime-changeable subset of parameters mid-stream — analysis
        strength, deblock offsets, ME range/subme and the RC targets.
        Stream-structural fields (geometry, entropy coder, GOP layout,
        profile-affecting features) keep their open-time values, as the
        reference's copy-list does."""
        p, q = self.params, new_params
        a, b = p.analyse, q.analyse
        a.i_me_range = max(4, min(64, b.i_me_range))
        a.i_subpel_refine = max(1, min(9, b.i_subpel_refine))
        a.i_me_method = b.i_me_method
        a.b_psnr, a.b_ssim = b.b_psnr, b.b_ssim
        a.f_psy_rd = b.f_psy_rd
        p.i_deblocking_filter_alphac0 = max(
            -6, min(6, q.i_deblocking_filter_alphac0))
        p.i_deblocking_filter_beta = max(
            -6, min(6, q.i_deblocking_filter_beta))
        p.b_deblocking_filter = q.b_deblocking_filter
        p.i_scenecut_threshold = q.i_scenecut_threshold
        p.rc.i_qp_min = max(0, min(51, q.rc.i_qp_min))
        p.rc.i_qp_max = max(p.rc.i_qp_min, min(51, q.rc.i_qp_max))
        if p.rc.i_rc_method == q.rc.i_rc_method:
            p.rc.i_qp_constant = max(0, min(51, q.rc.i_qp_constant))
            p.rc.f_rf_constant = q.rc.f_rf_constant
            self.rc.reconfig(p)
        # derived state that tracks the reconfigured fields
        self._me_range = min(a.i_me_range, 24)
        sp = a.i_subpel_refine
        self._subpel = () if sp <= 1 else ((2,) if sp <= 3 else (2, 1))
        self._rd = sp >= 6 and not self._lossless
        self._chroma_me = bool(a.b_chroma_me and sp >= 5)
        self._with_metrics = bool(a.b_psnr or a.b_ssim)
        self._crop["with_metrics"] = self._with_metrics

    # ------------------------------------------------------------- headers
    def headers(self) -> bytes:
        """x264_encoder_headers: SPS + PPS + version SEI NALs
        (encoder/encoder.c:880-910 + x264_sei_version_write)."""
        from ..headers import sei_version
        return (self.sps.write() + self.pps.write()
                + sei_version(self.params.to_string()))

    # ------------------------------------------------------------- encode
    def encode(self, frame: Frame, forced_type: str | None = None,
               forced_qp: int | None = None) -> EncodedFrame | None:
        """x264_encoder_encode: frame-type decision (keyint GOP, scenecut
        IDR refresh, qpfile forcing via forced_type/forced_qp —
        parse_qpfile, x264.c:711) + per-type pipeline.

        With i_frame_parallel > 1 this submits the device program and
        returns an *earlier* frame (or None while the pipe fills) so the
        host entropy tail overlaps device compute — the frame-pipeline
        of doc/threads.txt:10-17. Call flush() to drain.
        """
        p = self.params
        scenecut = False
        if self._analyse_lowres:
            scenecut = self.rc.analyse_frame(
                frame.y, gop_size=self._since_idr)["scenecut"]
        if forced_type in ("I", "IDR"):
            is_idr = True
        elif forced_type == "P" and self._ref is not None:
            is_idr = False
        else:
            is_idr = (self._gop_pos == 0 or self._ref is None
                      or p.i_keyint_max == 1
                      or (scenecut and self._since_idr >= p.i_keyint_min))

        disp_poc = 2 * self._disp_since_idr
        disp_abs = self._disp_abs
        self._disp_abs += 1
        if self._bframes > 0:
            # Ib..bP orchestration: up to i_bframe non-sync frames wait
            # in _bqueue until their future reference is encoded (x264
            # frames.next delay + reorder, encoder/encoder.c:1423-1457);
            # an IDR closes the GOP by promoting the newest queued
            # candidate to P first (closing-GOP B->P demotion,
            # slicetype.c:597-635). With b-adapt the queue grows only
            # while the lowres greedy says B pays (slicetype.c:545-573).
            if is_idr:
                self._flush_bqueue()
                self._advance_gop(True)
                self._submit_ip(frame, True, forced_qp, 0, disp_abs)
            elif (forced_type == "P"
                  or (not self._badapt2
                      and len(self._bqueue) >= self._bframes)):
                self._submit_ip(frame, False, forced_qp, disp_poc,
                                disp_abs)
                self._advance_gop(False)
                self._submit_bqueue()
            elif self._badapt2 and self._ref is not None:
                self._badapt2_step(frame, forced_qp, disp_poc, disp_abs)
                self._advance_gop(False)
            elif self._badapt and self._ref is not None:
                self._badapt_step(frame, forced_qp, disp_poc, disp_abs)
                self._advance_gop(False)
            else:
                self._bqueue.append((frame, forced_qp, disp_poc,
                                     disp_abs, None))
                self._advance_gop(False)
        else:
            if is_idr:
                self._advance_gop(True)
                self._submit_ip(frame, True, forced_qp, 0, disp_abs)
            else:
                self._advance_gop(False)
                self._submit_ip(frame, False, forced_qp, disp_poc,
                                disp_abs)

        if len(self._pending) > self._delay:
            return self._finalize(self._pending.pop(0))
        return None

    def _lowres(self, frame: Frame):
        """Phase lowres planes of a source frame (h2d as a flat array —
        the cheap layout on tunneled devices)."""
        from . import lookahead as la
        y = np.asarray(frame.y, np.uint8)
        return la.lowres_planes_flat(y.ravel(), y.shape[0], y.shape[1])

    def _badapt_step(self, frame: Frame, fqp, poc: int, disp: int):
        """One b-adapt-fast greedy step (slicetype.c:545-573) over the
        device lowres costs: decide whether this frame extends the B
        run, closes it as a P, or — at the first test — demotes the
        queued candidate to P."""
        from . import lookahead as la
        lows = self._lowres(frame)
        q = self._bqueue
        if not q or self._la_ref_lows is None:
            q.append((frame, fqp, poc, disp, lows))
            return
        bh, bw, r = self._la_bh, self._la_bw, self._la_r
        if len(q) == 1:
            c = np.asarray(la.badapt_first_fused(
                q[0][4], lows, self._la_ref_lows, bh, bw, r))
            cost1p0, cost2p0, cost1b1, cost2p1, n_intra2 = \
                (int(x) for x in c)
            nblk = ((bh - 2) * (bw - 2) if min(bh, bw) > 2
                    else bh * bw)
            if (n_intra2 > nblk // 2
                    or cost1p0 + cost2p0 < cost1b1 + cost2p1):
                # the candidate becomes a P; this frame starts the
                # next segment's queue (slicetype.c no_b_frames)
                f1 = q.pop(0)
                self._submit_ip(f1[0], False, f1[1], f1[2], f1[3],
                                lows=f1[4])
                q.append((frame, fqp, poc, disp, lows))
                return
        j = len(q) + 1
        c = np.asarray(la.badapt_ext_fused(lows, self._la_ref_lows,
                                           bh, bw, r))
        pcost, n_intra, nblk = (int(x) for x in c)
        bias = self.params.i_bframe_bias
        pthresh = max(la.INTER_THRESH - (50 - bias) * (j - 1),
                      la.INTER_THRESH // 10)
        if pcost > pthresh * nblk or n_intra > nblk // 3:
            self._submit_ip(frame, False, fqp, poc, disp, lows=lows)
            self._submit_bqueue()
        else:
            q.append((frame, fqp, poc, disp, lows))

    def _badapt2_step(self, frame: Frame, fqp, poc: int, disp: int):
        """b-adapt-2: queue up to i_bframe+1 undecided frames, then run
        the exhaustive path search (x264_slicetype_path semantics,
        slicetype.c:395-434) over the window and commit its FIRST
        segment (the reference also only commits the leading decision
        and re-searches as the lookahead refills)."""
        lows = self._lowres(frame)
        q = self._bqueue
        q.append((frame, fqp, poc, disp, lows))
        if self._la_ref_lows is None:
            f = q.pop(0)
            self._submit_ip(f[0], False, f[1], f[2], f[3], lows=f[4])
            return
        if len(q) <= self._bframes:
            return
        self._badapt2_decide()

    def _badapt2_decide(self):
        """Pick the cheapest segmentation of the queued window into
        B-runs each closed by a P, by summed lowres cost estimates;
        commit the first segment."""
        from . import lookahead as la
        q = self._bqueue
        L = len(q)
        bh, bw, r = self._la_bh, self._la_bw, self._la_r
        memo = {}

        def est(m: int, a: int, j: int):
            """[bcost of q[m] between anchors, pcost of q[m] from a];
            a == -1 means the last non-B reference."""
            key = (m, a, j)
            if key not in memo:
                al = self._la_ref_lows if a < 0 else q[a][4]
                c = np.asarray(la.b_cost_fused(q[m][4], al, q[j][4],
                                               bh, bw, r))
                memo[key] = (int(c[0]), int(c[1]))
            return memo[key]

        def paths(n: int):
            """Segment lengths: k Bs then a P, k <= i_bframe."""
            if n == 0:
                yield []
                return
            for k in range(min(n, self._bframes + 1)):
                for rest in paths(n - k - 1):
                    yield [k] + rest

        best_cost, best_path = None, None
        for path in paths(L):
            cost, anchor, idx = 0, -1, 0
            for k in path:
                jp = idx + k
                for m in range(idx, jp):
                    cost += est(m, anchor, jp)[0]
                cost += est(jp, anchor, jp)[1]
                anchor, idx = jp, jp + 1
            if best_cost is None or cost < best_cost:
                best_cost, best_path = cost, path

        k = best_path[0]                 # first segment: k Bs + a P
        seg, rest = q[:k + 1], q[k + 1:]
        self._bqueue = seg[:-1]
        pf = seg[-1]
        self._submit_ip(pf[0], False, pf[1], pf[2], pf[3], lows=pf[4])
        self._submit_bqueue()
        self._bqueue = rest

    def _submit_bqueue(self):
        """Encode the queued candidates as the B run between the
        just-encoded reference pair, in display order. ME seeds come
        from the candidates' own lowres MV fields against both lists
        when available (slicetype.c:153-166), else distance-scaled
        from the P's MV field."""
        from . import lookahead as la
        q, self._bqueue = self._bqueue, []
        span = len(q) + 1
        for i, (g, g_qp, g_poc, g_disp, g_lows) in enumerate(q):
            seeds = None
            if (g_lows is not None and self._la_prev_lows is not None
                    and self._la_ref_lows is not None):
                seeds = la.b_seed_mvs_fused(
                    g_lows, self._la_prev_lows, self._la_ref_lows,
                    self._la_bh, self._la_bw, self._la_r)
            self._submit_b_disp(g, g_qp, g_poc, g_disp,
                                d0=i + 1, span=span, seeds=seeds)

    def _flush_bqueue(self):
        """Close the GOP: newest queued candidate becomes the P, the
        earlier ones its B run (or everything drains P-less at open)."""
        if not self._bqueue:
            return
        last = self._bqueue.pop()
        is_idr = self._ref is None
        # an IDR resets POC to 0 (spec 7.4.3); only a P keeps its
        # buffered display POC
        self._submit_ip(last[0], is_idr, last[1],
                        0 if is_idr else last[2], last[3],
                        lows=last[4])
        self._submit_bqueue()

    def _advance_gop(self, to_idr: bool):
        """Display-order GOP bookkeeping."""
        p = self.params
        if to_idr:
            self._gop_pos = 0
            self._since_idr = 0
            self._disp_since_idr = 0
        self._gop_pos = (self._gop_pos + 1) % max(1, p.i_keyint_max)
        self._since_idr += 1
        self._disp_since_idr += 1

    def _submit_ip(self, frame: Frame, is_idr: bool, forced_qp, poc: int,
                   disp: int = -1, lows=None):
        """Submit one reference frame (IDR or P) in encode order."""
        if self._badapt:
            # rotate the lookahead lowres state with the DPB: the lows
            # of this frame become the L1 side of the next B run
            self._la_prev_lows = self._la_ref_lows
            self._la_ref_lows = (lows if lows is not None
                                 else self._lowres(frame))
        qp = self.rc.start("I" if is_idr else "P",
                           frame_idx=self.frame_count)
        if forced_qp is not None:
            qp = max(0, min(51, int(forced_qp)))
            self.rc.last_qp = qp
        self.poc = poc
        if is_idr:
            pend = self._submit_idr(frame, qp)
            pend["ftype"] = "IDR"
        else:
            pend = self._submit_p(frame, qp)
            pend["ftype"] = "P"
        pend.update(frame=frame, qp=qp, disp=disp,
                    rc_rceq=self.rc.last_rceq, rc_satd=self.rc.last_satd)
        self.frame_count += 1
        self._start_fetch(pend)
        self._pending.append(pend)

    # d2h chunk: ~512 KB rides the tunnel's best rate; larger single
    # transfers hit a pathological cliff (measured: 4 MB -> 60+ s)
    _FETCH_CHUNK = 131072

    def _start_fetch(self, pend: dict):
        """Kick off the d2h of this frame's host32 + payload data on a
        worker thread so the transfer overlaps both device compute of
        the NEXT frame and the host entropy tail of the PREVIOUS one
        (the x264 frame-thread pipeline overlap, doc/threads.txt).

        All device-side slicing is enqueued HERE on the main thread,
        right behind this frame's program — a slice launched later from
        the worker would land behind the *next* frame's program in the
        device queue and serialize the pipeline. The worker then only
        performs transfers of already-scheduled arrays."""
        out = pend.get("out")
        kind = pend["kind"]
        if out is None or ("host32" not in out
                           and kind != "cabac_rows"):
            return
        res: dict = {}
        cap_words = pend.get("cap_words")
        CH = self._FETCH_CHUNK
        band_chunks = None
        if kind == "cabac":
            nch = (out["ops"].shape[0] + CH - 1) // CH
            chunks = [out["ops"][k * CH:(k + 1) * CH] for k in range(nch)]
        elif kind == "cavlc":
            nch = (out["words"].shape[0] + CH - 1) // CH
            chunks = [out["words"][k * CH:(k + 1) * CH]
                      for k in range(nch)]
        elif kind == "cabac_rows":
            # per-band op streams: slice every chunk at submit time
            # (device work must be enqueued behind THIS frame's program)
            chunks = []
            nb = pend["n_bands"]
            cap = int(out["ops"].shape[1])     # packed words per band
            nch = (cap + CH - 1) // CH
            band_chunks = [[out["ops"][k][j * CH:(j + 1) * CH]
                            for j in range(nch)] for k in range(nb)]
        else:
            chunks = []
        h32_dev = out["host32"] if kind != "cabac_rows"             else pend["hostv"]

        nr4 = out.get("nr_sum4") if out is not None else None
        nr8 = out.get("nr_sum8") if out is not None else None

        def work():
            try:
                h32 = np.asarray(h32_dev)
                res["h32"] = h32
                if nr4 is not None:
                    res["nr4"] = np.asarray(nr4)
                if nr8 is not None:
                    res["nr8"] = np.asarray(nr8)
                n = int(h32[0])
                if kind == "cabac":
                    nw = (n + 1) // 2   # n counts halfwords (hw_pack)
                    need = (nw + CH - 1) // CH
                    parts = [np.asarray(c) for c in chunks[:need]]
                    res["ops"] = (np.concatenate(parts)[:nw] if parts
                                  else np.zeros(0, np.uint32))
                elif kind == "cavlc":
                    nwords = min((n + 31) // 32, cap_words)
                    need = (nwords + CH - 1) // CH
                    parts = [np.asarray(c) for c in chunks[:need]]
                    res["words"] = (np.concatenate(parts) if parts
                                    else np.zeros(0, np.uint32))
                elif kind == "cabac_rows":
                    bands = []
                    for k, bc in enumerate(band_chunks):
                        nw = (int(h32[k]) + 1) // 2   # halfwords->words
                        need = (nw + CH - 1) // CH
                        parts = [np.asarray(c) for c in bc[:need]]
                        bands.append(np.concatenate(parts)[:nw] if parts
                                     else np.zeros(0, np.uint32))
                    res["band_ops"] = bands
            except Exception as e:      # surfaced at join time
                res["error"] = e

        import threading
        t = threading.Thread(target=work, daemon=True)
        t.start()
        pend["fetch"] = (t, res)

    def _submit_b_disp(self, frame: Frame, forced_qp, poc: int,
                       disp: int = -1, d0: int = 1, span: int = 2,
                       seeds=None):
        qp = self.rc.start("B", frame_idx=self.frame_count)
        if forced_qp is not None:
            qp = max(0, min(51, int(forced_qp)))
            self.rc.last_qp = qp
        self.poc = poc
        pend = self._submit_b(frame, qp, d0, span, seeds)
        pend["ftype"] = "B"
        pend.update(frame=frame, qp=qp, disp=disp,
                    rc_rceq=self.rc.last_rceq, rc_satd=self.rc.last_satd)
        self.frame_count += 1
        self._start_fetch(pend)
        self._pending.append(pend)

    def flush(self) -> list:
        """Drain delayed frames (the pic_in=NULL flush loop contract,
        x264.c:870-873). The newest trailing B candidate becomes a P."""
        self._flush_bqueue()
        out = []
        while self._pending:
            out.append(self._finalize(self._pending.pop(0)))
        return out

    def _finalize(self, pend: dict) -> EncodedFrame:
        """Host tail of one frame: entropy coding / bitstream fetch, NAL
        assembly, RC accounting, stats (the x264_encoder_frame_end
        analogue, encoder/encoder.c:1705)."""
        p = self.params
        ftype, qp, frame = pend["ftype"], pend["qp"], pend["frame"]
        kind = pend["kind"]
        out = pend.get("out")
        fetch = pend.get("fetch")
        if fetch is not None:
            t, res = fetch
            t.join()
            if "error" in res:
                raise res["error"]
            h32 = res["h32"]
        else:
            res = {}
            h32 = (np.asarray(out["host32"])
                   if out is not None and "host32" in out else None)
        if self._nr and ftype == "P":
            nr4 = res.get("nr4")
            if nr4 is None and out is not None and "nr_sum4" in out:
                nr4 = np.asarray(out["nr_sum4"])
            nr8 = res.get("nr8")
            if nr8 is None and out is not None and "nr_sum8" in out:
                nr8 = np.asarray(out["nr_sum8"])
            self._nr_update(nr4, nr8, p.mb_width * p.mb_height)
        if kind == "done":
            payload = pend["payload"]
        elif kind == "cabac":
            payload = self._cabac_payload(pend, int(h32[0]),
                                          res.get("ops"))
        elif kind == "cabac_rows":
            payload = self._rows_cabac_payload(pend, res)
        else:
            payload = self._cavlc_payload(pend, int(h32[0]),
                                          res.get("words"))

        nmb = p.mb_width * p.mb_height
        if kind == "cabac_rows":
            nb = pend["n_bands"]
            n_intra, n_skip = int(h32[nb]), int(h32[nb + 1])
            counts = ((n_intra, nmb - n_intra - n_skip, n_skip)
                      if ftype in ("P", "B") else (nmb, 0, 0))
            h32 = None     # no packed metrics in the band path
        elif h32 is not None:
            if ftype in ("P", "B"):
                n_intra, n_skip = int(h32[1]), int(h32[2])
                counts = (n_intra, nmb - n_intra - n_skip, n_skip)
            else:
                counts = (nmb, 0, 0)
        elif ftype in ("P", "B"):
            counts = pend.get("counts", (0, 0, 0))
        else:
            counts = (nmb, 0, 0)
        self._last_mb_counts = counts

        recon = pend["recon"]
        bits = len(payload) * 8
        self.rc.end("I" if ftype == "IDR" else ftype, bits, qp, counts,
                    rceq=pend.get("rc_rceq"), satd=pend.get("rc_satd"))
        metrics = None
        if self._with_metrics:
            if h32 is not None:
                m = h32[3:7].view(np.float32)
                metrics = tuple(float(x) for x in m)
            else:
                metrics = estats.frame_metrics(
                    np.asarray(frame.y), np.asarray(frame.u),
                    np.asarray(frame.v), recon.y, recon.u, recon.v,
                    p.i_width, p.i_height)
        self.stats.add_frame(ftype, bits, qp, metrics, counts)
        return EncodedFrame(payload, ftype, recon, bits,
                            pend.get("disp", -1))

    def _nr_kw(self) -> dict:
        """Per-frame noise-reduction offset arrays for the P pipeline
        (empty when NR is off)."""
        if not self._nr:
            return {}
        import jax.numpy as jnp
        kw = {"nr_offset4": jnp.asarray(self._nr_off[0])}
        if self._t8:
            kw["nr_offset8"] = jnp.asarray(self._nr_off[1])
        return kw

    def _nr_update(self, s4, s8, nmb: int):
        """x264_noise_reduction_update (encoder/macroblock.c:890-911):
        accumulate per-position |coef| sums, periodically halve, and
        recompute offsets as nr*count / (sum * weight2/256 + 1).
        Deviation: updated once per frame over all-MB inter residuals
        (the batched pipeline has no per-MB accumulation point)."""
        for cat, (s, blocks, cap) in enumerate(
                ((s4, 16, 1 << 18), (s8, 4, 1 << 16))):
            if s is None:
                continue
            self._nr_sum[cat] += np.asarray(s, np.float64)
            self._nr_cnt[cat] += nmb * blocks
            if self._nr_cnt[cat] > cap:
                self._nr_sum[cat] *= 0.5
                self._nr_cnt[cat] *= 0.5
            w = self._nr_w[cat]
            off = ((self._nr * self._nr_cnt[cat] + self._nr_sum[cat] / 2)
                   // (self._nr_sum[cat] * w / 256 + 1))
            self._nr_off[cat] = np.clip(off, 0, 65535).astype(np.int32)

    def _qtab(self, qp_y: int, qp_c: int):
        key = (qp_y, qp_c)
        if key not in self._qtab_cache:
            qt = intra.make_qtab(qp_y, qp_c, self.qt)
            if self._aq:
                qt["full"] = self._full_tabs
                qt["aq_strength"] = self._aq_strength
            self._qtab_cache[key] = qt
        return self._qtab_cache[key]

    def _qtab_p(self, qp_y: int, qp_c: int):
        key = (qp_y, qp_c)
        if key not in self._qtab_p_cache:
            qt = inter.make_qtab_p(qp_y, qp_c, self.qt)
            p = self.params
            if self._full_tabs is not None:
                qt["full"] = self._full_tabs
            if self._aq:
                qt["aq_strength"] = self._aq_strength
            if (p.analyse.i_trellis and p.b_cabac
                    and not self._lossless):
                # trellis consts for every inter category the residual
                # paths quantize (luma 4x4 / 8x8 / chroma AC+DC —
                # x264_quant_{4x4,8x8,dc}_trellis, encoder/rdo.c:632-661)
                from ..ops import trellis as otrellis
                idc = p.i_cabac_init_idc
                if self._aq or self._rowrc:
                    # per-MB QP (AQ / row-RC): one 52-QP const stack
                    # shared by all frame QPs, row-gathered on device
                    if self._trellis_full is None:
                        mk = lambda cat, lst: otrellis.make_consts_all_qp(
                            cat, lst, False, idc, qt=self.qt)
                        tf = dict(t4=mk(2, tables.CQM_4PY),
                                  tc=mk(4, tables.CQM_4PC),
                                  tcdc=mk(3, tables.CQM_4PC))
                        if self._t8:
                            tf["t8"] = mk(5, tables.CQM_8PY)
                        self._trellis_full = tf
                    tf = self._trellis_full
                    qt["trellis"] = tf["t4"]
                    qt["trellis_pc"] = tf["tc"]
                    qt["trellis_pc_dc"] = tf["tcdc"]
                    if self._t8:
                        qt["trellis8"] = tf["t8"]
                else:
                    mk = lambda q, cat, lst: otrellis.make_consts(
                        q, cat, lst, False, idc, qt=self.qt,
                        state_qp=qp_y)
                    qt["trellis"] = mk(qp_y, 2, tables.CQM_4PY)
                    qt["trellis_pc"] = mk(qp_c, 4, tables.CQM_4PC)
                    qt["trellis_pc_dc"] = mk(qp_c, 3, tables.CQM_4PC)
                    if self._t8:
                        qt["trellis8"] = mk(qp_y, 5, tables.CQM_8PY)
            if self._rd:
                # RD-ladder bit-cost tables (bits only — quant fields
                # unused) + the x264_lambda2_tab lambda
                from ..ops import trellis as otrellis
                from ..ops import rdcost as ordc
                import jax.numpy as jnp
                idc = p.i_cabac_init_idc
                qt["rdbits"] = {
                    f"cat{c}": otrellis.make_consts(
                        qp_y, c, tables.CQM_4PY if c != 5
                        else tables.CQM_8PY, False, idc, qt=self.qt)
                    for c in range(6)}
                qt["rd_lam2"] = jnp.float32(ordc.lambda2_f8(qp_y))
                if p.analyse.b_psy and p.analyse.f_psy_rd > 0:
                    # ssd_plane psy scaling (encoder/rdo.c:127):
                    # (satd * FIX8(f_psy_rd) * lambda + 128) >> 8
                    # == satd * f_psy_rd * lambda
                    qt["psy_rd"] = jnp.float32(
                        p.analyse.f_psy_rd
                        * float(tables.LAMBDA_TABLE[qp_y]))
            self._qtab_p_cache[key] = qt
        return self._qtab_p_cache[key]

    def _slice_header(self, qp: int, slice_type: int = SLICE_I,
                      n_ref_l0: int = 1) -> SliceHeader:
        """n_ref_l0: refs actually usable for THIS slice (< the PPS
        count right after an IDR, when the DPB holds fewer frames) —
        signalled via num_ref_idx_active_override
        (x264_slice_header_init, encoder/encoder.c:721-727)."""
        p = self.params
        override = (slice_type != SLICE_I
                    and n_ref_l0 != self.pps.num_ref_idx_l0)
        return SliceHeader(
            slice_type=slice_type, frame_num=self.frame_num,
            idr_pic_id=self.idr_pic_id if slice_type == SLICE_I else -1,
            poc_lsb=self.poc % (1 << self.sps.log2_max_poc_lsb),
            qp=qp, pic_init_qp=self.pps.pic_init_qp,
            disable_deblock=0 if p.b_deblocking_filter else 1,
            alpha_c0_offset=p.i_deblocking_filter_alphac0,
            beta_offset=p.i_deblocking_filter_beta,
            cabac=p.b_cabac,
            num_ref_idx_l0=n_ref_l0, num_ref_idx_l1=1,
            num_ref_idx_override=override,
            log2_max_frame_num=self.sps.log2_max_frame_num,
            log2_max_poc_lsb=self.sps.log2_max_poc_lsb,
        )

    # d2h transfer bucket for the packed bitstream (words); bucketing
    # bounds the number of distinct slice shapes jit sees
    _WORD_BUCKET = 1 << 15

    def _fetch_rbsp(self, words, nbits: int, cap_words: int) -> bytes:
        nwords = (nbits + 31) // 32
        nb = min(cap_words,
                 (nwords + self._WORD_BUCKET - 1)
                 // self._WORD_BUCKET * self._WORD_BUCKET)
        return edev.words_to_bytes(np.asarray(words[:nb]), nbits)

    def _pad_input(self, frame: Frame):
        """MB-aligned planes, flattened: 2-D arrays pay a ~50x layout
        tax on tunneled-device h2d, so planes cross as 1-D bytes and
        the jitted pipelines reshape them (free on device)."""
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        y = pad_plane(np.asarray(frame.y, np.uint8), mb_h * 16, mb_w * 16)
        u = pad_plane(np.asarray(frame.u, np.uint8), mb_h * 8, mb_w * 8)
        v = pad_plane(np.asarray(frame.v, np.uint8), mb_h * 8, mb_w * 8)
        return y.ravel(), u.ravel(), v.ravel()

    def _finish_frame(self, out, frame: Frame, is_ref: bool = True):
        """Update DPB state and crop the recon view (x264_reference_update,
        encoder/encoder.c:1059). Non-reference frames (B) leave the DPB
        and frame_num untouched; POC is display-managed by encode()."""
        if is_ref:
            self._prev_ref = self._ref
            self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
            # colocated L0 field of this reference (for B spatial
            # direct); IDR/I frames synthesize all-intra maps lazily
            self._ref_maps = ((out["ref4"], out["mv4"])
                              if "ref4" in out else None)
            self.frame_num = (self.frame_num + 1) \
                % (1 << self.sps.log2_max_frame_num)
        recon = Frame(out["recon_y"][:frame.y.shape[0], :frame.y.shape[1]],
                      out["recon_u"][:frame.u.shape[0], :frame.u.shape[1]],
                      out["recon_v"][:frame.v.shape[0], :frame.v.shape[1]])
        return recon

    # --------------------------------------------------- row-sharded path
    def _band_headers(self, qp: int, slice_type: int, nal_ref_idc: int,
                      band: int, n: int):
        """Per-band slice headers: identical except first_mb_in_slice;
        slice-edge deblocking disabled (disable_deblocking_filter_idc=2)
        since bands filter independently."""
        p = self.params
        vals = np.zeros((n, edev.HDR_SLOTS), np.int32)
        lens = np.zeros((n, edev.HDR_SLOTS), np.int32)
        for k in range(n):
            sh = self._slice_header(qp, slice_type)
            sh.first_mb = k * band * p.mb_width
            sh.disable_deblock = 2 if p.b_deblocking_filter else 1
            hdr = BitWriter()
            sh.write_rbsp(hdr, nal_ref_idc=nal_ref_idc)
            vals[k], lens[k] = edev.header_slots(hdr)
        return vals, lens

    def _assemble_band_nals(self, out, nal_type: int, nal_ref_idc: int,
                            cap_words: int, n: int) -> bytes:
        nbits = np.asarray(out["nbits"]).reshape(n)
        words = np.asarray(out["words"])
        payload = []
        for k in range(n):
            nb = int(nbits[k])
            if nb > cap_words * 32:
                raise RuntimeError(
                    f"slice {k} overflowed the device pack buffer ({nb})")
            rbsp = edev.words_to_bytes(words[k], nb)
            payload.append(nal_unit(nal_type, nal_ref_idc, rbsp))
        return b"".join(payload)

    def _band_cabac_headers(self, qp: int, slice_type: int,
                            nal_ref_idc: int, band: int, n: int,
                            n_ref_l0: int = 1):
        """Per-band CABAC slice headers incl. alignment bits."""
        p = self.params
        hdrs = []
        for k in range(n):
            sh = self._slice_header(qp, slice_type, n_ref_l0)
            sh.first_mb = k * band * p.mb_width
            sh.disable_deblock = 2 if p.b_deblocking_filter else 1
            hdr = BitWriter()
            sh.write_rbsp(hdr, nal_ref_idc=nal_ref_idc)
            pad = (-hdr.bit_pos) % 8
            if pad:
                hdr.put((1 << pad) - 1, pad)
            hdrs.append(bytearray(hdr.pack()))
        return hdrs

    def _encode_idr_rows(self, frame: Frame, qp: int):
        from ..parallel import rows as prows
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        n = self._n_shards
        band = mb_h // n
        y, u, v = self._pad_input(frame)
        y = y.reshape(mb_h * 16, mb_w * 16)
        u = u.reshape(mb_h * 8, mb_w * 8)
        v = v.reshape(mb_h * 8, mb_w * 8)
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        self.frame_num = 0
        self.poc = 0
        self._prev_mv = None
        if p.b_cabac:
            import jax.numpy as jnp
            hdrs = self._band_cabac_headers(qp, SLICE_I, 3, band, n)
            cap_ops = pipeline.cabac_capacity(band * mb_w)
            out = prows.encode_i_rows_cabac(
                self._rows_mesh, mb_h, mb_w, self._i4x4,
                bool(p.b_deblocking_filter), y, u, v,
                self._qtab(qp, qp_c), lam, qp,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, cap_ops,
                t8_mode=self._t8)
            hostv = jnp.concatenate([
                out["n_ops"].reshape(-1).astype(jnp.int32),
                jnp.asarray([mb_h * mb_w, 0], jnp.int32)])
            pend = dict(kind="cabac_rows", out=out, hdrs=hdrs,
                        slice_is_i=True, nal_type=NAL_SLICE_IDR,
                        nal_ref_idc=3, cap_ops=cap_ops, n_bands=n,
                        hostv=hostv, nmb=mb_h * mb_w)
            pend["recon"] = self._finish_frame(out, frame)
            self._prev_ref = None
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
            self._last_mb_counts = (mb_h * mb_w, 0, 0)
            return pend
        else:
            hv, hl = self._band_headers(qp, SLICE_I, 3, band, n)
            cap_words = pipeline.capacity_words(band * mb_w)
            out = prows.encode_i_rows(
                self._rows_mesh, mb_h, mb_w, self._i4x4,
                bool(p.b_deblocking_filter), y, u, v,
                self._qtab(qp, qp_c), lam, qp,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, hv, hl, cap_words)
            payload = self._assemble_band_nals(out, NAL_SLICE_IDR, 3,
                                               cap_words, n)
        recon = self._finish_frame(out, frame)
        # IDR empties the DPB: the pre-IDR reference must never appear
        # as L0[1] (no_output_of_prior_pics, spec 8.2.5.1)
        self._prev_ref = None
        self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self._last_mb_counts = (mb_h * mb_w, 0, 0)
        return payload, recon

    def _encode_p_rows(self, frame: Frame, qp: int):
        import jax.numpy as jnp
        from ..parallel import rows as prows
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        n = self._n_shards
        band = mb_h // n
        y, u, v = self._pad_input(frame)
        y = y.reshape(mb_h * 16, mb_w * 16)
        u = u.reshape(mb_h * 8, mb_w * 8)
        v = v.reshape(mb_h * 8, mb_w * 8)
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        mvp_seed = (self._prev_mv if self._prev_mv is not None
                    else jnp.zeros((mb_h, mb_w, 2), jnp.int32))
        ry, ru, rv = self._ref
        n_refs = (2 if p.i_frame_reference >= 2
                  and self._prev_ref is not None and p.b_cabac else 1)
        r2 = self._prev_ref if n_refs == 2 else (None, None, None)
        if p.b_cabac:
            hdrs = self._band_cabac_headers(qp, SLICE_P, 2, band, n,
                                            n_refs)
            cap_ops = pipeline.cabac_capacity(band * mb_w)
            out = prows.encode_p_rows_cabac(
                self._rows_mesh, mb_h, mb_w, self._me_range, self._subpel,
                bool(p.b_deblocking_filter), y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, mvp_seed, cap_ops,
                ref2_y=r2[0], ref2_u=r2[1], ref2_v=r2[2],
                t8=self._t8, decimate=p.analyse.b_dct_decimate,
                rd=self._rd, p8x8=self._p8x8, aq=self._aq,
                aq_qp_min=int(p.rc.i_qp_min),
                aq_qp_max=int(p.rc.i_qp_max))
            hostv = jnp.concatenate([
                out["n_ops"].reshape(-1).astype(jnp.int32),
                jnp.stack([out["intra_mb"].sum().astype(jnp.int32),
                           out["skip"].sum().astype(jnp.int32)])])
            self._prev_mv = out["mv"]
            pend = dict(kind="cabac_rows", out=out, hdrs=hdrs,
                        slice_is_i=False, nal_type=NAL_SLICE,
                        nal_ref_idc=2, cap_ops=cap_ops, n_bands=n,
                        hostv=hostv, nmb=mb_h * mb_w)
            pend["recon"] = self._finish_frame(out, frame)
            return pend
        else:
            hv, hl = self._band_headers(qp, SLICE_P, 2, band, n)
            cap_words = pipeline.capacity_words(band * mb_w)
            out = prows.encode_p_rows(
                self._rows_mesh, mb_h, mb_w, self._me_range, self._subpel,
                bool(p.b_deblocking_filter), y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, mvp_seed, hv, hl, cap_words)
            payload = self._assemble_band_nals(out, NAL_SLICE, 2,
                                               cap_words, n)
        self._prev_mv = out["mv"]
        recon = self._finish_frame(out, frame)
        n_intra = out["intra_mb"].sum()
        n_skip = out["skip"].sum()
        self._last_mb_counts = (n_intra, mb_h * mb_w - n_intra - n_skip,
                                n_skip)
        return payload, recon

    def _encode_b_rows(self, frame: Frame, qp: int, mvp_seed,
                       mvp_seed_l1, col_ref4, col_mv4):
        """One non-reference B frame as n row-band CABAC slices."""
        from ..parallel import rows as prows
        from ..headers import SLICE_B
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        n = self._n_shards
        band = mb_h // n
        y, u, v = self._pad_input(frame)
        y = y.reshape(mb_h * 16, mb_w * 16)
        u = u.reshape(mb_h * 8, mb_w * 8)
        v = v.reshape(mb_h * 8, mb_w * 8)
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        qtab = self._qtab_p(qp, qp_c)
        if self._aq and qtab.get("trellis") is not None:
            # the 52-QP trellis stacks need per-shard QP rows the
            # replicated qtab can't carry; sharded B stays deadzone
            qtab = {k: v for k, v in qtab.items()
                    if not k.startswith("trellis")}
        hdrs = self._band_cabac_headers(qp, SLICE_B, 0, band, n)
        cap_ops = pipeline.cabac_capacity(band * mb_w)
        out = prows.encode_b_rows_cabac(
            self._rows_mesh, mb_h, mb_w, self._me_range, self._subpel,
            bool(p.b_deblocking_filter), y, u, v,
            *self._prev_ref, *self._ref, qtab, lam, qp,
            2 * p.i_deblocking_filter_alphac0,
            2 * p.i_deblocking_filter_beta,
            p.analyse.i_chroma_qp_offset, mvp_seed, col_ref4, col_mv4,
            cap_ops, mvp_seed_l1=mvp_seed_l1, t8=self._t8)
        import jax.numpy as jnp
        hostv = jnp.concatenate([
            out["n_ops"].reshape(-1).astype(jnp.int32),
            jnp.stack([out["intra_mb"].sum().astype(jnp.int32),
                       out["skip"].sum().astype(jnp.int32)])])
        pend = dict(kind="cabac_rows", out=out, hdrs=hdrs,
                    slice_is_i=False, nal_type=NAL_SLICE,
                    nal_ref_idc=0, cap_ops=cap_ops,
                    n_bands=self._n_shards, hostv=hostv,
                    nmb=mb_h * mb_w)
        pend["recon"] = self._finish_frame(out, frame, is_ref=False)
        return pend

    def _submit_idr(self, frame: Frame, qp: int) -> dict:
        p = self.params
        if self._rows_mesh is not None:
            r = self._encode_idr_rows(frame, qp)
            if isinstance(r, dict):
                return r        # pipelined CABAC band pend
            payload, recon = r
            return dict(kind="done", payload=payload, recon=recon)
        mb_w, mb_h = p.mb_width, p.mb_height
        y, u, v = self._pad_input(frame)

        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])

        # IDR resets frame_num/POC (spec 7.4.3) and the ME seed field
        self.frame_num = 0
        self.poc = 0
        self._prev_mv = None

        if p.b_cabac:
            hdr_bytes = self._cabac_header(qp, SLICE_I, 3)
            out = pipeline.encode_i16_idr_cabac(
                mb_h, mb_w, bool(p.b_deblocking_filter), self._i4x4,
                self._lossless,
                y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, t8=self._t8,
                i8x8=self._i8x8, **self._crop, **self._aq_kw)
            pend = dict(kind="cabac", out=out, hdr_bytes=hdr_bytes,
                        slice_is_i=True, nal_type=NAL_SLICE_IDR,
                        nal_ref_idc=3, nmb=mb_h * mb_w)
        else:
            hdr = BitWriter()
            self._slice_header(qp).write_rbsp(hdr, nal_ref_idc=3)
            hdr_vals, hdr_lens = edev.header_slots(hdr)

            out = pipeline.encode_i16_idr(
                mb_h, mb_w, bool(p.b_deblocking_filter), self._i4x4,
                self._lossless,
                y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                hdr_vals, hdr_lens,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, **self._crop,
                **self._aq_kw)
            cap_words = pipeline.capacity_words(mb_h * mb_w)
            if self._delay == 0:
                # synchronous: keep the pathological-overflow fallbacks
                # (retry without I4x4, then the host I16 coder — x264
                # instead reallocs, x264_bitstream_check_buffer)
                nbits = int(out["nbits"])
                if nbits > cap_words * 32 and self._i4x4:
                    out = pipeline.encode_i16_idr(
                        mb_h, mb_w, bool(p.b_deblocking_filter), False,
                        self._lossless,
                        y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                        hdr_vals, hdr_lens,
                        2 * p.i_deblocking_filter_alphac0,
                        2 * p.i_deblocking_filter_beta,
                        p.analyse.i_chroma_qp_offset)
                    nbits = int(out["nbits"])
                if nbits <= cap_words * 32:
                    rbsp = self._fetch_rbsp(out["words"], nbits, cap_words)
                    payload = nal_unit(NAL_SLICE_IDR, 3, rbsp)
                else:
                    coef = intra.encode_i16_frame(
                        mb_h, mb_w, y.astype(np.int32), u.astype(np.int32),
                        v.astype(np.int32), self._qtab(qp, qp_c), lam)
                    coef = {k: np.asarray(val) for k, val in coef.items()}
                    payload = self._write_i_slice(coef, qp, mb_w, mb_h)
                pend = dict(kind="done", out=out, payload=payload)
            else:
                pend = dict(kind="cavlc", out=out, cap_words=cap_words,
                            nal_type=NAL_SLICE_IDR, nal_ref_idc=3)

        pend["recon"] = self._finish_frame(out, frame)
        # IDR empties the DPB (no_output_of_prior_pics / spec 8.2.5.1):
        # the pre-IDR reference must never appear as L0[1]
        self._prev_ref = None
        self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        return pend

    def _submit_p(self, frame: Frame, qp: int) -> dict:
        """One P frame against the DPB (x264_encoder_encode P path;
        ME/MC per SURVEY §7 step 4). With --ref 2, L0 = [_ref,
        _prev_ref] (PicNum-descending default order) once two
        references exist; the first P after an IDR runs single-ref with
        the slice-header override."""
        import jax.numpy as jnp
        p = self.params
        if self._rows_mesh is not None:
            r = self._encode_p_rows(frame, qp)
            if isinstance(r, dict):
                return r        # pipelined CABAC band pend
            payload, recon = r
            return dict(kind="done", payload=payload, recon=recon,
                        counts=self._last_mb_counts)
        mb_w, mb_h = p.mb_width, p.mb_height
        y, u, v = self._pad_input(frame)

        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])

        mvp_seed = (self._prev_mv if self._prev_mv is not None
                    else jnp.zeros((mb_h, mb_w, 2), jnp.int32))
        ry, ru, rv = self._ref
        n_refs = (2 if p.i_frame_reference >= 2
                  and self._prev_ref is not None else 1)
        r2y, r2u, r2v = (self._prev_ref if n_refs == 2
                         else (None, None, None))
        row_off = None
        if self._rowrc:
            ro = self.rc.row_qp_offsets("P", qp, mb_h)
            if ro is not None:
                row_off = jnp.asarray(ro)
        if p.b_cabac:
            hdr_bytes = self._cabac_header(qp, SLICE_P, 2, n_refs)
            out = pipeline.encode_p_cabac(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel, self._parts, self._lossless, n_refs,
                y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp, qp_c,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset,
                mvp_seed, r2y, r2u, r2v, t8=self._t8,
                decimate=p.analyse.b_dct_decimate, rd=self._rd,
                p8x8=self._p8x8, row_qp_off=row_off,
                chroma_me=self._chroma_me,
                **self._nr_kw(), **self._crop, **self._aq_kw)
            pend = dict(kind="cabac", out=out, hdr_bytes=hdr_bytes,
                        slice_is_i=False, nal_type=NAL_SLICE,
                        nal_ref_idc=2, nmb=mb_h * mb_w)
        else:
            hdr = BitWriter()
            self._slice_header(qp, SLICE_P, n_refs).write_rbsp(
                hdr, nal_ref_idc=2)
            hdr_vals, hdr_lens = edev.header_slots(hdr)

            out = pipeline.encode_p(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel, self._parts, self._lossless, n_refs,
                y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp, qp_c,
                hdr_vals, hdr_lens,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset,
                mvp_seed, r2y, r2u, r2v,
                decimate=p.analyse.b_dct_decimate, rd=self._rd,
                p8x8=self._p8x8, row_qp_off=row_off,
                chroma_me=self._chroma_me,
                **self._nr_kw(), **self._crop, **self._aq_kw)
            pend = dict(kind="cavlc", out=out,
                        cap_words=pipeline.capacity_words(mb_h * mb_w),
                        nal_type=NAL_SLICE, nal_ref_idc=2)

        self._prev_mv = out["mv"]
        pend["recon"] = self._finish_frame(out, frame)
        return pend

    def _submit_b(self, frame: Frame, qp: int, d0: int = 1,
                  span: int = 2, seeds=None) -> dict:
        """One non-reference B frame between _prev_ref (L0, past) and
        _ref (L1, future) — x264_encoder_encode B path with the
        reordered reference lists of x264_reference_build_list.

        d0/span: temporal position — the B sits d0 frames after L0 in a
        run spanning `span` frames, so the P's MV field (covering the
        full span) seeds each list scaled by its distance (the lowres
        temporal-scaling trick, encoder/slicetype.c:153-166)."""
        import jax.numpy as jnp
        from ..headers import SLICE_B
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        y, u, v = self._pad_input(frame)
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        qtab_b = self._qtab_p(qp, qp_c)
        if ((self._aq or self._rowrc)
                and qtab_b.get("trellis") is not None):
            # AQ encoders carry 52-QP trellis stacks; B frames (no AQ
            # yet) trellis at the frame QP via constant row maps
            qtab_b = dict(qtab_b)
            qtab_b["trellis_qp"] = jnp.full((mb_h, mb_w), qp, jnp.int32)
            qtab_b["trellis_qpc"] = jnp.full((mb_h, mb_w), qp_c,
                                             jnp.int32)
        if seeds is not None:
            # lowres MV fields searched against each list directly
            # (one lowres 8x8 block == one MB; slicetype.c:153-166)
            mvp_seed, mvp_seed_l1 = seeds
        else:
            pmv = (self._prev_mv if self._prev_mv is not None
                   else jnp.zeros((mb_h, mb_w, 2), jnp.int32))
            mvp_seed = pmv * d0 // span
            mvp_seed_l1 = -(pmv * (span - d0)) // span
        l0 = self._prev_ref
        l1 = self._ref
        # colocated maps of RefPicList1[0] for spatial direct; an I/IDR
        # colocated frame is all-intra (ref -1, mv 0)
        if self._ref_maps is not None:
            col_ref4, col_mv4 = self._ref_maps
        else:
            col_ref4 = jnp.full((mb_h * 4, mb_w * 4), -1, jnp.int32)
            col_mv4 = jnp.zeros((mb_h * 4, mb_w * 4, 2), jnp.int32)
        if self._rows_mesh is not None and p.b_cabac:
            return self._encode_b_rows(
                frame, qp, mvp_seed, mvp_seed_l1, col_ref4, col_mv4)
        if p.b_cabac:
            hdr_bytes = self._cabac_header(qp, SLICE_B, 0)
            out = pipeline.encode_b_cabac(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel, y, u, v, *l0, *l1,
                qtab_b, lam, qp, qp_c,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, mvp_seed,
                col_ref4, col_mv4, t8=self._t8,
                mvp_seed_l1=mvp_seed_l1, **self._crop)
            pend = dict(kind="cabac", out=out, hdr_bytes=hdr_bytes,
                        slice_is_i=False, nal_type=NAL_SLICE,
                        nal_ref_idc=0, nmb=mb_h * mb_w)
        else:
            hdr = BitWriter()
            self._slice_header(qp, SLICE_B).write_rbsp(hdr, nal_ref_idc=0)
            hdr_vals, hdr_lens = edev.header_slots(hdr)
            out = pipeline.encode_b(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel, y, u, v, *l0, *l1,
                qtab_b, lam, qp, qp_c,
                hdr_vals, hdr_lens,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset, mvp_seed,
                col_ref4, col_mv4, mvp_seed_l1=mvp_seed_l1,
                **self._crop)
            pend = dict(kind="cavlc", out=out,
                        cap_words=pipeline.capacity_words(mb_h * mb_w),
                        nal_type=NAL_SLICE, nal_ref_idc=0)
        pend["recon"] = self._finish_frame(out, frame, is_ref=False)
        return pend

    def _cavlc_payload(self, pend: dict, nbits: int,
                       words=None) -> bytes:
        out = pend["out"]
        cap_words = pend["cap_words"]
        if nbits > cap_words * 32:
            raise RuntimeError(
                f"slice overflowed the device pack buffer ({nbits} bits)")
        if words is not None:
            rbsp = edev.words_to_bytes(words, nbits)
        else:
            rbsp = self._fetch_rbsp(out["words"], nbits, cap_words)
        return nal_unit(pend["nal_type"], pend["nal_ref_idc"], rbsp)

    def _deblock(self, ry, ru, rv, qp_mb, intra_mb, nnz4=None, ref4=None,
                 mv4=None, ref4_l1=None, mv4_l1=None, is_b=False):
        """Run the in-loop filter pass (x264_fdec_filter_row analogue)."""
        p = self.params
        mb_h, mb_w = qp_mb.shape
        z4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        zmv = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, intra_mb,
            z4 if nnz4 is None else nnz4,
            z4 if ref4 is None else ref4,
            zmv if mv4 is None else mv4,
            z4 if ref4_l1 is None else ref4_l1,
            zmv if mv4_l1 is None else mv4_l1,
            is_b,
            2 * p.i_deblocking_filter_alphac0,
            2 * p.i_deblocking_filter_beta,
            p.analyse.i_chroma_qp_offset)
        return np.asarray(ry), np.asarray(ru), np.asarray(rv)

    def _cabac_header(self, qp: int, slice_type: int,
                      nal_ref_idc: int, n_ref_l0: int = 1) -> bytearray:
        """Slice header bytes + cabac_alignment_one_bit (spec 7.3.4),
        built at submit time while frame_num/POC/idr_pic_id still hold
        this frame's values."""
        hdr = BitWriter()
        self._slice_header(qp, slice_type, n_ref_l0).write_rbsp(
            hdr, nal_ref_idc=nal_ref_idc)
        pad = (-hdr.bit_pos) % 8
        if pad:
            hdr.put((1 << pad) - 1, pad)
        return bytearray(hdr.pack())

    def _rows_cabac_payload(self, pend: dict, res: dict) -> bytes:
        """Host tail of a band-sliced frame: arithmetic-code each
        band's fetched op stream with fresh per-slice contexts."""
        from ..entropy import cabac as ecabac
        from ..entropy import cabac_tables as ctab
        payload = []
        band_ops = res.get("band_ops")
        h32 = res.get("h32")
        qp = pend["qp"]
        if h32 is None:
            h32 = np.asarray(pend["hostv"])
        for k, hdr_bytes in enumerate(pend["hdrs"]):
            nk = int(h32[k])                  # halfword count (hw_pack)
            if nk > 3 * pend["cap_ops"]:
                raise RuntimeError(
                    f"band {k} CABAC ops overflowed ({nk} halfwords)")
            words_k = (band_ops[k] if band_ops is not None
                       else np.asarray(
                           pend["out"]["ops"][k][:(nk + 1) // 2]))
            ops_k = ecabac.unpack_hw(words_k, nk)
            states = ctab.init_states(pend["slice_is_i"], qp,
                                      self.params.i_cabac_init_idc)
            body, fixup = ecabac.encode_ops(states, ops_k, hdr_bytes[-1])
            hdr_bytes = bytearray(hdr_bytes)
            hdr_bytes[-1] = fixup
            payload.append(nal_unit(pend["nal_type"],
                                    pend["nal_ref_idc"],
                                    bytes(hdr_bytes) + body))
        return b"".join(payload)

    def _cabac_payload(self, pend: dict, n_ops: int, ops=None) -> bytes:
        """Native arithmetic coding of the device-produced op stream
        (x264_slice_write CABAC branch, encoder/encoder.c:1155-1199) —
        the host tail that the frame pipeline overlaps with device
        compute of the following frame."""
        from ..entropy import cabac as ecabac
        from ..entropy import cabac_tables as ctab

        out = pend["out"]
        cap = pipeline.cabac_capacity_hw(pend["nmb"])
        if n_ops > cap:      # n_ops counts halfwords (hw_pack)
            raise RuntimeError(
                f"CABAC op stream overflowed device buffer "
                f"({n_ops} halfwords)")
        if ops is None:
            ops = np.asarray(out["ops"][:(n_ops + 1) // 2])
        ops = ecabac.unpack_hw(ops, n_ops)

        hdr_bytes = pend["hdr_bytes"]
        states = ctab.init_states(pend["slice_is_i"], pend["qp"],
                                  self.params.i_cabac_init_idc)
        payload, fixup = ecabac.encode_ops(states, ops, hdr_bytes[-1])
        hdr_bytes[-1] = fixup
        return nal_unit(pend["nal_type"], pend["nal_ref_idc"],
                        bytes(hdr_bytes) + payload)

    # ------------------------------------------------------------- slice
    def _write_i_slice(self, out: dict, qp: int, mb_w: int, mb_h: int) -> bytes:
        """Entropy-code one I slice from the device coefficient planes
        (x264_slice_write, encoder/encoder.c:1141, CAVLC path), fully
        vectorized (cavlc_vec)."""
        bs = BitWriter()
        self._slice_header(qp).write_rbsp(bs, nal_ref_idc=3)
        vals, lens = cavlc_vec_i16_slice(out, mb_w, mb_h)
        bs.put_codes(vals, lens)
        bs.rbsp_trailing()
        return nal_unit(NAL_SLICE_IDR, 3, bs.pack())

    def close(self) -> dict:
        """x264_encoder_close: emit the global stats report
        (encoder/encoder.c:1878-2080) and return it as a dict."""
        self.rc.write_stats()
        summary = self.stats.summary()
        if self.params.i_log_level >= 1 and summary:
            from .. import log as xlog
            for line in self.stats.report_lines():
                xlog.log(xlog.LOG_INFO, line)
        return summary
