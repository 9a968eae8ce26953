"""Rate control — the analogue of encoder/ratecontrol.c.

Implements CQP passthrough, CRF (constant rate factor), 1-pass ABR with
overflow compensation, VBV-constrained clipping with frame-size
predictors, scenecut detection from lowres frame costs, and the 2-pass
stats file (write + read/replay with target-rate refitting).

Reference behaviors matched (file:line cites into
/root/reference/x264-snapshot-20090216-2245/):
  - qp<->qscale mapping            encoder/ratecontrol.c:148-166
  - get_qscale / rate-factor core  encoder/ratecontrol.c:1169-1196
  - ABR overflow compensation      encoder/ratecontrol.c:1396-1572
  - VBV update + clip_qscale       encoder/ratecontrol.c:1281-1394
  - frame-size predictors          encoder/ratecontrol.c:1265-1278
  - scenecut decision              encoder/slicetype.c:437-474
  - 2-pass stats line format       encoder/ratecontrol.c:1094-1116
  - init_pass2 rate-factor search  encoder/ratecontrol.c:1780-1957
    (the reference runs a Newton iteration over qscale blur/clip; here a
    bisection over the rate factor with the same bits model)

Everything here is host-side control logic over per-frame scalars — the
natural TPU split per SURVEY.md §7 ("rate control ... stays in Python on
host (tiny compute, control-heavy)"). Per-frame complexity (the
x264_rc_analyse_slice role) comes from the device lowres lookahead
(encoder/lookahead.py): one small jitted program per frame whose cost
sums cross to the host before QP is chosen.
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..params import (EncoderParams, RC_CQP, RC_CRF, RC_ABR)
from . import lookahead


def qp2qscale(qp: float) -> float:
    """encoder/ratecontrol.c:148-152."""
    return 0.85 * pow(2.0, (qp - 12.0) / 6.0)


def qscale2qp(qscale: float) -> float:
    """encoder/ratecontrol.c:154-158."""
    return 12.0 + 6.0 * math.log2(qscale / 0.85)


# ---------------------------------------------------------------------------
# Frame-size predictor (encoder/ratecontrol.c:1265-1278)
# ---------------------------------------------------------------------------

class Predictor:
    """bits ~= coeff * satd / qscale, exponentially-decayed LS fit."""

    def __init__(self, coeff: float = 0.75):
        self.coeff = coeff
        self.count = 1.0
        self.decay = 0.5

    def predict(self, qscale: float, satd: float) -> float:
        return self.coeff / self.count * satd / qscale

    def update(self, bits: float, qscale: float, satd: float):
        if satd <= 0 or bits <= 0:
            return
        new_coeff = bits * qscale / satd
        self.count *= self.decay
        self.coeff *= self.decay
        self.count += 1.0
        self.coeff += new_coeff


class RateControlEntry:
    """One frame of RC state (x264_ratecontrol_t.rce / stats line)."""

    def __init__(self, frame_type: str, tex_bits: int = 0, mv_bits: int = 0,
                 misc_bits: int = 0, qp: float = 0.0, cplx: float = 0.0,
                 imb: int = 0, pmb: int = 0, smb: int = 0):
        self.frame_type = frame_type
        self.tex_bits = tex_bits
        self.mv_bits = mv_bits
        self.misc_bits = misc_bits
        self.qp = qp
        self.cplx = cplx
        self.imb, self.pmb, self.smb = imb, pmb, smb
        self.new_qp = None          # set by 2-pass replay


class RateControl:
    """x264_ratecontrol_new/start/end. One instance per encode."""

    def __init__(self, params: EncoderParams):
        p = params
        rc = p.rc
        self.p = p
        self.method = rc.i_rc_method
        self.fps = p.i_fps_num / max(1, p.i_fps_den)
        self.nmb = p.mb_width * p.mb_height
        self.qcomp = rc.f_qcompress
        self.qp_min, self.qp_max = rc.i_qp_min, rc.i_qp_max
        self.qp_step = rc.i_qp_step
        self.ip_offset = 6.0 * math.log2(rc.f_ip_factor)
        self.bitrate = rc.i_bitrate * 1000.0
        self.last_qp = rc.i_qp_constant

        # ABR/CRF seeds (x264_ratecontrol_new:350-382; ABR_INIT_QP is
        # rf_constant under CRF, 24 otherwise)
        self._abr_init_qp = (rc.f_rf_constant if self.method == RC_CRF
                             else 24.0)
        self.accum_p_norm = 0.01
        self.accum_p_qp = self._abr_init_qp * self.accum_p_norm
        self.cplxr_sum = 0.01 * pow(7.0e5, self.qcomp) * math.sqrt(self.nmb)
        self.wanted_bits_window = max(self.bitrate / self.fps, 1.0)
        self.lstep = pow(2.0, rc.i_qp_step / 6.0)
        self.last_qscale = qp2qscale(self._abr_init_qp)
        self.last_qscale_for = {t: qp2qscale(self._abr_init_qp)
                                for t in ("I", "P", "B")}
        self.last_non_b_type = "P"
        self.last_rceq = 1.0

        # complexity accumulators (rate_estimate_qscale:1443-1450)
        self.short_term_cplxsum = 0.0
        self.short_term_cplxcount = 0.0
        self.total_bits = 0
        self.frame_count = 0      # frames *completed* (i_frame_done)
        self._started = 0

        # zones (x264_ratecontrol zones, encoder/ratecontrol.c:601-715):
        # list of (start, end, kind, value); kind 'q' forces QP, 'b'
        # divides qscale by the bitrate factor — applied in get_qscale
        # order (before the I-frame replacement), never compounding
        self.zones: list[tuple] = []

        # CRF rate factor (x264_ratecontrol_new:267 CRF branch)
        base_cplx = self.nmb * (80 if p.i_bframe == 0 else 120)
        self.rate_factor_constant = (pow(base_cplx, 1.0 - self.qcomp)
                                     / qp2qscale(rc.f_rf_constant))

        # VBV (x264_ratecontrol_new VBV init + update_vbv:1281)
        self.vbv_max_rate = rc.i_vbv_max_bitrate * 1000.0
        self.vbv_buffer_size = rc.i_vbv_buffer_size * 1000.0
        self.vbv = self.vbv_buffer_size > 0 and self.vbv_max_rate > 0
        self.buffer_fill = self.vbv_buffer_size * rc.f_vbv_buffer_init
        self.buffer_rate = self.vbv_max_rate / self.fps if self.vbv else 0.0
        # cbr_decay (ratecontrol.c:290,328-329): 1.0 without VBV
        self.cbr_decay = 1.0
        if self.vbv and self.bitrate > 0:
            self.cbr_decay = 1.0 - self.buffer_rate / self.vbv_buffer_size \
                * 0.5 * max(0.0, 1.5 - self.buffer_rate * self.fps
                            / self.bitrate)

        self.pred = {"I": Predictor(), "P": Predictor(), "B": Predictor()}

        # lowres state for complexity + scenecut (device lookahead)
        self._prev_low = None
        self._lowres_range = max(4, min(12, p.analyse.i_me_range // 2))
        self.last_satd = 0.0
        self.frame_cplx = 0.0

        # 2-pass
        self.entries: list[RateControlEntry] = []
        self.stat_read: list[RateControlEntry] = []
        self._read_pos = 0
        if rc.b_stat_read:
            self.stat_read = read_stats(rc.psz_stat_in)
            if self.method == RC_ABR and self.bitrate > 0:
                init_pass2(self.stat_read, self.bitrate / self.fps,
                           self.qcomp, self.qp_min, self.qp_max)

    def reconfig(self, params: EncoderParams) -> None:
        """Apply the runtime-changeable RC subset (the rc half of
        x264_encoder_reconfig): QP bounds and the CQP/CRF targets.
        The ABR long-term state is preserved — only targets move."""
        rc = params.rc
        self.qp_min, self.qp_max = rc.i_qp_min, rc.i_qp_max
        if self.method == RC_CRF:
            base_cplx = self.nmb * (80 if params.i_bframe == 0 else 120)
            self.rate_factor_constant = (
                pow(base_cplx, 1.0 - self.qcomp)
                / qp2qscale(rc.f_rf_constant))

    # ------------------------------------------------------------- analyse
    def analyse_frame(self, y: np.ndarray, gop_size: int | None = None) \
            -> dict:
        """Lowres cost + scenecut decision for the incoming frame
        (device lookahead per-block ME/intra costs, then the scenecut
        rule of encoder/slicetype.c:437-474 with its distance-adaptive
        bias). gop_size: frames since the last IDR (for the bias ramp);
        None = use the max bias.
        Returns {'scenecut': bool, 'icost': float, 'pcost': float}."""
        import jax.numpy as jnp
        ynp = np.ascontiguousarray(y, dtype=np.uint8)
        h2, w2 = ynp.shape[0] // 2 * 2 // 2, ynp.shape[1] // 2 * 2 // 2
        bh, bw = (h2 + 7) // 8, (w2 + 7) // 8
        out = {"scenecut": False}
        have_prev = (self._prev_low is not None
                     and self._prev_low.shape[1:] == (h2, w2))
        lows, sums_d = lookahead.analyse_fused(
            jnp.asarray(ynp.ravel()), ynp.shape[0], ynp.shape[1],
            self._prev_low if have_prev else None,
            True if have_prev else None, bh, bw, self._lowres_range)
        if have_prev:
            sums = np.asarray(sums_d)
            isum, psum = int(sums[0]), int(sums[1])
            out["icost"], out["pcost"] = float(isum), float(psum)
            # bias ramp (scenecut, slicetype.c:445-462)
            t_max = self.p.i_scenecut_threshold / 100.0
            kmin = max(1, self.p.i_keyint_min)
            kmax = max(kmin + 1, self.p.i_keyint_max)
            t_min = t_max * kmin / (kmax * 4.0)
            if gop_size is None or gop_size > kmax:
                bias = t_max
            elif gop_size < kmin / 4:
                bias = t_min / 4
            elif gop_size <= kmin:
                bias = t_min * gop_size / kmin
            else:
                bias = t_min + (t_max - t_min) * (gop_size - kmin) \
                    / (kmax - kmin)
            if isum > 0 and psum >= (1.0 - bias) * isum:
                out["scenecut"] = True
        else:
            sums = np.asarray(sums_d)
            out["icost"] = out["pcost"] = float(int(sums[0]))
        self._prev_low = lows
        self.frame_cplx = max(out["pcost"], 1.0)
        return out

    def _get_zone(self, frame_idx: int):
        """Last matching zone wins (get_zone, ratecontrol.c:741-752)."""
        hit = None
        for z in self.zones:
            if z[0] <= frame_idx <= z[1]:
                hit = z
        return hit

    # ------------------------------------------------------------- start
    def start(self, frame_type: str, satd: float | None = None,
              frame_idx: int | None = None) -> int:
        """Choose the frame QP (x264_ratecontrol_start:789 +
        rate_estimate_qscale:1396). frame_type: 'I', 'P' or 'B'."""
        if frame_idx is None:
            frame_idx = self._started
        self._started += 1
        if satd is None:
            satd = self.frame_cplx
        self.last_satd = max(satd, 1.0)
        zone = self._get_zone(frame_idx)

        if self.method == RC_CQP:
            # pure constant QP for every slice type (the reference applies
            # f_ip_factor to CQP I frames, ratecontrol.c:571-576; kept
            # flat here so CQP streams stay regression-locked byte-exact).
            # B frames take the pb_factor offset (qp_constant[SLICE_TYPE_B],
            # ratecontrol.c:357-360)
            qp = self.p.rc.i_qp_constant
            if frame_type == "B":
                qp += round(6.0 * math.log2(abs(self.p.rc.f_pb_factor)))
            if zone is not None and zone[2] == "q":
                qp = max(0, min(51, int(zone[3])))
            qp = max(0, min(51, qp))
            self.last_qp = qp
            return int(qp)

        if frame_type == "B" and not self.stat_read:
            # B-frames ride the adjacent P quantizer + pb offset
            # (rate_estimate_qscale B branch, ratecontrol.c:1419-1452)
            q = self.last_qscale_for["P"] * abs(self.p.rc.f_pb_factor)
            q = max(qp2qscale(self.qp_min), min(qp2qscale(self.qp_max), q))
            if self.vbv:
                q = self._clip_qscale("B", q)
            self.last_qscale_for["B"] = q
            qp = int(round(qscale2qp(q)))
            qp = max(self.qp_min, min(self.qp_max, qp))
            self.last_qp = qp
            return qp

        if self.stat_read:
            # 2-pass replay: QPs precomputed by init_pass2
            idx = min(self._read_pos, len(self.stat_read) - 1)
            rce = self.stat_read[idx]
            self._read_pos += 1
            q = rce.new_qp if rce.new_qp is not None else rce.qp
            if zone is not None and zone[2] == "q":
                q = float(zone[3])
            qp = int(round(max(self.qp_min, min(self.qp_max, q))))
            self.last_qp = qp
            self.last_qscale = qp2qscale(qp)
            return qp

        # blurred complexity (rate_estimate_qscale:1443-1450)
        self.short_term_cplxsum *= 0.5
        self.short_term_cplxcount *= 0.5
        self.short_term_cplxsum += self.last_satd
        self.short_term_cplxcount += 1.0
        blurred = self.short_term_cplxsum / self.short_term_cplxcount
        self.last_rceq = pow(blurred, 1.0 - self.qcomp)

        overflow = 1.0
        if self.method == RC_CRF:
            q = self.last_rceq / self.rate_factor_constant
        else:  # 1-pass ABR (rate_estimate_qscale:1528-1572)
            q = self.last_rceq / (self.wanted_bits_window / self.cplxr_sum)
            wanted = self.frame_count * self.bitrate / self.fps
            if wanted > 0:
                abr_buffer = 2.0 * self.p.rc.f_rate_tolerance \
                    * self.bitrate \
                    * max(1.0, math.sqrt(self.frame_count / 25.0))
                overflow = min(2.0, max(0.5, 1.0 + (self.total_bits
                                                    - wanted) / abr_buffer))
                q *= overflow

        # bitrate-factor zone (get_qscale, ratecontrol.c:1186-1194)
        if zone is not None and zone[2] == "b":
            q /= float(zone[3])

        if frame_type == "I" and self.p.i_keyint_max > 1 \
                and self.last_non_b_type != "I":
            # I frames track the decayed average P QP / ip_factor
            # (rate_estimate_qscale:1574-1578)
            q = qp2qscale(self.accum_p_qp / self.accum_p_norm)
            q /= abs(self.p.rc.f_ip_factor)
        elif self.frame_count > 0:
            # asymmetric clip vs last qscale of same type (:1580-1592)
            lmin_t = self.last_qscale_for[frame_type] / self.lstep
            lmax_t = self.last_qscale_for[frame_type] * self.lstep
            if overflow > 1.1 and self.frame_count > 3:
                lmax_t *= self.lstep
            elif overflow < 0.9:
                lmin_t /= self.lstep
            q = max(lmin_t, min(lmax_t, q))
        elif self.method == RC_CRF:
            q = qp2qscale(self._abr_init_qp) / abs(self.p.rc.f_ip_factor)

        # q= zones force the QP outright (zone->b_force_qp), bypassing
        # the smoothing that would otherwise ramp toward it
        if zone is not None and zone[2] == "q":
            q = qp2qscale(float(zone[3]))

        lmin = qp2qscale(self.qp_min)
        lmax = qp2qscale(self.qp_max)
        q = max(lmin, min(lmax, q))
        if self.vbv:
            q = self._clip_qscale(frame_type, q)

        self.last_qscale_for[frame_type] = self.last_qscale = q
        if self.frame_count == 0:
            self.last_qscale_for["P"] = q
        qp = int(round(qscale2qp(q)))
        qp = max(self.qp_min, min(self.qp_max, qp))
        self.last_qp = qp
        return qp

    def _clip_qscale(self, frame_type: str, q: float) -> float:
        """VBV constraint (clip_qscale, encoder/ratecontrol.c:1321-1394):
        raise q until the predicted frame size fits the buffer."""
        pred = self.pred[frame_type if frame_type in self.pred else "P"]
        for _ in range(32):
            bits = pred.predict(q, self.last_satd)
            fill_after = self.buffer_fill - bits + self.buffer_rate
            if fill_after < 0.2 * self.vbv_buffer_size:
                q *= 1.1
            elif (fill_after > 0.95 * self.vbv_buffer_size
                  and bits < self.buffer_rate * 0.8):
                q /= 1.05
                if q <= qp2qscale(self.qp_min):
                    break
            else:
                break
        return max(qp2qscale(self.qp_min), min(qp2qscale(self.qp_max), q))

    def row_qp_offsets(self, frame_type: str, qp: int,
                       mb_h: int) -> "np.ndarray | None":
        """Per-MB-row QP offsets under VBV — the x264_ratecontrol_mb
        role (encoder/ratecontrol.c:922-1006) re-staged for the batched
        pipeline: instead of bumping QP row-by-row DURING the encode,
        the whole row-QP profile is planned BEFORE the frame from the
        frame-size predictor and the buffer state, and rides the same
        per-MB-QP (dqp) machinery AQ uses.

        When the predicted size at the frame QP exceeds the safe buffer
        room, later rows ramp up by up to +8 QP so the predicted total
        fits (bits scale ~2^(-d/6) per QP step, the qscale model).
        Returns (mb_h,) int32 offsets, or None when flat."""
        if not self.vbv:
            return None
        pred = self.pred[frame_type if frame_type in self.pred else "P"]
        bits = pred.predict(qp2qscale(qp), self.last_satd)
        room = max(self.buffer_fill + self.buffer_rate
                   - 0.25 * self.vbv_buffer_size, self.buffer_rate * 0.3)
        if bits <= room or bits <= 0:
            return None
        # linear 0..D ramp; mean shrink factor of the ramp must reach
        # room/bits; search the smallest sufficient D
        target = room / bits
        for D in range(1, 9):
            ramp = np.round(np.linspace(0.0, D, mb_h))
            if float(np.mean(2.0 ** (-ramp / 6.0))) <= target:
                break
        off = np.round(np.linspace(0.0, D, mb_h)).astype(np.int32)
        off = np.minimum(off, self.qp_max - int(qp))
        return off if off.any() else None

    def _accum_p_update(self, qp: float, frame_type: str):
        """accum_p_qp_update (ratecontrol.c:776-786): decayed average of
        P-equivalent QPs, used as the I-frame quant base."""
        self.accum_p_qp *= 0.95
        self.accum_p_norm *= 0.95
        self.accum_p_norm += 1.0
        self.accum_p_qp += qp + (self.ip_offset if frame_type == "I"
                                 else 0.0)

    # ------------------------------------------------------------- end
    def end(self, frame_type: str, bits: int, qp: int,
            mb_counts=None, header_bits: int = 0,
            rceq: float | None = None, satd: float | None = None):
        """Post-frame accounting (x264_ratecontrol_end:1077-1133):
        cplxr_sum accumulates bits*qscale/rceq, wanted_bits_window
        accumulates the per-frame target, both decayed by cbr_decay
        (1.0 without VBV — matched decaying windows keep the ABR rate
        factor stationary). rceq/satd override the live values when the
        frame-pipeline delays accounting past the next start()."""
        self.total_bits += bits
        qscale = qp2qscale(qp)
        if rceq is None:
            rceq = self.last_rceq
        if satd is None:
            satd = self.last_satd
        if self.method != RC_CQP and not self.stat_read:
            div = max(rceq, 1e-9)
            if frame_type == "B":
                div *= abs(self.p.rc.f_pb_factor)
            self.cplxr_sum += bits * qscale / div
            self.cplxr_sum *= self.cbr_decay
            self.wanted_bits_window += self.bitrate / self.fps
            self.wanted_bits_window *= self.cbr_decay
            if frame_type != "B":
                self._accum_p_update(qp, frame_type)
        if frame_type != "B":
            self.last_non_b_type = frame_type
        self.frame_count += 1
        self.pred[frame_type if frame_type in self.pred else "P"].update(
            bits, qscale, satd)
        if self.vbv:
            self.buffer_fill += self.buffer_rate - bits
            self.buffer_fill = max(0.0,
                                   min(self.vbv_buffer_size,
                                       self.buffer_fill))
        imb = pmb = smb = 0
        if mb_counts is not None:
            imb, pmb, smb = (int(x) for x in mb_counts)
        self.entries.append(RateControlEntry(
            frame_type, tex_bits=bits - header_bits, misc_bits=header_bits,
            qp=qp, cplx=satd, imb=imb, pmb=pmb, smb=smb))

    # ------------------------------------------------------------- 2-pass
    def write_stats(self):
        """Atomic stats-file write (x264_ratecontrol_end:1094-1116 line
        format; .temp + rename per x264_ratecontrol_delete:729-758)."""
        if not self.p.rc.b_stat_write:
            return
        path = self.p.rc.psz_stat_out
        tmp = path + ".temp"
        with open(tmp, "w") as f:
            f.write(f"#options: {self.p.to_string()}\n")
            for i, e in enumerate(self.entries):
                f.write(f"in:{i} out:{i} type:{e.frame_type} q:{e.qp:.2f} "
                        f"tex:{e.tex_bits} mv:{e.mv_bits} "
                        f"misc:{e.misc_bits} imb:{e.imb} pmb:{e.pmb} "
                        f"smb:{e.smb} cplx:{e.cplx:.0f};\n")
        os.replace(tmp, path)


def read_stats(path: str) -> list[RateControlEntry]:
    """Parse the 2-pass stats file (x264_ratecontrol_new read branch,
    encoder/ratecontrol.c:399-562)."""
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            kv = {}
            for tok in line.rstrip(";").split():
                if ":" in tok:
                    k, v = tok.split(":", 1)
                    kv[k] = v
            if "type" not in kv:
                continue
            entries.append(RateControlEntry(
                kv["type"],
                tex_bits=int(kv.get("tex", 0)),
                mv_bits=int(kv.get("mv", 0)),
                misc_bits=int(kv.get("misc", 0)),
                qp=float(kv.get("q", 26)),
                cplx=float(kv.get("cplx", 0)),
                imb=int(kv.get("imb", 0)), pmb=int(kv.get("pmb", 0)),
                smb=int(kv.get("smb", 0))))
    return entries


def init_pass2(entries: list[RateControlEntry], bits_per_frame: float,
               qcomp: float, qp_min: int, qp_max: int):
    """Fit a global rate factor so predicted pass-2 bits hit the target
    (init_pass2, encoder/ratecontrol.c:1780-1957). Bits model:
    bits2 ~= tex_bits1 * qscale1 / qscale2 + misc_bits (texture bits are
    ~inversely proportional to qscale; header bits are constant)."""
    target = bits_per_frame * len(entries)

    def predicted(rf: float) -> float:
        tot = 0.0
        for e in entries:
            q2 = pow(max(e.cplx, 1.0), 1.0 - qcomp) / rf
            q2 = max(qp2qscale(qp_min), min(qp2qscale(qp_max), q2))
            q1 = qp2qscale(e.qp)
            tot += e.tex_bits * q1 / q2 + e.misc_bits
        return tot

    lo, hi = 1e-4, 1e7
    for _ in range(64):
        mid = math.sqrt(lo * hi)
        if predicted(mid) > target:
            lo, hi = lo, mid
        else:
            lo, hi = mid, hi
    rf = math.sqrt(lo * hi)
    for e in entries:
        q2 = pow(max(e.cplx, 1.0), 1.0 - qcomp) / rf
        e.new_qp = max(qp_min, min(qp_max, qscale2qp(
            max(qp2qscale(qp_min), min(qp2qscale(qp_max), q2)))))
