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
x264_rc_analyse_slice role) comes from numpy lowres costs on the host so
no device round-trip happens before QP is chosen.
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..params import (EncoderParams, RC_CQP, RC_CRF, RC_ABR)


def qp2qscale(qp: float) -> float:
    """encoder/ratecontrol.c:148-152."""
    return 0.85 * pow(2.0, (qp - 12.0) / 6.0)


def qscale2qp(qscale: float) -> float:
    """encoder/ratecontrol.c:154-158."""
    return 12.0 + 6.0 * math.log2(qscale / 0.85)


# ---------------------------------------------------------------------------
# Lowres frame cost: the x264_rc_analyse_slice / slicetype lowres-ME stand-in.
# ---------------------------------------------------------------------------

def lowres(y: np.ndarray) -> np.ndarray:
    """Half-res downsample by 2x2 mean (x264_frame_init_lowres,
    common/mc.c:306-357 uses the same 2-tap average)."""
    h, w = y.shape
    h &= ~1
    w &= ~1
    p = y[:h, :w].astype(np.int32)
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
            + p[1::2, 1::2] + 2) >> 2


def _block_sum(a: np.ndarray, bs: int = 8) -> np.ndarray:
    h, w = a.shape
    hb, wb = h // bs, w // bs
    return a[:hb * bs, :wb * bs].reshape(hb, bs, wb, bs).sum(axis=(1, 3))


def intra_cost(low: np.ndarray) -> float:
    """Lowres intra-cost proxy: per-8x8 deviation from the block DC
    (plays the role of the lowres intra-prediction SATD,
    encoder/slicetype.c:186-245)."""
    h, w = low.shape
    hb, wb = h // 8, w // 8
    blk = low[:hb * 8, :wb * 8].reshape(hb, 8, wb, 8)
    dc = blk.mean(axis=(1, 3), keepdims=True)
    sad = np.abs(blk - dc).sum()
    return float(sad)


def inter_cost(low: np.ndarray, ref_low: np.ndarray) -> float:
    """Lowres inter-cost proxy: per-8x8 min SAD over a small candidate
    set of global shifts (the zero-MV + diamond probes of the lowres ME,
    encoder/slicetype.c:43-185)."""
    h, w = low.shape
    hb, wb = h // 8, w // 8
    cur = low[:hb * 8, :wb * 8]
    best = None
    for dy, dx in ((0, 0), (0, -2), (0, 2), (-2, 0), (2, 0),
                   (0, -5), (0, 5), (-5, 0), (5, 0)):
        ref = np.roll(ref_low, (dy, dx), axis=(0, 1))[:hb * 8, :wb * 8]
        sad = _block_sum(np.abs(cur.astype(np.int32) - ref))
        best = sad if best is None else np.minimum(best, sad)
    return float(best.sum())


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
        self.last_qscale = qp2qscale(26)
        self.last_qscale_for = {"I": qp2qscale(26), "P": qp2qscale(26)}

        # complexity accumulators (rate_estimate_qscale:1396)
        self.short_term_cplxsum = 0.0
        self.short_term_cplxcount = 0.0
        self.cplxr_sum = 0.01
        self.wanted_bits_window = 1.0
        self.total_bits = 0
        self.frame_count = 0

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

        self.pred = {"I": Predictor(), "P": Predictor(), "B": Predictor()}

        # lowres state for complexity + scenecut
        self._prev_low = None
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

    # ------------------------------------------------------------- analyse
    def analyse_frame(self, y: np.ndarray) -> dict:
        """Lowres cost + scenecut decision for the incoming frame.
        Returns {'scenecut': bool, 'icost': float, 'pcost': float}.
        (x264_slicetype_analyse + scenecut, encoder/slicetype.c:437-474)"""
        low = lowres(np.asarray(y, np.uint8))
        icost = intra_cost(low)
        out = {"scenecut": False, "icost": icost, "pcost": icost}
        if self._prev_low is not None and self._prev_low.shape == low.shape:
            pcost = inter_cost(low, self._prev_low)
            out["pcost"] = pcost
            thresh = self.p.i_scenecut_threshold / 100.0
            # scenecut when inter predicts no better than (1-bias)*intra
            # (slicetype.c:449-467; the distance-adaptive bias is dropped
            # because keyint enforcement is handled by the caller)
            if icost > 0 and pcost >= (1.0 - thresh) * icost:
                out["scenecut"] = True
        self._prev_low = low
        self.frame_cplx = max(out["pcost"], 1.0)
        return out

    # ------------------------------------------------------------- start
    def start(self, frame_type: str, satd: float | None = None) -> int:
        """Choose the frame QP (x264_ratecontrol_start:789 +
        rate_estimate_qscale:1396). frame_type: 'I' or 'P'."""
        self.frame_count += 1
        if satd is None:
            satd = self.frame_cplx
        self.last_satd = max(satd, 1.0)

        if self.method == RC_CQP:
            # pure constant QP for every slice type (the reference applies
            # f_ip_factor to CQP I frames, ratecontrol.c:571-576; kept
            # flat here so CQP streams stay regression-locked byte-exact)
            qp = self.p.rc.i_qp_constant
            self.last_qp = qp
            return int(qp)

        if self.stat_read:
            # 2-pass replay: QPs precomputed by init_pass2
            idx = min(self._read_pos, len(self.stat_read) - 1)
            rce = self.stat_read[idx]
            self._read_pos += 1
            q = rce.new_qp if rce.new_qp is not None else rce.qp
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

        if self.method == RC_CRF:
            q = self.last_rceq / self.rate_factor_constant
        else:  # ABR (rate_estimate_qscale ABR branch :1472-1530)
            wanted = self.bitrate * self.frame_count / self.fps
            self.wanted_bits_window = max(wanted, 1.0)
            rate_factor = self.wanted_bits_window / self.cplxr_sum
            q = self.last_rceq / max(rate_factor, 1e-9)
            abr_buffer = 2.0 * self.p.rc.f_rate_tolerance * self.bitrate
            overflow = 1.0 + (self.total_bits - wanted) / max(abr_buffer, 1.0)
            q *= min(2.0, max(0.5, overflow))

        if frame_type == "I" and self.p.i_keyint_max > 1:
            # I-frame boost (rate_estimate_qscale:1510-1516)
            q = qp2qscale(qscale2qp(q) - self.ip_offset)

        # smooth vs last qscale of same type (:1518-1526)
        lmin = qp2qscale(self.qp_min)
        lmax = qp2qscale(self.qp_max)
        q = max(lmin, min(lmax, q))
        if self.vbv:
            q = self._clip_qscale(frame_type, q)
        qp = int(round(qscale2qp(q)))
        qp = max(self.qp_min, min(self.qp_max,
                                  min(self.last_qp + self.qp_step,
                                      max(self.last_qp - self.qp_step, qp))
                                  if self.frame_count > 1 and
                                  self.method == RC_ABR else qp))
        self.last_qp = qp
        self.last_qscale = qp2qscale(qp)
        self.last_qscale_for[frame_type] = self.last_qscale
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

    # ------------------------------------------------------------- end
    def end(self, frame_type: str, bits: int, qp: int,
            mb_counts=None, header_bits: int = 0):
        """Post-frame accounting (x264_ratecontrol_end:1077)."""
        self.total_bits += bits
        qscale = qp2qscale(qp)
        if self.method != RC_CQP and not self.stat_read:
            self.cplxr_sum *= 0.5
            self.wanted_bits_window *= 0.5
            self.cplxr_sum += bits * qscale / max(self.last_rceq, 1e-9) \
                if hasattr(self, "last_rceq") else 0.0
        self.pred[frame_type if frame_type in self.pred else "P"].update(
            bits, qscale, self.last_satd)
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
            qp=qp, cplx=self.last_satd, imb=imb, pmb=pmb, smb=smb))

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
