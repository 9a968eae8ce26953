"""Encoder statistics: per-frame and global PSNR/SSIM/bitrate/MB-type
accounting (x264_t.stat, common/common.h:560-614; accumulation at
encoder/encoder.c:1034-1056 + x264_encoder_frame_end:1705; final report
x264_encoder_close:1878-2080).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(6, 7))
def frame_metrics(oy, ou, ov, ry, ru, rv, w: int, h: int):
    """Device-side SSD (per plane, over the w x h output crop) + the
    x264 SSIM sum over the (2,2)-offset luma region. Jitted: unjitted
    eager dispatch of the SSIM graph cost ~0.5 s/frame at 1080p."""
    from ..ops import pixel as opix

    def ssd(a, b, ww, hh):
        d = a[:hh, :ww].astype(jnp.int32) - b[:hh, :ww].astype(jnp.int32)
        d2 = (d * d).ravel()
        # block the int32 partial sums (<= 256*255^2 each) before the
        # float accumulation: exact without requiring x64 mode
        pad = (-d2.shape[0]) % 256
        d2 = jnp.pad(d2, (0, pad))
        part = d2.reshape(-1, 256).sum(axis=-1)
        return part.astype(jnp.float32).sum()

    ssim = opix.ssim_sum(oy[2:h, 2:w], ry[2:h, 2:w])
    return (ssd(oy, ry, w, h), ssd(ou, ru, w // 2, h // 2),
            ssd(ov, rv, w // 2, h // 2), ssim)


def psnr(sqe: float, size: float) -> float:
    """x264_psnr (encoder/encoder.c:60)."""
    if sqe <= 0:
        return 99.99
    return 10.0 * math.log10(65025.0 * size / sqe)


class Stats:
    """Aggregates what the reference logs per frame and at close."""

    TYPES = ("IDR", "I", "P", "B")

    def __init__(self, width: int, height: int, fps: float,
                 b_psnr=True, b_ssim=True):
        self.w, self.h, self.fps = width, height, fps
        self.b_psnr, self.b_ssim = b_psnr, b_ssim
        self.count = {}          # frame count per type
        self.bits = {}           # total bits per type
        self.qp_sum = {}
        self.ssd = [0, 0, 0]     # global Y/U/V SSD
        self.psnr_sum = [0.0, 0.0, 0.0, 0.0]   # mean-of-frame Y/U/V/avg
        self.ssim_sum = 0.0
        self.mb_intra = 0
        self.mb_inter = 0
        self.mb_skip = 0
        self._pending = []       # (type, bits, qp, device metric tuple)

    # ------------------------------------------------------------------
    def add_frame(self, ftype: str, bits: int, qp: int, metrics=None,
                  mb_counts=None):
        """metrics: (ssd_y, ssd_u, ssd_v, ssim_sum); mb_counts:
        (intra, inter, skip). Both may be device arrays — kept lazy until
        summary so per-frame stats never force a device sync."""
        self.count[ftype] = self.count.get(ftype, 0) + 1
        self.bits[ftype] = self.bits.get(ftype, 0) + bits
        self.qp_sum[ftype] = self.qp_sum.get(ftype, 0) + qp
        if metrics is not None or mb_counts is not None:
            self._pending.append((metrics, mb_counts))

    def _flush(self):
        w, h = self.w, self.h
        ssim_den = ((w - 6) >> 2) * ((h - 6) >> 2)
        for m, mbc in self._pending:
            if mbc is not None:
                self.mb_intra += int(mbc[0])
                self.mb_inter += int(mbc[1])
                self.mb_skip += int(mbc[2])
            if m is None:
                continue
            sy, su, sv = (int(m[0]), int(m[1]), int(m[2]))
            self.ssd[0] += sy
            self.ssd[1] += su
            self.ssd[2] += sv
            py = psnr(sy, w * h)
            pu = psnr(su, w * h // 4)
            pv = psnr(sv, w * h // 4)
            self.psnr_sum[0] += py
            self.psnr_sum[1] += pu
            self.psnr_sum[2] += pv
            self.psnr_sum[3] += (py + pu + pv) / 3.0
            self.ssim_sum += float(m[3]) / max(1, ssim_den)
        self._pending.clear()

    # ------------------------------------------------------------------
    def summary(self) -> dict:
        """The numbers of the reference's close-time report
        (encoder/encoder.c:2061-2080)."""
        self._flush()
        n = sum(self.count.values())
        if n == 0:
            return {}
        total_bits = sum(self.bits.values())
        out = {
            "frames": n,
            "kb/s": self.fps * total_bits / n / 1000.0,
            "frame_types": dict(self.count),
            "avg_qp": {t: self.qp_sum[t] / c
                       for t, c in self.count.items()},
            "avg_bytes": {t: self.bits[t] / 8.0 / c
                          for t, c in self.count.items()},
        }
        nmb = self.mb_intra + self.mb_inter + self.mb_skip
        if nmb:
            out["mb_pct"] = {"intra": 100.0 * self.mb_intra / nmb,
                             "inter": 100.0 * self.mb_inter / nmb,
                             "skip": 100.0 * self.mb_skip / nmb}
        if self.b_psnr:
            yuv_size = self.w * self.h * 3 // 2
            out["psnr"] = {
                "y": self.psnr_sum[0] / n,
                "u": self.psnr_sum[1] / n,
                "v": self.psnr_sum[2] / n,
                "avg": self.psnr_sum[3] / n,
                "global": psnr(sum(self.ssd), n * yuv_size),
            }
        if self.b_ssim:
            out["ssim_y"] = self.ssim_sum / n
        return out

    def report_lines(self):
        """Formatted like the reference's final x264_log lines."""
        s = self.summary()
        if not s:
            return []
        lines = []
        ft = s["frame_types"]
        for t in self.TYPES:
            if t in ft:
                lines.append(
                    f"frame {t}:{ft[t]:<5} Avg QP:{s['avg_qp'][t]:5.2f}"
                    f"  size:{s['avg_bytes'][t]:9.1f}")
        if "mb_pct" in s:
            m = s["mb_pct"]
            lines.append(f"mb    intra:{m['intra']:5.1f}%  "
                         f"inter:{m['inter']:5.1f}%  skip:{m['skip']:5.1f}%")
        if "ssim_y" in s:
            lines.append(f"SSIM Mean Y:{s['ssim_y']:.7f}")
        if "psnr" in s:
            p = s["psnr"]
            lines.append(
                f"PSNR Mean Y:{p['y']:6.3f} U:{p['u']:6.3f} "
                f"V:{p['v']:6.3f} Avg:{p['avg']:6.3f} "
                f"Global:{p['global']:6.3f} kb/s:{s['kb/s']:.2f}")
        else:
            lines.append(f"kb/s:{s['kb/s']:.1f}")
        return lines
