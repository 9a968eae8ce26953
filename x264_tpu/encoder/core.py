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
                 bits: int):
        self.payload = payload
        self.frame_type = frame_type
        self.recon = recon
        self.bits = bits


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
        self.qt = tables.QuantTables(
            luma_deadzone_inter=p.analyse.i_luma_deadzone[0],
            luma_deadzone_intra=p.analyse.i_luma_deadzone[1])
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
        sp = p.analyse.i_subpel_refine
        self._subpel = () if sp <= 1 else ((2,) if sp <= 3 else (2, 1))
        # MB-row sharding across devices: one slice per row band
        # (parallel/rows.py; the i_threads/slice-threading analogue)
        self._rows_mesh = None
        if p.i_mb_row_shards > 1:
            import jax
            n = min(p.i_mb_row_shards, len(jax.devices()))
            while n > 1 and (p.mb_height % n
                             or (p.mb_height // n) * 16 < 32):
                n -= 1
            if n > 1 and not p.b_cabac:
                from ..parallel import rows as prows
                self._rows_mesh = prows.make_rows_mesh(n)
                self._n_shards = n
            elif p.i_log_level >= 2:
                import sys
                print("x264_tpu [info]: mb-row sharding unavailable "
                      f"(shards={p.i_mb_row_shards}, mb_h={p.mb_height}, "
                      f"cabac={p.b_cabac}); encoding unsharded",
                      file=sys.stderr)
        self.stats = estats.Stats(
            p.i_width, p.i_height, p.i_fps_num / max(1, p.i_fps_den),
            b_psnr=p.analyse.b_psnr, b_ssim=p.analyse.b_ssim)
        # rate control (x264_ratecontrol_new, encoder/ratecontrol.c:267)
        self.rc = rcmod.RateControl(p)
        self._since_idr = 0
        # lowres analysis is needed for non-CQP RC (complexity) and for
        # scenecut detection; skip it when neither applies
        self._analyse_lowres = (p.rc.i_rc_method != RC_CQP
                                or (p.i_scenecut_threshold > 0
                                    and p.i_keyint_max > 1))

    # ------------------------------------------------------------- headers
    def headers(self) -> bytes:
        """x264_encoder_headers: SPS + PPS + version SEI NALs
        (encoder/encoder.c:880-910 + x264_sei_version_write)."""
        from ..headers import sei_version
        return (self.sps.write() + self.pps.write()
                + sei_version(self.params.to_string()))

    # ------------------------------------------------------------- encode
    def encode(self, frame: Frame, forced_type: str | None = None,
               forced_qp: int | None = None) -> EncodedFrame:
        """x264_encoder_encode: frame-type decision (keyint GOP, scenecut
        IDR refresh, qpfile forcing via forced_type/forced_qp —
        parse_qpfile, x264.c:711) + per-type pipeline."""
        p = self.params
        scenecut = False
        if self._analyse_lowres:
            scenecut = self.rc.analyse_frame(frame.y)["scenecut"]
        if forced_type in ("I", "IDR"):
            is_idr = True
        elif forced_type == "P" and self._ref is not None:
            is_idr = False
        else:
            is_idr = (self._gop_pos == 0 or self._ref is None
                      or p.i_keyint_max == 1
                      or (scenecut and self._since_idr >= p.i_keyint_min))
        qp = self.rc.start("I" if is_idr else "P")
        if forced_qp is not None:
            qp = max(0, min(51, int(forced_qp)))
            self.rc.last_qp = qp
        if is_idr:
            payload, recon = self._encode_idr(frame, qp)
            ftype = "IDR"
            self._gop_pos = 0
            self._since_idr = 0
        else:
            payload, recon = self._encode_p(frame, qp)
            ftype = "P"
        self._gop_pos = (self._gop_pos + 1) % max(1, p.i_keyint_max)
        self._since_idr += 1
        self.frame_count += 1
        self.rc.end("I" if is_idr else "P", len(payload) * 8, qp,
                    self._last_mb_counts)

        metrics = None
        if p.analyse.b_psnr or p.analyse.b_ssim:
            metrics = estats.frame_metrics(
                np.asarray(frame.y), np.asarray(frame.u),
                np.asarray(frame.v), recon.y, recon.u, recon.v,
                p.i_width, p.i_height)
        self.stats.add_frame(ftype, len(payload) * 8, qp, metrics,
                             self._last_mb_counts)
        return EncodedFrame(payload, ftype, recon, len(payload) * 8)

    def _qtab(self, qp_y: int, qp_c: int):
        key = (qp_y, qp_c)
        if key not in self._qtab_cache:
            self._qtab_cache[key] = intra.make_qtab(qp_y, qp_c, self.qt)
        return self._qtab_cache[key]

    def _qtab_p(self, qp_y: int, qp_c: int):
        key = (qp_y, qp_c)
        if key not in self._qtab_p_cache:
            self._qtab_p_cache[key] = inter.make_qtab_p(qp_y, qp_c, self.qt)
        return self._qtab_p_cache[key]

    def _slice_header(self, qp: int, slice_type: int = SLICE_I) -> SliceHeader:
        p = self.params
        return SliceHeader(
            slice_type=slice_type, frame_num=self.frame_num,
            idr_pic_id=self.idr_pic_id if slice_type == SLICE_I else -1,
            poc_lsb=self.poc % (1 << self.sps.log2_max_poc_lsb),
            qp=qp, pic_init_qp=self.pps.pic_init_qp,
            disable_deblock=0 if p.b_deblocking_filter else 1,
            alpha_c0_offset=p.i_deblocking_filter_alphac0,
            beta_offset=p.i_deblocking_filter_beta,
            cabac=p.b_cabac,
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
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        y = pad_plane(np.asarray(frame.y, np.uint8), mb_h * 16, mb_w * 16)
        u = pad_plane(np.asarray(frame.u, np.uint8), mb_h * 8, mb_w * 8)
        v = pad_plane(np.asarray(frame.v, np.uint8), mb_h * 8, mb_w * 8)
        return y, u, v

    def _finish_frame(self, out, frame: Frame):
        """Update DPB state and crop the recon view (x264_reference_update,
        encoder/encoder.c:1059)."""
        self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        recon = Frame(out["recon_y"][:frame.y.shape[0], :frame.y.shape[1]],
                      out["recon_u"][:frame.u.shape[0], :frame.u.shape[1]],
                      out["recon_v"][:frame.v.shape[0], :frame.v.shape[1]])
        self.frame_num = (self.frame_num + 1) % (1 << self.sps.log2_max_frame_num)
        self.poc += 2
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

    def _encode_idr_rows(self, frame: Frame, qp: int):
        from ..parallel import rows as prows
        p = self.params
        mb_w, mb_h = p.mb_width, p.mb_height
        n = self._n_shards
        band = mb_h // n
        y, u, v = self._pad_input(frame)
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        self.frame_num = 0
        self.poc = 0
        self._prev_mv = None
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
        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])
        mvp_seed = (self._prev_mv if self._prev_mv is not None
                    else jnp.zeros((mb_h, mb_w, 2), jnp.int32))
        ry, ru, rv = self._ref
        hv, hl = self._band_headers(qp, SLICE_P, 2, band, n)
        cap_words = pipeline.capacity_words(band * mb_w)
        out = prows.encode_p_rows(
            self._rows_mesh, mb_h, mb_w, self._me_range, self._subpel,
            bool(p.b_deblocking_filter), y, u, v, ry, ru, rv,
            self._qtab_p(qp, qp_c), lam, qp,
            2 * p.i_deblocking_filter_alphac0,
            2 * p.i_deblocking_filter_beta,
            p.analyse.i_chroma_qp_offset, mvp_seed, hv, hl, cap_words)
        payload = self._assemble_band_nals(out, NAL_SLICE, 2, cap_words, n)
        self._prev_mv = out["mv"]
        recon = self._finish_frame(out, frame)
        n_intra = out["intra_mb"].sum()
        n_skip = out["skip"].sum()
        self._last_mb_counts = (n_intra, mb_h * mb_w - n_intra - n_skip,
                                n_skip)
        return payload, recon

    def _encode_idr(self, frame: Frame, qp: int):
        p = self.params
        if self._rows_mesh is not None:
            return self._encode_idr_rows(frame, qp)
        mb_w, mb_h = p.mb_width, p.mb_height
        y, u, v = self._pad_input(frame)

        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])

        # IDR resets frame_num/POC (spec 7.4.3) and the ME seed field
        self.frame_num = 0
        self.poc = 0
        self._prev_mv = None

        if p.b_cabac:
            out = pipeline.encode_i16_idr_cabac(
                mb_h, mb_w, bool(p.b_deblocking_filter), self._i4x4,
                y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset)
            slice_bytes = self._cabac_nal(out, qp, SLICE_I, NAL_SLICE_IDR, 3,
                                          mb_h * mb_w)
        else:
            hdr = BitWriter()
            self._slice_header(qp).write_rbsp(hdr, nal_ref_idc=3)
            hdr_vals, hdr_lens = edev.header_slots(hdr)

            out = pipeline.encode_i16_idr(
                mb_h, mb_w, bool(p.b_deblocking_filter), self._i4x4,
                y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                hdr_vals, hdr_lens,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset)

            nbits = int(out["nbits"])
            cap_words = pipeline.capacity_words(mb_h * mb_w)
            if nbits > cap_words * 32 and self._i4x4:
                # pathological overflow: retry as pure I16x16 (the host
                # fallback coder below has no I4x4 syntax); recon and
                # stream must come from the same encode
                out = pipeline.encode_i16_idr(
                    mb_h, mb_w, bool(p.b_deblocking_filter), False,
                    y, u, v, self._qtab(qp, qp_c), lam, qp, qp_c,
                    hdr_vals, hdr_lens,
                    2 * p.i_deblocking_filter_alphac0,
                    2 * p.i_deblocking_filter_beta,
                    p.analyse.i_chroma_qp_offset)
                nbits = int(out["nbits"])
            if nbits <= cap_words * 32:
                rbsp = self._fetch_rbsp(out["words"], nbits, cap_words)
                slice_bytes = nal_unit(NAL_SLICE_IDR, 3, rbsp)
            else:  # pathological frame overflowed device buffer: host path
                coef = intra.encode_i16_frame(
                    mb_h, mb_w, y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32), self._qtab(qp, qp_c), lam)
                coef = {k: np.asarray(val) for k, val in coef.items()}
                slice_bytes = self._write_i_slice(coef, qp, mb_w, mb_h)

        recon = self._finish_frame(out, frame)
        self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self._last_mb_counts = (mb_h * mb_w, 0, 0)
        return slice_bytes, recon

    def _encode_p(self, frame: Frame, qp: int):
        """One P frame against the single-entry DPB
        (x264_encoder_encode P path; ME/MC per SURVEY §7 step 4)."""
        import jax.numpy as jnp
        p = self.params
        if self._rows_mesh is not None:
            return self._encode_p_rows(frame, qp)
        mb_w, mb_h = p.mb_width, p.mb_height
        y, u, v = self._pad_input(frame)

        qp_c = tables.chroma_qp(qp, p.analyse.i_chroma_qp_offset)
        lam = int(tables.LAMBDA_TABLE[qp])

        mvp_seed = (self._prev_mv if self._prev_mv is not None
                    else jnp.zeros((mb_h, mb_w, 2), jnp.int32))
        ry, ru, rv = self._ref
        if p.b_cabac:
            out = pipeline.encode_p_cabac(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel,
                y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp, qp_c,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset,
                mvp_seed)
            slice_bytes = self._cabac_nal(out, qp, SLICE_P, NAL_SLICE, 2,
                                          mb_h * mb_w)
        else:
            hdr = BitWriter()
            self._slice_header(qp, SLICE_P).write_rbsp(hdr, nal_ref_idc=2)
            hdr_vals, hdr_lens = edev.header_slots(hdr)

            out = pipeline.encode_p(
                mb_h, mb_w, self._me_range, bool(p.b_deblocking_filter),
                self._subpel,
                y, u, v, ry, ru, rv,
                self._qtab_p(qp, qp_c), lam, qp, qp_c,
                hdr_vals, hdr_lens,
                2 * p.i_deblocking_filter_alphac0,
                2 * p.i_deblocking_filter_beta,
                p.analyse.i_chroma_qp_offset,
                mvp_seed)

            nbits = int(out["nbits"])
            cap_words = pipeline.capacity_words(mb_h * mb_w)
            if nbits > cap_words * 32:
                raise RuntimeError(
                    f"P slice overflowed the device pack buffer "
                    f"({nbits} bits)")
            rbsp = self._fetch_rbsp(out["words"], nbits, cap_words)
            slice_bytes = nal_unit(NAL_SLICE, 2, rbsp)

        self._prev_mv = out["mv"]
        recon = self._finish_frame(out, frame)
        n_intra = out["intra_mb"].sum()
        n_skip = out["skip"].sum()
        self._last_mb_counts = (n_intra, mb_h * mb_w - n_intra - n_skip,
                                n_skip)
        return slice_bytes, recon

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

    def _cabac_nal(self, out: dict, qp: int, slice_type: int,
                   nal_type: int, nal_ref_idc: int, nmb: int) -> bytes:
        """Assemble a CABAC slice NAL: host slice header + alignment,
        native arithmetic coding of the device-produced op stream
        (x264_slice_write CABAC branch, encoder/encoder.c:1155-1199)."""
        from ..entropy import cabac as ecabac
        from ..entropy import cabac_tables as ctab

        n_ops = int(out["n_ops"])
        if n_ops > pipeline.cabac_capacity(nmb):
            raise RuntimeError(
                f"CABAC op stream overflowed device buffer ({n_ops} ops)")
        ops = np.asarray(out["ops"][:n_ops])

        hdr = BitWriter()
        self._slice_header(qp, slice_type).write_rbsp(
            hdr, nal_ref_idc=nal_ref_idc)
        # cabac_alignment_one_bit (spec 7.3.4)
        pad = (-hdr.bit_pos) % 8
        if pad:
            hdr.put((1 << pad) - 1, pad)
        hdr_bytes = bytearray(hdr.pack())

        states = ctab.init_states(slice_type == SLICE_I, qp,
                                  self.params.i_cabac_init_idc)
        payload, fixup = ecabac.encode_ops(states, ops, hdr_bytes[-1])
        hdr_bytes[-1] = fixup
        return nal_unit(nal_type, nal_ref_idc, bytes(hdr_bytes) + payload)

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
            import sys
            for line in self.stats.report_lines():
                print(f"x264_tpu [info]: {line}", file=sys.stderr)
        return summary
