"""Minimal H.264 reference decoder for encoder verification.

From-scratch spec implementation (NumPy, scalar, slow-but-clear), playing
the role the JM decoder plays in the reference's regression flow
(doc/regression_test.txt): decode the produced bitstream and compare
against the encoder's internal reconstruction.

Currently supports: baseline/high SPS (4:2:0 8-bit), CAVLC I slices with
I_16x16 macroblocks, deblocking disabled. Extended together with the
encoder (I_4x4, P slices, CABAC, deblocking...). Unsupported syntax raises
loudly — silent wrong decodes are the enemy.
"""

from __future__ import annotations

import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import golden_dsp as G  # noqa: E402
import golden_deblock  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from x264_tpu.entropy import cavlc_tables as T  # noqa: E402
from x264_tpu import tables as enc_tables  # noqa: E402

from .bits import BitReader, split_annexb, unescape  # noqa: E402

ZIG4 = enc_tables.ZIGZAG4
BLOCK_XY = enc_tables.LUMA4x4_BLOCK_XY


def _build_decode_table(arr2d):
    """(N,2) of (value,length) -> dict[(length,value)] -> index."""
    d = {}
    for idx, (v, l) in enumerate(arr2d):
        if l > 0:
            d[(int(l), int(v))] = idx
    return d


_COEFF_TOKEN_DEC = [
    _build_decode_table(T.COEFF_TOKEN[i]) for i in range(5)]
_COEFF0_DEC = [(int(T.COEFF0_TOKEN[i][1]), int(T.COEFF0_TOKEN[i][0]))
               for i in range(5)]
_TOTAL_ZEROS_DEC = [
    _build_decode_table(T.TOTAL_ZEROS[i]) for i in range(15)]
_TOTAL_ZEROS_DC_DEC = [
    _build_decode_table(T.TOTAL_ZEROS_DC[i]) for i in range(3)]
_RUN_BEFORE_DEC = [
    _build_decode_table(T.RUN_BEFORE[i]) for i in range(7)]

_CT_INDEX = [0, 0, 1, 1, 2, 2, 2, 2] + [3] * 9


def _read_vlc(br: BitReader, table: dict, max_len=20):
    length = 0
    value = 0
    while length < max_len:
        value = (value << 1) | br.bit()
        length += 1
        if (length, value) in table:
            return table[(length, value)]
    raise ValueError("VLC decode failure")


def decode_coeff_token(br: BitReader, nc: int):
    """Returns (total_coeff, trailing_ones)."""
    cls = 4 if nc < 0 else _CT_INDEX[min(nc, 16)]
    # try the coeff0 token first (it's a prefix-free code set with it)
    merged = dict(_COEFF_TOKEN_DEC[cls])
    l0, v0 = _COEFF0_DEC[cls]
    merged[(l0, v0)] = -1
    idx = _read_vlc(br, merged, max_len=24)
    if idx == -1:
        return 0, 0
    return idx // 4 + 1, idx % 4


def decode_residual(br: BitReader, nc: int, max_coeff: int) -> np.ndarray:
    """Spec 9.2 residual_block_cavlc. Returns coeffs in scan order."""
    coeffs = np.zeros(max_coeff, dtype=np.int64)
    total, trailing = decode_coeff_token(br, nc)
    if total == 0:
        return coeffs
    levels = np.zeros(total, dtype=np.int64)
    for i in range(trailing):
        levels[i] = -1 if br.bit() else 1
    suffix_length = 1 if (total > 10 and trailing < 3) else 0
    for i in range(trailing, total):
        # level_prefix
        level_prefix = 0
        while br.bit() == 0:
            level_prefix += 1
            if level_prefix > 32:
                raise ValueError("bad level_prefix")
        level_suffix_size = suffix_length
        if level_prefix == 14 and suffix_length == 0:
            level_suffix_size = 4
        elif level_prefix >= 15:
            level_suffix_size = level_prefix - 3
        level_suffix = br.u(level_suffix_size) if level_suffix_size else 0
        level_code = (min(15, level_prefix) << suffix_length) + level_suffix
        if level_prefix >= 15 and suffix_length == 0:
            level_code += 15
        if level_prefix >= 16:
            level_code += (1 << (level_prefix - 3)) - 4096
        if i == trailing and trailing < 3:
            level_code += 2
        if level_code % 2 == 0:
            levels[i] = (level_code + 2) >> 1
        else:
            levels[i] = (-level_code - 1) >> 1
        if suffix_length == 0:
            suffix_length = 1
        if abs(levels[i]) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1

    if total < max_coeff:
        if nc < 0:
            total_zeros = _read_vlc(br, _TOTAL_ZEROS_DC_DEC[total - 1])
        else:
            total_zeros = _read_vlc(br, _TOTAL_ZEROS_DEC[total - 1])
    else:
        total_zeros = 0

    runs = np.zeros(total, dtype=np.int64)
    zeros_left = total_zeros
    for i in range(total - 1):
        if zeros_left > 0:
            zl = min(zeros_left - 1, 6)
            runs[i] = _read_vlc(br, _RUN_BEFORE_DEC[zl])
        zeros_left -= runs[i]
    runs[total - 1] = zeros_left

    pos = total_zeros + total - 1
    for i in range(total):
        coeffs[pos] = levels[i]
        pos -= 1 + runs[i]
    return coeffs


class SPSInfo:
    pass


class PPSInfo:
    pass


def parse_sps(rbsp: bytes) -> SPSInfo:
    br = BitReader(rbsp)
    s = SPSInfo()
    s.profile_idc = br.u(8)
    br.u(8)  # constraint flags + reserved
    s.level_idc = br.u(8)
    s.sps_id = br.ue()
    if s.profile_idc >= 100:
        s.chroma_format_idc = br.ue()
        assert s.chroma_format_idc == 1, "only 4:2:0"
        assert br.ue() == 0 and br.ue() == 0, "8-bit only"
        s.qpprime_y_zero_transform_bypass = br.bit()
        assert br.bit() == 0, "seq scaling matrix unsupported"
    else:
        s.chroma_format_idc = 1
        s.qpprime_y_zero_transform_bypass = 0
    s.log2_max_frame_num = br.ue() + 4
    s.poc_type = br.ue()
    assert s.poc_type == 0
    s.log2_max_poc_lsb = br.ue() + 4
    s.num_ref_frames = br.ue()
    br.bit()  # gaps allowed
    s.mb_width = br.ue() + 1
    s.mb_height = br.ue() + 1
    s.frame_mbs_only = br.bit()
    assert s.frame_mbs_only == 1
    s.direct8x8 = br.bit()
    s.crop = br.bit()
    s.crop_l = s.crop_r = s.crop_t = s.crop_b = 0
    if s.crop:
        s.crop_l = br.ue() * 2
        s.crop_r = br.ue() * 2
        s.crop_t = br.ue() * 2
        s.crop_b = br.ue() * 2
    s.vui = br.bit()
    return s


def parse_pps(rbsp: bytes) -> PPSInfo:
    br = BitReader(rbsp)
    p = PPSInfo()
    p.pps_id = br.ue()
    p.sps_id = br.ue()
    p.cabac = br.bit()
    assert p.cabac == 0, "CABAC decode not yet supported"
    p.pic_order_present = br.bit()
    assert br.ue() == 0, "slice groups unsupported"
    p.num_ref_idx_l0 = br.ue() + 1
    p.num_ref_idx_l1 = br.ue() + 1
    p.weighted_pred = br.bit()
    p.weighted_bipred = br.u(2)
    p.pic_init_qp = br.se() + 26
    p.pic_init_qs = br.se() + 26
    p.chroma_qp_offset = br.se()
    p.deblocking_control = br.bit()
    p.constrained_intra = br.bit()
    p.redundant_pic = br.bit()
    p.transform_8x8 = 0
    p.second_chroma_qp_offset = p.chroma_qp_offset
    if br.more_rbsp_data():
        p.transform_8x8 = br.bit()
        assert br.bit() == 0, "pic scaling matrix unsupported"
        p.second_chroma_qp_offset = br.se()
    return p


class DecodedFrame:
    def __init__(self, y, u, v):
        self.y, self.u, self.v = y, u, v


def _chroma_qp(qp, offset):
    return int(enc_tables.CHROMA_QP_TABLE[int(np.clip(qp + offset, 0, 51))])


class Decoder:
    def __init__(self):
        self.sps = None
        self.pps = None
        self.frames = []

    def decode_nal(self, nal: bytes):
        nal_type = nal[0] & 0x1F
        rbsp = unescape(nal[1:])
        if nal_type == 7:
            self.sps = parse_sps(rbsp)
        elif nal_type == 8:
            self.pps = parse_pps(rbsp)
        elif nal_type in (1, 5):
            self.frames.append(self._decode_slice(rbsp, nal_type == 5))
        # SEI/AUD ignored

    # ------------------------------------------------------------ slice
    def _decode_slice(self, rbsp: bytes, is_idr: bool) -> DecodedFrame:
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        first_mb = br.ue()
        assert first_mb == 0, "multi-slice not yet supported"
        slice_type = br.ue()
        assert slice_type % 5 == 2, "only I slices supported"
        pps_id = br.ue()
        br.u(sps.log2_max_frame_num)  # frame_num
        if is_idr:
            br.ue()  # idr_pic_id
        br.u(sps.log2_max_poc_lsb)    # poc_lsb
        # dec_ref_pic_marking (nal_ref_idc != 0 assumed for IDR/I here)
        if is_idr:
            br.bit()
            br.bit()
        else:
            if br.bit():
                raise NotImplementedError("adaptive marking")
        qp = pps.pic_init_qp + br.se()
        disable_deblock, alpha_div2, beta_div2 = 1, 0, 0
        if pps.deblocking_control:
            disable_deblock = br.ue()
            if disable_deblock != 1:
                alpha_div2 = br.se()
                beta_div2 = br.se()

        mb_w, mb_h = sps.mb_width, sps.mb_height
        Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int64)
        U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
        V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
        nnz_l = np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64)
        nnz_c = np.zeros((2, mb_h * 2, mb_w * 2), dtype=np.int64)
        qp_mb = np.zeros((mb_h, mb_w), dtype=np.int32)
        intra_mb = np.zeros((mb_h, mb_w), dtype=bool)

        qt = enc_tables.DEFAULT_QUANT

        for my in range(mb_h):
            for mx in range(mb_w):
                qp = self._decode_mb_i(br, my, mx, qp, qt, Y, U, V,
                                       nnz_l, nnz_c)
                qp_mb[my, mx] = qp
                intra_mb[my, mx] = True

        if disable_deblock != 1:
            # per-4x4 nnz incl. the I16x16 DC (irrelevant for intra-only
            # frames where bS >= 3, but kept for when P lands)
            golden_deblock.deblock_frame(
                Y, U, V, qp_mb, intra_mb, nnz4=nnz_l,
                alpha_off=2 * alpha_div2, beta_off=2 * beta_div2,
                chroma_qp_offset=pps.chroma_qp_offset)

        return DecodedFrame(
            Y[:mb_h * 16 - sps.crop_b, :mb_w * 16 - sps.crop_r].astype(np.uint8),
            U[:(mb_h * 16 - sps.crop_b) // 2, :(mb_w * 16 - sps.crop_r) // 2].astype(np.uint8),
            V[:(mb_h * 16 - sps.crop_b) // 2, :(mb_w * 16 - sps.crop_r) // 2].astype(np.uint8))

    # ------------------------------------------------------------ macroblock
    def _nc(self, m, gy, gx):
        a = m[gy, gx - 1] if gx > 0 else -1
        b = m[gy - 1, gx] if gy > 0 else -1
        if a >= 0 and b >= 0:
            return (int(a) + int(b) + 1) >> 1
        if a >= 0:
            return int(a)
        if b >= 0:
            return int(b)
        return 0

    def _decode_mb_i(self, br, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c):
        sps, pps = self.sps, self.pps
        mb_type = br.ue()
        if mb_type == 0:
            raise NotImplementedError("I_4x4 decode")
        if mb_type == 25:
            raise NotImplementedError("I_PCM")
        assert 1 <= mb_type <= 24, mb_type
        t = mb_type - 1
        cbp_luma = 15 if t >= 12 else 0
        cbp_chroma = (t % 12) // 4
        pred16 = t % 4
        chroma_pred = br.ue()

        dqp = br.se()
        qp = qp + dqp  # NB: caller keeps qp per slice; CQP streams use 0
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        has_top = my > 0
        has_left = mx > 0

        # luma prediction
        y0, x0 = my * 16, mx * 16
        top = Y[y0 - 1, x0:x0 + 16] if has_top else np.zeros(16, np.int64)
        left = Y[y0:y0 + 16, x0 - 1] if has_left else np.zeros(16, np.int64)
        topleft = int(Y[y0 - 1, x0 - 1]) if (has_top and has_left) else 0
        pred = G.predict_16x16(pred16, top, left, topleft, has_top, has_left)
        assert pred is not None, "illegal pred mode"

        # residual: luma DC
        nc_dc = self._nc(nnz_l, my * 4, mx * 4)
        dc_z = decode_residual(br, nc_dc, 16)
        dc = np.zeros(16, dtype=np.int64)
        dc[np.asarray(ZIG4)] = dc_z
        dc = dc.reshape(4, 4)

        blocks = np.zeros((16, 4, 4), dtype=np.int64)  # z-scan order
        if cbp_luma:
            for i in range(16):
                bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
                nc = self._nc(nnz_l, my * 4 + by, mx * 4 + bx)
                ac_z = decode_residual(br, nc, 15)
                nnz_l[my * 4 + by, mx * 4 + bx] = np.count_nonzero(ac_z)
                ac = np.zeros(16, dtype=np.int64)
                ac[np.asarray(ZIG4)[1:]] = ac_z
                blocks[i] = ac.reshape(4, 4)
        else:
            nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0

        # luma reconstruction
        dmf = qt.dequant4_mf[enc_tables.CQM_4IY, qp % 6]
        dc_rec = G.dequant_4x4_dc(G.hadamard4x4_inv(dc), int(dmf[0]), qp)
        mb = pred.copy()
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            if cbp_luma:
                b = G.dequant(blocks[i].ravel(), dmf, qp, 4).reshape(4, 4)
                b[0, 0] = dc_rec[by, bx]
                r = G.idct4x4(b)
            else:
                r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                            dtype=np.int64)
            blk = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
            mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(blk, 0, 255)
        Y[y0:y0 + 16, x0:x0 + 16] = mb

        # chroma residual
        cdc = np.zeros((2, 2, 2), dtype=np.int64)
        cac = np.zeros((2, 4, 4, 4), dtype=np.int64)
        if cbp_chroma:
            for ch in range(2):
                z = decode_residual(br, -1, 4)
                cdc[ch] = z.reshape(2, 2)  # spec scan = raster c00,c01,c10,c11
            if cbp_chroma & 2:
                for ch in range(2):
                    for i in range(4):
                        bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                            int(enc_tables.CHROMA_BLOCK_XY[i][1])
                        nc = self._nc(nnz_c[ch], my * 2 + by, mx * 2 + bx)
                        ac_z = decode_residual(br, nc, 15)
                        nnz_c[ch, my * 2 + by, mx * 2 + bx] = \
                            np.count_nonzero(ac_z)
                        ac = np.zeros(16, dtype=np.int64)
                        ac[np.asarray(ZIG4)[1:]] = ac_z
                        cac[ch, i] = ac.reshape(4, 4)
        if not (cbp_chroma & 2):
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0

        # chroma prediction + recon
        c0y, c0x = my * 8, mx * 8
        cdmf = qt.dequant4_mf[enc_tables.CQM_4IC, qpc % 6]
        for ch, P in ((0, U), (1, V)):
            ctop = P[c0y - 1, c0x:c0x + 8] if has_top else np.zeros(8, np.int64)
            cleft = P[c0y:c0y + 8, c0x - 1] if has_left else np.zeros(8, np.int64)
            ctl = int(P[c0y - 1, c0x - 1]) if (has_top and has_left) else 0
            cpred = G.predict_8x8c(chroma_pred, ctop, cleft, ctl,
                                   has_top, has_left)
            assert cpred is not None
            dc_rec = G.dequant_2x2_dc(G.hadamard2x2(cdc[ch]), int(cdmf[0]), qpc)
            cmb = cpred.copy()
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    b = G.dequant(cac[ch, i].ravel(), cdmf, qpc, 4).reshape(4, 4)
                    b[0, 0] = dc_rec[by, bx]
                    r = G.idct4x4(b)
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(blk, 0, 255)
            P[c0y:c0y + 8, c0x:c0x + 8] = cmb
        return qp


def decode_annexb(stream: bytes):
    """Decode an Annex-B byte stream; returns list of DecodedFrame."""
    dec = Decoder()
    for nal in split_annexb(stream):
        dec.decode_nal(nal)
    return dec.frames
