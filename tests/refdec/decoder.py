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
import golden_mc  # noqa: E402

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

# inverse of the spec Table 9-4 CBP mapping (encoder side:
# entropy/device.py CBP_TO_GOLOMB_*)
from x264_tpu.entropy.device import (  # noqa: E402
    CBP_TO_GOLOMB_INTER, CBP_TO_GOLOMB_INTRA)
_GOLOMB_TO_CBP_INTER = np.zeros(48, np.int64)
_GOLOMB_TO_CBP_INTER[CBP_TO_GOLOMB_INTER] = np.arange(48)
_GOLOMB_TO_CBP_INTRA = np.zeros(48, np.int64)
_GOLOMB_TO_CBP_INTRA[CBP_TO_GOLOMB_INTRA] = np.arange(48)


def _median3(a, b, c):
    return a + b + c - min(a, b, c) - max(a, b, c)


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
    p.scaling4 = None
    p.scaling8 = None
    if br.more_rbsp_data():
        p.transform_8x8 = br.bit()
        if br.bit():
            # pic_scaling_matrix: spec list order with fall-back rule A
            # (7.3.2.1.1.1 / Table 7-2); Cb == Cr required here
            from x264_tpu import cqm as xcqm
            l0 = xcqm.read_scaling_list(br, 16, xcqm.JVT_4IY,
                                        xcqm.JVT_4IY)
            l1 = xcqm.read_scaling_list(br, 16, l0, xcqm.JVT_4IY)
            l2 = xcqm.read_scaling_list(br, 16, l1, xcqm.JVT_4IY)
            assert np.array_equal(l1, l2), "Cb != Cr unsupported"
            l3 = xcqm.read_scaling_list(br, 16, xcqm.JVT_4PY,
                                        xcqm.JVT_4PY)
            l4 = xcqm.read_scaling_list(br, 16, l3, xcqm.JVT_4PY)
            l5 = xcqm.read_scaling_list(br, 16, l4, xcqm.JVT_4PY)
            assert np.array_equal(l4, l5), "Cb != Cr unsupported"
            p.scaling4 = np.stack([l0, l3, l1, l4])  # [4IY,4PY,4IC,4PC]
            if p.transform_8x8:
                l6 = xcqm.read_scaling_list(br, 64, xcqm.JVT_8IY,
                                            xcqm.JVT_8IY)
                l7 = xcqm.read_scaling_list(br, 64, xcqm.JVT_8PY,
                                            xcqm.JVT_8PY)
                p.scaling8 = np.stack([l6, l7])
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
        self.ref = None   # most recent reference planes (P list0[0])
        self.dpb = []     # [(poc, (Y, U, V))] reference frames, poc order
        self.list0 = []   # per-P-slice L0 list (PicNum descending)
        self._nref0 = 1   # num_ref_idx_l0_active of the current slice
        self._pic = None  # in-progress picture (multi-slice)
        self._row0 = 0    # top MB row of the slice being decoded

    def _quant_tables(self):
        """QuantTables for the active PPS scaling matrices (cached);
        deadzones are irrelevant on the decode side."""
        if getattr(self, "_qt_cache", None) is not None:
            return self._qt_cache
        s4 = getattr(self.pps, "scaling4", None)
        s8 = getattr(self.pps, "scaling8", None)
        if s4 is None and s8 is None:
            self._qt_cache = enc_tables.DEFAULT_QUANT
        else:
            self._qt_cache = enc_tables.QuantTables(
                scaling_list4=s4, scaling_list8=s8)
        return self._qt_cache

    def decode_nal(self, nal: bytes):
        nal_type = nal[0] & 0x1F
        nal_ref_idc = (nal[0] >> 5) & 3
        rbsp = unescape(nal[1:])
        if nal_type == 7:
            self.sps = parse_sps(rbsp)
        elif nal_type == 8:
            self.pps = parse_pps(rbsp)
            self._qt_cache = None
        elif nal_type in (1, 5):
            frame = self._decode_slice(rbsp, nal_type == 5, nal_ref_idc)
            if frame is not None:     # None while a picture is partial
                self.frames.append(frame)
        # SEI/AUD ignored

    # ------------------------------------------------------------ slice
    def _decode_slice(self, rbsp: bytes, is_idr: bool,
                      nal_ref_idc: int = 3) -> DecodedFrame:
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        first_mb = br.ue()
        slice_type = br.ue() % 5
        assert slice_type in (0, 1, 2), "only I/P/B slices supported"
        is_p = slice_type == 0
        is_b = slice_type == 1
        pps_id = br.ue()
        br.u(sps.log2_max_frame_num)  # frame_num
        if is_idr:
            br.ue()  # idr_pic_id
        poc_lsb = br.u(sps.log2_max_poc_lsb)
        if is_b:
            assert br.bit() == 1, "only spatial direct supported"
        num_ref = pps.num_ref_idx_l0
        num_ref_l1 = pps.num_ref_idx_l1
        if is_p or is_b:
            if br.bit():              # num_ref_idx_active_override
                num_ref = br.ue() + 1
                if is_b:
                    num_ref_l1 = br.ue() + 1
            assert br.bit() == 0, "ref list reordering unsupported"
            if is_b:
                assert br.bit() == 0, "L1 reordering unsupported"
        assert num_ref <= 2 and num_ref_l1 == 1, \
            "at most 2 L0 refs supported"
        assert not (is_b and num_ref > 1), "multi-ref B unsupported"
        self._nref0 = num_ref
        if nal_ref_idc != 0:
            if is_idr:
                br.bit()
                br.bit()
            else:
                if br.bit():
                    raise NotImplementedError("adaptive marking")
        cabac_init_idc = 0
        if pps.cabac and (is_p or is_b):
            cabac_init_idc = br.ue()
        self._cabac_init_idc = cabac_init_idc
        qp = pps.pic_init_qp + br.se()
        disable_deblock, alpha_div2, beta_div2 = 1, 0, 0
        if pps.deblocking_control:
            disable_deblock = br.ue()
            if disable_deblock != 1:
                alpha_div2 = br.se()
                beta_div2 = br.se()

        mb_w, mb_h = sps.mb_width, sps.mb_height
        nmb = mb_h * mb_w
        if first_mb == 0:
            # new picture (spec 7.4.3: first_mb_in_slice == 0 starts one)
            self._pic = dict(
                Y=np.zeros((mb_h * 16, mb_w * 16), dtype=np.int64),
                U=np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64),
                V=np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64),
                nnz_l=np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64),
                nnz_c=np.zeros((2, mb_h * 2, mb_w * 2), dtype=np.int64),
                qp_mb=np.zeros((mb_h, mb_w), dtype=np.int32),
                intra_mb=np.zeros((mb_h, mb_w), dtype=bool),
                # MV/ref/mvd fields at 4x4-block granularity (the
                # scan8 cache analogue) for MV prediction, CABAC mvd
                # contexts and deblock bS (-2 = outside/unavailable)
                mv_f=np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64),
                ref_f=np.full((mb_h * 4, mb_w * 4), -2, dtype=np.int64),
                mvd_f=np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64),
                mv_f1=np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64),
                ref_f1=np.full((mb_h * 4, mb_w * 4), -2, dtype=np.int64),
                is_b=is_b, poc=poc_lsb, ref_idc=nal_ref_idc,
                i4grid=np.full((mb_h * 4, mb_w * 4), 2, np.int64),
                t8_map=np.zeros((mb_h, mb_w), dtype=bool),
                slices=[], next_mb=0)
        pic = self._pic
        assert pic is not None and pic["next_mb"] == first_mb, \
            "slices must arrive in decoding order"
        Y, U, V = pic["Y"], pic["U"], pic["V"]
        nnz_l, nnz_c = pic["nnz_l"], pic["nnz_c"]
        qp_mb, intra_mb = pic["qp_mb"], pic["intra_mb"]
        mv_f, ref_f = pic["mv_f"], pic["ref_f"]
        mv_f1, ref_f1 = pic["mv_f1"], pic["ref_f1"]
        i4grid = pic["i4grid"]

        row0 = first_mb // mb_w
        assert first_mb == row0 * mb_w, "slices must start at MB rows"
        self._row0 = row0
        # Mask the row above this slice as unavailable (cross-slice
        # neighbors, spec 6.4.8): nnz -> -1 (the _nc unavailable value),
        # ref -> -2 (outside), i4 pred modes -> 2 (DC, spec 8.3.1.1).
        saved = None
        saved_l1 = None
        if row0 > 0:
            saved = (nnz_l[row0 * 4 - 1].copy(),
                     nnz_c[:, row0 * 2 - 1].copy(),
                     ref_f[row0 * 4 - 1].copy(),
                     i4grid[row0 * 4 - 1].copy())
            nnz_l[row0 * 4 - 1] = -1
            nnz_c[:, row0 * 2 - 1] = -1
            ref_f[row0 * 4 - 1] = -2
            i4grid[row0 * 4 - 1] = 2
            if is_b:
                saved_l1 = ref_f1[row0 * 4 - 1].copy()
                ref_f1[row0 * 4 - 1] = -2

        qt = self._quant_tables()

        mv_f1, ref_f1 = pic["mv_f1"], pic["ref_f1"]
        if is_p:
            # P list0: default order = PicNum descending (spec 8.2.4.2.1)
            # — most recent reference first; coding order == poc order
            # for the reference frames of a closed GOP
            self.list0 = [e[1] for e in
                          sorted(self.dpb, key=lambda e: -e[0])][:num_ref]
            if not self.list0 and self.ref is not None:
                self.list0 = [self.ref]
            assert len(self.list0) >= num_ref, \
                "DPB smaller than num_ref_idx_active"
        if is_b:
            # reference lists by POC (x264_reference_build_list):
            # L0 = closest past, L1 = closest future
            past = [e for e in self.dpb if e[0] < poc_lsb]
            futr = [e for e in self.dpb if e[0] > poc_lsb]
            assert past and futr, "B slice without past+future refs"
            self._ref_l0 = max(past, key=lambda e: e[0])[1]
            l1e = min(futr, key=lambda e: e[0])
            self._ref_l1 = l1e[1]
            self._col = l1e[2]      # colocated (ref_f, mv_f) maps

        if pps.cabac and is_b:
            mb_end = self._decode_b_slice_cabac(
                br, rbsp, qp, qt, Y, U, V, nnz_l, nnz_c, qp_mb,
                intra_mb, mv_f, ref_f, mv_f1, ref_f1, first_mb)
        elif is_b:
            assert self.dpb, "B slice with empty DPB"
            mb_i = first_mb
            while mb_i < nmb and br.more_rbsp_data():
                skip_run = br.ue()
                for _ in range(skip_run):        # B_SKIP run
                    my, mx = divmod(mb_i, mb_w)
                    use0, use1, mv0q, mv1q = self._decode_direct_fields(
                        my, mx, mv_f, ref_f, mv_f1, ref_f1)
                    py, pu, pv = self._direct_pred(my, mx, use0, mv0q,
                                                   use1, mv1q)
                    Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = py
                    U[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pu
                    V[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pv
                    nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                    qp_mb[my, mx] = qp
                    mb_i += 1
                if mb_i >= nmb:
                    break
                my, mx = divmod(mb_i, mb_w)
                qp = self._decode_mb_b(br, my, mx, qp, qt, Y, U, V,
                                       nnz_l, nnz_c, mv_f, ref_f,
                                       mv_f1, ref_f1, intra_mb)
                qp_mb[my, mx] = qp
                mb_i += 1
            mb_end = mb_i
        elif pps.cabac and is_p:
            mb_end = self._decode_p_slice_cabac(
                br, rbsp, qp, qt, Y, U, V, nnz_l, nnz_c, qp_mb,
                intra_mb, mv_f, ref_f, first_mb)
        elif pps.cabac:
            mb_end = self._decode_i_slice_cabac(
                br, rbsp, qp, qt, Y, U, V, nnz_l, nnz_c, qp_mb,
                intra_mb, first_mb)
        elif not is_p:
            mb_i = first_mb
            while mb_i < nmb:
                my, mx = divmod(mb_i, mb_w)
                qp = self._decode_mb_i(br, my, mx, qp, qt, Y, U, V,
                                       nnz_l, nnz_c, i4grid=i4grid)
                qp_mb[my, mx] = qp
                intra_mb[my, mx] = True
                mb_i += 1
                if not br.more_rbsp_data():
                    break
            mb_end = mb_i
        else:
            assert self.ref is not None, "P slice with empty DPB"
            mb_i = first_mb
            while mb_i < nmb and br.more_rbsp_data():
                skip_run = br.ue()
                for _ in range(skip_run):
                    my, mx = divmod(mb_i, mb_w)
                    self._decode_mb_pskip(my, mx, Y, U, V, mv_f, ref_f)
                    qp_mb[my, mx] = qp
                    mb_i += 1
                if mb_i >= nmb:
                    break
                my, mx = divmod(mb_i, mb_w)
                qp = self._decode_mb_p(br, my, mx, qp, qt, Y, U, V,
                                       nnz_l, nnz_c, mv_f, ref_f,
                                       intra_mb)
                qp_mb[my, mx] = qp
                mb_i += 1
            mb_end = mb_i

        if saved_l1 is not None:
            ref_f1[row0 * 4 - 1] = saved_l1
        if saved is not None:
            nnz_l[row0 * 4 - 1] = saved[0]
            nnz_c[:, row0 * 2 - 1] = saved[1]
            ref_f[row0 * 4 - 1] = saved[2]
            i4grid[row0 * 4 - 1] = saved[3]
        self._row0 = 0

        assert mb_end % mb_w == 0, "slice must end at an MB row boundary"
        pic["slices"].append((row0, mb_end // mb_w, disable_deblock,
                              alpha_div2, beta_div2))
        pic["next_mb"] = mb_end
        if mb_end < nmb:
            return None     # picture continues in the next slice NAL

        # ------------------------------------------------ picture complete
        for (r0, r1, dis, a2, b2) in pic["slices"]:
            if dis == 1:
                continue
            assert dis == 2 or len(pic["slices"]) == 1, \
                "cross-slice deblocking (idc 0) not supported"
            ref4 = ref_f[r0 * 4:r1 * 4]
            mv4 = mv_f[r0 * 4:r1 * 4]
            kw = {}
            if pic["is_b"]:
                kw = dict(ref4_l1=pic["ref_f1"][r0 * 4:r1 * 4],
                          mv4_l1=pic["mv_f1"][r0 * 4:r1 * 4])
            golden_deblock.deblock_frame(
                Y[r0 * 16:r1 * 16], U[r0 * 8:r1 * 8], V[r0 * 8:r1 * 8],
                qp_mb[r0:r1], intra_mb[r0:r1], nnz4=nnz_l[r0 * 4:r1 * 4],
                ref4=ref4, mv4=mv4,
                alpha_off=2 * a2, beta_off=2 * b2,
                chroma_qp_offset=pps.chroma_qp_offset,
                t8_mb=pic["t8_map"][r0:r1], **kw)

        self.last_pic = pic      # retained for test introspection
        self._pic = None
        if is_idr:
            self.dpb = []
        if pic["ref_idc"] != 0:
            planes = (Y.copy(), U.copy(), V.copy())
            self.ref = planes
            # keep the L0 motion field with the reference: B spatial
            # direct reads the colocated maps of RefPicList1[0]
            self.dpb.append((pic["poc"], planes,
                             (ref_f.copy(), mv_f.copy())))
            max_refs = max(2, self.sps.num_ref_frames)
            if len(self.dpb) > max_refs:
                self.dpb.sort(key=lambda e: e[0])
                self.dpb.pop(0)       # sliding window: oldest poc out
        return DecodedFrame(
            Y[:mb_h * 16 - sps.crop_b, :mb_w * 16 - sps.crop_r].astype(np.uint8),
            U[:(mb_h * 16 - sps.crop_b) // 2, :(mb_w * 16 - sps.crop_r) // 2].astype(np.uint8),
            V[:(mb_h * 16 - sps.crop_b) // 2, :(mb_w * 16 - sps.crop_r) // 2].astype(np.uint8))

    # ------------------------------------------------------------ CABAC
    def _decode_i_slice_cabac(self, br, rbsp, qp, qt, Y, U, V,
                              nnz_l, nnz_c, qp_mb, intra_mb,
                              first_mb=0):
        """CABAC I16x16 slice decode (spec 9.3; context derivations of
        encoder/cabac.c mirrored). Starts at first_mb, ends at the
        end_of_slice terminal (multi-slice / MB-row-band streams)."""
        from x264_tpu.entropy.cabac import CabacDecoder
        from x264_tpu.entropy import cabac_tables as ctab

        mb_w, mb_h = self.sps.mb_width, self.sps.mb_height
        # cabac_alignment_one_bit
        while br.pos % 8:
            assert br.bit() == 1, "bad cabac alignment"
        cd = CabacDecoder(rbsp[br.pos // 8:],
                          ctab.init_states(True, qp).copy())

        self._qpstate = {"qp": qp, "pnz": False}
        dcnz = np.zeros((mb_h, mb_w), np.int64)
        cdcnz = np.zeros((2, mb_h, mb_w), np.int64)
        cm_map = np.zeros((mb_h, mb_w), np.int64)
        i4mb = np.zeros((mb_h, mb_w), bool)
        i4grid = np.full((mb_h * 4, mb_w * 4), 2, np.int64)
        cbp_l_map = np.zeros((mb_h, mb_w), np.int64)
        cbp_c_map = np.zeros((mb_h, mb_w), np.int64)
        mb_i = first_mb
        while mb_i < mb_h * mb_w:
            my, mx = divmod(mb_i, mb_w)
            self._decode_mb_i16_cabac(cd, my, mx, self._qpstate["qp"],
                                      qt, Y, U, V,
                                      nnz_l, nnz_c, dcnz, cdcnz,
                                      cm_map, i4mb, i4grid,
                                      cbp_l_map, cbp_c_map,
                                      t8_map=self._pic["t8_map"])
            qp_mb[my, mx] = self._qpstate["qp"]
            intra_mb[my, mx] = True
            mb_i += 1
            if cd.terminal():
                break
        return mb_i

    _MVD_CTX_OFF = [0, 3, 4, 5, 6, 6, 6, 6, 6]

    def _decode_p_slice_cabac(self, br, rbsp, qp, qt, Y, U, V,
                              nnz_l, nnz_c, qp_mb, intra_mb, mv_f, ref_f,
                              first_mb=0):
        """CABAC P slice decode (P_L0 16x16/16x8/8x16 + I16x16 +
        P_Skip). Starts at first_mb, ends at the end_of_slice terminal
        (multi-slice / MB-row-band streams)."""
        from x264_tpu.entropy.cabac import CabacDecoder
        from x264_tpu.entropy import cabac_tables as ctab

        mb_w, mb_h = self.sps.mb_width, self.sps.mb_height
        while br.pos % 8:
            assert br.bit() == 1, "bad cabac alignment"
        cd = CabacDecoder(rbsp[br.pos // 8:],
                          ctab.init_states(False, qp,
                                           self._cabac_init_idc).copy())

        row0 = first_mb // mb_w
        self._qpstate = {"qp": qp, "pnz": False}
        dcnz = np.zeros((mb_h, mb_w), np.int64)
        cdcnz = np.zeros((2, mb_h, mb_w), np.int64)
        cm_map = np.zeros((mb_h, mb_w), np.int64)
        skip_map = np.zeros((mb_h, mb_w), bool)
        mvd_map = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        cbp_l_map = np.zeros((mb_h, mb_w), np.int64)
        cbp_c_map = np.zeros((mb_h, mb_w), np.int64)

        mb_i = first_mb
        while mb_i < mb_h * mb_w:
            my, mx = divmod(mb_i, mb_w)
            inc = 11 \
                + (1 if (mx > 0 and not skip_map[my, mx - 1]) else 0) \
                + (1 if (my > row0 and not skip_map[my - 1, mx]) else 0)
            if cd.decision(inc):
                skip_map[my, mx] = True
                self._decode_mb_pskip(my, mx, Y, U, V, mv_f, ref_f)
                self._skip_dqp_cabac()
            else:
                self._decode_mb_p_cabac(
                    cd, my, mx, self._qpstate["qp"], qt, Y, U, V,
                    nnz_l, nnz_c,
                    mv_f, ref_f, intra_mb, dcnz, cdcnz, cm_map,
                    mvd_map, cbp_l_map, cbp_c_map, row0,
                    t8_map=self._pic["t8_map"])
            qp_mb[my, mx] = self._qpstate["qp"]
            mb_i += 1
            if cd.terminal():
                break
        return mb_i

    def _decode_mvd_cabac(self, cd, base, inc):
        if not cd.decision(base + inc):
            return 0
        i = 1
        while i < 9 and cd.decision(base + self._MVD_CTX_OFF[i]):
            i += 1
        a = i if i < 9 else 9 + cd.ue_bypass(3)
        return -a if cd.bypass() else a

    def _decode_mb_p_cabac(self, cd, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c,
                           mv_f, ref_f, intra_mb, dcnz, cdcnz, cm_map,
                           mvd_map, cbp_l_map, cbp_c_map, row0=0,
                           t8_map=None):
        pps = self.pps
        mb_w, mb_h = self.sps.mb_width, self.sps.mb_height
        avail_l, avail_t = mx > 0, my > row0

        def nz_flag(m, gy, gx, unavail, lim_scale=4):
            if gy < row0 * lim_scale or gx < 0:
                return unavail
            return 1 if m[gy, gx] else 0

        if cd.decision(14):
            # ---- intra (I16x16) in P: suffix ctx 17..20
            assert cd.decision(17) == 1, "I_4x4 in P unsupported"
            assert cd.terminal() == 0, "I_PCM unsupported"
            cbp_luma = 15 if cd.decision(18) else 0
            cbp_chroma = 0
            if cd.decision(19):
                cbp_chroma = 2 if cd.decision(19) else 1
            pred16 = (cd.decision(20) << 1) | cd.decision(20)
            cctx = 64 \
                + (1 if (avail_l and cm_map[my, mx - 1] != 0) else 0) \
                + (1 if (avail_t and cm_map[my - 1, mx] != 0) else 0)
            if not cd.decision(cctx):
                cm = 0
            elif not cd.decision(67):
                cm = 1
            elif not cd.decision(67):
                cm = 2
            else:
                cm = 3
            cm_map[my, mx] = cm
            qp = self._read_dqp_cabac(cd)
            qpc = _chroma_qp(qp, pps.chroma_qp_offset)

            ctx_dc = 2 * nz_flag(dcnz, my - 1, mx, 1, 1) \
                + nz_flag(dcnz, my, mx - 1, 1, 1)
            dc_z = self._residual_cabac(cd, 0, ctx_dc, 16)
            dcnz[my, mx] = 1 if np.any(dc_z) else 0

            blocks_z = np.zeros((16, 15), np.int64)
            if cbp_luma:
                for i in range(16):
                    bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
                    gy, gx = my * 4 + by, mx * 4 + bx
                    inc = 2 * nz_flag(nnz_l, gy - 1, gx, 1) \
                        + nz_flag(nnz_l, gy, gx - 1, 1)
                    z = self._residual_cabac(cd, 1, inc, 15)
                    nnz_l[gy, gx] = np.count_nonzero(z)
                    blocks_z[i] = z
            else:
                nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0

            cdc, cac = self._decode_chroma_res_cabac(
                cd, my, mx, cbp_chroma, nnz_c, cdcnz, 1, row0)
            ref_f[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
            intra_mb[my, mx] = True
            cbp_l_map[my, mx] = cbp_luma
            cbp_c_map[my, mx] = cbp_chroma
            self._recon_i16(my, mx, pred16, cm, qp, qpc, qt,
                            cbp_luma, cbp_chroma, dc_z, blocks_z, cdc, cac,
                            Y, U, V)
            return

        # ---- inter P_L0: prefix bins select 16x16 / 16x8 / 8x16 /
        # P_8x8 (x264_cabac_mb_type P branch, encoder/cabac.c:86-113)
        if cd.decision(15):
            ptype = 1 if cd.decision(17) else 2
        else:
            ptype = 3 if cd.decision(16) else 0

        # ---- sub_mb_type x4 (x264_cabac_mb_sub_p_partition:
        # D_L0_8x8 = '1' bin at ctx 21)
        if ptype == 3:
            for _ in range(4):
                assert cd.decision(21) == 1, \
                    "only P_L0_8x8 sub partitions supported"

        # ---- ref_idx_l0 per partition (x264_cabac_mb_ref ctx 54+:
        # (refA>0) + 2*(refB>0); continuation ctx 58). Partition 0's
        # ref enters the cache before partition 1's ctx reads it.
        ref_idx = 0
        r0, c0 = my * 4, mx * 4
        if self._nref0 > 1:
            def ref_ctx(r, c):
                ra = (c - 1 >= 0 and r >= row0 * 4
                      and int(ref_f[r, c - 1]) > 0)
                rb = (r - 1 >= row0 * 4 and c >= 0
                      and int(ref_f[r - 1, c]) > 0)
                return 54 + (1 if ra else 0) + 2 * (1 if rb else 0)

            if cd.decision(ref_ctx(r0, c0)):
                assert cd.decision(58) == 0, ">2 refs unsupported"
                ref_idx = 1
            if ptype == 3:
                ref_f[r0:r0 + 2, c0:c0 + 2] = ref_idx
                for k in range(1, 4):
                    oy, ox = self.SUB_OFF[k]
                    v = 1 if cd.decision(ref_ctx(r0 + oy, c0 + ox)) \
                        else 0
                    if v:
                        assert cd.decision(58) == 0, ">2 refs"
                    assert v == ref_idx, \
                        "sub-blocks with distinct refs unsupported"
                    ref_f[r0 + oy:r0 + oy + 2,
                          c0 + ox:c0 + ox + 2] = ref_idx
            elif ptype:
                ref_f[r0:r0 + 4, c0:c0 + 4] = ref_idx
                r1c, c1c = (r0 + 2, c0) if ptype == 1 else (r0, c0 + 2)
                v = 1 if cd.decision(ref_ctx(r1c, c1c)) else 0
                if v:
                    assert cd.decision(58) == 0, ">2 refs unsupported"
                assert v == ref_idx, \
                    "partitions with distinct refs unsupported"

        def amvd_at(r, c, comp):
            a = abs(int(mvd_map[r, c - 1, comp])) \
                if (c - 1 >= 0 and r >= row0 * 4) else 0
            b = abs(int(mvd_map[r - 1, c, comp])) \
                if (r - 1 >= row0 * 4 and c >= 0) else 0
            return a + b

        def read_mvd(r, c):
            out = np.zeros(2, np.int64)
            for comp, base in ((0, 40), (1, 47)):
                am = amvd_at(r, c, comp)
                inc = (1 if am > 2 else 0) + (1 if am > 32 else 0)
                out[comp] = self._decode_mvd_cabac(cd, base, inc)
            return out

        sub_mvs = None
        if ptype == 3:
            # sub-block mvds in scan order; each sub's mvd and mv enter
            # the caches before the next sub's ctx/mvp read them
            sub_mvs = []
            for k, (oy, ox) in enumerate(self.SUB_OFF):
                rr, cc = r0 + oy, c0 + ox
                mvdk = read_mvd(rr, cc)
                mvd_map[rr:rr + 2, cc:cc + 2] = mvdk
                mvk = self._mvp_sub8(ref_f, mv_f, my, mx, k,
                                     ref_idx) + mvdk
                mv_f[rr:rr + 2, cc:cc + 2] = mvk
                ref_f[rr:rr + 2, cc:cc + 2] = ref_idx
                sub_mvs.append(mvk)
            mv0, mv1 = sub_mvs[0], sub_mvs[1]
        elif ptype == 0:
            mvd0 = read_mvd(r0, c0)
            mvd_map[r0:r0 + 4, c0:c0 + 4] = mvd0
            mv0 = self._mvp_16x16(ref_f, mv_f, my, mx, ref_idx) + mvd0
            mv1 = mv0
            self._set_part_field(mv_f, ref_f, my, mx, 0, mv0, mv0,
                                 ref_idx)
        else:
            r1, c1 = (r0 + 2, c0) if ptype == 1 else (r0, c0 + 2)
            mvd0 = read_mvd(r0, c0)
            # part-0 mvd enters the cache before part-1's ctx reads it
            if ptype == 1:
                mvd_map[r0:r0 + 2, c0:c0 + 4] = mvd0
            else:
                mvd_map[r0:r0 + 4, c0:c0 + 2] = mvd0
            mvd1 = read_mvd(r1, c1)
            if ptype == 1:
                mvd_map[r0 + 2:r0 + 4, c0:c0 + 4] = mvd1
            else:
                mvd_map[r0:r0 + 4, c0 + 2:c0 + 4] = mvd1
            mv0 = self._mvp_part(ref_f, mv_f, my, mx, ptype, 0,
                                 ref_idx) + mvd0
            self._set_part_field(mv_f, ref_f, my, mx, ptype, mv0, mv0,
                                 ref_idx)
            mv1 = self._mvp_part(ref_f, mv_f, my, mx, ptype, 1,
                                 ref_idx) + mvd1
            self._set_part_field(mv_f, ref_f, my, mx, ptype, mv0, mv1,
                                 ref_idx)

        def cbp_nbr(m, gy, gx):
            if gy < 0 or gx < 0:
                return -1
            return int(m[gy, gx])

        cl = cbp_nbr(cbp_l_map, my, mx - 1) if avail_l else -1
        ct = cbp_nbr(cbp_l_map, my - 1, mx) if avail_t else -1
        cbp = 0
        cbp |= cd.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2)) << 0
        cbp |= cd.decision(76 - ((cbp >> 0) & 1) - ((ct >> 2) & 2)) << 1
        cbp |= cd.decision(76 - ((cl >> 3) & 1) - ((cbp << 1) & 2)) << 2
        cbp |= cd.decision(76 - ((cbp >> 2) & 1) - ((cbp >> 0) & 2)) << 3
        ccl = cbp_nbr(cbp_c_map, my, mx - 1) if avail_l else -1
        cct = cbp_nbr(cbp_c_map, my - 1, mx) if avail_t else -1
        c0 = 77 + (1 if (ccl > 0) else 0) + 2 * (1 if (cct > 0) else 0)
        cbp_chroma = 0
        if cd.decision(c0):
            c1 = 77 + 4 + (1 if ccl == 2 else 0) + 2 * (1 if cct == 2 else 0)
            cbp_chroma = 2 if cd.decision(c1) else 1
        cbp_l_map[my, mx] = cbp
        cbp_c_map[my, mx] = cbp_chroma
        dcnz[my, mx] = 0

        t8 = False
        if self.pps.transform_8x8 and cbp:
            tl = bool(t8_map[my, mx - 1]) if (avail_l
                                              and t8_map is not None) else 0
            tt = bool(t8_map[my - 1, mx]) if (avail_t
                                              and t8_map is not None) else 0
            t8 = bool(cd.decision(399 + int(tl) + int(tt)))
        if t8_map is not None:
            t8_map[my, mx] = t8

        if cbp or cbp_chroma:
            qp = self._read_dqp_cabac(cd)
        else:
            qp = self._skip_dqp_cabac()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        if ptype == 3:
            py, pu, pv = self._inter_pred_p8(my, mx, sub_mvs, ref_idx)
        else:
            py, pu, pv = self._inter_pred_mb(my, mx, ptype, mv0, mv1,
                                             ref_idx)
        mb = py.astype(np.int64)
        if t8:
            dmf8 = qt.dequant8_mf[enc_tables.CQM_8PY, qp % 6]
            for b8 in range(4):
                by, bx = b8 >> 1, b8 & 1
                cy, cx = my * 4 + 2 * by, mx * 4 + 2 * bx
                if (cbp >> b8) & 1:
                    z = self._residual_cabac8(cd)
                    blk = np.zeros(64, dtype=np.int64)
                    blk[np.asarray(enc_tables.ZIGZAG8)] = z
                    r = G.idct8x8(G.dequant(blk, dmf8, qp, 6)
                                  .reshape(8, 8))
                    sl = mb[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] + r
                    mb[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = sl
                    nnz_l[cy:cy + 2, cx:cx + 2] = np.count_nonzero(z)
                else:
                    nnz_l[cy:cy + 2, cx:cx + 2] = 0
        else:
            dmf = qt.dequant4_mf[enc_tables.CQM_4PY, qp % 6]
            for i in range(16):
                bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
                gy, gx = my * 4 + by, mx * 4 + bx
                if (cbp >> (i // 4)) & 1:
                    inc = 2 * nz_flag(nnz_l, gy - 1, gx, 0) \
                        + nz_flag(nnz_l, gy, gx - 1, 0)
                    z = self._residual_cabac(cd, 2, inc, 16)
                    nnz_l[gy, gx] = np.count_nonzero(z)
                    blk = np.zeros(16, dtype=np.int64)
                    blk[np.asarray(ZIG4)] = z
                    if self._bypass(qp):
                        r = blk.reshape(4, 4)
                    else:
                        r = G.idct4x4(G.dequant(blk, dmf, qp, 4)
                                      .reshape(4, 4))
                    b = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                    mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = b
                else:
                    nnz_l[gy, gx] = 0
        Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.clip(mb, 0, 255)

        cdc, cac = self._decode_chroma_res_cabac(
            cd, my, mx, cbp_chroma, nnz_c, cdcnz, 0, row0)
        cdmf = qt.dequant4_mf[enc_tables.CQM_4PC, qpc % 6]
        for ch, (P, pred) in ((0, (U, pu)), (1, (V, pv))):
            dc_rec = (cdc[ch].reshape(2, 2) if self._bypass(qp)
                      else G.dequant_2x2_dc(
                          G.hadamard2x2(cdc[ch].reshape(2, 2)),
                          int(cdmf[0]), qpc))
            cmb = pred.astype(np.int64)
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    a = np.zeros(16, dtype=np.int64)
                    a[np.asarray(ZIG4)[1:]] = cac[ch, i]
                    if self._bypass(qp):
                        r = a.reshape(4, 4)
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(a, cdmf, qpc, 4).reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cmb

    def _decode_chroma_res_cabac(self, cd, my, mx, cbp_chroma, nnz_c,
                                 cdcnz, b_intra, row0=0):
        """Chroma DC + AC residual decode shared by intra/inter CABAC."""
        def nz_flag(m, gy, gx, unavail, lim_scale=2):
            if gy < row0 * lim_scale or gx < 0:
                return unavail
            return 1 if m[gy, gx] else 0

        cdc = np.zeros((2, 4), np.int64)
        cac = np.zeros((2, 4, 15), np.int64)
        if cbp_chroma:
            for ch in range(2):
                inc = 2 * nz_flag(cdcnz[ch], my - 1, mx, b_intra, 1) \
                    + nz_flag(cdcnz[ch], my, mx - 1, b_intra, 1)
                cdc[ch] = self._residual_cabac(cd, 3, inc, 4)
                cdcnz[ch, my, mx] = 1 if np.any(cdc[ch]) else 0
        else:
            cdcnz[:, my, mx] = 0
        if cbp_chroma == 2:
            for ch in range(2):
                for i in range(4):
                    bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                        int(enc_tables.CHROMA_BLOCK_XY[i][1])
                    gy, gx = my * 2 + by, mx * 2 + bx
                    inc = 2 * nz_flag(nnz_c[ch], gy - 1, gx, b_intra) \
                        + nz_flag(nnz_c[ch], gy, gx - 1, b_intra)
                    z = self._residual_cabac(cd, 4, inc, 15)
                    nnz_c[ch, gy, gx] = np.count_nonzero(z)
                    cac[ch, i] = z
        else:
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        return cdc, cac

    def _read_dqp_cabac(self, cd):
        """mb_qp_delta (CABAC): mapped-unary at ctxs [60+c0, 62, 63...]
        where c0 = previous MB coded a nonzero dqp
        (x264_cabac_mb_qp_delta inverse). Updates and returns the
        per-slice QPy state."""
        st = self._qpstate
        inc = 1 if st["pnz"] else 0
        val = 0
        while cd.decision(60 + inc):
            val += 1
            inc = 2 + (inc >> 1)
            assert val < 104
        dqp = (val + 1) // 2 if val & 1 else -(val // 2)
        # spec 7.4.5: QPy = (QPy_prev + mb_qp_delta + 52) % 52 (8-bit)
        st["qp"] = (st["qp"] + dqp + 52) % 52
        st["pnz"] = dqp != 0
        return st["qp"]

    def _skip_dqp_cabac(self):
        """MB without a mb_qp_delta element: QPy inherits, ctx resets."""
        st = self._qpstate
        st["pnz"] = False
        return st["qp"]

    _SIG_BASE = [105, 120, 134, 149, 152, 402]
    _LAST_BASE = [166, 181, 195, 210, 213, 417]
    _LVL_BASE = [227, 237, 247, 257, 266, 426]
    # spec Table 9-43 shared-context maps for luma 8x8 (frame coding)
    _SIG_MAP8 = [
        0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
        4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
        7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
        12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12]
    _LAST_MAP8 = [
        0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
        2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
        3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
        5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8]
    _L1_CTX = [1, 2, 3, 4, 0, 0, 0, 0]
    _GT1_CTX = [5, 5, 5, 5, 6, 7, 8, 9]
    _NODE_TRANS = [[1, 2, 3, 3, 4, 5, 6, 7], [4, 4, 4, 4, 5, 6, 7, 7]]

    def _residual_cabac(self, cd, cat, cbf_inc, C):
        """block_residual_write_cabac inverse. Returns scan-order coeffs."""
        coeffs = np.zeros(C, np.int64)
        if not cd.decision(85 + 4 * cat + cbf_inc):
            return coeffs
        nzpos = []
        found_last = False
        for i in range(C - 1):
            if cd.decision(self._SIG_BASE[cat] + i):
                nzpos.append(i)
                if cd.decision(self._LAST_BASE[cat] + i):
                    found_last = True
                    break
        if not found_last:
            # sigmap covers only C-1 positions: the final scan position
            # is implicitly significant when no last flag fired
            nzpos.append(C - 1)
        node = 0
        base = self._LVL_BASE[cat]
        for pos in reversed(nzpos):
            if cd.decision(base + self._L1_CTX[node]):
                k = 1
                gt1 = base + self._GT1_CTX[node]
                while k < 14 and cd.decision(gt1):
                    k += 1
                absm1 = k if k < 14 else 14 + cd.ue_bypass(0)
                node = self._NODE_TRANS[1][node]
            else:
                absm1 = 0
                node = self._NODE_TRANS[0][node]
            sign = cd.bypass()
            coeffs[pos] = -(absm1 + 1) if sign else (absm1 + 1)
        return coeffs

    def _residual_cabac8(self, cd):
        """Luma 8x8 residual (ctxBlockCat 5): no coded_block_flag, sig
        and last contexts shared via the Table 9-43 maps. Returns 64
        scan-order coefficients."""
        C = 64
        coeffs = np.zeros(C, np.int64)
        nzpos = []
        found_last = False
        for i in range(C - 1):
            if cd.decision(self._SIG_BASE[5] + self._SIG_MAP8[i]):
                nzpos.append(i)
                if cd.decision(self._LAST_BASE[5] + self._LAST_MAP8[i]):
                    found_last = True
                    break
        if not found_last:
            nzpos.append(C - 1)
        node = 0
        base = self._LVL_BASE[5]
        for pos in reversed(nzpos):
            if cd.decision(base + self._L1_CTX[node]):
                k = 1
                gt1 = base + self._GT1_CTX[node]
                while k < 14 and cd.decision(gt1):
                    k += 1
                absm1 = k if k < 14 else 14 + cd.ue_bypass(0)
                node = self._NODE_TRANS[1][node]
            else:
                absm1 = 0
                node = self._NODE_TRANS[0][node]
            sign = cd.bypass()
            coeffs[pos] = -(absm1 + 1) if sign else (absm1 + 1)
        return coeffs

    def _decode_i4_modes_cabac(self, cd, my, mx, i4grid):
        modes = []
        for z in range(16):
            bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
            gy, gx = my * 4 + by, mx * 4 + bx
            ma = int(i4grid[gy, gx - 1]) if gx > 0 else 2
            mb = int(i4grid[gy - 1, gx]) if gy > 0 else 2
            mpm = min(ma, mb)
            if cd.decision(68):
                mode = mpm
            else:
                rem = cd.decision(69) | (cd.decision(69) << 1) \
                    | (cd.decision(69) << 2)
                mode = rem + (rem >= mpm)
            i4grid[gy, gx] = mode
            modes.append(mode)
        return modes

    def _decode_mb_i4_cabac(self, cd, my, mx, qp, qt, Y, U, V,
                            nnz_l, nnz_c, cdcnz, cm_map, i4grid,
                            cbp_l_map, cbp_c_map):
        """I_4x4 macroblock, CABAC (within an I slice)."""
        pps = self.pps
        avail_l, avail_t = mx > 0, my > self._row0
        modes = self._decode_i4_modes_cabac(cd, my, mx, i4grid)

        cctx = 64 \
            + (1 if (avail_l and cm_map[my, mx - 1] != 0) else 0) \
            + (1 if (avail_t and cm_map[my - 1, mx] != 0) else 0)
        if not cd.decision(cctx):
            cm = 0
        elif not cd.decision(67):
            cm = 1
        elif not cd.decision(67):
            cm = 2
        else:
            cm = 3
        cm_map[my, mx] = cm

        def cbp_nbr(m, gy, gx, avail):
            return int(m[gy, gx]) if avail else -1

        cl = cbp_nbr(cbp_l_map, my, mx - 1, avail_l)
        ct = cbp_nbr(cbp_l_map, my - 1, mx, avail_t)
        cbp = 0
        cbp |= cd.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2)) << 0
        cbp |= cd.decision(76 - ((cbp >> 0) & 1) - ((ct >> 2) & 2)) << 1
        cbp |= cd.decision(76 - ((cl >> 3) & 1) - ((cbp << 1) & 2)) << 2
        cbp |= cd.decision(76 - ((cbp >> 2) & 1) - ((cbp >> 0) & 2)) << 3
        ccl = cbp_nbr(cbp_c_map, my, mx - 1, avail_l)
        cct = cbp_nbr(cbp_c_map, my - 1, mx, avail_t)
        c0 = 77 + (1 if (ccl > 0) else 0) + 2 * (1 if (cct > 0) else 0)
        cbp_chroma = 0
        if cd.decision(c0):
            c1 = 77 + 4 + (1 if ccl == 2 else 0) + 2 * (1 if cct == 2 else 0)
            cbp_chroma = 2 if cd.decision(c1) else 1
        cbp_l_map[my, mx] = cbp
        cbp_c_map[my, mx] = cbp_chroma

        if cbp or cbp_chroma:
            qp = self._read_dqp_cabac(cd)
        else:
            qp = self._skip_dqp_cabac()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        def nz_flag(m, gy, gx):
            if gy < self._row0 * 4 or gx < 0:
                return 1            # unavailable -> 1 for intra MBs
            return 1 if m[gy, gx] else 0

        blocks_z = np.zeros((16, 16), np.int64)
        for z in range(16):
            bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
            gy, gx = my * 4 + by, mx * 4 + bx
            if (cbp >> (z // 4)) & 1:
                inc = 2 * nz_flag(nnz_l, gy - 1, gx) \
                    + nz_flag(nnz_l, gy, gx - 1)
                zc = self._residual_cabac(cd, 2, inc, 16)
                nnz_l[gy, gx] = np.count_nonzero(zc)
                blocks_z[z] = zc
            else:
                nnz_l[gy, gx] = 0
        self._recon_i4_luma(my, mx, modes, blocks_z, cbp, qp, qt, Y)

        cdc, cac = self._decode_chroma_res_cabac(
            cd, my, mx, cbp_chroma, nnz_c, cdcnz, 1, self._row0)
        cdc2 = np.stack([c.reshape(2, 2) for c in cdc])
        cac2 = np.zeros((2, 4, 4, 4), np.int64)
        for ch in range(2):
            for i in range(4):
                a = np.zeros(16, np.int64)
                a[np.asarray(ZIG4)[1:]] = cac[ch, i]
                cac2[ch, i] = a.reshape(4, 4)
        self._recon_chroma_intra(my, mx, cm, cbp_chroma, qpc, qt,
                                 cdc2, cac2, U, V, qp)

    def _decode_mb_i8_cabac(self, cd, my, mx, qp, qt, Y, U, V,
                            nnz_l, nnz_c, cdcnz, cm_map, i4grid,
                            cbp_l_map, cbp_c_map):
        """I_8x8 macroblock (I_NxN + transform_size_8x8_flag), CABAC:
        4 pred modes (same 68/69 contexts as 4x4), cat-5 residual,
        spec 8.3.2 filtered-edge prediction."""
        pps = self.pps
        mb_w = self.sps.mb_width
        avail_l, avail_t = mx > 0, my > self._row0

        # prev_intra8x8_pred_mode: neighbor modes from the 4x4-grid
        # cache (replicated for 8x8 MBs — spec 8.3.2.1)
        modes = []
        for z in range(4):
            by8, bx8 = z >> 1, z & 1
            gy, gx = my * 4 + 2 * by8, mx * 4 + 2 * bx8
            ma = int(i4grid[gy, gx - 1]) if gx > 0 else 2
            mb_ = int(i4grid[gy - 1, gx]) if gy > 0 else 2
            mpm = min(ma, mb_)
            if cd.decision(68):
                mode = mpm
            else:
                rem = cd.decision(69) | (cd.decision(69) << 1) \
                    | (cd.decision(69) << 2)
                mode = rem + (rem >= mpm)
            i4grid[gy:gy + 2, gx:gx + 2] = mode
            modes.append(mode)

        cctx = 64 \
            + (1 if (avail_l and cm_map[my, mx - 1] != 0) else 0) \
            + (1 if (avail_t and cm_map[my - 1, mx] != 0) else 0)
        if not cd.decision(cctx):
            cm = 0
        elif not cd.decision(67):
            cm = 1
        elif not cd.decision(67):
            cm = 2
        else:
            cm = 3
        cm_map[my, mx] = cm

        def cbp_nbr(m, gy, gx, avail):
            return int(m[gy, gx]) if avail else -1

        cl = cbp_nbr(cbp_l_map, my, mx - 1, avail_l)
        ct = cbp_nbr(cbp_l_map, my - 1, mx, avail_t)
        cbp = 0
        cbp |= cd.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2)) << 0
        cbp |= cd.decision(76 - ((cbp >> 0) & 1) - ((ct >> 2) & 2)) << 1
        cbp |= cd.decision(76 - ((cl >> 3) & 1) - ((cbp << 1) & 2)) << 2
        cbp |= cd.decision(76 - ((cbp >> 2) & 1) - ((cbp >> 0) & 2)) << 3
        ccl = cbp_nbr(cbp_c_map, my, mx - 1, avail_l)
        cct = cbp_nbr(cbp_c_map, my - 1, mx, avail_t)
        c0 = 77 + (1 if (ccl > 0) else 0) + 2 * (1 if (cct > 0) else 0)
        cbp_chroma = 0
        if cd.decision(c0):
            c1 = 77 + 4 + (1 if ccl == 2 else 0) + 2 * (1 if cct == 2 else 0)
            cbp_chroma = 2 if cd.decision(c1) else 1
        cbp_l_map[my, mx] = cbp
        cbp_c_map[my, mx] = cbp_chroma

        if cbp or cbp_chroma:
            qp = self._read_dqp_cabac(cd)
        else:
            qp = self._skip_dqp_cabac()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        # parse the 4 cat-5 blocks (bitstream order), recon after
        blocks = [None] * 4
        for z in range(4):
            by8, bx8 = z >> 1, z & 1
            cy, cx = my * 4 + 2 * by8, mx * 4 + 2 * bx8
            if (cbp >> z) & 1:
                zc = self._residual_cabac8(cd)
                blocks[z] = zc
                nnz_l[cy:cy + 2, cx:cx + 2] = np.count_nonzero(zc)
            else:
                nnz_l[cy:cy + 2, cx:cx + 2] = 0

        dmf8 = qt.dequant8_mf[enc_tables.CQM_8IY, qp % 6]
        y0, x0 = my * 16, mx * 16
        for z in range(4):
            by8, bx8 = z >> 1, z & 1
            r0, c0 = y0 + 8 * by8, x0 + 8 * bx8
            ht = avail_t if by8 == 0 else True
            hl = avail_l if bx8 == 0 else True
            if z == 0:
                htl = avail_t and avail_l
            elif z == 1:
                htl = avail_t
            elif z == 2:
                htl = avail_l
            else:
                htl = True
            # top-right availability (decoder raster order): block 1
            # reads the top-right MB; block 3's right MB is undecoded
            if z == 0:
                htr = avail_t
            elif z == 1:
                htr = avail_t and (mx + 1 < mb_w)
            elif z == 2:
                htr = True
            else:
                htr = False
            top16 = np.zeros(16, np.int64)
            if ht:
                top16[:8] = Y[r0 - 1, c0:c0 + 8]
                if htr:
                    top16[8:] = Y[r0 - 1, c0 + 8:c0 + 16]
                else:
                    top16[8:] = top16[7]
            left = Y[r0:r0 + 8, c0 - 1] if hl else np.zeros(8, np.int64)
            tl = int(Y[r0 - 1, c0 - 1]) if htl else 0
            lf, tlf, tf = G.predict_8x8_filter(left, tl, top16,
                                               ht, hl, htl)
            pred = G.predict_8x8(modes[z], lf, tlf, tf, ht, hl)
            assert pred is not None, (modes[z], ht, hl)
            if blocks[z] is not None:
                a = np.zeros(64, np.int64)
                a[np.asarray(enc_tables.ZIGZAG8)] = blocks[z]
                r = G.idct8x8(G.dequant(a, dmf8, qp, 6).reshape(8, 8))
            else:
                r = 0
            Y[r0:r0 + 8, c0:c0 + 8] = np.clip(pred + r, 0, 255)

        cdc, cac = self._decode_chroma_res_cabac(
            cd, my, mx, cbp_chroma, nnz_c, cdcnz, 1, self._row0)
        cdc2 = np.stack([c.reshape(2, 2) for c in cdc])
        cac2 = np.zeros((2, 4, 4, 4), np.int64)
        for ch in range(2):
            for i in range(4):
                a = np.zeros(16, np.int64)
                a[np.asarray(ZIG4)[1:]] = cac[ch, i]
                cac2[ch, i] = a.reshape(4, 4)
        self._recon_chroma_intra(my, mx, cm, cbp_chroma, qpc, qt,
                                 cdc2, cac2, U, V, qp)

    def _decode_mb_i16_cabac(self, cd, my, mx, qp, qt, Y, U, V,
                             nnz_l, nnz_c, dcnz, cdcnz, cm_map,
                             i4mb=None, i4grid=None,
                             cbp_l_map=None, cbp_c_map=None,
                             t8_map=None):
        pps = self.pps
        mb_w, mb_h = self.sps.mb_width, self.sps.mb_height
        avail_l, avail_t = mx > 0, my > self._row0

        # mb_type (x264_cabac_mb_type I branch + mb_type_intra suffix)
        ctx = 3 \
            + (1 if (avail_l and not (i4mb is not None
                                      and i4mb[my, mx - 1])) else 0) \
            + (1 if (avail_t and not (i4mb is not None
                                      and i4mb[my - 1, mx])) else 0)
        if cd.decision(ctx) == 0:
            assert i4grid is not None, "I_4x4 in this slice unsupported"
            t8 = False
            if pps.transform_8x8:
                # transform_size_8x8_flag for I_NxN
                # (x264_cabac_mb_transform_size ctx 399 + neighbors)
                tl = bool(t8_map[my, mx - 1]) if (avail_l
                                                  and t8_map is not None) \
                    else 0
                tt = bool(t8_map[my - 1, mx]) if (avail_t
                                                  and t8_map is not None) \
                    else 0
                t8 = bool(cd.decision(399 + int(tl) + int(tt)))
            if t8_map is not None:
                t8_map[my, mx] = t8
            i4mb[my, mx] = True
            dcnz[my, mx] = 0
            if t8:
                self._decode_mb_i8_cabac(cd, my, mx, qp, qt, Y, U, V,
                                         nnz_l, nnz_c, cdcnz, cm_map,
                                         i4grid, cbp_l_map, cbp_c_map)
            else:
                self._decode_mb_i4_cabac(cd, my, mx, qp, qt, Y, U, V,
                                         nnz_l, nnz_c, cdcnz, cm_map,
                                         i4grid, cbp_l_map, cbp_c_map)
            return
        assert cd.terminal() == 0, "I_PCM unsupported"
        cbp_luma = 15 if cd.decision(6) else 0
        cbp_chroma = 0
        if cd.decision(7):
            cbp_chroma = 2 if cd.decision(8) else 1
        pred16 = (cd.decision(9) << 1) | cd.decision(10)
        if cbp_l_map is not None:
            cbp_l_map[my, mx] = cbp_luma
            cbp_c_map[my, mx] = cbp_chroma

        # intra_chroma_pred_mode
        cctx = 64 + (1 if (avail_l and cm_map[my, mx - 1] != 0) else 0) \
            + (1 if (avail_t and cm_map[my - 1, mx] != 0) else 0)
        if not cd.decision(cctx):
            cm = 0
        elif not cd.decision(67):
            cm = 1
        elif not cd.decision(67):
            cm = 2
        else:
            cm = 3
        cm_map[my, mx] = cm

        qp = self._read_dqp_cabac(cd)      # I16 always codes dqp
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        # CBF neighbor increments (x264_cabac_mb_cbf_ctxidxinc)
        def nz_at(m, gy, gx, lim):
            if gy < lim or gx < 0:
                return 1      # unavailable -> 1 in intra slices
            return 1 if m[gy, gx] else 0

        ctx_dc = 2 * nz_at(dcnz, my - 1, mx, self._row0) \
            + nz_at(dcnz, my, mx - 1, self._row0)
        dc_z = self._residual_cabac(cd, 0, ctx_dc, 16)
        dcnz[my, mx] = 1 if np.any(dc_z) else 0

        blocks_z = np.zeros((16, 15), np.int64)
        if cbp_luma:
            for i in range(16):
                bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
                gy, gx = my * 4 + by, mx * 4 + bx
                inc = 2 * nz_at(nnz_l, gy - 1, gx, self._row0 * 4) \
                    + nz_at(nnz_l, gy, gx - 1, self._row0 * 4)
                z = self._residual_cabac(cd, 1, inc, 15)
                nnz_l[gy, gx] = np.count_nonzero(z)
                blocks_z[i] = z
        else:
            nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0

        cdc = np.zeros((2, 4), np.int64)
        cac = np.zeros((2, 4, 15), np.int64)
        if cbp_chroma:
            for ch in range(2):
                inc = 2 * nz_at(cdcnz[ch], my - 1, mx, self._row0) \
                    + nz_at(cdcnz[ch], my, mx - 1, self._row0)
                cdc[ch] = self._residual_cabac(cd, 3, inc, 4)
                cdcnz[ch, my, mx] = 1 if np.any(cdc[ch]) else 0
        else:
            cdcnz[:, my, mx] = 0
        if cbp_chroma == 2:
            for ch in range(2):
                for i in range(4):
                    bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                        int(enc_tables.CHROMA_BLOCK_XY[i][1])
                    gy, gx = my * 2 + by, mx * 2 + bx
                    inc = 2 * nz_at(nnz_c[ch], gy - 1, gx,
                                    self._row0 * 2) \
                        + nz_at(nnz_c[ch], gy, gx - 1, self._row0 * 2)
                    z = self._residual_cabac(cd, 4, inc, 15)
                    nnz_c[ch, gy, gx] = np.count_nonzero(z)
                    cac[ch, i] = z
        else:
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0

        self._recon_i16(my, mx, pred16, cm, qp, qpc, qt,
                        cbp_luma, cbp_chroma, dc_z, blocks_z, cdc, cac,
                        Y, U, V)

    def _recon_i16(self, my, mx, pred16, chroma_pred, qp, qpc, qt,
                   cbp_luma, cbp_chroma, dc_z, blocks_z, cdc_scan, cac_scan,
                   Y, U, V):
        """Shared I16x16 reconstruction from parsed syntax (the recon
        half of _decode_mb_i, used by the CABAC path)."""
        has_top, has_left = my > self._row0, mx > 0
        y0, x0 = my * 16, mx * 16
        top = Y[y0 - 1, x0:x0 + 16] if has_top else np.zeros(16, np.int64)
        left = Y[y0:y0 + 16, x0 - 1] if has_left else np.zeros(16, np.int64)
        topleft = int(Y[y0 - 1, x0 - 1]) if (has_top and has_left) else 0
        pred = G.predict_16x16(pred16, top, left, topleft, has_top, has_left)
        assert pred is not None

        byp = self._bypass(qp)
        dc = np.zeros(16, dtype=np.int64)
        dc[np.asarray(ZIG4)] = dc_z
        dc = dc.reshape(4, 4)
        dmf = qt.dequant4_mf[enc_tables.CQM_4IY, qp % 6]
        dc_rec = dc if byp else G.dequant_4x4_dc(
            G.hadamard4x4_inv(dc), int(dmf[0]), qp)
        mb = pred.copy()
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            if cbp_luma:
                ac = np.zeros(16, dtype=np.int64)
                ac[np.asarray(ZIG4)[1:]] = blocks_z[i]
                if byp:
                    r = ac.reshape(4, 4).copy()
                    r[0, 0] = dc_rec[by, bx]
                else:
                    b = G.dequant(ac, dmf, qp, 4).reshape(4, 4)
                    b[0, 0] = dc_rec[by, bx]
                    r = G.idct4x4(b)
            elif byp:
                r = np.zeros((4, 4), dtype=np.int64)
                r[0, 0] = dc_rec[by, bx]
            else:
                r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                            dtype=np.int64)
            blk = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
            mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(blk, 0, 255)
        Y[y0:y0 + 16, x0:x0 + 16] = mb

        c0y, c0x = my * 8, mx * 8
        cdmf = qt.dequant4_mf[enc_tables.CQM_4IC, qpc % 6]
        for ch, P in ((0, U), (1, V)):
            ctop = P[c0y - 1, c0x:c0x + 8] if has_top \
                else np.zeros(8, np.int64)
            cleft = P[c0y:c0y + 8, c0x - 1] if has_left \
                else np.zeros(8, np.int64)
            ctl = int(P[c0y - 1, c0x - 1]) if (has_top and has_left) else 0
            cpred = G.predict_8x8c(chroma_pred, ctop, cleft, ctl,
                                   has_top, has_left)
            assert cpred is not None
            dc_rec = (cdc_scan[ch].reshape(2, 2) if byp
                      else G.dequant_2x2_dc(
                          G.hadamard2x2(cdc_scan[ch].reshape(2, 2)),
                          int(cdmf[0]), qpc))
            cmb = cpred.copy()
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac_scan[ch, i]):
                    a = np.zeros(16, dtype=np.int64)
                    a[np.asarray(ZIG4)[1:]] = cac_scan[ch, i]
                    if byp:
                        r = a.reshape(4, 4).copy()
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(a, cdmf, qpc, 4).reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and byp:
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[c0y:c0y + 8, c0x:c0x + 8] = cmb

    # ------------------------------------------------------------ I4x4
    _ZOF = None   # raster -> z-scan index (lazy init)

    def _i4_tr_avail(self, z, my, mx):
        """Top-right sample availability for 4x4 block z (decoding-order
        rule, spec 8.3.1.2.1)."""
        if Decoder._ZOF is None:
            zof = np.zeros(16, np.int64)
            zof[np.asarray(enc_tables.LUMA4x4_RASTER_OF_Z)] = np.arange(16)
            Decoder._ZOF = zof
        bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
        if by == 0:
            if my <= self._row0:
                return False
            if bx < 3:
                return True
            return mx < self.sps.mb_width - 1
        if bx == 3:
            return False
        return int(Decoder._ZOF[(by - 1) * 4 + (bx + 1)]) < z

    def _i4_neighbors(self, Y, my, mx, z):
        bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
        gy, gx = my * 16 + by * 4, mx * 16 + bx * 4
        ht = (my > self._row0) or (by > 0)
        hl = (mx > 0) or (bx > 0)
        t = Y[gy - 1, gx:gx + 4] if ht else np.zeros(4, np.int64)
        l = Y[gy:gy + 4, gx - 1] if hl else np.zeros(4, np.int64)
        lt = int(Y[gy - 1, gx - 1]) if (ht and hl) else 0
        if self._i4_tr_avail(z, my, mx):
            tr = Y[gy - 1, gx + 4:gx + 8]
        else:
            tr = np.full(4, t[3], np.int64)
        return l, lt, t, tr, ht, hl

    def _recon_i4_luma(self, my, mx, modes, blocks_z, cbp_luma, qp, qt, Y):
        """Sequential I4x4 luma reconstruction (z-scan; each block's
        prediction reads the already-reconstructed plane)."""
        dmf = qt.dequant4_mf[enc_tables.CQM_4IY, qp % 6]
        byp = self._bypass(qp)
        for z in range(16):
            bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
            gy, gx = my * 16 + by * 4, mx * 16 + bx * 4
            l, lt, t, tr, ht, hl = self._i4_neighbors(Y, my, mx, z)
            pred = G.predict_4x4(modes[z], l, lt, t, tr, ht, hl)
            assert pred is not None, \
                f"illegal i4 mode {modes[z]} at mb ({my},{mx}) z{z}"
            if (cbp_luma >> (z // 4)) & 1:
                blk = np.zeros(16, np.int64)
                blk[np.asarray(ZIG4)] = blocks_z[z]
                if byp:
                    r = blk.reshape(4, 4)
                else:
                    r = G.idct4x4(G.dequant(blk, dmf, qp, 4)
                                  .reshape(4, 4))
            else:
                r = 0
            Y[gy:gy + 4, gx:gx + 4] = np.clip(pred + r, 0, 255)

    def _decode_i4_modes_cavlc(self, br, my, mx, i4grid):
        modes = []
        for z in range(16):
            bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
            gy, gx = my * 4 + by, mx * 4 + bx
            ma = int(i4grid[gy, gx - 1]) if gx > 0 else 2
            mb = int(i4grid[gy - 1, gx]) if gy > 0 else 2
            mpm = min(ma, mb)
            if br.bit():
                mode = mpm
            else:
                rem = br.u(3)
                mode = rem + (rem >= mpm)
            i4grid[gy, gx] = mode
            modes.append(mode)
        return modes

    def _decode_chroma_cavlc(self, br, my, mx, cbp_chroma, qpc, qt,
                             U, V, nnz_c, intra=True):
        """Chroma residual parse + recon (shared by I16/I4x4 CAVLC)."""
        cdc = np.zeros((2, 2, 2), dtype=np.int64)
        cac = np.zeros((2, 4, 4, 4), dtype=np.int64)
        if cbp_chroma:
            for ch in range(2):
                z = decode_residual(br, -1, 4)
                cdc[ch] = z.reshape(2, 2)
            if cbp_chroma & 2:
                for ch in range(2):
                    for i in range(4):
                        bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                            int(enc_tables.CHROMA_BLOCK_XY[i][1])
                        nc = self._nc(nnz_c[ch], my * 2 + by, mx * 2 + bx)
                        ac_z = decode_residual(br, nc, 15)
                        nnz_c[ch, my * 2 + by, mx * 2 + bx] = \
                            np.count_nonzero(ac_z)
                        a = np.zeros(16, dtype=np.int64)
                        a[np.asarray(ZIG4)[1:]] = ac_z
                        cac[ch, i] = a.reshape(4, 4)
        if not (cbp_chroma & 2):
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        return cdc, cac

    def _recon_chroma_intra(self, my, mx, chroma_pred, cbp_chroma, qpc, qt,
                            cdc, cac, U, V, qp=None):
        if qp is None:
            qp = qpc        # bypass gate rides the luma QP
        has_top, has_left = my > self._row0, mx > 0
        c0y, c0x = my * 8, mx * 8
        cdmf = qt.dequant4_mf[enc_tables.CQM_4IC, qpc % 6]
        for ch, P in ((0, U), (1, V)):
            ctop = P[c0y - 1, c0x:c0x + 8] if has_top \
                else np.zeros(8, np.int64)
            cleft = P[c0y:c0y + 8, c0x - 1] if has_left \
                else np.zeros(8, np.int64)
            ctl = int(P[c0y - 1, c0x - 1]) if (has_top and has_left) else 0
            cpred = G.predict_8x8c(chroma_pred, ctop, cleft, ctl,
                                   has_top, has_left)
            assert cpred is not None
            dc_rec = (cdc[ch] if self._bypass(qp)
                      else G.dequant_2x2_dc(G.hadamard2x2(cdc[ch]),
                                            int(cdmf[0]), qpc))
            cmb = cpred.copy()
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    if self._bypass(qp):
                        r = cac[ch, i].copy()
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(cac[ch, i].ravel(), cdmf, qpc, 4) \
                            .reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[c0y:c0y + 8, c0x:c0x + 8] = cmb

    def _decode_mb_i4_cavlc(self, br, my, mx, qp, qt, Y, U, V,
                            nnz_l, nnz_c, i4grid):
        """I_4x4 macroblock, CAVLC (mb_type == 0)."""
        pps = self.pps
        if pps.transform_8x8:
            assert br.bit() == 0, "8x8 transform unsupported"
        modes = self._decode_i4_modes_cavlc(br, my, mx, i4grid)
        chroma_pred = br.ue()
        cbp = int(_GOLOMB_TO_CBP_INTRA[br.ue()])
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = qp + br.se()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        blocks_z = np.zeros((16, 16), np.int64)
        for z in range(16):
            bx, by = int(BLOCK_XY[z][0]), int(BLOCK_XY[z][1])
            gy, gx = my * 4 + by, mx * 4 + bx
            if (cbp_luma >> (z // 4)) & 1:
                nc = self._nc(nnz_l, gy, gx)
                zc = decode_residual(br, nc, 16)
                nnz_l[gy, gx] = np.count_nonzero(zc)
                blocks_z[z] = zc
            else:
                nnz_l[gy, gx] = 0
        self._recon_i4_luma(my, mx, modes, blocks_z, cbp_luma, qp, qt, Y)

        cdc, cac = self._decode_chroma_cavlc(br, my, mx, cbp_chroma, qpc,
                                             qt, U, V, nnz_c)
        self._recon_chroma_intra(my, mx, chroma_pred, cbp_chroma, qpc, qt,
                                 cdc, cac, U, V, qp)
        return qp

    # ----------------------------------------------------- MV prediction
    def _nbr(self, ref_f, mv_f, by, bx):
        """Fetch (ref, mv) at 4x4-block coords (the scan8 cache slot)."""
        bh, bw = ref_f.shape
        if by < 0 or bx < 0 or by >= bh or bx >= bw:
            return -2, np.zeros(2, np.int64)
        return int(ref_f[by, bx]), mv_f[by, bx]

    @staticmethod
    def _mvp_rule(ra, mva, rb, mvb, rc, mvc, i_ref=0):
        """The common count/median tail of x264_mb_predict_mv*."""
        cnt = (ra == i_ref) + (rb == i_ref) + (rc == i_ref)
        if cnt > 1:
            return np.array([_median3(mva[0], mvb[0], mvc[0]),
                             _median3(mva[1], mvb[1], mvc[1])], np.int64)
        if cnt == 1:
            return (mva if ra == i_ref
                    else (mvb if rb == i_ref else mvc)).copy()
        if rb == -2 and rc == -2 and ra != -2:
            return mva.copy()
        return np.array([_median3(mva[0], mvb[0], mvc[0]),
                         _median3(mva[1], mvb[1], mvc[1])], np.int64)

    def _mvp_16x16(self, ref_f, mv_f, my, mx, i_ref=0):
        """Spec 8.4.1.3 median prediction for a 16x16 partition
        (x264_mb_predict_mv_16x16, common/macroblock.c:96)."""
        r, c = my * 4, mx * 4
        ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
        rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
        rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 4)
        if rc == -2:
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
        return self._mvp_rule(ra, mva, rb, mvb, rc, mvc, i_ref)

    def _mvp_part(self, ref_f, mv_f, my, mx, ptype, part, i_ref=0):
        """x264_mb_predict_mv for D_16x8 / D_8x16 partitions
        (common/macroblock.c:28-94: directional early-outs, then the
        median rule; C falls back to D when its cache slot is
        unavailable/unwritten)."""
        r, c = my * 4, mx * 4
        if ptype == 1 and part == 0:       # 16x8 top
            ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
            rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 4)
            if rc == -2:
                rc, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
            if rb == i_ref:
                return mvb.copy()
        elif ptype == 1:                   # 16x8 bottom
            ra, mva = self._nbr(ref_f, mv_f, r + 2, c - 1)
            rb, mvb = self._nbr(ref_f, mv_f, r + 1, c)
            # the C cache slot is never written in raster order -> D
            rc, mvc = self._nbr(ref_f, mv_f, r + 1, c - 1)
            if ra == i_ref:
                return mva.copy()
        elif part == 0:                    # 8x16 left
            ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
            rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 2)
            if rc == -2:
                rc, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
            if ra == i_ref:
                return mva.copy()
        else:                              # 8x16 right
            ra, mva = self._nbr(ref_f, mv_f, r, c + 1)
            rb, mvb = self._nbr(ref_f, mv_f, r - 1, c + 2)
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 4)
            if rc == -2:
                rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 1)
            if rc == i_ref:
                return mvc.copy()
        return self._mvp_rule(ra, mva, rb, mvb, rc, mvc, i_ref)

    SUB_OFF = ((0, 0), (0, 2), (2, 0), (2, 2))

    def _mvp_sub8(self, ref_f, mv_f, my, mx, k, i_ref=0):
        """x264_mb_predict_mv for a width-2 P8x8 sub-block (pure median
        rule, no directional early-outs); sub 3's C cache slot is never
        written in raster order -> D (common/macroblock.c:28-94)."""
        oy, ox = self.SUB_OFF[k]
        r, c = my * 4 + oy, mx * 4 + ox
        ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
        rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
        if k == 3:
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
        else:
            rc, mvc = self._nbr(ref_f, mv_f, r - 1, c + 2)
            if rc == -2:
                rc, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
        return self._mvp_rule(ra, mva, rb, mvb, rc, mvc, i_ref)

    def _inter_pred_p8(self, my, mx, sub_mvs, ref_idx=0):
        """P_8x8 prediction: four 8x8 luma / 4x4 chroma quadrant MCs."""
        refY, refU, refV = self._l0(ref_idx)
        py = np.zeros((16, 16), np.int64)
        pu = np.zeros((8, 8), np.int64)
        pv = np.zeros((8, 8), np.int64)
        for k, (oy, ox) in enumerate(self.SUB_OFF):
            mvx, mvy = int(sub_mvs[k][0]), int(sub_mvs[k][1])
            y0, x0 = oy * 4, ox * 4
            py[y0:y0 + 8, x0:x0 + 8] = golden_mc.mc_luma(
                refY, my * 16 + y0, mx * 16 + x0, mvx, mvy, 8, 8)
            pu[y0 // 2:y0 // 2 + 4, x0 // 2:x0 // 2 + 4] = \
                golden_mc.mc_chroma(refU, my * 8 + y0 // 2,
                                    mx * 8 + x0 // 2, mvx, mvy, 4, 4)
            pv[y0 // 2:y0 // 2 + 4, x0 // 2:x0 // 2 + 4] = \
                golden_mc.mc_chroma(refV, my * 8 + y0 // 2,
                                    mx * 8 + x0 // 2, mvx, mvy, 4, 4)
        return py, pu, pv

    def _mv_pskip(self, ref_f, mv_f, my, mx):
        """x264_mb_predict_mv_pskip (common/macroblock.c:133)."""
        r, c = my * 4, mx * 4
        ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
        rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
        if ra == -2 or rb == -2 \
                or (ra == 0 and mva[0] == 0 and mva[1] == 0) \
                or (rb == 0 and mvb[0] == 0 and mvb[1] == 0):
            return np.zeros(2, np.int64)
        return self._mvp_16x16(ref_f, mv_f, my, mx)

    # ----------------------------------------------------- P macroblocks
    def _l0(self, ref_idx):
        """L0 reference planes by ref_idx. Index 0 is self.ref — which
        the B bipred path temporarily rebinds per list — so only
        ref_idx > 0 (P slices) consults the per-slice list0."""
        if ref_idx == 0:
            return self.ref
        return self.list0[ref_idx]

    def _inter_pred_mb(self, my, mx, ptype, mv0, mv1, ref_idx=0):
        """Whole-MB prediction for P_L0 16x16 / 16x8 / 8x16."""
        if ptype == 0:
            return self._inter_pred(my, mx, mv0, ref_idx)
        refY, refU, refV = self._l0(ref_idx)
        py = np.zeros((16, 16), np.int64)
        pu = np.zeros((8, 8), np.int64)
        pv = np.zeros((8, 8), np.int64)
        if ptype == 1:        # 16x8 top/bottom
            py[:8] = golden_mc.mc_luma(refY, my * 16, mx * 16,
                                       int(mv0[0]), int(mv0[1]), 8, 16)
            py[8:] = golden_mc.mc_luma(refY, my * 16 + 8, mx * 16,
                                       int(mv1[0]), int(mv1[1]), 8, 16)
            pu[:4] = golden_mc.mc_chroma(refU, my * 8, mx * 8,
                                         int(mv0[0]), int(mv0[1]), 4, 8)
            pu[4:] = golden_mc.mc_chroma(refU, my * 8 + 4, mx * 8,
                                         int(mv1[0]), int(mv1[1]), 4, 8)
            pv[:4] = golden_mc.mc_chroma(refV, my * 8, mx * 8,
                                         int(mv0[0]), int(mv0[1]), 4, 8)
            pv[4:] = golden_mc.mc_chroma(refV, my * 8 + 4, mx * 8,
                                         int(mv1[0]), int(mv1[1]), 4, 8)
        else:                 # 8x16 left/right
            py[:, :8] = golden_mc.mc_luma(refY, my * 16, mx * 16,
                                          int(mv0[0]), int(mv0[1]), 16, 8)
            py[:, 8:] = golden_mc.mc_luma(refY, my * 16, mx * 16 + 8,
                                          int(mv1[0]), int(mv1[1]), 16, 8)
            pu[:, :4] = golden_mc.mc_chroma(refU, my * 8, mx * 8,
                                            int(mv0[0]), int(mv0[1]), 8, 4)
            pu[:, 4:] = golden_mc.mc_chroma(refU, my * 8, mx * 8 + 4,
                                            int(mv1[0]), int(mv1[1]), 8, 4)
            pv[:, :4] = golden_mc.mc_chroma(refV, my * 8, mx * 8,
                                            int(mv0[0]), int(mv0[1]), 8, 4)
            pv[:, 4:] = golden_mc.mc_chroma(refV, my * 8, mx * 8 + 4,
                                            int(mv1[0]), int(mv1[1]), 8, 4)
        return py, pu, pv

    def _set_part_field(self, mv_f, ref_f, my, mx, ptype, mv0, mv1,
                        ref_idx=0):
        """Write the per-4x4 mv/ref cache for a decoded inter MB."""
        r, c = my * 4, mx * 4
        ref_f[r:r + 4, c:c + 4] = ref_idx
        if ptype == 0:
            mv_f[r:r + 4, c:c + 4] = mv0
        elif ptype == 1:
            mv_f[r:r + 2, c:c + 4] = mv0
            mv_f[r + 2:r + 4, c:c + 4] = mv1
        else:
            mv_f[r:r + 4, c:c + 2] = mv0
            mv_f[r:r + 4, c + 2:c + 4] = mv1

    def _inter_pred(self, my, mx, mv, ref_idx=0):
        refY, refU, refV = self._l0(ref_idx)
        py = golden_mc.mc_luma(refY, my * 16, mx * 16,
                               int(mv[0]), int(mv[1]), 16, 16)
        pu = golden_mc.mc_chroma(refU, my * 8, mx * 8,
                                 int(mv[0]), int(mv[1]), 8, 8)
        pv = golden_mc.mc_chroma(refV, my * 8, mx * 8,
                                 int(mv[0]), int(mv[1]), 8, 8)
        return py, pu, pv

    def _decode_mb_pskip(self, my, mx, Y, U, V, mv_f, ref_f):
        mv = self._mv_pskip(ref_f, mv_f, my, mx)
        py, pu, pv = self._inter_pred(my, mx, mv)
        Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = py
        U[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pu
        V[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pv
        self._set_part_field(mv_f, ref_f, my, mx, 0, mv, mv)

    def _decode_mb_p(self, br, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c,
                     mv_f, ref_f, intra_mb):
        pps = self.pps
        mb_type = br.ue()
        if mb_type >= 5:
            # intra MB in a P slice (mb_type offset 5)
            ref_f[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
            intra_mb[my, mx] = True
            return self._decode_mb_i(br, my, mx, qp, qt, Y, U, V,
                                     nnz_l, nnz_c, mb_type - 5)
        assert mb_type in (0, 1, 2, 3), \
            f"sub-partitions unsupported, got {mb_type}"
        ptype = mb_type
        if ptype == 3:
            # P_8x8: sub_mb_type x4, then all refs, then all mvds
            # (7.3.5.2); only P_L0_8x8 subs are produced here
            for _ in range(4):
                assert br.ue() == 0, "only P_L0_8x8 subs supported"
        # ref_idx te(v) per partition when >1 active ref (7.3.5.1: all
        # ref_idx precede all mvd); with 2 refs te is one bit !ref
        ref_idx = 0
        if self._nref0 > 1:
            ref_idx = 1 - br.bit()
            for _ in range(3 if ptype == 3 else (1 if ptype else 0)):
                ref1 = 1 - br.bit()
                assert ref1 == ref_idx, \
                    "partitions with distinct refs unsupported"
        sub_mvs = None
        if ptype == 3:
            r0, c0 = my * 4, mx * 4
            sub_mvs = []
            for k, (oy, ox) in enumerate(self.SUB_OFF):
                mvdk = np.array([br.se(), br.se()], np.int64)
                mvk = self._mvp_sub8(ref_f, mv_f, my, mx, k,
                                     ref_idx) + mvdk
                mv_f[r0 + oy:r0 + oy + 2, c0 + ox:c0 + ox + 2] = mvk
                ref_f[r0 + oy:r0 + oy + 2, c0 + ox:c0 + ox + 2] = \
                    ref_idx
                sub_mvs.append(mvk)
            mv0, mv1 = sub_mvs[0], sub_mvs[1]
        else:
            mvd0 = np.array([br.se(), br.se()], np.int64)
            if ptype:
                mvd1 = np.array([br.se(), br.se()], np.int64)
        if ptype == 3:
            pass
        elif ptype == 0:
            mv0 = self._mvp_16x16(ref_f, mv_f, my, mx, ref_idx) + mvd0
            mv1 = mv0
            self._set_part_field(mv_f, ref_f, my, mx, 0, mv0, mv0,
                                 ref_idx)
        else:
            mv0 = self._mvp_part(ref_f, mv_f, my, mx, ptype, 0,
                                 ref_idx) + mvd0
            # part 0 must land in the cache before part 1 predicts
            self._set_part_field(mv_f, ref_f, my, mx, ptype, mv0, mv0,
                                 ref_idx)
            mv1 = self._mvp_part(ref_f, mv_f, my, mx, ptype, 1,
                                 ref_idx) + mvd1
            self._set_part_field(mv_f, ref_f, my, mx, ptype, mv0, mv1,
                                 ref_idx)

        cbp = int(_GOLOMB_TO_CBP_INTER[br.ue()])
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = qp + br.se()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        if ptype == 3:
            py, pu, pv = self._inter_pred_p8(my, mx, sub_mvs, ref_idx)
        else:
            py, pu, pv = self._inter_pred_mb(my, mx, ptype, mv0, mv1,
                                             ref_idx)

        # luma residual: full 4x4 blocks per coded 8x8 group
        dmf = qt.dequant4_mf[enc_tables.CQM_4PY, qp % 6]
        mb = py.astype(np.int64)
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            if (cbp_luma >> (i // 4)) & 1:
                nc = self._nc(nnz_l, my * 4 + by, mx * 4 + bx)
                z = decode_residual(br, nc, 16)
                nnz_l[my * 4 + by, mx * 4 + bx] = np.count_nonzero(z)
                blk = np.zeros(16, dtype=np.int64)
                blk[np.asarray(ZIG4)] = z
                if self._bypass(qp):
                    r = blk.reshape(4, 4)
                else:
                    r = G.idct4x4(G.dequant(blk, dmf, qp, 4)
                                  .reshape(4, 4))
                b = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = b
            else:
                nnz_l[my * 4 + by, mx * 4 + bx] = 0
        Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.clip(mb, 0, 255)

        # chroma residual (DC 2x2 + AC per cbp_chroma), P matrices
        cdmf = qt.dequant4_mf[enc_tables.CQM_4PC, qpc % 6]
        cdc = np.zeros((2, 2, 2), dtype=np.int64)
        cac = np.zeros((2, 4, 4, 4), dtype=np.int64)
        if cbp_chroma:
            for ch in range(2):
                z = decode_residual(br, -1, 4)
                cdc[ch] = z.reshape(2, 2)
            if cbp_chroma & 2:
                for ch in range(2):
                    for i in range(4):
                        bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                            int(enc_tables.CHROMA_BLOCK_XY[i][1])
                        nc = self._nc(nnz_c[ch], my * 2 + by, mx * 2 + bx)
                        z = decode_residual(br, nc, 15)
                        nnz_c[ch, my * 2 + by, mx * 2 + bx] = \
                            np.count_nonzero(z)
                        a = np.zeros(16, dtype=np.int64)
                        a[np.asarray(ZIG4)[1:]] = z
                        cac[ch, i] = a.reshape(4, 4)
        if not (cbp_chroma & 2):
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0

        for ch, (P, pred) in ((0, (U, pu)), (1, (V, pv))):
            dc_rec = (cdc[ch] if self._bypass(qp)
                      else G.dequant_2x2_dc(G.hadamard2x2(cdc[ch]),
                                            int(cdmf[0]), qpc))
            cmb = pred.astype(np.int64)
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    if self._bypass(qp):
                        r = cac[ch, i].copy()
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(cac[ch, i].ravel(), cdmf, qpc, 4) \
                            .reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cmb
        return qp



    def _decode_b_slice_cabac(self, br, rbsp, qp, qt, Y, U, V,
                              nnz_l, nnz_c, qp_mb, intra_mb,
                              mv_f0, ref_f0, mv_f1, ref_f1,
                              first_mb=0):
        """CABAC B slice decode (B_L0/L1/BI_16x16 + I16x16); band
        slices (first_mb > 0) end at the end_of_slice terminal."""
        from x264_tpu.entropy.cabac import CabacDecoder
        from x264_tpu.entropy import cabac_tables as ctab

        mb_w, mb_h = self.sps.mb_width, self.sps.mb_height
        while br.pos % 8:
            assert br.bit() == 1, "bad cabac alignment"
        cd = CabacDecoder(rbsp[br.pos // 8:],
                          ctab.init_states(False, qp,
                                           self._cabac_init_idc).copy())

        dcnz = np.zeros((mb_h, mb_w), np.int64)
        cdcnz = np.zeros((2, mb_h, mb_w), np.int64)
        cm_map = np.zeros((mb_h, mb_w), np.int64)
        mvd_map0 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        mvd_map1 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        cbp_l_map = np.zeros((mb_h, mb_w), np.int64)
        cbp_c_map = np.zeros((mb_h, mb_w), np.int64)
        skip_map = np.zeros((mb_h, mb_w), bool)
        nds_map = np.zeros((mb_h, mb_w), bool)    # skip-or-direct

        row0 = first_mb // mb_w
        mb_i = first_mb
        while True:
                my, mx = divmod(mb_i, mb_w)
                inc = 24 \
                    + (1 if (mx > 0 and not skip_map[my, mx - 1])
                       else 0) \
                    + (1 if (my > row0 and not skip_map[my - 1, mx])
                       else 0)
                if cd.decision(inc):              # B_SKIP
                    skip_map[my, mx] = True
                    nds_map[my, mx] = True
                    use0, use1, mv0q, mv1q = self._decode_direct_fields(
                        my, mx, mv_f0, ref_f0, mv_f1, ref_f1)
                    py, pu, pv = self._direct_pred(my, mx, use0, mv0q,
                                                   use1, mv1q)
                    Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = py
                    U[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pu
                    V[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pv
                    nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                    dcnz[my, mx] = 0
                    cbp_l_map[my, mx] = 0
                    cbp_c_map[my, mx] = 0
                else:
                    self._decode_mb_b_cabac(
                        cd, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c,
                        mv_f0, ref_f0, mv_f1, ref_f1, intra_mb, dcnz,
                        cdcnz, cm_map, mvd_map0, mvd_map1, cbp_l_map,
                        cbp_c_map, nds_map)
                qp_mb[my, mx] = qp
                mb_i += 1
                eos = cd.terminal()
                if eos:
                    assert mb_i % mb_w == 0, \
                        f"B slice ended mid-row at mb {mb_i}"
                    return mb_i
                assert mb_i < mb_h * mb_w, "missing end_of_slice"

    def _decode_mb_b_cabac(self, cd, my, mx, qp, qt, Y, U, V, nnz_l,
                           nnz_c, mv_f0, ref_f0, mv_f1, ref_f1, intra_mb,
                           dcnz, cdcnz, cm_map, mvd_map0, mvd_map1,
                           cbp_l_map, cbp_c_map, nds_map=None):
        pps = self.pps
        row0 = self._row0
        avail_l, avail_t = mx > 0, my > row0
        r0b, c0b = my * 4, mx * 4

        def nz_flag(m, gy, gx, unavail, scale=4):
            # maps are MB-grid (scale 1) or 4x4-grid (scale 4)
            if gy < row0 * scale or gx < 0:
                return unavail
            return 1 if m[gy, gx] else 0

        # ---- mb_type (x264_cabac_mb_type B table): bin0 ctx counts
        # available neighbors that are not B_SKIP/B_DIRECT
        def nds(yy, xx):
            return bool(nds_map[yy, xx]) if nds_map is not None else False

        ctx = 27 + (1 if (avail_l and not nds(my, mx - 1)) else 0) \
            + (1 if (avail_t and not nds(my - 1, mx)) else 0)
        is_direct = cd.decision(ctx) == 0
        is_intra = False
        if is_direct:
            if nds_map is not None:
                nds_map[my, mx] = True
            bmode = -2
        else:
            b1 = cd.decision(30)
            if not b1:
                bmode = 1 if cd.decision(32) else 0     # L0 / L1
            else:
                b2 = cd.decision(31)
                if not b2:
                    bits = [cd.decision(32) for _ in range(3)]
                    assert bits == [0, 0, 0], \
                        f"B type bins {bits} unsupported"
                    bmode = 2                            # BI 16x16
                else:
                    bits = [cd.decision(32) for _ in range(3)]
                    assert bits == [1, 0, 1], \
                        f"B type bins {bits} unsupported"
                    is_intra = True

        if is_intra:
            # ---- I16x16 suffix at ctx 32..35
            assert cd.decision(32) == 1, "I_4x4 in B unsupported"
            assert cd.terminal() == 0, "I_PCM unsupported"
            cbp_luma = 15 if cd.decision(33) else 0
            cbp_chroma = 0
            if cd.decision(34):
                cbp_chroma = 2 if cd.decision(34) else 1
            pred16 = (cd.decision(35) << 1) | cd.decision(35)
            cctx = 64 \
                + (1 if (avail_l and cm_map[my, mx - 1] != 0) else 0) \
                + (1 if (avail_t and cm_map[my - 1, mx] != 0) else 0)
            if not cd.decision(cctx):
                cm = 0
            elif not cd.decision(67):
                cm = 1
            elif not cd.decision(67):
                cm = 2
            else:
                cm = 3
            cm_map[my, mx] = cm
            assert cd.decision(60) == 0, "nonzero dqp unsupported (CQP)"
            qpc = _chroma_qp(qp, pps.chroma_qp_offset)

            ctx_dc = 2 * nz_flag(dcnz, my - 1, mx, 1, 1) \
                + nz_flag(dcnz, my, mx - 1, 1, 1)
            dc_z = self._residual_cabac(cd, 0, ctx_dc, 16)
            dcnz[my, mx] = 1 if np.any(dc_z) else 0

            blocks_z = np.zeros((16, 15), np.int64)
            if cbp_luma:
                for i in range(16):
                    bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
                    gy, gx = my * 4 + by, mx * 4 + bx
                    inc = 2 * nz_flag(nnz_l, gy - 1, gx, 1) \
                        + nz_flag(nnz_l, gy, gx - 1, 1)
                    z = self._residual_cabac(cd, 1, inc, 15)
                    nnz_l[gy, gx] = np.count_nonzero(z)
                    blocks_z[i] = z
            else:
                nnz_l[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0

            cdc, cac = self._decode_chroma_res_cabac(
                cd, my, mx, cbp_chroma, nnz_c, cdcnz, 1, row0)
            ref_f0[r0b:r0b + 4, c0b:c0b + 4] = -1
            ref_f1[r0b:r0b + 4, c0b:c0b + 4] = -1
            intra_mb[my, mx] = True
            cbp_l_map[my, mx] = cbp_luma
            cbp_c_map[my, mx] = cbp_chroma
            self._recon_i16(my, mx, pred16, cm, qp, qpc, qt,
                            cbp_luma, cbp_chroma, dc_z, blocks_z, cdc, cac,
                            Y, U, V)
            return

        direct_pred = None
        if is_direct:
            use0, use1, mv0q, mv1q = self._decode_direct_fields(
                my, mx, mv_f0, ref_f0, mv_f1, ref_f1)
            mvd_map0[r0b:r0b + 4, c0b:c0b + 4] = 0
            mvd_map1[r0b:r0b + 4, c0b:c0b + 4] = 0
            direct_pred = self._direct_pred(my, mx, use0, mv0q,
                                            use1, mv1q)
        else:
            use0 = bmode in (0, 2)
            use1 = bmode in (1, 2)

            def read_mvd(mvd_map):
                out = np.zeros(2, np.int64)
                for comp, base in ((0, 40), (1, 47)):
                    a = abs(int(mvd_map[r0b, c0b - 1, comp])) \
                        if c0b - 1 >= 0 else 0
                    b = abs(int(mvd_map[r0b - 1, c0b, comp])) \
                        if r0b - 1 >= row0 * 4 else 0
                    am = a + b
                    inc = (1 if am > 2 else 0) + (1 if am > 32 else 0)
                    out[comp] = self._decode_mvd_cabac(cd, base, inc)
                return out

            mv0 = mv1 = None
            if use0:
                mvd0 = read_mvd(mvd_map0)
                mvd_map0[r0b:r0b + 4, c0b:c0b + 4] = mvd0
                mv0 = self._mvp_16x16(ref_f0, mv_f0, my, mx) + mvd0
            if use1:
                mvd1 = read_mvd(mvd_map1)
                mvd_map1[r0b:r0b + 4, c0b:c0b + 4] = mvd1
                mv1 = self._mvp_16x16(ref_f1, mv_f1, my, mx) + mvd1
            self._b_set_fields(mv_f0, ref_f0, mv_f1, ref_f1, my, mx,
                               use0, mv0, use1, mv1)

        def cbp_nbr(m, gy, gx):
            if gy < row0 or gx < 0:
                return -1
            return int(m[gy, gx])

        cl = cbp_nbr(cbp_l_map, my, mx - 1) if avail_l else -1
        ct = cbp_nbr(cbp_l_map, my - 1, mx) if avail_t else -1
        cbp = 0
        cbp |= cd.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2)) << 0
        cbp |= cd.decision(76 - ((cbp >> 0) & 1) - ((ct >> 2) & 2)) << 1
        cbp |= cd.decision(76 - ((cl >> 3) & 1) - ((cbp << 1) & 2)) << 2
        cbp |= cd.decision(76 - ((cbp >> 2) & 1) - ((cbp >> 0) & 2)) << 3
        ccl = cbp_nbr(cbp_c_map, my, mx - 1) if avail_l else -1
        cct = cbp_nbr(cbp_c_map, my - 1, mx) if avail_t else -1
        c0 = 77 + (1 if (ccl > 0) else 0) + 2 * (1 if (cct > 0) else 0)
        cbp_chroma = 0
        if cd.decision(c0):
            c1 = 77 + 4 + (1 if ccl == 2 else 0) + 2 * (1 if cct == 2 else 0)
            cbp_chroma = 2 if cd.decision(c1) else 1
        cbp_l_map[my, mx] = cbp
        cbp_c_map[my, mx] = cbp_chroma
        dcnz[my, mx] = 0

        if self.pps.transform_8x8 and cbp:
            assert cd.decision(399) == 0, "8x8 in B slices unsupported"
        if cbp or cbp_chroma:
            assert cd.decision(60) == 0, "nonzero dqp unsupported (CQP)"
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        py, pu, pv = (direct_pred if direct_pred is not None
                      else self._bipred(my, mx, use0, mv0, use1, mv1))
        dmf = qt.dequant4_mf[enc_tables.CQM_4PY, qp % 6]
        mb = py.astype(np.int64)
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            gy, gx = my * 4 + by, mx * 4 + bx
            if (cbp >> (i // 4)) & 1:
                inc = 2 * nz_flag(nnz_l, gy - 1, gx, 0) \
                    + nz_flag(nnz_l, gy, gx - 1, 0)
                z = self._residual_cabac(cd, 2, inc, 16)
                nnz_l[gy, gx] = np.count_nonzero(z)
                blk = np.zeros(16, dtype=np.int64)
                blk[np.asarray(ZIG4)] = z
                if self._bypass(qp):
                    rres = blk.reshape(4, 4)
                else:
                    rres = G.idct4x4(G.dequant(blk, dmf, qp, 4)
                                     .reshape(4, 4))
                b = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + rres
                mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = b
            else:
                nnz_l[gy, gx] = 0
        Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.clip(mb, 0, 255)

        cdc, cac = self._decode_chroma_res_cabac(
            cd, my, mx, cbp_chroma, nnz_c, cdcnz, 0, row0)
        cdmf = qt.dequant4_mf[enc_tables.CQM_4PC, qpc % 6]
        for ch, (P, pred) in ((0, (U, pu)), (1, (V, pv))):
            dc_rec = (cdc[ch].reshape(2, 2) if self._bypass(qp)
                      else G.dequant_2x2_dc(
                          G.hadamard2x2(cdc[ch].reshape(2, 2)),
                          int(cdmf[0]), qpc))
            cmb = pred.astype(np.int64)
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    a = np.zeros(16, dtype=np.int64)
                    a[np.asarray(ZIG4)[1:]] = cac[ch, i]
                    if self._bypass(qp):
                        rres = a.reshape(4, 4)
                        rres[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(a, cdmf, qpc, 4).reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        rres = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    rres = np.zeros((4, 4), dtype=np.int64)
                    rres[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    rres = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                   dtype=np.int64)
                else:
                    rres = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + rres
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cmb

    # ----------------------------------------------------- B macroblocks
    def _spatial_direct(self, my, mx, mv_f0, ref_f0, mv_f1, ref_f1):
        """Spatial direct derivation (spec 8.4.1.2.2 with
        direct_8x8_inference; x264_mb_predict_mv_direct16x16_spatial).
        Returns (ref0, ref1, mv0q, mv1q): refs per list (-1 = unused)
        and per-8x8-quadrant MVs, shape (2, 2, 2)."""
        big = 1 << 20

        def list_ref_mv(ref_f, mv_f):
            r, c = my * 4, mx * 4
            ra, mva = self._nbr(ref_f, mv_f, r, c - 1)
            rb, mvb = self._nbr(ref_f, mv_f, r - 1, c)
            rc_, mvc = self._nbr(ref_f, mv_f, r - 1, c + 4)
            if rc_ == -2:
                rc_, mvc = self._nbr(ref_f, mv_f, r - 1, c - 1)
            ref = min(x if x >= 0 else big for x in (ra, rb, rc_))
            if ref >= big:
                return -1, np.zeros(2, np.int64)
            mv = self._mvp_rule(ra, mva, rb, mvb, rc_, mvc, ref)
            return ref, mv

        ref0, mv0 = list_ref_mv(ref_f0, mv_f0)
        ref1, mv1 = list_ref_mv(ref_f1, mv_f1)
        mv0q = np.broadcast_to(mv0, (2, 2, 2)).copy()
        mv1q = np.broadcast_to(mv1, (2, 2, 2)).copy()
        if ref0 < 0 and ref1 < 0:    # bi zero-MV, before the col loop
            return 0, 0, np.zeros((2, 2, 2), np.int64), \
                np.zeros((2, 2, 2), np.int64)
        col_ref, col_mv = self._col
        for dy, dx in ((0, 0), (0, 3), (3, 0), (3, 3)):
            rr, cc = my * 4 + dy, mx * 4 + dx
            if col_ref[rr, cc] == 0 \
                    and abs(int(col_mv[rr, cc, 0])) <= 1 \
                    and abs(int(col_mv[rr, cc, 1])) <= 1:
                qy, qx = dy // 2, dx // 2
                if ref0 == 0:
                    mv0q[qy, qx] = 0
                if ref1 == 0:
                    mv1q[qy, qx] = 0
        return ref0, ref1, mv0q, mv1q

    def _direct_pred(self, my, mx, use0, mv0q, use1, mv1q):
        """Per-8x8-quadrant prediction for B_SKIP/B_Direct_16x16."""
        py = np.zeros((16, 16), np.int64)
        pu = np.zeros((8, 8), np.int64)
        pv = np.zeros((8, 8), np.int64)
        for qy in range(2):
            for qx in range(2):
                ly, lx = my * 16 + qy * 8, mx * 16 + qx * 8
                cy, cx = my * 8 + qy * 4, mx * 8 + qx * 4
                parts = []
                for use, mvq, ref in ((use0, mv0q, self._ref_l0),
                                      (use1, mv1q, self._ref_l1)):
                    if not use:
                        continue
                    mvx, mvy = int(mvq[qy, qx, 0]), int(mvq[qy, qx, 1])
                    parts.append((
                        golden_mc.mc_luma(ref[0], ly, lx, mvx, mvy, 8, 8),
                        golden_mc.mc_chroma(ref[1], cy, cx, mvx, mvy,
                                            4, 4),
                        golden_mc.mc_chroma(ref[2], cy, cx, mvx, mvy,
                                            4, 4)))
                if len(parts) == 2:
                    blk = tuple(
                        (a.astype(np.int64) + b.astype(np.int64) + 1) >> 1
                        for a, b in zip(parts[0], parts[1]))
                else:
                    blk = parts[0]
                py[qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8] = blk[0]
                pu[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = blk[1]
                pv[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = blk[2]
        return py, pu, pv

    def _decode_direct_fields(self, my, mx, mv_f0, ref_f0, mv_f1, ref_f1):
        """Derive direct config and write the per-4x4 caches (mvd 0)."""
        ref0, ref1, mv0q, mv1q = self._spatial_direct(
            my, mx, mv_f0, ref_f0, mv_f1, ref_f1)
        use0, use1 = ref0 >= 0, ref1 >= 0
        r, c = my * 4, mx * 4
        ref_f0[r:r + 4, c:c + 4] = ref0 if use0 else -1
        ref_f1[r:r + 4, c:c + 4] = ref1 if use1 else -1
        for qy in range(2):
            for qx in range(2):
                sl = (slice(r + qy * 2, r + qy * 2 + 2),
                      slice(c + qx * 2, c + qx * 2 + 2))
                mv_f0[sl] = mv0q[qy, qx] if use0 else 0
                mv_f1[sl] = mv1q[qy, qx] if use1 else 0
        return use0, use1, mv0q, mv1q

    def _bipred(self, my, mx, use0, mv0, use1, mv1):
        """Prediction for B_L0/L1/BI 16x16 (pixel_avg bipred, weight 32)."""
        saved = self.ref
        try:
            if use0:
                self.ref = self._ref_l0
                p0 = self._inter_pred(my, mx, mv0)
            if use1:
                self.ref = self._ref_l1
                p1 = self._inter_pred(my, mx, mv1)
        finally:
            self.ref = saved
        if use0 and use1:
            return tuple((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1
                         for a, b in zip(p0, p1))
        return p0 if use0 else p1

    def _b_set_fields(self, mv_f0, ref_f0, mv_f1, ref_f1, my, mx,
                      use0, mv0, use1, mv1):
        r, c = my * 4, mx * 4
        if use0:
            ref_f0[r:r + 4, c:c + 4] = 0
            mv_f0[r:r + 4, c:c + 4] = mv0
        else:
            ref_f0[r:r + 4, c:c + 4] = -1
            mv_f0[r:r + 4, c:c + 4] = 0
        if use1:
            ref_f1[r:r + 4, c:c + 4] = 0
            mv_f1[r:r + 4, c:c + 4] = mv1
        else:
            ref_f1[r:r + 4, c:c + 4] = -1
            mv_f1[r:r + 4, c:c + 4] = 0

    def _inter_residual_cavlc(self, br, my, mx, qp, qt, Y, U, V,
                              nnz_l, nnz_c, py, pu, pv):
        """Inter CBP + residual + reconstruction, CAVLC (shared by the
        P 16x16 tail and B MBs)."""
        pps = self.pps
        cbp = int(_GOLOMB_TO_CBP_INTER[br.ue()])
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = qp + br.se()
        qpc = _chroma_qp(qp, pps.chroma_qp_offset)

        dmf = qt.dequant4_mf[enc_tables.CQM_4PY, qp % 6]
        mb = py.astype(np.int64)
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            if (cbp_luma >> (i // 4)) & 1:
                nc = self._nc(nnz_l, my * 4 + by, mx * 4 + bx)
                z = decode_residual(br, nc, 16)
                nnz_l[my * 4 + by, mx * 4 + bx] = np.count_nonzero(z)
                blk = np.zeros(16, dtype=np.int64)
                blk[np.asarray(ZIG4)] = z
                if self._bypass(qp):
                    r = blk.reshape(4, 4)
                else:
                    r = G.idct4x4(G.dequant(blk, dmf, qp, 4)
                                  .reshape(4, 4))
                b = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = b
            else:
                nnz_l[my * 4 + by, mx * 4 + bx] = 0
        Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.clip(mb, 0, 255)

        cdmf = qt.dequant4_mf[enc_tables.CQM_4PC, qpc % 6]
        cdc = np.zeros((2, 2, 2), dtype=np.int64)
        cac = np.zeros((2, 4, 4, 4), dtype=np.int64)
        if cbp_chroma:
            for ch in range(2):
                z = decode_residual(br, -1, 4)
                cdc[ch] = z.reshape(2, 2)
            if cbp_chroma & 2:
                for ch in range(2):
                    for i in range(4):
                        bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                            int(enc_tables.CHROMA_BLOCK_XY[i][1])
                        nc = self._nc(nnz_c[ch], my * 2 + by, mx * 2 + bx)
                        z = decode_residual(br, nc, 15)
                        nnz_c[ch, my * 2 + by, mx * 2 + bx] = \
                            np.count_nonzero(z)
                        a = np.zeros(16, dtype=np.int64)
                        a[np.asarray(ZIG4)[1:]] = z
                        cac[ch, i] = a.reshape(4, 4)
        if not (cbp_chroma & 2):
            nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0

        for ch, (P, pred) in ((0, (U, pu)), (1, (V, pv))):
            dc_rec = (cdc[ch] if self._bypass(qp)
                      else G.dequant_2x2_dc(G.hadamard2x2(cdc[ch]),
                                            int(cdmf[0]), qpc))
            cmb = pred.astype(np.int64)
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    if self._bypass(qp):
                        r = cac[ch, i].copy()
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(cac[ch, i].ravel(), cdmf, qpc, 4) \
                            .reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
                elif cbp_chroma:
                    r = np.full((4, 4), (int(dc_rec[by, bx]) + 32) >> 6,
                                dtype=np.int64)
                else:
                    r = np.zeros((4, 4), dtype=np.int64)
                blk = cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r
                cmb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    np.clip(blk, 0, 255)
            P[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cmb
        return qp

    def _decode_mb_b(self, br, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c,
                     mv_f0, ref_f0, mv_f1, ref_f1, intra_mb):
        """B macroblock, CAVLC: B_L0/L1/BI_16x16 (+ intra offset 23)."""
        mb_type = br.ue()
        r, c = my * 4, mx * 4
        if mb_type >= 23:
            ref_f0[r:r + 4, c:c + 4] = -1
            ref_f1[r:r + 4, c:c + 4] = -1
            intra_mb[my, mx] = True
            return self._decode_mb_i(br, my, mx, qp, qt, Y, U, V,
                                     nnz_l, nnz_c, mb_type - 23)
        if mb_type == 0:               # B_Direct_16x16
            use0, use1, mv0q, mv1q = self._decode_direct_fields(
                my, mx, mv_f0, ref_f0, mv_f1, ref_f1)
            py, pu, pv = self._direct_pred(my, mx, use0, mv0q,
                                           use1, mv1q)
            return self._inter_residual_cavlc(br, my, mx, qp, qt,
                                              Y, U, V, nnz_l, nnz_c,
                                              py, pu, pv)
        assert mb_type in (1, 2, 3), f"B mb_type {mb_type} unsupported"
        use0 = mb_type in (1, 3)
        use1 = mb_type in (2, 3)
        mv0 = mv1 = None
        if use0:
            mvd = np.array([br.se(), br.se()], np.int64)
            mv0 = self._mvp_16x16(ref_f0, mv_f0, my, mx) + mvd
        if use1:
            mvd = np.array([br.se(), br.se()], np.int64)
            mv1 = self._mvp_16x16(ref_f1, mv_f1, my, mx) + mvd
        self._b_set_fields(mv_f0, ref_f0, mv_f1, ref_f1, my, mx,
                           use0, mv0, use1, mv1)
        py, pu, pv = self._bipred(my, mx, use0, mv0, use1, mv1)
        return self._inter_residual_cavlc(br, my, mx, qp, qt, Y, U, V,
                                          nnz_l, nnz_c, py, pu, pv)

    # ------------------------------------------------------------ macroblock
    def _bypass(self, qp):
        """Lossless transform bypass (sps qpprime flag && QP'Y == 0,
        spec 8.5.15; x264 encoder/macroblock.c:415-474)."""
        return bool(self.sps.qpprime_y_zero_transform_bypass) and qp == 0

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

    def _decode_mb_i(self, br, my, mx, qp, qt, Y, U, V, nnz_l, nnz_c,
                     mb_type=None, i4grid=None):
        sps, pps = self.sps, self.pps
        if mb_type is None:
            mb_type = br.ue()
        if mb_type == 0:
            if i4grid is None:
                raise NotImplementedError("I_4x4 in this slice context")
            return self._decode_mb_i4_cavlc(br, my, mx, qp, qt, Y, U, V,
                                            nnz_l, nnz_c, i4grid)
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

        has_top = my > self._row0
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
        byp = self._bypass(qp)
        dc_rec = dc if byp else G.dequant_4x4_dc(
            G.hadamard4x4_inv(dc), int(dmf[0]), qp)
        mb = pred.copy()
        for i in range(16):
            bx, by = int(BLOCK_XY[i][0]), int(BLOCK_XY[i][1])
            if cbp_luma and byp:
                r = blocks[i].copy()
                r[0, 0] = dc_rec[by, bx]
            elif cbp_luma:
                b = G.dequant(blocks[i].ravel(), dmf, qp, 4).reshape(4, 4)
                b[0, 0] = dc_rec[by, bx]
                r = G.idct4x4(b)
            elif byp:
                r = np.zeros((4, 4), dtype=np.int64)
                r[0, 0] = dc_rec[by, bx]
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
            dc_rec = (cdc[ch] if self._bypass(qp)
                      else G.dequant_2x2_dc(G.hadamard2x2(cdc[ch]),
                                            int(cdmf[0]), qpc))
            cmb = cpred.copy()
            for i in range(4):
                bx, by = int(enc_tables.CHROMA_BLOCK_XY[i][0]), \
                    int(enc_tables.CHROMA_BLOCK_XY[i][1])
                if cbp_chroma & 2 and np.any(cac[ch, i]):
                    if self._bypass(qp):
                        r = cac[ch, i].copy()
                        r[0, 0] = dc_rec[by, bx]
                    else:
                        b = G.dequant(cac[ch, i].ravel(), cdmf, qpc, 4) \
                            .reshape(4, 4)
                        b[0, 0] = dc_rec[by, bx]
                        r = G.idct4x4(b)
                elif cbp_chroma and self._bypass(qp):
                    r = np.zeros((4, 4), dtype=np.int64)
                    r[0, 0] = dc_rec[by, bx]
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
