"""Fused per-frame device pipelines.

One jitted program per frame type: mode decision + transform/quant +
reconstruction (wavefront), CAVLC code-plane generation, device bit
packing, and the in-loop deblocking filter all run on device; only the
packed bitstream words and the final reconstruction cross to the host.
This is the TPU re-expression of the x264_slice_write hot loop
(encoder/encoder.c:1141) + x264_fdec_filter_row (encoder/encoder.c:983).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..entropy import device as edev
from ..ops import deblock as odeblock
from . import aq as eaq
from . import intra
from . import inter

I32 = jnp.int32

# bitstream capacity per MB, in bits (device pack buffer; host falls back
# to the host packer if a frame ever exceeds it — x264 instead reallocs,
# x264_bitstream_check_buffer, encoder/encoder.c:301)
CAP_BITS_PER_MB = 4800


def host32_pack(first, oy, ou, ov, ry, ru, rv, crop_w, crop_h,
                with_metrics: bool):
    """Pack everything the host needs per frame into ONE small int32
    vector: [first..., ssd_y, ssd_u, ssd_v, ssim] with the float values
    bitcast to int32 (host views them back as float32). On tunneled
    devices each d2h costs ~25-60 ms of latency regardless of size, so
    per-frame scalars must cross in a single transfer
    (x264 keeps these in x264_t.stat, encoder/encoder.c:1034-1056)."""
    first = [jnp.asarray(x).astype(I32).reshape(()) for x in first]
    if not with_metrics:
        return jnp.stack([*first, *([jnp.int32(0)] * 4)])
    from ..ops import pixel as opix

    def ssd(a, b, ww, hh):
        d = a[:hh, :ww].astype(I32) - b[:hh, :ww].astype(I32)
        d2 = (d * d).ravel()
        pad = (-d2.shape[0]) % 256
        d2 = jnp.pad(d2, (0, pad))
        return d2.reshape(-1, 256).sum(axis=-1).astype(jnp.float32).sum()

    vals = [ssd(oy, ry, crop_w, crop_h),
            ssd(ou, ru, crop_w // 2, crop_h // 2),
            ssd(ov, rv, crop_w // 2, crop_h // 2),
            opix.ssim_sum(oy[2:crop_h, 2:crop_w],
                          ry[2:crop_h, 2:crop_w]).astype(jnp.float32)]
    bits = [jax.lax.bitcast_convert_type(v, I32) for v in vals]
    return jnp.stack([*first, *bits])


def _encode_i16_aq(mb_h, mb_w, y, u, v, qtab, lam, qp, i4x4,
                   lossless, aq, aq_qp_min, aq_qp_max,
                   chroma_qp_offset, i8x8: bool = False):
    """Run the intra wavefront with optional per-MB AQ tables; returns
    (out dict incl. dqp syntax maps, per-MB effective QP map)."""
    qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
    if not aq:
        out = intra.encode_i16_frame(mb_h, mb_w, y, u, v, qtab, lam,
                                     i4x4, lossless, i8x8)
        return out, qp_mb
    qp_map, qpc_map = _aq_maps(y, u, v, mb_h, mb_w, qp, qtab,
                               aq_qp_min, aq_qp_max, chroma_qp_offset)
    rows = eaq.qtab_rows(qtab["full"], qp_map, qpc_map, intra_cqm=True)
    out = intra.encode_i16_frame(mb_h, mb_w, y, u, v, {**qtab, **rows},
                                 lam, i4x4, lossless, i8x8)
    cnz = (jnp.any(out["chroma_ac"][..., 1:] != 0, axis=(-3, -2, -1))
           | jnp.any(out["chroma_dc"] != 0, axis=(-2, -1)))
    i4_mb = out.get("i4_mb")
    if i4_mb is None:
        i4_mb = jnp.zeros((mb_h, mb_w), bool)
        cbp_l = jnp.any(out["luma_ac"][..., 1:] != 0,
                        axis=(-2, -1)).astype(I32) * 15
    else:
        cbp_l = out["cbp_luma_bits"]
    has_dqp = (~i4_mb) | (cbp_l > 0) | cnz
    dqp, qp_eff, pnz = eaq.dqp_syntax(qp_map, has_dqp, qp)
    out["dqp"], out["dqp_prev_nz"] = dqp, pnz
    return out, qp_eff


def _plane(a, h: int, w: int):
    """Accept a flat uint8 plane (the cheap h2d layout) or a 2-D array."""
    a = jnp.asarray(a)
    if a.ndim == 1:
        a = a.reshape(h, w)
    return a.astype(I32)


def _aq_maps(y, u, v, mb_h, mb_w, qp, qtab, qp_min, qp_max,
             chroma_qp_offset):
    yt = y.reshape(mb_h, 16, mb_w, 16).swapaxes(1, 2)
    ut = u.reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    vt = v.reshape(mb_h, 8, mb_w, 8).swapaxes(1, 2)
    return eaq.qp_map_from_planes(yt, ut, vt, qp, qtab["aq_strength"],
                                  qp_min, qp_max, chroma_qp_offset)


def _apply_row_rc(qp_map, qpc_map, row_qp_off, mb_h, mb_w, qp, qp_min,
                  qp_max, chroma_qp_offset):
    """Fold the per-row VBV QP profile (x264_ratecontrol_mb analogue —
    planned pre-encode, see RateControl.row_qp_offsets) into the per-MB
    QP map; activates the AQ dqp machinery when AQ itself is off."""
    from .. import tables as _tab
    if row_qp_off is None:
        return qp_map, qpc_map
    base = (qp_map if qp_map is not None
            else jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32))
    qp_map = jnp.clip(base + row_qp_off.astype(I32)[:, None],
                      qp_min, qp_max)
    cqp = jnp.asarray(_tab.CHROMA_QP_TABLE)
    qpc_map = cqp[jnp.clip(qp_map + chroma_qp_offset, 0, 51)]
    return qp_map, qpc_map


def capacity_words(nmb: int) -> int:
    return (nmb * CAP_BITS_PER_MB + edev.HDR_SLOTS * 32 + 4096) // 32


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("crop_w", "crop_h", "with_metrics",
                                    "aq", "aq_qp_min", "aq_qp_max"))
def encode_i16_idr(mb_h: int, mb_w: int, deblock_on: bool, i4x4: bool,
                   lossless: bool,
                   y, u, v, qtab, lam, qp, qp_c,
                   hdr_vals, hdr_lens,
                   alpha_off, beta_off, chroma_qp_offset,
                   crop_w: int = 0, crop_h: int = 0,
                   with_metrics: bool = False, aq: bool = False,
                   aq_qp_min: int = 10, aq_qp_max: int = 51):
    """All-I16x16 IDR frame: encode + entropy + pack + deblock, fused.

    y/u/v may be uint8 (the cheap host->device format on this platform;
    cast happens on device). Returns dict with recon_{y,u,v} (deblocked
    if deblock_on; int32, kept device-resident by the caller as DPB
    state), packed bitstream `words` (uint32, big-endian bit order) and
    `nbits` (including the rbsp stop bit).
    """
    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    out, qp_mb = _encode_i16_aq(mb_h, mb_w, y, u, v, qtab, lam, qp,
                                i4x4, lossless, aq, aq_qp_min,
                                aq_qp_max, chroma_qp_offset)

    vals, lens = edev.i16_code_planes(out, mb_h, mb_w)
    stop_v = jnp.ones((1,), I32)         # rbsp_trailing stop bit
    stop_l = jnp.ones((1,), I32)
    all_v = jnp.concatenate([hdr_vals.astype(I32), vals, stop_v])
    all_l = jnp.concatenate([hdr_lens.astype(I32), lens, stop_l])
    words, nbits = edev.pack_codes(all_v, all_l,
                                   capacity_words(mb_h * mb_w))

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        intra_mb = jnp.ones((mb_h, mb_w), bool)
        z4 = jnp.zeros((mb_h * 4, mb_w * 4), I32)
        zmv = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, intra_mb,
            z4, z4, zmv, z4, zmv, False,
            alpha_off, beta_off, chroma_qp_offset)

    h32 = host32_pack([nbits, mb_h * mb_w, 0], y, u, v, ry, ru, rv,
                      crop_w or mb_w * 16, crop_h or mb_h * 16,
                      with_metrics)
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                words=words, nbits=nbits, host32=h32,
                mode16=out["mode16"], modec=out["modec"])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7),
                   static_argnames=("crop_w", "crop_h", "with_metrics",
                                    "aq", "aq_qp_min", "aq_qp_max",
                                    "decimate", "rd", "p8x8",
                                    "chroma_me"))
def encode_p(mb_h: int, mb_w: int, me_range: int, deblock_on: bool,
             subpel_steps, parts, lossless, n_refs,
             y, u, v, ref_y, ref_u, ref_v, qtab, lam, qp, qp_c,
             hdr_vals, hdr_lens, alpha_off, beta_off, chroma_qp_offset,
             mvp_seed, ref2_y=None, ref2_u=None, ref2_v=None,
             crop_w: int = 0, crop_h: int = 0,
             with_metrics: bool = False, aq: bool = False,
             aq_qp_min: int = 10, aq_qp_max: int = 51,
             decimate: bool = False, rd: bool = False,
             p8x8: bool = False, row_qp_off=None,
             nr_offset4=None, nr_offset8=None,
             chroma_me: bool = False):
    """P frame: ME + inter/intra decision + entropy + pack + deblock,
    fused. ref_* is the deblocked reconstruction of the reference frame
    (int32, MB-aligned); with n_refs=2, ref2_* is L0[1] (the older
    reference). mvp_seed: (mb_h, mb_w, 2) qpel MV predictors
    (previous frame's MV field). Returns recon planes, packed words,
    nbits, and the MV/intra maps (the caller feeds `mv` back as the next
    frame's seed)."""
    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    ref_y, ref_u, ref_v = (p.astype(jnp.int32)
                           for p in (ref_y, ref_u, ref_v))
    if aq:
        qp_map, qpc_map = _aq_maps(y, u, v, mb_h, mb_w, qp, qtab,
                                   aq_qp_min, aq_qp_max,
                                   chroma_qp_offset)
    else:
        qp_map = qpc_map = None
    qp_map, qpc_map = _apply_row_rc(qp_map, qpc_map, row_qp_off, mb_h,
                                    mb_w, qp, aq_qp_min, aq_qp_max,
                                    chroma_qp_offset)
    if nr_offset4 is not None:
        # noise reduction (x264_denoise_dct): adaptive offsets ride the
        # qtab; the residual passes stash the |coef| sums back
        qtab = dict(qtab)
        qtab["nr_offset4"] = nr_offset4
        if nr_offset8 is not None:
            qtab["nr_offset8"] = nr_offset8
    out = inter.encode_p_body(mb_h, mb_w, me_range, y, u, v,
                              ref_y, ref_u, ref_v, qtab, lam, mvp_seed,
                              subpel_steps, parts=parts,
                              lossless=lossless,
                              ref2_y=ref2_y, ref2_u=ref2_u,
                              ref2_v=ref2_v, n_refs=n_refs,
                              qp_map=qp_map, qpc_map=qpc_map,
                              decimate=decimate, rd=rd, p8x8=p8x8,
                              chroma_me=chroma_me)
    qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
    if qp_map is not None:
        has_dqp = (~out["skip"]) & (out["intra_mb"]
                                    | (out["cbp_luma_bits"] > 0)
                                    | (out["cbp_chroma"] > 0))
        dqp, qp_eff, pnz = eaq.dqp_syntax(qp_map, has_dqp, qp)
        out["dqp"], out["dqp_prev_nz"] = dqp, pnz
        qp_mb = qp_eff

    vals, lens = edev.p_code_planes(out, mb_h, mb_w, n_refs)
    stop = jnp.ones((1,), I32)
    all_v = jnp.concatenate([hdr_vals.astype(I32), vals, stop])
    all_l = jnp.concatenate([hdr_lens.astype(I32), lens, stop])
    words, nbits = edev.pack_codes(all_v, all_l,
                                   capacity_words(mb_h * mb_w))

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        zmv = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)
        z4 = jnp.zeros((mb_h * 4, mb_w * 4), I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, out["intra_mb"],
            out["nnz4"], out["ref4"], out["mv4"], z4, zmv, False,
            alpha_off, beta_off, chroma_qp_offset)

    h32 = host32_pack(
        [nbits, out["intra_mb"].sum(), out["skip"].sum()],
        y, u, v, ry, ru, rv, crop_w or mb_w * 16, crop_h or mb_h * 16,
        with_metrics)
    ret = dict(recon_y=ry, recon_u=ru, recon_v=rv,
               words=words, nbits=nbits, host32=h32,
               mv=out["mv"], intra_mb=out["intra_mb"],
               skip=out["skip"], mv4=out["mv4"], ref4=out["ref4"])
    for k in ("nr_sum4", "nr_sum8"):
        if k in out:
            ret[k] = out[k]
    return ret


# op-stream capacity per MB for the CABAC path: the slot layout is
# bounded (header + 27 residual blocks at 2 + n_coeff compact ops each
# — the engine expands sig maps and level binarizations), so this
# covers the worst case; the host still checks n_ops
CABAC_OPS_PER_MB = 560


def cabac_capacity(nmb: int) -> int:
    return nmb * CABAC_OPS_PER_MB + 4096


def cabac_capacity_hw(nmb: int) -> int:
    """Halfword capacity of the packed transfer stream: worst case is
    3 halfwords per op (see cabac_planes.hw_pack); even so the packed
    words buffer stays 1.5x the op-count buffer."""
    return 3 * cabac_capacity(nmb)


def _hw_ops(ops, nmb: int):
    """compact + halfword-pack an op plane for transfer; returns
    (packed words, n_hw)."""
    from ..entropy import cabac_planes
    cops, n_ops = cabac_planes.compact_ops(ops, cabac_capacity(nmb))
    return cabac_planes.hw_pack(cops, n_ops, cabac_capacity_hw(nmb))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("crop_w", "crop_h", "with_metrics",
                                    "t8", "aq", "aq_qp_min",
                                    "aq_qp_max", "i8x8"))
def encode_i16_idr_cabac(mb_h: int, mb_w: int, deblock_on: bool,
                         i4x4: bool, lossless: bool,
                         y, u, v, qtab, lam, qp, qp_c,
                         alpha_off, beta_off, chroma_qp_offset,
                         crop_w: int = 0, crop_h: int = 0,
                         with_metrics: bool = False, t8: bool = False,
                         aq: bool = False, aq_qp_min: int = 10,
                         aq_qp_max: int = 51, i8x8: bool = False):
    """All-I16x16 IDR frame, CABAC entropy: the wavefront encode runs as
    in encode_i16_idr, but emits a compacted packed bin-op stream for
    the host-native arithmetic coder instead of packed CAVLC words.
    i8x8 adds the I8x8 ladder (slope-2 wavefront, High profile)."""
    from ..entropy import cabac_planes

    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    out, qp_mb = _encode_i16_aq(mb_h, mb_w, y, u, v, qtab, lam, qp,
                                i4x4, lossless, aq, aq_qp_min,
                                aq_qp_max, chroma_qp_offset, i8x8)

    ops = cabac_planes.i16_slice_ops(out, mb_h, mb_w, t8_mode=t8)
    cops, n_ops = _hw_ops(ops, mb_h * mb_w)

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        intra_mb = jnp.ones((mb_h, mb_w), bool)
        z4 = jnp.zeros((mb_h * 4, mb_w * 4), I32)
        zmv = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, intra_mb,
            z4, z4, zmv, z4, zmv, False,
            alpha_off, beta_off, chroma_qp_offset,
            t8_mb=out.get("t8_mb") if i8x8 else None)

    h32 = host32_pack([n_ops, mb_h * mb_w, 0], y, u, v, ry, ru, rv,
                      crop_w or mb_w * 16, crop_h or mb_h * 16,
                      with_metrics)
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                ops=cops, n_ops=n_ops, host32=h32,
                mode16=out["mode16"], modec=out["modec"])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7),
                   static_argnames=("crop_w", "crop_h", "with_metrics",
                                    "t8", "aq", "aq_qp_min", "aq_qp_max",
                                    "decimate", "rd", "p8x8",
                                    "chroma_me"))
def encode_p_cabac(mb_h: int, mb_w: int, me_range: int, deblock_on: bool,
                   subpel_steps, parts, lossless, n_refs,
                   y, u, v, ref_y, ref_u, ref_v, qtab, lam, qp, qp_c,
                   alpha_off, beta_off, chroma_qp_offset, mvp_seed,
                   ref2_y=None, ref2_u=None, ref2_v=None,
                   crop_w: int = 0, crop_h: int = 0,
                   with_metrics: bool = False, t8: bool = False,
                   aq: bool = False, aq_qp_min: int = 10,
                   aq_qp_max: int = 51, decimate: bool = False,
                   rd: bool = False, p8x8: bool = False,
                   row_qp_off=None, nr_offset4=None, nr_offset8=None,
                   chroma_me: bool = False):
    """P frame with CABAC entropy: same encode as encode_p, emitting the
    packed bin-op stream for the host arithmetic coder. n_refs=2 takes
    ref2_* as L0[1]."""
    from ..entropy import cabac_planes

    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    ref_y, ref_u, ref_v = (p.astype(jnp.int32)
                           for p in (ref_y, ref_u, ref_v))
    if aq:
        qp_map, qpc_map = _aq_maps(y, u, v, mb_h, mb_w, qp, qtab,
                                   aq_qp_min, aq_qp_max,
                                   chroma_qp_offset)
    else:
        qp_map = qpc_map = None
    qp_map, qpc_map = _apply_row_rc(qp_map, qpc_map, row_qp_off, mb_h,
                                    mb_w, qp, aq_qp_min, aq_qp_max,
                                    chroma_qp_offset)
    if nr_offset4 is not None:
        # noise reduction (x264_denoise_dct): adaptive offsets ride the
        # qtab; the residual passes stash the |coef| sums back
        qtab = dict(qtab)
        qtab["nr_offset4"] = nr_offset4
        if nr_offset8 is not None:
            qtab["nr_offset8"] = nr_offset8
    out = inter.encode_p_body(mb_h, mb_w, me_range, y, u, v,
                              ref_y, ref_u, ref_v, qtab, lam, mvp_seed,
                              subpel_steps, parts=parts,
                              lossless=lossless,
                              ref2_y=ref2_y, ref2_u=ref2_u,
                              ref2_v=ref2_v, n_refs=n_refs, t8=t8,
                              qp_map=qp_map, qpc_map=qpc_map,
                              decimate=decimate, rd=rd, p8x8=p8x8,
                              chroma_me=chroma_me)
    qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
    if qp_map is not None:
        has_dqp = (~out["skip"]) & (out["intra_mb"]
                                    | (out["cbp_luma_bits"] > 0)
                                    | (out["cbp_chroma"] > 0))
        dqp, qp_eff, pnz = eaq.dqp_syntax(qp_map, has_dqp, qp)
        out["dqp"], out["dqp_prev_nz"] = dqp, pnz
        qp_mb = qp_eff

    ops = cabac_planes.p_slice_ops(out, mb_h, mb_w, n_refs, t8_mode=t8)
    cops, n_ops = _hw_ops(ops, mb_h * mb_w)

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        zmv = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)
        z4 = jnp.zeros((mb_h * 4, mb_w * 4), I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, out["intra_mb"],
            out["nnz4"], out["ref4"], out["mv4"], z4, zmv, False,
            alpha_off, beta_off, chroma_qp_offset,
            t8_mb=out.get("t8_mb") if t8 else None)

    h32 = host32_pack(
        [n_ops, out["intra_mb"].sum(), out["skip"].sum()],
        y, u, v, ry, ru, rv, crop_w or mb_w * 16, crop_h or mb_h * 16,
        with_metrics)
    ret = dict(recon_y=ry, recon_u=ru, recon_v=rv,
               ops=cops, n_ops=n_ops, host32=h32,
               mv=out["mv"], intra_mb=out["intra_mb"],
               skip=out["skip"], mv4=out["mv4"], ref4=out["ref4"])
    for k in ("nr_sum4", "nr_sum8"):
        if k in out:
            ret[k] = out[k]
    return ret


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("crop_w", "crop_h", "with_metrics"))
def encode_b(mb_h: int, mb_w: int, me_range: int, deblock_on: bool,
             subpel_steps,
             y, u, v, l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
             qtab, lam, qp, qp_c, hdr_vals, hdr_lens,
             alpha_off, beta_off, chroma_qp_offset, mvp_seed,
             col_ref4=None, col_mv4=None,
             crop_w: int = 0, crop_h: int = 0,
             with_metrics: bool = False, mvp_seed_l1=None):
    """B frame (CAVLC): two-list ME + direct/skip + L0/L1/BI decision
    + entropy + pack + deblock, fused. col_ref4/col_mv4: RefPicList1[0]
    colocated L0 maps for spatial direct (None disables direct)."""
    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    l0 = tuple(p.astype(jnp.int32) for p in (l0_y, l0_u, l0_v))
    l1 = tuple(p.astype(jnp.int32) for p in (l1_y, l1_u, l1_v))
    out = inter.encode_b_body(mb_h, mb_w, me_range, y, u, v,
                              *l0, *l1, qtab, lam, mvp_seed,
                              subpel_steps,
                              col_ref4=col_ref4, col_mv4=col_mv4,
                              mvp_seed_l1=mvp_seed_l1)

    vals, lens = edev.b_code_planes(out, mb_h, mb_w)
    stop = jnp.ones((1,), I32)
    all_v = jnp.concatenate([hdr_vals.astype(I32), vals, stop])
    all_l = jnp.concatenate([hdr_lens.astype(I32), lens, stop])
    words, nbits = edev.pack_codes(all_v, all_l,
                                   capacity_words(mb_h * mb_w))

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, out["intra_mb"],
            out["nnz4"], out["ref4"], out["mv4"],
            out["ref4_l1"], out["mv4_l1"], True,
            alpha_off, beta_off, chroma_qp_offset)

    h32 = host32_pack(
        [nbits, out["intra_mb"].sum(), out["skip"].sum()],
        y, u, v, ry, ru, rv, crop_w or mb_w * 16, crop_h or mb_h * 16,
        with_metrics)
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                words=words, nbits=nbits, host32=h32,
                intra_mb=out["intra_mb"], bmode=out["bmode"])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("crop_w", "crop_h", "with_metrics",
                                    "t8"))
def encode_b_cabac(mb_h: int, mb_w: int, me_range: int, deblock_on: bool,
                   subpel_steps,
                   y, u, v, l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
                   qtab, lam, qp, qp_c,
                   alpha_off, beta_off, chroma_qp_offset, mvp_seed,
                   col_ref4=None, col_mv4=None,
                   crop_w: int = 0, crop_h: int = 0,
                   with_metrics: bool = False, t8: bool = False,
                   mvp_seed_l1=None):
    """B frame with CABAC entropy: packed bin-op stream for the host
    arithmetic coder. col_ref4/col_mv4 as in encode_b."""
    from ..entropy import cabac_planes

    y = _plane(y, mb_h * 16, mb_w * 16)
    u = _plane(u, mb_h * 8, mb_w * 8)
    v = _plane(v, mb_h * 8, mb_w * 8)
    l0 = tuple(p.astype(jnp.int32) for p in (l0_y, l0_u, l0_v))
    l1 = tuple(p.astype(jnp.int32) for p in (l1_y, l1_u, l1_v))
    out = inter.encode_b_body(mb_h, mb_w, me_range, y, u, v,
                              *l0, *l1, qtab, lam, mvp_seed,
                              subpel_steps,
                              col_ref4=col_ref4, col_mv4=col_mv4,
                              mvp_seed_l1=mvp_seed_l1)

    ops = cabac_planes.b_slice_ops(out, mb_h, mb_w, t8_mode=t8)
    cops, n_ops = _hw_ops(ops, mb_h * mb_w)

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, out["intra_mb"],
            out["nnz4"], out["ref4"], out["mv4"],
            out["ref4_l1"], out["mv4_l1"], True,
            alpha_off, beta_off, chroma_qp_offset)

    h32 = host32_pack(
        [n_ops, out["intra_mb"].sum(), out["skip"].sum()],
        y, u, v, ry, ru, rv, crop_w or mb_w * 16, crop_h or mb_h * 16,
        with_metrics)
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                ops=cops, n_ops=n_ops, host32=h32,
                intra_mb=out["intra_mb"], bmode=out["bmode"])
