"""MB-row sharding across chips: one slice per row band, reference-halo
exchange via collectives.

This is the TPU re-design of the reference's two intra-frame parallelism
modes at once:

- **Slice parallelism** (doc/threads.txt:1-8, X264_SLICE_MAX,
  common/common.h:51): each row band is encoded as an independent H.264
  slice — no intra prediction, MV prediction, or skip-run crosses a band
  boundary, and slice-edge deblocking is disabled
  (disable_deblocking_filter_idc=2), so the bands are *exactly*
  parallel by construction and the output stream is spec-conformant.
- **The frame-thread row contract** (i_mv_range_thread,
  encoder/encoder.c:557-578; cond-wait at encoder/analyse.c:278-304):
  motion search on a band needs reference rows beyond its own extent.
  The reference encodes this as a lock + vertical MV clamp; here it is
  pure data movement — each shard `ppermute`s its edge rows to its
  neighbors so every band owns a PAD(=32)-row halo of the reference
  reconstruction, and the ME window (me_range <= 24 plus interpolation
  margin) never leaves it.

Entropy coding also parallelizes: the per-slice CAVLC pack scan (or
CABAC bin-op generation) runs *per shard*, so the serial tail of the
unsharded design becomes n concurrent scans — CABAC contexts are
re-initialized per slice (spec 9.3.1), so band streams are independent
by construction (SURVEY.md §5 "one-slice-per-shard" note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..encoder import inter as einter
from ..encoder import intra as eintra
from ..entropy import device as edev
from ..ops import deblock as odeblock
from ..ops import mc as omc

I32 = jnp.int32

AXIS = "rows"


def make_rows_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _halo_extend(plane, halo: int, n: int):
    """Attach `halo` rows from each vertical neighbor shard
    (edge-replicated at the frame top/bottom). The ppermute pair is the
    collective form of the reference's row-progress handshake
    (x264_frame_cond_broadcast/wait, common/frame.c:880-896)."""
    if n == 1:
        return jnp.pad(plane, ((halo, halo), (0, 0)), mode="edge")
    idx = jax.lax.axis_index(AXIS)
    from_above = jax.lax.ppermute(
        plane[-halo:], AXIS, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        plane[:halo], AXIS, [(i, i - 1) for i in range(1, n)])
    top_edge = jnp.broadcast_to(plane[:1], (halo,) + plane.shape[1:])
    bot_edge = jnp.broadcast_to(plane[-1:], (halo,) + plane.shape[1:])
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    return jnp.concatenate([top, plane, bot], axis=0)


@functools.lru_cache(maxsize=32)
def _p_rows_fn(mesh: Mesh, band: int, mb_w: int, me_range: int,
               subpel_steps, deblock_on: bool, cap_words: int,
               parts: bool = True):
    n = mesh.shape[AXIS]

    def body(y, u, v, ry, ru, rv, mvp, hdr_vals, hdr_lens,
             qtab, lam, qp, alpha_off, beta_off, cqp_off):
        # shard-local blocks: y (band*16, W); hdr_* (1, HDR_SLOTS)
        ry_ext = _halo_extend(ry.astype(I32), omc.PAD, n)
        ru_ext = _halo_extend(ru.astype(I32), omc.PAD // 2, n)
        rv_ext = _halo_extend(rv.astype(I32), omc.PAD // 2, n)
        ry_ext = jnp.pad(ry_ext, ((0, 0), (omc.PAD, omc.PAD)), mode="edge")
        ru_ext = jnp.pad(ru_ext, ((0, 0), (omc.PAD // 2,) * 2), mode="edge")
        rv_ext = jnp.pad(rv_ext, ((0, 0), (omc.PAD // 2,) * 2), mode="edge")

        out = einter.encode_p_body(
            band, mb_w, me_range, y.astype(I32), u.astype(I32),
            v.astype(I32), ry_ext, ru_ext, rv_ext, qtab, lam, mvp,
            subpel_steps, ref_prepadded=True, parts=parts)

        vals, lens = edev.p_code_planes(out, band, mb_w)
        stop = jnp.ones((1,), I32)
        all_v = jnp.concatenate([hdr_vals[0].astype(I32), vals, stop])
        all_l = jnp.concatenate([hdr_lens[0].astype(I32), lens, stop])
        words, nbits = edev.pack_codes(all_v, all_l, cap_words)

        ryo, ruo, rvo = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
            zmv = jnp.zeros((band * 4, mb_w * 4, 2), I32)
            z4 = jnp.zeros((band * 4, mb_w * 4), I32)
            ryo, ruo, rvo = odeblock.deblock_frame(
                band, mb_w, ryo, ruo, rvo, qp_mb, out["intra_mb"],
                out["nnz4"], out["ref4"], out["mv4"], z4, zmv, False,
                alpha_off, beta_off, cqp_off)
        return (ryo, ruo, rvo, words[None], nbits[None], out["mv"],
                out["intra_mb"], out["skip"])

    row = P(AXIS)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, row, row, row, row, row, row,
                  rep, rep, rep, rep, rep, rep),
        out_specs=(row, row, row, row, row, row, row, row),
        check_vma=False)
    return jax.jit(fn)


def encode_p_rows(mesh: Mesh, mb_h: int, mb_w: int, me_range: int,
                  subpel_steps, deblock_on: bool,
                  y, u, v, ref_y, ref_u, ref_v, qtab, lam, qp,
                  alpha_off, beta_off, cqp_off,
                  mvp_seed, hdr_vals, hdr_lens, cap_words: int):
    """Encode one P frame as n row-band slices over the mesh.

    hdr_vals/hdr_lens: (n, HDR_SLOTS) per-band slice-header codes (each
    band's header differs in first_mb_in_slice). Returns a dict with
    per-band packed words (n, cap_words) + nbits (n,), the global
    deblocked recon planes, and the MV/intra/skip maps."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    # the halo must be real rows from one neighbor only
    assert band * 16 >= omc.PAD, f"band too short for halo ({band} MB rows)"
    fn = _p_rows_fn(mesh, band, mb_w, me_range, tuple(subpel_steps),
                    deblock_on, cap_words)
    ry, ru, rv, words, nbits, mv, intra_mb, skip = fn(
        y, u, v, ref_y, ref_u, ref_v, mvp_seed,
        jnp.asarray(hdr_vals), jnp.asarray(hdr_lens),
        qtab, jnp.asarray(lam, I32), jnp.asarray(qp, I32),
        jnp.asarray(alpha_off, I32), jnp.asarray(beta_off, I32),
        jnp.asarray(cqp_off, I32))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv, words=words,
                nbits=nbits, mv=mv, intra_mb=intra_mb, skip=skip)


def _ext_refs(ry, ru, rv, n):
    """Halo-extend one reference's planes (vertical real halos via
    ppermute + horizontal edge pad)."""
    ry_ext = _halo_extend(ry.astype(I32), omc.PAD, n)
    ru_ext = _halo_extend(ru.astype(I32), omc.PAD // 2, n)
    rv_ext = _halo_extend(rv.astype(I32), omc.PAD // 2, n)
    ry_ext = jnp.pad(ry_ext, ((0, 0), (omc.PAD, omc.PAD)), mode="edge")
    ru_ext = jnp.pad(ru_ext, ((0, 0), (omc.PAD // 2,) * 2), mode="edge")
    rv_ext = jnp.pad(rv_ext, ((0, 0), (omc.PAD // 2,) * 2), mode="edge")
    return ry_ext, ru_ext, rv_ext


@functools.lru_cache(maxsize=32)
def _p_rows_cabac_fn(mesh: Mesh, band: int, mb_w: int, me_range: int,
                     subpel_steps, deblock_on: bool, cap_ops: int,
                     parts: bool = True, n_refs: int = 1,
                     t8: bool = False, decimate: bool = False,
                     rd: bool = False, p8x8: bool = False,
                     aq: bool = False, aq_qp_min: int = 10,
                     aq_qp_max: int = 51):
    n = mesh.shape[AXIS]
    from ..entropy import cabac_planes
    from ..encoder import aq as eaq
    from ..encoder.pipeline import _aq_maps

    def body(y, u, v, ry, ru, rv, *rest):
        if n_refs == 2:
            (r2y, r2u, r2v, mvp, qtab, lam, qp,
             alpha_off, beta_off, cqp_off) = rest
            r2 = _ext_refs(r2y, r2u, r2v, n)
        else:
            (mvp, qtab, lam, qp,
             alpha_off, beta_off, cqp_off) = rest
            r2 = (None, None, None)
        ry_ext, ru_ext, rv_ext = _ext_refs(ry, ru, rv, n)
        y, u, v = y.astype(I32), u.astype(I32), v.astype(I32)
        if aq:
            # per-band AQ: each band IS a slice, so its dqp forward
            # fill starts at the slice QP — exactly spec 7.4.5
            qp_map, qpc_map = _aq_maps(y, u, v, band, mb_w, qp, qtab,
                                       aq_qp_min, aq_qp_max, cqp_off)
        else:
            qp_map = qpc_map = None

        out = einter.encode_p_body(
            band, mb_w, me_range, y, u, v, ry_ext, ru_ext, rv_ext,
            qtab, lam, mvp, subpel_steps, ref_prepadded=True,
            parts=parts, ref2_y=r2[0], ref2_u=r2[1], ref2_v=r2[2],
            n_refs=n_refs, t8=t8, qp_map=qp_map, qpc_map=qpc_map,
            decimate=decimate, rd=rd, p8x8=p8x8)

        qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
        if aq:
            has_dqp = (~out["skip"]) & (out["intra_mb"]
                                        | (out["cbp_luma_bits"] > 0)
                                        | (out["cbp_chroma"] > 0))
            dqp, qp_eff, pnz = eaq.dqp_syntax(qp_map, has_dqp, qp)
            out["dqp"], out["dqp_prev_nz"] = dqp, pnz
            qp_mb = qp_eff

        ops = cabac_planes.p_slice_ops(out, band, mb_w, n_refs,
                                       t8_mode=t8)
        cops, n_ops = cabac_planes.compact_ops(ops, cap_ops)
        cops, n_ops = cabac_planes.hw_pack(cops, n_ops,
                                           3 * cap_ops)

        ryo, ruo, rvo = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            zmv = jnp.zeros((band * 4, mb_w * 4, 2), I32)
            z4 = jnp.zeros((band * 4, mb_w * 4), I32)
            ryo, ruo, rvo = odeblock.deblock_frame(
                band, mb_w, ryo, ruo, rvo, qp_mb, out["intra_mb"],
                out["nnz4"], out["ref4"], out["mv4"], z4, zmv, False,
                alpha_off, beta_off, cqp_off,
                t8_mb=out.get("t8_mb") if t8 else None)
        return (ryo, ruo, rvo, cops[None], n_ops[None], out["mv"],
                out["intra_mb"], out["skip"])

    row = P(AXIS)
    rep = P()
    nref_specs = (row, row, row) if n_refs == 2 else ()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, row, row, row) + nref_specs
        + (row, rep, rep, rep, rep, rep, rep),
        out_specs=(row, row, row, row, row, row, row, row),
        check_vma=False)
    return jax.jit(fn)


def encode_p_rows_cabac(mesh: Mesh, mb_h: int, mb_w: int, me_range: int,
                        subpel_steps, deblock_on: bool,
                        y, u, v, ref_y, ref_u, ref_v, qtab, lam, qp,
                        alpha_off, beta_off, cqp_off,
                        mvp_seed, cap_ops: int,
                        ref2_y=None, ref2_u=None, ref2_v=None,
                        t8: bool = False, decimate: bool = False,
                        rd: bool = False, p8x8: bool = False,
                        aq: bool = False, aq_qp_min: int = 10,
                        aq_qp_max: int = 51):
    """P frame as n row-band CABAC slices: per-band compacted bin-op
    streams (contexts are per-slice, so the n host FSM runs are
    independent). ref2_* (optional) is L0[1] — its halo rides the same
    ppermute exchange. t8/decimate/rd/p8x8/aq compose as in the
    unsharded pipeline (AQ dqp state is per band == per slice).
    Returns ops (n, cap_ops), n_ops (n,), recon, maps."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    assert band * 16 >= omc.PAD, f"band too short for halo ({band} MB rows)"
    n_refs = 2 if ref2_y is not None else 1
    fn = _p_rows_cabac_fn(mesh, band, mb_w, me_range, tuple(subpel_steps),
                          deblock_on, cap_ops, True, n_refs,
                          t8, decimate, rd, p8x8,
                          aq, aq_qp_min, aq_qp_max)
    r2 = (ref2_y, ref2_u, ref2_v) if n_refs == 2 else ()
    ry, ru, rv, ops, n_ops, mv, intra_mb, skip = fn(
        y, u, v, ref_y, ref_u, ref_v, *r2, mvp_seed,
        qtab, jnp.asarray(lam, I32), jnp.asarray(qp, I32),
        jnp.asarray(alpha_off, I32), jnp.asarray(beta_off, I32),
        jnp.asarray(cqp_off, I32))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv, ops=ops,
                n_ops=n_ops, mv=mv, intra_mb=intra_mb, skip=skip)


@functools.lru_cache(maxsize=32)
def _i_rows_cabac_fn(mesh: Mesh, band: int, mb_w: int, i4x4: bool,
                     deblock_on: bool, cap_ops: int,
                     t8_mode: bool = False):
    from ..entropy import cabac_planes

    def body(y, u, v, qtab, lam, qp, alpha_off, beta_off, cqp_off):
        out = eintra.encode_i16_frame(band, mb_w, y.astype(I32),
                                      u.astype(I32), v.astype(I32),
                                      qtab, lam, i4x4)
        # t8_mode: the PPS signals transform_8x8_mode, so I_NxN MBs
        # carry a transform_size_8x8_flag even in I band slices
        ops = cabac_planes.i16_slice_ops(out, band, mb_w,
                                         t8_mode=t8_mode)
        cops, n_ops = cabac_planes.compact_ops(ops, cap_ops)
        cops, n_ops = cabac_planes.hw_pack(cops, n_ops,
                                           3 * cap_ops)

        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
            intra_mb = jnp.ones((band, mb_w), bool)
            z4 = jnp.zeros((band * 4, mb_w * 4), I32)
            zmv = jnp.zeros((band * 4, mb_w * 4, 2), I32)
            ry, ru, rv = odeblock.deblock_frame(
                band, mb_w, ry, ru, rv, qp_mb, intra_mb,
                z4, z4, zmv, z4, zmv, False,
                alpha_off, beta_off, cqp_off)
        return ry, ru, rv, cops[None], n_ops[None]

    row = P(AXIS)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, rep, rep, rep, rep, rep, rep),
        out_specs=(row, row, row, row, row),
        check_vma=False)
    return jax.jit(fn)


def encode_i_rows_cabac(mesh: Mesh, mb_h: int, mb_w: int, i4x4: bool,
                        deblock_on: bool, y, u, v, qtab, lam, qp,
                        alpha_off, beta_off, cqp_off, cap_ops: int,
                        t8_mode: bool = False):
    """IDR frame as n row-band CABAC slices."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    fn = _i_rows_cabac_fn(mesh, band, mb_w, i4x4, deblock_on, cap_ops,
                          t8_mode)
    ry, ru, rv, ops, n_ops = fn(
        y, u, v, qtab, jnp.asarray(lam, I32), jnp.asarray(qp, I32),
        jnp.asarray(alpha_off, I32), jnp.asarray(beta_off, I32),
        jnp.asarray(cqp_off, I32))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv, ops=ops, n_ops=n_ops)


@functools.lru_cache(maxsize=32)
def _i_rows_fn(mesh: Mesh, band: int, mb_w: int, i4x4: bool,
               deblock_on: bool, cap_words: int):
    n = mesh.shape[AXIS]

    def body(y, u, v, hdr_vals, hdr_lens, qtab, lam, qp,
             alpha_off, beta_off, cqp_off):
        out = eintra.encode_i16_frame(band, mb_w, y.astype(I32),
                                      u.astype(I32), v.astype(I32),
                                      qtab, lam, i4x4)
        vals, lens = edev.i16_code_planes(out, band, mb_w)
        stop = jnp.ones((1,), I32)
        all_v = jnp.concatenate([hdr_vals[0].astype(I32), vals, stop])
        all_l = jnp.concatenate([hdr_lens[0].astype(I32), lens, stop])
        words, nbits = edev.pack_codes(all_v, all_l, cap_words)

        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
            intra_mb = jnp.ones((band, mb_w), bool)
            z4 = jnp.zeros((band * 4, mb_w * 4), I32)
            zmv = jnp.zeros((band * 4, mb_w * 4, 2), I32)
            ry, ru, rv = odeblock.deblock_frame(
                band, mb_w, ry, ru, rv, qp_mb, intra_mb,
                z4, z4, zmv, z4, zmv, False,
                alpha_off, beta_off, cqp_off)
        return ry, ru, rv, words[None], nbits[None]

    row = P(AXIS)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(row, row, row, row, row, rep, rep, rep, rep, rep, rep),
        out_specs=(row, row, row, row, row),
        check_vma=False)
    return jax.jit(fn)


def encode_i_rows(mesh: Mesh, mb_h: int, mb_w: int, i4x4: bool,
                  deblock_on: bool, y, u, v, qtab, lam, qp,
                  alpha_off, beta_off, cqp_off,
                  hdr_vals, hdr_lens, cap_words: int):
    """Encode one IDR frame as n row-band slices (intra needs no halo —
    slices are independent by construction)."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    fn = _i_rows_fn(mesh, band, mb_w, i4x4, deblock_on, cap_words)
    ry, ru, rv, words, nbits = fn(
        y, u, v, jnp.asarray(hdr_vals), jnp.asarray(hdr_lens),
        qtab, jnp.asarray(lam, I32), jnp.asarray(qp, I32),
        jnp.asarray(alpha_off, I32), jnp.asarray(beta_off, I32),
        jnp.asarray(cqp_off, I32))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv, words=words,
                nbits=nbits)


@functools.lru_cache(maxsize=32)
def _b_rows_cabac_fn(mesh: Mesh, band: int, mb_w: int, me_range: int,
                     subpel_steps, deblock_on: bool, cap_ops: int,
                     t8: bool = False):
    n = mesh.shape[AXIS]
    from ..entropy import cabac_planes

    def body(y, u, v, l0y, l0u, l0v, l1y, l1u, l1v, col_ref4, col_mv4,
             mvp, mvp_l1, qtab, lam, qp, alpha_off, beta_off, cqp_off):
        l0 = _ext_refs(l0y, l0u, l0v, n)
        l1 = _ext_refs(l1y, l1u, l1v, n)
        out = einter.encode_b_body(
            band, mb_w, me_range, y.astype(I32), u.astype(I32),
            v.astype(I32), *l0, *l1, qtab, lam, mvp, subpel_steps,
            col_ref4=col_ref4, col_mv4=col_mv4, mvp_seed_l1=mvp_l1,
            ref_prepadded=True)
        ops = cabac_planes.b_slice_ops(out, band, mb_w, t8_mode=t8)
        cops, n_ops = cabac_planes.compact_ops(ops, cap_ops)
        cops, n_ops = cabac_planes.hw_pack(cops, n_ops,
                                           3 * cap_ops)
        ryo, ruo, rvo = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
            ryo, ruo, rvo = odeblock.deblock_frame(
                band, mb_w, ryo, ruo, rvo, qp_mb, out["intra_mb"],
                out["nnz4"], out["ref4"], out["mv4"],
                out["ref4_l1"], out["mv4_l1"], True,
                alpha_off, beta_off, cqp_off)
        return (ryo, ruo, rvo, cops[None], n_ops[None],
                out["intra_mb"], out["skip"])

    row = P(AXIS)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(row,) * 13 + (rep,) * 6,
        out_specs=(row,) * 7,
        check_vma=False)
    return jax.jit(fn)


def encode_b_rows_cabac(mesh: Mesh, mb_h: int, mb_w: int, me_range: int,
                        subpel_steps, deblock_on: bool,
                        y, u, v, l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
                        qtab, lam, qp, alpha_off, beta_off, cqp_off,
                        mvp_seed, col_ref4, col_mv4, cap_ops: int,
                        mvp_seed_l1=None, t8: bool = False):
    """Non-reference B frame as n row-band CABAC slices: both
    references' halos ride the ppermute exchange; the spatial-direct
    derivation stays band-local (bands are slices, so cross-band
    neighbors are unavailable by the spec's own slice rules)."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    assert band * 16 >= omc.PAD, f"band too short for halo ({band} MB rows)"
    fn = _b_rows_cabac_fn(mesh, band, mb_w, me_range,
                          tuple(subpel_steps), deblock_on, cap_ops, t8)
    if mvp_seed_l1 is None:
        mvp_seed_l1 = mvp_seed
    ry, ru, rv, ops, n_ops, intra_mb, skip = fn(
        y, u, v, l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
        col_ref4, col_mv4, mvp_seed, mvp_seed_l1,
        qtab, jnp.asarray(lam, I32), jnp.asarray(qp, I32),
        jnp.asarray(alpha_off, I32), jnp.asarray(beta_off, I32),
        jnp.asarray(cqp_off, I32))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv, ops=ops,
                n_ops=n_ops, intra_mb=intra_mb, skip=skip)
