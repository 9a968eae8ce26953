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
                     parts: bool = True, n_refs: int = 1):
    n = mesh.shape[AXIS]
    from ..entropy import cabac_planes

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

        out = einter.encode_p_body(
            band, mb_w, me_range, y.astype(I32), u.astype(I32),
            v.astype(I32), ry_ext, ru_ext, rv_ext, qtab, lam, mvp,
            subpel_steps, ref_prepadded=True, parts=parts,
            ref2_y=r2[0], ref2_u=r2[1], ref2_v=r2[2], n_refs=n_refs)

        ops = cabac_planes.p_slice_ops(out, band, mb_w, n_refs)
        cops, n_ops = cabac_planes.compact_ops(ops, cap_ops)

        ryo, ruo, rvo = out["recon_y"], out["recon_u"], out["recon_v"]
        if deblock_on:
            qp_mb = jnp.broadcast_to(qp, (band, mb_w)).astype(I32)
            zmv = jnp.zeros((band * 4, mb_w * 4, 2), I32)
            z4 = jnp.zeros((band * 4, mb_w * 4), I32)
            ryo, ruo, rvo = odeblock.deblock_frame(
                band, mb_w, ryo, ruo, rvo, qp_mb, out["intra_mb"],
                out["nnz4"], out["ref4"], out["mv4"], z4, zmv, False,
                alpha_off, beta_off, cqp_off)
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
                        ref2_y=None, ref2_u=None, ref2_v=None):
    """P frame as n row-band CABAC slices: per-band compacted bin-op
    streams (contexts are per-slice, so the n host FSM runs are
    independent). ref2_* (optional) is L0[1] — its halo rides the same
    ppermute exchange. Returns ops (n, cap_ops), n_ops (n,), recon,
    maps."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    assert band * 16 >= omc.PAD, f"band too short for halo ({band} MB rows)"
    n_refs = 2 if ref2_y is not None else 1
    fn = _p_rows_cabac_fn(mesh, band, mb_w, me_range, tuple(subpel_steps),
                          deblock_on, cap_ops, True, n_refs)
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
                     deblock_on: bool, cap_ops: int):
    from ..entropy import cabac_planes

    def body(y, u, v, qtab, lam, qp, alpha_off, beta_off, cqp_off):
        out = eintra.encode_i16_frame(band, mb_w, y.astype(I32),
                                      u.astype(I32), v.astype(I32),
                                      qtab, lam, i4x4)
        ops = cabac_planes.i16_slice_ops(out, band, mb_w)
        cops, n_ops = cabac_planes.compact_ops(ops, cap_ops)

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
                        alpha_off, beta_off, cqp_off, cap_ops: int):
    """IDR frame as n row-band CABAC slices."""
    n = mesh.shape[AXIS]
    assert mb_h % n == 0, (mb_h, n)
    band = mb_h // n
    fn = _i_rows_cabac_fn(mesh, band, mb_w, i4x4, deblock_on, cap_ops)
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
