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
from . import intra

I32 = jnp.int32

# bitstream capacity per MB, in bits (device pack buffer; host falls back
# to the host packer if a frame ever exceeds it — x264 instead reallocs,
# x264_bitstream_check_buffer, encoder/encoder.c:301)
CAP_BITS_PER_MB = 4800


def capacity_words(nmb: int) -> int:
    return (nmb * CAP_BITS_PER_MB + edev.HDR_SLOTS * 32 + 4096) // 32


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def encode_i16_idr(mb_h: int, mb_w: int, deblock_on: bool,
                   y, u, v, qtab, lam, qp, qp_c,
                   hdr_vals, hdr_lens,
                   alpha_off, beta_off, chroma_qp_offset):
    """All-I16x16 IDR frame: encode + entropy + pack + deblock, fused.

    y/u/v may be uint8 (the cheap host->device format on this platform;
    cast happens on device). Returns dict with recon_{y,u,v} (deblocked
    if deblock_on; int32, kept device-resident by the caller as DPB
    state), packed bitstream `words` (uint32, big-endian bit order) and
    `nbits` (including the rbsp stop bit).
    """
    y, u, v = (p.astype(jnp.int32) for p in (y, u, v))
    out = intra.encode_i16_frame(mb_h, mb_w, y, u, v, qtab, lam)

    vals, lens = edev.i16_code_planes(out, mb_h, mb_w)
    stop_v = jnp.ones((1,), I32)         # rbsp_trailing stop bit
    stop_l = jnp.ones((1,), I32)
    all_v = jnp.concatenate([hdr_vals.astype(I32), vals, stop_v])
    all_l = jnp.concatenate([hdr_lens.astype(I32), lens, stop_l])
    words, nbits = edev.pack_codes(all_v, all_l,
                                   capacity_words(mb_h * mb_w))

    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if deblock_on:
        qp_mb = jnp.broadcast_to(qp, (mb_h, mb_w)).astype(I32)
        intra_mb = jnp.ones((mb_h, mb_w), bool)
        z4 = jnp.zeros((mb_h * 4, mb_w * 4), I32)
        zmv = jnp.zeros((mb_h * 4, mb_w * 4, 2), I32)
        ry, ru, rv = odeblock.deblock_frame(
            mb_h, mb_w, ry, ru, rv, qp_mb, intra_mb,
            z4, z4, zmv, z4, zmv, False,
            alpha_off, beta_off, chroma_qp_offset)

    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                words=words, nbits=nbits,
                mode16=out["mode16"], modec=out["modec"])
