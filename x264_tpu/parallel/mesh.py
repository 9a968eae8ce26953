"""Multi-chip parallelism (the TPU re-design of doc/threads.txt).

The reference's frame-pipeline threading (one x264_t clone per in-flight
frame, row-progress condition variables) maps onto TPU meshes as:

- **GOP/frame data-parallelism** ("gop" axis): independent frames (all-intra
  or separate GOPs) are sharded across chips. This is the analogue of
  x264's frame threads without the row-wavefront coupling — the coupling
  only exists for *inter* refs, which pipeline via halo exchange (below).
- **MB-row sharding** ("rows" axis, inter path, later rounds): reference
  planes are sharded in row bands; motion search reads a halo of height
  mv_range exchanged via collectives — the i_mv_range_thread contract
  (encoder/encoder.c:557-578) expressed as data movement instead of locks.

This module provides the GOP-parallel intra step used by bench/dryrun.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encoder import intra


def make_gop_mesh(n_devices: int | None = None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("gop",))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _encode_gop_jit(mb_h, mb_w, ys, us, vs, qtab, lam):
    """vmapped intra pipeline over the frame axis; sharding of the inputs
    over the 'gop' mesh axis makes XLA partition the whole computation
    (no cross-frame communication — embarrassingly parallel, like the
    reference's frame threads on an all-intra stream)."""
    fn = lambda y, u, v: intra.encode_i16_frame(mb_h, mb_w, y, u, v, qtab, lam)
    return jax.vmap(fn)(ys, us, vs)


def encode_gop_intra(mesh: Mesh, mb_h: int, mb_w: int, ys, us, vs, qtab, lam):
    """Encode a batch of frames sharded across the 'gop' mesh axis.

    ys: (N, mb_h*16, mb_w*16); us/vs: (N, mb_h*8, mb_w*8). N should be a
    multiple of the mesh size.
    """
    sh = NamedSharding(mesh, P("gop"))
    ys = jax.device_put(jnp.asarray(ys), sh)
    us = jax.device_put(jnp.asarray(us), sh)
    vs = jax.device_put(jnp.asarray(vs), sh)
    return _encode_gop_jit(mb_h, mb_w, ys, us, vs, qtab, lam)
