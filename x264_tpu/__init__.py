"""x264_tpu — a TPU-native H.264/AVC encoder framework.

A from-scratch re-design of the capabilities of x264 (reference:
chinaxuyongtao/x264-vs2008, x264 snapshot 2009-02-16) for TPU hardware:

- All per-macroblock DSP (intra prediction, motion search metrics, integer
  transforms, quantization, deblocking) runs as JAX/Pallas kernels batched
  over macroblock-tiled planes.
- The truly sequential dependencies of H.264 encoding are collapsed into
  three scans: the intra/reconstruction wavefront (``lax.scan`` over MB
  anti-diagonals), the deblock row order, and per-slice entropy coding.
- x264's frame-pipeline pthread parallelism (doc/threads.txt) maps to
  sharding macroblock rows across chips (halo exchange over ICI) and
  GOP/frame parallelism across hosts.

Public API mirrors the 7 entry points of x264.h:315-430 in pythonic form:
``EncoderParams`` (x264_param_t), ``Encoder`` (x264_encoder_open/encode/
close), ``Encoder.headers`` (x264_encoder_headers).
"""

from .version import __version__
from .params import EncoderParams
from .encoder.core import Encoder

__all__ = ["EncoderParams", "Encoder", "__version__"]
