"""Encoder orchestration — the analogue of encoder/encoder.c.

Hosts the open/encode/close lifecycle (x264_encoder_open:623,
x264_encoder_encode:1362, x264_encoder_close:1878): parameter validation,
header generation, frame-type decision, and dispatch of per-frame work to
the jitted TPU pipelines.
"""

from __future__ import annotations

from ..params import EncoderParams

# The real implementation lands with the intra pipeline; this module keeps
# the public surface importable while subsystems are built bottom-up.


class Encoder:
    def __init__(self, params: EncoderParams):
        self.params = params.validate()

    def headers(self) -> bytes:
        raise NotImplementedError

    def encode(self, frame):
        raise NotImplementedError

    def close(self):
        pass
