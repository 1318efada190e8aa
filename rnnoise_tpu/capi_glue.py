"""Python side of the C ABI shim (native/rnnoise_capi.cc).

Keeps the per-frame hot path minimal: one CStream owns a single-stream
StreamDenoiser; ``process`` moves 480 floats in/out through the caller's
buffers via memoryviews (no allocation beyond the jit dispatch).

Matches the reference contract (include/rnnoise.h): NULL model -> default
model; the output is int16-rounded like the C demo path is NOT — the C API
hands back raw floats, so no rounding here either (denoise.c:496-503 writes
floats; quantisation is the caller's business)."""

from __future__ import annotations

import numpy as np

from .api import RNNoise, StreamDenoiser


class CStream:
    __slots__ = ("den",)

    def __init__(self, den: StreamDenoiser):
        self.den = den


def create(blob) -> CStream:
    """blob: bytes (model blob) or None for the default model (the C
    contract: a NULL model selects the built-in one, rnnoise.h:66-69)."""
    if blob is not None:
        model = RNNoise.from_buffer(bytes(blob))
    else:
        from .weights.registry import load_registered
        model = RNNoise(load_registered("rnnoise_synth_v1.blob"))
    return CStream(StreamDenoiser(1, model))


def process(st: CStream, in_mv, out_mv) -> float:
    x = np.frombuffer(in_mv, dtype=np.float32)
    out, vad = st.den.process_frame(x[None])
    np.frombuffer(out_mv, dtype=np.float32)[:] = np.asarray(out)[0]
    return float(np.asarray(vad)[0])
