"""Public API, mirroring include/rnnoise.h:57-125 one-to-one (plus batched
variants — the native unit of work on TPU is a batch of streams).

C API -> here:
  rnnoise_get_frame_size        -> StreamDenoiser.frame_size / get_frame_size()
  rnnoise_create/init/destroy   -> StreamDenoiser(n_streams, model) / .reset()
  rnnoise_process_frame         -> StreamDenoiser.process_frame (S frames at
                                   once; returns VAD probabilities)
  rnnoise_model_from_buffer     -> RNNoise.from_buffer
  rnnoise_model_from_file(name) -> RNNoise.from_filename / from_file
  rnnoise_model_free            -> (garbage collected)
"""

from __future__ import annotations

import functools
from typing import IO, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (DEFAULT_MODEL, DEFAULT_RUNTIME, FRAME_SIZE, ModelConfig,
                     RuntimeConfig)
from .denoise import DenoiseState, init_state, process_frame, process_frames
from .models.rnn import ModelParams
from .weights.loader import load_model_bytes


def get_frame_size() -> int:
    """rnnoise_get_frame_size (include/rnnoise.h:77-81)."""
    return FRAME_SIZE


class RNNoise:
    """A loaded model (reference RNNModel, denoise.c:227-275)."""

    def __init__(self, params: ModelParams,
                 config: ModelConfig = DEFAULT_MODEL):
        self.params = params
        self.config = config

    @classmethod
    def from_buffer(cls, blob: bytes,
                    config: Optional[ModelConfig] = None) -> "RNNoise":
        """config=None infers the topology from the blob
        (weights.loader.infer_model_config)."""
        from .weights.blob import parse_weights
        from .weights.loader import infer_model_config, model_params_from_arrays
        arrays = parse_weights(blob)
        if config is None:
            config = infer_model_config(arrays)
        return cls(model_params_from_arrays(arrays, config), config)

    @classmethod
    def from_file(cls, f: IO[bytes],
                  config: Optional[ModelConfig] = None) -> "RNNoise":
        return cls.from_buffer(f.read(), config)

    @classmethod
    def from_filename(cls, path: str,
                      config: Optional[ModelConfig] = None) -> "RNNoise":
        with open(path, "rb") as f:
            return cls.from_file(f, config)


class StreamDenoiser:
    """S concurrent streaming denoisers sharing one jitted compute graph.

    With S == 1 this behaves like one reference DenoiseState; larger S is the
    TPU-native path (the per-frame work is identical per stream, so everything
    batches).
    """

    frame_size = FRAME_SIZE

    def __init__(self, n_streams: int = 1, model: Optional[RNNoise] = None,
                 runtime: RuntimeConfig = DEFAULT_RUNTIME):
        self.n_streams = n_streams
        self.model = model
        self.runtime = runtime
        config = model.config if model is not None else DEFAULT_MODEL
        self.state: DenoiseState = init_state(n_streams, config)
        params = model.params if model is not None else None
        self._step = jax.jit(
            functools.partial(process_frame, params, rt=runtime))
        self._chunk = jax.jit(
            functools.partial(process_frames, params, rt=runtime))

    def reset(self) -> None:
        """rnnoise_init equivalent: zero all stream states in place."""
        config = self.model.config if self.model is not None else DEFAULT_MODEL
        self.state = init_state(self.n_streams, config)

    def process_frame(self, pcm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """pcm: [S, FRAME_SIZE] (or [FRAME_SIZE] when S == 1) float PCM in
        int16 scale.  Returns (denoised[S, FRAME_SIZE], vad[S])."""
        pcm = jnp.asarray(pcm, jnp.float32).reshape(self.n_streams, FRAME_SIZE)
        self.state, out, vad = self._step(self.state, pcm)
        return np.asarray(out), np.asarray(vad)

    def process_chunk(self, pcm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """pcm: [S, T, FRAME_SIZE] — T frames per stream in one dispatch (the
        high-throughput path; amortises launch overhead across frames)."""
        pcm = jnp.asarray(pcm, jnp.float32)
        self.state, out, vad = self._chunk(self.state, pcm)
        return np.asarray(out), np.asarray(vad)
