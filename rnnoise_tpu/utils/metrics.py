"""Observability helpers (SURVEY.md §5 tracing/metrics rows).

The reference has only a vestigial PRINT_MIPS macro (arch.h:90); here:
  * ThroughputMeter — frames/sec and realtime-streams gauges around the
    batched step
  * gain_mse — the "gain MSE vs C reference" CI metric
  * profile_trace — context manager around jax.profiler for on-device
    op-level traces (works through the PJRT plugin)
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np

from ..config import FRAME_SIZE

SAMPLE_RATE = 48000.0


@dataclass
class ThroughputMeter:
    frames: int = 0
    streams: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_streams: int, n_frames: int):
        self.seconds += time.perf_counter() - self._t0
        self.frames += n_frames * n_streams
        self.streams = n_streams

    @property
    def frames_per_sec(self) -> float:
        return self.frames / max(self.seconds, 1e-12)

    @property
    def realtime_streams(self) -> float:
        audio_sec = self.frames * FRAME_SIZE / SAMPLE_RATE
        return self.streams * (audio_sec / max(self.streams, 1)) / \
            max(self.seconds, 1e-12)

    def summary(self) -> dict:
        return dict(frames_per_sec=self.frames_per_sec,
                    realtime_streams=self.realtime_streams,
                    wall_seconds=self.seconds)


def gain_mse(gains: np.ndarray, gains_ref: np.ndarray) -> float:
    """Per-band gain MSE vs a reference run (driver metric)."""
    return float(np.mean((np.asarray(gains) - np.asarray(gains_ref)) ** 2))


@contextlib.contextmanager
def profile_trace(log_dir: str):
    import jax
    with jax.profiler.trace(log_dir):
        yield
