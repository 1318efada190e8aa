"""Streaming engine: native stream pool + batched device compute.

The scale-out runtime of SURVEY.md §7.8: N streams attach/detach into padded
batch slots (no recompilation — the batch shape is fixed and inactive slots
are masked), the native side assembles contiguous time-major [T, S, 480] frames, the
device advances all streams in one jitted dispatch, and results scatter back
into per-stream output rings.

Per-frame active masking: slots that produced fewer than T frames this tick
simply get zeros processed through their slot; their DenoiseState is rolled
back afterwards so starvation never corrupts stream state.  Freshly attached
slots get their device state re-initialised via the reset mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api import RNNoise
from ..config import DEFAULT_MODEL, DEFAULT_RUNTIME, RuntimeConfig
from ..denoise import init_state, process_frames_tm_i16, reset_streams
from .native import StreamPool


class StreamingEngine:
    def __init__(self, n_slots: int, model: Optional[RNNoise] = None,
                 chunk_frames: int = 8,
                 runtime: RuntimeConfig = DEFAULT_RUNTIME,
                 ring_frames: int = 256,
                 pipelined: bool = False):
        """``pipelined=True`` double-buffers the host path: tick() commits
        the PREVIOUS tick's output while the device computes the current one
        (jax dispatch is async), hiding the ~90 MB/tick of host conversion
        behind device time at the cost of one chunk of extra output latency.
        Call flush() to drain the last pending chunk."""
        self.pool = StreamPool(n_slots, ring_frames)
        self.n_slots = n_slots
        self.chunk_frames = chunk_frames
        self.pipelined = pipelined
        self._pending = None        # (device out, counts) awaiting commit
        # Reused assembly buffers: jnp.asarray copies them synchronously, so
        # they are free for the next tick; fresh np.empty per tick re-faults
        # the batch's pages every call (measured ~1.8x on the host tick).
        self._batch = np.empty((chunk_frames, n_slots, 480), np.int16)
        self._counts = np.empty(n_slots, np.int32)
        self._reset = np.empty(n_slots, np.uint8)
        config = model.config if model is not None else DEFAULT_MODEL
        self.state = init_state(n_slots, config)
        params = model.params if model is not None else None

        @jax.jit
        def _tick(state, pcm, counts, reset_mask):
            # pcm is raw time-major [T, S, 480] int16 straight from the
            # rings; int16<->f32 conversion happens on-device (half the
            # host<->device bytes, no host conversion loops).
            state = reset_streams(state, reset_mask)
            prev = state
            state, out, vad = process_frames_tm_i16(params, state, pcm,
                                                    runtime)
            # Roll back streams that had no full chunk this tick (starved or
            # inactive): their zero-padded frames must not advance state.
            full = counts >= pcm.shape[0]
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    full.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                state, prev)
            return state, out, vad

        self._tick = _tick

    # -- stream management -------------------------------------------------
    def attach(self) -> int:
        """Add a stream; returns its slot id (or -1 if the pool is full)."""
        return self.pool.attach()

    def detach(self, slot: int) -> None:
        self.pool.detach(slot)

    def push(self, slot: int, pcm_i16: np.ndarray) -> int:
        return self.pool.push(slot, pcm_i16)

    def pull(self, slot: int, n: int) -> np.ndarray:
        return self.pool.pull(slot, n)

    def available(self, slot: int) -> int:
        return self.pool.available(slot)

    # -- the processing tick ----------------------------------------------
    def tick(self) -> int:
        """Assemble one chunk, process it on device, commit the results.

        Returns the number of streams that advanced.  Streams only advance in
        whole chunk_frames quanta (push at least chunk_frames*480 samples)."""
        T = self.chunk_frames
        # assembly is all-or-nothing per slot (see streamio.cc), so counts is
        # either T or 0 and no re-queueing is ever needed
        batch, counts, reset = self.pool.assemble_tm_i16(
            T, out=(self._batch, self._counts, self._reset))
        self.state, out, _vad = self._tick(
            self.state, jnp.asarray(batch),
            jnp.asarray(counts), jnp.asarray(reset.astype(bool)))
        if self.pipelined:
            # out is an async device value; commit LAST tick's output while
            # the device crunches this one.  counts is a reused buffer the
            # next assemble overwrites — the pending tuple keeps its own copy.
            advanced = 0
            if self._pending is not None:
                p_out, p_counts = self._pending
                self.pool.commit_tm_i16(T, np.asarray(p_out), p_counts)
                advanced = int((p_counts >= T).sum())
            self._pending = (out, counts.copy())
            return advanced
        self.pool.commit_tm_i16(T, np.asarray(out), counts)
        return int((counts >= T).sum())

    def flush(self) -> int:
        """Commit the pending pipelined chunk (no-op when not pipelined)."""
        if self._pending is None:
            return 0
        p_out, p_counts = self._pending
        self._pending = None
        self.pool.commit_tm_i16(self.chunk_frames, np.asarray(p_out),
                                p_counts)
        return int((p_counts >= self.chunk_frames).sum())
