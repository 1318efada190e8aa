"""Multi-process host fan-out tests (runtime/fanout.py).

The fan-out splits the global slot axis over K worker processes, each owning
a native StreamPool that assembles/commits directly into shared [T, S, 480]
int16 tensors via the strided native entry points.  These tests prove the
K-worker path is observationally identical to the single-process StreamPool
(assembly bytes, counts, reset flags, commit/pull round trip) and that the
FanoutEngine matches the single-process StreamingEngine end-to-end.

Reference contract being batched: /root/reference/examples/rnnoise_demo.c:52-61
(the per-480-sample stream boundary); the multi-core host side has no
reference counterpart (the C demo is single-stream).
"""

import numpy as np
import pytest

from rnnoise_tpu.config import FRAME_SIZE


def _ramps(n_slots: int, n: int, seed: int = 3) -> np.ndarray:
    """Per-slot deterministic int16 ramps (distinct per slot)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-2000, 2000, size=(n_slots, 1)).astype(np.int32)
    t = np.arange(n, dtype=np.int32)
    return ((base + t) % 4000 - 2000).astype(np.int16)


@pytest.mark.parametrize("n_workers", [1, 2, 4])
def test_fanout_pool_matches_single_pool(n_workers):
    from rnnoise_tpu.runtime.fanout import FanoutPool
    from rnnoise_tpu.runtime.native import StreamPool

    S, T = 8, 4
    pcm = _ramps(S, T * FRAME_SIZE)

    ref = StreamPool(S, ring_frames=16)
    for _ in range(S):
        ref.attach()
    ref.push_all(pcm)
    ref_batch, ref_counts, ref_reset = ref.assemble_tm_i16(T)

    fan = FanoutPool(S, n_workers, ring_frames=16, t_max=T)
    try:
        assert fan.attach_all() == S
        assert fan.push_all(pcm) == S
        batch, counts, reset = fan.assemble_tm_i16(T)
        np.testing.assert_array_equal(batch, ref_batch)
        np.testing.assert_array_equal(counts, ref_counts)
        np.testing.assert_array_equal(reset, ref_reset)

        # commit a known transform of the batch and pull it back
        out = (batch.astype(np.int32) // 2).astype(np.int16)
        fan.commit_tm_i16(T, out)
        got, full = fan.pull_all(T * FRAME_SIZE)
        assert full == S
        want = np.moveaxis(np.asarray(out), 1, 0).reshape(S, -1)
        np.testing.assert_array_equal(got, want)

        # second assemble: drained rings -> zero counts, no reset flags
        _, counts2, reset2 = fan.assemble_tm_i16(T)
        assert counts2.sum() == 0 and reset2.sum() == 0
    finally:
        fan.close()


def test_fanout_pool_starved_slot_zero_filled():
    """A slot with a partial chunk contributes zeros and count 0 — matching
    the all-or-nothing per-slot assembly of the single pool."""
    from rnnoise_tpu.runtime.fanout import FanoutPool

    S, T = 4, 4
    fan = FanoutPool(S, 2, ring_frames=16, t_max=T)
    try:
        fan.attach_all()
        pcm = _ramps(S, T * FRAME_SIZE)
        pcm_short = pcm.copy()
        fan.push_all(pcm[:, :2 * FRAME_SIZE])    # only half a chunk
        batch, counts, _ = fan.assemble_tm_i16(T)
        assert counts.sum() == 0
        np.testing.assert_array_equal(batch, 0)
        # complete the chunk: all four slots now advance, in push order
        fan.push_all(pcm_short[:, 2 * FRAME_SIZE:])
        batch, counts, _ = fan.assemble_tm_i16(T)
        assert (counts == T).all()
        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(batch), 1, 0).reshape(S, -1), pcm)
    finally:
        fan.close()


def test_fanout_engine_matches_streaming_engine(model_params):
    """FanoutEngine (2 worker processes) output == StreamingEngine output
    for the same per-stream signals."""
    from rnnoise_tpu.api import RNNoise
    from rnnoise_tpu.runtime.engine import StreamingEngine
    from rnnoise_tpu.runtime.fanout import FanoutEngine
    from tests.conftest import speechlike

    S, T, n_chunks = 4, 2, 3
    rng = np.random.default_rng(5)
    sigs = np.stack(
        [speechlike(rng, n_chunks * T * FRAME_SIZE).astype(np.int16)
         if i % 2 == 0 else
         (300 * rng.standard_normal(n_chunks * T * FRAME_SIZE))
         .astype(np.int16)
         for i in range(S)])

    model = RNNoise(model_params)
    ref = StreamingEngine(S, model, chunk_frames=T)
    for _ in range(S):
        ref.attach()
    ref.pool.push_all(sigs)
    for _ in range(n_chunks):
        ref.tick()
    ref_out, ref_full = ref.pool.pull_all(n_chunks * T * FRAME_SIZE)
    assert ref_full == S

    eng = FanoutEngine(S, model, chunk_frames=T, n_workers=2)
    try:
        assert eng.attach_all() == S
        eng.push_all(sigs)
        for _ in range(n_chunks):
            assert eng.tick() == S
        out, full = eng.pull_all(n_chunks * T * FRAME_SIZE)
        assert full == S
        np.testing.assert_array_equal(out, ref_out)
    finally:
        eng.close()
