"""Native stream pool + streaming engine tests."""

import numpy as np
import pytest

from rnnoise_tpu.config import FRAME_SIZE


def test_pool_ring_roundtrip():
    from rnnoise_tpu.runtime.native import StreamPool
    pool = StreamPool(4, ring_frames=8)
    s = pool.attach()
    assert s == 0
    pcm = (np.arange(960) - 480).astype(np.int16)
    assert pool.push(s, pcm) == 960
    batch, counts, reset = pool.assemble(2)
    assert counts[0] == 2 and reset[0] == 1
    assert counts[1] == 0
    np.testing.assert_array_equal(batch[0].reshape(-1), pcm.astype(np.float32))
    pool.commit(2, batch, counts)
    out = pool.pull(s, 960)
    np.testing.assert_array_equal(out, pcm)
    # second assemble: no reset flag, no data
    batch, counts, reset = pool.assemble(2)
    assert reset[0] == 0 and counts[0] == 0


def test_tm_i16_burst_paths_match_fifo_model():
    """The TM-i16 assemble/commit paths move whole frame bursts with one
    bookkeeping update per slot (streamio.cc pop/push_frames_strided).  Drive
    the wrap and truncation corners — sample-level pushes misalign the ring
    head so bursts split mid-frame, and commits into a full output ring must
    truncate exactly like per-frame pushes (a final partial frame) — against
    a pure-Python FIFO model, with the out= buffer-reuse protocol."""
    from rnnoise_tpu.runtime.native import StreamPool
    S, T, ring_frames = 3, 4, 7          # ring cap 3360: wraps mid-burst
    F = FRAME_SIZE
    cap = ring_frames * F
    pool = StreamPool(S, ring_frames=ring_frames)
    for _ in range(S):
        pool.attach()
    rng = np.random.default_rng(42)
    in_fifo = [np.zeros(0, np.int16) for _ in range(S)]
    out_fifo = [np.zeros(0, np.int16) for _ in range(S)]
    batch = np.empty((T, S, F), np.int16)
    counts = np.empty(S, np.int32)
    reset = np.empty(S, np.uint8)
    for it in range(40):
        for s in range(S):
            # odd-size pushes leave the ring head mid-frame-aligned
            n = int(rng.integers(0, 2 * F))
            pcm = rng.integers(-30000, 30000, n).astype(np.int16)
            space = cap - len(in_fifo[s])
            accepted = pool.push(s, pcm)
            assert accepted == min(n, space)
            in_fifo[s] = np.concatenate([in_fifo[s], pcm[:accepted]])
        b, c, r = pool.assemble_tm_i16(T, out=(batch, counts, reset))
        assert b is batch and c is counts
        for s in range(S):
            want = T if len(in_fifo[s]) // F >= T else 0
            assert counts[s] == want
            if want:
                np.testing.assert_array_equal(
                    batch[:, s].reshape(-1), in_fifo[s][:T * F])
                in_fifo[s] = in_fifo[s][T * F:]
        # commit WITHOUT always pulling: the out ring fills and the burst
        # must truncate at byte granularity (per-frame push semantics)
        pool.commit_tm_i16(T, batch, counts)
        for s in range(S):
            if counts[s]:
                space = cap - len(out_fifo[s])
                put = min(T * F, space)
                out_fifo[s] = np.concatenate(
                    [out_fifo[s], batch[:, s].reshape(-1)[:put]])
        if it % 3 == 0:
            n_pull = int(rng.integers(1, cap))
            for s in range(S):
                got = pool.pull(s, n_pull)
                take = min(n_pull, len(out_fifo[s]))
                assert len(got) == take
                np.testing.assert_array_equal(got, out_fifo[s][:take])
                out_fifo[s] = out_fifo[s][take:]


def test_pool_attach_detach():
    from rnnoise_tpu.runtime.native import StreamPool
    pool = StreamPool(2)
    a, b = pool.attach(), pool.attach()
    assert {a, b} == {0, 1}
    assert pool.attach() == -1
    pool.detach(a)
    assert pool.attach() == a


def test_blob_validate_native(weights_blob):
    from rnnoise_tpu.runtime.native import blob_validate
    names = blob_validate(weights_blob)
    assert "conv1_bias" in names
    assert "gru1_recurrent_weights_idx" in names
    with pytest.raises(ValueError):
        blob_validate(b"JUNK" + weights_blob[4:])


def test_streaming_engine_end_to_end(model_params):
    from rnnoise_tpu.api import RNNoise
    from rnnoise_tpu.runtime.engine import StreamingEngine
    from rnnoise_tpu.denoise import init_state, process_frames
    from tests.conftest import speechlike
    import jax.numpy as jnp

    model = RNNoise(model_params)
    eng = StreamingEngine(4, model, chunk_frames=2)
    s0 = eng.attach()
    s1 = eng.attach()
    rng = np.random.default_rng(0)
    sig0 = speechlike(rng, 8 * FRAME_SIZE).astype(np.int16)
    sig1 = (300 * rng.standard_normal(8 * FRAME_SIZE)).astype(np.int16)
    eng.push(s0, sig0)
    eng.push(s1, sig1)
    total0 = b""
    for _ in range(4):
        eng.tick()
    out0 = eng.pull(s0, 8 * FRAME_SIZE)
    assert out0.shape[0] == 8 * FRAME_SIZE

    # reference: plain batched pipeline on the same signal
    st = init_state(1)
    st, ref, _ = process_frames(
        model_params, st,
        jnp.asarray(sig0.astype(np.float32).reshape(1, 8, FRAME_SIZE)))
    ref = np.clip(np.round(np.asarray(ref).reshape(-1)), -32768, 32767)
    np.testing.assert_allclose(out0.astype(np.float64), ref, atol=1.5)


def test_streaming_engine_starved_stream_state_freeze(model_params):
    """A stream with no queued audio must not advance its device state."""
    from rnnoise_tpu.api import RNNoise
    from rnnoise_tpu.runtime.engine import StreamingEngine

    model = RNNoise(model_params)
    eng = StreamingEngine(2, model, chunk_frames=2)
    s0 = eng.attach()
    rng = np.random.default_rng(1)
    pcm = (3000 * rng.standard_normal(4 * FRAME_SIZE)).astype(np.int16)
    eng.push(s0, pcm)
    eng.tick()
    st_before = np.asarray(eng.state.pitch_buf[1])      # inactive slot 1
    eng.tick()
    st_after = np.asarray(eng.state.pitch_buf[1])
    np.testing.assert_array_equal(st_before, st_after)


def test_partial_chunk_ordering_preserved(model_params):
    """A slot holding fewer than chunk_frames frames (plus a fractional
    frame) must not advance, and later pushes must stay in order."""
    from rnnoise_tpu.api import RNNoise
    from rnnoise_tpu.runtime.engine import StreamingEngine

    eng = StreamingEngine(2, RNNoise(model_params), chunk_frames=4)
    s = eng.attach()
    sig = np.arange(1, 6 * FRAME_SIZE + 101, dtype=np.int32)
    sig = (sig % 1000).astype(np.int16)
    eng.push(s, sig[:3 * FRAME_SIZE + 100])     # 3 frames + fraction
    assert eng.tick() == 0                       # nothing advances
    eng.push(s, sig[3 * FRAME_SIZE + 100:])     # complete the stream
    assert eng.tick() == 1                       # one chunk of 4 processed
    eng.tick()                                   # second... only 2 frames left
    # reference run over the same contiguous signal
    from rnnoise_tpu.denoise import init_state, process_frames
    import jax.numpy as jnp
    st = init_state(1)
    st, ref, _ = process_frames(
        model_params, st,
        jnp.asarray(sig[:4 * FRAME_SIZE].astype(np.float32)
                    .reshape(1, 4, FRAME_SIZE)))
    got = eng.pull(s, 4 * FRAME_SIZE).astype(np.float64)
    ref = np.clip(np.round(np.asarray(ref).reshape(-1)), -32768, 32767)
    np.testing.assert_allclose(got, ref, atol=1.5)


def test_streaming_engine_pipelined_matches_direct(model_params):
    """pipelined=True must produce the same per-stream output as the direct
    engine, one tick later: tick() commits the PREVIOUS chunk while the
    device computes the current one, and flush() drains the last one."""
    from rnnoise_tpu.api import RNNoise
    from rnnoise_tpu.runtime.engine import StreamingEngine

    rng = np.random.default_rng(11)
    n_chunks, T = 3, 4
    sig = (3000 * rng.standard_normal(n_chunks * T * FRAME_SIZE)).astype(
        np.int16)

    def run(pipelined):
        eng = StreamingEngine(2, RNNoise(model_params), chunk_frames=T,
                              pipelined=pipelined)
        s = eng.attach()
        advanced = []
        for c in range(n_chunks):
            eng.push(s, sig[c * T * FRAME_SIZE:(c + 1) * T * FRAME_SIZE])
            advanced.append(eng.tick())
        if pipelined:
            advanced.append(eng.flush())
        out = eng.pull(s, n_chunks * T * FRAME_SIZE)
        return advanced, out

    adv_d, out_d = run(False)
    adv_p, out_p = run(True)
    assert adv_d == [1, 1, 1]
    # pipelined: first tick commits nothing, flush drains the last chunk
    assert adv_p == [0, 1, 1, 1]
    np.testing.assert_array_equal(out_p, out_d)
    # flush with nothing pending is a no-op
    eng = StreamingEngine(1, RNNoise(model_params), chunk_frames=T,
                          pipelined=True)
    assert eng.flush() == 0
