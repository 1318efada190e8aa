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
