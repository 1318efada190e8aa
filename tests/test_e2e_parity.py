"""End-to-end parity: feature extraction and the full rnnoise_process_frame
pipeline vs the C reference, over multi-second streams."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
from rnnoise_tpu.denoise import (compute_frame_features, init_state,
                                 process_frame, process_frames)

from tests.conftest import speechlike


def _make_signal(rng, n_frames):
    """Speech-like signal with a silent stretch and a noise-only stretch."""
    n = n_frames * FRAME_SIZE
    sig = speechlike(rng, n, f0=120.0, noise=0.08)
    third = n // 3
    span = min(10 * FRAME_SIZE, third)
    sig[third:third + span] *= 0.0001                   # near-silence
    sig[2 * third:2 * third + span] = \
        (500 * rng.standard_normal(span)).astype(np.float32)
    return sig


def test_frame_features_parity(oracle_int8, rng):
    """Features (65-dim), band data and the silence gate stay in lock-step
    with C across 100 frames of stateful streaming."""
    n_frames = 100
    sig = _make_signal(rng, n_frames)
    st_c = oracle_int8.create_state()
    state = init_state(1)

    step = jax.jit(lambda s, x: compute_frame_features(s, x))
    n_pitch_mismatch = 0
    for f in range(n_frames):
        x = sig[f * FRAME_SIZE:(f + 1) * FRAME_SIZE]
        ref = st_c.frame_features(x)
        state, ff = step(state, jnp.asarray(x)[None])
        feats_j = np.asarray(ff.features)[0]
        sil_j = bool(np.asarray(ff.silence)[0])

        assert sil_j == ref["silence"], f"frame {f}: silence gate diverged"
        if int(np.asarray(state.last_period)[0]) != ref["last_period"]:
            n_pitch_mismatch += 1
            continue
        np.testing.assert_allclose(np.asarray(ff.Ex)[0], ref["Ex"],
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"frame {f} Ex")
        np.testing.assert_allclose(feats_j, ref["features"],
                                   atol=5e-3, err_msg=f"frame {f} features")
    assert n_pitch_mismatch <= 2


@pytest.mark.parametrize("variant,quantized", [("int8", True), ("float", False)])
def test_process_frame_parity(variant, quantized, model_params, rng, request):
    """Full pipeline: output PCM within a few LSB, VAD within 2e-3."""
    oracle = request.getfixturevalue(f"oracle_{variant}")
    rt = RuntimeConfig(quantized=quantized)
    n_frames = 150
    sig = _make_signal(rng, n_frames)

    st_c = oracle.create_state()
    state = init_state(1)
    step = jax.jit(lambda s, x: process_frame(model_params, s, x, rt))

    max_pcm = max_vad = 0.0
    for f in range(n_frames):
        x = sig[f * FRAME_SIZE:(f + 1) * FRAME_SIZE]
        out_c, vad_c = st_c.process_frame(x)
        state, out_j, vad_j = step(state, jnp.asarray(x)[None])
        pcm_err = np.abs(np.asarray(out_j)[0] - out_c).max()
        vad_err = abs(float(np.asarray(vad_j)[0]) - vad_c)
        max_pcm = max(max_pcm, pcm_err)
        max_vad = max(max_vad, vad_err)
    assert max_pcm < 4.0, f"PCM diverged: {max_pcm} LSB"
    assert max_vad < 2e-3, f"VAD diverged: {max_vad}"


def test_process_frames_chunked_equals_framewise(model_params, rng):
    """scan-over-T chunk processing == frame-by-frame calls."""
    rt = RuntimeConfig()
    sig = _make_signal(rng, 20).reshape(1, 20, FRAME_SIZE)
    s1 = init_state(1)
    s2 = init_state(1)
    outs = []
    for f in range(20):
        s1, o, v = process_frame(model_params, s1, jnp.asarray(sig[:, f]), rt)
        outs.append(np.asarray(o))
    s2, out2, vad2 = process_frames(model_params, s2, jnp.asarray(sig), rt)
    # XLA tiles the scanned vs single-frame graphs differently; sub-LSB only.
    np.testing.assert_allclose(np.stack(outs, axis=1), np.asarray(out2),
                               atol=0.5)


def test_multi_stream_independence(model_params, rng):
    """Streams in one batch don't interact: batch of 3 distinct signals ==
    3 separate single-stream runs."""
    rt = RuntimeConfig()
    sigs = np.stack([_make_signal(np.random.default_rng(i), 12) for i in range(3)])
    sigs = sigs.reshape(3, 12, FRAME_SIZE)
    sb = init_state(3)
    sb, outb, vadb = process_frames(model_params, sb, jnp.asarray(sigs), rt)
    for i in range(3):
        s1 = init_state(1)
        s1, o1, v1 = process_frames(model_params, s1, jnp.asarray(sigs[i:i+1]), rt)
        np.testing.assert_allclose(np.asarray(outb)[i], np.asarray(o1)[0],
                                   atol=1.0)


def test_time_major_entry_matches_stream_major(model_params, rng):
    """process_frames_tm([T, S, ...]) == process_frames([S, T, ...])."""
    from rnnoise_tpu.denoise import process_frames_tm
    rt = RuntimeConfig()
    sig = _make_signal(rng, 12).reshape(1, 12, FRAME_SIZE)
    sig = np.concatenate([sig, 0.5 * sig])              # 2 streams
    s1, out1, vad1 = process_frames(model_params, init_state(2),
                                    jnp.asarray(sig), rt)
    s2, out2, vad2 = process_frames_tm(model_params, init_state(2),
                                       jnp.asarray(sig.swapaxes(0, 1)), rt)
    np.testing.assert_array_equal(np.asarray(out1),
                                  np.asarray(out2).swapaxes(0, 1))
    np.testing.assert_array_equal(np.asarray(vad1),
                                  np.asarray(vad2).swapaxes(0, 1))
