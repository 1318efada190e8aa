"""Adversarial-input parity fuzzing: extreme/degenerate signals through the
full pipeline vs the C oracle (the rebuild's analogue of the reference's
FUZZING arch-downgrade runs, x86cpu.c:156-161)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
from rnnoise_tpu.denoise import init_state, process_frame

from tests.conftest import speechlike


def _signals(rng):
    """(name, signal, parity) triples.  parity=False marks *perfectly
    periodic* synthetic signals where pitch candidates tie exactly and any
    two float implementations legitimately pick different (equally valid)
    periods — those get sanity bounds instead of PCM parity."""
    n = 40 * FRAME_SIZE
    t = np.arange(n) / 48000.0
    yield "dc_step", np.concatenate([np.full(n // 2, 8000.0),
                                     np.full(n - n // 2, -8000.0)]), True
    yield "full_scale_square",         32767.0 * np.sign(np.sin(2 * np.pi * 97 * t)), False
    yield "impulses", np.where(rng.random(n) < 0.001, 30000.0, 0.0), True
    yield "pure_20k", 10000 * np.sin(2 * np.pi * 20000 * t), False
    yield "pure_60hz", 20000 * np.sin(2 * np.pi * 60 * t), True
    yield "tiny", 0.01 * rng.standard_normal(n), True
    yield "alternating_silence", np.concatenate(
        [speechlike(rng, n // 4), np.zeros(n // 4),
         32000 * np.clip(rng.standard_normal(n // 4), -1, 1),
         np.zeros(n - 3 * (n // 4))]), True
    yield "chirp", 15000 * np.sin(2 * np.pi * (50 + 5000 * t) * t), True


def test_fuzz_pipeline_parity(oracle_int8, model_params, rng):
    """PCM parity is asserted while both sides' silence gates have agreed
    over the pipeline's memory horizon.  Knife-edge signals (e.g. a decaying
    DC step holding total band energy right at the 0.04 silence threshold,
    denoise.c:389) legitimately flip the gate between any two float
    implementations — the C reference itself drifts ~20 LSB from the exact
    filter there — and a flipped gate diverges lastg/RNN/delayed state by
    design.  Gate-divergent stretches are tracked and bounded instead."""
    rt = RuntimeConfig(quantized=True)
    step = jax.jit(lambda s, x: process_frame(model_params, s, x, rt))
    HORIZON = 25          # delayed buffers + 0.6^k gain decay memory
    worst = {}
    for name, sig, parity in _signals(rng):
        sig = np.clip(sig, -32767, 32767).astype(np.float32)
        n_frames = len(sig) // FRAME_SIZE
        st_c = oracle_int8.create_state()
        state = init_state(1)
        max_pcm = 0.0
        agree_run = HORIZON
        n_gate_diverged = 0
        for f in range(n_frames):
            x = sig[f * FRAME_SIZE:(f + 1) * FRAME_SIZE]
            out_c, vad_c = st_c.process_frame(x)
            state, out_j, vad_j = step(state, jnp.asarray(x)[None])
            # vad == 0.0 exactly <=> the silence gate fired
            gate_agree = (vad_c == 0.0) == (float(np.asarray(vad_j)[0]) == 0.0)
            if gate_agree:
                agree_run += 1
            else:
                agree_run = 0
                n_gate_diverged += 1
            if agree_run >= HORIZON:
                max_pcm = max(max_pcm, float(
                    np.abs(np.asarray(out_j)[0] - out_c).max()))
            assert np.isfinite(np.asarray(out_j)).all(), (name, f)
            assert np.abs(np.asarray(out_j)).max() < 65536.0, (name, f)
        worst[name] = round(max_pcm, 3)
        if parity:
            # Stress-input budget: the HP biquad's own f32-vs-double drift
            # reaches ~25 LSB on full-scale DC steps (signal scale ~16000 —
            # 0.2 %); normal signals hold a few LSB (test_e2e_parity).
            assert max_pcm < 32.0, (name, max_pcm)
        assert n_gate_diverged <= 0.5 * n_frames, (name, n_gate_diverged)
    print("worst-case PCM deltas (gate-agreed windows):", worst)
