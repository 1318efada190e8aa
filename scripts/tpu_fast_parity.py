#!/usr/bin/env python
"""Validate the TPU fast-dot (BF16_BF16_F32_X3) pipeline against exact f32.

The CPU parity suite proves the exact-f32 pipeline matches the C reference
(gains < 1e-3, PCM <= 4 LSB over 150 stateful frames).  On TPU the DFT/band
matmuls default to the three-pass bf16 algorithm (transform._DFT_PRECISION);
this script runs the full stateful pipeline both ways ON THE CHIP and reports
the max deltas, which must be far inside the C-parity budget:

  gains delta  < 1e-4   (budget 1e-3)
  PCM delta    < 1 LSB  (budget 4 LSB)
  VAD delta    < 1e-4

Run: python scripts/tpu_fast_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
from rnnoise_tpu.denoise import init_state, process_frames
from rnnoise_tpu.dsp import transform


def speechlike(rng, n, f0=110.0, fs=48000.0, noise=0.05):
    t = np.arange(n) / fs
    sig = np.zeros(n)
    for k in range(1, 12):
        sig += (1.0 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28))
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
    sig += noise * rng.standard_normal(n)
    return (3000.0 * sig).astype(np.float32)


def run(mode, params, pcm, rt):
    from rnnoise_tpu import denoise
    from rnnoise_tpu.dsp import pallas_spectral
    # "x3" = the production TPU fast path incl. the fused Pallas kernels;
    # "f32" = the exact reference formulation (XLA ops, six-pass f32 dots);
    # "mono" = the whole-frame monokernel (T-grid pallas) on the x3 consts.
    transform.set_dft_precision("f32" if mode == "f32" else "x3")
    pallas_spectral.set_fused("off" if mode == "f32" else "auto")
    denoise.set_monokernel("on" if mode == "mono" else "off")
    try:
        state = init_state(pcm.shape[0])
        if mode == "mono":
            assert denoise._monokernel_viable(
                params, state, pcm.shape[0], rt), \
                "monokernel dispatch would not engage — fix the config"
        fn = jax.jit(lambda st, x: process_frames(params, st, x, rt))
        st, out, vad = fn(state, pcm)
    finally:
        denoise.set_monokernel("off")
    return np.asarray(out), np.asarray(vad)


def main():
    from __graft_entry__ import _demo_params
    assert jax.default_backend() == "tpu", \
        f"needs a TPU (got {jax.default_backend()}); the X3 preset is TPU-only"

    params = _demo_params()
    rt = RuntimeConfig(quantized=True)
    rng = np.random.default_rng(7)
    S, T = 128, 150          # S=128: smallest monokernel-viable stream count
    pcm = np.stack([
        speechlike(np.random.default_rng(i), T * FRAME_SIZE).reshape(
            T, FRAME_SIZE) +
        (100.0 * np.random.default_rng(100 + i).standard_normal(
            T * FRAME_SIZE)).reshape(T, FRAME_SIZE).astype(np.float32)
        for i in range(S)])
    pcm = jnp.asarray(pcm, jnp.float32)

    from rnnoise_tpu.dsp import pallas_spectral
    try:
        out_x3, vad_x3 = run("x3", params, pcm, rt)
        out_f32, vad_f32 = run("f32", params, pcm, rt)
        out_m, vad_m = run("mono", params, pcm, rt)
    finally:
        transform.set_dft_precision("auto")
        pallas_spectral.set_fused("auto")

    pcm_delta = np.abs(out_x3 - out_f32).max()
    vad_delta = np.abs(vad_x3 - vad_f32).max()
    print(f"PCM max delta: {pcm_delta:.4f} LSB (budget: 4 from C parity; "
          f"gate: < 2.0)")
    print(f"VAD max delta: {vad_delta:.2e} (gate: < 1e-4)")
    # monokernel vs exact f32, same gates
    pcm_delta_m = np.abs(out_m - out_f32).max()
    vad_delta_m = np.abs(vad_m - vad_f32).max()
    print(f"mono PCM max delta: {pcm_delta_m:.4f} LSB (gate: < 2.0)")
    print(f"mono VAD max delta: {vad_delta_m:.2e} (gate: < 1e-4)")
    ok = (pcm_delta < 2.0 and vad_delta < 1e-4
          and pcm_delta_m < 2.0 and vad_delta_m < 1e-4)
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
