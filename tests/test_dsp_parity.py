"""Golden-vector parity of the DSP primitives vs the reference C oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from rnnoise_tpu import tables
from rnnoise_tpu.config import FRAME_SIZE, FREQ_SIZE, NB_BANDS, WINDOW_SIZE
from rnnoise_tpu.dsp import biquad as biquad_mod
from rnnoise_tpu.dsp import transform as tr


def test_window_parity(oracle_int8, rng):
    x = rng.standard_normal(WINDOW_SIZE).astype(np.float32)
    ours = np.asarray(tr.apply_window(jnp.asarray(x)))
    ref = oracle_int8.apply_window(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_dct_parity(oracle_int8, rng):
    x = rng.standard_normal(NB_BANDS).astype(np.float32)
    ours = np.asarray(tr.dct(jnp.asarray(x)))
    ref = oracle_int8.dct(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_forward_transform_parity(oracle_int8, rng):
    x = (3000 * rng.standard_normal(WINDOW_SIZE)).astype(np.float32)
    ours = np.asarray(tr.forward_transform(jnp.asarray(x)))
    ref = oracle_int8.forward_transform(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-6 * scale)


def test_inverse_transform_parity(oracle_int8, rng):
    X = (rng.standard_normal(FREQ_SIZE) + 1j * rng.standard_normal(FREQ_SIZE)
         ).astype(np.complex64)
    X[0] = X[0].real
    # bin 480 imaginary part is ignored by the conjugate-symmetric extension
    X[-1] = X[-1].real
    ours = np.asarray(tr.inverse_transform(jnp.asarray(X)))
    ref = oracle_int8.inverse_transform(X)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-6 * scale)


def test_roundtrip_reconstruction():
    """OLA with unity gains reconstructs the input (Princen-Bradley)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(WINDOW_SIZE).astype(np.float32)
    X = tr.forward_transform(tr.apply_window(jnp.asarray(x)))
    y = np.asarray(tr.apply_window(tr.inverse_transform(X)))
    w = np.asarray(tables.full_window())
    np.testing.assert_allclose(y, x * w * w, rtol=1e-4, atol=1e-5)


def test_band_energy_parity(oracle_int8, rng):
    X = (rng.standard_normal(FREQ_SIZE) + 1j * rng.standard_normal(FREQ_SIZE)
         ).astype(np.complex64)
    ours = np.asarray(tr.compute_band_energy(jnp.asarray(X)))
    ref = oracle_int8.band_energy(X)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_band_corr_parity(oracle_int8, rng):
    X = (rng.standard_normal(FREQ_SIZE) + 1j * rng.standard_normal(FREQ_SIZE)
         ).astype(np.complex64)
    P = (rng.standard_normal(FREQ_SIZE) + 1j * rng.standard_normal(FREQ_SIZE)
         ).astype(np.complex64)
    ours = np.asarray(tr.compute_band_corr(jnp.asarray(X), jnp.asarray(P)))
    ref = oracle_int8.band_corr(X, P)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_interp_band_gain_parity(oracle_int8, rng):
    bandE = rng.uniform(0, 1, NB_BANDS).astype(np.float32)
    ours = np.asarray(tr.interp_band_gain(jnp.asarray(bandE)))
    ref = oracle_int8.interp_band_gain(bandE)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    assert np.all(ours[401:] == 0.0)   # 20 kHz brick wall


def test_biquad_parity(oracle_int8, rng):
    x = (3000 * rng.standard_normal(FRAME_SIZE)).astype(np.float32)
    mem = rng.standard_normal(2).astype(np.float32)
    b = np.asarray(tables.BIQUAD_HP_B)
    a = np.asarray(tables.BIQUAD_HP_A)
    ours_y, ours_mem = biquad_mod.biquad(jnp.asarray(x)[None, :],
                                         jnp.asarray(mem)[None, :], b, a)
    ref_y, ref_mem = oracle_int8.biquad(x, mem, b, a)
    # Double-float scan vs C's double-accumulator loop: < 1 int16 LSB.
    np.testing.assert_allclose(np.asarray(ours_y)[0], ref_y, atol=0.5)
    np.testing.assert_allclose(np.asarray(ours_mem)[0], ref_mem, atol=0.5)


def test_biquad_multiframe_stability(oracle_int8, rng):
    """State carried across frames stays in lock-step with C."""
    b = np.asarray(tables.BIQUAD_HP_B)
    a = np.asarray(tables.BIQUAD_HP_A)
    mem_c = np.zeros(2, np.float32)
    mem_j = jnp.zeros((1, 2))
    for _ in range(20):
        x = (3000 * rng.standard_normal(FRAME_SIZE)).astype(np.float32)
        y_j, mem_j = biquad_mod.biquad(jnp.asarray(x)[None, :], mem_j, b, a)
        y_c, mem_c = oracle_int8.biquad(x, mem_c, b, a)
        np.testing.assert_allclose(np.asarray(y_j)[0], y_c, atol=2.0)


def test_dft_matmul_mode_matches_fft(oracle_int8, rng):
    """The MXU DFT-matmul path (default on TPU) matches the FFT path."""
    from rnnoise_tpu.dsp import transform as tr2
    x = (3000 * rng.standard_normal(WINDOW_SIZE)).astype(np.float32)
    try:
        tr2.set_dft_mode("matmul")
        Xm = np.asarray(tr2.forward_transform(jnp.asarray(x)))
        tr2.set_dft_mode("fft")
        Xf = np.asarray(tr2.forward_transform(jnp.asarray(x)))
        np.testing.assert_allclose(Xm, Xf, atol=3e-6 * np.abs(Xf).max())
        X = Xf.astype(np.complex64)
        tr2.set_dft_mode("matmul")
        ym = np.asarray(tr2.inverse_transform(jnp.asarray(X)))
        tr2.set_dft_mode("fft")
        yf = np.asarray(tr2.inverse_transform(jnp.asarray(X)))
        np.testing.assert_allclose(ym, yf, atol=3e-6 * np.abs(yf).max())
    finally:
        tr2.set_dft_mode("auto")


def test_biquad_chunk_bitexact_vs_per_frame(rng):
    """biquad_chunk (the hoisted whole-chunk form used by process_frames)
    must match scanning biquad() per frame to within f32 matmul-tiling
    reassociation (~1 ulp; the state chain itself is bit-identical)."""
    import jax.numpy as jnp
    from rnnoise_tpu.dsp import biquad as bq
    from rnnoise_tpu import tables

    S, T = 4, 7
    x = jnp.asarray(3000 * rng.standard_normal((S, T, 480)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((S, 2)), jnp.float32)
    B, A = tables.BIQUAD_HP_B, tables.BIQUAD_HP_A
    m = mem
    ys = []
    for t in range(T):
        y, m = bq.biquad(x[:, t], m, B, A)
        ys.append(y)
    y_got, m_got = bq.biquad_chunk(x, mem, B, A)
    assert float(jnp.abs(y_got - jnp.stack(ys, 1)).max()) < 0.01   # ~1 ulp
    assert float(jnp.abs(m_got - m).max()) == 0.0
