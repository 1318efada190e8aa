"""Fused Pallas compute_rnn kernel vs the XLA implementation (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnoise_tpu.config import RuntimeConfig
from rnnoise_tpu.models.rnn import compute_rnn, init_rnn_state
from rnnoise_tpu.nn.pallas_rnn import compute_rnn_pallas, pack_params


def test_pallas_rnn_matches_xla(model_params, rng):
    packed = pack_params(model_params)
    rt = RuntimeConfig(quantized=True, approx_act=True)
    S = 8
    state_a = init_rnn_state(S)
    state_b = init_rnn_state(S)
    for t in range(5):
        feats = jnp.asarray(rng.normal(0, 2, (S, 65)), jnp.float32)
        state_a, g_a, v_a = compute_rnn(model_params, state_a, feats, rt)
        state_b, g_b, v_b = compute_rnn_pallas(packed, state_b, feats,
                                               block=8, interpret=True)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                                   atol=1e-5, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-5)
        for la, lb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5)


def test_factored_dft_matches_direct(rng):
    """Two-stage factored DFT kernel (interpret mode) vs the direct
    transform."""
    import jax.numpy as jnp
    from rnnoise_tpu.dsp import transform as tr
    from rnnoise_tpu.dsp.pallas_dft import factored_forward_transform

    x = jnp.asarray(3000 * rng.standard_normal((8, 960)), jnp.float32)
    X1 = np.asarray(factored_forward_transform(x, windowed=True, block=8,
                                               interpret=True))
    try:
        tr.set_dft_mode("fft")
        X2 = np.asarray(tr.forward_transform(tr.apply_window(x)))
    finally:
        tr.set_dft_mode("auto")
    np.testing.assert_allclose(X1, X2, atol=3e-6 * np.abs(X2).max())
