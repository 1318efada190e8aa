"""Parity of the NN runtime (conv/GRU/dense, float and int8 numerics) against
the reference compute_rnn, using the weights exported by the reference's own
exporter (loaded from weights_blob.bin)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import NB_FEATURES, RuntimeConfig
from rnnoise_tpu.models.rnn import compute_rnn, init_rnn_state
from rnnoise_tpu.nn.layers import sigmoid_approx, tanh_approx


def _feature_stream(rng, n_frames):
    """Feature vectors with realistic ranges (BFCCs ~ [-15, 10], corr DCT
    ~ [-2, 2], pitch ~ [-2.4, 4.7])."""
    f = rng.normal(0, 2.0, (n_frames, NB_FEATURES)).astype(np.float32)
    f[:, 0] += rng.uniform(-12, 2, n_frames)
    f[:, 64] = rng.uniform(-2.4, 4.7, n_frames)
    return f


def test_tanh_approx_matches_c_definition():
    # The rational approximation *is* the spec (vec.h:337-351); sanity-check
    # against true tanh within its documented accuracy.
    x = np.linspace(-8, 8, 2001, dtype=np.float32)
    ours = np.asarray(tanh_approx(jnp.asarray(x)))
    assert np.abs(ours - np.tanh(x)).max() < 3e-4
    assert np.all(ours <= 1.0) and np.all(ours >= -1.0)


@pytest.mark.parametrize("variant,quantized", [("float", False), ("int8", True)])
def test_compute_rnn_parity(variant, quantized, model_params, rng, request):
    oracle = request.getfixturevalue(f"oracle_{variant}")
    rt = RuntimeConfig(quantized=quantized, approx_act=True)
    feats = _feature_stream(rng, 50)

    st_c = oracle.create_state()
    state = init_rnn_state(1)
    step = jax.jit(lambda s, f: compute_rnn(model_params, s, f, rt))

    max_gain_err = 0.0
    for t in range(feats.shape[0]):
        g_c, vad_c = st_c.compute_rnn(feats[t])
        state, g_j, vad_j = step(state, jnp.asarray(feats[t])[None])
        g_j = np.asarray(g_j)[0]
        max_gain_err = max(max_gain_err, np.abs(g_j - g_c).max())
        assert abs(float(np.asarray(vad_j)[0]) - vad_c) < 2e-3
    # Driver target: per-band gains within 1e-3 of the C reference.
    assert max_gain_err < 1e-3, f"max gain err {max_gain_err}"


def test_batch_of_identical_streams_matches_single(model_params, rng):
    """Multi-stream batching invariance (SURVEY.md §4 implication d)."""
    rt = RuntimeConfig()
    feats = _feature_stream(rng, 10)
    s1 = init_rnn_state(1)
    s4 = init_rnn_state(4)
    for t in range(10):
        f1 = jnp.asarray(feats[t])[None]
        f4 = jnp.tile(f1, (4, 1))
        s1, g1, v1 = compute_rnn(model_params, s1, f1, rt)
        s4, g4, v4 = compute_rnn(model_params, s4, f4, rt)
        # XLA may tile the matmul differently per batch size, so allow a few
        # ulps rather than bitwise equality.
        np.testing.assert_allclose(np.asarray(g4),
                                   np.tile(np.asarray(g1), (4, 1)), atol=1e-6)


def test_gain_range(model_params, rng):
    rt = RuntimeConfig()
    state = init_rnn_state(2)
    f = jnp.asarray(_feature_stream(rng, 2))
    state, g, vad = compute_rnn(model_params, state, f, rt)
    assert np.all(np.asarray(g) >= 0) and np.all(np.asarray(g) <= 1)
    assert np.all(np.asarray(vad) >= 0) and np.all(np.asarray(vad) <= 1)


def test_activation_set_matches_c_runtime(oracle_int8):
    """Full compute_activation_c set (src/nnet_arch.h:79-125): linear,
    sigmoid, tanh, relu, softmax (normalised lpcnet_exp — SOFTMAX_HACK is
    NOT defined in the nnet_default.c TU), swish.  Exact match expected:
    every op is rational-polynomial / bit-trick arithmetic."""
    from rnnoise_tpu.nn.layers import apply_activation, lpcnet_exp

    x = np.concatenate([
        np.linspace(-20, 20, 801, dtype=np.float32),
        np.array([-1e-30, 1e-30, -0.0, 0.0, -87.0, 87.0], np.float32),
    ])
    # swish = x * sigmoid_approx(x): gcc contracts the rational polynomial to
    # FMAs (-ffp-contract=fast is its default at -O2), a 1-ulp tanh delta
    # that the |x| factor scales to ~1e-6 absolute at |x|=20.
    codes = {"linear": (0, 2e-7), "sigmoid": (1, 2e-7), "tanh": (2, 2e-7),
             "relu": (3, 2e-7), "softmax": (4, 2e-7), "swish": (5, 2e-6)}
    for name, (code, atol) in codes.items():
        ours = np.asarray(jax.jit(
            lambda v, n=name: apply_activation(v, n, approx=True)
        )(jnp.asarray(x)))
        ref = oracle_int8.compute_activation(x, code)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=atol,
                                   err_msg=name)

    # lpcnet_exp bit-trick itself (vec.h:316-333): ~4e-4 relative accuracy.
    e = np.asarray(lpcnet_exp(jnp.linspace(-30, 10, 1001)))
    np.testing.assert_allclose(e, np.exp(np.linspace(-30, 10, 1001)),
                               rtol=6e-4)
