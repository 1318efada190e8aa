"""State checkpointing, metrics, glu/conv2d unit tests."""

import io

import numpy as np
import jax
import jax.numpy as jnp

from rnnoise_tpu.denoise import init_state, process_frame
from rnnoise_tpu.utils.state_io import load_state, save_state


def test_state_checkpoint_roundtrip(model_params, rng):
    from rnnoise_tpu.config import FRAME_SIZE
    state = init_state(2)
    pcm = jnp.asarray(3000 * rng.standard_normal((2, FRAME_SIZE)), jnp.float32)
    state, out1, _ = process_frame(model_params, state, pcm)
    buf = io.BytesIO()
    save_state(state, buf)
    buf.seek(0)
    restored = load_state(buf)
    # continuing from the restored state gives identical output
    s1, o1, _ = process_frame(model_params, state, pcm)
    s2, o2, _ = process_frame(model_params, restored, pcm)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_glu_and_conv2d_run(rng):
    from rnnoise_tpu.nn.layers import LinearParams, conv2d_step, glu
    W = jnp.asarray(rng.normal(0, .1, (16, 16)), jnp.float32)
    p = LinearParams(weights_f32=W, bias=jnp.zeros(16))
    x = jnp.asarray(rng.normal(0, 1, (3, 16)), jnp.float32)
    y = glu(p, x, quantized=False)
    assert y.shape == x.shape

    w2 = jnp.asarray(rng.normal(0, .1, (4, 2, 3, 3)), jnp.float32)
    mem = jnp.zeros((3, 2, 2, 10))
    xin = jnp.asarray(rng.normal(0, 1, (3, 2, 10)), jnp.float32)
    mem2, out = conv2d_step(w2, jnp.zeros(4), mem, xin, "tanh")
    assert out.shape == (3, 4, 8)
    assert mem2.shape == mem.shape


def test_little_model_higher_sparsity_roundtrip(oracle_int8):
    """'Little'-style blobs (same dims, higher sparsity) interchange freely."""
    import jax
    from rnnoise_tpu.training.model import init_params
    from rnnoise_tpu.training.sparsify import sparsify_step, SPARSIFY_STOP
    from rnnoise_tpu.training.export import export_blob
    from rnnoise_tpu.weights.loader import load_model_bytes

    params = init_params(jax.random.PRNGKey(3))
    params = jax.tree.map(lambda x: 0.4 * x, params)
    params = sparsify_step(params, jnp.asarray(SPARSIFY_STOP + 1))
    blob = export_blob(params, quantize=True)
    ours = load_model_bytes(blob)                      # our loader
    st = oracle_int8.create_state(blob)                # C runtime
    out, _ = st.process_frame(np.zeros(480, np.float32))
    assert np.isfinite(out).all()


def test_checked_process_frames_clean(model_params, rng):
    from rnnoise_tpu.utils.debug import checked_process_frames, numerics_ab
    from rnnoise_tpu.denoise import init_state
    pcm = jnp.asarray(3000 * rng.standard_normal((2, 4, 480)), jnp.float32)
    state, out, vad = checked_process_frames(model_params, init_state(2), pcm)
    assert np.isfinite(np.asarray(out)).all()
    vad_d, pcm_d = numerics_ab(model_params, pcm)
    assert vad_d < 0.05 and pcm_d < 50.0   # int8-vs-float budget
