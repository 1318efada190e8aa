"""Training-stack tests: forward parity with the torch reference model,
byte-exact export vs the reference exporter, loss semantics, sparsifier
densities, and a smoke train loop."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import NB_FEATURES, RuntimeConfig
from rnnoise_tpu.tools.import_torch import load_torch_checkpoint
from rnnoise_tpu.training import export as export_mod
from rnnoise_tpu.training import loss as loss_mod
from rnnoise_tpu.training import sparsify as sp
from rnnoise_tpu.training.model import forward, init_params
from rnnoise_tpu.training.train import make_optimizer, make_train_step

from tests.oracle import build as oracle_build


@pytest.fixture(scope="module")
def torch_params():
    build_dir = oracle_build.build()
    return load_torch_checkpoint(os.path.join(build_dir, "oracle_model.pth"))


def test_forward_matches_torch_reference(torch_params, rng):
    """Our JAX sequence forward == the reference torch RNNoise.forward."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference/torch/rnnoise")
    import rnnoise as torch_rnnoise

    ckpt = torch.load(os.path.join(oracle_build.build(), "oracle_model.pth"),
                      map_location="cpu", weights_only=False)
    tm = torch_rnnoise.RNNoise(**ckpt["model_kwargs"])
    tm.load_state_dict(ckpt["state_dict"], strict=False)
    tm.eval()

    feats = rng.normal(0, 1.5, (2, 50, NB_FEATURES)).astype(np.float32)
    with torch.no_grad():
        tg, tv, _ = tm(torch.from_numpy(feats))
    params = jax.tree.map(jnp.asarray, torch_params)
    jg, jv, _ = forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(jg), tg.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-5)


def test_export_blob_byte_identical_to_reference(torch_params, weights_blob):
    """Our exporter reproduces the reference toolchain's weights_blob.bin
    byte for byte (same torch checkpoint through both pipelines)."""
    ours = export_mod.export_blob(torch_params, quantize=True)
    assert ours == weights_blob


def test_exported_blob_loads_into_c_runtime(oracle_int8, rng):
    """A model trained+exported by *this* framework runs in the reference C
    runtime via rnnoise_model_from_buffer, and matches our own runtime."""
    from rnnoise_tpu.config import FRAME_SIZE
    from rnnoise_tpu.denoise import init_state, process_frame
    from rnnoise_tpu.weights.loader import load_model_bytes
    from tests.conftest import speechlike

    params = init_params(jax.random.PRNGKey(7))
    # shrink weights so activations are sane for an untrained net
    params = jax.tree.map(lambda x: 0.5 * x, params)
    blob = export_mod.export_blob(params, quantize=True)

    st_c = oracle_int8.create_state(blob)
    inf_params = load_model_bytes(blob)
    state = init_state(1)
    rt = RuntimeConfig(quantized=True)
    sig = speechlike(np.random.default_rng(3), 30 * FRAME_SIZE)
    step = jax.jit(lambda s, x: process_frame(inf_params, s, x, rt))
    max_err = 0.0
    for f in range(30):
        x = sig[f * FRAME_SIZE:(f + 1) * FRAME_SIZE]
        out_c, _ = st_c.process_frame(x)
        state, out_j, _ = step(state, jnp.asarray(x)[None])
        max_err = max(max_err, np.abs(np.asarray(out_j)[0] - out_c).max())
    assert max_err < 4.0, f"PCM diverged: {max_err}"


def test_sparsifier_densities():
    params = init_params(jax.random.PRNGKey(0))
    out = sp.sparsify_step(params, jnp.asarray(sp.SPARSIFY_STOP + 1))
    n = params["gru1"]["w_rec"].shape[0]
    for g in ("gru1", "gru2", "gru3"):
        for wkey in ("w_in", "w_rec"):
            w = np.asarray(out[g][wkey])
            for i, gate in enumerate("zrn"):
                target = sp.SPARSE_DENSITIES[gate]
                blk = w[:, i * n:(i + 1) * n]
                if wkey == "w_rec":
                    blk = blk - np.diag(np.diag(blk))
                blocks = blk.reshape(n // 4, 4, n // 8, 8)
                nz = np.abs(blocks).sum(axis=(1, 3)) > 0
                density = nz.mean()
                assert abs(density - target) < 0.02, (g, wkey, gate, density)
    # off-schedule step: unchanged
    same = sp.sparsify_step(params, jnp.asarray(sp.SPARSIFY_START + 1))
    for a, b in zip(jax.tree.leaves(same), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_runs_and_reduces_loss(rng):
    params = init_params(jax.random.PRNGKey(1))
    opt = make_optimizer(lr=3e-3)
    opt_state = opt.init(params)
    step_fn = make_train_step(opt, sparse=True)

    B, T = 4, 40
    feats = rng.normal(0, 1.5, (B, T, NB_FEATURES)).astype(np.float32)
    gain = rng.uniform(0, 1, (B, T, 32)).astype(np.float32)
    gain[0, :5] = -1.0                      # some don't-care targets
    vad = (rng.uniform(0, 1, (B, T, 1)) > 0.5).astype(np.float32)
    batch = (jnp.asarray(feats), jnp.asarray(gain), jnp.asarray(vad))

    states = None
    losses = []
    N = params["gru1"]["w_rec"].shape[0]
    states = tuple(jnp.zeros((B, N), jnp.float32) for _ in range(3))
    for i in range(30):
        params, opt_state, states, metrics = step_fn(
            params, opt_state, states, batch, jnp.asarray(i, jnp.int32))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_loss_dont_care_masking():
    g = jnp.asarray([[-1.0, 0.5]])
    assert np.asarray(loss_mod.mask(g)).tolist() == [[0.0, 1.0]]
