"""Full-workflow test: synthetic corpora -> dump_features -> train ->
quantised export -> batched inference, at a small custom model size
(exercises non-default ModelConfig end to end)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import FRAME_SIZE, ModelConfig, RuntimeConfig
from tests.conftest import speechlike

SEQ_LEN = 200
SMALL = ModelConfig(cond_size=32, gru_size=64)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpora")
    rng = np.random.default_rng(0)
    n = 48000 * 30
    speech = np.concatenate([
        speechlike(rng, n // 3, f0=f0, noise=0.02) for f0 in (100, 150, 220)])
    # gate speech so the VAD sees pauses
    for i in range(0, len(speech), 48000):
        speech[i + 24000:i + 48000] *= 0.001
    noise = 2000 * rng.standard_normal(n)
    t = np.arange(n)
    fg = np.zeros(n)
    fg[rng.integers(0, n, 2000)] = 20000.0
    for name, sig in (("speech", speech), ("noise", noise), ("fg", fg)):
        np.clip(sig, -32767, 32767).astype("<i2").tofile(d / f"{name}.pcm")
    return d


@pytest.fixture(scope="module")
def features_file(corpora, tmp_path_factory):
    from rnnoise_tpu.tools.dump_features import dump_features
    out = tmp_path_factory.mktemp("feat") / "features.f32"
    dump_features(str(corpora / "speech.pcm"), str(corpora / "noise.pcm"),
                  str(corpora / "fg.pcm"), str(out), count=24, batch=8,
                  seed=1, seq_len=SEQ_LEN)
    return str(out)


def test_features_file_sane(features_file):
    data = np.fromfile(features_file, dtype=np.float32).reshape(-1, 98)
    assert data.shape[0] == 24 * SEQ_LEN
    feats, gains, vad = data[:, :65], data[:, 65:97], data[:, 97]
    assert np.isfinite(feats).all()
    # gains are in [0, 1] or the -1 don't-care marker
    ok = (gains == -1) | ((gains >= 0) & (gains <= 1 + 1e-6))
    assert ok.all()
    assert set(np.unique(vad)).issubset({0.0, 1.0})
    assert 0.05 < vad.mean() < 0.95          # both classes present
    assert (gains == -1).mean() < 0.9        # real targets exist


def test_train_export_infer_roundtrip(features_file, tmp_path):
    from rnnoise_tpu.training.data import RNNoiseDataset
    from rnnoise_tpu.training.export import export_blob
    from rnnoise_tpu.training.model import forward, init_params
    from rnnoise_tpu.training.train import make_optimizer, make_train_step
    from rnnoise_tpu.training.loss import rnnoise_loss
    from rnnoise_tpu.weights.loader import load_model_bytes
    from rnnoise_tpu.models.rnn import compute_rnn, init_rnn_state

    ds = RNNoiseDataset(features_file, SEQ_LEN)
    assert len(ds) == 24
    feats, gain, vad = ds.batch(np.arange(16))
    ef, eg, ev = ds.batch(np.arange(16, 24))       # held-out

    params = init_params(jax.random.PRNGKey(0), SMALL)
    opt = make_optimizer(lr=3e-3)
    opt_state = opt.init(params)
    step_fn = make_train_step(opt, sparse=False)

    def eval_loss(p):
        pg, pv, _ = forward(p, jnp.asarray(ef))
        loss, _ = rnnoise_loss(pg, pv, jnp.asarray(eg)[:, 3:-1],
                               jnp.asarray(ev)[:, 3:-1])
        return float(loss)

    loss0 = eval_loss(params)
    batch = (jnp.asarray(feats), jnp.asarray(gain), jnp.asarray(vad))
    N = SMALL.gru_size
    states = tuple(jnp.zeros((16, N), jnp.float32) for _ in range(3))
    first = None
    for i in range(150):
        params, opt_state, states, metrics = step_fn(
            params, opt_state, states, batch, jnp.asarray(i, jnp.int32))
        if first is None:
            first = float(metrics["loss"])
    trained = eval_loss(params)
    assert trained < 0.7 * loss0, (loss0, trained)

    # quantised export -> inference runtime, same features
    blob = export_blob(params, quantize=True)
    inf_params = load_model_bytes(blob, SMALL)
    tg, tv, _ = forward(params, jnp.asarray(ef))

    outs = {}
    for qmode in (False, True):
        rt = RuntimeConfig(quantized=qmode, approx_act=False)
        st = init_rnn_state(8, SMALL)
        gs = []
        for t in range(SEQ_LEN):
            st, g, v = compute_rnn(inf_params, st, jnp.asarray(ef[:, t]), rt)
            gs.append(np.asarray(g))
        outs[qmode] = np.stack(gs, axis=1)        # [B, T, 32]

    # int8 quantisation error budget on gains (same streaming semantics)
    qerr = np.abs(outs[True] - outs[False]).max()
    assert qerr < 0.05, qerr

    # Streaming inference tracks the training forward closely once the cold
    # start (zero conv/GRU memories — inherent to streaming, same as the C
    # runtime) has washed out: compare the second half of the sequence.
    half = SEQ_LEN // 2
    a = outs[False][:, half + 4:, :].reshape(-1)
    b = np.asarray(tg)[:, half:, :].reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr
    assert np.abs(a - b).mean() < 0.05
