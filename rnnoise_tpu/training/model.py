"""Trainable sequence-mode RNNoise model (the JAX replacement for
torch/rnnoise/rnnoise.py:58-109).

Parameters are a plain dict pytree of f32 arrays in the same layouts the
inference runtime uses ([in, out] matrices, GRU gate order z, r, n — the
exporter's "C order", wexchange/c_export/common.py:342-353), so exporting and
loading need no transposition games.

Forward semantics match the torch model exactly: two 'valid' Conv1d(k=3) with
tanh (output length T-4), three stacked GRUs via lax.scan, sigmoid gain and
VAD heads on the concat [conv2, gru1, gru2, gru3].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, DEFAULT_MODEL


def init_params(key: jax.Array,
                config: ModelConfig = DEFAULT_MODEL) -> Dict:
    """Torch-equivalent initialisation: U(±1/sqrt(fan_in)) for conv/dense,
    U(±1/sqrt(N)) for GRU weights/biases with orthogonal recurrent matrices
    (reference rnnoise.py:52-56 init_weights)."""
    c, g, f, nb = (config.cond_size, config.gru_size, config.input_dim,
                   config.output_dim)
    k = config.conv_kernel
    keys = iter(jax.random.split(key, 32))

    def unif(shape, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(next(keys), shape, jnp.float32,
                                  -bound, bound)

    def gru(in_dim, n):
        # orthogonal per full [3N, N] recurrent matrix like torch
        w_rec = jax.nn.initializers.orthogonal()(
            next(keys), (3 * n, n), jnp.float32).T    # [N, 3N]
        return dict(
            w_in=unif((in_dim, 3 * n), n),
            b_in=unif((3 * n,), n),
            w_rec=w_rec,
            b_rec=unif((3 * n,), n),
        )

    return dict(
        conv1=dict(w=unif((k * f, c), k * f), b=unif((c,), k * f)),
        conv2=dict(w=unif((k * c, g), k * c), b=unif((g,), k * c)),
        gru1=gru(g, g), gru2=gru(g, g), gru3=gru(g, g),
        dense_out=dict(w=unif((4 * g, nb), 4 * g), b=unif((nb,), 4 * g)),
        vad_dense=dict(w=unif((4 * g, 1), 4 * g), b=unif((1,), 4 * g)),
    )


def _conv_valid(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x: [B, T, C] -> tanh(conv1d_valid(x)) [B, T-2, O]; weight rows are
    time-major oldest-first ([x_{t-2}, x_{t-1}, x_t] per output frame)."""
    T = x.shape[1]
    xw = jnp.concatenate([x[:, 0:T - 2], x[:, 1:T - 1], x[:, 2:T]], axis=-1)
    return jnp.tanh(jnp.dot(xw, w, precision="float32") + b)


def _gru_seq(p: Dict, x: jax.Array, h0: jax.Array,
             remat: bool = False) -> Tuple[jax.Array, jax.Array]:
    """x: [B, T, in], h0: [B, N] -> (outputs [B, T, N], h_T [B, N]).

    Gate order z, r, n:  h' = z*h + (1-z)*tanh(xn + r*hn).

    ``remat`` rematerialises gate activations in the backward pass (only the
    [B, T, N] hidden states are stored) — the default 128x2000-frame BPTT
    would otherwise hold ~6 GB of gate activations."""
    N = h0.shape[-1]
    xz = jnp.dot(x, p["w_in"], precision="float32") + p["b_in"]                   # [B, T, 3N] (precomputed)

    def step(h, xzt):
        rec = jnp.dot(h, p["w_rec"], precision="float32") + p["b_rec"]
        z = jax.nn.sigmoid(xzt[:, :N] + rec[:, :N])
        r = jax.nn.sigmoid(xzt[:, N:2 * N] + rec[:, N:2 * N])
        n = jnp.tanh(xzt[:, 2 * N:] + r * rec[:, 2 * N:])
        h = z * h + (1.0 - z) * n
        return h, h

    if remat:
        step = jax.checkpoint(step)
    # unroll amortises scan overhead over the 2000-step BPTT without
    # changing numerics
    hT, ys = jax.lax.scan(step, h0, jnp.moveaxis(xz, 1, 0), unroll=8)
    return jnp.moveaxis(ys, 0, 1), hT


def forward(params: Dict, features: jax.Array,
            states: Optional[Tuple] = None, remat: bool = False):
    """features: [B, T, 65] -> (gain [B, T-4, 32], vad [B, T-4, 1], states).

    Mirrors RNNoise.forward (torch/rnnoise/rnnoise.py:86-109)."""
    B = features.shape[0]
    N = params["gru1"]["w_rec"].shape[0]
    if states is None:
        states = tuple(jnp.zeros((B, N), jnp.float32) for _ in range(3))

    c1 = _conv_valid(features, params["conv1"]["w"], params["conv1"]["b"])
    c2 = _conv_valid(c1, params["conv2"]["w"], params["conv2"]["b"])
    g1, h1 = _gru_seq(params["gru1"], c2, states[0], remat)
    g2, h2 = _gru_seq(params["gru2"], g1, states[1], remat)
    g3, h3 = _gru_seq(params["gru3"], g2, states[2], remat)
    cat = jnp.concatenate([c2, g1, g2, g3], axis=-1)
    gain = jax.nn.sigmoid(jnp.dot(cat, params["dense_out"]["w"],
                                  precision="float32")
                          + params["dense_out"]["b"])
    vad = jax.nn.sigmoid(jnp.dot(cat, params["vad_dense"]["w"],
                                 precision="float32")
                         + params["vad_dense"]["b"])
    return gain, vad, (h1, h2, h3)
