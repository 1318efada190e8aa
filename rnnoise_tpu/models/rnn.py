"""The RNNoise model graph: conv1 -> conv2 -> 3x GRU -> gain/VAD heads.

Replicates compute_rnn (reference src/rnn.c:44-60) over a stream batch:
conv1(tanh) and conv2(tanh) run as conv-as-GEMM with a carried 2-frame shift
register, the three GRUs chain, and the concatenation
[conv2_out, gru1, gru2, gru3] feeds the sigmoid gain and VAD heads.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RuntimeConfig, DEFAULT_MODEL, DEFAULT_RUNTIME
from ..nn.layers import LinearParams, conv1d_step, dense, gru_step


class ModelParams(NamedTuple):
    conv1: LinearParams
    conv2: LinearParams
    gru1_input: LinearParams
    gru1_recurrent: LinearParams
    gru2_input: LinearParams
    gru2_recurrent: LinearParams
    gru3_input: LinearParams
    gru3_recurrent: LinearParams
    dense_out: LinearParams
    vad_dense: LinearParams


class RNNState(NamedTuple):
    """Batched equivalent of the reference RNNState (src/rnn.h:40-46)."""

    conv1_mem: jax.Array     # [S, (k-1) * input_dim]
    conv2_mem: jax.Array     # [S, (k-1) * cond_size]
    gru1: jax.Array          # [S, gru_size]
    gru2: jax.Array
    gru3: jax.Array


def init_rnn_state(n_streams: int,
                   config: ModelConfig = DEFAULT_MODEL,
                   dtype=jnp.float32) -> RNNState:
    k = config.conv_kernel - 1
    return RNNState(
        conv1_mem=jnp.zeros((n_streams, k * config.input_dim), dtype),
        conv2_mem=jnp.zeros((n_streams, k * config.cond_size), dtype),
        gru1=jnp.zeros((n_streams, config.gru_size), dtype),
        gru2=jnp.zeros((n_streams, config.gru_size), dtype),
        gru3=jnp.zeros((n_streams, config.gru_size), dtype),
    )


def _pallas_rnn_viable(params: ModelParams, S: int,
                       rt: RuntimeConfig) -> bool:
    """Use the fused VMEM-resident kernel (nn.pallas_rnn) when it applies:
    TPU, quantized + approx path (the kernel's numerics), and a stream count
    that tiles into its 256-stream blocks.  Measured on v5e at S=3072 the
    kernel is ~8% of whole-pipeline throughput over the XLA op-by-op form
    (at S=4096 it was neutral — scoped-VMEM pressure, see CLAUDE.md)."""
    return (rt.quantized and rt.approx_act
            and params.conv2.weights_q is not None
            and S >= 256 and S % 256 == 0
            and jax.default_backend() == "tpu")


def compute_rnn(params: ModelParams, state: RNNState, features: jax.Array,
                rt: RuntimeConfig = DEFAULT_RUNTIME,
                silence: jax.Array = None):
    """features: [S, NB_FEATURES] -> (new_state, gains[S, 32], vad[S]).

    ``silence`` [S] bool applies the reference's silent-frame semantics
    (denoise.c:474-480: compute_rnn skipped — state frozen, vad 0) for those
    rows; gains are still returned computed (the caller blends them away)."""
    if _pallas_rnn_viable(params, features.shape[0], rt):
        from ..nn.pallas_rnn import compute_rnn_pallas, pack_params
        config = ModelConfig(input_dim=features.shape[-1],
                             cond_size=params.conv1.bias.shape[0],
                             gru_size=state.gru1.shape[-1])
        # pack_params on closure-constant weights folds at compile time.
        return compute_rnn_pallas(pack_params(params), state, features,
                                  config, silence=silence)
    q, ap = rt.quantized, rt.approx_act
    conv1_mem, c1 = conv1d_step(params.conv1, state.conv1_mem, features,
                                "tanh", False, ap)      # conv1 is never int8
    conv2_mem, c2 = conv1d_step(params.conv2, state.conv2_mem, c1,
                                "tanh", q, ap)
    g1 = gru_step(params.gru1_input, params.gru1_recurrent, state.gru1, c2, q, ap)
    g2 = gru_step(params.gru2_input, params.gru2_recurrent, state.gru2, g1, q, ap)
    g3 = gru_step(params.gru3_input, params.gru3_recurrent, state.gru3, g2, q, ap)
    cat = jnp.concatenate([c2, g1, g2, g3], axis=-1)
    gains = dense(params.dense_out, cat, "sigmoid", False, ap)
    vad = dense(params.vad_dense, cat, "sigmoid", False, ap)[:, 0]
    new_state = RNNState(conv1_mem, conv2_mem, g1, g2, g3)
    if silence is not None:
        new_state = jax.tree.map(
            lambda new, old: jnp.where(silence[:, None], old, new),
            new_state, state)
        vad = jnp.where(silence, 0.0, vad)
    return new_state, gains, vad
