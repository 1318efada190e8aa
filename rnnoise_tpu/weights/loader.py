"""Assemble jax model parameters from parsed weight arrays.

Mirrors the generated ``init_rnnoise()`` (emitted by
wexchange/c_export/c_writer.py:158-166 and consumed via linear_init,
src/parse_lpcnet_weights.c:123-176): each layer resolves arrays by the naming
convention ``<layer>_{bias,subias,weights_int8,weights_float,weights_idx,
weights_diag,scale}``.

Layer inventory (reference src/rnn.c:44-60 + dump script
torch/rnnoise/dump_rnnoise_weights.py:15):
    conv1 (float), conv2 (dense int8), gru{1,2,3}_{input,recurrent}
    (block-sparse int8, recurrent with extracted diagonal),
    dense_out / vad_dense (float).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config import ModelConfig, DEFAULT_MODEL
from ..models.rnn import ModelParams
from ..nn.layers import LinearParams
from .blob import (WeightArray, densify_sparse_float, densify_sparse_int8,
                   parse_weights, unshuffle_dense_int8)


def _get(arrays: Dict[str, WeightArray], name: str,
         expect_len: Optional[int] = None) -> np.ndarray:
    if name not in arrays:
        raise KeyError(f"missing weight array {name!r}")
    a = arrays[name].data
    if expect_len is not None and a.size != expect_len:
        raise ValueError(f"{name}: expected {expect_len} elements, got {a.size}")
    return a


def _linear_from_arrays(arrays, name, nb_in, nb_out, *, quantized, sparse,
                        diagonal=False) -> LinearParams:
    bias = _get(arrays, f"{name}_bias", nb_out).astype(np.float32)
    diag = None
    if diagonal:
        diag = _get(arrays, f"{name}_weights_diag", nb_out).astype(np.float32)
    if sparse:
        idx = _get(arrays, f"{name}_weights_idx")
        wf_name = f"{name}_weights_float"
        if wf_name in arrays:
            Wf = densify_sparse_float(arrays[wf_name].data, idx, nb_in, nb_out)
        else:
            Wf = None
        Wq = scale = None
        if quantized:
            Wq = densify_sparse_int8(
                _get(arrays, f"{name}_weights_int8"), idx, nb_in, nb_out)
            scale = _get(arrays, f"{name}_scale", nb_out).astype(np.float32)
            if Wf is None:
                Wf = Wq.astype(np.float32) * scale[None, :]
    else:
        if quantized:
            Wq = unshuffle_dense_int8(
                _get(arrays, f"{name}_weights_int8", nb_in * nb_out),
                nb_in, nb_out)
            scale = _get(arrays, f"{name}_scale", nb_out).astype(np.float32)
            wf_name = f"{name}_weights_float"
            if wf_name in arrays:
                Wf = arrays[wf_name].data.astype(np.float32).reshape(nb_in, nb_out)
            else:
                Wf = Wq.astype(np.float32) * scale[None, :]
        else:
            Wq = scale = None
            Wf = _get(arrays, f"{name}_weights_float",
                      nb_in * nb_out).astype(np.float32).reshape(nb_in, nb_out)
    return LinearParams(weights_f32=Wf, bias=bias, weights_q=Wq, scale=scale,
                        diag=diag)


def infer_model_config(arrays: Dict[str, WeightArray]) -> ModelConfig:
    """Recover the topology from the blob itself: cond = |conv1 bias|,
    gru = |conv2 bias| (conv2 feeds the GRU stack, src/rnn.c:44-55).  The
    reference cannot do this (its dims are compiled into rnnoise_data.h);
    here it makes any exported blob loadable without a config."""
    c = int(_get(arrays, "conv1_bias").size)
    g = int(_get(arrays, "conv2_bias").size)
    return ModelConfig(cond_size=c, gru_size=g)


def model_params_from_arrays(arrays: Dict[str, WeightArray],
                             config: Optional[ModelConfig] = DEFAULT_MODEL,
                             ) -> ModelParams:
    if config is None:
        config = infer_model_config(arrays)
    c, g, k = config.cond_size, config.gru_size, config.conv_kernel
    f, nb = config.input_dim, config.output_dim
    layers = {}
    layers["conv1"] = _linear_from_arrays(
        arrays, "conv1", k * f, c, quantized=False, sparse=False)
    layers["conv2"] = _linear_from_arrays(
        arrays, "conv2", k * c, g, quantized=True, sparse=False)
    for i in (1, 2, 3):
        layers[f"gru{i}_input"] = _linear_from_arrays(
            arrays, f"gru{i}_input", g, 3 * g, quantized=True, sparse=True)
        layers[f"gru{i}_recurrent"] = _linear_from_arrays(
            arrays, f"gru{i}_recurrent", g, 3 * g, quantized=True, sparse=True,
            diagonal=True)
    layers["dense_out"] = _linear_from_arrays(
        arrays, "dense_out", 4 * g, nb, quantized=False, sparse=False)
    layers["vad_dense"] = _linear_from_arrays(
        arrays, "vad_dense", 4 * g, 1, quantized=False, sparse=False)
    return ModelParams(**layers)


def load_model_bytes(blob: bytes,
                     config: ModelConfig = DEFAULT_MODEL) -> ModelParams:
    """rnnoise_model_from_buffer equivalent (include/rnnoise.h:98-105)."""
    return model_params_from_arrays(parse_weights(blob), config)


def load_model_file(path: str,
                    config: ModelConfig = DEFAULT_MODEL) -> ModelParams:
    """rnnoise_model_from_filename equivalent (include/rnnoise.h:113-117)."""
    with open(path, "rb") as f:
        return load_model_bytes(f.read(), config)
