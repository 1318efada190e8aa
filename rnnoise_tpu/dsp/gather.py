"""Per-stream dynamic indexing without TPU gathers.

TPU gathers are pathologically slow (~0.15 ms per call at S=1024 even for a
handful of elements per stream), so this module provides two dense
replacements:

  * :func:`take_window` — extract a per-stream window ``x[s, start[s]:+L]``
    as two grouped convolutions against one-hot filters (a dilated coarse
    step at block granularity, then a dense fine step).  Convolutions keep
    the whole computation in one fusion instead of L memory-bound shifted
    adds.
  * :func:`onehot_take` — scalar/table lookups as one-hot masked reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grouped_corr(x: jax.Array, filt: jax.Array, out_len: int,
                  dilation: int = 1) -> jax.Array:
    """out[s, i] = sum_j filt[s, j] * x[s, i + j*dilation]   for i < out_len."""
    S = x.shape[0]
    lhs = x[None, :, :]
    rhs = filt[:, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=S,
        precision="float32",
        preferred_element_type=jnp.float32,
    )
    return out[0, :, :out_len]


def take_window(x: jax.Array, start: jax.Array, length: int,
                max_start: int, blocks=(88, 8)) -> jax.Array:
    """out[s, i] = x[s, start[s] + i]  for i < length.

    x: [S, N]; start: [S] int in [0, max_start]; requires
    max_start + length <= N.  Exact (one-hot selection).

    Multi-level mixed-radix decomposition of the offset: each level is one
    grouped conv against a small one-hot filter (dilated by the level's
    stride).  ``blocks=(88, 8)`` gives three levels with ~28k MACs per
    stream for a 960-window over [0, 708] — 2.6x fewer than a two-level
    (64,) split and ~50x fewer than a flat one-hot.
    """
    S, N = x.shape
    strides = list(blocks) + [1]
    rem = start
    cur = x
    hi = max_start
    for lvl, stride in enumerate(strides):
        n_taps = hi // stride + 1
        q = rem // stride
        rem = rem - q * stride
        # this level's output must still cover the residual offset range
        residual = stride - 1 if lvl < len(strides) - 1 else 0
        out_len = length + residual
        need = (n_taps - 1) * stride + out_len
        if need > cur.shape[1]:
            cur = jnp.pad(cur, ((0, 0), (0, need - cur.shape[1])))
        oh = jax.nn.one_hot(q, n_taps, dtype=x.dtype)
        cur = _grouped_corr(cur, oh, out_len, dilation=stride)
        hi = residual
    return cur


def onehot_take(table: jax.Array, idx: jax.Array) -> jax.Array:
    """out[s, ...] = table[s, idx[s, ...]] without a gather.

    table: [S, L]; idx: [S] or [S, M] int.
    """
    L = table.shape[-1]
    if idx.ndim == 1:
        oh = jax.nn.one_hot(idx, L, dtype=table.dtype)        # [S, L]
        return jnp.sum(oh * table, axis=-1)
    oh = jax.nn.one_hot(idx, L, dtype=table.dtype)            # [S, M, L]
    return jnp.einsum("sml,sl->sm", oh, table)
