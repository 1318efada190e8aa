"""Per-stream dynamic indexing without TPU gathers.

TPU gathers are pathologically slow (~0.15 ms per call at S=1024 even for a
handful of elements per stream), so this module provides two dense
replacements:

  * :func:`take_window` — extract a per-stream window ``x[s, start[s]:+L]``
    as a cascade of one-hot-masked static shifted slices (mixed-radix
    decomposition of the offset); each level fuses into one elementwise pass.
  * :func:`onehot_take` — scalar/table lookups as one-hot masked reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_window(x: jax.Array, start: jax.Array, length: int,
                max_start: int, blocks=(64, 8)) -> jax.Array:
    """out[s, i] = x[s, start[s] + i]  for i < length.

    x: [S, N]; start: [S] int in [0, max_start]; requires
    max_start + length <= N.  Exact (one-hot selection).

    Multi-level mixed-radix decomposition of the offset: each level selects
    one of a handful of statically shifted copies with a one-hot mask
    (``sum_t oh[s, t] * x[s, t*stride : t*stride + L]``).  The shifted
    static slices all read the same buffer, so XLA fuses each level — and
    usually the whole chain — into a single elementwise pass; measured on
    TPU v5e this is ~50x faster than the equivalent one-hot grouped
    convolutions (which lower to 1-channel-per-group convs with degenerate
    T(1,128) layouts).  ``blocks=(64, 8)`` -> 12 + 8 + 8 shifted adds for a
    960-window over [0, 708].
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
        acc = oh[:, 0:1] * cur[:, :out_len]
        for t in range(1, n_taps):
            acc = acc + oh[:, t:t + 1] * cur[:, t * stride:t * stride + out_len]
        cur = acc
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
