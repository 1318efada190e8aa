"""Direct-form-II-transposed biquad, batched over streams.

The reference runs a per-sample sequential loop with double-precision product
accumulators (src/denoise.c:409-419).  Sequential loops serialise terribly on
TPU and f32 scan reassociation drifts on this near-unstable DC-blocking filter
(poles ~0.998), so we use the fact that the filter is LTI and a frame has a
*static* length:

    y_i = x_i + s_{i-1}[0]
    s_i = A s_{i-1} + B x_i,   A = [[-a0, 1], [-a1, 0]],  B = [b0-a0, b1-a1]

unrolls in closed form to

    y_i       = x_i + (A^i)[0,:] @ s_{-1}  +  sum_{j<i} k_{i-1-j} x_j
    s_{N-1}   = A^N @ s_{-1}     +  sum_j (A^{N-1-j} B) x_j

where k_d = (A^d B)[0].  All A-powers are precomputed **in float64** at trace
time and baked in as exact f32 constants, so the runtime computation is one
lower-triangular [N, N] constant matmul (MXU) plus two tiny state terms — no
recurrence, no compensated arithmetic, robust to any compiler reassociation.
Measured agreement with the C double-accumulator loop: < 1 int16 LSB
steady-state (closer to the exact f64 filter than the C loop itself is).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _biquad_kernels(b: tuple, a: tuple, N: int):
    A = np.array([[-a[0], 1.0], [-a[1], 0.0]], dtype=np.float64)
    B = np.array([b[0] - a[0], b[1] - a[1]], dtype=np.float64)

    # A^i for i = 0..N
    powers = np.empty((N + 1, 2, 2), dtype=np.float64)
    powers[0] = np.eye(2)
    for i in range(1, N + 1):
        powers[i] = A @ powers[i - 1]

    k = (powers[:N - 1] @ B)[:, 0]                    # k_d, d = 0..N-2
    K = np.zeros((N, N), dtype=np.float64)            # K[i, j] = k_{i-1-j}
    i, j = np.tril_indices(N, k=-1)
    K[i, j] = k[i - 1 - j]

    rowA = powers[:N, 0, :]                           # (A^i)[0, :]  [N, 2]
    SA = powers[N]                                    # A^N          [2, 2]
    SB = (powers[N - 1::-1] @ B)                      # A^{N-1-j} B  [N, 2]
    return (K.astype(np.float32), rowA.astype(np.float32),
            SA.astype(np.float32), SB.astype(np.float32))


# Dot algorithm for the [S, 480] x [480, 480] kernel matmul.  "x3" uses the
# three-pass bf16 form; "f32" the exact six-pass form.  Measured on-chip
# (150 stateful frames, production X3-DFT pipeline): X3 here moves PCM by
# 6.5 LSB — OVER the 4 LSB oracle budget (the near-unstable DC blocker
# amplifies the ~1e-5 kernel error through the silence/pitch decisions) —
# for only ~1% throughput.  Stays exact; knob kept for re-measurement.
_PRECISION = "f32"           # "x3" | "f32"


def set_precision(mode: str) -> None:
    global _PRECISION
    assert mode in ("x3", "f32")
    _PRECISION = mode


def _kernel_dot(x: jax.Array, m: jax.Array) -> jax.Array:
    if _PRECISION == "x3":
        from .transform import _dft_dot
        return _dft_dot(x, m)
    return jnp.dot(x, m, precision="float32",
                   preferred_element_type=jnp.float32)


def biquad(x: jax.Array, mem: jax.Array, b, a):
    """x: [S, N], mem: [S, 2]  ->  (y[S, N], new_mem[S, 2])."""
    b = tuple(np.asarray(b, dtype=np.float64))
    a = tuple(np.asarray(a, dtype=np.float64))
    S, N = x.shape
    K, rowA, SA, SB = map(jnp.asarray, _biquad_kernels(b, a, N))
    x = x.astype(jnp.float32)
    y = x + _kernel_dot(x, K.T) \
          + jnp.dot(mem, rowA.T, precision="float32",
                    preferred_element_type=jnp.float32)
    new_mem = jnp.dot(mem, SA.T, precision="float32",
                      preferred_element_type=jnp.float32) \
            + jnp.dot(x, SB, precision="float32",
                      preferred_element_type=jnp.float32)
    return y, new_mem


def biquad_chunk(x: jax.Array, mem: jax.Array, b, a):
    """Whole-chunk biquad: x [S, T, N], mem [S, 2] -> (y [S, T, N],
    new_mem [S, 2]).

    Identical math to scanning :func:`biquad` over T frames, hoisted out of
    the frame loop: the only cross-frame dependence is the 2-dim filter
    state, so the [N, N] kernel matmul batches over all S*T frames at once
    (one MXU dot instead of T, ~2x the effective flops rate at T=100), and
    the per-frame state chain shrinks to a [S, 2] scan of fused elementwise
    ops (same f32 op order as the per-frame path, so results match it
    bit-for-bit)."""
    b = tuple(np.asarray(b, dtype=np.float64))
    a = tuple(np.asarray(a, dtype=np.float64))
    S, T, N = x.shape
    K, rowA, SA, SB = map(jnp.asarray, _biquad_kernels(b, a, N))
    x = x.astype(jnp.float32)
    flat = x.reshape(S * T, N)
    v = jnp.dot(flat, SB, precision="float32",
                preferred_element_type=jnp.float32).reshape(S, T, 2)

    def chain(m, vt):
        # same op order as biquad(): dot(mem, SA.T) + dot(x, SB)
        nm = jnp.dot(m, SA.T, precision="float32",
                     preferred_element_type=jnp.float32) + vt
        return nm, m                                 # carry, prev-state out

    new_mem, prev = jax.lax.scan(chain, mem, jnp.swapaxes(v, 0, 1))
    prev = jnp.swapaxes(prev, 0, 1)                  # [S, T, 2] = mem_{t-1}
    y = flat + jnp.dot(flat, K.T, precision="float32",
                       preferred_element_type=jnp.float32) \
             + jnp.dot(prev.reshape(S * T, 2), rowA.T, precision="float32",
                       preferred_element_type=jnp.float32)
    return y.reshape(S, T, N), new_mem
