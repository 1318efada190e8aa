"""Batched NN runtime: dense / conv1d-as-GEMM / GRU with the reference's exact
numerics (gate order, dual bias, diag add, int8 activation quantisation).

The reference computes one stream at a time with SIMD matvecs
(src/nnet.c, src/nnet_arch.h:130-162, src/vec.h).  Here the unit of work is a
``[S, ...]`` stream batch, so every matvec becomes an ``[S,in] @ [in,out]``
matmul on the MXU.  Sparsity is densified at load time: the per-layer matrices
are tiny (<= 1152x1152) and a dense int8 matmul beats any gather scheme on the
systolic array (design choice per SURVEY.md §7).

Two numerics modes mirror the reference:
  * quantized=False — float weights ("--enable-dnn-debug-float" path,
    nnet_arch.h:138-140)
  * quantized=True  — s8 weights with on-the-fly activation quantisation
    ``floor(.5 + 127 x)`` and per-output-column scales (vec.h:248-312).  We
    accumulate in int32 on the MXU where the C kernel accumulates in float;
    both round only above 2^24 so they agree to ~1 ulp of the scale.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LinearParams(NamedTuple):
    """One affine layer (reference LinearLayer, src/nnet.h:65-75).

    weights_f32: [in, out] float (always present; densified if sparse)
    weights_q:   [in, out] int8 or None (quantised layers)
    scale:       [out] float (= per-column scale / 127) or None
    bias:        [out] float or None
    diag:        [3N] float or None — GRU-recurrent extracted diagonal
    """

    weights_f32: jax.Array
    bias: Optional[jax.Array]
    weights_q: Optional[jax.Array] = None
    scale: Optional[jax.Array] = None
    diag: Optional[jax.Array] = None


# ---------------------------------------------------------------------------
# activations — rational approximations that define the reference's numerics
# (src/vec.h:337-356); `approx=False` selects hardware transcendentals.
# ---------------------------------------------------------------------------

def tanh_approx(x: jax.Array) -> jax.Array:
    N0, N1, N2 = 952.52801514, 96.39235687, 0.60863042
    D0, D1, D2 = 952.72399902, 413.36801147, 11.88600922
    x2 = x * x
    num = (N2 * x2 + N1) * x2 + N0
    den = (D2 * x2 + D1) * x2 + D0
    return jnp.clip(num * x / den, -1.0, 1.0)


def sigmoid_approx(x: jax.Array) -> jax.Array:
    return 0.5 + 0.5 * tanh_approx(0.5 * x)


def _tanh(x, approx):
    return tanh_approx(x) if approx else jnp.tanh(x)


def _sigmoid(x, approx):
    return sigmoid_approx(x) if approx else jax.nn.sigmoid(x)


def lpcnet_exp2(x: jax.Array) -> jax.Array:
    """Bit-trick 2**x (reference lpcnet_exp2, src/vec.h:316-332): cubic
    polynomial on the fraction, exponent spliced into the float's exponent
    field by integer addition.  Exact for the reference's generic C path."""
    integer = jnp.floor(x)
    frac = x - integer
    poly = 0.99992522 + frac * (0.69583354
           + frac * (0.22606716 + 0.078024523 * frac))
    bits = jax.lax.bitcast_convert_type(poly.astype(jnp.float32), jnp.int32)
    bits = (bits + (integer.astype(jnp.int32) << 23)) & 0x7FFFFFFF
    res = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(integer < -50, 0.0, res)


def lpcnet_exp(x: jax.Array) -> jax.Array:
    """e**x via lpcnet_exp2 (src/vec.h:333)."""
    return lpcnet_exp2(x * 1.44269504)


def relu(x: jax.Array) -> jax.Array:
    """src/nnet_arch.h:72-75."""
    return jnp.maximum(x, 0.0)


def swish(x: jax.Array) -> jax.Array:
    """vec_swish (src/nnet_arch.h:62-69): x * sigmoid_approx(x).  The
    reference uses the approximate sigmoid here even under HIGH_ACCURACY."""
    return x * sigmoid_approx(x)


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Normalised exp-only softmax as compiled into compute_activation_c
    (src/nnet_arch.h:105-119 *without* SOFTMAX_HACK — that macro is defined
    only in the nnet.c TU, src/nnet.c:54, not in nnet_default.c where the
    activation kernel lives).  exp is the lpcnet_exp bit trick, and the
    normaliser adds 1e-30 before the reciprocal."""
    y = lpcnet_exp(x)
    return y * (1.0 / (jnp.sum(y, axis=axis, keepdims=True) + 1e-30))


# ---------------------------------------------------------------------------
# linear / dense
# ---------------------------------------------------------------------------

def quantize_activations(x: jax.Array) -> jax.Array:
    """s8 activation quantisation: (int)floor(.5 + 127 x)  (vec.h:253, 287)."""
    return jnp.clip(jnp.floor(0.5 + 127.0 * x), -127.0, 127.0).astype(jnp.int8)


def linear(p: LinearParams, x: jax.Array, quantized: bool) -> jax.Array:
    """out = W @ x (+ bias) (+ diag path)  — compute_linear_
    (src/nnet_arch.h:130-162), batched: x [S, in] -> [S, out]."""
    if quantized and p.weights_q is not None:
        xq = quantize_activations(x)
        acc = jax.lax.dot_general(
            xq, p.weights_q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * p.scale[None, :]
    else:
        out = jnp.dot(x, p.weights_f32, precision="float32",
                      preferred_element_type=jnp.float32)
    if p.bias is not None:
        out = out + p.bias[None, :]
    if p.diag is not None:
        # GRU-recurrent diagonal, applied to the *unquantised* input
        # (nnet_arch.h:153-161): out[:, g*N + i] += diag[g*N + i] * x[:, i]
        N = x.shape[-1]
        d = p.diag.reshape(3, N)
        out = out + (x[:, None, :] * d[None, :, :]).reshape(x.shape[0], 3 * N)
    return out


def dense(p: LinearParams, x: jax.Array, activation: str, quantized: bool,
          approx: bool) -> jax.Array:
    out = linear(p, x, quantized)
    return apply_activation(out, activation, approx)


def apply_activation(out: jax.Array, activation: str, approx: bool) -> jax.Array:
    """Full activation set of compute_activation_c (src/nnet_arch.h:79-125,
    names per src/nnet.h:34-39).  ``approx`` mirrors HIGH_ACCURACY, which
    only affects sigmoid/tanh; swish and softmax always use the approximate
    forms, relu and linear are exact either way."""
    if activation == "tanh":
        return _tanh(out, approx)
    if activation == "sigmoid":
        return _sigmoid(out, approx)
    if activation == "relu":
        return relu(out)
    if activation == "swish":
        return swish(out)
    if activation == "softmax":
        return softmax(out)
    if activation == "linear":
        return out
    raise ValueError(activation)


# ---------------------------------------------------------------------------
# conv1d as GEMM over a shift register (compute_generic_conv1d, nnet.c:113-123)
# ---------------------------------------------------------------------------

def conv1d_step(p: LinearParams, mem: jax.Array, x: jax.Array,
                activation: str, quantized: bool, approx: bool):
    """mem: [S, (k-1)*in] past frames (oldest first); x: [S, in].

    Returns (new_mem, out[S, out]).  The flattened weight rows are time-major
    oldest-first, matching the exporter's (ktime, in, out) reshape
    (wexchange/c_export/common.py:289-294).
    """
    tmp = jnp.concatenate([mem, x], axis=-1)
    out = dense(p, tmp, activation, quantized, approx)
    input_size = x.shape[-1]
    return tmp[:, input_size:], out


def glu(p: LinearParams, x: jax.Array, quantized: bool) -> jax.Array:
    """Gated linear unit (compute_glu, nnet.c:96-109): x * sigmoid(W x).

    Unused by the RNNoise graph (kept for Opus-model sharing parity)."""
    act = linear(p, x, quantized)
    return x * sigmoid_approx(act)


def conv2d_step(weights: jax.Array, bias: Optional[jax.Array],
                mem: jax.Array, x: jax.Array, activation: str,
                approx: bool = True):
    """Streaming Conv2d over (time, height) with a carried (ktime-1)-frame
    input memory (compute_conv2d, nnet_arch.h:225-251).  Unused by the
    RNNoise graph; provided for NN-runtime completeness.

    weights: [out_ch, in_ch, ktime, kheight]; x: [S, in_ch, H + kheight - 1];
    mem: [S, ktime-1, in_ch, H + kheight - 1].
    Returns (new_mem, out [S, out_ch, H]).
    """
    out_ch, in_ch, ktime, kheight = weights.shape
    buf = jnp.concatenate([mem, x[:, None]], axis=1)   # [S, ktime, C, Hin]
    lhs = buf.reshape(buf.shape[0], ktime * in_ch, -1)
    w = weights.transpose(0, 2, 1, 3).reshape(out_ch, ktime * in_ch, kheight)
    out = jax.lax.conv_general_dilated(
        lhs, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision="float32", preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[None, :, None]
    if activation == "tanh":
        out = _tanh(out, approx)
    elif activation == "sigmoid":
        out = _sigmoid(out, approx)
    return buf[:, 1:], out


# ---------------------------------------------------------------------------
# GRU (compute_generic_gru, nnet.c:65-94) — gate order z, r, n
# ---------------------------------------------------------------------------

def gru_step(p_in: LinearParams, p_rec: LinearParams, state: jax.Array,
             x: jax.Array, quantized: bool, approx: bool) -> jax.Array:
    """One GRU step.  state: [S, N], x: [S, in] -> new state [S, N]."""
    N = state.shape[-1]
    zrh = linear(p_in, x, quantized)
    recur = linear(p_rec, state, quantized)
    zr = _sigmoid(zrh[:, :2 * N] + recur[:, :2 * N], approx)
    z, r = zr[:, :N], zr[:, N:]
    h = _tanh(zrh[:, 2 * N:] + recur[:, 2 * N:] * r, approx)
    return z * state + (1.0 - z) * h
