"""Fused Pallas TPU kernel for the whole RNN step (compute_rnn).

The XLA path runs ~30 separate ops per frame (quantise, 8 matmuls,
activations, concats).  This kernel executes the entire
conv1 -> conv2(int8) -> 3x GRU(int8, diag) -> gain/VAD heads chain for a
block of streams inside VMEM: the ~3 MB of int8/f32 weights stay resident
across grid steps (constant index_map), activations never round-trip HBM, and
the int8 matmuls hit the MXU with int32 accumulation.

Numerics identical to nn.layers (quantized path, rational activations):
validated against the XLA implementation in tests/test_pallas.py (interpret
mode on CPU) and on hardware (gain diff < 1e-7 vs XLA).

Measured on v5e at S=4096: ~0.52 ms/step vs ~0.54 ms for the XLA path —
XLA's fusion already keeps this chain efficient, and VMEM limits cap the
stream block at 256 (512 exceeds the 16 MB scoped budget because the six
[block, 1152] GRU intermediates plus 2.7 MB of resident weights must coexist).
Kept as a validated alternative path; the default pipeline uses the XLA
implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, DEFAULT_MODEL
from ..models.rnn import ModelParams, RNNState
from .layers import tanh_approx, sigmoid_approx


class PackedRNN(NamedTuple):
    """Dense, kernel-friendly weight layout (built once at load time)."""

    conv1_w: jax.Array       # [3*65, cond] f32
    conv1_b: jax.Array       # [cond]
    conv2_wq: jax.Array      # [3*cond, gru] int8
    conv2_scale: jax.Array   # [gru]  (already includes /127)
    conv2_b: jax.Array       # [gru]
    gru_in_wq: jax.Array     # [3, gru, 3*gru] int8
    gru_in_scale: jax.Array  # [3, 3*gru]
    gru_in_b: jax.Array      # [3, 3*gru]
    gru_rec_wq: jax.Array    # [3, gru, 3*gru] int8
    gru_rec_scale: jax.Array
    gru_rec_b: jax.Array
    gru_diag: jax.Array      # [3, 3*gru]
    heads_w: jax.Array       # [4*gru, 33] f32  (gains | vad)
    heads_b: jax.Array       # [33]


def pack_params(p: ModelParams) -> PackedRNN:
    def q(lp):
        return (jnp.asarray(lp.weights_q, jnp.int8),
                jnp.asarray(lp.scale, jnp.float32),
                jnp.asarray(lp.bias, jnp.float32))

    gi = [q(x) for x in (p.gru1_input, p.gru2_input, p.gru3_input)]
    gr = [q(x) for x in (p.gru1_recurrent, p.gru2_recurrent, p.gru3_recurrent)]
    heads_w = jnp.concatenate(
        [jnp.asarray(p.dense_out.weights_f32, jnp.float32),
         jnp.asarray(p.vad_dense.weights_f32, jnp.float32)], axis=1)
    heads_b = jnp.concatenate(
        [jnp.asarray(p.dense_out.bias, jnp.float32),
         jnp.asarray(p.vad_dense.bias, jnp.float32)])
    c2q, c2s, c2b = q(p.conv2)
    return PackedRNN(
        conv1_w=jnp.asarray(p.conv1.weights_f32, jnp.float32),
        conv1_b=jnp.asarray(p.conv1.bias, jnp.float32),
        conv2_wq=c2q, conv2_scale=c2s, conv2_b=c2b,
        gru_in_wq=jnp.stack([x[0] for x in gi]),
        gru_in_scale=jnp.stack([x[1] for x in gi]),
        gru_in_b=jnp.stack([x[2] for x in gi]),
        gru_rec_wq=jnp.stack([x[0] for x in gr]),
        gru_rec_scale=jnp.stack([x[1] for x in gr]),
        gru_rec_b=jnp.stack([x[2] for x in gr]),
        gru_diag=jnp.stack([
            jnp.asarray(p.gru1_recurrent.diag, jnp.float32),
            jnp.asarray(p.gru2_recurrent.diag, jnp.float32),
            jnp.asarray(p.gru3_recurrent.diag, jnp.float32)]),
        heads_w=heads_w, heads_b=heads_b,
    )


def _quant(x):
    return jnp.clip(jnp.floor(0.5 + 127.0 * x), -127.0, 127.0).astype(jnp.int8)


def _qmat(xq, wq, scale):
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scale


def _rnn_body(f, keep, c1m, c2m, h1, h2, h3,
              conv1_w, conv1_b, conv2_wq, conv2_scale, conv2_b,
              gru_in_wq, gru_in_scale, gru_in_b,
              gru_rec_wq, gru_rec_scale, gru_rec_b, gru_diag,
              heads_w, heads_b, gru_size):
    """Value-level fused RNN step with in-body silence freeze (keep [B, 1]
    bool) — shared by the per-frame kernel and the whole-frame monokernel.
    Returns (c1m, c2m, h1, h2, h3, gains, vad[B, 1])."""
    N = gru_size
    tmp1 = jnp.concatenate([c1m, f], axis=-1)
    c1 = tanh_approx(jnp.dot(tmp1, conv1_w, precision="float32",
                             preferred_element_type=jnp.float32)
                     + conv1_b)
    c1m_n = jnp.where(keep, c1m, tmp1[:, f.shape[-1]:])

    tmp2 = jnp.concatenate([c2m, c1], axis=-1)
    c2 = tanh_approx(_qmat(_quant(tmp2), conv2_wq, conv2_scale) + conv2_b)
    c2m_n = jnp.where(keep, c2m, tmp2[:, c1.shape[-1]:])

    def gru(i, h, x):
        zrh = _qmat(_quant(x), gru_in_wq[i], gru_in_scale[i]) + gru_in_b[i]
        rec = _qmat(_quant(h), gru_rec_wq[i], gru_rec_scale[i]) + gru_rec_b[i]
        d = gru_diag[i]
        rec = rec + jnp.concatenate(
            [h * d[:N], h * d[N:2 * N], h * d[2 * N:]], axis=-1)
        zr = sigmoid_approx(zrh[:, :2 * N] + rec[:, :2 * N])
        z, r = zr[:, :N], zr[:, N:]
        hh = tanh_approx(zrh[:, 2 * N:] + rec[:, 2 * N:] * r)
        return z * h + (1.0 - z) * hh

    g1 = gru(0, h1, c2)
    g2 = gru(1, h2, g1)
    g3 = gru(2, h3, g2)
    h1_n = jnp.where(keep, h1, g1)
    h2_n = jnp.where(keep, h2, g2)
    h3_n = jnp.where(keep, h3, g3)

    cat = jnp.concatenate([c2, g1, g2, g3], axis=-1)
    heads = sigmoid_approx(jnp.dot(cat, heads_w, precision="float32",
                                   preferred_element_type=jnp.float32)
                           + heads_b)
    vad = jnp.where(keep, 0.0, heads[:, 32:33])
    return c1m_n, c2m_n, h1_n, h2_n, h3_n, heads[:, :32], vad


def _kernel(feats, sil, c1m, c2m, h1, h2, h3,
            conv1_w, conv1_b, conv2_wq, conv2_scale, conv2_b,
            gru_in_wq, gru_in_scale, gru_in_b,
            gru_rec_wq, gru_rec_scale, gru_rec_b, gru_diag,
            heads_w, heads_b,
            c1m_out, c2m_out, h1_out, h2_out, h3_out, gains_out, vad_out,
            *, gru_size):
    # silence freeze IN-kernel (denoise.c skips compute_rnn for silent
    # frames): keep==1 rows write back their old state and vad 0 — saves the
    # caller's five where-passes over the state tensors in HBM.
    keep = sil[:] > 0.0                                 # [block, 1] bool
    outs = _rnn_body(feats[:], keep, c1m[:], c2m[:], h1[:], h2[:], h3[:],
                     conv1_w[:], conv1_b[:], conv2_wq[:], conv2_scale[:],
                     conv2_b[:], gru_in_wq[:], gru_in_scale[:], gru_in_b[:],
                     gru_rec_wq[:], gru_rec_scale[:], gru_rec_b[:],
                     gru_diag[:], heads_w[:], heads_b[:], gru_size)
    (c1m_out[:], c2m_out[:], h1_out[:], h2_out[:], h3_out[:],
     gains_out[:], vad_out[:]) = outs


def compute_rnn_pallas(packed: PackedRNN, state: RNNState, feats: jax.Array,
                       config: ModelConfig = DEFAULT_MODEL,
                       block: int = 256, interpret: bool = False,
                       silence: jax.Array = None):
    """Drop-in fused replacement for models.rnn.compute_rnn on the quantized,
    approx-activation path.  Returns (new_state, gains[S,32], vad[S]).

    ``silence`` [S] bool freezes those rows' state and zeroes their VAD
    inside the kernel (the reference skips compute_rnn on silent frames,
    denoise.c:474-480); None computes all rows."""
    from jax.experimental import pallas as pl

    S = feats.shape[0]
    if silence is None:
        sil = jnp.zeros((S, 1), jnp.float32)
    else:
        sil = silence.astype(jnp.float32).reshape(S, 1)
    N = config.gru_size
    block = min(block, S)
    assert S % block == 0, "stream count must be divisible by the block size"
    grid = (S // block,)

    def bspec(width):
        return pl.BlockSpec((block, width), lambda i: (i, 0))

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    f_in = config.input_dim
    cond = config.cond_size
    out_shapes = [
        jax.ShapeDtypeStruct((S, 2 * f_in), jnp.float32),   # c1m
        jax.ShapeDtypeStruct((S, 2 * cond), jnp.float32),   # c2m
        jax.ShapeDtypeStruct((S, N), jnp.float32),          # h1..h3
        jax.ShapeDtypeStruct((S, N), jnp.float32),
        jax.ShapeDtypeStruct((S, N), jnp.float32),
        jax.ShapeDtypeStruct((S, 32), jnp.float32),         # gains
        jax.ShapeDtypeStruct((S, 1), jnp.float32),          # vad
    ]
    in_specs = [bspec(f_in), bspec(1), bspec(2 * f_in), bspec(2 * cond),
                bspec(N), bspec(N), bspec(N)] + [
        wspec(packed.conv1_w.shape), wspec(packed.conv1_b.shape),
        wspec(packed.conv2_wq.shape), wspec(packed.conv2_scale.shape),
        wspec(packed.conv2_b.shape),
        wspec(packed.gru_in_wq.shape), wspec(packed.gru_in_scale.shape),
        wspec(packed.gru_in_b.shape),
        wspec(packed.gru_rec_wq.shape), wspec(packed.gru_rec_scale.shape),
        wspec(packed.gru_rec_b.shape), wspec(packed.gru_diag.shape),
        wspec(packed.heads_w.shape), wspec(packed.heads_b.shape),
    ]
    out_specs = [bspec(2 * f_in), bspec(2 * cond), bspec(N), bspec(N),
                 bspec(N), bspec(32), bspec(1)]

    outs = pl.pallas_call(
        functools.partial(_kernel, gru_size=N),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(feats, sil, state.conv1_mem, state.conv2_mem, state.gru1, state.gru2,
      state.gru3, *packed)

    c1m, c2m, h1, h2, h3, gains, vad = outs
    return RNNState(c1m, c2m, h1, h2, h3), gains, vad[:, 0]
