"""Fused Pallas forward-spectral kernel: pitch-window extraction + both
windowed forward DFTs in one VMEM-resident pass.

Replaces, on TPU, the XLA sequence (denoise.compute_frame_features):

    p    = take_window(pitch_buf, start, 960)        # 3 masked-shift passes
    both = windowed_forward_transform([win | p])     # [2S,960]x[960,962] dot

The XLA version costs ~400 us/frame at S=4096: the masked-shift cascade
re-reads the pitch buffer ~28x from HBM, and `p` makes a full HBM round trip
just to enter the DFT matmul.  Here one kernel reads pitch_buf/mem/x once,
extracts the pitch window in VMEM (one-hot masked shifts on the VPU), and
runs the DFT as three bf16 MXU passes (the same BF16_BF16_F32_X3
decomposition transform._dft_dot uses, split by hand because Mosaic does not
accept DotAlgorithm presets): x = hi + lo with hi = bf16(x), and
x @ W ~= hi @ W_hi + hi @ W_lo + lo @ W_hi accumulated in f32.

Numerics match the XLA X3 path to ~1e-5 relative (same algorithm); the
end-to-end budget is validated on-chip by scripts/tpu_fast_parity.py.

Reference parity anchor: src/denoise.c:347-376 (window build + forward
transforms inside rnn_compute_frame_features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (FRAME_SIZE, FREQ_SIZE, PITCH_BUF_SIZE, PITCH_MIN_PERIOD,
                      WINDOW_SIZE)

_MAX_START = PITCH_BUF_SIZE - WINDOW_SIZE - PITCH_MIN_PERIOD     # 708
_LEVELS = (64, 8)            # -> 12 + 8 + 8 one-hot masked shifts

# "auto": use the fused kernel on TPU (matmul DFT mode only); "off" forces the
# XLA take_window + stacked-matmul path (CPU always uses that).
_FUSED = "off"


def set_fused(mode: str) -> None:
    global _FUSED
    assert mode in ("auto", "on", "off")
    _FUSED = mode


def fused_enabled() -> bool:
    from .transform import _use_matmul
    if _FUSED == "off":
        return False
    if _FUSED == "on":
        return True
    return jax.default_backend() == "tpu" and _use_matmul()


@functools.lru_cache(maxsize=None)
def _split_windowed_fwd():
    """The window-folded forward DFT matrix split into (hi, lo) bf16 parts."""
    from .transform import _windowed_dft_matrices
    fwd, _ = _windowed_dft_matrices()                # [960, 962] f32
    hi = fwd.astype(np.dtype("bfloat16"))
    lo = (fwd - hi.astype(np.float32)).astype(np.dtype("bfloat16"))
    return hi, lo


def _x3_dot(x, w_hi, w_lo):
    """f32 [B,960] @ f32-matrix via three bf16 MXU passes (X3 split)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(hi, w_hi) + (d(hi, w_lo) + d(lo, w_hi))


def _take_window_vmem(buf, start, block):
    """out[s, i] = buf[s, start[s] + i], i < WINDOW_SIZE — the same
    mixed-radix one-hot cascade as gather.take_window, but VMEM-resident."""
    strides = list(_LEVELS) + [1]
    rem = start
    cur = buf
    hi = _MAX_START
    for lvl, stride in enumerate(strides):
        n_taps = hi // stride + 1
        q = rem // stride
        rem = rem - q * stride
        residual = stride - 1 if lvl < len(strides) - 1 else 0
        out_len = WINDOW_SIZE + residual
        iota = jax.lax.broadcasted_iota(jnp.int32, (block, n_taps), 1)
        oh = (iota == q[:, None]).astype(jnp.float32)
        acc = oh[:, 0:1] * cur[:, :out_len]
        for t in range(1, n_taps):
            acc = acc + oh[:, t:t + 1] * cur[:, t * stride:t * stride + out_len]
        cur = acc
        hi = residual
    return cur


def _kernel(mem_ref, x_ref, buf_ref, start_ref, whi_ref, wlo_ref,
            X_ref, P_ref, *, block):
    win = jnp.concatenate([mem_ref[:], x_ref[:]], axis=1)
    X_ref[:] = _x3_dot(win, whi_ref[:], wlo_ref[:])
    p = _take_window_vmem(buf_ref[:], start_ref[:, 0], block)
    P_ref[:] = _x3_dot(p, whi_ref[:], wlo_ref[:])


def forward_spectral(mem: jax.Array, x: jax.Array, pitch_buf: jax.Array,
                     start: jax.Array, block: int = 256,
                     interpret: bool = False):
    """mem/x: [S, 480]; pitch_buf: [S, 1728]; start: [S] int32 in
    [0, _MAX_START].  Returns (X, P): complex64 [S, FREQ_SIZE] forward
    transforms of the windowed analysis frame and pitch-delayed window.
    """
    from jax.experimental import pallas as pl

    S = x.shape[0]
    block = min(block, S)
    assert S % block == 0, (S, block)
    hi, lo = _split_windowed_fwd()

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0))

    X, P = pl.pallas_call(
        functools.partial(_kernel, block=block),
        grid=(S // block,),
        in_specs=[row_spec(FRAME_SIZE), row_spec(FRAME_SIZE),
                  row_spec(PITCH_BUF_SIZE), row_spec(1),
                  const_spec(hi.shape), const_spec(lo.shape)],
        out_specs=(row_spec(2 * FREQ_SIZE), row_spec(2 * FREQ_SIZE)),
        out_shape=(jax.ShapeDtypeStruct((S, 2 * FREQ_SIZE), jnp.float32),
                   jax.ShapeDtypeStruct((S, 2 * FREQ_SIZE), jnp.float32)),
        interpret=interpret,
    )(mem, x, pitch_buf, start.astype(jnp.int32)[:, None],
      jnp.asarray(hi), jnp.asarray(lo))
    toc = lambda ri: jax.lax.complex(ri[:, :FREQ_SIZE], ri[:, FREQ_SIZE:])
    return toc(X), toc(P)
