"""EXPERIMENTAL: two-stage Cooley-Tukey real DFT-960 as a fused Pallas kernel.

The production path evaluates the 960-pt forward transform as a dense
[960, 962] MXU matmul (dsp/transform.py) — exact, but 14.2 GFLOP per forward
at S=4096 and already at ~85 % of the v5e f32 matmul peak.  The factored form

    n = 15 a + b   (a < 64, b < 15)
    A[b, k1]  = sum_a x[15 a + b] * W64^(a k1)            (DFT-64 over a)
    At[b, k1] = A[b, k1] * W960^(k1 b)                    (twiddle)
    X[k1 + 64 k2] = sum_b At[b, k1] * W15^(k2 b)          (DFT-15 over b)

needs ~1.5 GFLOP.  An XLA implementation loses the advantage to reshuffle /
twiddle ops between matmuls; inside one Pallas kernel the intermediate stays
in VMEM with the twiddle fused.

Status (round 1): numerically exact (2e-7 rel vs the direct transform,
validated in interpret mode — tests/test_pallas.py).  NOT wired in:
 * Mosaic on this toolchain rejects the reshape formulation ("unsupported
   shape cast") and OOM-killed the 3-D dot_general formulation;
 * the same twiddle-folded algorithm in pure XLA (batched einsums) measured
   only ~13 % faster than the direct matmul at S=4096 (0.86 vs 0.98 ms in the
   chained harness) — the K=64/K=15 matmuls and transposes eat the 9.5x flop
   reduction.
Round-2 path: hand-tiled Mosaic with the stage-2 contraction fused along k1
into the row dimension, or accept the direct matmul as the floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..config import FREQ_SIZE, WINDOW_SIZE

_N1, _N2 = 64, 15           # WINDOW_SIZE = 15 * 64


@functools.lru_cache(maxsize=None)
def _stage_matrices(windowed: bool):
    N = WINDOW_SIZE
    a = np.arange(_N1)[:, None]
    k1 = np.arange(_N1)[None, :]
    ang1 = -2.0 * np.pi * a * k1 / _N1
    # [64, 128]: columns = [re(64) | im(64)]
    W64 = np.concatenate([np.cos(ang1), np.sin(ang1)], axis=1) / N

    b = np.arange(_N2)[:, None]
    k1b = np.arange(_N1)[None, :]
    angt = -2.0 * np.pi * b * k1b / N
    TW = np.stack([np.cos(angt), np.sin(angt)], axis=-1)     # [15, 64, 2]

    k2 = np.arange(_N2)[None, :]
    ang2 = -2.0 * np.pi * b * k2 / _N2
    C, S = np.cos(ang2), np.sin(ang2)                        # [15, 15]

    return (W64.astype(np.float32),
            TW[:, :, 0].copy().astype(np.float32),           # twc [15, 64]
            TW[:, :, 1].copy().astype(np.float32),           # tws [15, 64]
            C.astype(np.float32), S.astype(np.float32))


def _dg(lhs, rhs, lhs_dim):
    return jax.lax.dot_general(
        lhs, rhs, (((lhs_dim,), (0,)), ((), ())),
        precision="float32", preferred_element_type=jnp.float32)


def _kernel(x_ref, w64_ref, twc_ref, tws_ref, w15c_ref, w15s_ref, out_ref):
    # x: [B, 15, 64] with x[s, b, a] = (windowed) input sample 15 a + b.
    # All steps stay 3-D (no VMEM shape casts): dot_generals contract the
    # trailing/middle dims and the final k-interleave is 16 static writes.
    A = _dg(x_ref[:], w64_ref[:], 2)                   # [B, 15, 128] (re|im)
    re = A[:, :, :_N1]
    im = A[:, :, _N1:]
    # twiddle W960^(k1 b): complex mul by (twc + i tws)[b, k1]
    re_t = re * twc_ref[:] - im * tws_ref[:]
    im_t = re * tws_ref[:] + im * twc_ref[:]
    # DFT-15 over b (contract dim 1): X = At * (w15c + i w15s)[b, k2]
    Xre = _dg(re_t, w15c_ref[:], 1) - _dg(im_t, w15s_ref[:], 1)  # [B, 64, 15]
    Xim = _dg(re_t, w15s_ref[:], 1) + _dg(im_t, w15c_ref[:], 1)
    for k2 in range((FREQ_SIZE + _N1 - 1) // _N1):     # k = 64 k2 + k1
        w = min(_N1, FREQ_SIZE - _N1 * k2)
        out_ref[:, 0, _N1 * k2:_N1 * k2 + w] = Xre[:, :w, k2]
        out_ref[:, 1, _N1 * k2:_N1 * k2 + w] = Xim[:, :w, k2]


def factored_forward_transform(x: jax.Array, windowed: bool = True,
                               block: int = 512,
                               interpret: bool = False) -> jax.Array:
    """x: [S, 960] -> complex [S, 481]; optionally with the Vorbis analysis
    window folded in (matching transform.windowed_forward_transform)."""
    from jax.experimental import pallas as pl

    S = x.shape[0]
    block = min(block, S)
    assert S % block == 0
    W64, twc, tws, W15c, W15s = _stage_matrices(windowed)
    if windowed:
        x = x * jnp.asarray(tables.full_window())
    # reorder n = 15 a + b -> [S, b, a]
    xr = x.reshape(S, _N1, _N2).transpose(0, 2, 1)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    out = pl.pallas_call(
        _kernel,
        grid=(S // block,),
        in_specs=[
            pl.BlockSpec((block, _N2, _N1), lambda i: (i, 0, 0)),
            wspec(W64.shape), wspec(twc.shape), wspec(tws.shape),
            wspec(W15c.shape), wspec(W15s.shape),
        ],
        out_specs=pl.BlockSpec((block, 2, FREQ_SIZE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, 2, FREQ_SIZE), jnp.float32),
        interpret=interpret,
    )(xr, jnp.asarray(W64), jnp.asarray(twc), jnp.asarray(tws),
      jnp.asarray(W15c), jnp.asarray(W15s))
    return jax.lax.complex(out[:, 0], out[:, 1])
