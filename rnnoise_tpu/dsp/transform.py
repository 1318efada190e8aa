"""Windowing, 960-point real FFT, band energies and the band-gain interpolation
— all batched over a leading stream axis ``[S, ...]``.

The reference implements these as per-bin scalar loops around a customised
KissFFT (src/denoise.c:90-225, src/kiss_fft.c).  TPU-natively, the band math
becomes two fixed matrices (see tables.py) and the FFT uses XLA's batched rFFT
with the reference's scaling conventions:

  * forward_transform  = rfft(x) / WINDOW_SIZE          (src/denoise.c:186-198;
    the 1/N scale lives inside rnn_fft_c, src/kiss_fft.c:459,582)
  * inverse_transform  = WINDOW_SIZE * irfft(X)         (src/denoise.c:200-217;
    the C code reuses the forward FFT on a conjugate-symmetric spectrum and
    reads the output reversed — algebraically identical to a plain inverse
    DFT without the 1/N scale)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..config import FRAME_SIZE, FREQ_SIZE, WINDOW_SIZE

# DFT evaluation mode: XLA's TPU FFT is surprisingly slow for batched 960-pt
# transforms (~0.45 ms per forward+inverse pair at S=1024), so on TPU the
# transforms run as dense DFT matmuls on the MXU instead.  "fft" forces the
# native FFT (used on CPU where it is faster and for bit-parity tests).
_DFT_MODE = "auto"          # "auto" | "fft" | "matmul"

# Dot algorithm for the big [*, 960] x [960, 962] DFT matmuls.  On TPU the
# f32 matmul is emulated as six bf16 MXU passes; the three-pass variant
# (BF16_BF16_F32_X3) halves the DFT cost at ~1.4e-5 max relative error —
# measured end-to-end over 150 stateful frames (scripts/tpu_fast_parity.py)
# this moves PCM by <1.1 LSB and VAD by <1e-6 vs the exact-f32 pipeline,
# inside the 4 LSB / 1e-3 parity budget.  Band-energy matmuls deliberately
# stay exact (see compute_band_energy).  "f32" forces the exact six-pass
# form everywhere (CPU always uses it: the X3 preset is TPU-only).
_DFT_PRECISION = "auto"     # "auto" | "x3" | "f32"


def set_dft_mode(mode: str) -> None:
    global _DFT_MODE
    assert mode in ("auto", "fft", "matmul")
    _DFT_MODE = mode


def set_dft_precision(mode: str) -> None:
    global _DFT_PRECISION
    assert mode in ("auto", "x3", "f32")
    _DFT_PRECISION = mode


def _use_matmul() -> bool:
    if _DFT_MODE == "matmul":
        return True
    if _DFT_MODE == "fft":
        return False
    return jax.default_backend() == "tpu"


def _dft_dot(a: jax.Array, b) -> jax.Array:
    """The DFT matmul with the selected dot algorithm."""
    use_x3 = (_DFT_PRECISION == "x3" or
              (_DFT_PRECISION == "auto" and jax.default_backend() == "tpu"))
    prec = (jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3 if use_x3
            else "float32")
    return jax.lax.dot_general(a, jnp.asarray(b), (((a.ndim - 1,), (0,)),
                                                   ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _dft_matrices():
    n = np.arange(WINDOW_SIZE)[:, None]
    k = np.arange(FREQ_SIZE)[None, :]
    ang = -2.0 * np.pi * n * k / WINDOW_SIZE
    fwd = np.concatenate([np.cos(ang), np.sin(ang)], axis=1) / WINDOW_SIZE
    # inverse (unscaled IDFT of the conjugate-symmetric extension):
    # x[n] = sum_k w_k * (re_k cos(2pi k n/N) - im_k sin(2pi k n/N)),
    # w_k = 1 for k in {0, N/2}, else 2.
    w = np.full(FREQ_SIZE, 2.0)
    w[0] = w[FREQ_SIZE - 1] = 1.0
    ang_i = 2.0 * np.pi * k.T * n.T / WINDOW_SIZE        # [FREQ, WINDOW]
    inv = np.concatenate([w[:, None] * np.cos(ang_i),
                          -w[:, None] * np.sin(ang_i)], axis=0)
    return fwd.astype(np.float32), inv.astype(np.float32)


def apply_window(x: jax.Array) -> jax.Array:
    """x: [..., WINDOW_SIZE] -> windowed [..., WINDOW_SIZE]."""
    return x * jnp.asarray(tables.full_window())


def forward_transform(x: jax.Array) -> jax.Array:
    """x: [..., WINDOW_SIZE] real -> [..., FREQ_SIZE] complex64, scaled 1/N."""
    x = x.astype(jnp.float32)
    if _use_matmul():
        fwd, _ = _dft_matrices()
        ri = jnp.dot(x, jnp.asarray(fwd), precision="float32",
                     preferred_element_type=jnp.float32)
        return jax.lax.complex(ri[..., :FREQ_SIZE], ri[..., FREQ_SIZE:])
    X = jnp.fft.rfft(x, n=WINDOW_SIZE, axis=-1)
    return (X / WINDOW_SIZE).astype(jnp.complex64)


def inverse_transform(X: jax.Array) -> jax.Array:
    """X: [..., FREQ_SIZE] complex -> [..., WINDOW_SIZE] real, scaled N."""
    if _use_matmul():
        _, inv = _dft_matrices()
        ri = jnp.concatenate([jnp.real(X), jnp.imag(X)], axis=-1)
        return jnp.dot(ri, jnp.asarray(inv), precision="float32",
                       preferred_element_type=jnp.float32)
    x = jnp.fft.irfft(X, n=WINDOW_SIZE, axis=-1)
    return (x * WINDOW_SIZE).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix_for(width: int):
    """Band aggregation matrix for either spectrum layout: natural
    (width = FREQ_SIZE) or the fused kernels' permuted layout (see
    pallas_spectral.spectrum_perm)."""
    m = tables.band_matrix()
    if width == m.shape[-1]:
        return m
    from .pallas_spectral import permute_matrix_cols
    return permute_matrix_cols(m)


@functools.lru_cache(maxsize=None)
def _interp_matrix_for(width: int):
    m = tables.interp_matrix()                           # [FREQ_SIZE, NB]
    if width == m.shape[0]:
        return m
    from .pallas_spectral import permute_matrix_cols
    return permute_matrix_cols(np.ascontiguousarray(m.T)).T


def compute_band_energy(X: jax.Array) -> jax.Array:
    """X: [..., FREQ_SIZE or PERM_WIDTH] complex -> [..., NB_BANDS] energies.

    Stays exact f32: band energies feed threshold comparisons (silence gate,
    Exp > g in the pitch filter) where the X3 fast-dot's ~1e-5 error flips
    branches and moves PCM by >10 LSB (measured: scripts/tpu_fast_parity.py
    isolation)."""
    e = jnp.real(X) ** 2 + jnp.imag(X) ** 2
    bm = _band_matrix_for(X.shape[-1])
    return jnp.dot(e, jnp.asarray(bm).T, precision="float32")


def compute_band_corr(X: jax.Array, P: jax.Array) -> jax.Array:
    """Triangular-banded Re{X · conj(P)} (src/denoise.c:115-138).
    Exact f32 — see compute_band_energy."""
    c = jnp.real(X) * jnp.real(P) + jnp.imag(X) * jnp.imag(P)
    bm = _band_matrix_for(X.shape[-1])
    return jnp.dot(c, jnp.asarray(bm).T, precision="float32")


def interp_band_gain(band_g: jax.Array, width: int = FREQ_SIZE) -> jax.Array:
    """band_g: [..., NB_BANDS] -> per-bin gain [..., width] where width
    selects the spectrum layout (FREQ_SIZE natural / PERM_WIDTH permuted).

    Bins 401..480 come out zero (20 kHz brick wall — see tables.interp_matrix).
    """
    return _dft_dot(band_g, _interp_matrix_for(width).T)


def dct(x: jax.Array) -> jax.Array:
    """32-point DCT-II with the reference's legacy sqrt(2/22) scaling."""
    return jnp.dot(x, jnp.asarray(tables.dct_matrix()).T,
                   precision="float32")


@functools.lru_cache(maxsize=None)
def _windowed_dft_matrices():
    """DFT matrices with the Vorbis window folded into the rows — saves the
    separate [S, 960] windowing passes in analysis and synthesis."""
    fwd, inv = _dft_matrices()
    w = tables.full_window().astype(np.float32)
    return (w[:, None] * fwd).astype(np.float32), \
           (inv * w[None, :]).astype(np.float32)


def windowed_forward_transform(x: jax.Array) -> jax.Array:
    """forward_transform(apply_window(x)) in one matmul."""
    if _use_matmul():
        fwd, _ = _windowed_dft_matrices()
        ri = _dft_dot(x.astype(jnp.float32), fwd)
        return jax.lax.complex(ri[..., :FREQ_SIZE], ri[..., FREQ_SIZE:])
    return forward_transform(apply_window(x))


def windowed_inverse_transform(X: jax.Array) -> jax.Array:
    """apply_window(inverse_transform(X)) in one matmul."""
    if _use_matmul():
        _, inv = _windowed_dft_matrices()
        ri = jnp.concatenate([jnp.real(X), jnp.imag(X)], axis=-1)
        return _dft_dot(ri, inv)
    return apply_window(inverse_transform(X))


def frame_analysis(analysis_mem: jax.Array, pcm: jax.Array):
    """One 50 %-overlap analysis step (src/denoise.c:332-345).

    analysis_mem: [S, FRAME_SIZE] previous frame;  pcm: [S, FRAME_SIZE].
    Returns (new_analysis_mem, X[S, FREQ_SIZE], Ex[S, NB_BANDS]).
    """
    x = jnp.concatenate([analysis_mem, pcm], axis=-1)
    X = windowed_forward_transform(x)
    Ex = compute_band_energy(X)
    return pcm, X, Ex


def frame_synthesis(synthesis_mem: jax.Array, Y: jax.Array):
    """Inverse transform + window + overlap-add (src/denoise.c:400-407).

    synthesis_mem: [S, FRAME_SIZE];  Y: [S, FREQ_SIZE] complex (natural) or
    [S, PERM_WIDTH] complex (the fused kernels' permuted layout).
    Returns (new_synthesis_mem, out_pcm[S, FRAME_SIZE]).
    """
    if Y.shape[-1] != FREQ_SIZE:
        from .pallas_spectral import inverse_spectral
        ri = jnp.concatenate([jnp.real(Y), jnp.imag(Y)], axis=-1)
        x = inverse_spectral(ri)
    else:
        x = windowed_inverse_transform(Y)
    # Barrier: both halves of x feed different outputs; without it XLA clones
    # the whole inverse matmul into each consumer fusion.
    x = jax.lax.optimization_barrier(x)
    out = x[..., :FRAME_SIZE] + synthesis_mem
    return x[..., FRAME_SIZE:], out
