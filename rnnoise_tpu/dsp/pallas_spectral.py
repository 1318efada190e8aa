"""Fused Pallas spectral kernels: factored (DIF radix-2) 960-pt DFT with the
pitch-window extraction fused in, plus the matching factored inverse.

Why factored: the dense windowed-DFT matmul ([*,960]x[960,962] as three bf16
MXU passes) is already at bf16 MXU peak, so the only way down is fewer flops.
A decimation-in-frequency radix-2 cascade needs no input reordering (DIF
butterflies act on contiguous halves — Mosaic rejects the strided reshapes a
DIT split would need) and after three levels leaves eight length-120
subsequences whose DFTs are small matmuls.  Keeping only bins t <= 60 per
leaf (conjugate symmetry of the real input covers the rest) the matmul work
is ~439 Kflop/row vs 1.85 Mflop/row dense — 4.2x fewer — with the butterfly
twiddles as cheap VPU ops on VMEM-resident data.

The price is bin ORDER: leaf j holds natural bins k = 8t + j ("permuted
spectrum", position 61j + t).  Instead of paying a lane shuffle to restore
natural order, the whole pipeline downstream runs in permuted order: the
band/interp matrices get their FREQ-indexed dimension permuted (they are
constants), the delayed X/P state is stored permuted, the pitch comb filter
is elementwise, and the inverse kernel consumes the permuted spectrum
natively (the reordering is absorbed into its static leaf matrices).

Numerics: the leaf matmuls use the same three-pass bf16 (X3) split as
transform._dft_dot (~1.4e-5 relative); butterflies are exact f32.  The
end-to-end budget is validated on-chip by scripts/tpu_fast_parity.py.

Reference parity anchors: src/denoise.c:347-376 (window build + forward
transforms), src/denoise.c:200-217 + 400-407 (inverse + synthesis window),
src/kiss_fft.c:351-404 (the mixed-radix factorization this replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (FRAME_SIZE, FREQ_SIZE, PITCH_BUF_SIZE, PITCH_MIN_PERIOD,
                      WINDOW_SIZE)
from .. import tables

_MAX_START = PITCH_BUF_SIZE - WINDOW_SIZE - PITCH_MIN_PERIOD     # 708
# take_window cascade strides: 6+5+5+5+3 one-hot masked shifts.  Measured on
# v5e (in-kernel, S=4096): (128,32,8,2) 105 us vs (64,8) 209 us — cost tracks
# sum(taps x width), so more, narrower levels win.
_LEVELS = (128, 32, 8, 2)

_NLEAF = 8                   # 2^3 DIF levels
_LEAF = WINDOW_SIZE // _NLEAF                                    # 120
_TGROUP = _LEAF // 2 + 1                                         # 61
PERM_WIDTH = _NLEAF * _TGROUP                                    # 488

# "auto": use the fused kernels on TPU (matmul DFT mode only); "off" forces
# the XLA take_window + stacked-matmul path (CPU always uses that).
_FUSED = "auto"


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


# ---------------------------------------------------------------------------
# permutation bookkeeping
# ---------------------------------------------------------------------------

def spectrum_perm() -> np.ndarray:
    """perm[k] = position of natural bin k (< FREQ_SIZE) in the permuted
    layout: k = 8t + j  ->  61j + t."""
    k = np.arange(FREQ_SIZE)
    return (_TGROUP * (k % _NLEAF) + k // _NLEAF).astype(np.int32)


def permute_matrix_cols(m: np.ndarray) -> np.ndarray:
    """[..., FREQ_SIZE] constant -> [..., PERM_WIDTH] with permuted columns
    (unmapped positions, leaf bins t=60 of groups j>0, get zeros)."""
    out = np.zeros(m.shape[:-1] + (PERM_WIDTH,), m.dtype)
    out[..., spectrum_perm()] = m
    return out


def _bitrev3(p: int) -> int:
    return ((p & 1) << 2) | (p & 2) | (p >> 2)


def permute_spectrum(X: jax.Array) -> jax.Array:
    """Natural complex spectrum [S, FREQ_SIZE] -> permuted [S, 2*PERM_WIDTH]
    re|im layout, including the extension bins (leaf t=60 of groups j>0 hold
    the extended-spectrum values X~[480+j] = conj(X[480-j])).  Reference /
    interop helper — the fused kernels never materialize natural order."""
    S = X.shape[0]
    re = jnp.zeros((S, PERM_WIDTH), jnp.float32)
    im = jnp.zeros((S, PERM_WIDTH), jnp.float32)
    perm = spectrum_perm()
    re = re.at[:, perm].set(jnp.real(X))
    im = im.at[:, perm].set(jnp.imag(X))
    for j in range(1, _NLEAF):
        pos = _TGROUP * j + (_TGROUP - 1)                # leaf j, t = 60
        re = re.at[:, pos].set(jnp.real(X[:, FREQ_SIZE - 1 - j]))
        im = im.at[:, pos].set(-jnp.imag(X[:, FREQ_SIZE - 1 - j]))
    return jnp.concatenate([re, im], axis=1)


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

def _bf16_split(m: np.ndarray):
    hi = m.astype(np.dtype("bfloat16"))
    lo = (m - hi.astype(np.float32)).astype(np.dtype("bfloat16"))
    return hi, lo


def _twiddle(L: int):
    n = np.arange(L // 2)
    ang = -2.0 * np.pi * n / L
    return (np.cos(ang).astype(np.float32)[None, :],
            np.sin(ang).astype(np.float32)[None, :])


@functools.lru_cache(maxsize=None)
def _fwd_consts():
    """Window row, butterfly twiddles, and bf16-split leaf DFT matrices."""
    win = tables.full_window().astype(np.float32)[None, :]
    tws = [_twiddle(L) for L in (960, 480, 240)]
    m = np.arange(_LEAF)[:, None]
    t = np.arange(_TGROUP)[None, :]
    th = 2.0 * np.pi * m * t / _LEAF
    C = (np.cos(th) / WINDOW_SIZE).astype(np.float32)
    S = (np.sin(th) / WINDOW_SIZE).astype(np.float32)
    # complex leaf: [re|im] @ [[C, -S], [S, C]] -> [re|im] of 61 bins
    Mc = np.block([[C, -S], [S, C]]).astype(np.float32)          # [240, 122]
    Mr = np.concatenate([C, -S], axis=1).astype(np.float32)      # [120, 122]
    return win, tws, _bf16_split(Mc), _bf16_split(Mr)


@functools.lru_cache(maxsize=None)
def _inv_consts():
    """Static inverse-leaf matrices (conjugate symmetry + IDFT-120 folded),
    conjugate butterfly twiddles, and the synthesis window.

    leaf_time_j[m] = sum_{t<120} spec_j_full[t] e^{+2pi i mt/120} where
    spec_j_full[t<=60] = stored_j[t] and, by global conjugate symmetry of the
    real signal, spec_j_full[t>60] = conj(stored_{(8-j)%8}[tau]) with
    tau = 119-t (j>0) / 120-t (j=0).  Folding both sums into static matrices
    gives, per leaf pair (j, partner):  time_j = [re_j|im_j] @ A
    + [re_p|im_p] @ B_j  — no lane reversals anywhere (the reversal lives in
    the matrix).
    """
    m = np.arange(_LEAF)[None, :]
    t = np.arange(_TGROUP)[:, None]
    thA = 2.0 * np.pi * t * m / _LEAF
    # direct part: stored_j (t = 0..60), e^{+i thA}
    Ca, Sa = np.cos(thA), np.sin(thA)
    # A maps [re|im](122) -> [time_re|time_im](240):
    #   (re + i im)(cos + i sin) = (re cos - im sin) + i(re sin + im cos)
    A = np.block([[Ca, Sa], [-Sa, Ca]]).astype(np.float32)       # [122, 240]

    def conj_part(j):
        # contribution of conj(stored_partner[tau]) at t = 61..119
        B = np.zeros((2 * _TGROUP, 2 * _LEAF), np.float32)
        for tt in range(_TGROUP, _LEAF):
            tau = (_LEAF - tt) if j == 0 else (_LEAF - 1 - tt)
            th = 2.0 * np.pi * tt * np.arange(_LEAF) / _LEAF
            c, s = np.cos(th), np.sin(th)
            # conj(re + i im) * e^{+i th} = (re c + im s) + i(re s - im c)
            B[tau, :_LEAF] += c
            B[tau, _LEAF:] += s
            B[_TGROUP + tau, :_LEAF] += s
            B[_TGROUP + tau, _LEAF:] += -c
        return B

    B0 = conj_part(0)       # self-partner leaves (j = 0 and j = 4)
    Bj = conj_part(1)       # all j > 0 leaves share the tau = 119-t map
    # Merge twiddles W_L^{-n} = conj(W_L^n).  No 1/2 per level: the leaf
    # matrices compute UNSCALED inverse DFTs (sum over bins), and in that
    # convention  x[n] = ua[n] + W^{-n} ub[n]  exactly (the 1/2 belongs only
    # to the normalized-IDFT formulation).
    tws = []
    for L in (240, 480, 960):
        c, s = _twiddle(L)
        tws.append((c, -s))
    win = tables.full_window().astype(np.float32)[None, :]
    return (_bf16_split(A.astype(np.float32)),
            _bf16_split(B0.astype(np.float32)),
            _bf16_split(Bj.astype(np.float32)), tws, win)


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------

def _x3_dot(x, w_hi, w_lo):
    """f32 matmul via three bf16 MXU passes (the X3 split — Mosaic does not
    accept DotAlgorithm presets, so split by hand)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(hi, w_hi) + (d(hi, w_lo) + d(lo, w_hi))


def _take_window_vmem(buf, start, block):
    """out[s, i] = buf[s, start[s] + i], i < WINDOW_SIZE — the same
    mixed-radix one-hot cascade as gather.take_window, VMEM-resident."""
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


def _dif_split(seq, twc, tws):
    """One DIF butterfly level: length-2L (re, im|None) -> two length-L seqs.
    Returns [a, b] in branch order (a feeds even bins, b odd bins)."""
    re, im = seq
    L = re.shape[1] // 2
    a_re = re[:, :L] + re[:, L:]
    d_re = re[:, :L] - re[:, L:]
    if im is None:
        return [(a_re, None), (d_re * twc, d_re * tws)]
    a_im = im[:, :L] + im[:, L:]
    d_im = im[:, :L] - im[:, L:]
    b_re = d_re * twc - d_im * tws
    b_im = d_re * tws + d_im * twc
    return [(a_re, a_im), (b_re, b_im)]


def _dif_forward(v, tws, Mc_hi, Mc_lo, Mr_hi, Mr_lo):
    """v: [B, 960] windowed f32 -> permuted spectrum [B, 2*PERM_WIDTH]
    (re | im concat), position 61j + t <-> natural bin 8t + j."""
    seqs = [(v, None)]
    for (twc, tws_) in tws:
        seqs = [out for s in seqs
                for out in _dif_split(s, twc, tws_)]
    B = v.shape[0]
    # Leaf at list position p holds natural bins k = 8t + bitrev3(p).  The 7
    # complex leaves share one DFT matrix — row-concat them into a single
    # [7B, 240] @ [240, 122] dot per bf16 pass (7x fewer, larger MXU dots).
    cplx = jnp.concatenate(
        [jnp.concatenate([re, im], axis=1) for re, im in seqs[1:]], axis=0)
    spec_c = _x3_dot(cplx, Mc_hi, Mc_lo)                 # [7B, 122]
    groups = [None] * _NLEAF
    groups[_bitrev3(0)] = _x3_dot(seqs[0][0], Mr_hi, Mr_lo)
    for p in range(1, _NLEAF):
        groups[_bitrev3(p)] = spec_c[(p - 1) * B:p * B]  # [B, 122] re|im
    re_all = jnp.concatenate([g[:, :_TGROUP] for g in groups], axis=1)
    im_all = jnp.concatenate([g[:, _TGROUP:] for g in groups], axis=1)
    return jnp.concatenate([re_all, im_all], axis=1)     # [B, 976]


def _dif_inverse(Xp, A_hi, A_lo, B0_hi, B0_lo, Bj_hi, Bj_lo, tws, win):
    """Xp: [B, 2*PERM_WIDTH] permuted spectrum -> [B, 960] natural-order
    (synthesis-windowed) time signal."""
    re = Xp[:, :PERM_WIDTH]
    im = Xp[:, PERM_WIDTH:]

    def stored(j):
        return jnp.concatenate(
            [re[:, j * _TGROUP:(j + 1) * _TGROUP],
             im[:, j * _TGROUP:(j + 1) * _TGROUP]], axis=1)   # [B, 122]

    B = Xp.shape[0]
    # Row-concat the shared-matrix leaf dots: direct part (matrix A) for all
    # 8 leaves in one dot; conjugate part for j = 1..7 (matrix Bj) in one dot
    # (j = 0's tau map differs: tau = 120-t vs 119-t — separate small dot).
    direct_in = jnp.concatenate([stored(j) for j in range(_NLEAF)], axis=0)
    direct = _x3_dot(direct_in, A_hi, A_lo)              # [8B, 240]
    conj_in = jnp.concatenate(
        [stored((_NLEAF - j) % _NLEAF) for j in range(1, _NLEAF)], axis=0)
    conj_c = _x3_dot(conj_in, Bj_hi, Bj_lo)              # [7B, 240]
    leaves = [None] * _NLEAF                 # list position p order
    for j in range(_NLEAF):
        tm = direct[j * B:(j + 1) * B]
        if j == 0:
            tm = tm + _x3_dot(stored(0), B0_hi, B0_lo)
        else:
            tm = tm + conj_c[(j - 1) * B:j * B]
        leaves[_bitrev3(j)] = (tm[:, :_LEAF], tm[:, _LEAF:])

    # reconstruction levels (reverse of _dif_split, unscaled-IDFT form):
    #   v[:L] = a + b W^{-n},  v[L:] = a - b W^{-n}
    for lvl, (twc, tws_) in enumerate(tws):
        last = lvl == len(tws) - 1
        nxt = []
        for i in range(0, len(leaves), 2):
            (a_re, a_im), (b_re, b_im) = leaves[i], leaves[i + 1]
            bw_re = b_re * twc - b_im * tws_
            v_re = jnp.concatenate([a_re + bw_re, a_re - bw_re], axis=1)
            if last:
                nxt.append((v_re, None))     # imaginary part cancels
            else:
                bw_im = b_re * tws_ + b_im * twc
                v_im = jnp.concatenate([a_im + bw_im, a_im - bw_im], axis=1)
                nxt.append((v_re, v_im))
        leaves = nxt
    return leaves[0][0] * win


# ---------------------------------------------------------------------------
# pallas entry points
# ---------------------------------------------------------------------------

_MIN_BLOCK = 8     # f32 sublane tile: Mosaic mis-lays-out concats of <8-row
                   # vectors ("result/input offset mismatch"), so small stream
                   # counts are zero-padded up to one tile and sliced back.


def _pad_streams(arrays, S):
    """Zero-pad the leading (stream) axis of each array to a multiple of
    _MIN_BLOCK.  Returns (padded_arrays, S_pad)."""
    S_pad = max(_MIN_BLOCK, -(-S // _MIN_BLOCK) * _MIN_BLOCK)
    if S_pad == S:
        return tuple(arrays), S
    return tuple(jnp.pad(a, ((0, S_pad - S),) + ((0, 0),) * (a.ndim - 1))
                 for a in arrays), S_pad

def _fwd_kernel(mem_ref, x_ref, buf_ref, start_ref, win_ref,
                tc0, ts0, tc1, ts1, tc2, ts2, mch, mcl, mrh, mrl,
                X_ref, P_ref, *, block):
    win = win_ref[:]
    tws = [(tc0[:], ts0[:]), (tc1[:], ts1[:]), (tc2[:], ts2[:])]
    v = jnp.concatenate([mem_ref[:], x_ref[:]], axis=1) * win
    X_ref[:] = _dif_forward(v, tws, mch[:], mcl[:], mrh[:], mrl[:])
    p = _take_window_vmem(buf_ref[:], start_ref[:, 0], block)
    P_ref[:] = _dif_forward(p * win, tws, mch[:], mcl[:], mrh[:], mrl[:])


def forward_spectral(mem: jax.Array, x: jax.Array, pitch_buf: jax.Array,
                     start: jax.Array, block: int = 256,
                     interpret: bool = False):
    """mem/x: [S, 480]; pitch_buf: [S, 1728]; start: [S] int32 in
    [0, 708].  Returns (Xp, Pp): [S, 2*PERM_WIDTH] f32 permuted spectra of
    the windowed analysis frame and the pitch-delayed window."""
    from jax.experimental import pallas as pl

    S = x.shape[0]
    (mem, x, pitch_buf, start), S_pad = _pad_streams(
        (mem, x, pitch_buf, start), S)
    block = min(block, S_pad)
    assert S_pad % block == 0, (S_pad, block)
    win, tws, (mch, mcl), (mrh, mrl) = _fwd_consts()
    consts = [win, tws[0][0], tws[0][1], tws[1][0], tws[1][1],
              tws[2][0], tws[2][1], mch, mcl, mrh, mrl]

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    Xp, Pp = pl.pallas_call(
        functools.partial(_fwd_kernel, block=block),
        grid=(S_pad // block,),
        in_specs=[row_spec(FRAME_SIZE), row_spec(FRAME_SIZE),
                  row_spec(PITCH_BUF_SIZE), row_spec(1)] +
                 [const_spec(a) for a in consts],
        out_specs=(row_spec(2 * PERM_WIDTH), row_spec(2 * PERM_WIDTH)),
        out_shape=(jax.ShapeDtypeStruct((S_pad, 2 * PERM_WIDTH), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, 2 * PERM_WIDTH), jnp.float32)),
        interpret=interpret,
    )(mem, x, pitch_buf, start.astype(jnp.int32)[:, None],
      *[jnp.asarray(a) for a in consts])
    return Xp[:S], Pp[:S]


def _inv_kernel(Xp_ref, Ah, Al, B0h, B0l, Bjh, Bjl,
                tc0, ts0, tc1, ts1, tc2, ts2, win_ref, out_ref):
    tws = [(tc0[:], ts0[:]), (tc1[:], ts1[:]), (tc2[:], ts2[:])]
    out_ref[:] = _dif_inverse(Xp_ref[:], Ah[:], Al[:], B0h[:], B0l[:],
                              Bjh[:], Bjl[:], tws, win_ref[:])


def inverse_spectral(Xp: jax.Array, block: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Xp: [S, 2*PERM_WIDTH] permuted spectrum -> [S, 960] synthesis-windowed
    time signal (the fused equivalent of windowed_inverse_transform)."""
    from jax.experimental import pallas as pl

    S = Xp.shape[0]
    (Xp,), S_pad = _pad_streams((Xp,), S)
    block = min(block, S_pad)
    assert S_pad % block == 0, (S_pad, block)
    (Ah, Al), (B0h, B0l), (Bjh, Bjl), tws, win = _inv_consts()
    consts = [Ah, Al, B0h, B0l, Bjh, Bjl,
              tws[0][0], tws[0][1], tws[1][0], tws[1][1],
              tws[2][0], tws[2][1], win]

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    out = pl.pallas_call(
        _inv_kernel,
        grid=(S_pad // block,),
        in_specs=[row_spec(2 * PERM_WIDTH)] +
                 [const_spec(a) for a in consts],
        out_specs=row_spec(WINDOW_SIZE),
        out_shape=jax.ShapeDtypeStruct((S_pad, WINDOW_SIZE), jnp.float32),
        interpret=interpret,
    )(Xp, *[jnp.asarray(a) for a in consts])
    return out[:S]
