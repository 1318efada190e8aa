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


# The fused post-filter/synthesis mega-kernel (postfilter_synthesis).
# Measured on v5e at S=4096 (r2): ~3% SLOWER in-pipeline than the XLA
# formulation it replaces — XLA overlaps the small post-filter fusions with
# the rest of the frame, while the monolithic kernel serialises them.
# Kept "off" by default as a validated alternative; flip to re-measure on
# newer toolchains.
_POSTFILTER = "off"          # "auto"/"on" | "off"


def set_postfilter(mode: str) -> None:
    global _POSTFILTER
    assert mode in ("auto", "on", "off")
    _POSTFILTER = mode


def postfilter_enabled() -> bool:
    if _POSTFILTER == "off":
        return False
    return fused_enabled()


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


def _fwd_leaf_matrices(leaf: int, tgroup: int, scale: float):
    """bf16-split forward leaf DFT matrices for a 3-level DIF radix-2
    factorization with leaves of ``leaf`` samples, keeping ``tgroup`` bins
    per leaf, with ``scale`` folded in (complex-leaf [2*leaf, 2*tgroup] and
    real-leaf [leaf, 2*tgroup])."""
    m = np.arange(leaf)[:, None]
    t = np.arange(tgroup)[None, :]
    th = 2.0 * np.pi * m * t / leaf
    C = (np.cos(th) * scale).astype(np.float32)
    S = (np.sin(th) * scale).astype(np.float32)
    # complex leaf: [re|im] @ [[C, -S], [S, C]] -> [re|im] of tgroup bins
    Mc = np.block([[C, -S], [S, C]]).astype(np.float32)
    Mr = np.concatenate([C, -S], axis=1).astype(np.float32)
    return _bf16_split(Mc), _bf16_split(Mr)


@functools.lru_cache(maxsize=None)
def _fwd_consts():
    """Window row, butterfly twiddles, and bf16-split leaf DFT matrices."""
    win = tables.full_window().astype(np.float32)[None, :]
    tws = [_twiddle(L) for L in (960, 480, 240)]
    mc, mr = _fwd_leaf_matrices(_LEAF, _TGROUP, 1.0 / WINDOW_SIZE)
    return win, tws, mc, mr


def _inv_leaf_matrices(leaf: int, tgroup: int, scale: float):
    """Static inverse-leaf matrices (conjugate symmetry + leaf IDFT folded)
    for the 3-level DIF reconstruction, ``scale`` folded in.

    leaf_time_j[m] = sum_{t<leaf} spec_j_full[t] e^{+2pi i mt/leaf} where
    spec_j_full[t<tgroup] = stored_j[t] and, by global conjugate symmetry of
    the real signal, spec_j_full[t>=tgroup] = conj(stored_{(8-j)%8}[tau])
    with tau = leaf-1-t (j>0) / leaf-t (j=0).  Folding both sums into static
    matrices gives, per leaf pair (j, partner):  time_j = [re_j|im_j] @ A
    + [re_p|im_p] @ B_j  — no lane reversals anywhere (the reversal lives in
    the matrix).
    """
    m = np.arange(leaf)[None, :]
    t = np.arange(tgroup)[:, None]
    thA = 2.0 * np.pi * t * m / leaf
    Ca, Sa = np.cos(thA), np.sin(thA)
    # A maps [re|im](2*tgroup) -> [time_re|time_im](2*leaf):
    #   (re + i im)(cos + i sin) = (re cos - im sin) + i(re sin + im cos)
    A = np.block([[Ca, Sa], [-Sa, Ca]]).astype(np.float32)

    def conj_part(j):
        # contribution of conj(stored_partner[tau]) at t = tgroup..leaf-1
        B = np.zeros((2 * tgroup, 2 * leaf), np.float32)
        for tt in range(tgroup, leaf):
            tau = (leaf - tt) if j == 0 else (leaf - 1 - tt)
            th = 2.0 * np.pi * tt * np.arange(leaf) / leaf
            c, s = np.cos(th), np.sin(th)
            # conj(re + i im) * e^{+i th} = (re c + im s) + i(re s - im c)
            B[tau, :leaf] += c
            B[tau, leaf:] += s
            B[tgroup + tau, :leaf] += s
            B[tgroup + tau, leaf:] += -c
        return B

    B0 = conj_part(0)       # self-partner leaves (j = 0 and j = 4)
    Bj = conj_part(1)       # all j > 0 leaves share the tau = leaf-1-t map
    return (_bf16_split((A * scale).astype(np.float32)),
            _bf16_split((B0 * scale).astype(np.float32)),
            _bf16_split((Bj * scale).astype(np.float32)))


@functools.lru_cache(maxsize=None)
def _inv_consts():
    """Inverse-leaf matrices for the 960-pt case, conjugate butterfly
    twiddles, and the synthesis window."""
    A, B0, Bj = _inv_leaf_matrices(_LEAF, _TGROUP, 1.0)
    # Merge twiddles W_L^{-n} = conj(W_L^n).  No 1/2 per level: the leaf
    # matrices compute UNSCALED inverse DFTs (sum over bins), and in that
    # convention  x[n] = ua[n] + W^{-n} ub[n]  exactly (the 1/2 belongs only
    # to the normalized-IDFT formulation).
    tws = []
    for L in (240, 480, 960):
        c, s = _twiddle(L)
        tws.append((c, -s))
    win = tables.full_window().astype(np.float32)[None, :]
    return A, B0, Bj, tws, win


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


@functools.lru_cache(maxsize=None)
def _post_consts():
    """bf16-split permuted interp matrix [NB, PERM_WIDTH] and band matrix
    [PERM_WIDTH, NB] for the fused post-filter kernel."""
    from .transform import _band_matrix_for, _interp_matrix_for
    interp = np.ascontiguousarray(_interp_matrix_for(PERM_WIDTH).T)
    band = np.ascontiguousarray(_band_matrix_for(PERM_WIDTH).T)
    return _bf16_split(interp.astype(np.float32)), \
        _bf16_split(band.astype(np.float32))


def _post_body(dX, dP, dEx_, dEp, dExp, g, lastg, Ex, sil, smem,
               ih, il, bh, bl, Ah, Al, B0h, B0l, Bjh, Bjl, tws, win):
    """Value-level fused rnn_pitch_filter + gain smoothing/apply + silence
    blend + factored inverse DFT + OLA (reference denoise.c:421-455,
    477-496) on permuted spectra.  sil: [B, 1] bool.  Returns
    (out_pcm, new_smem, new_lastg) — shared by the per-frame kernel and the
    whole-frame monokernel."""
    Xre, Xim = dX[:, :PERM_WIDTH], dX[:, PERM_WIDTH:]
    Pre, Pim = dP[:, :PERM_WIDTH], dP[:, PERM_WIDTH:]
    sq = lambda v: v * v  # noqa: E731

    # per-band comb strength r (denoise.c:429-441)
    r = jnp.where(dExp > g, 1.0,
                  sq(dExp) * (1.0 - sq(g))
                  / (0.001 + sq(g) * (1.0 - sq(dExp))))
    r = jnp.sqrt(jnp.clip(r, 0.0, 1.0)) * jnp.sqrt(dEx_ / (1e-8 + dEp))
    rf = _x3_dot(r, ih, il)                                # [B, 488]
    Yre = Xre + rf * Pre
    Yim = Xim + rf * Pim
    newE = _x3_dot(sq(Yre) + sq(Yim), bh, bl)              # [B, 32]
    norm = jnp.sqrt(dEx_ / (1e-8 + newE))
    # gain decay cap + energy-compensated lastg (denoise.c:479-489).
    # normf and gf are separate per-bin interpolations multiplied per bin
    # (denoise.c:447-453 then 490-494) — interp(norm·gc) would be different
    # math, so two dots.
    gc = jnp.maximum(g, 0.6 * lastg)
    scale = _x3_dot(norm, ih, il) * _x3_dot(gc, ih, il)
    Yre = Yre * scale
    Yim = Yim * scale
    Yre = jnp.where(sil, Xre, Yre)
    Yim = jnp.where(sil, Xim, Yim)
    lastg_new = jnp.minimum(1.0, gc * (dEx_ + 1e-3) / (Ex + 1e-3))
    lastg_new = jnp.where(sil, lastg, lastg_new)

    x = _dif_inverse(jnp.concatenate([Yre, Yim], axis=1),
                     Ah, Al, B0h, B0l, Bjh, Bjl, tws, win)
    return x[:, :FRAME_SIZE] + smem, x[:, FRAME_SIZE:], lastg_new


def _post_kernel(dX, dP, dEx, dEp, dExp, g_ref, lastg_ref, Ex_ref, sil_ref,
                 smem_ref,
                 ih, il, bh, bl, Ah, Al, B0h, B0l, Bjh, Bjl,
                 tc0, ts0, tc1, ts1, tc2, ts2, win_ref,
                 out_ref, smem_out, lastg_out):
    tws = [(tc0[:], ts0[:]), (tc1[:], ts1[:]), (tc2[:], ts2[:])]
    out_ref[:], smem_out[:], lastg_out[:] = _post_body(
        dX[:], dP[:], dEx[:], dEp[:], dExp[:], g_ref[:], lastg_ref[:],
        Ex_ref[:], sil_ref[:] > 0.5, smem_ref[:],
        ih[:], il[:], bh[:], bl[:], Ah[:], Al[:], B0h[:], B0l[:],
        Bjh[:], Bjl[:], tws, win_ref[:])


def postfilter_synthesis(dX, dP, dEx, dEp, dExp, g, lastg, Ex, silence,
                         synthesis_mem, block: int = 256,
                         interpret: bool = False):
    """Fused delayed-frame tail: returns (out_pcm[S,480], new_synthesis_mem
    [S,480], new_lastg[S,32]).  Permuted-layout equivalent of
    pitch_filter + gain apply + silence blend + frame_synthesis."""
    from jax.experimental import pallas as pl

    S = dX.shape[0]
    arrays = (dX, dP, dEx, dEp, dExp, g, lastg, Ex,
              silence.astype(jnp.float32)[:, None], synthesis_mem)
    arrays, S_pad = _pad_streams(arrays, S)
    block = min(block, S_pad)
    assert S_pad % block == 0, (S_pad, block)
    (ih, il), (bh, bl) = _post_consts()
    (Ah, Al), (B0h, B0l), (Bjh, Bjl), tws, win = _inv_consts()
    consts = [ih, il, bh, bl, Ah, Al, B0h, B0l, Bjh, Bjl,
              tws[0][0], tws[0][1], tws[1][0], tws[1][1],
              tws[2][0], tws[2][1], win]

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    widths = [2 * PERM_WIDTH, 2 * PERM_WIDTH, 32, 32, 32, 32, 32, 32, 1,
              FRAME_SIZE]
    out, smem, lastg_new = pl.pallas_call(
        _post_kernel,
        grid=(S_pad // block,),
        in_specs=[row_spec(w) for w in widths] +
                 [const_spec(a) for a in consts],
        out_specs=(row_spec(FRAME_SIZE), row_spec(FRAME_SIZE), row_spec(32)),
        out_shape=(jax.ShapeDtypeStruct((S_pad, FRAME_SIZE), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, FRAME_SIZE), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, 32), jnp.float32)),
        interpret=interpret,
    )(*arrays, *[jnp.asarray(a) for a in consts])
    return out[:S], smem[:S], lastg_new[:S]


def _inv_kernel(Xp_ref, Ah, Al, B0h, B0l, Bjh, Bjl,
                tc0, ts0, tc1, ts1, tc2, ts2, win_ref, out_ref):
    tws = [(tc0[:], ts0[:]), (tc1[:], ts1[:]), (tc2[:], ts2[:])]
    out_ref[:] = _dif_inverse(Xp_ref[:], Ah[:], Al[:], B0h[:], B0l[:],
                              Bjh[:], Bjl[:], tws, win_ref[:])


def inverse_spectral(Xp: jax.Array, block: int = 256,
                     interpret: bool = False) -> jax.Array:
    # block=256 (not 512): identical throughput at S=4096, but two kernel
    # instances then fit scoped VMEM together, which the unroll=2 scan in
    # process_frames needs (512 -> 17.25M > 16M scoped-vmem OOM).
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
