"""Fused Pallas pitch-correlation kernel: the 385-lag fine correlation table
via factored DFT-1024 (correlation theorem), entirely VMEM-resident.

Replaces the grouped-conv formulation of ``pitch.lag_corr_table`` on TPU
(reference loops: rnn_pitch_xcorr / celt_inner_prod, src/pitch.c:216-279 and
pitch.h:51-142).  Per stream:

    bx[i] = sum_{j<480} ds[384+j] * ds[i+j],   i = 0..384

is a linear correlation of x = ds[384:864] (zero-padded) with y = ds[0:864]
(zero-padded) — length 1024 covers the maximum index 863, so the circular
form is exact:

    bx = IDFT_1024( conj(DFT x) * DFT y )[0:385]

Both DFTs and the inverse use the same 3-level DIF radix-2 machinery as
pallas_spectral (1024 = 8 x 128, leaf DFT-128 matmuls on the MXU, butterfly
twiddles on the VPU, X3 bf16 splits).  The spectra never leave VMEM and no
lane reversal exists anywhere: conjugate symmetry is folded into the static
inverse-leaf matrices (pallas_spectral._inv_leaf_matrices).

Grouped-conv xcorr runs at ~5 TF/s on v5e (pathological [1, S, lags]
layouts); this runs the same math as ~6 Mflop/stream of dense bf16 matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_spectral import (_bf16_split, _dif_split, _fwd_leaf_matrices,
                              _inv_leaf_matrices, _pad_streams, _twiddle,
                              _x3_dot, _bitrev3)

_N = 1024
_NLEAF = 8
_LEAF = _N // _NLEAF                 # 128
_TGROUP = _LEAF // 2 + 1             # 65
_DS_LEN = 864
_X_OFF = 384
_NLAGS = 385


@functools.lru_cache(maxsize=None)
def _xcorr_consts():
    fwd_tws = [_twiddle(L) for L in (1024, 512, 256)]
    inv_tws = [(c, -s) for (c, s) in (_twiddle(L) for L in (256, 512, 1024))]
    (mch, mcl), (mrh, mrl) = _fwd_leaf_matrices(_LEAF, _TGROUP, 1.0)
    (Ah, Al), (B0h, B0l), (Bjh, Bjl) = _inv_leaf_matrices(
        _LEAF, _TGROUP, 1.0 / _N)
    flat = []
    for c, s in fwd_tws + inv_tws:
        flat += [c, s]
    flat += [mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl]
    return flat


def _dif_forward_1024(v, tws, mch, mcl, mrh, mrl):
    """v: [B, N] real -> permuted spectrum ([B, 8*tg], [B, 8*tg]) re, im.
    Leaf at position p holds natural bins k = 8t + bitrev3(p).  Size-generic
    over the 3-level DIF with 8 leaves: the leaf width is inferred from the
    matrices, so the same machinery serves N=1024 (fine correlation) and
    N=512 (the monokernel's coarse correlation, pallas_frame)."""
    tgroup = mch.shape[1] // 2
    seqs = [(v, None)]
    for (twc, tws_) in tws:
        seqs = [out for s in seqs for out in _dif_split(s, twc, tws_)]
    B = v.shape[0]
    cplx = jnp.concatenate(
        [jnp.concatenate([re, im], axis=1) for re, im in seqs[1:]], axis=0)
    spec_c = _x3_dot(cplx, mch, mcl)                     # [7B, 2*tg]
    groups = [None] * _NLEAF
    groups[_bitrev3(0)] = _x3_dot(seqs[0][0], mrh, mrl)
    for p in range(1, _NLEAF):
        groups[_bitrev3(p)] = spec_c[(p - 1) * B:p * B]
    re = jnp.concatenate([g[:, :tgroup] for g in groups], axis=1)
    im = jnp.concatenate([g[:, tgroup:] for g in groups], axis=1)
    return re, im


def _dif_inverse_1024(re, im, Ah, Al, B0h, B0l, Bjh, Bjl, tws):
    """Permuted spectrum [B, 8*tg] re/im (conjugate-symmetric) -> [B, N]
    real time signal (scaled 1/N via the leaf matrices).  Size-generic like
    :func:`_dif_forward_1024`."""
    B = re.shape[0]
    tgroup = re.shape[1] // _NLEAF
    leaf = Ah.shape[1] // 2

    def stored(j):
        return jnp.concatenate(
            [re[:, j * tgroup:(j + 1) * tgroup],
             im[:, j * tgroup:(j + 1) * tgroup]], axis=1)

    direct_in = jnp.concatenate([stored(j) for j in range(_NLEAF)], axis=0)
    direct = _x3_dot(direct_in, Ah, Al)                  # [8B, 256]
    conj_in = jnp.concatenate(
        [stored((_NLEAF - j) % _NLEAF) for j in range(1, _NLEAF)], axis=0)
    conj_c = _x3_dot(conj_in, Bjh, Bjl)                  # [7B, 256]
    leaves = [None] * _NLEAF
    for j in range(_NLEAF):
        tm = direct[j * B:(j + 1) * B]
        if j == 0:
            tm = tm + _x3_dot(stored(0), B0h, B0l)
        else:
            tm = tm + conj_c[(j - 1) * B:j * B]
        leaves[_bitrev3(j)] = (tm[:, :leaf], tm[:, leaf:])

    for lvl, (twc, tws_) in enumerate(tws):
        last = lvl == len(tws) - 1
        nxt = []
        for i in range(0, len(leaves), 2):
            (a_re, a_im), (b_re, b_im) = leaves[i], leaves[i + 1]
            bw_re = b_re * twc - b_im * tws_
            v_re = jnp.concatenate([a_re + bw_re, a_re - bw_re], axis=1)
            if last:
                nxt.append((v_re, None))
            else:
                bw_im = b_re * tws_ + b_im * twc
                v_im = jnp.concatenate([a_im + bw_im, a_im - bw_im], axis=1)
                nxt.append((v_re, v_im))
        leaves = nxt
    return leaves[0][0]


def _xcorr_kernel(ds_ref,
                  ftc0, fts0, ftc1, fts1, ftc2, fts2,
                  itc0, its0, itc1, its1, itc2, its2,
                  mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl,
                  bx_ref, *, block):
    ds = ds_ref[:]
    z_x = jnp.zeros((block, _N - (_DS_LEN - _X_OFF)), jnp.float32)
    z_y = jnp.zeros((block, _N - _DS_LEN), jnp.float32)
    x = jnp.concatenate([ds[:, _X_OFF:], z_x], axis=1)
    y = jnp.concatenate([ds, z_y], axis=1)
    ftws = [(ftc0[:], fts0[:]), (ftc1[:], fts1[:]), (ftc2[:], fts2[:])]
    itws = [(itc0[:], its0[:]), (itc1[:], its1[:]), (itc2[:], its2[:])]
    xr, xi = _dif_forward_1024(x, ftws, mch[:], mcl[:], mrh[:], mrl[:])
    yr, yi = _dif_forward_1024(y, ftws, mch[:], mcl[:], mrh[:], mrl[:])
    # C = conj(X) * Y, valid on every stored slot incl. the extension bins
    cr = xr * yr + xi * yi
    ci = xr * yi - xi * yr
    corr = _dif_inverse_1024(cr, ci, Ah[:], Al[:], B0h[:], B0l[:],
                             Bjh[:], Bjl[:], itws)
    bx_ref[:] = corr[:, :_NLAGS]


def lag_corr_table_pallas(ds: jax.Array, block: int = 256,
                          interpret: bool = False) -> jax.Array:
    """ds: [S, 864] downsampled whitened pitch buffer -> bx [S, 385],
    bx[s, i] = sum_{j<480} ds[s, 384+j] * ds[s, i+j]."""
    from jax.experimental import pallas as pl

    S = ds.shape[0]
    (ds,), S_pad = _pad_streams((ds,), S)
    block = min(block, S_pad)
    assert S_pad % block == 0, (S_pad, block)
    consts = _xcorr_consts()

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    bx = pl.pallas_call(
        functools.partial(_xcorr_kernel, block=block),
        grid=(S_pad // block,),
        in_specs=[row_spec(_DS_LEN)] + [const_spec(a) for a in consts],
        out_specs=row_spec(_NLAGS),
        out_shape=jax.ShapeDtypeStruct((S_pad, _NLAGS), jnp.float32),
        interpret=interpret,
    )(ds, *[jnp.asarray(a) for a in consts])
    return bx[:S]


# ---------------------------------------------------------------------------
# direct (un-factored) correlation: all-MXU, zero butterfly/layout ops
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _direct_corr_consts(n: int, x_len: int, y_len: int, nlags: int,
                        fold: bool = False):
    """Constant matrices for corr[u] = sum_j x[j] * y[u + j] via the
    correlation theorem with DIRECT DFT matmuls (no factorization):

        spec = sig @ F          F [len, 2*(n//2+1)] = [cos | sin] columns
        C    = conj(X) * Y      (4 elementwise ops on n//2+1 bins)
        corr = [Cr | Ci] @ A    A [2*(n//2+1), nlags] real-inverse columns
                                (conjugate symmetry + 1/n folded in)

    Rationale (v5e, r3): the factored 3-level DIF spends ~40% of the pitch
    span in VPU butterflies and layout concats; the direct form is 9 bf16-X3
    matmuls and 4 VPU multiplies total, and zero-pad rows are simply absent
    from F (exact).  Numerics: same ~1e-6 class as the factored X3 path
    (f32 MXU accumulation of bf16-split products), i.e. inside the ranking
    tolerance the parity suite budgets for.  Returns bf16 hi/lo pairs.

    ``fold`` stores the spectra in FOLDED bin order: lane j < nb/2 holds
    natural bin j, lane nb/2 + j holds bin n/2 - j (requires nb even, i.e.
    n = 2 mod 4).  conj-mult and the inverse are bin-order agnostic (A's
    rows are permuted to match), so corr is unchanged up to f32 accumulation
    order — but radix-2 aliasing of the spectrum becomes a pure elementwise
    op on adjacent half-lanes: E(k) = (X(k) + conj(X(n/2 - k)))/2 reads
    lanes j and nb/2 + j.  Mosaic has no lane-reversal primitive ("rev"
    fails to lower), so this column-order trick is what makes the
    alias-coarse pitch path (pallas_frame._pitch_chain_alias) lowerable at
    zero extra flops."""
    nb = n // 2 + 1
    if fold:
        assert nb % 2 == 0, (n, nb)
        half = nb // 2
        order = np.concatenate(
            [np.arange(half), n // 2 - np.arange(half)])
        assert sorted(order.tolist()) == list(range(nb))
    else:
        order = np.arange(nb)
    k = order

    def fwd(length):
        j = np.arange(length)[:, None]
        ang = -2.0 * np.pi * (j * k) / n
        F = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
        return _bf16_split(F.astype(np.float32))

    u = np.arange(nlags)[None, :]
    angu = 2.0 * np.pi * (k[:, None] * u) / n        # inverse sign
    # bin-indexed weights (NOT positional: under ``fold`` the n/2 bin sits
    # mid-array): single-count DC and, for even n, the n/2 bin
    w = np.where((k == 0) | ((n % 2 == 0) & (k == n // 2)),
                 1.0 / n, 2.0 / n)[:, None]
    # corr[u] = sum_k w_k * (Cr_k cos(2pi k u / n) - Ci_k sin(2pi k u / n));
    # C = conj(X) Y so Ci enters with +sin(angu)... derive: taking
    # corr = (1/n) sum_{k=0}^{n-1} C_k e^{+2pi i k u / n} real part with
    # conjugate symmetry folded into doubled weights:
    A = np.concatenate([w * np.cos(angu), -w * np.sin(angu)], axis=0)
    Ah, Al = _bf16_split(A.astype(np.float32))
    (Fxh, Fxl) = fwd(x_len)
    (Fyh, Fyl) = fwd(y_len)
    return Fxh, Fxl, Fyh, Fyl, Ah, Al


def _direct_corr_fwd(x, y, consts):
    """The two forward spectra of :func:`_direct_corr`: ([B, 2*nb], [B, 2*nb])
    re|im-concatenated."""
    Fxh, Fxl, Fyh, Fyl, Ah, Al = consts
    return _x3_dot(x, Fxh, Fxl), _x3_dot(y, Fyh, Fyl)


def _direct_corr_inv(xs, ys, consts):
    """conj(X) * Y -> inverse matmul: the back half of :func:`_direct_corr`."""
    Fxh, Fxl, Fyh, Fyl, Ah, Al = consts
    nb = Fxh.shape[1] // 2
    xr, xi = xs[:, :nb], xs[:, nb:]
    yr, yi = ys[:, :nb], ys[:, nb:]
    cr = xr * yr + xi * yi                            # conj(X) * Y
    ci = xr * yi - xi * yr
    return _x3_dot(jnp.concatenate([cr, ci], axis=1), Ah, Al)


def _direct_corr(x, y, consts):
    """x [B, x_len], y [B, y_len] -> corr [B, nlags] with
    corr[u] = sum_j x[j] * y[u + j] (zero-extended).  consts from
    _direct_corr_consts (pass jnp arrays inside pallas bodies)."""
    return _direct_corr_inv(*_direct_corr_fwd(x, y, consts), consts)
