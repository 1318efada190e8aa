"""Whole-frame monokernel (round-3 flagship): one Pallas call advances a
block of streams by one 10 ms frame, with per-stream state living in VMEM
scratch across a sequential T grid so a whole chunk's state never touches
HBM (mechanism pinned by tests/test_pallas.py::test_grid_carry_scratch).

This module composes the already-validated value-level kernel bodies:

  * biquad-as-matmul               (dsp.biquad exact precomputed kernels)
  * decimation + LPC whitening     (dsp.pitch.pitch_downsample, reused)
  * coarse pitch search            (_coarse_body below — direct 147-lag
                                    correlation + banded-matmul energies)
  * fine search + doubling ladder  (pallas_analysis._pitch_body)
  * window extraction + fwd DFTs   (pallas_spectral machinery)
  * band energies / features       (exact-f32 dots on the permuted layout)
  * fused RNN + silence freeze     (pallas_rnn._rnn_body)
  * post-filter + inverse + OLA    (pallas_spectral._post_body)

``frame_body`` is pure jnp over plain arrays, so its numerics are tested
directly against denoise.process_frame on CPU before any Mosaic involvement;
the pallas wrappers then only add ref plumbing.

Status: frame_body validated vs process_frame (test_pallas); the
grid-carried pallas wrapper is round-3 work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (FRAME_SIZE, NB_BANDS, PITCH_BUF_SIZE, PITCH_MAX_PERIOD,
                      SILENCE_THRESHOLD, WINDOW_SIZE)
from .. import tables
from . import pitch as pitch_mod
from .biquad import _biquad_kernels
from .pallas_analysis import _box_matrix, _pitch_body
from .pallas_spectral import (PERM_WIDTH, _bf16_split, _dif_forward,
                              _fwd_consts, _inv_consts, _post_consts,
                              _take_window_vmem)
from .pallas_xcorr import _direct_corr_consts, _xcorr_consts

# Correlation formulation for the pitch chain inside the monokernel:
# True = direct X3 matmul correlation (_direct_corr, all-MXU, ~6e-6 rel);
# False = the factored 3-level DIF machinery (~1e-6 rel, more VPU).  Both
# are in the ranking-tolerance class; frame_consts() is lru_cached, so flip
# only before first use (tests clear the cache explicitly).
_DIRECT_CORR = True

# Derive the coarse (4x) correlation from the FINE n=894 spectra by radix-2
# aliasing instead of its own forward DFTs: X4(k) = (X(k) + conj(X(447-k)))/2
# is the 447-point DFT of the even-decimated signal, 447 >= 386 covers the
# coarse linear correlation without wrap, and the truncation of y4 at 387
# is immaterial (u + i <= 385 for every coarse lag u <= 146).  This removes
# the even-selection matmul and both coarse forward DFTs (~2.3M of the pitch
# span's ~9M X3 MACs/stream) for two lane flips and a few VPU adds.  The
# coarse table's rounding changes class (~1e-5 vs ~6e-6) — same ranking
# tolerance as the parity suite budgets; decisions validated on the stateful
# chain (tests/test_monokernel.py::test_alias_coarse_decisions).  Requires
# _DIRECT_CORR.  lru-cached consts: flip only before first use.
# Default ON: measured on-chip at S=3072/T=400/b384/fps=1 (2026-08-19,
# scripts/bench_mono.py): alias 1.444 vs own-DFT 1.495 ms/frame (-3.4%);
# with _INC_DS and _BATCH_FWD at their measured defaults the alias
# formulation is part of the shipping 1.341 ms/frame config.
_ALIAS_COARSE = True

import contextlib


@contextlib.contextmanager
def alias_coarse(enabled: bool):
    """Scoped flip of _ALIAS_COARSE with structural cache/flag restoration
    (tests and bench sessions must not leak alias-mode consts into later
    work in the same process)."""
    global _ALIAS_COARSE
    prev = _ALIAS_COARSE
    if prev != enabled:
        _ALIAS_COARSE = enabled
        frame_consts.cache_clear()
    try:
        yield
    finally:
        if _ALIAS_COARSE != prev:
            _ALIAS_COARSE = prev
            frame_consts.cache_clear()


_MAXP2 = pitch_mod._MAXP2
_N2 = pitch_mod._N2
_NL4 = pitch_mod._MAX_PITCH // 4         # 147 coarse lags
_LEN4 = _N2 // 2                         # 240
_Y4_LEN = 2 * ((_N2 * 2 + pitch_mod._MAX_PITCH) // 4) // 2   # 387


class FrameConsts(NamedTuple):
    """Every constant array the frame body needs (all trace-time static)."""

    # biquad (exact f32 kernels)
    bq_K: np.ndarray         # [480, 480]
    bq_rowA: np.ndarray      # [480, 2]
    bq_SA: np.ndarray        # [2, 2]
    bq_SB: np.ndarray        # [480, 2]
    # decimation (Mosaic has no strided lane slice — probed on this
    # toolchain: x[:, ::2], lax.slice strides and lane-splitting reshapes
    # all fail to lower.  Even-sample extraction is a single-1-per-column
    # selection matmul instead; stored bf16 (0/1 exact) and applied via
    # _sel_dot's 3-term split, which is still EXACT: each output column
    # selects one x, whose three non-overlapping bf16 mantissa segments
    # (8+8+8 bits >= f32's 24) recombine without rounding, at full-rate
    # bf16 MXU passes instead of the 6-pass f32 path.)
    sel_even: np.ndarray     # [864, 432] bf16
    # smoothing (0.25/0.5/0.25) FOLDED into the even-selection: column m of
    # sm0 holds taps at rows 2m-1, 2m, 2m+1 (col 0 = the reference boundary
    # blend 0.5 x[0] + 0.25 x[1]); sm1 is the second half, shifted one row
    # so its col 0 reaches x[863] (the cross-half neighbour).  Entries are
    # powers of two — exact in bf16 — so _sel_dot keeps every product exact
    # and the output differs from the sequential smooth-then-select
    # formulation only in f32 summation order (~1 ulp).
    sel_sm0: np.ndarray      # [864, 432] bf16
    sel_sm1: np.ndarray      # [865, 432] bf16
    # incremental decimation: the 240 NEW smoothed-even samples each frame
    # come from the shifted pitch_buf's last 481 lanes (ds index 624+m reads
    # pb[1247+2m .. 1249+2m]); the other 624 shift out of the carried
    # ds_raw state (FrameState.ds_raw) — see frame_body
    sel_smn: np.ndarray      # [481, 240] bf16
    # coarse search (own-DFT path; () when the alias path is active)
    box387: tuple            # ([387, 147] bf16 banded ones,) or ()
    c512: tuple              # factored DFT-512 consts (coarse correlation)
    # fine/doubling span
    c1024: tuple             # pallas_xcorr consts
    box864: tuple            # ([864, 385] bf16,) or ()
    # alias-coarse path: (boxall [864, 532] bf16 h-only exact 0/1,
    #                     A4h, A4l [448, 147]) or ()
    alias: tuple
    # forward 960 DFT
    win: np.ndarray
    tws9: tuple
    leaf9: tuple             # (mch, mcl, mrh, mrl)
    # features
    band_p: np.ndarray       # [488, 32] f32 (permuted band matrix, exact)
    dct_t: np.ndarray        # [32, 32] f32 (DCT matrix transposed)
    # post-filter / inverse
    interp_hl: tuple         # (ih, il) [32, 488] bf16 pair
    band_hl: tuple           # (bh, bl) [488, 32] bf16 pair
    inv: tuple               # (Ah, Al, B0h, B0l, Bjh, Bjl, tws, win)


@functools.lru_cache(maxsize=None)
def frame_consts() -> FrameConsts:
    from .transform import _band_matrix_for
    K, rowA, SA, SB = _biquad_kernels(
        tuple(np.asarray(tables.BIQUAD_HP_B, np.float64)),
        tuple(np.asarray(tables.BIQUAD_HP_A, np.float64)), FRAME_SIZE)
    box387 = np.zeros((_Y4_LEN, _NL4), np.float32)
    for u in range(_NL4):
        box387[u:u + _LEN4, u] = 1.0
    half = pitch_mod._DS_LEN                     # 864
    sel_even = np.zeros((half, half // 2), np.float32)
    sel_even[np.arange(0, half, 2), np.arange(half // 2)] = 1.0
    sel_even = sel_even.astype(np.dtype("bfloat16"))
    m = np.arange(half // 2)
    sm0 = np.zeros((half, half // 2), np.float32)
    sm0[2 * m, m] = 0.5
    sm0[2 * m + 1, m] = 0.25
    sm0[2 * m[1:] - 1, m[1:]] = 0.25             # col 0: boundary blend
    sm1 = np.zeros((half + 1, half // 2), np.float32)
    sm1[2 * m, m] = 0.25                         # row r = x[863 + r]
    sm1[2 * m + 1, m] = 0.5
    sm1[2 * m + 2, m] = 0.25
    mn = np.arange(240)
    smn = np.zeros((481, 240), np.float32)       # row r = pb[1247 + r]
    smn[2 * mn, mn] = 0.25
    smn[2 * mn + 1, mn] = 0.5
    smn[2 * mn + 2, mn] = 0.25
    win, tws9, leaf_c, leaf_r = _fwd_consts()
    (ih, il), (bh, bl) = _post_consts()
    (Ah, Al), (B0h, B0l), (Bjh, Bjl), itws, iwin = _inv_consts()
    if _ALIAS_COARSE and not _DIRECT_CORR:
        # the alias derivation only exists on the direct-corr fine spectra;
        # a silent fallback here would make a flag-flipping bench session
        # measure the wrong formulation while believing alias is active
        raise ValueError("_ALIAS_COARSE requires _DIRECT_CORR")
    alias = ()
    coarse_own = (_direct_corr_consts(510, _LEN4, _Y4_LEN, _NL4)
                  if _DIRECT_CORR else _coarse512_consts())
    # 384-lane fine table (lags 0..383): lag 384 is the x-energy, computed
    # as a direct reduce instead (_pitch_body xx) — drops the 4th 128-lane
    # tile from the inverse matmul and the wide ladder reduces, exactly
    box864 = ((_box_matrix()[:, :_MAXP2]
               if _DIRECT_CORR else _box_matrix()),)
    if _ALIAS_COARSE:
        alias = _alias_coarse_consts()
        coarse_own, box864 = (), ()
    return FrameConsts(
        bq_K=K.T.copy(), bq_rowA=rowA.T.copy(), bq_SA=SA.T.copy(), bq_SB=SB,
        sel_even=sel_even,
        sel_sm0=sm0.astype(np.dtype("bfloat16")),
        sel_sm1=sm1.astype(np.dtype("bfloat16")),
        sel_smn=smn.astype(np.dtype("bfloat16")),
        box387=(() if alias else (box387.astype(np.dtype("bfloat16")),)),
        # Direct-DFT n has no radix constraint — only n >= max index + 1
        # (fine: 384+479 = 863; coarse: 146+239 = 385, no circular wrap).
        # Pick n with n + 2 = 2*(n//2+1) an exact multiple of 128 so the
        # spectrum width fills lane tiles: fine n=894 -> 896 lanes (n=1024
        # pads 1026 -> 1152, +29% dead MXU columns), coarse n=510 -> 512
        # (n=512 pads 514 -> 640).
        c512=coarse_own,
        # fold=True (alias path) stores the fine spectra in folded bin order
        # so the coarse radix-2 aliasing is elementwise (Mosaic cannot lower
        # lane reversal) — see _direct_corr_consts
        c1024=(_direct_corr_consts(894, pitch_mod._N2, pitch_mod._DS_LEN,
                                   pitch_mod._MAXP2,
                                   fold=bool(_ALIAS_COARSE))
               if _DIRECT_CORR else tuple(_xcorr_consts())),
        box864=box864,
        alias=alias,
        win=win, tws9=tws9, leaf9=leaf_c + leaf_r,
        band_p=np.ascontiguousarray(
            _band_matrix_for(PERM_WIDTH).T.astype(np.float32)),
        dct_t=np.ascontiguousarray(tables.dct_matrix().T.astype(np.float32)),
        interp_hl=(ih, il), band_hl=(bh, bl),
        inv=(Ah, Al, B0h, B0l, Bjh, Bjl, itws, iwin),
    )


def _f32dot(a, b):
    return jnp.dot(a, b, precision="float32",
                   preferred_element_type=jnp.float32)


def _sel_dot(x, sel):
    """Exact selection matmul: x [B, n] f32, sel [n, m] bf16 with a single
    1.0 per column -> x's selected columns, bit-exact (see FrameConsts
    sel_even note), in three full-rate bf16 MXU passes."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(f32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(f32)).astype(jnp.bfloat16)
    return (jnp.dot(xh, sel, preferred_element_type=f32)
            + jnp.dot(xm, sel, preferred_element_type=f32)
            + jnp.dot(xl, sel, preferred_element_type=f32))


# Perf-ablation switches (cost attribution inside the monokernel, used by
# the profiling scripts only — production always runs with the empty set):
# members of {"biquad", "features", "ds", "ds_sm", "ds_sel", "ds_lpc",
# "ds_fir", "coarse", "pitch", "take_window", "nn", "post", "fwd"} skip
# that stage with shape-compatible stand-ins so the compiler drops its
# compute; full-minus-ablated deltas attribute the frame cost per stage.
_ABLATE: frozenset = frozenset()
_SKIP_CONST_READ = False      # profiling only (see _frame_kernel)

# A/B formulation switches (bisected the 65dde22 cuts on-chip; both
# formulations are value-identical for every DECISION — see frame_body):
# incremental 240-sample ds update vs full per-frame decimation, and the
# batched dual forward DFT-960 vs two separate calls.  Measured at
# S=3072/T=400/alias/fps=1 (scripts/bench_mono.py, 2026-08-19): both off
# 1.478 ms/frame, _INC_DS only 1.404 (the win), _BATCH_FWD only 1.509
# (the regression — the [2B, n] concat/split costs more than the saved
# dispatch, and it fattens scoped-VMEM peak enough to OOM fps=2).
# Defaults are the measured winners.
_INC_DS = True
_BATCH_FWD = False
_BATCH_FWD_DEFAULT = _BATCH_FWD   # tests key their bitwise claim off this

# frames_per_step body form: False = python-unrolled (fps copies of
# frame_body; ~45 min relay compiles at fps=4), True = lax.fori_loop with
# dynamic pcm/out indexing (one body copy, flat compile time, enables large
# fps).  Bitwise-equal by construction (interpret-validated,
# tests/test_monokernel.py::test_monokernel_fps_loop_bitwise).  MEASURED
# on-chip (r5, S=3072/T=400/b256): loop fps=4 1.394 ms/frame vs unrolled
# 1.341 (Mosaic pipelines the unrolled copies better), but the loop form
# keeps improving with fps at FLAT compile time: fps=8 1.368 (135 s
# compile).  _FPS_UNROLL hybridises: the fori_loop body advances that many
# unrolled frames per iteration (compile cost of the unrolled body, scratch
# sync amortised over the whole fps span) — fps=16/unroll=4 = 4 iterations
# of the 4-frame body.
_FPS_LOOP = False
_FPS_UNROLL = 4


def _decimate_full(pitch_buf, sel_sm0, sel_sm1):
    """Full smoothed-even decimation of a 1728-sample pitch buffer ->
    [B, 864] raw (unwhitened) 24 kHz buffer: the 0.25/0.5/0.25 smoothing and
    the even-sample extraction as ONE folded selection matmul per half
    (exact power-of-two taps — see FrameConsts).  Used once per chunk to
    initialise the carried FrameState.ds_raw (state_from_denoise); the
    per-frame update is incremental (240 new samples, frame_body).  Lane 0
    IS boundary-blended here: sel_sm0's column 0 is exactly the reference
    left-edge blend 0.5*x[0] + 0.25*x[1] (the _INC_DS=False branch of
    frame_body relies on that).  Under _INC_DS the chunk-init lane 0
    shifts out before first use and frame_body re-applies the blend to the
    current window edge each frame."""
    e0 = _sel_dot(pitch_buf[:, :pitch_mod._DS_LEN], sel_sm0)
    e1 = _sel_dot(pitch_buf[:, pitch_mod._DS_LEN - 1:], sel_sm1)
    return jnp.concatenate([e0, e1], axis=-1)


def _whiten_body(x_lp):
    """LPC whitening of the decimated buffer (rnn_pitch_downsample's second
    half, reference pitch.c:146-214): order-4 autocorr + lag window +
    Levinson + damped fir5, value-identical to pitch_mod.pitch_downsample
    up to reduction order in the autocorrelation."""
    S = x_lp.shape[0]
    n = pitch_mod._DS_LEN
    if "ds_lpc" in _ABLATE:
        lpc = [jnp.full((S, 1), 0.01 * (i + 1), jnp.float32)
               for i in range(4)]
    else:
        # order-4 autocorr + lag window (rnn_autocorr, celt_lpc.c:92-174)
        ac = [jnp.sum(x_lp[:, : n - k] * x_lp[:, k:], axis=-1, keepdims=True)
              for k in range(5)]
        ac[0] = ac[0] * 1.0001
        for i in range(1, 5):
            ac[i] = ac[i] - ac[i] * (0.008 * i) ** 2
        lpc = pitch_mod._levinson4(ac)
    tmp = 1.0
    for i in range(4):
        tmp *= 0.9
        lpc[i] = lpc[i] * tmp
    c1 = 0.8
    num = [lpc[0] + c1, lpc[1] + c1 * lpc[0], lpc[2] + c1 * lpc[1],
           lpc[3] + c1 * lpc[2], c1 * lpc[3]]
    if "ds_fir" in _ABLATE:
        return x_lp + num[0]
    # celt_fir5 (pitch.c:104-143)
    y = x_lp
    for k in range(5):
        shifted = jnp.concatenate(
            [jnp.zeros((S, k + 1), x_lp.dtype), x_lp[:, : n - k - 1]],
            axis=-1)
        y = y + num[k] * shifted
    return y


@functools.lru_cache(maxsize=None)
def _coarse512_consts():
    """Factored DFT-512 constants (8 leaves of 64) for the coarse
    correlation — same machinery as pallas_xcorr's 1024, smaller leaf."""
    from .pallas_spectral import (_fwd_leaf_matrices, _inv_leaf_matrices,
                                  _twiddle)
    n, leaf, tg = 512, 64, 33
    fwd_tws = [_twiddle(L) for L in (512, 256, 128)]
    inv_tws = [(c, -s) for (c, s) in (_twiddle(L) for L in (128, 256, 512))]
    (mch, mcl), (mrh, mrl) = _fwd_leaf_matrices(leaf, tg, 1.0)
    (Ah, Al), (B0h, B0l), (Bjh, Bjl) = _inv_leaf_matrices(leaf, tg, 1.0 / n)
    flat = []
    for c, s in fwd_tws + inv_tws:
        flat += [c, s]
    flat += [mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl]
    return tuple(flat)


def _coarse_body(x_lp, sel_even, box387, c512, block):
    """4x-decimated coarse search (pitch.coarse_search semantics with the
    ratio ranking): returns (bp0, bp1) [B] int32.  The 4x signals come from
    one exact selection matmul (e = even(x_lp); x4/y4 are contiguous slices
    of e, value-identical to the strided-slice formulation); the 147-lag
    correlation via the correlation theorem over a factored DFT-512 (exact
    to ~1e-6 like the fine table's DFT-1024 — the direct 147-term
    multiply-reduce formulation measured 0.9 ms/frame of VPU time at
    S=3072, dominating the whole monokernel); the sliding energies as one
    banded bf16 matmul (~1e-6, ranking-tolerance class)."""
    from .pallas_xcorr import _dif_forward_1024, _dif_inverse_1024
    e = _sel_dot(x_lp, sel_even)                   # [B, 432] even samples
    x4 = e[:, pitch_mod._X_OFF // 2:pitch_mod._X_OFF // 2 + _LEN4]
    y4 = e[:, :_Y4_LEN]
    B = x_lp.shape[0]
    if len(c512) == 6:
        from .pallas_xcorr import _direct_corr
        xc4 = _direct_corr(x4, y4, c512)           # [B, 147]
    else:
        (ftc0, fts0, ftc1, fts1, ftc2, fts2,
         itc0, its0, itc1, its1, itc2, its2,
         mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl) = c512
        xpad = jnp.concatenate(
            [x4, jnp.zeros((B, 512 - _LEN4), jnp.float32)], axis=1)
        ypad = jnp.concatenate(
            [y4, jnp.zeros((B, 512 - _Y4_LEN), jnp.float32)], axis=1)
        ftws = [(ftc0, fts0), (ftc1, fts1), (ftc2, fts2)]
        itws = [(itc0, its0), (itc1, its1), (itc2, its2)]
        # batched paired forward: bitwise-equal spectra, half the ops
        r2, i2 = _dif_forward_1024(
            jnp.concatenate([xpad, ypad], axis=0), ftws, mch, mcl, mrh, mrl)
        xr, xi = r2[:B], i2[:B]
        yr, yi = r2[B:], i2[B:]
        cr = xr * yr + xi * yi                     # conj(X) * Y
        ci = xr * yi - xi * yr
        corr = _dif_inverse_1024(cr, ci, Ah, Al, B0h, B0l, Bjh, Bjl, itws)
        xc4 = corr[:, :_NL4]                       # [B, 147]
    y2 = y4 * y4
    y2h = y2.astype(jnp.bfloat16)
    y2l = (y2 - y2h.astype(jnp.float32)).astype(jnp.bfloat16)
    box = (jnp.dot(y2h, box387, preferred_element_type=jnp.float32)
           + jnp.dot(y2l, box387, preferred_element_type=jnp.float32))
    return _coarse_rank(xc4, box, block)


@functools.lru_cache(maxsize=None)
def _alias_coarse_consts():
    """Consts for the alias-coarse path: one combined fine+coarse energy
    matrix and the 447-point inverse-correlation matrix.

    boxall [864, 531]: columns 0..383 are _box_matrix's first 384 (fine
    480-tap sliding energies over d2 = ds^2; lag 384 never read — see
    _pitch_body's 384-lane contract); columns 384..530 are the coarse
    energies
    box4[u] = sum_{i=u}^{u+239} ds[2i]^2 restated on d2's 864 rows (rows
    2u..2u+478 step 2) — bitwise equal to the y4^2 @ box387 formulation
    since d2 at even rows IS y4^2 and the extra contraction terms are exact
    zeros.  Entries 0/1: exact in bf16, the X2 split lives on the d2 side.
    """
    box = np.zeros((pitch_mod._DS_LEN, _MAXP2 + _NL4), np.float32)
    for u in range(_MAXP2):
        box[u:u + _N2, u] = 1.0
    for u in range(_NL4):
        box[2 * u:2 * (u + _LEN4):2, _MAXP2 + u] = 1.0
    n4 = 447                       # 894 // 2; odd, so no last-bin halving
    nb4 = (n4 + 1) // 2            # 224 stored bins
    k = np.arange(nb4)[:, None]
    u = np.arange(_NL4)[None, :]
    angu = 2.0 * np.pi * (k * u) / n4
    w = np.full((nb4, 1), 2.0 / n4)
    w[0, 0] = 1.0 / n4
    A4 = np.concatenate([w * np.cos(angu), -w * np.sin(angu)], axis=0)
    A4h, A4l = _bf16_split(A4.astype(np.float32))
    return (box.astype(np.dtype("bfloat16")), A4h, A4l)


def _pitch_chain_alias(ds, last_period, last_gain, c, block):
    """The whole pitch chain on SHARED fine spectra (see _ALIAS_COARSE):
    one forward-DFT pair at n=894 feeds both the coarse search (by radix-2
    aliasing) and the fine 385-lag table; one combined banded matmul yields
    both energy tables from a single d2 split.  Returns (T0 [B] i32, pg)."""
    from .pallas_xcorr import _direct_corr_fwd, _direct_corr_inv
    from .pallas_spectral import _x3_dot
    f32 = jnp.float32
    c1024 = tuple(jnp.asarray(a) for a in c.c1024)
    boxall_w = jnp.asarray(c.alias[0])
    A4h, A4l = jnp.asarray(c.alias[1]), jnp.asarray(c.alias[2])

    xs, ys = _direct_corr_fwd(ds[:, pitch_mod._X_OFF:], ds, c1024)

    d2 = ds * ds
    d2h = d2.astype(jnp.bfloat16)
    d2l = (d2 - d2h.astype(f32)).astype(jnp.bfloat16)
    boxall = (jnp.dot(d2h, boxall_w, preferred_element_type=f32)
              + jnp.dot(d2l, boxall_w, preferred_element_type=f32))
    box384 = boxall[:, :_MAXP2]
    box147 = boxall[:, _MAXP2:]
    xx = jnp.sum(d2[:, pitch_mod._X_OFF:], axis=-1)

    # coarse spectra by aliasing: X4(k) = (X(k) + conj(X(447-k))) / 2.
    # The spectra arrive in FOLDED bin order (c1024 built with fold=True:
    # lane half+k holds bin 447-k), so the alias is elementwise on adjacent
    # half-lane slices — no lane reversal (Mosaic has no "rev" lowering).
    nb = 448
    half = 224

    def alias(s):
        r, i = s[:, :nb], s[:, nb:]
        return (0.5 * (r[:, :half] + r[:, half:]),
                0.5 * (i[:, :half] - i[:, half:]))

    x4r, x4i = alias(xs)
    y4r, y4i = alias(ys)
    c4r = x4r * y4r + x4i * y4i                   # conj(X4) * Y4
    c4i = x4r * y4i - x4i * y4r
    xc4 = _x3_dot(jnp.concatenate([c4r, c4i], axis=1), A4h, A4l)
    bp0, bp1 = _coarse_rank(xc4, box147, block)

    bx = _direct_corr_inv(xs, ys, c1024)
    return _pitch_body(ds, bp0, bp1, last_period, last_gain,
                       (), None, block, bx=bx, box=box384, xx=xx)


def _coarse_rank(xc4, box147, block):
    """Coarse two-candidate ratio ranking (pitch.coarse_search semantics):
    xc4 [B, 147] correlations, box147 [B, 147] sliding energies ->
    (bp0, bp1) [B] int32."""
    syy = jnp.maximum(1.0 + box147, 1.0)
    num = jnp.square(xc4 * 1e-12)
    mask = xc4 > 0
    q = jnp.where(mask, num / syy, -jnp.inf)
    lags = jax.lax.broadcasted_iota(jnp.int32, (block, _NL4), 1)
    i0 = jnp.argmax(q, axis=-1).astype(jnp.int32)
    q2 = jnp.where(lags == i0[:, None], -jnp.inf, q)
    i1 = jnp.argmax(q2, axis=-1).astype(jnp.int32)
    count = jnp.sum(mask.astype(jnp.int32), axis=-1)
    bp0 = jnp.where(count >= 1, i0, 0)
    bp1 = jnp.where(count >= 2, i1, jnp.where(count == 1, 0, 1))
    return bp0, bp1


class FrameState(NamedTuple):
    """Per-stream state in the monokernel's layout (all [B, ...], permuted
    spectra).  Mirrors denoise.DenoiseState."""

    mem_hp: jax.Array        # [B, 2]
    pitch_buf: jax.Array     # [B, 1728]
    analysis_mem: jax.Array  # [B, 480]
    synthesis_mem: jax.Array  # [B, 480]
    last_period: jax.Array   # [B, 1] int32
    last_gain: jax.Array     # [B, 1]
    lastg: jax.Array         # [B, 32]
    c1m: jax.Array           # [B, 130]
    c2m: jax.Array           # [B, 256]
    h1: jax.Array            # [B, 384]
    h2: jax.Array
    h3: jax.Array
    dX: jax.Array            # [B, 976] permuted re|im
    dP: jax.Array            # [B, 976]
    dEx: jax.Array           # [B, 32]
    dEp: jax.Array
    dExp: jax.Array
    # derived state (recomputable from pitch_buf, carried so each frame only
    # computes 240 NEW decimated samples instead of all 864 — saves ~1.9M
    # MACs/stream/frame of selection matmul): the smoothed-even 24 kHz
    # buffer BEFORE whitening.  init: _decimate_full(pitch_buf).
    ds_raw: jax.Array        # [B, 864]


def frame_body(st: FrameState, pcm: jax.Array, weights, consts: FrameConsts,
               block: int):
    """Advance one frame for a block of streams — the complete
    rnnoise_process_frame (reference denoise.c:457-504) as a single pure-jnp
    body over plain arrays.  weights: nn.pallas_rnn.PackedRNN.
    Returns (new FrameState, out_pcm [B, 480], vad [B, 1])."""
    c = consts

    # ---- HP biquad (exact precomputed kernels, dsp/biquad.py) -------------
    x = pcm.astype(jnp.float32)
    if "biquad" in _ABLATE:
        y, mem_hp = x, st.mem_hp
    else:
        y = x + _f32dot(x, jnp.asarray(c.bq_K)) \
              + _f32dot(st.mem_hp, jnp.asarray(c.bq_rowA))
        mem_hp = _f32dot(st.mem_hp, jnp.asarray(c.bq_SA)) \
            + _f32dot(x, jnp.asarray(c.bq_SB))

    # ---- pitch buffer shift + downsample/whiten ---------------------------
    pitch_buf = jnp.concatenate([st.pitch_buf[:, FRAME_SIZE:], y], axis=-1)
    sel_even = jnp.asarray(c.sel_even)
    if "ds" in _ABLATE:
        ds = pitch_buf[:, :pitch_mod._DS_LEN] * 0.5
        ds_raw = st.ds_raw
    else:
        # incremental decimation: 624 carried samples shift left, 240 new
        # ones come from the shifted buffer's last 481 lanes; lane 0 then
        # takes the reference's left-edge boundary blend (the reference
        # recomputes the full downsample per frame with x[-1] zeroed at the
        # CURRENT window edge, pitch.c:146-214)
        if "ds_sel" in _ABLATE or "ds_sm" in _ABLATE:
            ds_raw = st.ds_raw
        elif _INC_DS:
            new240 = _sel_dot(pitch_buf[:, 2 * pitch_mod._DS_LEN - 481:],
                              jnp.asarray(c.sel_smn))
            ds_raw = jnp.concatenate([st.ds_raw[:, 240:], new240], axis=-1)
            iota = jax.lax.broadcasted_iota(jnp.int32, ds_raw.shape, 1)
            ds_raw = jnp.where(
                iota == 0,
                0.25 * pitch_buf[:, 1:2] + 0.5 * pitch_buf[:, 0:1], ds_raw)
        else:
            # full per-frame decimation: sel_sm0's col 0 IS the reference's
            # left-edge boundary blend, so no iota fix-up is needed — this
            # is the reference formulation directly (pitch.c:146-214),
            # bitwise-equal to the incremental path away from summation
            # order (~1 ulp; same _sel_dot exactness argument)
            ds_raw = _decimate_full(pitch_buf, jnp.asarray(c.sel_sm0),
                                    jnp.asarray(c.sel_sm1))
        ds = _whiten_body(ds_raw)

    # ---- pitch chain ------------------------------------------------------
    if "pitch" in _ABLATE:
        # data-dependent stand-in (always 300): a constant-splat T0 folds
        # through _take_window_vmem's one-hot cascade into an
        # extract_strided_slice that crashes Mosaic's vector-layout pass
        # ("limits[i] <= dim(i) (32 vs. 1)", observed 2026-08-19) — keep the
        # ablated body on the same lowering path as production
        T0 = 300 + (ds[:, 0] > 1e30).astype(jnp.int32)
        gain = jnp.mean(ds, axis=-1) * 1e-6
    elif c.alias:
        T0, gain = _pitch_chain_alias(ds, st.last_period[:, 0],
                                      st.last_gain[:, 0], c, block)
    else:
        if "coarse" in _ABLATE:
            bp0 = jnp.zeros((block,), jnp.int32)
            bp1 = jnp.ones((block,), jnp.int32)
        else:
            bp0, bp1 = _coarse_body(ds, sel_even, jnp.asarray(c.box387[0]),
                                    tuple(jnp.asarray(a) for a in c.c512),
                                    block)
        T0, gain = _pitch_body(ds, bp0, bp1, st.last_period[:, 0],
                               st.last_gain[:, 0],
                               tuple(jnp.asarray(a) for a in c.c1024),
                               jnp.asarray(c.box864[0]), block)

    # ---- window extraction + both forward DFT-960s ------------------------
    win = jnp.asarray(c.win)
    tws9 = [(jnp.asarray(a), jnp.asarray(b)) for a, b in c.tws9]
    leaf9 = [jnp.asarray(a) for a in c.leaf9]
    v = jnp.concatenate([st.analysis_mem, y], axis=1) * win
    if "take_window" in _ABLATE:
        p = pitch_buf[:, :WINDOW_SIZE] + T0[:, None].astype(jnp.float32)
    else:
        start = PITCH_BUF_SIZE - WINDOW_SIZE - T0
        p = _take_window_vmem(pitch_buf, start, block)
    if "fwd" in _ABLATE:
        zpad = jnp.zeros((block, 2 * PERM_WIDTH - WINDOW_SIZE), jnp.float32)
        Xp = jnp.concatenate([v, zpad], axis=1)
        Pp = jnp.concatenate([p * win, zpad], axis=1)
    elif _BATCH_FWD:
        # one batched call for both spectra: same math per row, half the
        # leaf-dot dispatches and fatter MXU dots — but the [2B, n] dots may
        # reduce in a different order than two [B, n] dots (~1 ulp in the
        # leaves, measured on CPU interpret), so NOT bitwise vs the split
        # form.  Measured slower on-chip; default off.
        both = _dif_forward(jnp.concatenate([v, p * win], axis=0),
                            tws9, *leaf9)
        Xp, Pp = both[:block], both[block:]
    else:
        Xp = _dif_forward(v, tws9, *leaf9)
        Pp = _dif_forward(p * win, tws9, *leaf9)

    # ---- band energies + features (exact-f32 dots, permuted layout) -------
    band_p = jnp.asarray(c.band_p)
    Xre, Xim = Xp[:, :PERM_WIDTH], Xp[:, PERM_WIDTH:]
    Pre, Pim = Pp[:, :PERM_WIDTH], Pp[:, PERM_WIDTH:]
    Ex = _f32dot(Xre * Xre + Xim * Xim, band_p)
    Ep = _f32dot(Pre * Pre + Pim * Pim, band_p)
    Exp = _f32dot(Xre * Pre + Xim * Pim, band_p) / jnp.sqrt(
        0.001 + Ex * Ep)
    E = jnp.sum(Ex, axis=-1)

    if "features" in _ABLATE:
        features = jnp.concatenate(
            [Ex, Exp, 0.01 * (T0.astype(jnp.float32)[:, None] - 300.0)],
            axis=-1)
    else:
        L = jnp.log10(1e-2 + Ex)
        # The reference's sequential log-energy follower (denoise.c band
        # loop) is a max-plus scan, so it has the closed form
        #   ly_i = max(L_i, max_{j<i} L_j - 7, max_{j<i}(L_j - 1.5(i-j)),
        #              -9, -2 - 1.5(i+1))
        # (the last two terms are the log_max/follow inits).  max is
        # order-insensitive, so doubling steps replace the 32-iteration
        # serial loop (5 shifted maxima instead of ~100 dependent ops);
        # only the decay accumulation differs by <=2 ulp from the serial
        # subtraction chain — far inside the features tolerance.
        B = L.shape[0]
        neg = jnp.float32(-1e30)

        def shift(a, k):
            return jnp.concatenate(
                [jnp.full((B, k), neg, a.dtype), a[:, :-k]], axis=-1)

        m = shift(L, 1)
        d = shift(L, 1) - 1.5
        for k in (1, 2, 4, 8, 16):
            m = jnp.maximum(m, shift(m, k))
            d = jnp.maximum(d, shift(d, k) - 1.5 * k)
        idx = jax.lax.broadcasted_iota(jnp.int32, L.shape, 1)
        init = jnp.maximum(jnp.float32(-9.0),
                           -2.0 - 1.5 * (idx.astype(jnp.float32) + 1.0))
        Ly = jnp.maximum(jnp.maximum(L, m - 7.0), jnp.maximum(d, init))

        dct_t = jnp.asarray(c.dct_t)
        f_bfcc = _f32dot(Ly, dct_t)
        f_bfcc = jnp.concatenate(
            [f_bfcc[:, :1] - 12.0, f_bfcc[:, 1:2] - 4.0, f_bfcc[:, 2:]],
            axis=-1)
        f_corr = _f32dot(Exp, dct_t)
        f_pitch = 0.01 * (T0.astype(jnp.float32)[:, None] - 300.0)
        features = jnp.concatenate([f_bfcc, f_corr, f_pitch], axis=-1)
    silence = (E < SILENCE_THRESHOLD)[:, None]             # [B, 1]
    features = jnp.where(silence, 0.0, features)

    # ---- NN + silence freeze (pallas_rnn._rnn_body) -----------------------
    if "nn" in _ABLATE:
        c1m, c2m, h1, h2, h3 = st.c1m, st.c2m, st.h1, st.h2, st.h3
        g = 0.5 + 1e-6 * features[:, :NB_BANDS]
        vad = jnp.mean(features, axis=-1, keepdims=True) * 1e-6
    else:
        from ..nn.pallas_rnn import _rnn_body
        c1m, c2m, h1, h2, h3, g, vad = _rnn_body(
            features, silence, st.c1m, st.c2m, st.h1, st.h2, st.h3,
            *[jnp.asarray(w) for w in weights], gru_size=st.h1.shape[-1])

    # ---- post-filter + inverse DFT + OLA (pallas_spectral._post_body) -----
    if "post" in _ABLATE:
        out = y + g[:, :1] + vad
        smem, lastg = st.synthesis_mem, st.lastg
        new = FrameState(
            mem_hp=mem_hp, pitch_buf=pitch_buf, analysis_mem=y,
            synthesis_mem=smem, last_period=T0[:, None],
            last_gain=gain[:, None], lastg=lastg,
            c1m=c1m, c2m=c2m, h1=h1, h2=h2, h3=h3,
            dX=Xp, dP=Pp, dEx=Ex, dEp=Ep, dExp=Exp, ds_raw=ds_raw)
        return new, out, vad
    from .pallas_spectral import _post_body
    (ih, il), (bh, bl) = c.interp_hl, c.band_hl
    Ah, Al, B0h, B0l, Bjh, Bjl, itws, iwin = c.inv
    itws = [(jnp.asarray(a), jnp.asarray(b)) for a, b in itws]
    out, smem, lastg = _post_body(
        st.dX, st.dP, st.dEx, st.dEp, st.dExp, g, st.lastg, Ex, silence,
        st.synthesis_mem,
        jnp.asarray(ih), jnp.asarray(il), jnp.asarray(bh), jnp.asarray(bl),
        jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(B0h),
        jnp.asarray(B0l), jnp.asarray(Bjh), jnp.asarray(Bjl),
        itws, jnp.asarray(iwin))

    new = FrameState(
        mem_hp=mem_hp, pitch_buf=pitch_buf, analysis_mem=y,
        synthesis_mem=smem, last_period=T0[:, None],
        last_gain=gain[:, None], lastg=lastg,
        c1m=c1m, c2m=c2m, h1=h1, h2=h2, h3=h3,
        dX=Xp, dP=Pp, dEx=Ex, dEp=Ep, dExp=Exp, ds_raw=ds_raw)
    return new, out, vad


def state_from_denoise(state, block: int) -> FrameState:
    """denoise.DenoiseState (permuted widths) -> FrameState.  The derived
    ds_raw carry is (re)computed from pitch_buf — one full decimation per
    chunk, amortised over the chunk's frames."""
    c = frame_consts()
    ds_raw = _decimate_full(state.pitch_buf, jnp.asarray(c.sel_sm0),
                            jnp.asarray(c.sel_sm1))
    return FrameState(
        mem_hp=state.mem_hp, pitch_buf=state.pitch_buf,
        analysis_mem=state.analysis_mem, synthesis_mem=state.synthesis_mem,
        last_period=state.last_period[:, None],
        last_gain=state.last_gain[:, None], lastg=state.lastg,
        c1m=state.rnn.conv1_mem, c2m=state.rnn.conv2_mem,
        h1=state.rnn.gru1, h2=state.rnn.gru2, h3=state.rnn.gru3,
        dX=state.delayed_X, dP=state.delayed_P,
        dEx=state.delayed_Ex, dEp=state.delayed_Ep, dExp=state.delayed_Exp,
        ds_raw=ds_raw)


# ---------------------------------------------------------------------------
# the T-grid monokernel: state carried in VMEM scratch across frames
# ---------------------------------------------------------------------------

_STATE_FIELDS = len(FrameState._fields)          # 17


def _state_widths():
    return dict(mem_hp=2, pitch_buf=PITCH_BUF_SIZE, analysis_mem=FRAME_SIZE,
                synthesis_mem=FRAME_SIZE, last_period=1, last_gain=1,
                lastg=32, c1m=130, c2m=256, h1=384, h2=384, h3=384,
                dX=2 * PERM_WIDTH, dP=2 * PERM_WIDTH, dEx=32, dEp=32,
                dExp=32, ds_raw=pitch_mod._DS_LEN)


def _frame_kernel(*refs, treedef, n_w, n_c, n_t, block, split=1, fps=1):
    """Grid (S_blocks, T), T sequential.  refs layout:
    [17 state-in] [pcm] [n_w weights] [n_c consts]
    [17 state-out] [out] [vad] [17 scratch].

    ``split`` > 1 runs the body on independent row sub-blocks, giving the
    scheduler two independent phase chains to interleave (one sub-block's
    VPU butterflies against the other's MXU matmuls).  MEASURED NEUTRAL on
    v5e at S=3072/T=400 (384/2: 1.422, 384/3: 1.438, 256/2: 1.471 vs 1.406
    ms/frame at 384/1) — Mosaic's within-chain pipelining already covers the
    overlap; kept because the mechanism is three lines and documents the
    experiment."""
    state_in = refs[:_STATE_FIELDS]
    pcm_ref = refs[_STATE_FIELDS]
    w_refs = refs[_STATE_FIELDS + 1:_STATE_FIELDS + 1 + n_w]
    c_refs = refs[_STATE_FIELDS + 1 + n_w:_STATE_FIELDS + 1 + n_w + n_c]
    k = _STATE_FIELDS + 1 + n_w + n_c
    state_out = refs[k:k + _STATE_FIELDS]
    out_ref = refs[k + _STATE_FIELDS]
    vad_ref = refs[k + _STATE_FIELDS + 1]
    scratch = refs[k + _STATE_FIELDS + 2:]

    from jax.experimental import pallas as pl
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for s, r in zip(scratch, state_in):
            s[:] = r[:]

    st = FrameState(*[s[:] for s in scratch])
    if _SKIP_CONST_READ:        # profiling only: cost of wholesale ref reads
        consts = jax.tree.unflatten(
            treedef, [jnp.zeros(r.shape, r.dtype) for r in c_refs])
        weights = tuple(jnp.zeros(r.shape, r.dtype) for r in w_refs)
    else:
        consts = jax.tree.unflatten(treedef, [r[:] for r in c_refs])
        weights = tuple(r[:] for r in w_refs)
    def one_frame(st, pcm):
        if split == 1:
            return frame_body(st, pcm, weights, consts, block)
        sub = block // split
        parts = []
        for i in range(split):
            st_i = FrameState(*[a[i * sub:(i + 1) * sub] for a in st])
            parts.append(frame_body(st_i, pcm[i * sub:(i + 1) * sub],
                                    weights, consts, sub))
        new = FrameState(*[jnp.concatenate(rows, axis=0)
                           for rows in zip(*[p[0] for p in parts])])
        return (new, jnp.concatenate([p[1] for p in parts], axis=0),
                jnp.concatenate([p[2] for p in parts], axis=0))

    def advance(st, pcm, f):
        st, out, vad = one_frame(st, pcm)
        if out_ref.dtype == jnp.int16:
            # round half away from zero + clip: bit-identical to the native
            # ring's float path (streamio.cc Ring::push_f32) and to
            # denoise.process_frames_tm_i16
            rounded = jnp.trunc(jnp.where(out > 0, out + 0.5, out - 0.5))
            out = jnp.clip(rounded, -32768.0, 32767.0).astype(jnp.int16)
        out_ref[f] = out
        vad_ref[f] = vad
        return st

    # fps frames advance per grid step: state stays in registers between
    # them, so scratch r/w and pipeline sync amortise over fps frames
    if _FPS_LOOP and fps > 1:
        # fori_loop keeps ONE copy of the loop body regardless of fps (the
        # fully unrolled form compiles in ~45 min at fps=4 through the relay
        # and scales worse), at the cost of dynamic pcm/out indexing and a
        # loop-carried 17-array state.  Bitwise-equal to the unrolled form
        # (tests/test_monokernel.py::test_monokernel_fps_loop_bitwise).
        # _FPS_UNROLL > 1 unrolls that many frames INSIDE the loop body
        # (hybrid: the unrolled body's better Mosaic pipelining, the loop's
        # flat compile time and large-fps sync amortisation).
        u = _FPS_UNROLL if (fps % _FPS_UNROLL == 0) else 1

        def body(f, carry):
            st = FrameState(*carry)
            for i in range(u):
                st = advance(st, pcm_ref[f * u + i], f * u + i)
            return tuple(st)

        st = FrameState(*jax.lax.fori_loop(0, fps // u, body, tuple(st)))
    else:
        for f in range(fps):
            st = advance(st, pcm_ref[f], f)
    for s, v in zip(scratch, st):
        s[:] = v

    @pl.when(t == n_t - 1)
    def _():
        for r, s in zip(state_out, scratch):
            r[:] = s[:]


# The kernel's Mosaic stack (consts ~6.4 MB padded + carry + working set)
# exceeds the 16 MiB default scoped-VMEM budget (24.1 MB at block 64); v5e
# has 128 MiB physical VMEM, so raise the per-kernel limit instead of
# shrinking the block below MXU-efficient sizes.  126 MiB (was 120): with
# _INC_DS the b384/fps=2 config demands 120.88M of scoped stack (measured
# compile error at the old limit — OOM by <1 MB); the limit only caps
# allocation, it doesn't change codegen below it.
_VMEM_LIMIT = 126 * 1024 * 1024


def process_chunk_monokernel(state, pcm_tm, packed_weights,
                             block: int = 384, interpret: bool = False,
                             split: int = 1, frames_per_step: int = 1):
    """The whole-chunk monokernel: denoise state (permuted widths) + pcm
    [T, S, 480] f32 -> (new state, out [T, S, 480], vad [T, S]).

    Per-stream state lives in VMEM scratch for the whole chunk — HBM sees
    only pcm in, pcm out, and one state read/write per chunk.  ``state`` is
    a denoise.DenoiseState with fused (permuted) spectrum widths.

    When ``pcm_tm`` is int16, the int16<->f32 conversions happen INSIDE the
    kernel (frame_body casts on read; the output is rounded/clipped like
    process_frames_tm_i16) and ``out`` is int16 — half the pcm HBM traffic
    and the exact engine boundary (streamio rings)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..denoise import DenoiseState
    from ..models.rnn import RNNState

    T, S, _ = pcm_tm.shape
    fs = state_from_denoise(state, S)
    leaves, treedef = jax.tree.flatten(frame_consts())
    weights = tuple(packed_weights)
    widths = _state_widths()
    wlist = [widths[f] for f in FrameState._fields]

    assert S % block == 0, (S, block)
    fps = frames_per_step
    assert T % fps == 0, (T, fps)
    grid = (S // block, T // fps)

    def state_spec(w):
        return pl.BlockSpec((block, w), lambda i, t: (i, 0))

    def seq_spec(w):
        return pl.BlockSpec((fps, block, w), lambda i, t: (t, i, 0))

    def const_spec(a):
        # shape-only: `a` may be a tracer (weights under an outer jit)
        shape = tuple(a.shape)
        return pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))

    in_specs = ([state_spec(w) for w in wlist]
                + [seq_spec(FRAME_SIZE)]
                + [const_spec(w) for w in weights]
                + [const_spec(a) for a in leaves])
    out_specs = ([state_spec(w) for w in wlist]
                 + [seq_spec(FRAME_SIZE), seq_spec(1)])
    out_shape = ([jax.ShapeDtypeStruct((S, w), a.dtype)
                  for w, a in zip(wlist, fs)]
                 + [jax.ShapeDtypeStruct((T, S, FRAME_SIZE), pcm_tm.dtype),
                    jax.ShapeDtypeStruct((T, S, 1), jnp.float32)])
    scratch = [pltpu.VMEM((block, w), a.dtype) for w, a in zip(wlist, fs)]

    outs = pl.pallas_call(
        functools.partial(_frame_kernel, treedef=treedef,
                          n_w=len(weights), n_c=len(leaves), n_t=T // fps,
                          block=block, split=split, fps=fps),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(*fs, pcm_tm, *[jnp.asarray(w) for w in weights],
      *[jnp.asarray(a) for a in leaves])

    new_fs = FrameState(*outs[:_STATE_FIELDS])
    out = outs[_STATE_FIELDS]
    vad = outs[_STATE_FIELDS + 1][..., 0]
    new_state = state._replace(
        mem_hp=new_fs.mem_hp, pitch_buf=new_fs.pitch_buf,
        analysis_mem=new_fs.analysis_mem,
        synthesis_mem=new_fs.synthesis_mem,
        last_period=new_fs.last_period[:, 0],
        last_gain=new_fs.last_gain[:, 0], lastg=new_fs.lastg,
        rnn=RNNState(new_fs.c1m, new_fs.c2m, new_fs.h1, new_fs.h2,
                     new_fs.h3),
        delayed_X=new_fs.dX, delayed_P=new_fs.dP,
        delayed_Ex=new_fs.dEx, delayed_Ep=new_fs.dEp, delayed_Exp=new_fs.dExp)
    return new_state, out, vad
