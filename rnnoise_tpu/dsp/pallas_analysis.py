"""Fused per-frame pitch-analysis + forward-spectral Pallas kernel.

One kernel call covers everything between the (cheap, XLA-side) coarse pitch
search and the band energies: the 385-lag fine correlation table via the
factored DFT-1024 correlation (pallas_xcorr machinery), the sliding lag
energies as one banded MXU matmul, the fine pitch ranking + pseudo
interpolation (rnn_pitch_search, reference src/pitch.c:281-385), the full
remove_doubling candidate ladder (src/pitch.c:422-528), the pitch-window
extraction at the resolved period, and both windowed forward DFT-960s
(pallas_spectral machinery).

Motivation (profile at S=3072, r2): the XLA formulation of this span is the
single most expensive part of the frame — a ~0.19 ms grouped-conv lag table
plus ~0.2 ms of small ranking/ladder fusions and their scheduling stalls —
while the same math VMEM-resident costs a fraction of that.  The pieces were
all individually validated kernels already; this module composes them so the
span runs as ONE custom call per frame.

Numerics: bx via the factored DFT is exact to ~1e-6 rel (pallas_xcorr test);
the sliding energies move from a cumsum difference to a banded X3 matmul
(~1e-6).  Both can flip near-tie rankings — the same tolerance class as the
parity suite's "<= 2 pitch mismatches / 120 frames" allowance; all ranking
and ladder COMPARISON math is the reference's, term for term.

Everything else about layout follows pallas_spectral (permuted spectra,
bf16-split constant matrices, stream blocks of 256 zero-padded to the f32
sublane tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (PITCH_BUF_SIZE, PITCH_MAX_PERIOD, PITCH_MIN_PERIOD,
                      FRAME_SIZE, WINDOW_SIZE)
from . import pitch as pitch_mod
from .pallas_spectral import (PERM_WIDTH, _dif_forward, _fwd_consts,
                              _pad_streams, _take_window_vmem)
from .pallas_xcorr import (_DS_LEN, _N, _NLAGS, _X_OFF, _dif_forward_1024,
                           _dif_inverse_1024, _xcorr_consts)

_MAXP2 = pitch_mod._MAXP2            # 384
_MINP2 = pitch_mod._MINP2            # 30
_N2 = pitch_mod._N2                  # 480
_NL2 = pitch_mod._MAX_PITCH // 2     # 294 fine lags
_SECOND_CHECK = pitch_mod._SECOND_CHECK

# MEASURED (v5e, S=3072, T=400, r2): 17% SLOWER end-to-end than the XLA
# formulation (22.0k -> 18.3k streams) despite replacing the most expensive
# XLA span — the kernel's three serial DFT-1024s per frame cost more than
# the grouped conv does once XLA has overlapped it with neighbouring work.
# Fifth confirmation of the round's scheduling lesson (postfilter kernel,
# xcorr kernel, biquad hoist, block batching): on this toolchain hand fusion
# only wins when it removes HBM traffic that XLA cannot (the RNN step did;
# spans XLA already overlaps do not).  Default "off"; kept as the validated
# building block for a future whole-frame monokernel where the correlation
# DFTs would amortise against everything else in VMEM.
_ANALYSIS = "off"


def set_analysis(mode: str) -> None:
    global _ANALYSIS
    assert mode in ("auto", "on", "off")
    _ANALYSIS = mode


def analysis_enabled() -> bool:
    from .pallas_spectral import fused_enabled
    if _ANALYSIS == "off":
        return False
    if _ANALYSIS == "on":
        return True
    return fused_enabled()


@functools.lru_cache(maxsize=None)
def _box_matrix():
    """[_DS_LEN, _MAXP2 + 1] banded ones: box[u] = sum_{j=u}^{u+479} d2[j].
    Exact in bf16 (entries are 0/1), so the X3 split lives on the d2 side."""
    m = np.zeros((_DS_LEN, _MAXP2 + 1), np.float32)
    for u in range(_MAXP2 + 1):
        m[u:u + _N2, u] = 1.0
    return m.astype(np.dtype("bfloat16"))


def _take_row(table, idx):
    """table [B, L], idx [B] int32 -> table[b, idx[b]] (one-hot reduce)."""
    L = table.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
    return jnp.sum(jnp.where(iota == idx[:, None], table, 0.0), axis=1)


# Perf-ablation switches (cost attribution, profiling scripts only):
# "finetable" fakes the DFT-1024 correlation table, "ladder" skips the
# remove_doubling ladder.  Production always runs with the empty set.
_ABLATE: frozenset = frozenset()


@functools.lru_cache(maxsize=None)
def _ladder_groups():
    """Ladder candidates k = 2..15 grouped by the lag-index window their
    table lookups can actually reach, so each group's two-hot reduce runs
    over a narrow bx/yy slice instead of all 385 lanes (42 -> 24 lane
    tiles).  Windows are EXACT: per-k active ranges enumerated over every
    reachable T0 (>= 90 — the minimum fine pitch; activity T1 >= 30 forces
    T0 >= ~29.5k, which caps T1b well away from the table edges).  Lookups
    of INACTIVE (T0, k) pairs may fall outside their group window and read
    as 0 — those values are never selected (``take`` requires ``active``).
    Returns ((ks, lo, width), ...)."""
    ranges = {}
    for k in range(2, 16):
        sck = 2 if k % 2 == 1 else (5 if k % 6 == 0 else 3)
        lo_k, hi_k = _MAXP2, 0
        for T0 in range(90, _MAXP2):
            T1 = (2 * T0 + k) // (2 * k)
            if T1 < _MINP2:
                continue                         # inactive: value unused
            T1b = (2 * sck * T0 + k) // (2 * k)
            if k == 2:
                T1b = T0 if T1 + T0 > _MAXP2 else T0 + T1
            for t in (T1, T1b):
                lo_k = min(lo_k, _MAXP2 - t)
                hi_k = max(hi_k, _MAXP2 - t)
        ranges[k] = (lo_k, hi_k)
    groups = []
    for ks in ((2, 4, 6), (3, 5, 8, 12), (7, 9, 10, 11, 13, 14, 15)):
        lo = min(ranges[k][0] for k in ks)
        hi = max(ranges[k][1] for k in ks)
        groups.append((ks, lo, hi - lo + 1))
    # tile budget that motivates the grouping (3 + 2 + 1 tiles of 128)
    tiles = [-(-w // 128) for _, _, w in groups]
    assert all(t <= b for t, b in zip(tiles, (3, 2, 1))), groups
    return tuple(groups)


def _pitch_body(ds, bp0, bp1, prev_period_48k, prev_gain,
                c1024, box_w, block, bx=None, box=None, xx=None):
    """Value-level fine-pitch span: ds [B, 864] whitened, coarse candidates
    bp0/bp1 [B], previous period (48 kHz units) / gain [B].  Returns
    (T0_out [B] int32, pg [B]) — shared by the analysis kernel and the
    whole-frame monokernel (pallas_frame).  ``bx``/``box`` may be passed in
    precomputed (pallas_frame's shared-spectra path computes the fine table
    and the combined fine+coarse energies itself); otherwise they are built
    here from ``c1024``/``box_w``.

    ``bx``/``box`` may be 384 lanes wide (lags 0..383) when ``xx`` (the
    x-window energy = lag-384 correlation) is supplied separately: no
    DECISION ever reads lag index 384 — the ladder's T1/T1b are >= 1 for
    every active k (T1 >= 30 forces T0 >= ~29.5k so T1b = sck*T0/k-ish
    >= 59; exhaustively checked over all T0), T0 >= 90, and the fine search
    stops at lag 293 — so dropping the lane is exact, and it deletes the
    fourth 128-lane tile from the inverse-DFT matmul and every wide ladder
    reduce."""
    f32 = jnp.float32
    if bx is None and len(c1024) != 6:
        (ftc0, fts0, ftc1, fts1, ftc2, fts2,
         itc0, its0, itc1, its1, itc2, its2,
         mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl) = c1024

    # ---- fine lag table bx[u], lag = u (bx[u] = corr at lag u) ------------
    if "finetable" in _ABLATE:
        bx = jnp.concatenate(
            [ds[:, :_NLAGS - 1] * 1e-3, ds[:, :1]], axis=1)
    elif bx is not None:
        pass
    elif len(c1024) == 6:
        # direct-matmul correlation consts (pallas_xcorr._direct_corr):
        # all-MXU, zero butterflies — see _direct_corr_consts rationale
        from .pallas_xcorr import _direct_corr
        bx = _direct_corr(ds[:, _X_OFF:], ds, c1024)
    else:
        z_x = jnp.zeros((block, _N - (_DS_LEN - _X_OFF)), f32)
        z_y = jnp.zeros((block, _N - _DS_LEN), f32)
        xsig = jnp.concatenate([ds[:, _X_OFF:], z_x], axis=1)
        ysig = jnp.concatenate([ds, z_y], axis=1)
        ftws = [(ftc0, fts0), (ftc1, fts1), (ftc2, fts2)]
        itws = [(itc0, its0), (itc1, its1), (itc2, its2)]
        # x and y ride ONE batched forward call (row-wise identical math —
        # bitwise-equal spectra; halves the DFT op count per frame)
        r2, i2 = _dif_forward_1024(
            jnp.concatenate([xsig, ysig], axis=0), ftws, mch, mcl, mrh, mrl)
        xr, xi = r2[:block], i2[:block]
        yr, yi = r2[block:], i2[block:]
        cr = xr * yr + xi * yi
        ci = xr * yi - xi * yr
        corr = _dif_inverse_1024(cr, ci, Ah, Al, B0h, B0l, Bjh, Bjl, itws)
        bx = corr[:, :_NLAGS]                   # [B, 385]; bx[u] = lag u

    # ---- sliding 480-tap energies: one banded matmul ----------------------
    if box is None:
        d2 = ds * ds
        d2h = d2.astype(jnp.bfloat16)
        d2l = (d2 - d2h.astype(f32)).astype(jnp.bfloat16)
        box = (jnp.dot(d2h, box_w, preferred_element_type=f32)
               + jnp.dot(d2l, box_w, preferred_element_type=f32))  # [B, 385]
    yy_rev_fwd = jnp.maximum(0.0, box)          # energy at lag u

    # ---- fine search (pitch.pitch_search fine stage, ratio ranking) -------
    bp0 = bp0[:, None]
    bp1 = bp1[:, None]
    lags = jax.lax.broadcasted_iota(jnp.int32, (block, _NL2), 1)
    cand = (jnp.abs(lags - 2 * bp0) <= 2) | (jnp.abs(lags - 2 * bp1) <= 2)
    xc2 = jnp.where(cand, jnp.maximum(-1.0, bx[:, :_NL2]), 0.0)
    syy = jnp.maximum(1.0 + box[:, :_NL2], 1.0)
    num = jnp.square(xc2 * 1e-12)
    mask = xc2 > 0
    q = jnp.where(mask, num / syy, -jnp.inf)
    i0 = jnp.argmax(q, axis=-1).astype(jnp.int32)
    q2 = jnp.where(lags == i0[:, None], -jnp.inf, q)
    i1 = jnp.argmax(q2, axis=-1).astype(jnp.int32)
    count = jnp.sum(mask.astype(jnp.int32), axis=-1)
    fb0 = jnp.where(count >= 1, i0, 0)
    del i1  # fine stage only consumes the best candidate

    a = _take_row(xc2, jnp.maximum(fb0 - 1, 0))
    b = _take_row(xc2, fb0)
    c = _take_row(xc2, jnp.minimum(fb0 + 1, _NL2 - 1))
    offset = jnp.where((c - a) > 0.7 * (b - a), 1,
                       jnp.where((a - c) > 0.7 * (b - c), -1,
                                 0)).astype(jnp.int32)
    offset = jnp.where((fb0 > 0) & (fb0 < _NL2 - 1), offset, 0)
    pitch = 2 * fb0 - offset
    pitch_index = PITCH_MAX_PERIOD - pitch

    # ---- remove_doubling ladder (pitch.remove_doubling, bx resident) ------
    # bx/box are indexed by window-start u; a period lag t reads u = 384 - t
    # (exactly pitch.remove_doubling's index flip).
    #
    # The reference's sequential k = 2..15 loop is restated VECTORIZED over
    # k: every per-k quantity (T1, T1b, cont, thresh, g1, take) is one
    # [B, 14] op instead of 14 [B] ops, the 28 two-hot table reduces become
    # ONE [B, 14, 385] masked reduce, and "the last passing k wins" becomes
    # an argmax selection.  Arithmetic per (stream, k) is term-for-term the
    # reference's, and the selection extracts single f32 values through
    # one-hot sums (exact), so decisions and outputs are unchanged — this
    # cut the ladder from 0.173 to ~half of the monokernel frame cost
    # attributable to op dispatch of ~100 narrow [B] ops.
    T0 = jnp.minimum(pitch_index // 2, _MAXP2 - 1).astype(jnp.int32)
    prev_period = (prev_period_48k // 2).astype(jnp.int32)
    lag_iota = jax.lax.broadcasted_iota(jnp.int32, bx.shape, 1)

    def lag_pair(t1, t2):
        # two-hot: 0.5*sum(m * v) == 0.5*(v[i1] + v[i2]) exactly (power-of-2
        # scale; i1 == i2 collapses to v[i1])
        m = ((lag_iota == (_MAXP2 - t1)[:, None]).astype(f32)
             + (lag_iota == (_MAXP2 - t2)[:, None]).astype(f32))
        return (0.5 * jnp.sum(m * bx, axis=-1),
                0.5 * jnp.sum(m * yy_rev_fwd, axis=-1))

    if xx is None:
        if bx.shape[1] > _MAXP2:
            xx = bx[:, _MAXP2]                  # lag 0 = index 384
        else:
            # 384-lane table: lag-384 IS the x-window energy — a direct f32
            # reduce (tighter than the DFT-route value it replaces)
            x_w = ds[:, _X_OFF:]
            xx = jnp.sum(x_w * x_w, axis=-1)
    xy, yy = lag_pair(T0, T0)
    g0 = xy / jnp.sqrt(1.0 + xx * yy)

    if "ladder" in _ABLATE:
        best_xy, best_yy, T, g = xy, yy, T0, g0
    else:
        # Grouped-window restatement of the vectorized k = 2..15 ladder:
        # each group's two-hot lookups reduce over its narrow bx/yy window
        # (_ladder_groups — 42 -> 24 lane tiles); per-(stream, k) arithmetic
        # is term-for-term the reference's (pitch.c:422-528).  The k values
        # come from where-chains over a group iota (Mosaic only lowers
        # splat/iota constants), and the cumulative since-k=2 AND of
        # T1 >= _MINP2 is the POINTWISE test — T1 is nonincreasing in k, so
        # earlier ks pass whenever k does (exhaustively checked).  "Last
        # passing k wins" becomes a running max of k over takes; the final
        # one-hot selection matches exactly (k values are distinct).
        T0k = T0[:, None]                                  # [B, 1]
        kmax = jnp.full((block,), -1.0, f32)
        gdata = []
        for ks, lo, w in _ladder_groups():
            gsz = len(ks)
            gi = jax.lax.broadcasted_iota(jnp.int32, (block, gsz), 1)
            kg = jnp.full((block, gsz), ks[-1], jnp.int32)
            for pos in range(gsz - 2, -1, -1):
                kg = jnp.where(gi == pos, ks[pos], kg)
            scg = jnp.where(kg % 2 == 1, 2, jnp.where(kg % 6 == 0, 5, 3))
            T1 = (2 * T0k + kg) // (2 * kg)                # [B, g]
            T1b = (2 * scg * T0k + kg) // (2 * kg)
            if 2 in ks:
                pos2 = ks.index(2)
                t1_2 = T1[:, pos2:pos2 + 1]
                k2_fix = jnp.where(t1_2 + T0k > _MAXP2, T0k, T0k + t1_2)
                T1b = jnp.where(gi == pos2, k2_fix, T1b)
            active = T1 >= _MINP2                          # [B, g]

            iota3 = jax.lax.broadcasted_iota(jnp.int32, (block, gsz, w), 2)
            m3 = ((iota3 == (_MAXP2 - lo - T1)[:, :, None]).astype(f32)
                  + (iota3 == (_MAXP2 - lo - T1b)[:, :, None]).astype(f32))
            # slice THEN newaxis: the mixed None+slice form rewrites to a
            # lax.gather, which Mosaic cannot lower
            xy_k = 0.5 * jnp.sum(m3 * bx[:, lo:lo + w][:, None, :], axis=-1)
            yy_k = 0.5 * jnp.sum(
                m3 * yy_rev_fwd[:, lo:lo + w][:, None, :], axis=-1)

            g1 = xy_k / jnp.sqrt(1.0 + xx[:, None] * yy_k)
            d = jnp.abs(T1 - prev_period[:, None])
            cont = jnp.where(d <= 1, prev_gain[:, None],
                             jnp.where((d <= 2) & (5 * kg * kg < T0k),
                                       0.5 * prev_gain[:, None], 0.0))
            thresh = jnp.maximum(0.3, 0.7 * g0[:, None] - cont)
            thresh = jnp.where(T1 < 3 * _MINP2,
                               jnp.maximum(0.4, 0.85 * g0[:, None] - cont),
                               thresh)
            take = active & (g1 > thresh)                  # [B, g]
            kmax = jnp.maximum(kmax, jnp.max(
                jnp.where(take, kg, -1).astype(f32), axis=1))
            gdata.append((kg, take, xy_k, yy_k, g1, T1))
        any_take = kmax >= 0.0

        def pick(idx, fallback, int_val=False):
            acc = None
            for kg, take, *vals in gdata:
                sel = take & (kg.astype(f32) == kmax[:, None])
                v = vals[idx]
                z = jnp.zeros((), v.dtype)
                contrib = jnp.sum(jnp.where(sel, v, z), axis=1)
                acc = contrib if acc is None else acc + contrib
            return jnp.where(any_take, acc, fallback)

        best_xy = pick(0, xy)
        best_yy = pick(1, yy)
        g = pick(2, g0)
        T = pick(3, T0)

    best_xy = jnp.maximum(0.0, best_xy)
    pg = jnp.where(best_yy <= best_xy, 1.0, best_xy / (best_yy + 1.0))
    pg = jnp.minimum(pg, g)
    # the +-1 neighbourhood of T in one 3-hot... three separate one-hots
    # (distinct clips can coincide; keep them separate and exact)
    Tm = _MAXP2 - jnp.clip(T - 1, 0, _MAXP2)
    Tz = _MAXP2 - jnp.clip(T, 0, _MAXP2)
    Tp = _MAXP2 - jnp.clip(T + 1, 0, _MAXP2)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block, 3, bx.shape[1]), 2)
    tsel = jnp.stack([Tm, Tz, Tp], axis=1)                 # [B, 3]
    mn = (iota_n == tsel[:, :, None]).astype(f32)
    xcn = jnp.sum(mn * bx[:, None, :], axis=-1)            # [B, 3]
    xc_m, xc_0, xc_p = xcn[:, 0], xcn[:, 1], xcn[:, 2]
    off2 = jnp.where((xc_p - xc_m) > 0.7 * (xc_0 - xc_m), 1,
                     jnp.where((xc_m - xc_p) > 0.7 * (xc_0 - xc_p),
                               -1, 0)).astype(jnp.int32)
    T0_out = jnp.maximum(2 * T + off2, PITCH_MIN_PERIOD).astype(jnp.int32)
    return T0_out, pg


def _analysis_kernel(mem_ref, x_ref, buf_ref, ds_ref, bp01_ref, prevp_ref,
                     prevg_ref,
                     # 960-pt forward consts
                     win_ref, tc0, ts0, tc1, ts1, tc2, ts2,
                     mch9, mcl9, mrh9, mrl9,
                     # 1024-pt correlation consts (flat, pallas_xcorr order)
                     ftc0, fts0, ftc1, fts1, ftc2, fts2,
                     itc0, its0, itc1, its1, itc2, its2,
                     mch, mcl, mrh, mrl, Ah, Al, B0h, B0l, Bjh, Bjl,
                     box_ref,
                     X_ref, P_ref, t0_ref, pg_ref, *, block):
    c1024 = (ftc0[:], fts0[:], ftc1[:], fts1[:], ftc2[:], fts2[:],
             itc0[:], its0[:], itc1[:], its1[:], itc2[:], its2[:],
             mch[:], mcl[:], mrh[:], mrl[:], Ah[:], Al[:],
             B0h[:], B0l[:], Bjh[:], Bjl[:])
    bp01 = bp01_ref[:]
    T0_out, pg = _pitch_body(ds_ref[:], bp01[:, 0], bp01[:, 1],
                             prevp_ref[:][:, 0], prevg_ref[:][:, 0],
                             c1024, box_ref[:], block)
    t0_ref[:] = T0_out[:, None]
    pg_ref[:] = pg[:, None]

    # ---- window extraction + both forward DFT-960s ------------------------
    win = win_ref[:]
    tws9 = [(tc0[:], ts0[:]), (tc1[:], ts1[:]), (tc2[:], ts2[:])]
    v = jnp.concatenate([mem_ref[:], x_ref[:]], axis=1) * win
    X_ref[:] = _dif_forward(v, tws9, mch9[:], mcl9[:], mrh9[:], mrl9[:])
    start = PITCH_BUF_SIZE - WINDOW_SIZE - T0_out
    p = _take_window_vmem(buf_ref[:], start, block)
    P_ref[:] = _dif_forward(p * win, tws9, mch9[:], mcl9[:], mrh9[:], mrl9[:])


def analysis_spectral(mem: jax.Array, x: jax.Array, pitch_buf: jax.Array,
                      ds: jax.Array, bp0: jax.Array, bp1: jax.Array,
                      prev_period: jax.Array, prev_gain: jax.Array,
                      block: int = 256, interpret: bool = False):
    """mem/x: [S, 480]; pitch_buf: [S, 1728]; ds: [S, 864] whitened; bp0/bp1:
    [S] int32 coarse candidates; prev_period [S] int32 / prev_gain [S] f32.

    Returns (Xp, Pp, T0, gain): permuted spectra [S, 2*PERM_WIDTH] of the
    analysis frame and the pitch-delayed window, plus the resolved period
    (48 kHz units) and pitch gain — i.e. everything compute_frame_features
    derives between the coarse search and the band energies."""
    from jax.experimental import pallas as pl

    S = x.shape[0]
    bp01 = jnp.stack([bp0.astype(jnp.int32), bp1.astype(jnp.int32)], axis=1)
    arrays, S_pad = _pad_streams(
        (mem, x, pitch_buf, ds, bp01, prev_period.astype(jnp.int32)[:, None],
         prev_gain[:, None]), S)
    mem, x, pitch_buf, ds, bp01, prevp, prevg = arrays
    block = min(block, S_pad)
    assert S_pad % block == 0, (S_pad, block)

    win, tws9, (mch9, mcl9), (mrh9, mrl9) = _fwd_consts()
    c960 = [win, tws9[0][0], tws9[0][1], tws9[1][0], tws9[1][1],
            tws9[2][0], tws9[2][1], mch9, mcl9, mrh9, mrl9]
    c1024 = _xcorr_consts()
    box = _box_matrix()
    consts = c960 + list(c1024) + [box]

    def row_spec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    Xp, Pp, T0, pg = pl.pallas_call(
        functools.partial(_analysis_kernel, block=block),
        grid=(S_pad // block,),
        in_specs=[row_spec(FRAME_SIZE), row_spec(FRAME_SIZE),
                  row_spec(PITCH_BUF_SIZE), row_spec(_DS_LEN),
                  row_spec(2), row_spec(1), row_spec(1)]
                 + [const_spec(np.asarray(a)) for a in consts],
        out_specs=(row_spec(2 * PERM_WIDTH), row_spec(2 * PERM_WIDTH),
                   row_spec(1), row_spec(1)),
        out_shape=(jax.ShapeDtypeStruct((S_pad, 2 * PERM_WIDTH), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, 2 * PERM_WIDTH), jnp.float32),
                   jax.ShapeDtypeStruct((S_pad, 1), jnp.int32),
                   jax.ShapeDtypeStruct((S_pad, 1), jnp.float32)),
        interpret=interpret,
    )(mem, x, pitch_buf, ds, bp01, prevp, prevg,
      *[jnp.asarray(a) for a in consts])
    return Xp[:S], Pp[:S], T0[:S, 0], pg[:S, 0]
