"""Batched open-loop pitch analysis.

Re-design of the reference pitch stack (src/pitch.c, src/celt_lpc.c) for TPU:
every stage operates on a ``[S, ...]`` stream batch with static shapes.

  * 2x decimation + LPC whitening   (rnn_pitch_downsample, pitch.c:146-214)
  * order-4 autocorrelation + Levinson-Durbin with the 30 dB early-out
    replicated via masking                    (celt_lpc.c:38-174)
  * coarse 4x / fine 2x cross-correlation search with the dual-best ranking of
    find_best_pitch                           (pitch.c:44-102, 281-385)
  * rnn_remove_doubling's sub-multiple ladder (pitch.c:422-528) as a statically
    unrolled, masked select chain.

The per-lag correlations map onto ``lax.conv_general_dilated`` with
``feature_group_count = S`` (per-stream filters), so XLA can tile them onto the
MXU instead of the reference's 4-lag-unrolled scalar kernels (pitch.h:51-142).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import (PITCH_BUF_SIZE, PITCH_FRAME_SIZE, PITCH_MAX_PERIOD,
                      PITCH_MIN_PERIOD)
from .gather import onehot_take

_DS_LEN = PITCH_BUF_SIZE // 2          # 864
_X_OFF = PITCH_MAX_PERIOD // 2         # 384
_N2 = PITCH_FRAME_SIZE // 2            # 480
_MAXP2 = PITCH_MAX_PERIOD // 2         # 384
_MINP2 = PITCH_MIN_PERIOD // 2         # 30
_MAX_PITCH = PITCH_MAX_PERIOD - 3 * PITCH_MIN_PERIOD   # 588

_SECOND_CHECK = (0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def batched_xcorr(x: jax.Array, y: jax.Array, nlags: int) -> jax.Array:
    """xc[s, i] = sum_j x[s, j] * y[s, i + j]   for i < nlags.

    x: [S, K], y: [S, >= nlags + K - 1].  Per-stream filters via grouped conv.

    Stays a single exact-f32 conv: an X3 bf16 split (three convs, ~4e-6 rel
    err) measured 36% SLOWER end-to-end on v5e at S=3072 — unlike matmuls,
    tripling the grouped-conv count triples its fixed layout overhead and the
    f32 conv already runs well above VPU peak (MXU-packed).
    """
    S, K = x.shape
    lhs = y[:, : nlags + K - 1][None, :, :]          # [1, S, L]
    rhs = x[:, None, :]                              # [S, 1, K]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=S,
        precision="float32",
        preferred_element_type=jnp.float32,
    )
    return out[0]                                    # [S, nlags]


def _sliding_syy(y: jax.Array, length: int, nlags: int) -> jax.Array:
    """Syy[s, i] = 1 + sum_{j<length} y[s, i+j]^2, clamped >= 1
    (find_best_pitch's running denominator, pitch.c:67-100)."""
    c = jnp.cumsum(jnp.square(y), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)
    syy = 1.0 + c[:, length : length + nlags] - c[:, :nlags]
    return jnp.maximum(syy, 1.0)


def find_best_pitch(xcorr: jax.Array, syy: jax.Array):
    """Top-2 lags ranked by xcorr^2 / Syy over lags with xcorr > 0, with the
    reference's initial candidates (0, 1) when fewer than two lags qualify
    (pitch.c:61-66 initialisation)."""
    num = jnp.square(xcorr * 1e-12)
    mask = xcorr > 0
    q = jnp.where(mask, num / syy, -jnp.inf)
    i0 = jnp.argmax(q, axis=-1).astype(jnp.int32)
    q2 = jnp.where(jax.nn.one_hot(i0, q.shape[-1], dtype=bool), -jnp.inf, q)
    i1 = jnp.argmax(q2, axis=-1).astype(jnp.int32)
    count = jnp.sum(mask, axis=-1)
    i0 = jnp.where(count >= 1, i0, 0)
    i1 = jnp.where(count >= 2, i1, jnp.where(count == 1, 0, 1))
    return i0, i1


def find_best_pitch_exact(xcorr: jax.Array, y: jax.Array, length: int):
    """Bit-exact sequential replica of find_best_pitch (pitch.c:44-102, float
    build): the running Syy recurrence ``Syy = max(1, (Syy + y[i+len]^2) -
    y[i]^2)``, the initial left-to-right f32 accumulation, and the
    cross-multiplied top-2 comparisons ``num * best_den > best_num * Syy``
    (strict, so earlier lags win ties) — instead of the vectorised
    ratio ranking, whose division rounds differently in near-ties.

    A lax.scan over lags (and one over the init sum): sequential by
    construction, so this is a parity tool, not the throughput path
    (RuntimeConfig.exact_pitch_rank, default off).
    """
    nlags = xcorr.shape[-1]
    y2 = jnp.square(y)                                   # y[j]*y[j], f32

    syy0, _ = jax.lax.scan(lambda s, t: (s + t, None),
                           jnp.ones_like(y[:, 0]),
                           jnp.swapaxes(y2[:, :length], 0, 1))

    def step(carry, inp):
        syy, num0, den0, i0, num1, den1, i1, i = carry
        xc, ya2, yb2 = inp                               # y[i]^2, y[i+len]^2
        num = jnp.square(xc * 1e-12)
        ok = xc > 0
        beats1 = ok & (num * den1 > num1 * syy)
        # the slot-0 comparison only happens inside the slot-1 branch in the
        # reference (pitch.c:83-97) — gate it on beats1 so a float near-tie
        # where beats0 holds without beats1 updates nothing, like the C code
        beats0 = beats1 & (num * den0 > num0 * syy)
        # demote best0 when beaten, else replace best1 when only it is beaten
        num1n = jnp.where(beats0, num0, jnp.where(beats1, num, num1))
        den1n = jnp.where(beats0, den0, jnp.where(beats1, syy, den1))
        i1n = jnp.where(beats0, i0, jnp.where(beats1, i, i1))
        num0n = jnp.where(beats0, num, num0)
        den0n = jnp.where(beats0, syy, den0)
        i0n = jnp.where(beats0, i, i0)
        syy = jnp.maximum(1.0, (syy + yb2) - ya2)
        return (syy, num0n, den0n, i0n, num1n, den1n, i1n, i + 1), None

    S = xcorr.shape[0]
    z = jnp.zeros((S,), jnp.float32)
    init = (syy0, z - 1.0, z, jnp.zeros((S,), jnp.int32),
            z - 1.0, z, jnp.ones((S,), jnp.int32), jnp.int32(0))
    xs = (jnp.swapaxes(xcorr, 0, 1),
          jnp.swapaxes(y2[:, :nlags], 0, 1),
          jnp.swapaxes(y2[:, length:length + nlags], 0, 1))
    (syy, num0, den0, i0, num1, den1, i1, _), _ = jax.lax.scan(step, init, xs)
    return i0, i1


def _take(a: jax.Array, idx: jax.Array) -> jax.Array:
    """a: [S, L], idx: [S] -> a[s, idx[s]] via one-hot (gathers are slow)."""
    return onehot_take(a, idx)


def _lagged_dot(ds: jax.Array, lag: jax.Array) -> jax.Array:
    """sum_{j<480} x[j] * x[j-lag]  with x[j] = ds[:, 384+j]; lag: [S] int."""
    def one(d, t):
        win = jax.lax.dynamic_slice(d, (_X_OFF - t,), (_N2,))
        return jnp.dot(d[_X_OFF:], win)
    return jax.vmap(one)(ds, lag)


# ---------------------------------------------------------------------------
# downsample + whitening
# ---------------------------------------------------------------------------

def pitch_downsample(pitch_buf: jax.Array) -> jax.Array:
    """[S, PITCH_BUF_SIZE] -> [S, PITCH_BUF_SIZE//2] decimated + LPC-whitened
    (rnn_pitch_downsample, pitch.c:146-214)."""
    x = pitch_buf.astype(jnp.float32)
    S = x.shape[0]
    # 2x decimation: x_lp[i] = .25*(x[2i-1] + x[2i+1]) + .5*x[2i]; i=0 special.
    # Smooth at full rate first (lane shifts fuse into one elementwise pass),
    # then extract even samples ONCE: stride-2 lane extraction forces a
    # column-major relayout of the buffer on TPU, and the naive three-slice
    # form (even/left/right) paid for it three times per frame.
    xl = jnp.concatenate([jnp.zeros((S, 1), x.dtype), x[:, :-1]], axis=-1)
    xr = jnp.concatenate([x[:, 1:], jnp.zeros((S, 1), x.dtype)], axis=-1)
    sm = 0.25 * (xl + xr) + 0.5 * x                  # same f32 op order
    x_lp = sm[:, 0::2]                               # [S, 864]
    x_lp = x_lp.at[:, 0].set(0.25 * x[:, 1] + 0.5 * x[:, 0])

    # Order-4 autocorrelation (rnn_autocorr fast path + tail == plain autocorr).
    n = _DS_LEN
    ac = [jnp.einsum("sj,sj->s", x_lp[:, : n - k], x_lp[:, k:],
                     precision="float32") for k in range(5)]
    ac[0] = ac[0] * 1.0001
    for i in range(1, 5):
        ac[i] = ac[i] - ac[i] * (0.008 * i) ** 2     # lag windowing

    lpc = _levinson4(ac)

    # progressive .9^i damping (pitch.c:202-206)
    tmp = 1.0
    for i in range(4):
        tmp *= 0.9
        lpc[i] = lpc[i] * tmp

    c1 = 0.8
    num = jnp.stack([
        lpc[0] + c1,
        lpc[1] + c1 * lpc[0],
        lpc[2] + c1 * lpc[1],
        lpc[3] + c1 * lpc[2],
        c1 * lpc[3],
    ], axis=-1)                                      # [S, 5]

    # celt_fir5 (pitch.c:104-143): y[i] = x[i] + sum_k num[k] * x[i-1-k]
    y = x_lp
    for k in range(5):
        shifted = jnp.pad(x_lp, ((0, 0), (k + 1, 0)))[:, : x_lp.shape[-1]]
        y = y + num[:, k:k + 1] * shifted
    return y


def _levinson4(ac):
    """Order-4 Levinson-Durbin with the 30 dB early-out replicated by masking
    (rnn_lpc, celt_lpc.c:38-89)."""
    ac0 = ac[0]
    lpc = [jnp.zeros_like(ac0) for _ in range(4)]
    error = ac0
    done = ac0 == 0.0
    for i in range(4):
        rr = ac[i + 1]
        for j in range(i):
            rr = rr + lpc[j] * ac[i - j]
        r = -rr / jnp.where(done, 1.0, error)
        new = list(lpc)
        new[i] = r
        for j in range((i + 1) // 2):
            t1, t2 = lpc[j], lpc[i - 1 - j]
            new[j] = t1 + r * t2
            new[i - 1 - j] = t2 + r * t1
        lpc = [jnp.where(done, o, n) for o, n in zip(lpc, new)]
        error = jnp.where(done, error, error - r * r * error)
        done = done | (error < 0.001 * ac0)
    return lpc


# ---------------------------------------------------------------------------
# open-loop search
# ---------------------------------------------------------------------------

def lag_corr_table(x_lp: jax.Array) -> jax.Array:
    """bx[s, i] = sum_{j<480} x_lp[s, 384+j] * x_lp[s, i+j] for i = 0..384.

    One correlation table shared by the fine pitch search (lags 0..293 are
    exactly its cross-correlations) and remove_doubling (lag t reads
    bx[384 - t]).

    A fused factored-DFT correlation kernel exists
    (pallas_xcorr.lag_corr_table_pallas, exact to ~1e-6 rel) but measured
    ~8% SLOWER in-pipeline on v5e at S=4096 (r2): standalone it edges out
    the conv, but in the full frame XLA overlaps the grouped conv with
    neighbouring fusions while the monolithic kernel serialises.  Toggle
    _XCORR_PALLAS to re-measure on newer toolchains."""
    if _XCORR_PALLAS:
        from .pallas_spectral import fused_enabled
        if fused_enabled():
            from .pallas_xcorr import lag_corr_table_pallas
            return lag_corr_table_pallas(x_lp)
    return batched_xcorr(x_lp[:, _X_OFF:_X_OFF + _N2], x_lp, _MAXP2 + 1)


_XCORR_PALLAS = False


def coarse_search(x_lp: jax.Array, exact_rank: bool = False):
    """The 4x-decimated coarse stage of rnn_pitch_search (pitch.c:322-340):
    returns the top-2 coarse lags (bp0, bp1) [S] int32.  Split out so the
    fused analysis kernel (dsp.pallas_analysis) can take over from here."""
    len4 = _N2 // 2                                  # 240
    nl4 = _MAX_PITCH // 4                            # 147
    x4 = x_lp[:, _X_OFF::2][:, :len4]                # x_lp4
    y4 = x_lp[:, 0:2 * ((_N2 * 2 + _MAX_PITCH) // 4):2]   # y_lp4 [S, 387]
    xc4 = batched_xcorr(x4, y4, nl4)
    if exact_rank:
        return find_best_pitch_exact(xc4, y4, len4)
    return find_best_pitch(xc4, _sliding_syy(y4, len4, nl4))


def pitch_search(x_lp: jax.Array, bx: Optional[jax.Array] = None,
                 exact_rank: bool = False) -> jax.Array:
    """x_lp: [S, 864] whitened, decimated pitch buffer.

    Returns ``pitch`` (in 48 kHz sample units before the 768-minus flip), i.e.
    exactly what rnn_pitch_search writes into *pitch (pitch.c:281-385) when
    called with (x_lp+384, x_lp, 960, 588).

    ``exact_rank`` selects find_best_pitch_exact (sequential bit-exact
    ranking; RuntimeConfig.exact_pitch_rank).
    """
    max_pitch = _MAX_PITCH                           # 588
    len2 = _N2                                       # 480
    nl2 = max_pitch // 2                             # 294

    bp0, bp1 = coarse_search(x_lp, exact_rank=exact_rank)

    # Fine search, 2x decimated, restricted to lags within 2 of 2*best.
    lags = jnp.arange(nl2, dtype=jnp.int32)[None, :]
    cand = (jnp.abs(lags - 2 * bp0[:, None]) <= 2) | \
           (jnp.abs(lags - 2 * bp1[:, None]) <= 2)
    if bx is None:
        bx = lag_corr_table(x_lp)
    xc2_full = bx[:, :nl2]
    xc2 = jnp.where(cand, jnp.maximum(-1.0, xc2_full), 0.0)
    if exact_rank:
        fb0, _ = find_best_pitch_exact(xc2, x_lp, len2)
    else:
        fb0, _ = find_best_pitch(xc2, _sliding_syy(x_lp, len2, nl2))

    # Pseudo-interpolation (pitch.c:368-384).
    a = _take(xc2, jnp.maximum(fb0 - 1, 0))
    b = _take(xc2, fb0)
    c = _take(xc2, jnp.minimum(fb0 + 1, nl2 - 1))
    offset = jnp.where((c - a) > 0.7 * (b - a), 1,
                       jnp.where((a - c) > 0.7 * (b - c), -1, 0)).astype(jnp.int32)
    interior = (fb0 > 0) & (fb0 < nl2 - 1)
    offset = jnp.where(interior, offset, 0)
    return 2 * fb0 - offset


# ---------------------------------------------------------------------------
# doubling removal
# ---------------------------------------------------------------------------

def _pitch_gain(xy, xx, yy):
    return xy / jnp.sqrt(1.0 + xx * yy)


def remove_doubling(x_lp: jax.Array, pitch_index: jax.Array,
                    prev_period: jax.Array, prev_gain: jax.Array,
                    bx: Optional[jax.Array] = None):
    """Batched rnn_remove_doubling (pitch.c:422-528).

    x_lp: [S, 864]; pitch_index/prev_period: [S] int32 in 48 kHz units;
    prev_gain: [S].  Returns (new_pitch_index[S] int32, gain[S]).

    TPU note: the reference computes a fresh 480-tap inner product per
    candidate lag (dual_inner_prod / celt_inner_prod); per-stream dynamic
    gathers of 480-sample windows are catastrophically slow on TPU, so we
    precompute the whole lag-0..384 cross-correlation table once with the
    grouped-conv xcorr (MXU) and turn every candidate evaluation into a scalar
    table lookup.
    """
    minperiod0 = PITCH_MIN_PERIOD
    T0 = jnp.minimum(pitch_index // 2, _MAXP2 - 1).astype(jnp.int32)
    prev_period = (prev_period // 2).astype(jnp.int32)

    x = x_lp                                          # x[j] == x_lp[:, 384+j]
    # The lag tables are kept in bx's native orientation (u = 384 - lag) and
    # every lookup flips its index instead — lane-dim reversals are real
    # memory passes on TPU (~13 us each at S=4096), index flips are free.
    if bx is None:
        bx = lag_corr_table(x_lp)                     # bx[s, u]: lag = 384 - u

    def xdot(lag):                                    # [S] int32 -> [S]
        return _take(bx, _MAXP2 - lag)

    xx = bx[:, _MAXP2]                                # lag 0
    xy = xdot(T0)

    # yy_rev[u] = sum_{j<480} x[j-(384-u)]^2 via prefix sums (clamped >= 0),
    # i.e. the lag-(384-u) energy: c[480+u] - c[u].
    c = jnp.cumsum(jnp.square(x), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)
    yy_rev = jnp.maximum(0.0, c[:, _N2:_DS_LEN + 1] - c[:, :_MAXP2 + 1])

    yy = _take(yy_rev, _MAXP2 - T0)
    best_xy, best_yy = xy, yy
    g0 = _pitch_gain(xy, xx, yy)
    g = g0
    T = T0

    # All candidate sub-periods depend only on (T0, k): batch the lag table
    # lookups for the whole k = 2..15 ladder into single gathers.
    ks = jnp.arange(2, 16, dtype=jnp.int32)[None, :]            # [1, 14]
    T1s = (2 * T0[:, None] + ks) // (2 * ks)                    # [S, 14]
    sc = jnp.asarray(_SECOND_CHECK, jnp.int32)[None, 2:]
    T1bs = (2 * sc * T0[:, None] + ks) // (2 * ks)
    T1bs = T1bs.at[:, 0].set(
        jnp.where(T1s[:, 0] + T0 > _MAXP2, T0, T0 + T1s[:, 0]))
    xy1s = onehot_take(bx, _MAXP2 - T1s)
    xy2s = onehot_take(bx, _MAXP2 - T1bs)
    yy1s = onehot_take(yy_rev, _MAXP2 - T1s)
    yy2s = onehot_take(yy_rev, _MAXP2 - T1bs)

    active = jnp.ones_like(T0, dtype=bool)
    for k in range(2, 16):
        j = k - 2
        T1 = T1s[:, j]
        active = active & (T1 >= _MINP2)              # `break` (pitch.c:469-470)
        xy_k = 0.5 * (xy1s[:, j] + xy2s[:, j])
        yy_k = 0.5 * (yy1s[:, j] + yy2s[:, j])
        g1 = _pitch_gain(xy_k, xx, yy_k)
        d = jnp.abs(T1 - prev_period)
        cont = jnp.where(d <= 1, prev_gain,
                         jnp.where((d <= 2) & (5 * k * k < T0),
                                   0.5 * prev_gain, 0.0))
        thresh = jnp.maximum(0.3, 0.7 * g0 - cont)
        # NOTE: the reference's `else if (T1 < 2*minperiod)` branch is dead code
        # (subsumed by T1 < 3*minperiod); replicated as-is (pitch.c:494-498).
        thresh = jnp.where(T1 < 3 * _MINP2,
                           jnp.maximum(0.4, 0.85 * g0 - cont), thresh)
        take = active & (g1 > thresh)
        best_xy = jnp.where(take, xy_k, best_xy)
        best_yy = jnp.where(take, yy_k, best_yy)
        T = jnp.where(take, T1, T)
        g = jnp.where(take, g1, g)

    best_xy = jnp.maximum(0.0, best_xy)
    pg = jnp.where(best_yy <= best_xy, 1.0, best_xy / (best_yy + 1.0))

    lags3 = jnp.clip(T[:, None] + jnp.arange(-1, 2)[None, :], 0, _MAXP2)
    xcorr3 = onehot_take(bx, _MAXP2 - lags3)
    xcorr = [xcorr3[:, 0], xcorr3[:, 1], xcorr3[:, 2]]
    offset = jnp.where((xcorr[2] - xcorr[0]) > 0.7 * (xcorr[1] - xcorr[0]), 1,
                       jnp.where((xcorr[0] - xcorr[2]) > 0.7 * (xcorr[1] - xcorr[2]),
                                 -1, 0)).astype(jnp.int32)
    pg = jnp.minimum(pg, g)
    T0_out = jnp.maximum(2 * T + offset, minperiod0).astype(jnp.int32)
    return T0_out, pg
