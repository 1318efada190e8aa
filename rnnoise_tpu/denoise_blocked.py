"""Block-batched streaming denoiser — the same math as
:mod:`rnnoise_tpu.denoise` restructured around what is *actually* sequential.

The per-frame scan in ``process_frames`` re-dispatches ~70 small XLA fusions
and copies the whole 35 KB/stream carry every frame; profiling shows those
two costs dominate the frame budget once the DFTs run as Pallas kernels.
But almost the entire frame is a pure function of the *input signal*: the HP
biquad, pitch buffer, downsample/whitening, correlation tables, open-loop
pitch search, both forward DFTs, band energies and features depend only on
the PCM — and the post-filter, inverse DFT and overlap-add depend only on
those plus the NN gains.  Only three tiny recurrences actually cross frames:

  1. remove_doubling's pitch continuity (prev period/gain — 2 scalars),
  2. the RNN state (conv shift registers + 3 GRUs, ~6.5 KB/stream),
  3. the ``lastg`` gain floor ([NB_BANDS] per stream).

So ``process_frames_blocked`` processes ``B`` frames per step in five
phases — (A) batched signal analysis over all ``B*S`` frames, (B) a scalar
scan for pitch continuity, (A2) batched DFTs/features, (C) the NN + lastg
scan, (D) batched post-filter/synthesis — and scans that block step over the
chunk.  Heavy ops see a ``B``-times larger batch, the big carry is copied
once per block instead of once per frame, and the per-frame op count
collapses into per-block ops.

MEASURED RESULT (v5e, r2): 35-45% SLOWER than the per-frame scan at every
(S, B) tried — S=4096: 17.9k streams/frame-scan vs 11.7k/B=5, 9.9k/B=10;
S=512: 10.4k vs 7.0k.  Root cause (profile-verified): at S=4096 the
per-frame scan's whole working set lives in VMEM via XLA scoped allocation
(the ``S(1)`` buffers in the HLO) — the grouped-conv xcorr, the Pallas DFT
kernels and most fusions read and write VMEM, not HBM.  B-batching grows
every intermediate past the scoped-VMEM budget, so the same per-byte work
moves to HBM and the Pallas kernels/convs get ~2x slower per row.  The
restructure is kept because it is exact, tested, and the scheduling
analysis (what is actually sequential) is the basis for any future
VMEM-resident mega-kernel; it may also win on hardware with small VMEM or
for huge-S/low-frequency batch offline jobs where VMEM residency is
impossible anyway.

Layout note (the first cut of this file was 2x SLOWER than the per-frame
scan because of this): TPU arrays are tiled on the trailing two dims, so
``[S, B, D] <-> [S*B, D]`` reshapes and ``moveaxis`` transposes are real
HBM passes — and a block pipeline is all reshapes if written naively.
Everything here therefore lives in **frame-major** layout: flat tensors are
``[B*S, D]`` with frame ``b`` of stream ``s`` at row ``b*S + s``, which is
bit-compatible with ``[B, S, D]`` whenever S is a multiple of the 8-row
tile — so feeding the per-frame scans needs no transpose at all, and the
delayed-spectrum shift is a free first-axis concat.

Numerics are identical to the per-frame path modulo f32 matmul tiling
(same kernels, bigger batch; the biquad hoist is bit-matching and the
remove_doubling ladder is restructured into an equivalent "last take wins"
select — the ladder's take decisions never read the running best, so the
sequential masked updates and the vectorised select compute the same
function).  Reference loops being replaced: rnnoise_process_frame
(src/denoise.c:457-504) driven frame-by-frame from the demo loop
(examples/rnnoise_demo.c:52-61).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import tables
from .config import (DEFAULT_RUNTIME, FRAME_SIZE, NB_BANDS, PITCH_BUF_SIZE,
                     PITCH_MAX_PERIOD, PITCH_MIN_PERIOD, RuntimeConfig,
                     SILENCE_THRESHOLD, WINDOW_SIZE)
from .denoise import (DenoiseState, _log_energy_follower, _to_complex,
                      _to_real_pair, pitch_filter, process_frames)
from .dsp import pitch as pitch_mod
from .dsp.biquad import biquad_chunk
from .dsp.gather import onehot_take, take_window
from .dsp.transform import (compute_band_corr, compute_band_energy, dct,
                            interp_band_gain, windowed_forward_transform,
                            windowed_inverse_transform)
from .models.rnn import ModelParams, compute_rnn

_MAXP2 = pitch_mod._MAXP2            # 384
_MINP2 = pitch_mod._MINP2            # 30
_N2 = pitch_mod._N2                  # 480
_DS_LEN = pitch_mod._DS_LEN          # 864
_SECOND_CHECK = pitch_mod._SECOND_CHECK


class _DoublingTables(NamedTuple):
    """Everything rnn_remove_doubling (src/pitch.c:422-528) computes that
    does NOT depend on the previous frame's (period, gain) — precomputed for
    every frame of a block at once, including each candidate's would-be
    outputs.  Leading dims [B, S]; the per-frame scan only evaluates the
    continuity thresholds and one 15-way select."""

    T1s: jax.Array       # [B, S, 14] int32 sub-period candidates (ds units)
    g0: jax.Array        # [B, S] base gain
    g1: jax.Array        # [B, S, 14] candidate gains
    active: jax.Array    # [B, S, 14] bool: ladder not yet `break`-ed
    small: jax.Array     # [B, S, 14] bool: T1 < 3*minperiod branch
    cond57: jax.Array    # [B, S, 14] bool: 5*k*k < T0
    T0_out: jax.Array    # [B, S, 15] int32 final period if candidate c wins
    pg: jax.Array        # [B, S, 15] final gain if candidate c wins

def _precompute_doubling(ds: jax.Array, pitch_index: jax.Array,
                         bx: jax.Array, S: int, B: int) -> _DoublingTables:
    """ds/bx: [B*S, ...] frame-major; pitch_index: [B*S] (48 kHz units)."""
    T0 = jnp.minimum(pitch_index // 2, _MAXP2 - 1).astype(jnp.int32)
    xx = bx[:, _MAXP2]
    xy = onehot_take(bx, _MAXP2 - T0)

    c = jnp.cumsum(jnp.square(ds), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)
    yy_rev = jnp.maximum(0.0, c[:, _N2:_DS_LEN + 1] - c[:, :_MAXP2 + 1])
    yy = onehot_take(yy_rev, _MAXP2 - T0)
    g0 = pitch_mod._pitch_gain(xy, xx, yy)

    ks = jnp.arange(2, 16, dtype=jnp.int32)[None, :]
    T1s = (2 * T0[:, None] + ks) // (2 * ks)
    sc = jnp.asarray(_SECOND_CHECK, jnp.int32)[None, 2:]
    T1bs = (2 * sc * T0[:, None] + ks) // (2 * ks)
    T1bs = T1bs.at[:, 0].set(
        jnp.where(T1s[:, 0] + T0 > _MAXP2, T0, T0 + T1s[:, 0]))
    xy_k = 0.5 * (onehot_take(bx, _MAXP2 - T1s)
                  + onehot_take(bx, _MAXP2 - T1bs))
    yy_k = 0.5 * (onehot_take(yy_rev, _MAXP2 - T1s)
                  + onehot_take(yy_rev, _MAXP2 - T1bs))
    g1 = pitch_mod._pitch_gain(xy_k, xx[:, None], yy_k)

    # cumulative AND of (T1 >= minperiod): the reference's `break`
    active = jnp.cumsum((T1s < _MINP2).astype(jnp.int32), axis=-1) == 0
    small = T1s < 3 * _MINP2
    cond57 = 5 * ks * ks < T0[:, None]

    # Final outputs if candidate c in {base, k=2..15} wins the ladder —
    # the post-ladder math (pitch.c:503-528) is pointwise in the winning
    # candidate, so select-then-compute == compute-then-select.
    Tc = jnp.concatenate([T0[:, None], T1s], axis=-1)          # [N, 15]
    xyc = jnp.concatenate([xy[:, None], xy_k], axis=-1)
    yyc = jnp.concatenate([yy[:, None], yy_k], axis=-1)
    gc = jnp.concatenate([g0[:, None], g1], axis=-1)
    best_xy = jnp.maximum(0.0, xyc)
    pg = jnp.where(yyc <= best_xy, 1.0, best_xy / (yyc + 1.0))
    pg = jnp.minimum(pg, gc)

    lags3 = jnp.clip(Tc[..., None] + jnp.arange(-1, 2)[None, None, :],
                     0, _MAXP2)                                # [N, 15, 3]
    xc3 = onehot_take(bx, (_MAXP2 - lags3).reshape(-1, 45)).reshape(-1, 15, 3)
    a, b, cc = xc3[..., 0], xc3[..., 1], xc3[..., 2]
    offset = jnp.where((cc - a) > 0.7 * (b - a), 1,
                       jnp.where((a - cc) > 0.7 * (b - cc), -1,
                                 0)).astype(jnp.int32)
    T0_out = jnp.maximum(2 * Tc + offset, PITCH_MIN_PERIOD).astype(jnp.int32)

    def r(x):                                    # [B*S, ...] -> [B, S, ...]
        return x.reshape((B, S) + x.shape[1:])

    return _DoublingTables(r(T1s), r(g0), r(g1), r(active), r(small),
                           r(cond57), r(T0_out), r(pg))


def _doubling_step(prev_period: jax.Array, prev_gain: jax.Array, t):
    """One frame of the continuity-dependent tail of remove_doubling.
    prev_period is in 48 kHz units (the stored last_period).  Returns
    (T0_out[S] int32, pg[S]) — exactly pitch.remove_doubling's outputs.

    The ladder's `take` decisions depend only on (g1[k], thresh[k]) — never
    on the running best — so "apply takes in order, last wins" reduces to
    one select of the highest-k taken candidate."""
    pp2 = (prev_period // 2).astype(jnp.int32)
    d = jnp.abs(t.T1s - pp2[:, None])
    cont = jnp.where(d <= 1, prev_gain[:, None],
                     jnp.where((d <= 2) & t.cond57,
                               0.5 * prev_gain[:, None], 0.0))
    thresh = jnp.maximum(0.3, 0.7 * t.g0[:, None] - cont)
    thresh = jnp.where(t.small,
                       jnp.maximum(0.4, 0.85 * t.g0[:, None] - cont), thresh)
    take = t.active & (t.g1 > thresh)

    k14 = jnp.arange(14, dtype=jnp.int32)[None, :]
    cand = 1 + jnp.max(jnp.where(take, k14, -1), axis=-1)      # [S], 0 = base
    oh = jnp.arange(15, dtype=jnp.int32)[None, :] == cand[:, None]
    T0_out = jnp.sum(jnp.where(oh, t.T0_out, 0), axis=-1)
    pg = jnp.sum(jnp.where(oh, t.pg, 0.0), axis=-1)
    return T0_out, pg


def _process_block(params: Optional[ModelParams], state: DenoiseState,
                   pcm: jax.Array, rt: RuntimeConfig):
    """Advance all streams by B frames.  pcm: [B, S, FRAME_SIZE] frame-major.
    Returns (new_state, out[B, S, FRAME_SIZE], vad[B, S])."""
    from .dsp import pallas_spectral

    B, S, _ = pcm.shape
    N = B * S

    # --- phase A: input-only signal analysis, batched over B*S frames ------
    # biquad_chunk wants [S, B, 480]; one small transpose in, one out.
    x_sm, mem_hp = biquad_chunk(jnp.moveaxis(pcm, 0, 1), state.mem_hp,
                                tables.BIQUAD_HP_B, tables.BIQUAD_HP_A)
    sig = jnp.concatenate([state.pitch_buf,
                           x_sm.reshape(S, B * FRAME_SIZE)], axis=-1)
    x = jnp.moveaxis(x_sm, 1, 0)                         # [B, S, 480]
    pbufs = jnp.stack(
        [jax.lax.slice_in_dim(sig, FRAME_SIZE * (t + 1),
                              FRAME_SIZE * (t + 1) + PITCH_BUF_SIZE, axis=1)
         for t in range(B)], axis=0)                     # [B, S, 1728]
    flat_pb = pbufs.reshape(N, PITCH_BUF_SIZE)
    ds = pitch_mod.pitch_downsample(flat_pb)
    bx = pitch_mod.lag_corr_table(ds)
    pitch = pitch_mod.pitch_search(ds, bx, exact_rank=rt.exact_pitch_rank)
    pitch_index = PITCH_MAX_PERIOD - pitch

    # --- phase B: pitch-continuity scan (2 scalars of carry per stream) ----
    tbls = _precompute_doubling(ds, pitch_index, bx, S, B)

    def dstep(carry, t):
        T0_out, pg = _doubling_step(carry[0], carry[1], t)
        return (T0_out, pg), (T0_out, pg)

    (last_period, last_gain), (T0_all, gain_all) = jax.lax.scan(
        dstep, (state.last_period, state.last_gain), tbls)   # [B, S] outs

    # --- phase A2: forward DFTs + features, batched over B*S ---------------
    x_flat = x.reshape(N, FRAME_SIZE)
    mems = jnp.concatenate([state.analysis_mem[None], x[:-1]],
                           axis=0).reshape(N, FRAME_SIZE)
    start = (PITCH_BUF_SIZE - WINDOW_SIZE - T0_all).reshape(N)
    if pallas_spectral.fused_enabled():
        Xp, Pp = pallas_spectral.forward_spectral(mems, x_flat, flat_pb,
                                                  start)
        X = _to_complex(Xp)
        P = _to_complex(Pp)
    else:
        p = take_window(flat_pb, start, WINDOW_SIZE,
                        max_start=PITCH_BUF_SIZE - WINDOW_SIZE
                        - PITCH_MIN_PERIOD)
        both = windowed_forward_transform(
            jnp.concatenate([jnp.concatenate([mems, x_flat], axis=-1), p],
                            axis=0))
        X, P = both[:N], both[N:]
    W = X.shape[-1]
    Ex = compute_band_energy(X)
    Ep = compute_band_energy(P)
    Exp = compute_band_corr(X, P) / jnp.sqrt(0.001 + Ex * Ep)

    Ly = _log_energy_follower(Ex)
    E = jnp.sum(Ex, axis=-1)
    f_bfcc = dct(Ly)
    f_bfcc = f_bfcc.at[:, 0].add(-12.0).at[:, 1].add(-4.0)
    f_corr = dct(Exp)
    f_pitch = 0.01 * (T0_all.reshape(N).astype(jnp.float32) - 300.0)
    features = jnp.concatenate([f_bfcc, f_corr, f_pitch[:, None]], axis=-1)
    silence = E < SILENCE_THRESHOLD
    features = jnp.where(silence[:, None], 0.0, features)

    def r(a):                                    # [B*S, ...] -> [B, S, ...]
        return a.reshape((B, S) + a.shape[1:])

    X, P, Ex, Ep, Exp = r(X), r(P), r(Ex), r(Ep), r(Exp)
    silence, features = r(silence), r(features)

    # --- phase C: NN + lastg scan (the real sequential core) ---------------
    Ex_prev = jnp.concatenate([state.delayed_Ex[None], Ex[:-1]], axis=0)

    def nstep(carry, xs_t):
        rnn, lastg = carry
        f, sil, exp_, exc = xs_t
        if params is not None:
            rnn, g, vad = compute_rnn(params, rnn, f, rt, silence=sil)
        else:
            g = jnp.ones((S, NB_BANDS), jnp.float32)
            vad = jnp.zeros((S,), jnp.float32)
        gc = jnp.maximum(g, 0.6 * lastg)
        lg = jnp.minimum(1.0, gc * (exp_ + 1e-3) / (exc + 1e-3))
        lg = jnp.where(sil[:, None], lastg, lg)
        return (rnn, lg), (g, gc, vad)

    (rnn_state, lastg), (g_all, gc_all, vad_all) = jax.lax.scan(
        nstep, (state.rnn, state.lastg), (features, silence, Ex_prev, Ex))

    # --- phase D: post-filter + inverse DFT + OLA, batched over B*S --------
    dX = jnp.concatenate([_to_complex(state.delayed_X)[None], X[:-1]], axis=0)
    dP = jnp.concatenate([_to_complex(state.delayed_P)[None], P[:-1]], axis=0)
    dEp = jnp.concatenate([state.delayed_Ep[None], Ep[:-1]], axis=0)
    dExp = jnp.concatenate([state.delayed_Exp[None], Exp[:-1]], axis=0)

    Xd = pitch_filter(dX, dP, Ex_prev, dEp, dExp, g_all)
    Xd = Xd * interp_band_gain(gc_all, width=W)
    sil = silence[..., None]
    X_synth = jnp.where(sil, dX, Xd)

    if W != tables.band_matrix().shape[-1]:              # permuted layout
        ri = jnp.concatenate([jnp.real(X_synth), jnp.imag(X_synth)],
                             axis=-1).reshape(N, 2 * W)
        y = pallas_spectral.inverse_spectral(ri)
    else:
        y = windowed_inverse_transform(X_synth.reshape(N, W))
    y = jax.lax.optimization_barrier(y).reshape(B, S, WINDOW_SIZE)
    out = y[..., :FRAME_SIZE] + jnp.concatenate(
        [state.synthesis_mem[None], y[:-1, :, FRAME_SIZE:]], axis=0)

    new_state = state._replace(
        analysis_mem=x[-1],
        synthesis_mem=y[-1, :, FRAME_SIZE:],
        pitch_buf=pbufs[-1],
        last_gain=last_gain,
        last_period=last_period,
        mem_hp=mem_hp,
        lastg=lastg,
        rnn=rnn_state,
        delayed_X=_to_real_pair(X[-1]),
        delayed_P=_to_real_pair(P[-1]),
        delayed_Ex=Ex[-1], delayed_Ep=Ep[-1], delayed_Exp=Exp[-1],
    )
    return new_state, out, vad_all


def _pick_block(T: int, block: Optional[int]) -> int:
    if block:
        return block if T % block == 0 else 1
    for b in (10, 8, 5, 4, 16, 2):
        if T % b == 0 and T >= b:
            return b
    return 1


def process_frames_blocked(params: Optional[ModelParams],
                           state: DenoiseState, pcm: jax.Array,
                           rt: RuntimeConfig = DEFAULT_RUNTIME,
                           block: Optional[int] = None):
    """Drop-in replacement for :func:`rnnoise_tpu.denoise.process_frames`
    (same signature + ``block``): scans B-frame blocks instead of single
    frames.  ``block=None`` picks the largest of (10, 8, 5, 4, 16, 2)
    dividing T; a non-dividing explicit block falls back to per-frame."""
    S, T, _ = pcm.shape
    B = _pick_block(T, block)
    if B <= 1:
        return process_frames(params, state, pcm, rt)

    def bstep(st, blk):
        st, o, v = _process_block(params, st, blk, rt)
        return st, (o, v)

    # [T/B, B, S, 480] frame-major blocks (one transpose for the chunk)
    blocks = jnp.transpose(pcm.reshape(S, T // B, B, FRAME_SIZE),
                           (1, 2, 0, 3))
    state, (out, vad) = jax.lax.scan(bstep, state, blocks)
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(S, T, FRAME_SIZE)
    vad = jnp.transpose(vad, (2, 0, 1)).reshape(S, T)
    return state, out, vad
