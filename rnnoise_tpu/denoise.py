"""Batched streaming denoiser core — the TPU re-design of
``rnnoise_process_frame`` (reference src/denoise.c:457-504).

Design stance (SURVEY.md §7): the unit of work is a **batch of streams**, not a
frame of one stream.  The per-stream ``DenoiseState`` (denoise.c:68-88) becomes
the batched pytree :class:`DenoiseState` with a leading ``[S]`` axis;
``process_frame`` advances all S streams by one 10 ms frame inside a single
jitted graph, and ``process_frames`` scans it over a ``[S, T, 480]`` chunk.

Silence handling follows the reference exactly (denoise.c:389-393, 474-495):
on silent frames the RNN state is left untouched and no gain/pitch filtering is
applied, but synthesis and the delayed-spectrum rotation still happen.  With a
batch this becomes per-stream ``where`` masking rather than a branch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import (DEFAULT_MODEL, DEFAULT_RUNTIME, FRAME_SIZE, FREQ_SIZE,
                     ModelConfig, NB_BANDS, PITCH_BUF_SIZE,
                     PITCH_MAX_PERIOD, PITCH_MIN_PERIOD, RuntimeConfig,
                     SILENCE_THRESHOLD, WINDOW_SIZE)
from . import tables
from .dsp import biquad as biquad_mod
from .dsp import pitch as pitch_mod
from .dsp.gather import take_window
from .dsp.transform import (compute_band_corr, compute_band_energy, dct,
                            frame_synthesis, interp_band_gain,
                            windowed_forward_transform)
from .models.rnn import ModelParams, RNNState, compute_rnn, init_rnn_state


class DenoiseState(NamedTuple):
    """Batched equivalent of the reference DenoiseState (denoise.c:68-88)."""

    analysis_mem: jax.Array      # [S, FRAME_SIZE]
    synthesis_mem: jax.Array     # [S, FRAME_SIZE]
    pitch_buf: jax.Array         # [S, PITCH_BUF_SIZE]
    last_gain: jax.Array         # [S]
    last_period: jax.Array       # [S] int32
    mem_hp: jax.Array            # [S, 2]
    lastg: jax.Array             # [S, NB_BANDS]
    rnn: RNNState
    delayed_X: jax.Array         # [S, 2*FREQ_SIZE] f32, re|im concatenated
    delayed_P: jax.Array         # (complex is kept out of jit boundaries:
                                 # some TPU runtimes handle complex64
                                 # host<->device transfers unreliably; the
                                 # flat [962] layout also tiles lanes fully —
                                 # a trailing re/im axis of 2 wastes 126/128
                                 # lanes on TPU)
    delayed_Ex: jax.Array        # [S, NB_BANDS]
    delayed_Ep: jax.Array        # [S, NB_BANDS]
    delayed_Exp: jax.Array       # [S, NB_BANDS]


def _spec_width() -> int:
    """Width of one stored spectrum half (re or im): FREQ_SIZE in natural
    order, PERM_WIDTH when the fused Pallas kernels' permuted layout is
    active on this backend."""
    from .dsp import pallas_spectral
    if pallas_spectral.fused_enabled():
        return pallas_spectral.PERM_WIDTH
    return FREQ_SIZE


# Whole-frame monokernel dispatch (dsp/pallas_frame): "on" routes
# process_frames_tm through the single-Pallas-call T-grid kernel when
# viable, "off" always scans process_frame.  Default ON since round 4: on
# v5e at S=3072/T=400 the shipping config (alias-coarse + incremental ds +
# block=256/fps=4) measures 1.341 ms/frame vs the scan's 1.389
# (scripts/bench_mono.py grid, 2026-08-19).
# COLD-COMPILE COST: the first jit of an fps>1 monokernel config is slow
# through a remote-compile toolchain (minutes; ~45 min for the unrolled
# fps=4 body through the axon relay).  The repo-local persistent
# compilation cache (rnnoise_tpu/__init__.py) amortises this across
# processes — run scripts/prewarm.py once per checkout, or flip
# set_monokernel("off") for latency-sensitive cold starts.
_MONOKERNEL = "on"
# Block preference order: 256 first — it admits frames_per_step=4 within
# the 120 MB scoped-VMEM budget (384 OOMs at fps>=2 by <1 MB: 120.88M).
_MONO_BLOCKS = (256, 384, 128)
_MONO_FPS = 4                 # frames per grid step (see pallas_frame)
# fps>1 is VMEM-viable only at block<=256 on v5e (measured: b384/fps2
# scoped-alloc 120.88M > 120M limit); larger blocks run per-frame.
_MONO_FPS_MAX_BLOCK = 256


def set_monokernel(mode: str) -> None:
    global _MONOKERNEL
    assert mode in ("on", "off")
    _MONOKERNEL = mode


def _mono_block(S: int) -> Optional[int]:
    for b in _MONO_BLOCKS:
        if S % b == 0:
            return b
    return None


def _mono_cfg(T: int, S: int) -> tuple:
    """(block, frames_per_step) for the monokernel dispatch: fps falls back
    through divisors (_MONO_FPS -> ... -> 1) so a T that merely fails the
    top divisor (e.g. T=402) still runs the best measured-good fps that
    fits, gated by the fps>1 VMEM budget (block <= _MONO_FPS_MAX_BLOCK)."""
    block = _mono_block(S)
    fps = 1
    if block is not None and block <= _MONO_FPS_MAX_BLOCK:
        f = _MONO_FPS
        while f > 1 and T % f:
            f //= 2
        fps = max(f, 1)
    return block, fps


def _monokernel_viable(params, state, S: int, rt: RuntimeConfig) -> bool:
    from .dsp import pallas_spectral
    return (_MONOKERNEL == "on" and params is not None
            and rt.quantized and rt.approx_act
            and params.conv2.weights_q is not None
            and pallas_spectral.fused_enabled()     # permuted state layout
            and state.delayed_X.shape[-1] == 2 * pallas_spectral.PERM_WIDTH
            and _mono_block(S) is not None
            and jax.default_backend() == "tpu")


_PACKED_CACHE: dict = {}


def _packed_weights(params):
    """pack_params memoised by identity (holds a strong ref so ids stay
    valid; models are few and long-lived)."""
    key = id(params)
    hit = _PACKED_CACHE.get(key)
    if hit is None or hit[0] is not params:
        from .nn.pallas_rnn import pack_params
        if any(isinstance(leaf, jax.core.Tracer)
               for leaf in jax.tree.leaves(params)):
            raise TypeError(
                "monokernel params must be concrete (close over them rather "
                "than passing them as jit arguments): packing runs at trace "
                "time and the result is cached by object identity")
        # ensure_compile_time_eval: when the first call happens inside a jit
        # trace (bench.py jits the whole dispatch), packing must still run
        # eagerly so the packed weights are concrete constants — pallas_call
        # BlockSpecs need their shapes, and re-packing per call would retrace.
        with jax.ensure_compile_time_eval():
            _PACKED_CACHE[key] = hit = (params, pack_params(params))
    return hit[1]


def init_state(n_streams: int,
               config: ModelConfig = DEFAULT_MODEL) -> DenoiseState:
    """Zero state for S streams (rnnoise_init, denoise.c:285-309)."""
    S = n_streams
    f32 = jnp.float32
    return DenoiseState(
        analysis_mem=jnp.zeros((S, FRAME_SIZE), f32),
        synthesis_mem=jnp.zeros((S, FRAME_SIZE), f32),
        pitch_buf=jnp.zeros((S, PITCH_BUF_SIZE), f32),
        last_gain=jnp.zeros((S,), f32),
        last_period=jnp.zeros((S,), jnp.int32),
        mem_hp=jnp.zeros((S, 2), f32),
        lastg=jnp.zeros((S, NB_BANDS), f32),
        rnn=init_rnn_state(S, config),
        delayed_X=jnp.zeros((S, 2 * _spec_width()), f32),
        delayed_P=jnp.zeros((S, 2 * _spec_width()), f32),
        delayed_Ex=jnp.zeros((S, NB_BANDS), f32),
        delayed_Ep=jnp.zeros((S, NB_BANDS), f32),
        delayed_Exp=jnp.zeros((S, NB_BANDS), f32),
    )


def reset_streams(state: DenoiseState, mask: jax.Array) -> DenoiseState:
    """Re-init the streams where ``mask`` is True without touching the others —
    the batched form of calling rnnoise_init on one stream (stream
    attach/detach support; no C analogue needed since states there are
    per-stream).  Fresh state is all-zeros with the incoming state's shapes,
    so custom model configs are handled."""
    S = state.analysis_mem.shape[0]
    def blend(a):
        m = mask.reshape((S,) + (1,) * (a.ndim - 1))
        return jnp.where(m, jnp.zeros_like(a), a)
    return jax.tree.map(blend, state)


# ---------------------------------------------------------------------------
# feature extraction (rnn_compute_frame_features, denoise.c:347-398)
# ---------------------------------------------------------------------------

class FrameFeatures(NamedTuple):
    X: jax.Array           # [S, FREQ_SIZE] complex
    P: jax.Array           # [S, FREQ_SIZE] complex
    Ex: jax.Array          # [S, NB_BANDS]
    Ep: jax.Array
    Exp: jax.Array
    features: jax.Array    # [S, NB_FEATURES]
    silence: jax.Array     # [S] bool


def _log_energy_follower(Ex: jax.Array) -> jax.Array:
    """The spectral-floor follower of denoise.c:381-388, unrolled over the 32
    bands (cheap [S]-wide ops; the recurrence is only 32 steps)."""
    L = jnp.log10(1e-2 + Ex)
    log_max = jnp.full_like(L[:, 0], -2.0)
    follow = jnp.full_like(L[:, 0], -2.0)
    cols = []
    for i in range(NB_BANDS):
        ly = jnp.maximum(log_max - 7.0, jnp.maximum(follow - 1.5, L[:, i]))
        log_max = jnp.maximum(log_max, ly)
        follow = jnp.maximum(follow - 1.5, ly)
        cols.append(ly)
    return jnp.stack(cols, axis=-1)


def compute_frame_features(state: DenoiseState, x: jax.Array,
                           training: bool = False,
                           lowpass_bin: Optional[jax.Array] = None,
                           exact_pitch_rank: bool = False,
                           ) -> Tuple[DenoiseState, FrameFeatures]:
    """x: [S, FRAME_SIZE] HP-filtered PCM.  Returns the updated state (analysis
    mem, pitch buffer, pitch continuity) and this frame's features.

    ``training`` replicates the -DTRAINING build (denoise.c:340-343, 389-397):
    the silence gate becomes E < 0.1 without clearing features, and
    ``lowpass_bin`` [S] zeroes spectrum bins >= lowpass (the data-augmentation
    hook)."""
    pitch_buf = jnp.concatenate([state.pitch_buf[:, FRAME_SIZE:], x], axis=-1)

    ds = pitch_mod.pitch_downsample(pitch_buf)
    from .dsp import pallas_analysis, pallas_spectral
    if (lowpass_bin is None and not training and not exact_pitch_rank
            and pallas_analysis.analysis_enabled()):
        # Fused analysis kernel: fine lag table + ranking + doubling ladder
        # + window extraction + both forward DFTs in one VMEM-resident call
        # (only the cheap coarse conv stays outside).
        bp0, bp1 = pitch_mod.coarse_search(ds)
        Xp, Pp, T0, gain = pallas_analysis.analysis_spectral(
            state.analysis_mem, x, pitch_buf, ds, bp0, bp1,
            state.last_period, state.last_gain)
        X = _to_complex(Xp)
        P = _to_complex(Pp)
        analysis_mem = x
        Ex = compute_band_energy(X)
        Ep = compute_band_energy(P)
        Exp_raw = compute_band_corr(X, P)
        Exp = Exp_raw / jnp.sqrt(0.001 + Ex * Ep)
        Ly = _log_energy_follower(Ex)
        E = jnp.sum(Ex, axis=-1)
        f_bfcc = dct(Ly)
        f_bfcc = f_bfcc.at[:, 0].add(-12.0).at[:, 1].add(-4.0)
        f_corr = dct(Exp)
        f_pitch = 0.01 * (T0.astype(jnp.float32) - 300.0)
        features = jnp.concatenate([f_bfcc, f_corr, f_pitch[:, None]],
                                   axis=-1)
        silence = E < SILENCE_THRESHOLD
        features = jnp.where(silence[:, None], 0.0, features)
        new_state = state._replace(analysis_mem=analysis_mem,
                                   pitch_buf=pitch_buf,
                                   last_period=T0, last_gain=gain)
        return new_state, FrameFeatures(X, P, Ex, Ep, Exp, features, silence)

    bx = pitch_mod.lag_corr_table(ds)     # shared by fine search + doubling
    pitch = pitch_mod.pitch_search(ds, bx, exact_rank=exact_pitch_rank)
    pitch_index = PITCH_MAX_PERIOD - pitch
    T0, gain = pitch_mod.remove_doubling(ds, pitch_index, state.last_period,
                                         state.last_gain, bx)

    # pitch-delayed window p[i] = pitch_buf[PITCH_BUF_SIZE-WINDOW_SIZE-T0+i]
    # (one-hot shifted-sum window extraction — element gathers are slow on TPU)
    start = PITCH_BUF_SIZE - WINDOW_SIZE - T0
    S = x.shape[0]
    if lowpass_bin is None and pallas_spectral.fused_enabled():
        # Fused Pallas kernel: window extraction + both factored forward DFTs
        # in one VMEM-resident pass.  The spectra come back in the kernels'
        # permuted bin order (pallas_spectral.spectrum_perm); every consumer
        # downstream is either elementwise or uses layout-aware matrices.
        Xp, Pp = pallas_spectral.forward_spectral(state.analysis_mem, x,
                                                  pitch_buf, start)
        X = _to_complex(Xp)
        P = _to_complex(Pp)
        analysis_mem = x
        Ex = compute_band_energy(X)
        Ep = compute_band_energy(P)
    else:
        p = take_window(pitch_buf, start, WINDOW_SIZE,
                        max_start=PITCH_BUF_SIZE - WINDOW_SIZE
                        - PITCH_MIN_PERIOD)
        # X (analysis) and P (pitch window) share one stacked DFT matmul.
        win = jnp.concatenate([state.analysis_mem, x], axis=-1)
        both = windowed_forward_transform(
            jnp.concatenate([win, p], axis=0))
        X, P = both[:S], both[S:]
        if lowpass_bin is not None:
            bins = jnp.arange(X.shape[-1])[None, :]
            X = jnp.where(bins < lowpass_bin[:, None], X, 0.0)
        analysis_mem = x
        if lowpass_bin is None:
            Eboth = compute_band_energy(both)
            Ex, Ep = Eboth[:S], Eboth[S:]
        else:
            Ex = compute_band_energy(X)
            Ep = compute_band_energy(P)
    Exp_raw = compute_band_corr(X, P)
    Exp = Exp_raw / jnp.sqrt(0.001 + Ex * Ep)

    Ly = _log_energy_follower(Ex)
    E = jnp.sum(Ex, axis=-1)

    f_bfcc = dct(Ly)
    f_bfcc = f_bfcc.at[:, 0].add(-12.0).at[:, 1].add(-4.0)
    f_corr = dct(Exp)
    f_pitch = 0.01 * (T0.astype(jnp.float32) - 300.0)
    features = jnp.concatenate([f_bfcc, f_corr, f_pitch[:, None]], axis=-1)

    if training:
        silence = E < 0.1
    else:
        silence = E < SILENCE_THRESHOLD
        features = jnp.where(silence[:, None], 0.0, features)

    new_state = state._replace(analysis_mem=analysis_mem, pitch_buf=pitch_buf,
                               last_period=T0, last_gain=gain)
    return new_state, FrameFeatures(X, P, Ex, Ep, Exp, features, silence)


def _to_complex(x):
    h = x.shape[-1] // 2
    return jax.lax.complex(x[..., :h], x[..., h:])


def _to_real_pair(X):
    return jnp.concatenate([jnp.real(X), jnp.imag(X)], axis=-1)


def _frame_analysis(analysis_mem, x, lowpass_bin=None):
    win = jnp.concatenate([analysis_mem, x], axis=-1)
    X = windowed_forward_transform(win)
    if lowpass_bin is not None:
        bins = jnp.arange(X.shape[-1])[None, :]
        X = jnp.where(bins < lowpass_bin[:, None], X, 0.0)
    return x, X, compute_band_energy(X)


# ---------------------------------------------------------------------------
# pitch comb filter (rnn_pitch_filter, denoise.c:421-455)
# ---------------------------------------------------------------------------

def pitch_filter(X, P, Ex, Ep, Exp, g):
    w = X.shape[-1]                     # natural or permuted spectrum layout
    sq = jnp.square
    r = jnp.where(Exp > g, 1.0,
                  sq(Exp) * (1.0 - sq(g)) / (0.001 + sq(g) * (1.0 - sq(Exp))))
    r = jnp.sqrt(jnp.clip(r, 0.0, 1.0))
    r = r * jnp.sqrt(Ex / (1e-8 + Ep))
    rf = interp_band_gain(r, width=w)
    X = X + rf * P
    newE = compute_band_energy(X)
    norm = jnp.sqrt(Ex / (1e-8 + newE))
    normf = interp_band_gain(norm, width=w)
    return X * normf


# ---------------------------------------------------------------------------
# the per-frame step
# ---------------------------------------------------------------------------

def process_frame(params: Optional[ModelParams], state: DenoiseState,
                  pcm: jax.Array, rt: RuntimeConfig = DEFAULT_RUNTIME):
    """Advance all streams by one frame.

    pcm: [S, FRAME_SIZE] float PCM in int16 scale.
    Returns (new_state, out_pcm[S, FRAME_SIZE], vad[S]).
    ``params=None`` runs the DSP path with unity gains (no model), useful for
    latency/passthrough testing.
    """
    x, mem_hp = biquad_mod.biquad(pcm, state.mem_hp,
                                  tables.BIQUAD_HP_B, tables.BIQUAD_HP_A)
    state = state._replace(mem_hp=mem_hp)
    return _process_frame_hp(params, state, x, rt)


def _process_frame_hp(params: Optional[ModelParams], state: DenoiseState,
                      x: jax.Array, rt: RuntimeConfig):
    """process_frame after the HP biquad (x already filtered) — the scan body
    of process_frames, which hoists the biquad out of the frame loop."""
    state, ff = compute_frame_features(state, x,
                                       exact_pitch_rank=rt.exact_pitch_rank)
    silence = ff.silence

    if params is not None:
        # Silent frames freeze the RNN state and zero the VAD (compute_rnn
        # skipped in C) — applied inside compute_rnn (in-kernel on TPU).
        rnn_state, g, vad = compute_rnn(params, state.rnn, ff.features, rt,
                                        silence=silence)
    else:
        rnn_state = state.rnn
        g = jnp.ones((x.shape[0], NB_BANDS), jnp.float32)
        vad = jnp.zeros((x.shape[0],), jnp.float32)

    # Pitch-filter + apply gains to the *previous* frame's spectrum.
    from .dsp import pallas_spectral
    if pallas_spectral.postfilter_enabled() and \
            state.delayed_X.shape[-1] == 2 * pallas_spectral.PERM_WIDTH:
        # One fused kernel for the whole delayed-frame tail: comb filter,
        # renormalisation, gain cap/apply, silence blend, inverse DFT, OLA.
        out, synthesis_mem, lastg = pallas_spectral.postfilter_synthesis(
            state.delayed_X, state.delayed_P, state.delayed_Ex,
            state.delayed_Ep, state.delayed_Exp, g, state.lastg, ff.Ex,
            silence, state.synthesis_mem)
    else:
        delayed_X = _to_complex(state.delayed_X)
        delayed_P = _to_complex(state.delayed_P)
        Xd = pitch_filter(delayed_X, delayed_P, state.delayed_Ex,
                          state.delayed_Ep, state.delayed_Exp, g)
        g_capped = jnp.maximum(g, 0.6 * state.lastg)
        lastg = jnp.minimum(1.0, g_capped * (state.delayed_Ex + 1e-3)
                            / (ff.Ex + 1e-3))
        gf = interp_band_gain(g_capped, width=delayed_X.shape[-1])
        Xd = Xd * gf

        sil = silence[:, None]
        X_synth = jnp.where(sil, delayed_X, Xd)
        lastg = jnp.where(sil, state.lastg, lastg)

        synthesis_mem, out = frame_synthesis(state.synthesis_mem, X_synth)

    new_state = state._replace(
        synthesis_mem=synthesis_mem,
        lastg=lastg,
        rnn=rnn_state,
        delayed_X=_to_real_pair(ff.X), delayed_P=_to_real_pair(ff.P),
        delayed_Ex=ff.Ex, delayed_Ep=ff.Ep, delayed_Exp=ff.Exp,
    )
    return new_state, out, vad


def process_frames_tm(params: Optional[ModelParams], state: DenoiseState,
                      pcm: jax.Array, rt: RuntimeConfig = DEFAULT_RUNTIME):
    """Time-major chunk processing: pcm [T, S, FRAME_SIZE] -> (new_state,
    out[T, S, FRAME_SIZE], vad[T, S]).

    The scan iterates over the leading axis, so time-major I/O avoids the
    [S, T] <-> [T, S] transposes of :func:`process_frames` entirely (~2.5%
    of the frame budget at S=4096 on v5e).  Producers that can emit
    time-major batches directly (bench, the native stream pool) should use
    this entry point.
    """
    # NOTE an alternative that hoists the biquad out of the loop
    # (biquad_chunk: one [S*T, 480] kernel matmul + tiny state scan) measured
    # a consistent ~4% SLOWER at S=4096/T=100 on v5e: the extra HBM round
    # trip of the materialised filtered chunk outweighs the batched-matmul
    # win.  Kept in dsp/biquad.py (bit-matching test) for shorter-T serving
    # shapes where the trade flips.  A full block-batched restructure
    # measured 35-45% slower at every (S, B) — scoped-VMEM residency
    # (CLAUDE.md "round 2 mid"); the module (denoise_blocked) was pruned in
    # round 3 once the monokernel superseded the idea.
    if _monokernel_viable(params, state, pcm.shape[1], rt):
        from .dsp.pallas_frame import process_chunk_monokernel
        block, fps = _mono_cfg(pcm.shape[0], pcm.shape[1])
        return process_chunk_monokernel(state, pcm, _packed_weights(params),
                                        block=block, frames_per_step=fps)

    def step(st, frame):
        st, out, vad = process_frame(params, st, frame, rt)
        return st, (out, vad)

    # unroll=2: XLA copies the loop-carried state once per scan iteration,
    # so pairing frames halves that traffic (+5% streams on v5e; unroll=4
    # regresses — scheduling/VMEM pressure).  TPU-only: on CPU the doubled
    # scan body buys nothing and doubles compile time for every test (the
    # checkify-wrapped pipeline went from ~3 to ~15 min).
    T = pcm.shape[0]
    unroll = 2 if (T % 2 == 0 and jax.default_backend() == "tpu") else 1
    state, (out, vad) = jax.lax.scan(step, state, pcm, unroll=unroll)
    return state, out, vad


def process_frames(params: Optional[ModelParams], state: DenoiseState,
                   pcm: jax.Array, rt: RuntimeConfig = DEFAULT_RUNTIME):
    """Scan process_frame over time.  pcm: [S, T, FRAME_SIZE].

    Returns (new_state, out[S, T, FRAME_SIZE], vad[S, T]).
    """
    state, out, vad = process_frames_tm(params, state,
                                        jnp.moveaxis(pcm, 1, 0), rt)
    return state, jnp.moveaxis(out, 0, 1), jnp.moveaxis(vad, 0, 1)


def process_frames_tm_i16(params: Optional[ModelParams], state: DenoiseState,
                          pcm: jax.Array,
                          rt: RuntimeConfig = DEFAULT_RUNTIME):
    """Int16-at-the-boundary variant of :func:`process_frames_tm`:
    pcm [T, S, FRAME_SIZE] int16 -> (state, out int16, vad).

    The int16<->f32 conversions run on-device, so the host moves HALF the
    bytes per tick and skips its conversion loops entirely (they dominated
    the single-core host tick).  Output rounding is bit-identical to the
    native ring's float path: round half away from zero, clip to int16
    (streamio.cc Ring::push_f32)."""
    if _monokernel_viable(params, state, pcm.shape[1], rt):
        # conversions move INSIDE the kernel: int16 pcm in, int16 out
        from .dsp.pallas_frame import process_chunk_monokernel
        block, fps = _mono_cfg(pcm.shape[0], pcm.shape[1])
        return process_chunk_monokernel(state, pcm.astype(jnp.int16),
                                        _packed_weights(params),
                                        block=block, frames_per_step=fps)
    state, out, vad = process_frames_tm(params, state,
                                        pcm.astype(jnp.float32), rt)
    rounded = jnp.trunc(jnp.where(out > 0, out + 0.5, out - 0.5))
    out_i16 = jnp.clip(rounded, -32768.0, 32767.0).astype(jnp.int16)
    return state, out_i16, vad
