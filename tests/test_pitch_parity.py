"""Golden parity of the pitch stack (downsample/whiten, search, doubling
removal) vs the reference C oracle, on speech-like and adversarial signals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import PITCH_BUF_SIZE, PITCH_MAX_PERIOD
from rnnoise_tpu.dsp import pitch as pm

from tests.conftest import speechlike


def _bufs(rng, speech_signal):
    """A few representative 1728-sample pitch buffers."""
    bufs = []
    for off in (0, 5000, 20000):
        bufs.append(speech_signal[off:off + PITCH_BUF_SIZE])
    bufs.append((3000 * rng.standard_normal(PITCH_BUF_SIZE)).astype(np.float32))
    bufs.append(np.zeros(PITCH_BUF_SIZE, np.float32))
    bufs.append(speechlike(rng, PITCH_BUF_SIZE, f0=220.0))
    bufs.append(speechlike(rng, PITCH_BUF_SIZE, f0=70.0, noise=0.3))
    return np.stack(bufs)


def test_pitch_downsample_parity(oracle_int8, rng, speech_signal):
    bufs = _bufs(rng, speech_signal)
    ours = np.asarray(pm.pitch_downsample(jnp.asarray(bufs)))
    for i, buf in enumerate(bufs):
        ref = oracle_int8.pitch_downsample(buf)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours[i], ref, atol=3e-5 * scale,
                                   err_msg=f"buffer {i}")


def test_pitch_search_parity(oracle_int8, rng, speech_signal):
    bufs = _bufs(rng, speech_signal)
    ds = np.stack([oracle_int8.pitch_downsample(b) for b in bufs])
    ours = np.asarray(pm.pitch_search(jnp.asarray(ds)))
    for i in range(len(bufs)):
        ref = oracle_int8.pitch_search(ds[i])
        assert ours[i] == ref, f"buffer {i}: {ours[i]} vs {ref}"


def test_remove_doubling_parity(oracle_int8, rng, speech_signal):
    bufs = _bufs(rng, speech_signal)
    ds = np.stack([oracle_int8.pitch_downsample(b) for b in bufs])
    pitches = np.array([oracle_int8.pitch_search(d) for d in ds], np.int32)
    pidx = PITCH_MAX_PERIOD - pitches
    prev_periods = np.array([0, 100, 250, 60, 0, 419, 763], np.int32)[:len(bufs)]
    prev_gains = np.array([0.0, 0.5, 0.9, 0.2, 0.0, 0.7, 0.3],
                          np.float32)[:len(bufs)]
    T_ours, g_ours = pm.remove_doubling(jnp.asarray(ds), jnp.asarray(pidx),
                                        jnp.asarray(prev_periods),
                                        jnp.asarray(prev_gains))
    T_ours, g_ours = np.asarray(T_ours), np.asarray(g_ours)
    for i in range(len(bufs)):
        T_ref, g_ref = oracle_int8.remove_doubling(
            ds[i], pidx[i], prev_periods[i], prev_gains[i])
        assert T_ours[i] == T_ref, f"buffer {i}: T {T_ours[i]} vs {T_ref}"
        np.testing.assert_allclose(g_ours[i], g_ref, atol=1e-4,
                                   err_msg=f"buffer {i}")


def test_pitch_chain_many_frames(oracle_int8, rng):
    """Track the full pitch chain (incl. prev-period continuity) frame by
    frame on a long evolving signal."""
    sig = speechlike(rng, 480 * 120, f0=130.0, noise=0.1)
    # add an f0 sweep segment
    t = np.arange(480 * 60) / 48000.0
    sweep = 3000 * np.sin(2 * np.pi * (100 + 60 * t) * t)
    sig[480 * 30: 480 * 90] += sweep.astype(np.float32)

    @jax.jit
    def step(buf, pp, pg):
        ds = pm.pitch_downsample(buf)
        pi = PITCH_MAX_PERIOD - pm.pitch_search(ds)
        return pm.remove_doubling(ds, pi, pp, pg)

    buf = np.zeros(PITCH_BUF_SIZE, np.float32)
    pp_c, pg_c = 0, 0.0
    pp_j = jnp.zeros((1,), jnp.int32)
    pg_j = jnp.zeros((1,), jnp.float32)
    n_mismatch = 0
    for f in range(120):
        frame = sig[f * 480:(f + 1) * 480]
        buf = np.concatenate([buf[480:], frame])
        ds_c = oracle_int8.pitch_downsample(buf)
        pi_c = PITCH_MAX_PERIOD - oracle_int8.pitch_search(ds_c)
        T_c, g_c = oracle_int8.remove_doubling(ds_c, pi_c, pp_c, pg_c)
        pp_c, pg_c = T_c, g_c

        T_j, g_j = step(jnp.asarray(buf)[None], pp_j, pg_j)
        pp_j, pg_j = T_j, g_j
        if int(np.asarray(T_j)[0]) != T_c:
            n_mismatch += 1
    # Marginal ranking comparisons may rarely flip a candidate; require the
    # chain to stay in lock-step on virtually all frames.
    assert n_mismatch <= 2, f"{n_mismatch} pitch mismatches over 120 frames"


def test_pitch_chain_exact_rank_zero_mismatches(oracle_int8, rng):
    """With exact_rank, find_best_pitch's cross-multiplied sequential ranking
    (pitch.c:44-102) is replicated bit-exactly, so the 120-frame chain must
    match the oracle on EVERY frame (the default ratio ranking is allowed
    rare near-tie flips, test above)."""
    sig = speechlike(rng, 480 * 120, f0=130.0, noise=0.1)
    t = np.arange(480 * 60) / 48000.0
    sweep = 3000 * np.sin(2 * np.pi * (100 + 60 * t) * t)
    sig[480 * 30: 480 * 90] += sweep.astype(np.float32)

    @jax.jit
    def step(buf, pp, pg):
        ds = pm.pitch_downsample(buf)
        pi = PITCH_MAX_PERIOD - pm.pitch_search(ds, exact_rank=True)
        return pm.remove_doubling(ds, pi, pp, pg)

    buf = np.zeros(PITCH_BUF_SIZE, np.float32)
    pp_c, pg_c = 0, 0.0
    pp_j = jnp.zeros((1,), jnp.int32)
    pg_j = jnp.zeros((1,), jnp.float32)
    mismatches = []
    for f in range(120):
        frame = sig[f * 480:(f + 1) * 480]
        buf = np.concatenate([buf[480:], frame])
        ds_c = oracle_int8.pitch_downsample(buf)
        pi_c = PITCH_MAX_PERIOD - oracle_int8.pitch_search(ds_c)
        T_c, g_c = oracle_int8.remove_doubling(ds_c, pi_c, pp_c, pg_c)
        pp_c, pg_c = T_c, g_c

        T_j, g_j = step(jnp.asarray(buf)[None], pp_j, pg_j)
        pp_j, pg_j = T_j, g_j
        if int(np.asarray(T_j)[0]) != T_c:
            mismatches.append((f, int(np.asarray(T_j)[0]), T_c))
    assert not mismatches, f"pitch mismatches with exact_rank: {mismatches}"
