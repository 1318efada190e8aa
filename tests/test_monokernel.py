"""Whole-frame monokernel (dsp/pallas_frame) held to the mainline parity bar:
150 stateful frames vs the compiled C oracle, same budgets as
test_process_frame_parity (PCM <4 LSB, VAD <2e-3), with the silent and
noise-only stretches of _make_signal exercising the silence freeze across
the VMEM scratch carry.  Runs the pallas wrapper in interpret mode on CPU;
the on-chip A/B lives in scripts/tpu_fast_parity.py (same budgets)."""

import numpy as np
import jax.numpy as jnp

from rnnoise_tpu.config import FRAME_SIZE
from rnnoise_tpu.denoise import init_state
from rnnoise_tpu.dsp import pallas_frame as pf
from rnnoise_tpu.dsp import pallas_spectral as ps
from rnnoise_tpu.nn.pallas_rnn import pack_params

from tests.test_e2e_parity import _make_signal


def _permuted_state(n):
    return init_state(n)._replace(
        delayed_X=jnp.zeros((n, 2 * ps.PERM_WIDTH)),
        delayed_P=jnp.zeros((n, 2 * ps.PERM_WIDTH)))


import pytest


@pytest.mark.parametrize("alias", [False, True])
def test_monokernel_oracle_parity_150_frames(oracle_int8, model_params, rng,
                                             alias):
    """The T-grid monokernel (grid-carried VMEM state, interpret mode) stays
    within the mainline oracle budget over 150 stateful frames dispatched as
    three 50-frame chunks — the chunk boundaries also pin the HBM state
    round trip between pallas calls.  Reference hot loop:
    denoise.c:457-504 (rnnoise_process_frame).  Parametrized over the
    alias-coarse pitch formulation (pallas_frame._ALIAS_COARSE), holding
    both correlation structures to the same oracle budget."""
    with pf.alias_coarse(alias):
        _run_oracle_parity(oracle_int8, model_params, rng)


def _run_oracle_parity(oracle_int8, model_params, rng):
    n_frames = 150
    chunk = 50
    sig = _make_signal(rng, n_frames)

    st_c = oracle_int8.create_state()
    out_c = []
    vad_c = []
    for f in range(n_frames):
        o, v = st_c.process_frame(sig[f * FRAME_SIZE:(f + 1) * FRAME_SIZE])
        out_c.append(o)
        vad_c.append(v)
    out_c = np.stack(out_c)
    vad_c = np.array(vad_c)

    weights = pack_params(model_params)
    state = _permuted_state(1)
    outs, vads = [], []
    for i in range(0, n_frames, chunk):
        pcm_tm = jnp.asarray(
            sig[i * FRAME_SIZE:(i + chunk) * FRAME_SIZE]
            .reshape(chunk, 1, FRAME_SIZE))
        state, o, v = pf.process_chunk_monokernel(
            state, pcm_tm, weights, block=1, interpret=True)
        outs.append(np.asarray(o)[:, 0])
        vads.append(np.asarray(v)[:, 0])
    out_j = np.concatenate(outs)
    vad_j = np.concatenate(vads)

    max_pcm = np.abs(out_j - out_c).max()
    max_vad = np.abs(vad_j - vad_c).max()
    assert max_pcm < 4.0, f"PCM diverged: {max_pcm} LSB"
    assert max_vad < 2e-3, f"VAD diverged: {max_vad}"


def test_alias_coarse_decisions(rng):
    """The alias-coarse pitch chain (coarse table derived from the fine
    n=894 spectra by radix-2 aliasing, combined energy matmul) reaches the
    same (period, gain) decisions as the own-DFT coarse path on a seeded
    batch of speech-like whitened buffers (knife-edge ranking tolerance:
    this set must be mismatch-free; the stateful budget lives in the
    parametrized oracle test)."""
    import jax.numpy as jnp
    B = 64
    t = np.arange(864)
    ds = np.stack([
        (500 + 4000 * rng.random())
        * np.sin(2 * np.pi * t / (20 + 160 * rng.random()) + rng.random() * 6)
        + 300 * rng.standard_normal(864) for _ in range(B)]).astype(np.float32)
    ds = jnp.asarray(ds)
    lp = jnp.asarray(rng.integers(60, 700, B), np.int32)
    lg = jnp.asarray(rng.random(B), jnp.float32)

    with pf.alias_coarse(False):
        c0 = pf.frame_consts()
        bp0, bp1 = pf._coarse_body(
            ds, jnp.asarray(c0.sel_even), jnp.asarray(c0.box387[0]),
            tuple(jnp.asarray(a) for a in c0.c512), B)
        from rnnoise_tpu.dsp.pallas_analysis import _pitch_body
        T0a, ga = _pitch_body(ds, bp0, bp1, lp, lg,
                              tuple(jnp.asarray(a) for a in c0.c1024),
                              jnp.asarray(c0.box864[0]), B)
    with pf.alias_coarse(True):
        T0b, gb = pf._pitch_chain_alias(ds, lp, lg, pf.frame_consts(), B)
    assert int((np.asarray(T0a) != np.asarray(T0b)).sum()) == 0
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


def test_monokernel_multi_block_grid(model_params, rng):
    """Multiple stream blocks (grid dim 0) don't cross-talk: S=4 with
    block=2 == two independent S=2/block=2 runs, bitwise (the same body
    runs in both; only the grid partitioning differs)."""
    T, S = 8, 4
    sigs = np.stack([_make_signal(np.random.default_rng(100 + i), T)
                     for i in range(S)])
    pcm_tm = jnp.asarray(sigs.reshape(S, T, FRAME_SIZE).transpose(1, 0, 2))
    weights = pack_params(model_params)

    st_all, out_all, vad_all = pf.process_chunk_monokernel(
        _permuted_state(S), pcm_tm, weights, block=2, interpret=True)
    for lo in (0, 2):
        st_h, out_h, vad_h = pf.process_chunk_monokernel(
            _permuted_state(2), pcm_tm[:, lo:lo + 2], weights, block=2,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(out_all)[:, lo:lo + 2],
                                      np.asarray(out_h))
        np.testing.assert_array_equal(np.asarray(vad_all)[:, lo:lo + 2],
                                      np.asarray(vad_h))


def test_monokernel_dispatch_cpu_fallback(model_params, rng):
    """set_monokernel("on") must fall back to the scan off-TPU (viability
    gate) and produce identical results through process_frames_tm."""
    import jax.numpy as jnp
    from rnnoise_tpu import denoise
    from rnnoise_tpu.config import RuntimeConfig, FRAME_SIZE

    st = denoise.init_state(2)
    pcm = jnp.asarray(1000 * rng.standard_normal((3, 2, FRAME_SIZE)),
                      jnp.float32)
    rt = RuntimeConfig(quantized=True)
    prev = denoise._MONOKERNEL
    try:
        denoise.set_monokernel("on")
        st_on, out_on, vad_on = denoise.process_frames_tm(
            model_params, st, pcm, rt)
        denoise.set_monokernel("off")
        st_off, out_off, vad_off = denoise.process_frames_tm(
            model_params, st, pcm, rt)
    finally:
        denoise.set_monokernel(prev)
    np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))
    np.testing.assert_array_equal(np.asarray(vad_on), np.asarray(vad_off))


def test_monokernel_i16_boundary_bitmatch(model_params, rng):
    """int16 pcm in -> int16 out with in-kernel conversion must bit-match
    the f32 kernel plus host-side rounding (the streamio ring contract:
    round half away from zero, clip)."""
    S, T = 16, 4
    pcm = (2000 * rng.standard_normal((T, S, FRAME_SIZE))).astype(np.int16)
    st = _permuted_state(S)
    w = pack_params(model_params)
    _, o_i16, v1 = pf.process_chunk_monokernel(
        st, jnp.asarray(pcm), w, block=16, interpret=True)
    assert o_i16.dtype == jnp.int16
    _, o_f32, v2 = pf.process_chunk_monokernel(
        st, jnp.asarray(pcm, jnp.float32), w, block=16, interpret=True)
    r = np.trunc(np.where(np.asarray(o_f32) > 0, np.asarray(o_f32) + 0.5,
                          np.asarray(o_f32) - 0.5))
    np.testing.assert_array_equal(
        np.asarray(o_i16), np.clip(r, -32768, 32767).astype(np.int16))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_monokernel_dispatch_under_outer_jit_cold_cache(model_params, rng):
    """bench.py jits the WHOLE dispatch (jax.jit over process_frames_tm) with
    a cold weight-pack cache — packing must run at compile time and the
    pallas BlockSpecs must come from shapes, not np.asarray, or the trace
    crashes with TracerArrayConversionError (regression: round-3 bench
    monokernel rows silently fell back on this)."""
    import jax
    from rnnoise_tpu import denoise

    denoise._PACKED_CACHE.clear()
    S, T = 16, 2
    pcm = jnp.asarray(1000 * rng.standard_normal((T, S, FRAME_SIZE)),
                      jnp.float32)
    st = _permuted_state(S)

    def f(st, x):
        return pf.process_chunk_monokernel(
            st, x, denoise._packed_weights(model_params), block=16,
            interpret=True)

    st2, out, vad = jax.jit(f)(st, pcm)
    assert out.shape == (T, S, FRAME_SIZE)


def test_monokernel_frames_per_step_bitwise(model_params, rng):
    """frames_per_step=2 (two frames advanced per grid step, state held in
    registers between them) is bitwise identical to the one-frame grid."""
    import jax
    S, T = 16, 4
    pcm = jnp.asarray(2000 * rng.standard_normal((T, S, FRAME_SIZE)),
                      jnp.float32)
    st = _permuted_state(S)
    w = pack_params(model_params)
    a = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True)
    b = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True,
                                    frames_per_step=2)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a[0], b[0])


@pytest.mark.parametrize("inc_ds,batch_fwd", [(False, False), (False, True),
                                              (True, True)])
def test_monokernel_formulation_flags(model_params, rng, monkeypatch,
                                      inc_ds, batch_fwd):
    """The A/B formulation switches (pallas_frame._INC_DS incremental
    decimation, _BATCH_FWD batched dual forward DFT) are pure restructures.
    Flipping _INC_DS alone is bitwise identical (it only reorders exact-zero
    addends in the selection matmuls — 3 nonzero power-of-two taps per
    output lane).  _BATCH_FWD=True is the same math per row, but the [2B, n]
    dot may pick a different reduction order than two [B, n] dots (measured
    ~1 ulp in the DFT leaves on the CPU interpret backend), so it is held
    to a sub-LSB PCM budget instead of bitwise."""
    import jax
    S, T = 16, 4
    pcm = jnp.asarray(2000 * rng.standard_normal((T, S, FRAME_SIZE)),
                      jnp.float32)
    st = _permuted_state(S)
    w = pack_params(model_params)
    base = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True)
    monkeypatch.setattr(pf, "_INC_DS", inc_ds)
    monkeypatch.setattr(pf, "_BATCH_FWD", batch_fwd)
    alt = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True)
    if batch_fwd == pf._BATCH_FWD_DEFAULT:
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(alt[1]))
        np.testing.assert_array_equal(np.asarray(base[2]),
                                      np.asarray(alt[2]))
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)), base[0], alt[0])
    else:
        np.testing.assert_allclose(np.asarray(base[1]), np.asarray(alt[1]),
                                   atol=0.5)
        np.testing.assert_allclose(np.asarray(base[2]), np.asarray(alt[2]),
                                   atol=2e-3)


@pytest.mark.parametrize("unroll", [1, 2, 4])
def test_monokernel_fps_loop_bitwise(model_params, rng, monkeypatch, unroll):
    """The fori_loop frames_per_step body (pallas_frame._FPS_LOOP) is
    bitwise identical to the python-unrolled form: same per-frame math, only
    the pcm/out indexing becomes dynamic and the 17-array state rides the
    loop carry.  Parametrized over _FPS_UNROLL (frames unrolled INSIDE the
    loop body): unroll=4 with fps=4 degenerates to one iteration of the
    fully unrolled body; unroll=2 is the hybrid (2 iterations x 2 frames)."""
    import jax
    S, T = 16, 4
    pcm = jnp.asarray(2000 * rng.standard_normal((T, S, FRAME_SIZE)),
                      jnp.float32)
    st = _permuted_state(S)
    w = pack_params(model_params)
    a = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True,
                                    frames_per_step=4)
    monkeypatch.setattr(pf, "_FPS_LOOP", True)
    monkeypatch.setattr(pf, "_FPS_UNROLL", unroll)
    b = pf.process_chunk_monokernel(st, pcm, w, block=16, interpret=True,
                                    frames_per_step=4)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a[0], b[0])


def test_mono_cfg_fps_divisor_fallback():
    """_mono_cfg falls back through fps divisors instead of straight to 1:
    a T that misses the top divisor (T=402 % 4 != 0) still gets fps=2
    (measured 1.357 vs 1.404 ms/frame at fps=1 on v5e), and blocks above
    the fps>1 VMEM gate run per-frame."""
    from rnnoise_tpu import denoise as dn
    assert dn._mono_cfg(400, 3072) == (256, dn._MONO_FPS)
    assert dn._mono_cfg(402, 3072) == (256, 2)
    assert dn._mono_cfg(401, 3072) == (256, 1)
    # S=2688 is divisible by 384 but not 256/128: block=384 exceeds the
    # fps>1 gate, so it runs per-frame regardless of T
    assert dn._mono_cfg(400, 2688) == (384, 1)
    assert dn._mono_cfg(400, 1000) == (None, 1)
