"""Fused Pallas compute_rnn kernel vs the XLA implementation (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnoise_tpu.config import RuntimeConfig
from rnnoise_tpu.models.rnn import compute_rnn, init_rnn_state
from rnnoise_tpu.nn.pallas_rnn import compute_rnn_pallas, pack_params


def test_pallas_rnn_matches_xla(model_params, rng):
    packed = pack_params(model_params)
    rt = RuntimeConfig(quantized=True, approx_act=True)
    S = 8
    state_a = init_rnn_state(S)
    state_b = init_rnn_state(S)
    for t in range(5):
        feats = jnp.asarray(rng.normal(0, 2, (S, 65)), jnp.float32)
        # exercise the in-kernel silence freeze on alternating steps
        sil = jnp.asarray([t % 2 == 0] * (S // 2) + [False] * (S - S // 2))
        state_a, g_a, v_a = compute_rnn(model_params, state_a, feats, rt,
                                        silence=sil)
        state_b, g_b, v_b = compute_rnn_pallas(packed, state_b, feats,
                                               block=8, interpret=True,
                                               silence=sil)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                                   atol=1e-5, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-5)
        assert np.all(np.asarray(v_b)[np.asarray(sil)] == 0.0)
        for la, lb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5)


def test_fused_forward_spectral_matches_xla(rng):
    """The fused DIF forward kernel (interpret mode) vs the XLA path:
    window extraction + windowed forward DFT, compared in permuted order."""
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE, PITCH_BUF_SIZE
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.dsp import transform as tr
    from rnnoise_tpu.dsp.gather import take_window

    S = 8
    mem = jnp.asarray(3000 * rng.standard_normal((S, FRAME_SIZE)), jnp.float32)
    x = jnp.asarray(3000 * rng.standard_normal((S, FRAME_SIZE)), jnp.float32)
    buf = jnp.asarray(3000 * rng.standard_normal((S, PITCH_BUF_SIZE)),
                      jnp.float32)
    start = jnp.asarray(rng.integers(0, ps._MAX_START + 1, S), jnp.int32)

    try:
        tr.set_dft_mode("matmul")
        tr.set_dft_precision("f32")
        Xn = tr.windowed_forward_transform(jnp.concatenate([mem, x], axis=-1))
        Pn = tr.windowed_forward_transform(
            take_window(buf, start, 960, max_start=ps._MAX_START))
    finally:
        tr.set_dft_mode("auto")
        tr.set_dft_precision("auto")

    Xp, Pp = ps.forward_spectral(mem, x, buf, start, interpret=True)
    scale = float(jnp.max(jnp.abs(Xn)))
    # compare incl. the extension bins (needed by the inverse)
    np.testing.assert_allclose(np.asarray(Xp),
                               np.asarray(ps.permute_spectrum(Xn)),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(Pp),
                               np.asarray(ps.permute_spectrum(Pn)),
                               atol=5e-5 * scale)


def test_fused_inverse_spectral_matches_xla(rng):
    """The fused DIF inverse kernel (interpret mode) vs the XLA windowed
    inverse transform, from a natural spectrum permuted for input."""
    import jax.numpy as jnp
    from rnnoise_tpu.config import FREQ_SIZE
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.dsp import transform as tr

    S = 8
    X = jnp.asarray(rng.standard_normal((S, FREQ_SIZE)) +
                    1j * rng.standard_normal((S, FREQ_SIZE)), jnp.complex64)
    X = X.at[:, 0].set(jnp.real(X[:, 0]))          # DC/Nyquist real, as a
    X = X.at[:, -1].set(jnp.real(X[:, -1]))        # real signal's DFT is
    try:
        tr.set_dft_mode("matmul")
        tr.set_dft_precision("f32")
        x_ref = tr.windowed_inverse_transform(X)
    finally:
        tr.set_dft_mode("auto")
        tr.set_dft_precision("auto")
    x_got = ps.inverse_spectral(ps.permute_spectrum(X), interpret=True)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                               atol=5e-5 * float(jnp.max(jnp.abs(x_ref))))


def test_postfilter_synthesis_matches_xla(rng):
    """The fused post-filter + synthesis kernel (interpret mode) vs the XLA
    path (pitch_filter + gain cap/apply + silence blend + frame_synthesis)
    on the same permuted spectra, including one silent stream."""
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE, FREQ_SIZE, NB_BANDS
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.dsp import transform as tr
    from rnnoise_tpu import denoise as dn

    S = 8
    # realistic spectra: transforms of random time signals (keeps band
    # energies in a sane range for the comb-filter rationals)
    x_t = rng.standard_normal((S, 960)).astype(np.float32) * 3000
    p_t = 0.7 * x_t + 500 * rng.standard_normal((S, 960)).astype(np.float32)
    try:
        tr.set_dft_mode("matmul")
        tr.set_dft_precision("f32")
        X = tr.windowed_forward_transform(jnp.asarray(x_t))
        P = tr.windowed_forward_transform(jnp.asarray(p_t))
        Ex = tr.compute_band_energy(X)
        Ep = tr.compute_band_energy(P)
        Exp = tr.compute_band_corr(X, P) / jnp.sqrt(0.001 + Ex * Ep)
        g = jnp.asarray(rng.uniform(0.05, 1.0, (S, NB_BANDS)), jnp.float32)
        lastg = jnp.asarray(rng.uniform(0, 1, (S, NB_BANDS)), jnp.float32)
        Ex_cur = Ex * jnp.asarray(
            rng.uniform(0.5, 2.0, (S, 1)), jnp.float32)
        silence = jnp.asarray([False] * (S - 1) + [True])
        smem = jnp.asarray(rng.standard_normal((S, FRAME_SIZE)), jnp.float32)

        # XLA reference path (natural order)
        Xd = dn.pitch_filter(X, P, Ex, Ep, Exp, g)
        gc = jnp.maximum(g, 0.6 * lastg)
        lastg_ref = jnp.minimum(1.0, gc * (Ex + 1e-3) / (Ex_cur + 1e-3))
        gf = tr.interp_band_gain(gc, width=FREQ_SIZE)
        Xd = Xd * gf
        sil = silence[:, None]
        X_synth = jnp.where(sil, X, Xd)
        lastg_ref = jnp.where(sil, lastg, lastg_ref)
        smem_ref, out_ref = tr.frame_synthesis(smem, X_synth)
    finally:
        tr.set_dft_mode("auto")
        tr.set_dft_precision("auto")

    out, smem_new, lastg_new = ps.postfilter_synthesis(
        ps.permute_spectrum(X), ps.permute_spectrum(P),
        Ex, Ep, Exp, g, lastg, Ex_cur, silence, smem, interpret=True)
    scale = float(jnp.max(jnp.abs(out_ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(smem_new), np.asarray(smem_ref),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(lastg_new), np.asarray(lastg_ref),
                               rtol=0, atol=2e-5)


def test_xcorr_kernel_matches_conv(rng):
    """The factored-DFT correlation kernel (interpret mode) vs the grouped
    conv lag table, on speech-like and noise buffers."""
    import jax.numpy as jnp
    from rnnoise_tpu.dsp import pitch as pm
    from rnnoise_tpu.dsp.pallas_xcorr import lag_corr_table_pallas
    from tests.conftest import speechlike

    bufs = np.stack([
        speechlike(rng, 1728, f0=130.0, noise=0.1)[::2],
        speechlike(rng, 1728, f0=70.0, noise=0.3)[::2],
        (300 * rng.standard_normal(864)).astype(np.float32),
        np.zeros(864, np.float32),
    ])
    ds = jnp.asarray(bufs, jnp.float32)
    ref = np.asarray(pm.batched_xcorr(ds[:, 384:864], ds, 385))
    got = np.asarray(lag_corr_table_pallas(ds, interpret=True))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=3e-6 * scale)


def test_analysis_kernel_matches_xla_chain(rng):
    """The fused analysis kernel (interpret mode) vs the XLA chain it
    replaces: fine lag table + pitch search + remove_doubling + window
    extraction + forward DFTs, over a stateful multi-frame run."""
    import jax.numpy as jnp
    from rnnoise_tpu.config import (PITCH_BUF_SIZE, PITCH_MAX_PERIOD,
                                    WINDOW_SIZE, PITCH_MIN_PERIOD)
    from rnnoise_tpu.dsp import pitch as pm
    from rnnoise_tpu.dsp import transform as tr
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.dsp.pallas_analysis import analysis_spectral
    from rnnoise_tpu.dsp.gather import take_window
    from tests.conftest import speechlike

    S = 4
    bufs = np.stack([
        speechlike(rng, PITCH_BUF_SIZE, f0=f0, noise=nz) * amp
        for f0, nz, amp in [(130, .1, 3000), (70, .4, 8000),
                            (221, .05, 600), (100, .9, 2000)]])
    pitch_buf = jnp.asarray(bufs, jnp.float32)
    mem = jnp.asarray(500 * rng.standard_normal((S, 480)), jnp.float32)
    x = jnp.asarray(500 * rng.standard_normal((S, 480)), jnp.float32)
    prev_p = jnp.asarray(rng.integers(60, 700, S), jnp.int32)
    prev_g = jnp.asarray(rng.uniform(0, 1, S), jnp.float32)

    # XLA reference chain
    ds = pm.pitch_downsample(pitch_buf)
    bx = pm.lag_corr_table(ds)
    pitch = pm.pitch_search(ds, bx)
    T0_ref, gain_ref = pm.remove_doubling(
        ds, PITCH_MAX_PERIOD - pitch, prev_p, prev_g, bx)
    try:
        tr.set_dft_mode("matmul")
        tr.set_dft_precision("f32")
        start = PITCH_BUF_SIZE - WINDOW_SIZE - T0_ref
        p = take_window(pitch_buf, start, WINDOW_SIZE,
                        max_start=PITCH_BUF_SIZE - WINDOW_SIZE
                        - PITCH_MIN_PERIOD)
        X_ref = tr.windowed_forward_transform(
            jnp.concatenate([mem, x], axis=-1))
        P_ref = tr.windowed_forward_transform(p)
    finally:
        tr.set_dft_mode("auto")
        tr.set_dft_precision("auto")

    bp0, bp1 = pm.coarse_search(ds)
    Xp, Pp, T0, gain = analysis_spectral(mem, x, pitch_buf, ds, bp0, bp1,
                                         prev_p, prev_g, interpret=True)
    np.testing.assert_array_equal(np.asarray(T0), np.asarray(T0_ref))
    np.testing.assert_allclose(np.asarray(gain), np.asarray(gain_ref),
                               atol=2e-5)
    Xr = np.asarray(ps.permute_spectrum(X_ref))
    Pr = np.asarray(ps.permute_spectrum(P_ref))
    scale = np.abs(Xr).max()
    np.testing.assert_allclose(np.asarray(Xp), Xr, atol=3e-5 * scale)
    scale_p = max(np.abs(Pr).max(), 1.0)
    np.testing.assert_allclose(np.asarray(Pp), Pr, atol=3e-5 * scale_p)


def test_grid_carry_scratch_mechanism():
    """Validates the whole-frame-monokernel mechanism (CLAUDE.md round-3
    roadmap): VMEM scratch persists across a SEQUENTIAL trailing grid
    dimension, so per-stream state can live in VMEM for a whole T-chunk.
    Computes x_t = 0.5 x_{t-1} + in_t for 8 steps entirely in scratch.
    (Also validated bit-exact on v5e hardware, r2.)"""
    import functools
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, T, D = 16, 8, 128

    def kernel(inp_ref, out_ref, carry):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        c = carry[:] * 0.5 + inp_ref[:]
        carry[:] = c
        out_ref[:] = c

    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.standard_normal((T, S, D)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(1, T),
        in_specs=[pl.BlockSpec((1, S, D), lambda i, t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, S, D), lambda i, t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, S, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, S, D), jnp.float32)],
        interpret=True,
    )(inp)
    ref = np.zeros((S, D), np.float32)
    refs = []
    for t in range(T):
        ref = ref * 0.5 + np.asarray(inp[t])
        refs.append(ref.copy())
    np.testing.assert_array_equal(np.asarray(out), np.stack(refs))


def test_frame_body_matches_process_frame(model_params, rng):
    """The whole-frame monokernel body (pure jnp) vs denoise.process_frame,
    chained statefully over 16 frames of speech-like input: pitch periods
    exact, PCM/vad within the factored-DFT tolerance class.

    Pinned to the own-DFT coarse formulation (alias_coarse(False)): the
    scan path this compares against computes its own coarse DFTs, so this
    is the apples-to-apples structural claim.  The shipping alias-coarse
    default changes the coarse table's rounding class (~1e-5) and is
    allowed its documented <=2/120 marginal ranking flips — its stateful
    budget lives in test_monokernel_oracle_parity_150_frames[alias=True]
    against the C oracle."""
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
    from rnnoise_tpu.denoise import init_state, process_frame
    from rnnoise_tpu.dsp import pallas_frame as pf
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.nn.pallas_rnn import pack_params
    from tests.conftest import speechlike

    S, T = 4, 16
    sig = np.stack([
        speechlike(rng, T * FRAME_SIZE, f0=f0, noise=nz) * amp
        for f0, nz, amp in [(130, .1, 1.0), (80, .3, 2.0),
                            (210, .05, 0.5), (100, .5, 0.8)]])
    pcm = jnp.asarray(sig.reshape(S, T, FRAME_SIZE), jnp.float32)
    rt = RuntimeConfig(quantized=True)

    sa = init_state(S)
    outs_a, vads_a, periods = [], [], []
    for t in range(T):
        sa, o, v = process_frame(model_params, sa, pcm[:, t], rt)
        outs_a.append(np.asarray(o))
        vads_a.append(np.asarray(v))
        periods.append(np.asarray(sa.last_period))

    weights = pack_params(model_params)
    # start from zeros in the monokernel layout (permuted spectra widths)
    sb = pf.FrameState(
        mem_hp=jnp.zeros((S, 2)), pitch_buf=jnp.zeros((S, 1728)),
        analysis_mem=jnp.zeros((S, 480)), synthesis_mem=jnp.zeros((S, 480)),
        last_period=jnp.zeros((S, 1), jnp.int32),
        last_gain=jnp.zeros((S, 1)), lastg=jnp.zeros((S, 32)),
        c1m=jnp.zeros((S, 130)), c2m=jnp.zeros((S, 256)),
        h1=jnp.zeros((S, 384)), h2=jnp.zeros((S, 384)),
        h3=jnp.zeros((S, 384)),
        dX=jnp.zeros((S, 2 * ps.PERM_WIDTH)),
        dP=jnp.zeros((S, 2 * ps.PERM_WIDTH)),
        dEx=jnp.zeros((S, 32)), dEp=jnp.zeros((S, 32)),
        dExp=jnp.zeros((S, 32)), ds_raw=jnp.zeros((S, 864)))
    max_pcm = max_vad = 0.0
    n_period_mismatch = 0
    with pf.alias_coarse(False):
        consts = pf.frame_consts()
        for t in range(T):
            sb, o, v = pf.frame_body(sb, pcm[:, t], weights, consts, S)
            max_pcm = max(max_pcm,
                          float(np.abs(np.asarray(o) - outs_a[t]).max()))
            max_vad = max(max_vad,
                          float(np.abs(np.asarray(v)[:, 0] - vads_a[t]).max()))
            n_period_mismatch += int(
                (np.asarray(sb.last_period)[:, 0] != periods[t]).sum())
    assert n_period_mismatch == 0, n_period_mismatch
    assert max_pcm < 2.0, max_pcm
    assert max_vad < 2e-3, max_vad
