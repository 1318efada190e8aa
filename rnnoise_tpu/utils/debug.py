"""Debug / sanitiser hooks (SURVEY.md §5 race-detection row).

The reference relies on valgrind-awareness and a FUZZING arch-downgrade hook
(x86cpu.c:63-64, 156-161); here the equivalents are jax-level:

  * ``debug_nans()`` — context manager turning on jax_debug_nans so the first
    non-finite value in the feature/NN path raises at the producing op.
  * ``checked_process_frames`` — checkify-wrapped pipeline with NaN/div
    checks, for CI canaries.
  * ``numerics_ab`` — run both numerics modes (int8 vs float weights) on the
    same input and report the gain delta — the runtime analogue of the
    reference's --enable-dnn-debug-float A/B (configure.ac:81-87).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..config import RuntimeConfig
from ..denoise import init_state, process_frames


@contextlib.contextmanager
def debug_nans():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_process_frames(params, state, pcm, rt=RuntimeConfig()):
    """process_frames under checkify float checks; raises on NaN/Inf."""
    from jax.experimental import checkify

    fn = checkify.checkify(
        lambda s, x: process_frames(params, s, x, rt),
        errors=checkify.float_checks)
    err, out = jax.jit(fn)(state, pcm)
    err.throw()
    return out


def numerics_ab(params, pcm, rt_a=None, rt_b=None):
    """Max per-band gain delta between the int8 and float paths over a PCM
    chunk [S, T, 480].  Returns (max_gain_delta, max_pcm_delta)."""
    rt_a = rt_a or RuntimeConfig(quantized=True)
    rt_b = rt_b or RuntimeConfig(quantized=False)
    S = pcm.shape[0]
    _, out_a, vad_a = process_frames(params, init_state(S), pcm, rt_a)
    _, out_b, vad_b = process_frames(params, init_state(S), pcm, rt_b)
    return (float(jnp.abs(vad_a - vad_b).max()),
            float(jnp.abs(out_a - out_b).max()))
