"""rnnoise_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of RNNoise.

Capability-parity rebuild of xiph/rnnoise (the hybrid DSP/deep-learning
real-time noise suppressor), re-designed around stream-batched execution on
TPU: per-10 ms-frame analysis (960-pt FFT, 32 Bark-like band energies, pitch
search), a sparse/quantised conv+3xGRU gain/VAD network, per-band gain
interpolation, pitch comb filtering and overlap-add resynthesis — all batched
over thousands of concurrent streams and shardable over a device mesh.
"""

import os as _os


def _setup_compilation_cache():
    """Point JAX's persistent compilation cache at a repo-local directory
    (override with RNNT_CACHE_DIR; RNNT_CACHE_DIR=0 disables).  The
    monokernel's frames_per_step>1 configs take tens of minutes to compile
    through the axon relay (measured 2794 s at fps=4); the cache makes every
    later process — bench.py, serving restarts, the test suite's scans —
    load them in seconds (verified working through the axon PJRT plugin:
    0.92 s -> 0.03 s across processes).  Only compiles slower than 2 s are
    persisted, so tiny kernels don't bloat the directory."""
    import jax

    cache = _os.environ.get("RNNT_CACHE_DIR", "")
    if cache == "0":
        return
    if jax.config.jax_compilation_cache_dir is not None:
        return      # user already configured one — leave it alone
    if not cache:
        cache = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    # Mirror the dir guard: only lower the persistence threshold when the
    # user hasn't configured one (env var or prior config.update) — don't
    # clobber JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS.
    if ("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in _os.environ
            and jax.config.jax_persistent_cache_min_compile_time_secs == 1.0):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


_setup_compilation_cache()

from .api import RNNoise, StreamDenoiser  # noqa: F401
from .config import (DEFAULT_MODEL, DEFAULT_RUNTIME, FRAME_SIZE,  # noqa: F401
                     ModelConfig, NB_BANDS, NB_FEATURES, RuntimeConfig)
from .denoise import (DenoiseState, init_state, process_frame,  # noqa: F401
                      process_frames)
from .models.rnn import ModelParams, RNNState  # noqa: F401

__version__ = "0.1.0"
