"""rnnoise_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of RNNoise.

Capability-parity rebuild of xiph/rnnoise (the hybrid DSP/deep-learning
real-time noise suppressor), re-designed around stream-batched execution on
TPU: per-10 ms-frame analysis (960-pt FFT, 32 Bark-like band energies, pitch
search), a sparse/quantised conv+3xGRU gain/VAD network, per-band gain
interpolation, pitch comb filtering and overlap-add resynthesis — all batched
over thousands of concurrent streams and shardable over a device mesh.
"""

from .api import RNNoise, StreamDenoiser  # noqa: F401
from .config import (DEFAULT_MODEL, DEFAULT_RUNTIME, FRAME_SIZE,  # noqa: F401
                     ModelConfig, NB_BANDS, NB_FEATURES, RuntimeConfig)
from .denoise import (DenoiseState, init_state, process_frame,  # noqa: F401
                      process_frames)
from .models.rnn import ModelParams, RNNState  # noqa: F401

__version__ = "0.1.0"
