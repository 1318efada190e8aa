"""Global configuration for the TPU-native RNNoise framework.

The reference (xiph/rnnoise) spreads its configuration over a compile-time
``#define`` matrix (reference configure.ac:68-101, src/denoise.h:31-41).  Here a
single set of frozen dataclasses carries the same information as *runtime*
values; jit specialisation plays the role the C preprocessor plays there.
"""

from __future__ import annotations

import dataclasses

# ---------------------------------------------------------------------------
# DSP constants (reference src/denoise.h:31-41).  These are architectural
# invariants of the 48 kHz fullband model family, not tunables.
# ---------------------------------------------------------------------------
FRAME_SIZE = 480            # 10 ms @ 48 kHz
WINDOW_SIZE = 2 * FRAME_SIZE
FREQ_SIZE = FRAME_SIZE + 1  # 481 rFFT bins kept
NB_BANDS = 32
NB_FEATURES = 2 * NB_BANDS + 1   # 65

PITCH_MIN_PERIOD = 60
PITCH_MAX_PERIOD = 768
PITCH_FRAME_SIZE = 960
PITCH_BUF_SIZE = PITCH_MAX_PERIOD + PITCH_FRAME_SIZE  # 1728

SILENCE_THRESHOLD = 0.04    # reference src/denoise.c:389


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Topology of the gain/VAD RNN (reference torch/rnnoise/rnnoise.py:58-72,
    defaults from torch/rnnoise/train_rnnoise.py:48-49)."""

    input_dim: int = NB_FEATURES     # 65
    output_dim: int = NB_BANDS       # 32
    cond_size: int = 128
    gru_size: int = 384
    conv_kernel: int = 3

    @property
    def cat_size(self) -> int:
        # concat of [conv2_out, gru1, gru2, gru3] (reference src/rnn.c:46, 53-55)
        return 4 * self.gru_size


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Numerics / execution options.

    The reference selects numerics per-ISA at compile time (src/vec.h:39-43)
    and via HIGH_ACCURACY / --enable-dnn-debug-float (src/nnet_arch.h:77,
    configure.ac:81-87).  We expose the same axes as runtime flags:

    * ``quantized``     – int8 weights path (reference s8 C kernel
                          src/vec.h:248-312) vs float weights.
    * ``approx_act``    – rational tanh/sigmoid approximations
                          (src/vec.h:337-356) vs hardware-native transcendentals.
    * ``exact_pitch_rank`` – replicate find_best_pitch's cross-multiplied
                          top-2 comparisons exactly via a lax.scan
                          (src/pitch.c:44-102) instead of the vectorised
                          ratio-based ranking.
    """

    quantized: bool = True
    approx_act: bool = True
    exact_pitch_rank: bool = False


DEFAULT_MODEL = ModelConfig()
DEFAULT_RUNTIME = RuntimeConfig()
