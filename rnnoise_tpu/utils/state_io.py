"""DenoiseState checkpointing.

The reference's streaming state is a POD blob the caller can memcpy
(rnnoise_get_size, include/rnnoise.h:57-63); ours is an explicit pytree,
serialisable to a single .npz.  Useful for stream migration between hosts and
fault recovery (SURVEY.md §5 checkpoint/resume row).
"""

from __future__ import annotations

from typing import BinaryIO, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..denoise import DenoiseState
from ..models.rnn import RNNState


def save_state(state: DenoiseState, f: Union[str, BinaryIO]) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(f, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def load_state(f: Union[str, BinaryIO]) -> DenoiseState:
    data = np.load(f)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    rnn = RNNState(*leaves[7:12])
    return DenoiseState(*leaves[:7], rnn, *leaves[12:])
