"""Device-mesh scale-out: shard the stream axis over ICI.

The reference has no parallelism of any kind (SURVEY.md §2.9) — its unit of
work is one stream on one core.  Here the first-class parallel axis is
**streams**: weights are tiny (1–3 MB) and are replicated on every chip, the
``[S, ...]`` state/PCM pytrees are sharded over the ``streams`` mesh axis, and
processing needs **zero collectives** in steady state (streams are
independent).  Collectives only appear in training (gradient psum over the
batch axis — see training/train.py).

Everything goes through ``jax.sharding`` + ``jax.jit`` with explicit
NamedSharding constraints, so the same code runs on 1 chip, a v5e-8 slice, or
a multi-host pod — the multi-process path (jax.distributed.initialize +
per-host audio assembly) lives in parallel/multihost.py and is proven by the
two-process lock-step test in tests/test_multihost.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_MODEL, DEFAULT_RUNTIME, ModelConfig, RuntimeConfig
from ..denoise import DenoiseState, init_state, process_frames
from ..models.rnn import ModelParams

STREAM_AXIS = "streams"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D mesh over the stream axis (the only axis this model needs — no
    TP/PP: the largest matmul is 1152x1152)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (STREAM_AXIS,))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading [S] axis, replicate everything trailing."""
    return NamedSharding(mesh, P(STREAM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state: DenoiseState, mesh: Mesh) -> DenoiseState:
    s = stream_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), state)


def shard_params(params: ModelParams, mesh: Mesh) -> ModelParams:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), params)


def make_sharded_processor(params: ModelParams, mesh: Mesh,
                           rt: RuntimeConfig = DEFAULT_RUNTIME):
    """jitted (state, pcm[S, T, 480]) -> (state, out, vad) with S sharded over
    the mesh.  S must be divisible by the mesh size.

    Built on shard_map rather than global-view pjit: streams are independent
    (zero steady-state collectives), and shard_map gives every device the
    *local* [S/n, ...] view — which is required for the Pallas kernels in
    the pipeline (custom calls have no automatic SPMD partitioning rule) and
    costs nothing for the rest."""
    spec = P(STREAM_AXIS)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec, spec),
                       out_specs=(spec, spec, spec))
    def run(state, pcm):
        return process_frames(params, state, pcm, rt)

    return run


def sharded_init_state(n_streams: int, mesh: Mesh,
                       config: ModelConfig = DEFAULT_MODEL) -> DenoiseState:
    return shard_state(init_state(n_streams, config), mesh)
