"""Multi-host (multi-process) scale-out over DCN.

The reference is single-threaded C (SURVEY.md §2.9); multi-host here means
many machines each feeding their local TPU chips with audio while the
stream-sharded compute graph (parallel/sharding.py) runs unchanged over the
global mesh.  Steady-state denoising needs no cross-host collectives at all
(streams are independent); only training's gradient psum crosses hosts.

Pattern: every process
  1. calls ``init_distributed()`` (jax.distributed.initialize),
  2. builds the global mesh over ``jax.devices()`` (all hosts),
  3. assembles global arrays from its HOST-LOCAL audio via
     ``streams_from_host_local`` (jax.make_array_from_process_local_data),
  4. runs the same jitted processor; outputs come back shard-per-host via
     ``host_local_output``.

Proven by tests/test_multihost.py: two OS processes, 4 virtual CPU devices
each, lock-step parity with a single-process run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .sharding import STREAM_AXIS, make_mesh, stream_sharding


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise the JAX distributed runtime (no-op when already
    initialised or when running single-process with no coordinator).

    With no arguments JAX auto-detects cluster env vars (TPU pod metadata,
    SLURM, etc.); pass explicit values for manual clusters."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return        # single process, nothing to coordinate
    else:
        jax.distributed.initialize(coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_stream_mesh() -> jax.sharding.Mesh:
    """1-D stream mesh over every device of every host."""
    return make_mesh(devices=jax.devices())


def process_stream_slice(n_streams: int) -> slice:
    """The rows of the global [S, ...] batch owned by this process, matching
    the layout make_array_from_process_local_data produces for a 1-D
    stream-sharded mesh built from jax.devices() (process-major order)."""
    n_proc = jax.process_count()
    assert n_streams % n_proc == 0, (n_streams, n_proc)
    per = n_streams // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def streams_from_host_local(local: np.ndarray,
                            mesh: jax.sharding.Mesh) -> jax.Array:
    """Assemble a global stream-sharded array from this host's local rows
    (every process contributes its own slice; no host sees the full batch)."""
    return jax.make_array_from_process_local_data(stream_sharding(mesh),
                                                  np.asarray(local))


def tree_from_host_local(tree, mesh: jax.sharding.Mesh):
    """streams_from_host_local over a pytree (e.g. a DenoiseState built with
    init_state(local_n_streams))."""
    return jax.tree.map(
        lambda x: streams_from_host_local(np.asarray(x), mesh), tree)


def host_local_output(x: jax.Array) -> np.ndarray:
    """This host's rows of a stream-sharded result, stitched from its
    addressable shards (inverse of streams_from_host_local)."""
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
