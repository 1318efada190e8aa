"""Block sparsifier — JAX port of torch/sparsification/ (common.py:32-89,
gru_sparsifier.py:35-167).

Zeroes 4(in) x 8(out) weight blocks by block energy to per-gate target
densities with the reference's cubic ramp schedule.  Our matrices are stored
[in, out] (transposed vs torch), so the reference's [8, 4] (out, in) blocks
become [4, 8] here — the exported storage layout is identical.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# (density, keep_diagonal) per gate, z/r/n order — reference
# torch/rnnoise/rnnoise.py:43-50 (keys W_hr etc. are r/z/n there; the torch
# module stores gates r,z,n and the densities map to z:0.2, r:0.3, n:0.5).
SPARSE_DENSITIES = dict(z=0.2, r=0.3, n=0.5)
SPARSIFY_START = 6000
SPARSIFY_STOP = 20000
SPARSIFY_INTERVAL = 100
SPARSIFY_EXPONENT = 3


def _sparsify_matrix(w: jax.Array, density: jax.Array,
                     keep_diagonal: bool) -> jax.Array:
    """w: [in, out] (square when keep_diagonal).  Block size (4 in, 8 out)."""
    m, n = w.shape
    if keep_diagonal:
        diag = jnp.diag(jnp.diag(w))
        body = w - diag
    else:
        diag = jnp.zeros_like(w)
        body = w
    x = body.reshape(m // 4, 4, n // 8, 8)
    energies = jnp.sum(jnp.square(x), axis=(1, 3))           # [m/4, n/8]
    nblocks = energies.size
    flat = jnp.sort(energies.reshape(-1))
    survivors = jnp.round(nblocks * density).astype(jnp.int32)
    # threshold = k-th largest block energy; 0 when no survivors
    thr = jnp.where(survivors == 0, 0.0,
                    flat[jnp.maximum(nblocks - survivors, 0)])
    mask = (energies >= thr).astype(w.dtype)
    mask = jnp.repeat(jnp.repeat(mask, 4, axis=0), 8, axis=1)
    return mask * body + diag


def _gate_blocks(w: jax.Array, n: int):
    return [w[:, i * n:(i + 1) * n] for i in range(3)]


def sparsify_step(params: Dict, step: jax.Array) -> Dict:
    """Apply one sparsifier step to all three GRUs (both input and recurrent
    weights).  ``step`` is the optimizer step count (traced); off-schedule
    steps pass parameters through unchanged."""
    step = jnp.asarray(step, jnp.int32)
    in_window = (step >= SPARSIFY_START) & (step < SPARSIFY_STOP)
    on_interval = (step % SPARSIFY_INTERVAL) == 0
    do_it = jnp.where(step >= SPARSIFY_STOP, True, in_window & on_interval)

    ramp = ((SPARSIFY_STOP - step) /
            (SPARSIFY_STOP - SPARSIFY_START)) ** SPARSIFY_EXPONENT
    alpha = jnp.where(step >= SPARSIFY_STOP, 0.0,
                      jnp.clip(ramp, 0.0, 1.0)).astype(jnp.float32)

    def apply(params):
        out = dict(params)
        for name in ("gru1", "gru2", "gru3"):
            gp = dict(params[name])
            n = gp["w_rec"].shape[0]
            for wkey, keep_diag in (("w_in", False), ("w_rec", True)):
                gates = _gate_blocks(gp[wkey], n)
                new_gates = []
                for gate_name, wg in zip("zrn", gates):
                    target = SPARSE_DENSITIES[gate_name]
                    density = alpha + (1 - alpha) * target
                    new_gates.append(_sparsify_matrix(wg, density, keep_diag))
                gp[wkey] = jnp.concatenate(new_gates, axis=1)
            out[name] = gp
        return out

    sparse = apply(params)
    return jax.tree.map(lambda a, b: jnp.where(do_it, a, b), sparse, params)
