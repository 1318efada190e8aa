#!/usr/bin/env python
"""A/B the block-batched pipeline against the per-frame scan on the TPU.

Usage: python scripts/bench_blocked.py [S ...]   (default 4096)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, state, pcm, n_iter=5):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    st, out, vad = fn(state, pcm)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        st, out, vad = fn(st, pcm)
        cs = float(jnp.sum(vad))
        dt = time.perf_counter() - t0
        if np.isfinite(cs) and dt > 1e-5:
            times.append(dt)
    return min(times), first


def main():
    import jax
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
    from rnnoise_tpu.denoise import init_state, process_frames
    from rnnoise_tpu.denoise_blocked import process_frames_blocked
    from __graft_entry__ import _demo_params

    params = _demo_params()
    rt = RuntimeConfig(quantized=True)
    rng = np.random.default_rng(0)
    T = 100
    sizes = [int(a) for a in sys.argv[1:]] or [4096]
    for S in sizes:
        pcm = jnp.asarray(3000 * rng.standard_normal((S, T, FRAME_SIZE)),
                          jnp.float32)
        audio = T * FRAME_SIZE / 48000.0
        for name, f in [
            ("frame", lambda s, x: process_frames(params, s, x, rt)),
            ("blk5", lambda s, x: process_frames_blocked(params, s, x, rt, 5)),
            ("blk10", lambda s, x: process_frames_blocked(params, s, x, rt, 10)),
            ("blk20", lambda s, x: process_frames_blocked(params, s, x, rt, 20)),
        ]:
            try:
                dt, first = timeit(jax.jit(f), init_state(S), pcm)
                print(f"S={S} {name:6s} {dt*1e3:8.1f} ms "
                      f"-> {S*audio/dt:9.0f} streams (compile {first:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"S={S} {name}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
