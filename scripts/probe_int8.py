#!/usr/bin/env python
"""Probe: do Mosaic int8 dots lower to the int8 MXU rate (394 TOPS on v5e)
or get promoted?  Times a T-step chained pallas kernel doing the monokernel's
actual GRU-shaped matmul ([B, 384] @ [384, 1152]) in int8-accum-int32 vs
bf16-accum-f32, plus the X3 f32 shape for reference (VERDICT r3 item 4).

Chained state defeats the relay execution cache; per-iteration host checksum
forces materialisation (CLAUDE.md hazards).

Usage: python scripts/probe_int8.py [B=384] [T=2000] [reps=40]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    N, M = 384, 1152
    rng = np.random.default_rng(5)

    def kern_i8(x_ref, w_ref, o_ref, *, reps):
        x = x_ref[:]
        w = w_ref[:]
        acc = x
        for _ in range(reps):
            xq = jnp.clip(jnp.floor(0.5 + acc), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            acc = y[:, :N] * 1e-3 + acc * 0.5
        o_ref[:] = acc

    def kern_bf16(x_ref, w_ref, o_ref, *, reps):
        x = x_ref[:]
        w = w_ref[:]
        acc = x
        for _ in range(reps):
            xb = acc.astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                xb, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y[:, :N] * 1e-3 + acc * 0.5
        o_ref[:] = acc

    wi8 = jnp.asarray(rng.integers(-127, 127, (N, M)), jnp.int8)
    wbf = jnp.asarray(rng.standard_normal((N, M)), jnp.bfloat16)

    for name, kern, w in (("int8", kern_i8, wi8), ("bf16", kern_bf16, wbf)):
        x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
        fn = jax.jit(lambda x, _w=w, _k=kern: pl.pallas_call(
            functools.partial(_k, reps=reps),
            grid=(T,),
            in_specs=[pl.BlockSpec((B, N), lambda t: (0, 0)),
                      pl.BlockSpec((N, M), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((B, N), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        )(x, _w))
        out = fn(x)
        jax.block_until_ready(out)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(out)          # chain state
            s = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            if np.isfinite(s) and dt > 1e-5:
                times.append(dt)
        med = float(np.median(times))
        macs = B * N * M * reps * T
        print(f"{name}: {med*1e3:8.2f} ms  {2*macs/med/1e12:7.1f} TOPS "
              f"(min {min(times)*1e3:.2f} max {max(times)*1e3:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
