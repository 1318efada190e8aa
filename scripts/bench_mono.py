#!/usr/bin/env python
"""On-chip A/B bench for monokernel variants (alias-coarse, frames_per_step,
block size) — the round-4 measurement harness for the levers round 3 built
but never timed (VERDICT items 1-3).

Usage: python scripts/bench_mono.py [S] [T] [variant ...]
  variant syntax: name=alias,fps,block[,inc_ds,batch_fwd,fps_loop,unroll]
  (inc_ds / batch_fwd / fps_loop / unroll default to the module flags —
  the measured shipping formulation)
  default grid: ship=1,4,256 afps8=1,8,256 afps2=1,2,256 afps4b128=1,4,128

Protocol per CLAUDE.md hazards: T=400 (relay dispatch overhead), chained
state (relay execution cache), host checksum per iter, median-of-N with
implausibly-fast rejection.  Prints ms/frame and realtime streams per row.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE
    from rnnoise_tpu import denoise
    from rnnoise_tpu.dsp import pallas_frame as pf
    from __graft_entry__ import _demo_params

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    specs = sys.argv[3:]
    if not specs:
        specs = ["ship=1,4,256", "afps8=1,8,256", "afps2=1,2,256",
                 "afps4b128=1,4,128"]

    params = _demo_params()
    weights = denoise._packed_weights(params)
    rng = np.random.default_rng(7)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"S={S} T={T}", flush=True)

    results = []
    for spec in specs:
        name, cfg = spec.split("=")
        fields = [int(v) for v in cfg.split(",")]
        alias, fps, block = fields[:3]
        inc_ds = bool(fields[3]) if len(fields) > 3 else pf._INC_DS
        batch_fwd = bool(fields[4]) if len(fields) > 4 else pf._BATCH_FWD
        fps_loop = bool(fields[5]) if len(fields) > 5 else pf._FPS_LOOP
        unroll = fields[6] if len(fields) > 6 else pf._FPS_UNROLL
        if S % block or T % fps:
            print(f"{name}: skipped (S%block={S % block} T%fps={T % fps})")
            continue
        prev_flags = (pf._INC_DS, pf._BATCH_FWD, pf._FPS_LOOP, pf._FPS_UNROLL)
        pf._INC_DS, pf._BATCH_FWD, pf._FPS_LOOP, pf._FPS_UNROLL = (
            inc_ds, batch_fwd, fps_loop, unroll)
        try:
            with pf.alias_coarse(bool(alias)):
                state = denoise.init_state(S)
                pcm = jnp.asarray(
                    3000 * rng.standard_normal((T, S, FRAME_SIZE)),
                    jnp.float32)

                def run(st, x, _b=block, _f=fps):
                    return pf.process_chunk_monokernel(
                        st, x, weights, block=_b, frames_per_step=_f)

                fn = jax.jit(run)
                t0 = time.perf_counter()
                st, out, vad = fn(state, pcm)
                jax.block_until_ready(out)
                compile_s = time.perf_counter() - t0

                times = []
                min_plausible = 1e-9 * S * T
                for _ in range(6):
                    t0 = time.perf_counter()
                    st, out, vad = fn(st, pcm)
                    checksum = float(jnp.sum(vad))
                    dt = time.perf_counter() - t0
                    if np.isfinite(checksum) and dt >= min_plausible:
                        times.append(dt)
                med = float(np.median(times))
                ms_frame = med / T * 1e3
                streams = S * (T * FRAME_SIZE / 48000.0) / med
                print(f"{name:12s} alias={alias} fps={fps} block={block}: "
                      f"{ms_frame:.3f} ms/frame -> {streams:8.0f} streams "
                      f"(min {min(times)/T*1e3:.3f} max {max(times)/T*1e3:.3f},"
                      f" compile {compile_s:.0f}s)", flush=True)
                results.append((name, ms_frame, streams))
        except Exception as e:  # noqa: BLE001 — keep the grid going
            print(f"{name}: FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            (pf._INC_DS, pf._BATCH_FWD, pf._FPS_LOOP,
             pf._FPS_UNROLL) = prev_flags

    if results:
        best = min(results, key=lambda r: r[1])
        print(f"best: {best[0]} {best[1]:.3f} ms/frame "
              f"({best[2]:.0f} streams)")


if __name__ == "__main__":
    main()
