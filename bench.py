#!/usr/bin/env python
"""Benchmark: concurrent real-time 48 kHz streams denoised per chip.

Runs the full batched pipeline (HP biquad -> FFT/pitch/features -> int8
conv+3xGRU -> pitch comb filter + gains -> OLA synthesis) over a stream batch
for T frames per dispatch and reports how many streams stay real-time
(1 frame = 10 ms of audio).

Prints exactly one JSON line:
  {"metric": "realtime_streams_per_chip", "value": N, "unit": "streams",
   "vs_baseline": N / 50000}
(baseline = the driver-set north star of 50 000 streams/chip, BASELINE.md.)
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
    from rnnoise_tpu.denoise import (init_state, process_frames_tm,
                                     process_frames_tm_i16)
    from __graft_entry__ import _demo_params

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    params = _demo_params()
    rt = RuntimeConfig(quantized=True)
    rng = np.random.default_rng(0)

    T = 400                       # 4 s of audio per dispatch (amortises the
    #                               dev-relay's ~30 ms dispatch overhead; on
    #                               a direct-attached chip T=100 is within 2%)
    best = 0.0
    best_cfg = None
    best_spread = {}
    best_path = "scan"
    # S sweep measured r2: throughput peaks at S=3072 — the scoped-VMEM
    # residency knee (S(1) buffers; see CLAUDE.md).  4096 is ~6% worse,
    # 8192 ~15%/stream worse; keep 4096 so large-S regressions stay visible.
    # Each (S, path) config goes through the same process_frames_tm dispatch;
    # "monokernel" rows flip denoise.set_monokernel("on") (TPU only) so the
    # bench certifies the exact shipping dispatch of whichever path wins.
    from rnnoise_tpu import denoise as _dn
    configs = [(S, "scan") for S in (2048, 3072, 4096)]
    if dev.platform == "tpu":
        # the scan's optimum is pinned by scoped-VMEM residency at S=3072;
        # the monokernel has no such knee — probe it where the scan can't
        # follow.  The i16 rows run the exact serving boundary (int16 pcm
        # in/out, in-kernel conversion — what the native engine ships to the
        # chip): audio is int16-valued either way, and the i16 windows halve
        # the kernel's pcm VMEM/HBM traffic.
        configs += [(S, "monokernel") for S in (3072, 4096, 6144)]
        configs += [(S, "monokernel-i16") for S in (3072, 4096)]
    for S, path in configs:
        try:
            _dn.set_monokernel("off" if path == "scan" else "on")
            state = init_state(S)
            noise = 3000 * rng.standard_normal((T, S, FRAME_SIZE))
            if path == "monokernel-i16":
                pcm = jnp.asarray(noise, jnp.float32).astype(jnp.int16)
                fn = jax.jit(
                    lambda st, x: process_frames_tm_i16(params, st, x, rt))
            else:
                pcm = jnp.asarray(noise, jnp.float32)
                fn = jax.jit(
                    lambda st, x: process_frames_tm(params, st, x, rt))
            t0 = time.perf_counter()
            state2, out, vad = fn(state, pcm)
            jax.block_until_ready(out)
            compile_and_first = time.perf_counter() - t0

            # Chain the state through iterations: the computation differs
            # every call, so no executable/result caching can fake the
            # timing, and it is exactly the steady-state streaming pattern.
            # Materialise a scalar on the host each iteration — remote-TPU
            # runtimes have been observed to report block_until_ready before
            # results exist, faking impossible timings.
            # Take the min over several synced iterations: remote-TPU relay
            # timing hiccups in both directions (async completion reported
            # early; multi-second stalls), and min-of-N is robust to both.
            n_iter = 6
            st = state2
            times = []
            min_plausible = 1e-9 * S * T   # < 1 ns/frame/stream: impossible
            for _ in range(n_iter):
                t0 = time.perf_counter()
                st, out, vad = fn(st, pcm)
                checksum = float(jnp.sum(vad))   # forces host materialisation
                dt = time.perf_counter() - t0
                if np.isfinite(checksum) and dt >= min_plausible:
                    times.append(dt)
            if not times:
                raise RuntimeError("no plausible timings collected")
            # Median-of-N headline with the min/max spread recorded: the
            # relay's timing channel is ±10-15% with occasional stalls, so a
            # single number is not believable on its own (VERDICT r2 #6).
            elapsed = float(np.median(times))
            # relay bogons (multi-second stalls, e.g. a 96 s max against a
            # 385 ms median in BENCH_r03) would make streams_min meaningless
            # — drop runs >3x the median from the reported spread
            times = [t for t in times if t <= 3.0 * elapsed]

            audio_seconds = T * FRAME_SIZE / 48000.0
            streams_rt = S * audio_seconds / elapsed
            log(f"S={S} [{path}]: median {elapsed*1e3:8.1f} ms over "
                f"{len(times)} runs "
                f"(min {min(times)*1e3:.1f} / max {max(times)*1e3:.1f}) "
                f"/ {audio_seconds:.1f} s audio "
                f"-> {streams_rt:9.0f} realtime streams "
                f"(first call {compile_and_first:.1f} s)")
            if streams_rt > best:
                best, best_cfg, best_path = streams_rt, (S, T), path
                best_spread = {
                    "n_runs": len(times),
                    "streams_min": round(S * audio_seconds / max(times), 1),
                    "streams_max": round(S * audio_seconds / min(times), 1),
                }
        except Exception as e:  # noqa: BLE001 — report partial results
            log(f"S={S} [{path}]: failed: {e}")
            if path == "scan":
                break
        finally:
            _dn.set_monokernel("off")

    log(f"best: {best:.0f} streams at S={best_cfg} [{best_path}]")
    print(json.dumps({
        "metric": "realtime_streams_per_chip",
        "value": round(best, 1),
        "unit": "streams",
        "vs_baseline": round(best / 50000.0, 4),
        "path": best_path,
        **best_spread,
    }))


if __name__ == "__main__":
    main()
