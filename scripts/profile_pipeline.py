#!/usr/bin/env python
"""Trace the steady-state pipeline on the TPU and aggregate op-level time.

Usage: python scripts/profile_pipeline.py [S] [T] [outdir]
Prints a table of (total_ms_per_frame, count, op-name-prefix) sorted by cost.
The axon relay supports jax.profiler; the trace lands in outdir (default
/tmp/rnnt_trace) and the aggregation below parses trace.json.gz directly.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
    from rnnoise_tpu.denoise import init_state, process_frames
    from __graft_entry__ import _demo_params

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/rnnt_trace"

    params = _demo_params()
    rt = RuntimeConfig(quantized=True)
    rng = np.random.default_rng(0)
    state = init_state(S)
    pcm = jnp.asarray(3000 * rng.standard_normal((S, T, FRAME_SIZE)),
                      jnp.float32)
    fn = jax.jit(lambda st, x: process_frames(params, st, x, rt))
    state, out, vad = fn(state, pcm)
    jax.block_until_ready(out)

    with jax.profiler.trace(outdir):
        st = state
        for _ in range(2):
            st, out, vad = fn(st, pcm)
        jax.block_until_ready(out)

    # Aggregate device-side events from the trace.
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # Find device-lane events (TensorFlow Op / XLA Ops lanes).
    pid_names = {}
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        lane = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in lane:
            continue
        name = ev["name"]
        dur = ev.get("dur", 0) / 1e3          # us -> ms
        # strip trailing .NN / digits to merge scan iterations
        base = name.split(".")[0].rstrip("0123456789_")
        agg[base][0] += dur
        agg[base][1] += 1
        total += dur

    n_frames = 2 * T
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"total device time {total:.1f} ms over {n_frames} frames "
          f"-> {total/n_frames:.3f} ms/frame")
    print(f"{'ms/frame':>9}  {'count':>6}  op")
    for name, (ms, cnt) in rows[:45]:
        print(f"{ms/n_frames:9.4f}  {cnt:6d}  {name[:90]}")


if __name__ == "__main__":
    main()
