#!/usr/bin/env python
"""Host-side fan-out scaling bench: full host tick cost vs worker count.

Measures the HOST half of the streaming engine only — push_all + assemble +
commit + pull_all over the multi-process FanoutPool (runtime/fanout.py) — so
the number is comparable across machines regardless of device/relay.  On the
1-vCPU dev VM the curve is flat (nothing to scale onto); on a real multi-core
host the per-tick cost should drop ~linearly with workers until memory
bandwidth saturates.  One JSON line per worker count.

Usage: python scripts/host_scale.py [S] [T] [workers ...]
       defaults: S=4096 T=8 workers 1 2 4 6
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME = 480


def main():
    from rnnoise_tpu.runtime.fanout import FanoutPool

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    workers = [int(w) for w in sys.argv[3:]] or [1, 2, 4, 6]
    n = T * FRAME
    rng = np.random.default_rng(0)
    pcm = (3000 * rng.standard_normal((S, 4 * n))).astype(np.int16)
    print(f"host_scale S={S} T={T} cores={os.cpu_count()}", flush=True)

    for K in workers:
        if S % K:
            print(f"K={K}: skipped (S % K != 0)")
            continue
        pool = FanoutPool(S, K, ring_frames=64, t_max=T, io_cap_frames=4 * T)
        try:
            pool.attach_all()
            outbuf = np.empty((S, n), np.int16)    # reused across ticks
            pool.push_all(pcm)                     # warm the rings
            batch, counts, _ = pool.assemble_tm_i16(T)
            pool.commit_tm_i16(T, batch)
            pool.pull_all(n, out=outbuf)
            times = []
            for _ in range(16):
                t0 = time.perf_counter()
                pool.push_all(pcm[:, :n])
                batch, counts, _ = pool.assemble_tm_i16(T)
                pool.commit_tm_i16(T, batch)       # identity "device"
                pool.pull_all(n, out=outbuf)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            streams = S * (T * FRAME / 48000.0) / med
            print(json.dumps({
                "workers": K, "S": S, "T": T,
                "tick_ms": round(med * 1e3, 2),
                "host_realtime_streams": int(streams),
                "tick_ms_min": round(min(times) * 1e3, 2),
                "tick_ms_max": round(max(times) * 1e3, 2)}), flush=True)
        finally:
            pool.close()


if __name__ == "__main__":
    main()
