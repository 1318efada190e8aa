#!/usr/bin/env python
"""Prewarm the repo-local JAX persistent compilation cache (.jax_cache) with
every config the bench of record runs, so `python bench.py` on a fresh
process — including the driver's end-of-round invocation — loads compiled
executables in seconds instead of cold-compiling for minutes/hours through
the remote-compile relay (BENCH_r04.json died rc=124 on exactly that).

Each config is compiled through `bench.py --one` itself: the cache key is
the HLO hash, so the prewarm MUST trace the exact jit closure the bench
traces.  The populated .jax_cache/ is committed to git (it is part of the
shipping artifact — the round transition wipes everything untracked).

Usage: python scripts/prewarm.py [--check] [--force]
  --check: after warming, re-run the shipping config in a fresh process and
  report its first-call time (should be seconds, not minutes).
  --force: proceed even when the device platform is not "tpu" (prewarming a
  CPU backend is never what you want; the flag exists for debugging).
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = os.path.join(HERE, ".jax_cache", ".prewarm.pid")

# Keep in sync with bench.py's TPU config list.
CONFIGS = [(3072, "monokernel"), (3072, "monokernel-i16"),
           (3072, "scan"), (6144, "monokernel")]
T = 400


def probe_platform():
    """Device platform via a THROWAWAY subprocess with a hard timeout, or
    None when the probe hangs/fails.  The compile relay can die out from
    under the VM (measured 2026-08-19: execute + remote_compile endpoints
    gone, after which jax.devices() hangs forever) — a prewarm launched then
    would sit silently in its first bench child while holding the pidfile
    lock, so refuse to start instead."""
    timeout = float(os.environ.get("RNNT_PREWARM_PROBE_TIMEOUT", "240"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout, cwd=HERE)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    lines = (r.stdout or "").strip().splitlines()
    return lines[-1] if lines else None


def warm(S, path):
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"),
         "--one", str(S), str(T), path], cwd=HERE)
    print(f"prewarm S={S} [{path}]: rc={r.returncode} "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    return r.returncode


def main():
    # A nohup'd prewarm survives the session that launched it; a second
    # instance would recompile the same keys and contend on the relay for
    # an hour.  Refuse to start while a previous instance is still alive.
    if os.path.exists(LOCK):
        try:
            pid = int(open(LOCK).read().strip())
            os.kill(pid, 0)   # raises if dead
            print(f"prewarm already running (pid {pid}, {LOCK}) — exiting",
                  file=sys.stderr)
            sys.exit(1)
        except (ValueError, ProcessLookupError, PermissionError):
            pass   # stale lock
    plat = probe_platform()
    if plat is None:
        print("prewarm: device probe hung/failed — compile relay unreachable;"
              " not starting (nothing would compile, the lock would wedge)",
              file=sys.stderr)
        sys.exit(2)
    if plat != "tpu" and "--force" not in sys.argv:
        print(f"prewarm: device platform is {plat!r}, not 'tpu' — the cache "
              "entries would be useless for the bench of record "
              "(--force to override)", file=sys.stderr)
        sys.exit(2)
    os.makedirs(os.path.dirname(LOCK), exist_ok=True)
    with open(LOCK, "w") as f:
        f.write(str(os.getpid()))
    for S, path in CONFIGS:
        warm(S, path)
    if "--check" in sys.argv:
        print("cache check: re-running shipping config in a fresh process",
              flush=True)
        warm(*CONFIGS[0])
    try:
        os.remove(LOCK)
    except OSError:
        pass


if __name__ == "__main__":
    main()
