"""The prewarm pidfile guard: a second prewarm instance must refuse to start
while a previous one is alive (a nohup'd prewarm survives the session that
launched it; a duplicate recompiles the same cache keys and contends on the
remote-compile relay for an hour — measured 2026-08-19).

Only the live-lock path is driven end-to-end: the stale-lock path proceeds
into real (expensive) compiles, so it is exercised via the module's lock
check logic alone.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREWARM = os.path.join(REPO, "scripts", "prewarm.py")
LOCK = os.path.join(REPO, ".jax_cache", ".prewarm.pid")


def test_non_tpu_platform_refuses():
    """With the axon plugin disabled the probe resolves to 'cpu' quickly, and
    prewarm must refuse: CPU cache entries are useless for the bench of
    record (and on a dead relay the probe path is what prevents a silent
    hang while holding the lock)."""
    assert not os.path.exists(LOCK), "a real prewarm appears to be running"
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)   # sitecustomize activation var
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, PREWARM], capture_output=True,
                       text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 2, (r.returncode, r.stderr)
    assert "not 'tpu'" in r.stderr
    assert not os.path.exists(LOCK)


def test_jax_cache_is_git_tracked():
    """BENCH_r04 died rc=124 because .jax_cache was gitignored: the round
    transition wiped it and the driver's bench cold-compiled every row
    (~45 min per monokernel config through the relay).  Guard the invariant
    the prewarm machinery depends on: the cache dir must not be ignored, and
    the large (monokernel-executable-sized) entries must be git-tracked so
    they survive into the driver's checkout."""
    r = subprocess.run(["git", "check-ignore", ".jax_cache"], cwd=REPO,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode != 0, ".jax_cache is gitignored — the warm bench " \
        "cache would be wiped at round transition (the BENCH_r04 failure)"
    r = subprocess.run(["git", "ls-files", ".jax_cache"], cwd=REPO,
                       capture_output=True, text=True, timeout=60)
    tracked = [ln for ln in r.stdout.splitlines() if ln]
    assert len(tracked) >= 50, f"only {len(tracked)} cache entries tracked"
    big = [f for f in tracked
           if os.path.getsize(os.path.join(REPO, f)) > 10_000_000]
    assert big, "no large compiled-executable cache entries are tracked"


def test_live_lock_refuses(tmp_path):
    assert not os.path.exists(LOCK), "a real prewarm appears to be running"
    os.makedirs(os.path.dirname(LOCK), exist_ok=True)
    with open(LOCK, "w") as f:
        f.write("1")   # pid 1 is always alive
    try:
        r = subprocess.run([sys.executable, PREWARM], capture_output=True,
                           text=True, timeout=60, cwd=REPO)
        assert r.returncode == 1, (r.returncode, r.stderr)
        assert "already running" in r.stderr
    finally:
        os.remove(LOCK)
