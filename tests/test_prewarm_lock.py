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
