"""bench.py orchestrator robustness contract (the round-4 bench of record
died rc=124 with nothing parsed — BENCH_r04.json).  The contract: every
config runs in its own subprocess, and BOTH a per-row timeout AND a
SIGTERM/SIGINT to the orchestrator still yield exactly one parsed
best-so-far JSON line on stdout with rc=0.

These tests drive `python bench.py` end-to-end on the CPU smoke row.  The
row child is never allowed to finish (1 s row timeout / early SIGTERM), so
no BENCH_partial.json is written and no compile-cache entries are created —
the tests exercise only the orchestrator's failure paths, which is the
point.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _cpu_env() -> dict:
    """bench.py must run its CPU smoke row here even on a TPU dev VM.  The
    axon sitecustomize activates on PALLAS_AXON_POOL_IPS and its register()
    clobbers jax_platforms via jax.config (so an exec-time JAX_PLATFORMS=cpu
    alone does not stick, and with the relay down jax.devices() would hang).
    Dropping the activation var in the CHILD disables the plugin there; the
    same code path is a no-op on plain CPU CI boxes."""
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, "no stdout at all"
    return json.loads(lines[-1])


def test_row_timeout_still_prints_parsed_json():
    env = _cpu_env()
    env["RNNT_BENCH_ROW_TIMEOUT"] = "1"   # kill the CPU row mid-import
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert "row timeout" in r.stderr
    row = _last_json_line(r.stdout)
    assert row["metric"] == "realtime_streams_per_chip"
    assert row["value"] == 0.0
    assert row["configs_run"] == 0
    assert "vs_baseline" in row


def test_sigterm_prints_best_so_far_json():
    proc = subprocess.Popen([sys.executable, BENCH],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, cwd=REPO, env=_cpu_env())
    try:
        # The SIGTERM handler is installed right after the platform probe
        # logs; wait for that line (plus a settle margin) before signalling.
        deadline = time.monotonic() + 240
        seen = ""
        while time.monotonic() < deadline:
            line = proc.stderr.readline()
            seen += line
            if "platform:" in line:
                break
        else:
            raise AssertionError(f"no platform line before deadline: {seen}")
        time.sleep(3.0)
        proc.send_signal(signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, (proc.returncode, seen + stderr)
    row = _last_json_line(stdout)
    assert row["metric"] == "realtime_streams_per_chip"
    assert row["value"] == 0.0
    assert row["path"] == "none"
