"""Multi-process host fan-out: K worker processes feed one device batch.

The single-core host path moves ~9.5k realtime streams per core (full tick at
S=4096/T=8 = 34.5 ms on one vCPU); a 50k-stream chip therefore needs ~5-6
host cores.  This module commits that fan-out: the global slot axis [0, S) is
split into K contiguous ranges, each owned by a worker process running its own
native StreamPool (ring buffers + thread pool, native/streamio.cc).  Assembly
and commit write DIRECTLY into shared-memory [T, S, 480] int16 tensors via the
strided native entry points (rnnt_pool_*_strided), so the parent never
gathers/scatters per-worker results — its only job is the jitted device tick.

Mirrors the per-sample boundary of the reference demo
(/root/reference/examples/rnnoise_demo.c:52-61) batched over streams, like
runtime/engine.py, but with the host side parallel over processes (the
reference is single-stream single-threaded; there is nothing to port).

Workers must never import jax (rnnoise_tpu/__init__ pulls the device client
path, and K copies of the runtime per host core is pure waste), so they are
NOT multiprocessing children (spawn would re-import this module under the
package and drag the whole framework in): each worker is a plain subprocess
executing THIS FILE by path — module level stays import-light — and speaks
length-prefixed pickle over a multiprocessing.connection unix socket.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
from multiprocessing.connection import Client, Listener
from typing import Optional

import numpy as np

FRAME = 480
_THIS_FILE = os.path.abspath(__file__)
_NATIVE_PY = os.path.join(os.path.dirname(_THIS_FILE), "native.py")


def _load_native(path: str):
    spec = importlib.util.spec_from_file_location("_rnnt_native_solo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _worker_main(cfg: dict) -> None:
    """Worker loop: owns a StreamPool for global slots
    [slot_offset, slot_offset + n_local); serves bulk commands against the
    shared tensors until "stop".  Runs outside the package (see module
    docstring) — only numpy + ctypes + shared_memory."""
    from multiprocessing import shared_memory

    def attach_shm(name):
        # attach WITHOUT ownership: the parent owns the segments.  3.13+ has
        # track=False; on 3.12 unregister from the worker's resource tracker
        # so shutdown doesn't warn about (and must never unlink) them.
        try:
            return shared_memory.SharedMemory(name=name, track=False)
        except TypeError:
            shm = shared_memory.SharedMemory(name=name)
            try:
                from multiprocessing import resource_tracker
                resource_tracker.unregister(shm._name, "shared_memory")
            except Exception:
                pass
            return shm

    native = _load_native(cfg["native_py"])
    lib = native.get_lib()
    pool = native.StreamPool(cfg["n_local"], cfg["ring_frames"])
    total, off = cfg["total_slots"], cfg["slot_offset"]
    t_max, io_cap = cfg["t_max"], cfg["io_cap"]
    conn = Client(cfg["addr"], authkey=bytes.fromhex(cfg["authkey"]))
    shms = {k: attach_shm(v) for k, v in cfg["shm_names"].items()}
    in_full = np.ndarray((t_max, total, FRAME), np.int16, shms["in"].buf)
    out_full = np.ndarray((t_max, total, FRAME), np.int16, shms["out"].buf)
    counts = np.ndarray((total,), np.int32, shms["counts"].buf)
    reset = np.ndarray((total,), np.uint8, shms["reset"].buf)
    io_flat = np.ndarray((total * io_cap,), np.int16, shms["io"].buf)
    my_counts = counts[off:off + cfg["n_local"]]
    my_reset = reset[off:off + cfg["n_local"]]
    try:
        while True:
            cmd = conn.recv()
            op = cmd[0]
            if op == "stop":
                conn.send(("ok", None))
                break
            try:
                if op == "attach":
                    got = sum(pool.attach() >= 0 for _ in range(cmd[1]))
                    conn.send(("ok", got))
                elif op == "detach":
                    pool.detach(cmd[1])
                    conn.send(("ok", None))
                elif op == "push":
                    # io region viewed as [total, n] (row stride == n)
                    n = cmd[1]
                    view = io_flat[:total * n].reshape(total, n)
                    fed = lib.rnnt_pool_push_all_strided(pool._p, view, n,
                                                         off)
                    conn.send(("ok", fed))
                elif op == "pull":
                    n = cmd[1]
                    view = io_flat[:total * n].reshape(total, n)
                    full = lib.rnnt_pool_pull_all_strided(pool._p, view, n,
                                                          off)
                    conn.send(("ok", full))
                elif op == "assemble":
                    lib.rnnt_pool_assemble_tm_i16_strided(
                        pool._p, cmd[1], in_full, total, off,
                        my_counts, my_reset)
                    conn.send(("ok", None))
                elif op == "commit":
                    lib.rnnt_pool_commit_tm_i16_strided(
                        pool._p, cmd[1], out_full, total, off, my_counts)
                    conn.send(("ok", None))
                else:
                    conn.send(("err", f"unknown op {op!r}"))
            except Exception as e:  # noqa: BLE001 — report, keep serving
                conn.send(("err", f"{type(e).__name__}: {e}"))
    finally:
        for s in shms.values():
            s.close()
        conn.close()


class FanoutPool:
    """Bulk-mode StreamPool whose assemble/commit/push/pull run across
    ``n_workers`` processes.

    Bulk-only interface: attach_all / push_all / assemble_tm_i16 /
    commit_tm_i16 / pull_all — per-slot push/pull belongs to the ingest
    frontend that owns the worker's slot range."""

    def __init__(self, n_slots: int, n_workers: int,
                 ring_frames: int = 256, t_max: int = 16,
                 io_cap_frames: int = 64):
        from multiprocessing import shared_memory

        if n_slots % n_workers:
            raise ValueError(f"n_slots {n_slots} % n_workers {n_workers}")
        self.n_slots = n_slots
        self.n_workers = n_workers
        self.t_max = t_max
        self.io_cap = io_cap_frames * FRAME
        per = n_slots // n_workers
        tm_bytes = 2 * t_max * n_slots * FRAME
        self._shms = {
            "in": shared_memory.SharedMemory(create=True, size=tm_bytes),
            "out": shared_memory.SharedMemory(create=True, size=tm_bytes),
            "counts": shared_memory.SharedMemory(create=True,
                                                 size=4 * n_slots),
            "reset": shared_memory.SharedMemory(create=True, size=n_slots),
            "io": shared_memory.SharedMemory(
                create=True, size=2 * n_slots * self.io_cap),
        }
        self.in_batch = np.ndarray((t_max, n_slots, FRAME), np.int16,
                                   self._shms["in"].buf)
        self.out_batch = np.ndarray((t_max, n_slots, FRAME), np.int16,
                                    self._shms["out"].buf)
        self.counts = np.ndarray((n_slots,), np.int32,
                                 self._shms["counts"].buf)
        self.reset = np.ndarray((n_slots,), np.uint8,
                                self._shms["reset"].buf)
        self._io = np.ndarray((n_slots * self.io_cap,), np.int16,
                              self._shms["io"].buf)
        names = {k: s.name for k, s in self._shms.items()}

        authkey = os.urandom(16)
        sockdir = tempfile.mkdtemp(prefix="rnnt_fanout_")
        addr = os.path.join(sockdir, "sock")
        listener = Listener(addr, authkey=authkey)
        self._conns, self._procs = [], []
        try:
            for w in range(n_workers):
                cfg = {"native_py": _NATIVE_PY, "addr": addr,
                       "authkey": authkey.hex(), "n_local": per,
                       "slot_offset": w * per, "total_slots": n_slots,
                       "ring_frames": ring_frames, "shm_names": names,
                       "t_max": t_max, "io_cap": self.io_cap}
                import json
                p = subprocess.Popen(
                    [sys.executable, _THIS_FILE, json.dumps(cfg)],
                    stdin=subprocess.DEVNULL)
                self._procs.append(p)
                self._conns.append(listener.accept())
        finally:
            listener.close()
            try:
                os.unlink(addr)
                os.rmdir(sockdir)
            except OSError:
                pass

    # -- command fan-out ---------------------------------------------------
    def _all(self, *cmd):
        for c in self._conns:
            c.send(cmd)
        out = []
        for c in self._conns:
            status, val = c.recv()
            if status != "ok":
                raise RuntimeError(f"fanout worker failed: {val}")
            out.append(val)
        return out

    # -- bulk stream management --------------------------------------------
    def attach_all(self) -> int:
        per = self.n_slots // self.n_workers
        return sum(self._all("attach", per))

    def push_all(self, pcm: np.ndarray) -> int:
        """Bulk ingest [S, n] int16 into every active slot."""
        S, n = pcm.shape
        assert S == self.n_slots and n <= self.io_cap
        view = self._io[:S * n].reshape(S, n)
        np.copyto(view, pcm, casting="same_kind")
        return sum(self._all("push", n))

    def pull_all(self, n: int,
                 out: Optional[np.ndarray] = None) -> tuple[np.ndarray, int]:
        """Pass a preallocated [S, n] int16 `out` to reuse it across ticks
        (a fresh copy re-faults its pages every call)."""
        assert n <= self.io_cap
        full = sum(self._all("pull", n))
        view = self._io[:self.n_slots * n].reshape(self.n_slots, n)
        if out is None:
            out = view.copy()
        else:
            np.copyto(out, view)
        return out, full

    def assemble_tm_i16(self, t_frames: int):
        """Parallel time-major assembly into the SHARED in_batch; returns
        views (valid until the next assemble)."""
        assert t_frames <= self.t_max
        self._all("assemble", t_frames)
        return (self.in_batch[:t_frames], self.counts, self.reset)

    def commit_tm_i16(self, t_frames: int, batch: np.ndarray,
                      counts: Optional[np.ndarray] = None) -> None:
        """Copy ``batch`` into the shared out tensor and commit in parallel.
        counts defaults to the shared counts of the matching assemble (which
        the workers already hold)."""
        assert t_frames <= self.t_max
        np.copyto(self.out_batch[:t_frames], batch, casting="same_kind")
        if counts is not None and counts is not self.counts:
            np.copyto(self.counts, counts)
        self._all("commit", t_frames)

    def close(self) -> None:
        if not self._conns:
            return
        try:
            self._all("stop")
        except (OSError, EOFError, RuntimeError):
            pass
        for p in self._procs:
            try:
                p.wait(timeout=5)
            except subprocess.TimeoutExpired:
                p.kill()
        for c in self._conns:
            c.close()
        for s in self._shms.values():
            s.close()
            try:
                s.unlink()
            except FileNotFoundError:
                pass
        self._conns, self._procs = [], []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FanoutEngine:
    """StreamingEngine with the host path fanned out over processes.

    Same device tick as runtime.engine.StreamingEngine (reset-mask re-init,
    starvation rollback, int16 time-major boundary); the host assemble/commit
    runs on n_workers cores.  ``pipelined=True`` commits the previous tick's
    output while the device computes the current one."""

    def __init__(self, n_slots: int, model=None, chunk_frames: int = 8,
                 n_workers: int = 2, runtime=None, ring_frames: int = 256,
                 pipelined: bool = False):
        import jax
        import jax.numpy as jnp

        from ..config import DEFAULT_MODEL, DEFAULT_RUNTIME
        from ..denoise import (init_state, process_frames_tm_i16,
                               reset_streams)

        runtime = runtime if runtime is not None else DEFAULT_RUNTIME
        self.pool = FanoutPool(n_slots, n_workers, ring_frames=ring_frames,
                               t_max=max(chunk_frames, 1))
        self.n_slots = n_slots
        self.chunk_frames = chunk_frames
        self.pipelined = pipelined
        self._pending = None
        config = model.config if model is not None else DEFAULT_MODEL
        self.state = init_state(n_slots, config)
        params = model.params if model is not None else None

        @jax.jit
        def _tick(state, pcm, counts, reset_mask):
            state = reset_streams(state, reset_mask)
            prev = state
            state, out, vad = process_frames_tm_i16(params, state, pcm,
                                                    runtime)
            # Roll back streams that had no full chunk this tick (starved or
            # inactive): their zero-padded frames must not advance state.
            full = counts >= pcm.shape[0]
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    full.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                state, prev)
            return state, out, vad

        self._tick_fn = _tick
        self._jnp = jnp

    def attach_all(self) -> int:
        return self.pool.attach_all()

    def push_all(self, pcm_i16: np.ndarray) -> int:
        return self.pool.push_all(pcm_i16)

    def pull_all(self, n: int):
        return self.pool.pull_all(n)

    def tick(self) -> int:
        T = self.chunk_frames
        batch, counts, reset = self.pool.assemble_tm_i16(T)
        counts_h = counts.copy()      # shared array mutates on next assemble
        self.state, out, _vad = self._tick_fn(
            self.state, self._jnp.asarray(batch),
            self._jnp.asarray(counts_h),
            self._jnp.asarray(reset.astype(bool)))
        if self.pipelined:
            advanced = 0
            if self._pending is not None:
                p_out, p_counts = self._pending
                self.pool.commit_tm_i16(T, np.asarray(p_out), p_counts)
                advanced = int((p_counts >= T).sum())
            self._pending = (out, counts_h)
            return advanced
        self.pool.commit_tm_i16(T, np.asarray(out), counts_h)
        return int((counts_h >= T).sum())

    def flush(self) -> int:
        if self._pending is None:
            return 0
        p_out, p_counts = self._pending
        self._pending = None
        self.pool.commit_tm_i16(self.chunk_frames, np.asarray(p_out),
                                p_counts)
        return int((p_counts >= self.chunk_frames).sum())

    def close(self) -> None:
        self.pool.close()


if __name__ == "__main__":
    import json
    _worker_main(json.loads(sys.argv[1]))
