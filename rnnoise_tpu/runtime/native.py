"""ctypes binding for the native stream-I/O runtime (native/streamio.cc).

The shared library builds on demand with g++ and is cached next to the
source; no packaging machinery needed.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libstreamio.so")
_SRC = os.path.join(_NATIVE_DIR, "streamio.cc")

_i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib = None


def _build() -> str:
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", "-o", _SO_PATH, _SRC],
            check=True)
    return _SO_PATH


def get_lib() -> ct.CDLL:
    global _lib
    if _lib is None:
        lib = ct.CDLL(_build())
        lib.rnnt_pool_create.restype = ct.c_void_p
        lib.rnnt_pool_create.argtypes = [ct.c_int, ct.c_int]
        lib.rnnt_pool_destroy.argtypes = [ct.c_void_p]
        lib.rnnt_pool_n_slots.restype = ct.c_int
        lib.rnnt_pool_n_slots.argtypes = [ct.c_void_p]
        lib.rnnt_pool_attach.restype = ct.c_int
        lib.rnnt_pool_attach.argtypes = [ct.c_void_p]
        lib.rnnt_pool_detach.argtypes = [ct.c_void_p, ct.c_int]
        lib.rnnt_pool_push.restype = ct.c_int64
        lib.rnnt_pool_push.argtypes = [ct.c_void_p, ct.c_int, _i16p, ct.c_int64]
        lib.rnnt_pool_push_all.restype = ct.c_int
        lib.rnnt_pool_push_all.argtypes = [ct.c_void_p, _i16p, ct.c_int64]
        lib.rnnt_pool_pull_all.restype = ct.c_int
        lib.rnnt_pool_pull_all.argtypes = [ct.c_void_p, _i16p, ct.c_int64]
        lib.rnnt_pool_pull.restype = ct.c_int64
        lib.rnnt_pool_pull.argtypes = [ct.c_void_p, ct.c_int, _i16p, ct.c_int64]
        lib.rnnt_pool_available.restype = ct.c_int64
        lib.rnnt_pool_available.argtypes = [ct.c_void_p, ct.c_int]
        lib.rnnt_pool_assemble.argtypes = [ct.c_void_p, ct.c_int, _f32p,
                                           _i32p, _u8p]
        lib.rnnt_pool_commit.argtypes = [ct.c_void_p, ct.c_int, _f32p, _i32p]
        lib.rnnt_pool_assemble_tm.argtypes = [ct.c_void_p, ct.c_int, _f32p,
                                              _i32p, _u8p]
        lib.rnnt_pool_commit_tm.argtypes = [ct.c_void_p, ct.c_int, _f32p,
                                            _i32p]
        lib.rnnt_pool_assemble_tm_i16.argtypes = [ct.c_void_p, ct.c_int,
                                                  _i16p, _i32p, _u8p]
        lib.rnnt_pool_commit_tm_i16.argtypes = [ct.c_void_p, ct.c_int,
                                                _i16p, _i32p]
        # strided variants for the multi-process fan-out (runtime/fanout.py):
        # each worker pool reads/writes its slot range of the SHARED global
        # batch/io tensors directly (base pointer + total_slots stride +
        # slot_offset), so assembly scales across host cores with zero
        # gather/scatter copies in the parent.
        lib.rnnt_pool_assemble_tm_i16_strided.argtypes = [
            ct.c_void_p, ct.c_int, _i16p, ct.c_int64, ct.c_int64, _i32p, _u8p]
        lib.rnnt_pool_commit_tm_i16_strided.argtypes = [
            ct.c_void_p, ct.c_int, _i16p, ct.c_int64, ct.c_int64, _i32p]
        lib.rnnt_pool_push_all_strided.restype = ct.c_int
        lib.rnnt_pool_push_all_strided.argtypes = [ct.c_void_p, _i16p,
                                                   ct.c_int64, ct.c_int64]
        lib.rnnt_pool_pull_all_strided.restype = ct.c_int
        lib.rnnt_pool_pull_all_strided.argtypes = [ct.c_void_p, _i16p,
                                                   ct.c_int64, ct.c_int64]
        lib.rnnt_blob_validate.restype = ct.c_int
        lib.rnnt_blob_validate.argtypes = [ct.c_char_p, ct.c_int64,
                                           ct.c_char_p, ct.c_int64]
        _lib = lib
    return _lib


class StreamPool:
    """Native pool of stream slots with PCM ring buffers (see streamio.cc)."""

    def __init__(self, n_slots: int, ring_frames: int = 64):
        self._lib = get_lib()
        self._p = self._lib.rnnt_pool_create(n_slots, ring_frames)
        self.n_slots = n_slots

    def __del__(self):
        try:
            self._lib.rnnt_pool_destroy(self._p)
        except Exception:
            pass

    def attach(self) -> int:
        return self._lib.rnnt_pool_attach(self._p)

    def detach(self, slot: int) -> None:
        self._lib.rnnt_pool_detach(self._p, slot)

    def push(self, slot: int, pcm: np.ndarray) -> int:
        pcm = np.ascontiguousarray(pcm, np.int16)
        return self._lib.rnnt_pool_push(self._p, slot, pcm, len(pcm))

    def pull(self, slot: int, n: int) -> np.ndarray:
        out = np.empty(n, np.int16)
        got = self._lib.rnnt_pool_pull(self._p, slot, out, n)
        return out[:max(0, got)]

    def available(self, slot: int) -> int:
        return self._lib.rnnt_pool_available(self._p, slot)

    def push_all(self, pcm: np.ndarray) -> int:
        """Bulk ingest [S, n] int16 into every active slot (one native call,
        thread-pooled)."""
        pcm = np.ascontiguousarray(pcm, np.int16)
        assert pcm.shape[0] == self.n_slots
        return self._lib.rnnt_pool_push_all(self._p, pcm, pcm.shape[1])

    def pull_all(self, n: int,
                 out: np.ndarray | None = None) -> tuple[np.ndarray, int]:
        """Bulk drain up to n samples per slot -> ([S, n] int16 zero-filled,
        slots that produced a full n).  Pass a preallocated [S, n] int16
        `out` to reuse it across ticks — fresh allocations re-fault their
        pages every call (~2x the copy cost on this path)."""
        if out is None:
            out = np.empty((self.n_slots, n), np.int16)
        full = self._lib.rnnt_pool_pull_all(self._p, out, n)
        return out, full

    def assemble(self, t_frames: int):
        S = self.n_slots
        batch = np.empty((S, t_frames, 480), np.float32)
        counts = np.empty(S, np.int32)
        reset = np.empty(S, np.uint8)
        self._lib.rnnt_pool_assemble(self._p, t_frames, batch, counts, reset)
        return batch, counts, reset

    def commit(self, t_frames: int, batch: np.ndarray,
               counts: np.ndarray) -> None:
        self._lib.rnnt_pool_commit(
            self._p, t_frames, np.ascontiguousarray(batch, np.float32),
            np.ascontiguousarray(counts, np.int32))

    def assemble_tm(self, t_frames: int):
        """Time-major assembly: [T, S, 480] (for denoise.process_frames_tm —
        no boundary transposes on the device)."""
        S = self.n_slots
        batch = np.empty((t_frames, S, 480), np.float32)
        counts = np.empty(S, np.int32)
        reset = np.empty(S, np.uint8)
        self._lib.rnnt_pool_assemble_tm(self._p, t_frames, batch, counts,
                                        reset)
        return batch, counts, reset

    def commit_tm(self, t_frames: int, batch: np.ndarray,
                  counts: np.ndarray) -> None:
        self._lib.rnnt_pool_commit_tm(
            self._p, t_frames, np.ascontiguousarray(batch, np.float32),
            np.ascontiguousarray(counts, np.int32))

    def assemble_tm_i16(self, t_frames: int, out: tuple | None = None):
        """Raw-int16 time-major assembly (no host conversion): [T, S, 480]
        int16 + counts + reset mask.  Pass `out=(batch, counts, reset)`
        preallocated ([T,S,480] i16 / [S] i32 / [S] u8, all C-contiguous) to
        reuse the buffers across ticks: a fresh batch allocation re-faults
        ~T*S KB of pages every call, measured ~1.8x on the whole host tick
        at S=4096."""
        S = self.n_slots
        if out is None:
            batch = np.empty((t_frames, S, 480), np.int16)
            counts = np.empty(S, np.int32)
            reset = np.empty(S, np.uint8)
        else:
            batch, counts, reset = out
            assert batch.shape == (t_frames, S, 480)
        self._lib.rnnt_pool_assemble_tm_i16(self._p, t_frames, batch,
                                            counts, reset)
        return batch, counts, reset

    def commit_tm_i16(self, t_frames: int, batch: np.ndarray,
                      counts: np.ndarray) -> None:
        self._lib.rnnt_pool_commit_tm_i16(
            self._p, t_frames, np.ascontiguousarray(batch, np.int16),
            np.ascontiguousarray(counts, np.int32))


def blob_validate(blob: bytes) -> list[str]:
    """Native DNNw blob validation; returns array names.  Raises on
    malformed blobs (parse_weights parity, src/parse_lpcnet_weights.c)."""
    lib = get_lib()
    names = ct.create_string_buffer(1 << 20)
    n = lib.rnnt_blob_validate(blob, len(blob), names, len(names))
    if n < 0:
        raise ValueError("malformed weights blob")
    out = names.raw.split(b"\x00")
    return [s.decode() for s in out[:n]]
