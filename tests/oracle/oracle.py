"""ctypes wrapper around the reference C oracle (see build.py)."""

from __future__ import annotations

import ctypes as ct
import os

import numpy as np

from . import build as build_mod

FRAME_SIZE = 480
WINDOW_SIZE = 960
FREQ_SIZE = 481
NB_BANDS = 32
NB_FEATURES = 65
PITCH_BUF_SIZE = 1728

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


class Oracle:
    def __init__(self, lib_path: str):
        lib = ct.CDLL(lib_path)
        self._lib = lib
        for name, res, args in [
            ("oracle_forward_transform", None, [_f32p, _f32p]),
            ("oracle_inverse_transform", None, [_f32p, _f32p]),
            ("oracle_apply_window", None, [_f32p]),
            ("oracle_band_energy", None, [_f32p, _f32p]),
            ("oracle_band_corr", None, [_f32p, _f32p, _f32p]),
            ("oracle_interp_band_gain", None, [_f32p, _f32p]),
            ("oracle_dct", None, [_f32p, _f32p]),
            ("oracle_pitch_downsample", None, [_f32p, _f32p]),
            ("oracle_pitch_search", ct.c_int, [_f32p]),
            ("oracle_remove_doubling", ct.c_float,
             [_f32p, ct.POINTER(ct.c_int), ct.c_int, ct.c_float]),
            ("oracle_state_size", ct.c_int, []),
            ("oracle_pitch_buf", ct.POINTER(ct.c_float), [ct.c_void_p]),
            ("oracle_last_period", ct.c_int, [ct.c_void_p]),
            ("oracle_last_gain", ct.c_float, [ct.c_void_p]),
            ("oracle_frame_features", ct.c_int,
             [ct.c_void_p, _f32p, _f32p, _f32p, _f32p, _f32p, _f32p, _f32p]),
            ("oracle_compute_rnn", None, [ct.c_void_p, _f32p, _f32p, _f32p]),
            ("oracle_pitch_filter", None,
             [_f32p, _f32p, _f32p, _f32p, _f32p, _f32p]),
            ("oracle_compute_activation", None,
             [_f32p, _f32p, ct.c_int, ct.c_int]),
            ("rnn_biquad", None,
             [_f32p, _f32p, _f32p, _f32p, _f32p, ct.c_int]),
            ("rnnoise_model_from_buffer", ct.c_void_p,
             [ct.c_char_p, ct.c_int]),
            ("rnnoise_model_free", None, [ct.c_void_p]),
            ("rnnoise_create", ct.c_void_p, [ct.c_void_p]),
            ("rnnoise_destroy", None, [ct.c_void_p]),
            ("rnnoise_init", ct.c_int, [ct.c_void_p, ct.c_void_p]),
            ("rnnoise_process_frame", ct.c_float, [ct.c_void_p, _f32p, _f32p]),
        ]:
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = args

    # -- stateless helpers -------------------------------------------------
    def forward_transform(self, x960: np.ndarray) -> np.ndarray:
        out = np.zeros(2 * FREQ_SIZE, np.float32)
        self._lib.oracle_forward_transform(out, np.ascontiguousarray(x960, np.float32))
        return out[0::2] + 1j * out[1::2]

    def inverse_transform(self, X: np.ndarray) -> np.ndarray:
        ri = np.zeros(2 * FREQ_SIZE, np.float32)
        ri[0::2], ri[1::2] = X.real, X.imag
        out = np.zeros(WINDOW_SIZE, np.float32)
        self._lib.oracle_inverse_transform(out, ri.astype(np.float32))
        return out

    def apply_window(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32).copy()
        self._lib.oracle_apply_window(x)
        return x

    def band_energy(self, X: np.ndarray) -> np.ndarray:
        ri = np.zeros(2 * FREQ_SIZE, np.float32)
        ri[0::2], ri[1::2] = X.real, X.imag
        out = np.zeros(NB_BANDS, np.float32)
        self._lib.oracle_band_energy(out, ri)
        return out

    def band_corr(self, X: np.ndarray, P: np.ndarray) -> np.ndarray:
        xri = np.zeros(2 * FREQ_SIZE, np.float32)
        pri = np.zeros(2 * FREQ_SIZE, np.float32)
        xri[0::2], xri[1::2] = X.real, X.imag
        pri[0::2], pri[1::2] = P.real, P.imag
        out = np.zeros(NB_BANDS, np.float32)
        self._lib.oracle_band_corr(out, xri, pri)
        return out

    def interp_band_gain(self, bandE: np.ndarray) -> np.ndarray:
        g = np.zeros(FREQ_SIZE, np.float32)
        self._lib.oracle_interp_band_gain(g, np.ascontiguousarray(bandE, np.float32))
        return g

    def dct(self, x: np.ndarray) -> np.ndarray:
        out = np.zeros(NB_BANDS, np.float32)
        self._lib.oracle_dct(out, np.ascontiguousarray(x, np.float32))
        return out

    def pitch_downsample(self, buf: np.ndarray) -> np.ndarray:
        out = np.zeros(PITCH_BUF_SIZE // 2, np.float32)
        self._lib.oracle_pitch_downsample(
            np.ascontiguousarray(buf, np.float32), out)
        return out

    def pitch_search(self, ds: np.ndarray) -> int:
        return self._lib.oracle_pitch_search(np.ascontiguousarray(ds, np.float32))

    def remove_doubling(self, ds, t0, prev_period, prev_gain):
        t = ct.c_int(int(t0))
        g = self._lib.oracle_remove_doubling(
            np.ascontiguousarray(ds, np.float32), ct.byref(t),
            int(prev_period), float(prev_gain))
        return int(t.value), float(g)

    def biquad(self, x, mem, b, a):
        y = np.zeros_like(x, dtype=np.float32)
        mem = np.ascontiguousarray(mem, np.float32).copy()
        self._lib.rnn_biquad(y, mem, np.ascontiguousarray(x, np.float32),
                             np.ascontiguousarray(b, np.float32),
                             np.ascontiguousarray(a, np.float32), len(x))
        return y, mem

    def pitch_filter(self, X, P, Ex, Ep, Exp, g):
        xri = np.zeros(2 * FREQ_SIZE, np.float32)
        pri = np.zeros(2 * FREQ_SIZE, np.float32)
        xri[0::2], xri[1::2] = X.real, X.imag
        pri[0::2], pri[1::2] = P.real, P.imag
        self._lib.oracle_pitch_filter(
            xri, pri,
            np.ascontiguousarray(Ex, np.float32),
            np.ascontiguousarray(Ep, np.float32),
            np.ascontiguousarray(Exp, np.float32),
            np.ascontiguousarray(g, np.float32))
        return xri[0::2] + 1j * xri[1::2]

    def compute_activation(self, x: np.ndarray, activation: int) -> np.ndarray:
        """compute_activation_c (src/nnet_arch.h:79-125); activation codes
        per src/nnet.h:34-39 (0=linear..5=swish)."""
        x = np.ascontiguousarray(x, np.float32)
        out = np.zeros_like(x)
        self._lib.oracle_compute_activation(out, x, len(x), int(activation))
        return out

    # -- stateful oracle stream -------------------------------------------
    def create_state(self, blob: bytes = None) -> "OracleStream":
        """blob: optional weights_blob.bin content — loads the model at
        runtime via rnnoise_model_from_buffer (include/rnnoise.h:98-105)."""
        return OracleStream(self, blob)


class OracleStream:
    """One reference DenoiseState driven through ctypes."""

    def __init__(self, oracle: Oracle, blob: bytes = None):
        self._o = oracle
        self._blob = blob          # borrowed by C; must outlive the state
        self._model = None
        if blob is not None:
            self._model = oracle._lib.rnnoise_model_from_buffer(
                blob, len(blob))
            assert self._model
        self._st = oracle._lib.rnnoise_create(self._model)
        assert self._st

    def __del__(self):
        try:
            self._o._lib.rnnoise_destroy(self._st)
        except Exception:
            pass

    def frame_features(self, x: np.ndarray):
        o = self._o
        Xri = np.zeros(2 * FREQ_SIZE, np.float32)
        Pri = np.zeros(2 * FREQ_SIZE, np.float32)
        Ex = np.zeros(NB_BANDS, np.float32)
        Ep = np.zeros(NB_BANDS, np.float32)
        Exp = np.zeros(NB_BANDS, np.float32)
        feats = np.zeros(NB_FEATURES, np.float32)
        silence = o._lib.oracle_frame_features(
            self._st, Xri, Pri, Ex, Ep, Exp, feats,
            np.ascontiguousarray(x, np.float32))
        return dict(X=Xri[0::2] + 1j * Xri[1::2], P=Pri[0::2] + 1j * Pri[1::2],
                    Ex=Ex, Ep=Ep, Exp=Exp, features=feats,
                    silence=bool(silence),
                    last_period=o._lib.oracle_last_period(self._st),
                    last_gain=o._lib.oracle_last_gain(self._st))

    def compute_rnn(self, features: np.ndarray):
        gains = np.zeros(NB_BANDS, np.float32)
        vad = np.zeros(1, np.float32)
        self._o._lib.oracle_compute_rnn(
            self._st, gains, vad, np.ascontiguousarray(features, np.float32))
        return gains, float(vad[0])

    def process_frame(self, x: np.ndarray):
        out = np.zeros(FRAME_SIZE, np.float32)
        vad = self._o._lib.rnnoise_process_frame(
            self._st, out, np.ascontiguousarray(x, np.float32))
        return out, float(vad)


def get_oracle(variant: str = "int8") -> Oracle:
    build_dir = build_mod.build()
    return Oracle(os.path.join(build_dir, f"liboracle_{variant}.so"))
