"""Log-sine-sweep generation for RIR measurement (reference scripts/sweep.py).

Usage: python -m rnnoise_tpu.tools.sweep out.wav
"""

from __future__ import annotations

import sys

import numpy as np


def compute_sweep(T, Fs=48000, F0=100):
    F1 = Fs // 2
    b = np.log((F1 + F0) / F0) / T
    a = F0 / b
    n = np.arange(int(T * Fs))
    t = n / Fs
    return 0.9 * np.sin(2 * np.pi * a * (np.exp(b * t) - b * t - 1))


def compute_sequence(T, Fs=48000, F0=100):
    pilot = compute_sweep(1, Fs, F0)
    zeros = np.zeros(Fs)
    sine = compute_sweep(T, Fs, F0)
    seq = np.concatenate([zeros, pilot, zeros, sine, zeros, pilot, zeros])
    return np.round(32768 * seq).astype("int16")


def main():
    from scipy.io import wavfile
    wavfile.write(sys.argv[1], 48000, compute_sequence(60))


if __name__ == "__main__":
    main()
