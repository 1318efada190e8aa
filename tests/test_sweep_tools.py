"""Behavioral tests of the RIR measurement tools (tools/sweep.py,
tools/rir_deconv.py): a synthetic room recording must deconvolve back to
the room's true impulse response.  (Role parity with the reference's
scripts/sweep.py + scripts/rir_deconv.py — same task, original method.)"""

import numpy as np
import pytest

from rnnoise_tpu.tools.sweep import (SweepSpec, exp_sweep, inverse_filter,
                                     measurement_sequence, pilot_chirp)
from rnnoise_tpu.tools.rir_deconv import (extract_sweep_segment,
                                          locate_pilots, measure_rir)

SPEC = SweepSpec(duration=4.0, gap=0.5, pilot_duration=0.25)


def _room_rir(fs: int, rng) -> np.ndarray:
    """Sparse early reflections + exponentially decaying diffuse tail."""
    n = int(0.25 * fs)
    h = np.zeros(n)
    h[0] = 1.0
    for pos, amp in ((int(0.004 * fs), 0.6), (int(0.011 * fs), -0.35),
                     (int(0.019 * fs), 0.25)):
        h[pos] = amp
    t = np.arange(n) / fs
    h += 0.05 * rng.standard_normal(n) * np.exp(-t / 0.05)
    return h


def _record(seq16: np.ndarray, h: np.ndarray, rng, delay: int = 3000,
            noise: float = 1e-4) -> np.ndarray:
    from scipy.signal import fftconvolve
    x = seq16.astype(np.float64) / 32768.0
    y = fftconvolve(x, h)
    y = np.concatenate([np.zeros(delay), y, np.zeros(4800)])
    return y + noise * rng.standard_normal(len(y))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_inverse_filter_compresses_sweep_to_impulse():
    from scipy.signal import fftconvolve
    x = exp_sweep(SPEC)
    d = fftconvolve(x, inverse_filter(SPEC))
    peak = np.argmax(np.abs(d))
    assert peak == SPEC.sweep_len - 1           # impulse lands at lag N-1
    # sidelobe rejection: everything half a pilot away is far below the peak
    guard = SPEC.pilot_len // 2
    side = np.abs(np.concatenate([d[:peak - guard], d[peak + guard:]])).max()
    assert side < 0.01 * np.abs(d[peak])


def test_locate_pilots_finds_both(rng):
    h = _room_rir(SPEC.fs, rng)
    y = _record(measurement_sequence(SPEC), h, rng, delay=1234)
    p1, p2 = locate_pilots(y, SPEC)
    assert abs((p2 - p1) - SPEC.pilot_spacing) <= 2
    assert abs(p1 - (1234 + SPEC.gap_len)) <= 2


def test_measured_rir_matches_room(rng):
    h = _room_rir(SPEC.fs, rng)
    y = _record(measurement_sequence(SPEC), h, rng)
    rir = measure_rir(y, SPEC)

    href = h / np.sqrt(np.sum(h ** 2))
    n = min(len(rir), len(href))
    assert n > int(0.01 * SPEC.fs)          # early reflections retained
    corr = np.dot(rir[:n], href[:n])        # both unit-energy
    assert corr > 0.97, corr
    # direct path and the three early reflections recovered at right lags
    a = np.abs(rir)
    assert np.argmax(a) == 0
    for pos in (int(0.004 * SPEC.fs), int(0.011 * SPEC.fs)):
        assert a[pos] > 5 * np.median(a), pos


def test_drift_compensation(rng):
    """A recording whose clock runs 0.05% slow (126 samples over the
    session) still deconvolves to a compact RIR with the room's echo
    structure.  The linear-rate correction leaves a fractional-sample
    delay, so assert on the echo lags/envelope rather than sample-exact
    correlation."""
    from scipy.signal import resample
    h = _room_rir(SPEC.fs, rng)
    y = _record(measurement_sequence(SPEC), h, rng)
    y_drift = resample(y, int(round(len(y) * 1.0005)))
    seg = extract_sweep_segment(y_drift, SPEC)
    assert seg is not None
    rir = measure_rir(y_drift, SPEC)
    a = np.abs(rir)
    direct = int(np.argmax(a))
    assert direct < 64                              # compact onset (sinc pre-ring)
    # the 4 ms and 11 ms reflections survive, within +-2 samples
    for lag_s, min_ratio in ((0.004, 0.3), (0.011, 0.15)):
        lag = direct + int(lag_s * SPEC.fs)
        window = a[lag - 2:lag + 3]
        assert window.max() > min_ratio * a[direct], lag_s
    # without drift correction the sweep is torn: uncorrected deconvolution
    # smears the direct path below 25% of the corrected one
    assert a[direct] > 0.3
