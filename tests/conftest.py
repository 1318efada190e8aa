"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding paths compile and execute
without TPU hardware; the same code runs unchanged on real chips.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin registers itself at interpreter start (sitecustomize)
# before env vars are re-read, so force the platform through the config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle_int8():
    from tests.oracle.oracle import get_oracle
    return get_oracle("int8")


@pytest.fixture(scope="session")
def oracle_float():
    from tests.oracle.oracle import get_oracle
    return get_oracle("float")


@pytest.fixture(scope="session")
def weights_blob():
    from tests.oracle import build
    path = os.path.join(build.build(), "weights_blob.bin")
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def model_params(weights_blob):
    from rnnoise_tpu.weights.loader import load_model_bytes
    return load_model_bytes(weights_blob)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def speechlike(rng, n, f0=110.0, fs=48000.0, noise=0.05):
    """Synthetic voiced-speech-like signal: harmonic series + noise, with
    slow amplitude modulation.  Good enough to exercise the pitch tracker."""
    t = np.arange(n) / fs
    sig = np.zeros(n)
    for k in range(1, 12):
        sig += (1.0 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
    sig = sig * am + noise * rng.standard_normal(n)
    return (3000.0 * sig).astype(np.float32)


@pytest.fixture()
def speech_signal(rng):
    return speechlike(rng, 48000)


def pytest_addoption(parser):
    parser.addoption("--regen-golden", action="store_true", default=False,
                     help="regenerate golden regression fixtures")
