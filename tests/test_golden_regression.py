"""Golden regression fixtures: outputs of the current oracle-verified
implementation, pinned so future refactors detect unintended numeric drift
instantly (without building the C oracle).

Regenerate (only after re-verifying against the oracle suite):
    python -m pytest tests/test_golden_regression.py --regen-golden
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig
from rnnoise_tpu.denoise import init_state, process_frames

from tests.conftest import speechlike

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "pipeline_v1.npz")


def pytest_addoption(parser):  # pragma: no cover — hook lives in conftest too
    pass


def _compute(model_params):
    rng = np.random.default_rng(2024)
    sig = speechlike(rng, 30 * FRAME_SIZE, f0=135, noise=0.1)
    sig += 800 * rng.standard_normal(sig.shape).astype(np.float32)
    pcm = jnp.asarray(sig.reshape(1, 30, FRAME_SIZE))
    out = {}
    for name, rt in (("int8", RuntimeConfig(quantized=True)),
                     ("float", RuntimeConfig(quantized=False))):
        st = init_state(1)
        _, y, vad = process_frames(model_params, st, pcm, rt)
        out[f"pcm_{name}"] = np.asarray(y)[0]
        out[f"vad_{name}"] = np.asarray(vad)[0]
    return out


def test_golden_pipeline(model_params, request):
    got = _compute(model_params)
    if request.config.getoption("--regen-golden", default=False):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        pytest.skip("golden regenerated")
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        pytest.skip("golden created")
    ref = np.load(GOLDEN)
    for k in ref.files:
        tol = 0.5 if k.startswith("pcm") else 1e-4
        np.testing.assert_allclose(got[k], ref[k], atol=tol, err_msg=k)
