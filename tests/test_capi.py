"""C ABI shim round trip: build librnnoise_tpu_capi.so + a C client, drive
raw PCM through it, and check the result matches the Python API bit-for-bit
(up to the int16 rounding done by the C client).

Covers the reference's primary deliverable surface (include/rnnoise.h:57-125)
— rnnoise_create / process_frame / destroy and the model loaders."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(REPO, "native", "librnnoise_tpu_capi.so")
DEMO = os.path.join(REPO, "native", "_build_capi_demo")


def _build():
    subprocess.run([os.path.join(REPO, "scripts", "build_capi.sh")],
                   check=True, env={**os.environ, "PYTHON": sys.executable})
    subprocess.run(
        ["gcc", "-O2", "-o", DEMO, os.path.join(REPO, "native", "capi_demo.c"),
         "-I" + os.path.join(REPO, "native"),
         "-L" + os.path.join(REPO, "native"),
         "-Wl,-rpath," + os.path.join(REPO, "native"),
         "-lrnnoise_tpu_capi"], check=True)


@pytest.fixture(scope="module")
def capi_demo():
    _build()
    return DEMO


@pytest.mark.slow
def test_capi_matches_python_api(capi_demo, tmp_path, weights_blob):
    rng = np.random.default_rng(3)
    n_frames = 20
    pcm = (2500 * rng.standard_normal(480 * n_frames)).astype(np.int16)
    blob_path = tmp_path / "model.blob"
    blob_path.write_bytes(weights_blob)
    in_path = tmp_path / "in.pcm"
    pcm.tofile(in_path)

    # C client (subprocess gets a clean env: it must bootstrap Python itself)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [capi_demo, str(blob_path)], stdin=open(in_path, "rb"),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, timeout=600)
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    out_c = np.frombuffer(res.stdout, np.int16)
    vads_c = [float(l.split()[1]) for l in res.stderr.decode().splitlines()
              if l.startswith("vad ")]
    assert len(out_c) == 480 * n_frames and len(vads_c) == n_frames

    # Python reference path, same model, same PCM
    from rnnoise_tpu.api import RNNoise, StreamDenoiser
    den = StreamDenoiser(1, RNNoise.from_buffer(weights_blob))
    outs, vads = [], []
    for f in range(n_frames):
        o, v = den.process_frame(
            pcm[f * 480:(f + 1) * 480].astype(np.float32)[None])
        outs.append(np.asarray(o)[0])
        vads.append(float(np.asarray(v)[0]))
    out_py = np.clip(np.round(np.concatenate(outs)), -32768, 32767)

    np.testing.assert_allclose(vads_c, vads, atol=1e-5)
    # C client rounds half-away-from-zero, np.round rounds half-to-even:
    # allow 1 LSB on exact .5 boundaries
    assert np.abs(out_c - out_py).max() <= 1
