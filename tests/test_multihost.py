"""Two-OS-process multi-host proof: the stream-sharded denoiser runs over a
global mesh assembled from per-process local devices, each process feeding
only its local audio, in lock-step with a single-process run.

(The reference has no distributed anything — SURVEY.md §2.9; this validates
the DCN story claimed in parallel/sharding.py + parallel/multihost.py.)"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from rnnoise_tpu.parallel import multihost as mh
from rnnoise_tpu.parallel.sharding import make_sharded_processor
from rnnoise_tpu.denoise import init_state, process_frames

mh.init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

S, T = 16, 3
rng = np.random.default_rng(0)
pcm_full = (1000 * rng.standard_normal((S, T, 480))).astype(np.float32)

mesh = mh.global_stream_mesh()
sl = mh.process_stream_slice(S)
state_g = mh.tree_from_host_local(init_state(sl.stop - sl.start), mesh)
pcm_g = mh.streams_from_host_local(pcm_full[sl], mesh)
run = make_sharded_processor(None, mesh)          # DSP path, unity gains
_, out_g, vad_g = run(state_g, pcm_g)
mine = mh.host_local_output(out_g)

# single-process reference on the full batch
_, out_ref, _ = jax.jit(lambda st, p: process_frames(None, st, p))(
    init_state(S), pcm_full)
ref = np.asarray(out_ref)[sl]
# per-shard matmul tiling reassociates f32 sums; stay well under 1 LSB of
# the int16 scale
np.testing.assert_allclose(mine, ref, rtol=0, atol=0.05)
print(f"proc{pid} OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_stream_sharding(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out, out
