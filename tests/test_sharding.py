"""Mesh-sharded execution on the 8-virtual-device CPU mesh: the sharded
processor and training step produce the same results as unsharded runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnoise_tpu.config import FRAME_SIZE, RuntimeConfig

from tests.conftest import speechlike


@pytest.fixture(scope="module")
def mesh():
    from rnnoise_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_inference_matches_unsharded(mesh, model_params):
    from rnnoise_tpu.parallel.sharding import (make_sharded_processor,
                                               shard_params, shard_state,
                                               sharded_init_state,
                                               stream_sharding)
    from rnnoise_tpu.denoise import init_state, process_frames

    S, T = 16, 6
    rng = np.random.default_rng(0)
    pcm = np.stack([
        speechlike(np.random.default_rng(i), T * FRAME_SIZE).reshape(
            T, FRAME_SIZE) for i in range(S)])

    sp = shard_params(model_params, mesh)
    run = make_sharded_processor(sp, mesh)
    st = sharded_init_state(S, mesh)
    pcm_dev = jax.device_put(jnp.asarray(pcm), stream_sharding(mesh))
    st, out_sharded, vad_sharded = run(st, pcm_dev)

    st0 = init_state(S)
    _, out_ref, vad_ref = process_frames(model_params, st0, jnp.asarray(pcm))

    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_ref),
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(vad_sharded), np.asarray(vad_ref),
                               atol=1e-4)
    # outputs actually live sharded over the mesh
    assert len(out_sharded.sharding.device_set) == 8


def test_sharded_train_step_matches_unsharded(mesh, rng):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rnnoise_tpu.training.model import init_params
    from rnnoise_tpu.training.train import make_optimizer, make_train_step
    from rnnoise_tpu.config import ModelConfig

    cfg = ModelConfig(cond_size=32, gru_size=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    B, T = 8, 24
    batch_np = (rng.normal(0, 1.5, (B, T, 65)).astype(np.float32),
                rng.uniform(0, 1, (B, T, 32)).astype(np.float32),
                rng.uniform(0, 1, (B, T, 1)).astype(np.float32))
    N = cfg.gru_size

    def run(step_fn, put):
        # deep-copy: the train step donates its params/opt-state buffers
        p = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
        o = opt.init(p)
        states = tuple(put(jnp.zeros((B, N), jnp.float32)) for _ in range(3))
        batch = tuple(put(jnp.asarray(a)) for a in batch_np)
        p, o, states, m = step_fn(p, o, states, batch,
                                  jnp.asarray(0, jnp.int32))
        return p, m

    p_ref, m_ref = run(make_train_step(opt), lambda x: x)
    bsh = NamedSharding(mesh, P("streams"))
    p_sh, m_sh = run(make_train_step(opt, mesh=mesh),
                     lambda x: jax.device_put(x, bsh))

    assert abs(float(m_ref["loss"]) - float(m_sh["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dryrun_multichip_driver_invocation():
    """Invoke __graft_entry__.dryrun_multichip exactly as the driver does:
    a fresh process with NO JAX env pre-set (round-1 regression: the dryrun
    depended on the caller exporting JAX_PLATFORMS/XLA_FLAGS and crashed when
    the driver called it with a clean environment — MULTICHIP_r01.json)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import __graft_entry__\n"
            "__graft_entry__.dryrun_multichip(8)\n"
            "print('DRYRUN_OK')\n" % repo)
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "DRYRUN_OK" in res.stdout


def test_monokernel_sharded_composition(mesh, model_params):
    """The whole-frame monokernel composes with shard_map over the stream
    axis: each device runs the kernel (interpret mode off-TPU) on its local
    stream shard, matching the unsharded kernel bitwise.  This is the SPMD
    shape of the production TPU path (per-device S_local blocks)."""
    from jax.sharding import PartitionSpec as P
    from rnnoise_tpu.denoise import init_state
    from rnnoise_tpu.dsp import pallas_frame as pf
    from rnnoise_tpu.dsp import pallas_spectral as ps
    from rnnoise_tpu.nn.pallas_rnn import pack_params

    S, T, block = 16, 3, 2
    rng = np.random.default_rng(7)
    pcm = jnp.asarray(
        2000 * rng.standard_normal((T, S, FRAME_SIZE)), jnp.float32)
    weights = pack_params(model_params)
    state = init_state(S)._replace(
        delayed_X=jnp.zeros((S, 2 * ps.PERM_WIDTH)),
        delayed_P=jnp.zeros((S, 2 * ps.PERM_WIDTH)))

    run_local = lambda st, x: pf.process_chunk_monokernel(
        st, x, weights, block=block, interpret=True)
    sharded = jax.shard_map(
        run_local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("streams"), state),
                  P(None, "streams", None)),
        out_specs=(jax.tree.map(lambda _: P("streams"), state),
                   P(None, "streams", None), P(None, "streams")),
        # pallas_call out_shapes carry no vma annotation
        check_vma=False)
    st_s, out_s, vad_s = sharded(state, pcm)
    st_u, out_u, vad_u = run_local(state, pcm)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(vad_s), np.asarray(vad_u))
    assert len(out_s.sharding.device_set) == 8
