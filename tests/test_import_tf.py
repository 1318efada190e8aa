"""TF-side weight exchange (tools/import_tf.py): Keras .h5 checkpoints ->
training-params pytree, mirroring the reference's
torch/weight-exchange/wexchange/tf/tf.py surface without needing TensorFlow.

The test builds a Keras-layout h5 from a seeded params pytree by inverting
the documented mapping (z,r,h gate order kept; conv kernel [k, in, out];
reset_after bias [2, 3N]) and checks the importer restores it exactly.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rnnoise_tpu.config import ModelConfig
from rnnoise_tpu.tools.import_tf import (load_keras_checkpoint,
                                         params_from_keras_h5)

CFG = ModelConfig(cond_size=32, gru_size=64)


def _seed_params():
    import jax
    from rnnoise_tpu.training.model import init_params
    params = init_params(jax.random.PRNGKey(7), CFG)
    return jax.tree.map(lambda a: np.asarray(a, np.float32), params)


def _write_keras_h5(path, params, k=3):
    """Inverse of the importer's mapping: params pytree -> Keras .h5."""
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def layer(name, arrays):
            g = mw.create_group(name).create_group(name)
            for n, a in arrays:
                g.create_dataset(n, data=a)
            g.attrs["weight_names"] = np.array(
                [f"{name}/{n}".encode() for n, _ in arrays])

        for name in ("conv1", "conv2"):
            w, b = params[name]["w"], params[name]["b"]
            layer(name, [("kernel:0", w.reshape(k, -1, w.shape[-1])),
                         ("bias:0", b)])
        for name in ("gru1", "gru2", "gru3"):
            p = params[name]
            layer(name, [("kernel:0", p["w_in"]),
                         ("recurrent_kernel:0", p["w_rec"]),
                         ("bias:0", np.stack([p["b_in"], p["b_rec"]]))])
        for name in ("dense_out", "vad_dense"):
            layer(name, [("kernel:0", params[name]["w"]),
                         ("bias:0", params[name]["b"])])


def test_keras_h5_round_trip(tmp_path):
    import jax
    params = _seed_params()
    path = str(tmp_path / "model.h5")
    _write_keras_h5(path, params)
    got = load_keras_checkpoint(path)
    assert jax.tree.structure(got) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, b)


def test_keras_h5_blob_export_matches_direct(tmp_path):
    """CLI surface: the imported params export to a byte-identical blob."""
    from rnnoise_tpu.training.export import export_blob
    params = _seed_params()
    path = str(tmp_path / "model.h5")
    _write_keras_h5(path, params)
    assert export_blob(load_keras_checkpoint(path)) == export_blob(params)


def test_keras_h5_rejects_non_reset_after(tmp_path):
    params = _seed_params()
    path = str(tmp_path / "bad.h5")
    _write_keras_h5(path, params)
    with h5py.File(path, "r+") as f:
        g = f["model_weights"]["gru1"]["gru1"]
        bias = np.asarray(g["bias:0"])[0]        # collapse to [3N]
        del g["bias:0"]
        g.create_dataset("bias:0", data=bias)
    with h5py.File(path, "r") as f:
        with pytest.raises(ValueError, match="reset_after"):
            params_from_keras_h5(f)


def test_keras_h5_missing_layer_message(tmp_path):
    path = str(tmp_path / "empty.h5")
    with h5py.File(path, "w") as f:
        f.create_group("model_weights")
    with h5py.File(path, "r") as f:
        with pytest.raises(KeyError, match="conv1"):
            params_from_keras_h5(f)
