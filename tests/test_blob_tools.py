"""Blob tool tests: shrink_model, dump_tables, blob round trip."""

import io
import numpy as np
import pytest

from rnnoise_tpu.weights.blob import parse_weights, write_weights


def test_blob_roundtrip(weights_blob):
    arrays = parse_weights(weights_blob)
    out = write_weights(list(arrays.values()))
    assert out == weights_blob


def test_shrink_model_loads_everywhere(weights_blob, oracle_int8, rng):
    from rnnoise_tpu.tools.shrink_model import shrink
    from rnnoise_tpu.weights.loader import load_model_bytes
    small = shrink(weights_blob)
    assert len(small) < len(weights_blob)
    params = load_model_bytes(small)          # our loader
    st = oracle_int8.create_state(small)      # C runtime
    out, vad = st.process_frame(np.zeros(480, np.float32))
    assert np.isfinite(out).all()


def test_dump_tables(tmp_path):
    from rnnoise_tpu.tools import dump_tables
    import sys
    path = str(tmp_path / "t.npz")
    old = sys.argv
    sys.argv = ["dump_tables", path]
    try:
        dump_tables.main()
    finally:
        sys.argv = old
    data = np.load(path)
    assert data["band_matrix"].shape == (32, 481)
    assert data["dct_matrix"].shape == (32, 32)


def test_registered_artifact_loads_and_pins():
    from rnnoise_tpu.weights import registry
    manifest = registry.read_manifest()
    assert "rnnoise_synth_v1.blob" in manifest
    params = registry.load_registered("rnnoise_synth_v1.blob")
    assert params.gru1_input.weights_q is not None
    # sparsity actually present (reference-style densities)
    wq = np.asarray(params.gru1_recurrent.weights_q)
    blocks = wq.reshape(96, 4, 144, 8)
    density = (np.abs(blocks).sum(axis=(1, 3)) > 0).mean()
    assert 0.2 < density < 0.55, density
