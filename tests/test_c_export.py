"""Compile our emitted rnnoise_data.c against the reference tree and check the
resulting weights blob is byte-identical to our direct blob export."""

import os
import subprocess

import pytest

from rnnoise_tpu.tools.import_torch import load_torch_checkpoint
from rnnoise_tpu.training.c_export import emit_c
from rnnoise_tpu.training.export import export_blob

from tests.oracle import build as oracle_build

REF_SRC = "/root/reference/src"
REF_INC = "/root/reference/include"


def test_emitted_c_compiles_and_matches_blob(tmp_path):
    params = load_torch_checkpoint(
        os.path.join(oracle_build.build(), "oracle_model.pth"))
    emit_c(params, str(tmp_path))

    exe = str(tmp_path / "dump_weights_blob")
    subprocess.run(
        ["gcc", "-o", exe, "-DDUMP_BINARY_WEIGHTS",
         "-O1", "-U__SSE2__", "-U__AVX__",
         "-I" + str(tmp_path), "-I" + REF_SRC, "-I" + REF_INC,
         os.path.join(REF_SRC, "write_weights.c"), "-lm"],
        check=True)
    subprocess.run([exe], cwd=tmp_path, check=True)

    with open(tmp_path / "weights_blob.bin", "rb") as f:
        c_blob = f.read()
    ours = export_blob(params, quantize=True)
    assert c_blob == ours
