"""Model artifact registry — the framework's analogue of the reference's
pinned model distribution (download_model.sh + model_version: artifacts are
fetched out-of-band and verified by sha256 before use).

Artifacts live in ``models/`` as ``<name>.blob`` with a ``models/MODELS``
manifest of ``<sha256>  <name>.blob`` lines.  ``load_registered`` refuses
blobs whose digest does not match the manifest (the reference's tar.gz
sha256 pin, download_model.sh:4-31).
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

from ..config import DEFAULT_MODEL, ModelConfig
from .loader import load_model_bytes

MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "models")
MANIFEST = os.path.join(MODELS_DIR, "MODELS")


def read_manifest() -> Dict[str, str]:
    out = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    digest, name = line.split(None, 1)
                    out[name.strip()] = digest
    return out


def register(name: str, blob: bytes) -> str:
    os.makedirs(MODELS_DIR, exist_ok=True)
    path = os.path.join(MODELS_DIR, name)
    with open(path, "wb") as f:
        f.write(blob)
    digest = hashlib.sha256(blob).hexdigest()
    manifest = read_manifest()
    manifest[name] = digest
    with open(MANIFEST, "w") as f:
        f.write("# sha256  artifact\n")
        for n, d in sorted(manifest.items()):
            f.write(f"{d}  {n}\n")
    return digest


def load_registered(name: str, config: ModelConfig = DEFAULT_MODEL):
    manifest = read_manifest()
    if name not in manifest:
        raise KeyError(f"model {name!r} not in {MANIFEST}")
    path = os.path.join(MODELS_DIR, name)
    with open(path, "rb") as f:
        blob = f.read()
    digest = hashlib.sha256(blob).hexdigest()
    if digest != manifest[name]:
        raise ValueError(f"sha256 mismatch for {name}: {digest} != "
                         f"{manifest[name]}")
    return load_model_bytes(blob, config)
