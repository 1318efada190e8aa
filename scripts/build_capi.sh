#!/bin/sh
# Build the C ABI shim (native/librnnoise_tpu_capi.so) against the Python
# that owns the rnnoise_tpu environment.  The interpreter path and repo root
# are baked in as defaults; override at runtime with RNNOISE_TPU_PYTHON /
# RNNOISE_TPU_REPO.
set -e
cd "$(dirname "$0")/.."

PY=${PYTHON:-$(command -v python3)}
INCLUDES=$($PY -c "import sysconfig; print(sysconfig.get_paths()['include'])")
LIBDIR=$($PY -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
VER=$($PY -c "import sysconfig; print(sysconfig.get_config_var('LDVERSION'))")

g++ -O2 -shared -fPIC -o native/librnnoise_tpu_capi.so \
    native/rnnoise_capi.cc \
    -I"$INCLUDES" \
    -DRNNOISE_TPU_DEFAULT_PYTHON="\"$PY\"" \
    -DRNNOISE_TPU_DEFAULT_REPO="\"$(pwd)\"" \
    -L"$LIBDIR" -Wl,-rpath,"$LIBDIR" -lpython"$VER"

echo "built native/librnnoise_tpu_capi.so (python $VER)"
