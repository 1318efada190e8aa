#!/bin/sh
# CI entry point (the reference uses a gcc/clang build matrix with
# make check/distcheck, .gitlab-ci.yml; ours runs the golden parity suite on
# a virtual 8-device CPU mesh plus the multi-chip dry run and a bench smoke).
set -e
cd "$(dirname "$0")/.."

python -m pytest tests/ -q

JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python - <<'EOF'
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as ge
fn, args = ge.entry()
jax.block_until_ready(jax.jit(fn)(*args))
ge.dryrun_multichip(8)
print("entry + dryrun_multichip OK")
EOF
