#!/usr/bin/env bash
# Build the native runtime, run the test suite, then the MSM self-test.
# Role of the reference's build_scripts/x86_64/run_test.sh (cargo build +
# g++ link + run of librustzcash_run_tests) for the TPU stack.
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
python -m pytest tests/ -x -q
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from zcash_gpu_thesis_tpu.ffi import api
assert api.librustzcash_run_tests(1024)
"
