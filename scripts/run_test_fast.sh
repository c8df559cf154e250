#!/usr/bin/env bash
# Fast variant (reference build_scripts/x86_64/run_test_fast.sh): skip the
# slow-marked tests and reuse the persistent XLA compilation cache.
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
JAX_COMPILATION_CACHE_DIR=/tmp/zktpu_jax_cache \
  python -m pytest tests/ -x -q -m "not slow"
