#!/usr/bin/env bash
# Run the slow test tier the only way it runs reliably: per-file.
#
# XLA:CPU segfaults when one process compiles many of the largest
# 8-device shard_map executables back-to-back, and jax's persistent
# compile-cache WRITE path (zstandard compress of multi-GB serialized
# executables) segfaults on the biggest ones — so each file gets its own
# process and the cache is disabled (ZKTPU_TEST_CACHE_DIR=none, see
# tests/conftest.py).  Exits nonzero on the first failing file.
#
# Usage: scripts/run_slow_tier.sh [extra pytest args]

set -u
cd "$(dirname "$0")/.."

export ZKTPU_TEST_CACHE_DIR="${ZKTPU_TEST_CACHE_DIR:-none}"

fail=0
total_pass=0
for f in tests/test_*.py; do
    n=$(python -m pytest "$f" -m slow --collect-only -q 2>/dev/null \
        | grep -c '::') || true
    if [ "${n:-0}" -eq 0 ]; then
        continue
    fi
    echo "== $f ($n slow tests)"
    if ! timeout 5400 python -m pytest "$f" -m slow -q "$@"; then
        echo "FAILED: $f"
        fail=1
        break
    fi
    total_pass=$((total_pass + n))
done

if [ "$fail" -ne 0 ]; then
    echo "slow tier: FAILED"
    exit 1
fi
echo "slow tier: all $total_pass tests green (per-file)"
