#!/usr/bin/env bash
# Headline benchmark on the real TPU chip (driver entry): one JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
