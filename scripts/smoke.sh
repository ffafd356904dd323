#!/bin/bash
# Pre-commit smoke for engine refactors — the window that shipped a
# broken flagship config in round 4 (the d2 words-schema refactor
# landed in an end-of-round snapshot without re-running its bench).
#
# Runs the two configs that exercise the scale regimes unit tests
# cannot reach cheaply:
#   d2_100k  — the tile-pair scan past the int32-overflow regime
#              (>= 64k amplicons at the serving tile)
#   d1_1m    — the headline join, shrunk to 128k rows for speed
#
# Expects a TPU (or any JAX backend) and builds the reference binary.
# ~3-5 minutes warm. Every config must report "parity": true.
set -euo pipefail
cd "$(dirname "$0")/.."
SWARM_TPU_BENCH_CONFIGS=d1_1m,d2_100k \
SWARM_TPU_BENCH_N="${SWARM_TPU_BENCH_N:-131072}" \
python bench.py
