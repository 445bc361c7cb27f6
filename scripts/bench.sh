#!/usr/bin/env bash
# Versioned benchmark harness, mirroring the reference's src/gpu/run.sh:
#   scripts/bench.sh -v <version> [-b blkDim] [-s extraSpan]
set -e
cd "$(dirname "$0")/.."
python -m motionestimation_tpu.bench "$@" --results-dir results/tpu
