#!/usr/bin/env bash
# Foreman MSE one-liner, mirroring the reference's src/cpu/run.sh.
set -e
cd "$(dirname "$0")/.."
python -m motionestimation_tpu.cli \
  /root/reference/frames/ForemanYF4.yuv /root/reference/frames/ForemanYF1.yuv \
  "${1:-results/cpu/foreman}" "${2:-8}" "${3:-12}" 352 288
