#!/usr/bin/env bash
# Foreman SSIM one-liner, mirroring the reference's src/cpu/run_ssim.sh
# (blk=4 span=15 defaults, run_ssim.sh:4).
set -e
cd "$(dirname "$0")/.."
python -m motionestimation_tpu.cli \
  /root/reference/frames/ForemanYF4.yuv /root/reference/frames/ForemanYF1.yuv \
  "${1:-results/cpu/foreman}" "${2:-4}" "${3:-15}" 352 288 --metric ssim
