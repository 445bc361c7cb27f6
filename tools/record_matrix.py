"""Record the full BASELINE config matrix on real TPU hardware.

Produces `results/tpu/v5.txt` (or --out), one section per BASELINE.json
config, rows in the reference's machine-parsable format
`total h2d kernel d2h psnr` (ms; printf at main_mse.cu:255):

  config 1: Foreman F1->F2, full-search SAD, 16x16 +-7   (real frames)
  config 2: Foreman F1->F4, full-search SSD, 16x16 +-15  (real frames)
  config 3: 1080p diamond (LDSP/SDSP) 16x16 +-15 vs full search
            (synthetic slow-motion Beauty stand-in)
  config 4: 4K full-search SSD +-31 at blk 8 / 16 / 32
            (synthetic Jockey stand-in)
  extra   : 4K SSIM 16x16 +-7 (synthetic)

The Jockey/Beauty 4K blobs are stripped from the reference mount
(.MISSING_LARGE_BLOBS), so 4K/1080p rows use deterministic synthetic
stand-ins — their PSNR values are NOT comparable to the reference logs;
only the Foreman rows are (they match the CPU oracle exactly).

Usage: python tools/record_matrix.py [--out results/tpu/v5.txt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def synthetic(name: str, h: int, w: int, shift, noise: int, kron: int = 8):
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    small = rng.integers(0, 256, (h // kron + 2, w // kron + 2)).astype(
        np.float64
    )
    ref = np.clip(
        np.kron(small, np.ones((kron, kron)))[:h, :w]
        + rng.normal(0, 1, (h, w)),
        0, 255,
    ).astype(np.uint8)
    cur = np.clip(
        np.roll(ref, shift, (0, 1)).astype(np.int32)
        + rng.integers(-noise, noise + 1, (h, w)),
        0, 255,
    ).astype(np.uint8)
    return cur, ref


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/tpu/v5.txt")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    from motionestimation_tpu.core.jax_setup import setup_jax

    setup_jax()
    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    ref_dir = "/root/reference/frames"
    f1 = frames_lib.load_yuv(os.path.join(ref_dir, "ForemanYF1.yuv"), 288, 352)
    f2 = frames_lib.load_yuv(os.path.join(ref_dir, "ForemanYF2.yuv"), 288, 352)
    f4 = frames_lib.load_yuv(os.path.join(ref_dir, "ForemanYF4.yuv"), 288, 352)

    beauty_cur, beauty_ref = synthetic(
        "Beauty1080", 1080, 1920, (1, -2), 1, kron=4
    )
    jockey_cur, jockey_ref = synthetic("Jockey4K", 2160, 3840, (4, -6), 5)

    cases = [
        ("config1: Foreman F1->F2, SAD, blk 16, span 7 (real frames)",
         f2, f1, dict(blk_dim=16, span=7, metric="sad")),
        ("config2: Foreman F1->F4, SSD (mse), blk 16, span 15 (real frames)",
         f4, f1, dict(blk_dim=16, span=15, metric="mse")),
        ("config3: synthetic-Beauty 1080p, DIAMOND, blk 16, span 15",
         beauty_cur, beauty_ref,
         dict(blk_dim=16, span=15, metric="mse", algorithm="diamond")),
        ("config3-ref: synthetic-Beauty 1080p, full search, blk 16, span 15",
         beauty_cur, beauty_ref, dict(blk_dim=16, span=15, metric="mse")),
        ("config4: synthetic-Jockey 4K, SSD, blk 8, span 31",
         jockey_cur, jockey_ref, dict(blk_dim=8, span=31, metric="mse")),
        ("config4: synthetic-Jockey 4K, SSD, blk 16, span 31",
         jockey_cur, jockey_ref, dict(blk_dim=16, span=31, metric="mse")),
        ("config4: synthetic-Jockey 4K, SSD, blk 32, span 31",
         jockey_cur, jockey_ref, dict(blk_dim=32, span=31, metric="mse")),
        ("ssim: synthetic-Jockey 4K, SSIM, blk 16, span 7",
         jockey_cur, jockey_ref, dict(blk_dim=16, span=7, metric="ssim")),
    ]

    lines = [
        "# TPU v5e, single chip. Rows: total h2d kernel d2h psnr"
        " (ms; reference printf format, main_mse.cu:255).",
        "# 4K/1080p sequences are DETERMINISTIC SYNTHETIC STAND-INS"
        " (Jockey/Beauty blobs stripped upstream, .MISSING_LARGE_BLOBS):",
        "# their PSNRs are NOT comparable to the reference result logs."
        " Foreman rows use the real bundled frames.",
        "# Phase fences on this host cost one ~30 ms tunnel round trip"
        " each, inflating total/h2d/d2h vs local-PCIe hardware;",
        "# `kernel` is the honest per-frame search time.",
    ]
    for label, cur, ref, kw in cases:
        h, w = cur.shape
        config = SearchConfig(frame_height=h, frame_width=w, **kw)
        best = None
        for _ in range(max(1, args.repeats)):
            res = runner.run_pair(cur, ref, config)
            if best is None or res.kernel_ms < best.kernel_ms:
                best = res
        lines.append(f"[ {label} ]")
        lines.append(best.timing_row)
        print(f"{label}\n  {best.timing_row}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
