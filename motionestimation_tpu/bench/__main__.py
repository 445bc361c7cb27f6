"""Versioned benchmark runner: `python -m motionestimation_tpu.bench`.

Mirrors the reference harness CLI (/root/reference/src/gpu/run.sh:12-32):

    python -m motionestimation_tpu.bench -v 2 -b 8 -s 12 \
        [--results-dir results] [--backend auto] [--metric mse]

Runs the reference's three benchmark sequences — Foreman CIF (bundled)
and Jockey/Beauty 4K (stripped from the mount per .MISSING_LARGE_BLOBS;
deterministic synthetic 4K stand-ins are generated in their place) —
appends one `total h2d kernel d2h psnr` row per sequence to
`<results-dir>/v{N}.txt`, and epsilon-compares against v{N-1}
(run.sh:74-96): timings worse by >0.1 ms or PSNR worse by >0.5 dB are
reported as regressions (exit code 1).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from motionestimation_tpu.bench import regression
from motionestimation_tpu.core import frames as frames_lib
from motionestimation_tpu.core.config import SearchConfig
from motionestimation_tpu.pipeline import runner

REF_FRAMES = "/root/reference/frames"
SEQUENCES = ("Foreman", "Jockey", "Beauty")


def _synthetic_4k(name: str):
    """Deterministic 4K stand-in for a stripped sequence: smooth random
    reference, globally shifted + noisy current."""
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    h, w = 2160, 3840
    small = rng.integers(0, 256, (h // 16 + 2, w // 16 + 2)).astype(
        np.float64
    )
    ref = np.clip(
        np.kron(small, np.ones((16, 16)))[:h, :w]
        + rng.normal(0, 3, (h, w)),
        0, 255,
    ).astype(np.uint8)
    cur = np.clip(
        np.roll(ref, (4, -6), (0, 1)).astype(np.int32)
        + rng.integers(-5, 6, (h, w)),
        0, 255,
    ).astype(np.uint8)
    return cur, ref


def load_sequence(name: str):
    """(cur, ref, h, w) for a benchmark sequence."""
    if name == "Foreman":
        cur = frames_lib.load_yuv(
            os.path.join(REF_FRAMES, "ForemanYF4.yuv"), 288, 352
        )
        ref = frames_lib.load_yuv(
            os.path.join(REF_FRAMES, "ForemanYF1.yuv"), 288, 352
        )
        return cur, ref, 288, 352
    f2 = os.path.join(REF_FRAMES, f"{name}YF2.yuv")
    f1 = os.path.join(REF_FRAMES, f"{name}YF1.yuv")
    if os.path.exists(f2) and os.path.exists(f1):
        cur = frames_lib.load_yuv(f2, 2160, 3840)
        ref = frames_lib.load_yuv(f1, 2160, 3840)
    else:
        cur, ref = _synthetic_4k(name)
    return cur, ref, 2160, 3840


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="motionestimation_tpu.bench")
    p.add_argument("-v", "--version", type=int, required=True)
    p.add_argument(
        "--matrix", action="store_true",
        help="record the full sync-amortized kernel matrix (incl. "
        "diamond SAD/blk-32, worst-case, and GOP rows) as "
        "results/tpu/v{N}.txt with tag-wise epsilon comparison "
        "(bench/matrix.py) instead of the per-sequence fenced rows",
    )
    p.add_argument("-b", "--blk-dim", type=int, default=8)
    p.add_argument("-s", "--span", type=int, default=12)
    p.add_argument(
        "--metric", choices=("mse", "sad", "ssim"), default="mse"
    )
    p.add_argument(
        "--algorithm", choices=("full", "diamond"), default="full",
        help="search algorithm (diamond = LDSP/SDSP, BASELINE config 3)",
    )
    p.add_argument(
        "--size", choices=("native", "1080p"), default="native",
        help="1080p crops the 4K sequences to 1920x1080 (config 3)",
    )
    p.add_argument(
        "--backend", choices=("auto", "xla", "pallas"), default="auto"
    )
    p.add_argument("--results-dir", default="results")
    p.add_argument(
        "--sequences", nargs="+", default=list(SEQUENCES),
        choices=SEQUENCES,
    )
    p.add_argument("--repeats", type=int, default=3,
                   help="timed repeats per sequence; best row is recorded")
    args = p.parse_args(argv)

    from motionestimation_tpu.core.jax_setup import setup_jax
    setup_jax()

    if args.matrix:
        from motionestimation_tpu.bench.matrix import run_matrix

        return run_matrix(
            args.version,
            args.results_dir if args.results_dir != "results"
            else os.path.join("results", "tpu"),
        )

    rows = []
    for name in args.sequences:
        print(f"Running on {name}...")
        cur, ref, h, w = load_sequence(name)
        if args.size == "1080p" and (h, w) == (2160, 3840):
            h, w = 1080, 1920
            cur, ref = cur[:h, :w], ref[:h, :w]
        config = SearchConfig(
            blk_dim=args.blk_dim, span=args.span, metric=args.metric,
            algorithm=args.algorithm,
            frame_width=w, frame_height=h,
        )
        best = None
        for _ in range(max(1, args.repeats)):
            res = runner.run_pair(cur, ref, config, backend=args.backend)
            if best is None or res.kernel_ms < best.kernel_ms:
                best = res
        rows.append(
            (
                name,
                (
                    best.total_ms, best.h2d_ms, best.kernel_ms,
                    best.d2h_ms, best.psnr,
                ),
            )
        )
        print(f"  {rows[-1][1][2]:.3f} ms kernel, PSNR {best.psnr:.4f}")

    header = (
        f"[ Version= {args.version}, BlkDim= {args.blk_dim}, "
        f"ExtraSpan={args.span}, Metric= {args.metric}"
        + (f", Algorithm= {args.algorithm}" if args.algorithm != "full"
           else "")
        + (f", Size= {args.size}" if args.size != "native" else "")
        + " ]"
    )
    path = regression.write_results(
        args.results_dir, args.version, header, rows
    )
    print(f"Results -> {path}")

    regs = regression.compare_versions(
        args.results_dir, args.version, [r[0] for r in rows]
    )
    for name in {r.sequence for r in regs}:
        print(f"Regression Testing: {name}")
    for r in regs:
        print(f"  {r}")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
