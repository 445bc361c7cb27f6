"""Command-line driver, argv-compatible with the reference binaries.

Positional interface (defaults match the CPU MSE driver,
/root/reference/src/cpu/main.c:109-122):

    python -m motionestimation_tpu.cli <current> <reference> <outdir> \
        [blkDim] [extraSpan] [frameWidth] [frameHeight]

plus keyword options the reference spread over separate binaries and the
getopts wrapper (src/gpu/run.sh:12-32):

    --metric {mse,ssim}      cost function        (per-binary in the ref)
    --algorithm {full,diamond}
    --backend {auto,xla,pallas}
    --gop F1 F2 F3 ...       process a frame sequence pairwise
    --no-output              skip the 5-frame stacked YUV  (-g inverse)
    --timing-row             also print `total h2d kernel d2h psnr`
                             (main_mse.cu:255 format)

Stdout mirrors the reference drivers: the config echo block
(main.c:121-122 style), `PSNR: %.6f` + output dims + computation time for
MSE (main.c:171-178), `Original Score: %.4f, Compensated Score: %.4f` for
SSIM (main_ssim.c:96).
"""
from __future__ import annotations

import argparse
import sys

from motionestimation_tpu.core import frames as frames_lib
from motionestimation_tpu.core.config import SearchConfig
from motionestimation_tpu.pipeline import runner


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="motionestimation_tpu",
        description="TPU-native block-matching motion estimation",
    )
    p.add_argument("current", help="current frame (raw YUV luma)")
    p.add_argument("reference", help="reference frame (raw YUV luma)")
    p.add_argument("output_dir", help="directory for output artifacts")
    p.add_argument("blk_dim", nargs="?", type=int, default=8)
    p.add_argument("span", nargs="?", type=int, default=12)
    p.add_argument("frame_width", nargs="?", type=int, default=352)
    p.add_argument("frame_height", nargs="?", type=int, default=288)
    p.add_argument("--metric", choices=("mse", "sad", "ssim"), default="mse")
    p.add_argument(
        "--algorithm", choices=("full", "diamond"), default="full"
    )
    p.add_argument(
        "--escape-policy", choices=("canonical", "crossover"),
        default="canonical",
        help="diamond staged-escalation policy: 'canonical' keeps exact "
        "diamond trajectories (adversarial worst case ~1.4x the full-"
        "volume replay); 'crossover' routes escaped blocks through the "
        "fused full-search argmin (adversarial cost ~ one fused search; "
        "escaped blocks return the global optimum, a flagged deviation)",
    )
    p.add_argument(
        "--early-term", type=float, default=None, metavar="THRESH",
        help="diamond early-termination per-pixel cost threshold "
        "(BASELINE config 3): stop a block's search once its best mean "
        "cost beats THRESH (MSE/SAD <=, SSIM >=)",
    )
    p.add_argument(
        "--backend", choices=("auto", "xla", "pallas"), default="auto"
    )
    p.add_argument("--gop", nargs="+", metavar="FRAME", default=None,
                   help="process a frame sequence pairwise instead")
    p.add_argument("--no-output", action="store_true")
    p.add_argument("--timing-row", action="store_true")
    p.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler trace of the run into DIR "
        "(the TPU-native analogue of the reference's getTimeStamp "
        "phase brackets, utils.c:23-27)",
    )
    p.add_argument(
        "--debug-block", nargs=2, type=int, metavar=("BY", "BX"),
        default=None,
        help="print the candidate cost surface and winner for one probe "
        "block (the analogue of the reference's -DDEBUG probe printfs, "
        "main.c:28-34,45-51)",
    )
    return p


def _print_debug_block(cur, ref, config: SearchConfig, by: int, bx: int):
    """Dump the probe block's full cost surface (reference main.c:45-51)."""
    import numpy as np

    from motionestimation_tpu.search import full_search as fs

    field, volume = fs.full_search_frame(
        cur, ref, blk_dim=config.blk_dim, span=config.span,
        metric=config.metric, return_cost_volume=True,
    )
    k = 2 * config.span + 1
    surface = np.asarray(volume)[:, by, bx].reshape(k, k)
    print(f"[debug] block ({by},{bx}) cost surface ({config.metric}):")
    for dy in range(k):
        row = " ".join(
            f"{surface[dy, dx]:10.2f}" for dx in range(k)
        )
        print(f"[debug]   dy={dy - config.span:+3d}: {row}")
    print(
        f"[debug] best mv=({int(np.asarray(field.mv_y)[by, bx])},"
        f"{int(np.asarray(field.mv_x)[by, bx])}) "
        f"score={float(np.asarray(field.score)[by, bx]):.6f}"
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from motionestimation_tpu.core.jax_setup import setup_jax
    setup_jax()
    config = SearchConfig(
        blk_dim=args.blk_dim,
        span=args.span,
        metric=args.metric,
        algorithm=args.algorithm,
        early_term=args.early_term,
        escape_policy=args.escape_policy,
        frame_width=args.frame_width,
        frame_height=args.frame_height,
    )

    print("[")
    print(f"  Current Frame: {args.current}")
    print(f"  Reference Frame: {args.reference}")
    print(f"  Output Dir: {args.output_dir}")
    print(f"  BlkDim: {config.blk_dim}")
    print(f"  ExtraSpan: {config.span}")
    print(f"  FrameWidth: {config.frame_width}")
    print(f"  FrameHeight: {config.frame_height}")
    print("]")

    if args.gop:
        dumps = runner.run_gop(
            args.gop, config,
            output_dir=args.output_dir, backend=args.backend,
        )
        print(f"GOP: {len(dumps)} frame pairs -> {args.output_dir}")
        return 0

    cur = frames_lib.load_yuv(
        args.current, config.frame_height, config.frame_width
    )
    ref = frames_lib.load_yuv(
        args.reference, config.frame_height, config.frame_width
    )
    import contextlib

    if args.profile:
        import jax

        trace_cm = jax.profiler.trace(args.profile)
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        res = runner.run_pair(cur, ref, config, backend=args.backend)

    if args.debug_block:
        _print_debug_block(cur, ref, config, *args.debug_block)

    if config.metric in ("mse", "sad"):
        print(f"PSNR: {res.psnr:.6f}")
    else:
        print(
            f"Original Score: {res.original_score:.4f}, "
            f"Compensated Score: {res.compensated_score:.4f}"
        )

    if not args.no_output:
        runner.write_artifacts(res, cur, ref, config, args.output_dir)
        print(
            f"Output file dimensions: ({config.frame_width} x "
            f"{5 * config.frame_height})"
        )
    if config.metric in ("mse", "sad"):
        print(f"Computation time: {res.kernel_ms:.0f} ms")
        print(f"PSNR: {res.psnr:.0f} ")
    if args.timing_row:
        print(res.timing_row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
