#!/usr/bin/env python3
"""Generate golden test fixtures by *running* the reference implementation.

Compiles the reference CPU binaries (MSE and SSIM drivers) from
/root/reference (read-only; build artifacts go to a temp dir) and runs them
on the bundled Foreman frames plus deterministic synthetic frames, capturing
their stdout and output YUV stacks under tests/fixtures/.

The fixtures are behavioural golden data — no reference code is copied into
this repository. Each case directory holds:
    cur.yuv / ref.yuv      input luma planes (synthetic cases only; Foreman
                           cases reference the frames by name in meta)
    output.yuv             the 5-frame stacked output written by the binary
    stdout.txt             the binary's stdout (PSNR / score lines)
    meta.json              dims + config

Usage: python tools/gen_fixtures.py [--out tests/fixtures]
Requires gcc and /root/reference; run once, commit the fixtures.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REF = "/root/reference"
FRAMES = os.path.join(REF, "frames")


def compile_binaries(bin_dir: str) -> dict:
    common = [
        f"{REF}/src/common/utils.c",
        f"{REF}/src/common/block.c",
        f"{REF}/src/common/prediction_frame.c",
    ]
    mse = os.path.join(bin_dir, "ref_mse")
    ssim = os.path.join(bin_dir, "ref_ssim")
    subprocess.run(
        ["gcc", "-O2", f"{REF}/src/cpu/main.c", f"{REF}/src/cpu/thpool.c"]
        + common
        + ["-o", mse, "-lm", "-lpthread"],
        check=True,
    )
    subprocess.run(
        ["gcc", "-O2", f"{REF}/src/cpu/main_ssim.c", f"{REF}/src/common/ssim.c"]
        + common
        + ["-o", ssim, "-lm"],
        check=True,
    )
    return {"mse": mse, "ssim": ssim}


def run_case(
    binary: str,
    out_dir: str,
    name: str,
    cur_path: str,
    ref_path: str,
    blk: int,
    span: int,
    width: int,
    height: int,
    metric: str,
    copy_inputs: bool,
):
    case_dir = os.path.join(out_dir, name)
    os.makedirs(case_dir, exist_ok=True)
    with tempfile.TemporaryDirectory() as run_dir:
        proc = subprocess.run(
            [
                binary,
                cur_path,
                ref_path,
                run_dir,
                str(blk),
                str(span),
                str(width),
                str(height),
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        produced = os.path.join(run_dir, f"output_{blk}_{span}.yuv")
        shutil.copy(produced, os.path.join(case_dir, "output.yuv"))
    with open(os.path.join(case_dir, "stdout.txt"), "w") as f:
        f.write(proc.stdout)
    if copy_inputs:
        shutil.copy(cur_path, os.path.join(case_dir, "cur.yuv"))
        shutil.copy(ref_path, os.path.join(case_dir, "ref.yuv"))
        cur_name, ref_name = "cur.yuv", "ref.yuv"
    else:
        cur_name, ref_name = os.path.basename(cur_path), os.path.basename(ref_path)
    meta = {
        "metric": metric,
        "blk_dim": blk,
        "span": span,
        "width": width,
        "height": height,
        "cur": cur_name,
        "ref": ref_name,
    }
    with open(os.path.join(case_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"  {name}: ok ({proc.stdout.splitlines()[-2:]})")


def synth_frames(tmp: str, name: str, width: int, height: int, seed: int):
    """Deterministic pseudo-natural synthetic frame pair (smooth + noise +
    a shifted copy region so motion search has real structure)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    base = (
        128
        + 60 * np.sin(xx / 17.0)
        + 40 * np.cos(yy / 11.0)
        + rng.normal(0, 12, (height, width))
    )
    ref = np.clip(base, 0, 255).astype(np.uint8)
    # cur = ref shifted by a few px with fresh noise at the seams
    dy, dx = int(rng.integers(-5, 6)), int(rng.integers(-5, 6))
    cur = np.roll(np.roll(ref, dy, axis=0), dx, axis=1)
    noise = rng.normal(0, 4, (height, width))
    cur = np.clip(cur.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    cur_p = os.path.join(tmp, f"{name}_cur.yuv")
    ref_p = os.path.join(tmp, f"{name}_ref.yuv")
    cur.tofile(cur_p)
    ref.tofile(ref_p)
    return cur_p, ref_p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    with tempfile.TemporaryDirectory() as tmp:
        bins = compile_binaries(tmp)
        fore = lambda n: os.path.join(FRAMES, n)  # noqa: E731

        print("Foreman cases (MSE):")
        # run.sh:4 default pair: current=F4, reference=F1 → PSNR 31.816000
        run_case(bins["mse"], args.out, "foreman_mse_8_12",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 8, 12, 352, 288, "mse", copy_inputs=False)
        # reversed pair (results/cpu/foreman/8_12.txt) → PSNR 31.750712
        run_case(bins["mse"], args.out, "foreman_mse_rev_8_12",
                 fore("ForemanYF1.yuv"), fore("ForemanYF4.yuv"),
                 8, 12, 352, 288, "mse", copy_inputs=False)
        run_case(bins["mse"], args.out, "foreman_mse_16_7",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 16, 7, 352, 288, "mse", copy_inputs=False)
        run_case(bins["mse"], args.out, "foreman_mse_16_15",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 16, 15, 352, 288, "mse", copy_inputs=False)
        run_case(bins["mse"], args.out, "foreman_mse_32_8",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 32, 8, 352, 288, "mse", copy_inputs=False)

        print("Foreman cases (SSIM):")
        # results/cpu/foreman/4_15.txt: residual MSE 384.45 -> 17.13
        run_case(bins["ssim"], args.out, "foreman_ssim_4_15",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 4, 15, 352, 288, "ssim", copy_inputs=False)
        run_case(bins["ssim"], args.out, "foreman_ssim_16_7",
                 fore("ForemanYF4.yuv"), fore("ForemanYF1.yuv"),
                 16, 7, 352, 288, "ssim", copy_inputs=False)

        print("Synthetic cases (truncated edges, odd dims):")
        for name, (w, h, blk, span, metric, seed) in {
            "rand_mse_52x36_8_12": (52, 36, 8, 12, "mse", 0),
            "rand_mse_61x47_8_5": (61, 47, 8, 5, "mse", 1),
            "rand_mse_64x48_16_9": (64, 48, 16, 9, "mse", 2),
            "rand_mse_90x70_32_8": (90, 70, 32, 8, "mse", 3),
            "rand_ssim_52x36_8_7": (52, 36, 8, 7, "ssim", 4),
            "rand_ssim_45x33_4_5": (45, 33, 4, 5, "ssim", 5),
        }.items():
            cur_p, ref_p = synth_frames(tmp, name, w, h, seed)
            run_case(bins[metric], args.out, name, cur_p, ref_p,
                     blk, span, w, h, metric, copy_inputs=True)

    print("done.")


if __name__ == "__main__":
    sys.exit(main())
