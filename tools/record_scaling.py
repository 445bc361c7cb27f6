"""Record results/tpu/scaling.txt: predicted 1 -> N scaling (BASELINE config 5).

Multi-chip hardware is unavailable here (one v5e chip via a tunnel), so the
">=90% 1 -> N host scaling at 4K" claim is backed by the analytic model in
`parallel/scaling.py` (every comm term computed from the exact arrays
`parallel/halo.py` exchanges; compute from the MEASURED single-chip kernel
rate). This script evaluates the model at the measured round-3 rates and
writes the curves as a results artifact.

Run:  python tools/record_scaling.py [measured_mblocks_per_s_8x8_s12]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from motionestimation_tpu.parallel import scaling


def main():
    # Measured on the single v5e chip, sync-amortized (results/tpu/v6.txt):
    # 4K 8x8 +-12 -> 14.41 M blocks/s; 4K 16x16 +-15 -> 2.90 M blocks/s.
    headline = float(sys.argv[1]) if len(sys.argv) > 1 else 14.41
    north = float(sys.argv[2]) if len(sys.argv) > 2 else 2.90
    # Measured host->HBM ingest rate (MB/s): this environment's tunnel
    # link probe (BENCH_r04 gop_link_mb_s). Deployment-grade hosts
    # ingest at GB/s; both columns are recorded.
    ingest = float(sys.argv[3]) if len(sys.argv) > 3 else 57.7

    hosts = [1, 2, 4, 8, 16]
    kw_h = dict(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        n_hosts=hosts, measured_mblocks_per_s=headline,
    )
    gop_h = scaling.gop_scaling_efficiency(**kw_h)
    gop_h_e2e = scaling.gop_scaling_efficiency(
        **kw_h, host_ingest_mb_s=ingest
    )
    gop_n = scaling.gop_scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=16, span=15,
        n_hosts=hosts, measured_mblocks_per_s=north,
    )
    meshes = [(1, 2), (2, 2), (2, 4), (4, 4), (4, 8)]
    spatial = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        meshes=meshes, measured_mblocks_per_s=headline,
    )
    overlap = scaling.spatial_gop_overlap_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        meshes=meshes, measured_mblocks_per_s=headline,
    )
    base = scaling.model_step(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        ty=2, tx=4, measured_mblocks_per_s=headline,
    )
    ingest_s = 2160 * 3840 / (ingest * 1e6)

    out = os.path.join("results", "tpu", "scaling.txt")
    with open(out, "w") as f:
        f.write(
            "# Predicted 1->N scaling efficiency at 4K (BASELINE config 5)."
            " Model: parallel/scaling.py\n"
            "# (halo/psum bytes computed from the exact parallel/halo.py"
            " exchange arrays; compute from the\n"
            "# measured single-chip kernel rate in results/tpu/v6.txt;"
            " per-hop link charging — host-boundary\n"
            "# direction at DCN, rest at ICI; no halo/compute overlap, a"
            " MEASURED decision: the interior/border\n"
            "# split that overlap needs runs border slabs at 3286-6594"
            " ns/block vs 167 fused (on-chip,\n"
            "# batch-32 sync-amortized) — ~3.4 ms of border recompute to"
            " hide <=25 us of halo, a ~135x net\n"
            "# loss; see parallel/scaling.py docstring).\n"
            "# GOP rows = run_gop_sharded's dp-over-hosts layout (pairs"
            " batch over hosts, spatial tiling stays\n"
            "# within a host, halo rides ICI only). KERNEL-BOUND = hosts"
            " with local ingest faster than the\n"
            "# step; END-TO-END charges the MEASURED per-host ingest"
            " (one new 8.29 MB u8 frame per pair,\n"
            "# pipelined with compute by run_gop: per-pair time ="
            " max(ingest, step+sync)). Spatial rows =\n"
            "# one frame spread over all chips.\n"
            f"[ GOP over hosts, 4K 8x8 +-12, {headline} M blocks/s/chip,"
            f" kernel-bound ingest ]\n"
        )
        for n in hosts:
            f.write(f"hosts {n:3d}  efficiency {gop_h[n]:.4f}\n")
        f.write(
            f"[ GOP over hosts, 4K 8x8 +-12, END-TO-END at measured"
            f" {ingest:.1f} MB/s/host ingest ]\n"
            f"# ingest {ingest_s*1e3:.1f} ms/frame vs step"
            f" {base.step_s*1e3:.2f} ms: transport-bound — sync hides"
            f" under ingest, efficiency flat,\n"
            f"# absolute per-host rate = {1.0/ingest_s:.2f} fps"
            f" (= BENCH gop link bound), chips idle"
            f" {100*(1-base.step_s/ingest_s):.0f}% of the time.\n"
        )
        for n in hosts:
            f.write(f"hosts {n:3d}  efficiency {gop_h_e2e[n]:.4f}\n")
        f.write(
            f"[ GOP over hosts, 4K 16x16 +-15 (north star), "
            f"{north} M blocks/s/chip, kernel-bound ]\n"
        )
        for n in hosts:
            f.write(f"hosts {n:3d}  efficiency {gop_n[n]:.4f}\n")
        f.write("[ spatial tiling, 4K 8x8 +-12, single pair ]\n")
        for (ty, tx) in meshes:
            n = ty * tx
            f.write(
                f"chips {n:3d} ({ty}x{tx})  efficiency {spatial[n]:.4f}\n"
            )
        f.write(
            "[ spatial tiling, 4K 8x8 +-12, GOP with cross-pair halo "
            "overlap ]\n"
            "# Pair i+1's halo exchange has no dependency on pair i's "
            "search, so a pipelined GOP schedule\n"
            "# (async collectives inside one scanned program) pays "
            "max(compute, halo) + stats per pair —\n"
            "# no border recompute, so the measured 135x no-overlap "
            "argument does not apply across pairs\n"
            "# (parallel/scaling.py:spatial_gop_overlap_efficiency).\n"
        )
        for (ty, tx) in meshes:
            n = ty * tx
            f.write(
                f"chips {n:3d} ({ty}x{tx})  efficiency {overlap[n]:.4f}\n"
            )
    print(f"wrote {out}")
    with open(out) as f:
        print(f.read())


if __name__ == "__main__":
    main()
