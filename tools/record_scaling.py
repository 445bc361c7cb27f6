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

    hosts = [1, 2, 4, 8, 16]
    gop_h = scaling.gop_scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        n_hosts=hosts, measured_mblocks_per_s=headline,
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

    out = os.path.join("results", "tpu", "scaling.txt")
    with open(out, "w") as f:
        f.write(
            "# Predicted 1->N scaling efficiency at 4K (BASELINE config 5)."
            " Model: parallel/scaling.py\n"
            "# (halo/psum bytes computed from the exact parallel/halo.py"
            " exchange arrays; compute from the\n"
            "# measured single-chip kernel rate in results/tpu/v6.txt;"
            " conservative no-overlap comm charging).\n"
            "# GOP rows = run_gop_sharded's dp-over-hosts layout (pairs"
            " batch over hosts, spatial tiling stays\n"
            "# within a host, halo rides ICI only). Spatial rows = one"
            " frame spread over all chips of one host.\n"
            f"[ GOP over hosts, 4K 8x8 +-12, {headline} M blocks/s/chip ]\n"
        )
        for n in hosts:
            f.write(f"hosts {n:3d}  efficiency {gop_h[n]:.4f}\n")
        f.write(
            f"[ GOP over hosts, 4K 16x16 +-15 (north star), "
            f"{north} M blocks/s/chip ]\n"
        )
        for n in hosts:
            f.write(f"hosts {n:3d}  efficiency {gop_n[n]:.4f}\n")
        f.write("[ spatial tiling within one host, 4K 8x8 +-12 ]\n")
        for (ty, tx) in meshes:
            n = ty * tx
            f.write(
                f"chips {n:3d} ({ty}x{tx})  efficiency {spatial[n]:.4f}\n"
            )
    print(f"wrote {out}")
    with open(out) as f:
        print(f.read())


if __name__ == "__main__":
    main()
