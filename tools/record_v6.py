"""Record results/tpu/v6.txt: sync-amortized kernel times, full matrix.

SUPERSEDED (round 4): the matrix now records through the package
harness — `python -m motionestimation_tpu.bench --matrix -v N`
(motionestimation_tpu/bench/matrix.py), which carries the v6/v7 rows
plus the diamond SAD/blk-32, worst-case, SSIM-lazy, and GOP rows with
tag-wise epsilon comparison. This tool is kept for the provenance of
the committed v6/v7 files only.

The v1-v5 rows use the reference's 4-phase fenced methodology
(main_mse.cu:255); on this host every fence costs a ~20-30 ms tunnel
round trip, which swamps sub-100-ms kernels (a CIF search reads ~30 ms
when the kernel itself is <1 ms). v6 records the kernel column the way
`bench.py` does: chain N frame pairs through one jitted `lax.map`,
reduce the motion field to a scalar on device, time the host fetch of
that scalar, divide by N — so the single sync amortizes to <3% of every
row. N is per-config (1024 CIF / 64 1080p / 16 4K).

Run on the TPU chip:  python tools/record_v6.py [version]
(version defaults to 6; e.g. `python tools/record_v6.py 7` writes
results/tpu/v7.txt and prints a per-row comparison against v6.)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    from motionestimation_tpu.core.frames import load_yuv
    from motionestimation_tpu.kernels.full_search_pallas import (
        _full_search_frame_jit,
    )
    from motionestimation_tpu.kernels.ssim_pallas import (
        ssim_search_frame_pallas,
    )
    from motionestimation_tpu.search import diamond

    rng = np.random.default_rng(0)

    def timed(run_one, cur, ref, n):
        """Median per-frame ms: n chained invocations, one device sync."""

        curs = np.broadcast_to(cur, (n,) + cur.shape)
        refs = np.broadcast_to(ref, (n,) + ref.shape)

        @jax.jit
        def run(curs, refs):
            return jnp.sum(jax.lax.map(run_one, (curs, refs)))

        cd = jax.device_put(jnp.asarray(curs))
        rd = jax.device_put(jnp.asarray(refs))
        jax.block_until_ready((cd, rd))
        int(run(cd, rd))  # compile + warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(cd, rd))
            ts.append((time.perf_counter() - t0) / n)
        return float(np.median(ts) * 1e3)

    def fs_runner(blk, span, metric):
        def one(cr):
            f = _full_search_frame_jit(
                cr[0], cr[1], blk_dim=blk, span=span, tile=128,
                interpret=interpret, metric=metric,
            )
            return jnp.sum(f.best_cost_i32) + jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

        return one

    def synth(h, w, texture=4):
        small = rng.integers(0, 256, (h // texture + 2, w // texture + 2))
        ref = np.clip(
            np.kron(small, np.ones((texture, texture)))[:h, :w]
            + rng.normal(0, 1, (h, w)),
            0, 255,
        ).astype(np.uint8)
        cur = np.clip(
            np.roll(ref, (1, -2), (0, 1)).astype(np.int32)
            + rng.integers(-1, 2, (h, w)),
            0, 255,
        ).astype(np.uint8)
        return cur, ref

    frames_dir = "frames" if os.path.isdir("frames") else (
        "/root/reference/frames"
    )
    f1 = load_yuv(os.path.join(frames_dir, "ForemanYF1.yuv"), 288, 352)
    f2 = load_yuv(os.path.join(frames_dir, "ForemanYF2.yuv"), 288, 352)
    f4 = load_yuv(os.path.join(frames_dir, "ForemanYF4.yuv"), 288, 352)

    rows = []

    def record(tag, ms):
        rows.append((tag, ms))
        print(f"{tag}: kernel {ms:.4f} ms", flush=True)

    # config 1: Foreman SAD 16x16 +-7 (real frames).
    record(
        "config1: Foreman F1->F2, SAD, blk 16, span 7 (real frames)",
        timed(fs_runner(16, 7, "sad"), f2, f1, 1024),
    )
    # config 2: Foreman reversed pair, SSD 16x16 +-15 (real frames).
    record(
        "config2: Foreman F1->F4, SSD (mse), blk 16, span 15 (real frames)",
        timed(fs_runner(16, 15, "mse"), f4, f1, 1024),
    )

    # config 3: 1080p diamond vs full, 16x16 +-15, slow-motion synthetic.
    hh, ww = 1080, 1920
    d_cur, d_ref = synth(hh, ww)

    def diamond_one(cr):
        f, _ = diamond._diamond_staged(
            cr[0], cr[1], blk_dim=16, span=15, early_term=None,
            max_steps=17, record_trajectory=False,
            frame_height=hh, frame_width=ww,
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)

    record(
        "config3: synthetic-Beauty 1080p, DIAMOND, blk 16, span 15",
        timed(diamond_one, d_cur, d_ref, 64),
    )
    record(
        "config3-ref: synthetic-Beauty 1080p, full search, blk 16, span 15",
        timed(fs_runner(16, 15, "mse"), d_cur, d_ref, 64),
    )

    # config 4: 4K +-31 at blk 8/16/32, synthetic.
    j_cur, j_ref = synth(2160, 3840)
    for blk in (8, 16, 32):
        record(
            f"config4: synthetic-Jockey 4K, SSD, blk {blk}, span 31",
            timed(fs_runner(blk, 31, "mse"), j_cur, j_ref, 16),
        )

    # headline + north star, for direct comparison with v1-v5 rows.
    record(
        "headline: synthetic-Jockey 4K, SSD, blk 8, span 12",
        timed(fs_runner(8, 12, "mse"), j_cur, j_ref, 32),
    )
    record(
        "north-star: synthetic-Jockey 4K, SSD, blk 16, span 15",
        timed(fs_runner(16, 15, "mse"), j_cur, j_ref, 32),
    )

    # SSIM row: 4K 16x16 +-7 via the fused SSIM Pallas kernel.
    def ssim_one(cr):
        f = ssim_search_frame_pallas(
            cr[0], cr[1], blk_dim=16, span=7, interpret=interpret,
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

    record(
        "ssim: synthetic-Jockey 4K, SSIM, blk 16, span 7",
        timed(ssim_one, j_cur, j_ref, 16),
    )

    version = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out = os.path.join("results", "tpu", f"v{version}.txt")
    with open(out, "w") as f:
        f.write(
            "# TPU v5e, single chip. Search-KERNEL ms per frame, "
            "sync-amortized (tools/record_v6.py):\n"
            "# N pairs chained through one jitted lax.map, MV field "
            "reduced on device, one host sync per timing —\n"
            "# the fenced v1-v5 rows pay a ~20-30 ms tunnel round trip "
            "per phase, which this methodology removes.\n"
            "# MVs/costs identical to the fenced rows (same kernels); "
            "synthetic 4K/1080p stand-ins as in v5.txt.\n"
        )
        for tag, ms in rows:
            f.write(f"[ {tag} ]\nkernel {ms:.4f} ms\n")
    print(f"wrote {out}")

    # v{N} vs v{N-1} comparison, reference epsilon (run.sh:79: 0.1 ms).
    prev = os.path.join("results", "tpu", f"v{version - 1}.txt")
    if os.path.exists(prev):
        import re

        prev_rows = dict(
            re.findall(
                r"\[ (.+?) \]\nkernel ([\d.]+) ms", open(prev).read()
            )
        )
        for tag, ms in rows:
            if tag not in prev_rows:
                continue
            pms = float(prev_rows[tag])
            flag = "REGRESSION" if ms > pms + 0.1 else "ok"
            print(f"{flag}: {tag}: {ms:.4f} vs v{version - 1} {pms:.4f}")


if __name__ == "__main__":
    main()
