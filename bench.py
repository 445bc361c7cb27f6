"""Benchmark: full-search motion estimation throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches the reference's de-facto baseline (8x8 blocks, +-12 span,
4K frame — /root/repo/BASELINE.md): GPU v5 kernel = 64.577 ms/frame
(results/gpu/v5.txt:4), i.e. 2.007 M blocks/s. `vs_baseline` is the
speedup of our per-frame search time over that kernel time (>1 = faster).

Timing technique: on the axon tunnel `jax.block_until_ready` returns at
enqueue, not completion, so the benchmark chains B frame pairs through a
sequential `lax.map` inside ONE jitted program, reduces the motion field
to a scalar, and times the host fetch of that scalar — the only true
device sync. The Jockey/Beauty 4K planes are stripped from the reference
mount (.MISSING_LARGE_BLOBS), so frames are synthetic: random reference,
current = shifted + noise (same arithmetic workload; full search is
data-independent in time).
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_KERNEL_MS = 64.577  # GPU v5, Jockey 4K, 8x8 +-12
H, W = 2160, 3840
BLK, SPAN = 8, 12
BATCH = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from motionestimation_tpu.kernels.full_search_pallas import (
        _full_search_frame_jit,
    )

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    rng = np.random.default_rng(0)
    refs = rng.integers(0, 256, (BATCH, H, W), dtype=np.uint8)
    curs = np.clip(
        np.roll(refs, (0, 3, -5), (0, 1, 2)).astype(np.int32)
        + rng.integers(-6, 7, refs.shape),
        0,
        255,
    ).astype(np.uint8)

    @jax.jit
    def run_batch(curs, refs):
        def one(cr):
            f = _full_search_frame_jit(
                cr[0], cr[1], blk_dim=BLK, span=SPAN, tile=128,
                interpret=interpret,
            )
            return (
                jnp.sum(f.best_cost_i32) + jnp.sum(f.mv_y) + jnp.sum(f.mv_x)
            )

        return jnp.sum(jax.lax.map(one, (curs, refs)))

    cd = jax.device_put(jnp.asarray(curs))
    rd = jax.device_put(jnp.asarray(refs))
    jax.block_until_ready((cd, rd))

    int(run_batch(cd, rd))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(run_batch(cd, rd))  # host fetch = true sync
        times.append((time.perf_counter() - t0) / BATCH)
    ms_per_frame = float(np.median(times) * 1e3)
    blocks = (H // BLK) * (W // BLK)
    mblocks_s = blocks / (ms_per_frame * 1e-3) / 1e6

    # North-star config (BASELINE.json): 16x16 full search +-15.
    def ns_time(h, w, blk, span):
        @jax.jit
        def run(curs, refs):
            def one(cr):
                f = _full_search_frame_jit(
                    cr[0][:h, :w], cr[1][:h, :w], blk_dim=blk, span=span,
                    tile=128, interpret=interpret,
                )
                return (
                    jnp.sum(f.best_cost_i32)
                    + jnp.sum(f.mv_y)
                    + jnp.sum(f.mv_x)
                )

            return jnp.sum(jax.lax.map(one, (curs, refs)))

        int(run(cd, rd))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(cd, rd))
            ts.append((time.perf_counter() - t0) / BATCH)
        return float(np.median(ts) * 1e3)

    ns_4k = ns_time(2160, 3840, 16, 15)
    ns_1080 = ns_time(1080, 1920, 16, 15)
    ns_blocks_4k = (2160 // 16) * (3840 // 16)

    print(
        json.dumps(
            {
                "metric": "full-search MV throughput, 4K 8x8 +-12, 1 chip"
                + ("" if on_tpu else " (CPU interpret — not comparable)"),
                "value": round(mblocks_s, 3),
                "unit": "M blocks/s",
                "vs_baseline": round(BASELINE_KERNEL_MS / ms_per_frame, 3),
                "ms_per_frame": round(ms_per_frame, 3),
                "fps_4k": round(1e3 / ms_per_frame, 2),
                "north_star_16x16_s15_mblocks_s": round(
                    ns_blocks_4k / ns_4k / 1e3, 3
                ),
                "north_star_fps_4k": round(1e3 / ns_4k, 2),
                "north_star_fps_1080p": round(1e3 / ns_1080, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
