"""Microbenchmark for full-search Pallas kernel variants on real TPU.

Usage: python tools/kern_bench.py [--blk 8] [--span 12] [--h 2160] [--w 3840]
       [--variants chunk5,bf16,...]

Times the whole-frame jitted search (`_full_search_frame_jit`) per variant,
reporting ms/frame over a batch chained through lax.map (the axon tunnel
returns at enqueue, so the only true sync is the host fetch of a scalar).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from motionestimation_tpu.kernels.full_search_pallas import (
    _full_search_frame_jit,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blk", type=int, default=8)
    ap.add_argument("--span", type=int, default=12)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    rng = np.random.default_rng(0)
    refs = rng.integers(0, 256, (args.batch, args.h, args.w), dtype=np.uint8)
    curs = np.clip(
        np.roll(refs, (0, 3, -5), (0, 1, 2)).astype(np.int32)
        + rng.integers(-6, 7, refs.shape),
        0, 255,
    ).astype(np.uint8)
    cd = jax.device_put(jnp.asarray(curs))
    rd = jax.device_put(jnp.asarray(refs))
    jax.block_until_ready((cd, rd))

    # variant name -> kwargs for _full_search_frame_jit
    all_variants = {
        "phase": dict(phase=True),
        "phase_sad": dict(phase=True, metric="sad"),
        "roll": dict(chunk_dx=0, phase=False),
        "chunk5": dict(chunk_dx=5, phase=False),
        "chunk8": dict(chunk_dx=8, phase=False),
        "chunk12": dict(chunk_dx=12, phase=False),
        "bf16c5": dict(chunk_dx=5, operand_bf16=True, phase=False),
        "bf16c8": dict(chunk_dx=8, operand_bf16=True, phase=False),
        "bf16c12": dict(chunk_dx=12, operand_bf16=True, phase=False),
        "unroll": dict(unroll_dx=True, phase=False),
        "chunk5_t256": dict(chunk_dx=5, tile=256, phase=False),
        "bf16c8_t256": dict(
            chunk_dx=8, operand_bf16=True, tile=256, phase=False
        ),
    }
    names = (
        [v for v in args.variants.split(",") if v]
        if args.variants
        else ["phase", "chunk5"]
    )

    for name in names:
        kw = dict(all_variants[name])
        tile = kw.pop("tile", 128)

        @jax.jit
        def run(curs, refs, kw=kw, tile=tile):
            def one(cr):
                f = _full_search_frame_jit(
                    cr[0], cr[1], blk_dim=args.blk, span=args.span,
                    tile=tile, interpret=interpret, **kw,
                )
                return (
                    jnp.sum(f.best_cost_i32)
                    + jnp.sum(f.mv_y)
                    + jnp.sum(f.mv_x)
                )

            return jnp.sum(jax.lax.map(one, (curs, refs)))

        t0 = time.perf_counter()
        chk = int(run(cd, rd))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            int(run(cd, rd))
            ts.append((time.perf_counter() - t0) / args.batch)
        ms = float(np.median(ts) * 1e3)
        blocks = (args.h // args.blk) * (args.w // args.blk)
        print(
            f"{name:16s} {ms:8.3f} ms/frame "
            f"{blocks / ms / 1e3:8.2f} M blk/s  "
            f"(compile {compile_s:.1f}s, checksum {chk})"
        )


if __name__ == "__main__":
    main()
