"""Hardware bit-exactness check: every committed fixture, on the real chip.

The pytest suite proves Pallas == golden in *interpret* mode (CPU); this
tool closes the loop on hardware: it runs every fixture case under
`tests/fixtures/` through the production Pallas kernels on the actual TPU
(interpret=False) and asserts motion vectors and integer costs equal the
numpy oracle (`search/reference_model`), which is itself byte-exact
against the compiled C reference binaries (tools/gen_fixtures.py).

Covers both kernel families across the committed configs: MSE at blk
8/16/32 (phase + edge slabs), SSIM at blk 4/8/16, real Foreman frames
and random frames with truncated edges.

Run on the TPU chip:  python tools/verify_tpu.py
Exit code 0 = every case bit-exact.
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
REF_FRAMES = "/root/reference/frames"


def _frame(case_dir: str, name: str, h: int, w: int) -> np.ndarray:
    path = os.path.join(case_dir, name)
    if not os.path.exists(path):
        path = os.path.join(REF_FRAMES, name)
    data = np.fromfile(path, dtype=np.uint8, count=h * w)
    return data.reshape(h, w)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"WARNING: backend is {backend!r}, not tpu — this run does "
              "not prove hardware exactness", file=sys.stderr)

    from motionestimation_tpu.kernels.full_search_pallas import (
        full_search_frame_pallas,
    )
    from motionestimation_tpu.kernels.ssim_pallas import (
        ssim_search_frame_pallas,
    )
    from motionestimation_tpu.search import reference_model as rm

    failures = 0
    cases = sorted(glob.glob(os.path.join(FIXTURES, "*", "meta.json")))
    for meta_path in cases:
        case_dir = os.path.dirname(meta_path)
        name = os.path.basename(case_dir)
        with open(meta_path) as f:
            meta = json.load(f)
        blk, span = meta["blk_dim"], meta["span"]
        h, w, metric = meta["height"], meta["width"], meta["metric"]
        cur = _frame(case_dir, meta["cur"], h, w)
        ref = _frame(case_dir, meta["ref"], h, w)

        if metric == "ssim":
            field = ssim_search_frame_pallas(
                cur, ref, blk_dim=blk, span=span, interpret=False
            )
            o_mvy, o_mvx, o_score = rm.full_search_ssim(cur, ref, blk, span)
            ok = (
                np.array_equal(np.asarray(field.mv_y), o_mvy)
                and np.array_equal(np.asarray(field.mv_x), o_mvx)
                and np.array_equal(np.asarray(field.score), o_score)
            )
        else:
            field = full_search_frame_pallas(
                cur, ref, blk_dim=blk, span=span, metric=metric,
                interpret=False,
            )
            oracle = (
                rm.full_search_mse if metric == "mse" else rm.full_search_sad
            )
            o_mvy, o_mvx, o_cost, _ = oracle(cur, ref, blk, span)
            ok = (
                np.array_equal(np.asarray(field.mv_y), o_mvy)
                and np.array_equal(np.asarray(field.mv_x), o_mvx)
                and np.array_equal(
                    np.asarray(field.best_cost_i32).astype(np.int64), o_cost
                )
            )
        print(f"{'OK  ' if ok else 'FAIL'} {name} "
              f"({metric} blk {blk} span {span}, {h}x{w})")
        failures += 0 if ok else 1

    # SAD has no C fixture (the reference has no SAD driver); check the
    # canonical Foreman config 1 against the numpy oracle on hardware.
    cur = _frame(REF_FRAMES, "ForemanYF2.yuv", 288, 352)
    ref = _frame(REF_FRAMES, "ForemanYF1.yuv", 288, 352)
    field = full_search_frame_pallas(
        cur, ref, blk_dim=16, span=7, metric="sad", interpret=False
    )
    o_mvy, o_mvx, o_cost, _ = rm.full_search_sad(cur, ref, 16, 7)
    ok = (
        np.array_equal(np.asarray(field.mv_y), o_mvy)
        and np.array_equal(np.asarray(field.mv_x), o_mvx)
        and np.array_equal(
            np.asarray(field.best_cost_i32).astype(np.int64), o_cost
        )
    )
    print(f"{'OK  ' if ok else 'FAIL'} foreman_sad_16_7 (sad blk 16 span 7)")
    failures += 0 if ok else 1
    extra = 1

    # BASELINE config-4 extreme point (blk 32, +-31): exercises the
    # int32 sliding-sum fold (MSE, lexicographic argmin) and the packed
    # int32 key at its widest fitting config (SAD) on hardware.
    rng = np.random.default_rng(5)
    h, w = 288, 352
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.clip(
        np.roll(ref, (9, -13), (0, 1)).astype(np.int32)
        + rng.integers(-8, 9, (h, w)),
        0, 255,
    ).astype(np.uint8)
    for metric in ("sad", "mse"):
        field = full_search_frame_pallas(
            cur, ref, blk_dim=32, span=31, metric=metric, interpret=False
        )
        oracle = (
            rm.full_search_sad if metric == "sad" else rm.full_search_mse
        )
        o_mvy, o_mvx, o_cost, _ = oracle(cur, ref, 32, 31)
        ok = (
            np.array_equal(np.asarray(field.mv_y), o_mvy)
            and np.array_equal(np.asarray(field.mv_x), o_mvx)
            and np.array_equal(
                np.asarray(field.best_cost_i32).astype(np.int64), o_cost
            )
        )
        print(f"{'OK  ' if ok else 'FAIL'} rand_{metric}_32_31 "
              f"({metric} blk 32 span 31, {h}x{w})")
        failures += 0 if ok else 1
        extra += 1

    total = len(cases) + extra
    print(f"{total - failures}/{total} cases bit-exact "
          f"on backend={backend}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
