"""Sync-amortized kernel-matrix recorder: `python -m
motionestimation_tpu.bench --matrix -v N`.

Records the full BASELINE config matrix (the rows results/tpu/v6-7.txt
carried) as `v{N}.txt` and epsilon-compares tag-by-tag against
`v{N-1}.txt` with the reference's 0.1 ms rule (src/gpu/run.sh:79) — the
round-3 verdict's item 8: new rows flow through the package harness, not
one-off tools/record_* scripts.

Methodology (same as bench.py / the retired tools/record_v6.py): on this
host `block_until_ready` acks at enqueue and a host scalar fetch costs a
~20-30 ms tunnel round trip, so each row chains N frame pairs through
one jitted `lax.map`, reduces the result to a scalar on device, and
times the host fetch — one sync amortized over N frames.

Rows beyond v7's matrix (round-4):
  * diamond SAD 16x16 +-15 and diamond blk-32 +-31 (the staged fast
    path now covers SAD and blk 32) next to their full-search rows;
  * diamond-worstcase: adversarial content (global shift past every
    staged level's escape radius, forcing the full escalation chain) —
    the measured validation of `_staged_levels`' <=1.4x worst-case
    bound;
  * gop-e2e: run_gop end-to-end ms/frame at 4K 8x8 +-12 (pipelined;
    link-bound on this host) — informational only, since the transport
    link drifts ~2x between runs (bench.py probe bracketing); the GATED
    end-to-end row is gop-e2e-pct, the pct of the bracketing link bound
    the pipeline reached (round-4 verdict item 6: transport-normalized,
    so a real pipeline regression is detectable under link drift).
"""
from __future__ import annotations

import os
import re
import tempfile
import time

import numpy as np

KERNEL_EPSILON_MS = 0.1  # run.sh:79
GOP_PCT_DROP = 10.0  # pct-of-link-bound points a gop-e2e-pct row may drop


def compare_rows(rows, prev_rows):
    """Epsilon-compare this run's rows against the previous version's.

    Returns (lines, n_regressions). Three row classes (round-4 verdict
    item 6 — gate the end-to-end row on a transport-normalized metric):

    * `gop-e2e-pct` rows carry pct-of-link-bound (HIGHER is better, the
      link probe brackets the same run): regression when the pct drops
      more than GOP_PCT_DROP points. The link drifting 2x moves raw ms
      2x but moves this pct only by the pipeline's own behavior, so a
      real ~20% pipeline regression is detectable under full drift.
    * `gop-e2e` raw-ms rows are informational only — gating raw ms on a
      transport-bound row at 25% was noise-gating (two same-day round-4
      records disagreed by 62%).
    * every other row is a kernel time under the reference's absolute
      0.1 ms rule (src/gpu/run.sh:79).
    """
    lines = []
    regressions = 0
    for tag, val in rows:
        if tag not in prev_rows:
            lines.append(f"new: {tag}: {val:.4f} (no previous row)")
            continue
        prev = float(prev_rows[tag])
        if tag.startswith("gop-e2e-pct"):
            flag = "REGRESSION" if val < prev - GOP_PCT_DROP else "ok"
        elif tag.startswith("gop-e2e"):
            flag = "info"
        else:
            flag = "REGRESSION" if val > prev + KERNEL_EPSILON_MS else "ok"
        regressions += flag == "REGRESSION"
        lines.append(f"{flag}: {tag}: {val:.4f} vs previous {prev:.4f}")
    return lines, regressions


def _synth(rng, h, w, texture=4, shift=(1, -2), noise=1):
    small = rng.integers(0, 256, (h // texture + 2, w // texture + 2))
    ref = np.clip(
        np.kron(small, np.ones((texture, texture)))[:h, :w]
        + rng.normal(0, 1, (h, w)),
        0, 255,
    ).astype(np.uint8)
    cur = np.clip(
        np.roll(ref, shift, (0, 1)).astype(np.int32)
        + rng.integers(-noise, noise + 1, (h, w)),
        0, 255,
    ).astype(np.uint8)
    return cur, ref


def run_matrix(version: int, results_dir: str = os.path.join(
        "results", "tpu")) -> int:
    import jax
    import jax.numpy as jnp

    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.core.frames import load_yuv, save_yuv
    from motionestimation_tpu.kernels.full_search_pallas import (
        _full_search_frame_jit,
    )
    from motionestimation_tpu.kernels.ssim_pallas import (
        ssim_search_frame_pallas,
    )
    from motionestimation_tpu.pipeline import runner
    from motionestimation_tpu.search import diamond

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    rng = np.random.default_rng(0)

    def timed(run_one, cur, ref, n):
        """Best-of-3 per-frame ms: n chained invocations, one device
        sync per pass. Best (not median): run-to-run drift on this host
        is one-sided (+0.1..1.7 ms on 10-50 ms rows — clock/tunnel
        interference), which the reference's absolute 0.1 ms epsilon
        was never designed to absorb; the minimum is the stable
        estimator of the kernel's actual rate, and a real regression
        still moves it."""
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
        return float(min(ts) * 1e3)

    def fs_one(blk, span, metric):
        def one(cr):
            f = _full_search_frame_jit(
                cr[0], cr[1], blk_dim=blk, span=span, tile=128,
                interpret=interpret, metric=metric,
            )
            return (
                jnp.sum(f.best_cost_i32) + jnp.sum(f.mv_y) + jnp.sum(f.mv_x)
            )

        return one

    def diamond_one(blk, span, metric, h, w, early_term=None):
        def one(cr):
            f, _ = diamond._diamond_staged(
                cr[0], cr[1], blk_dim=blk, span=span, metric=metric,
                early_term=early_term,
                max_steps=diamond.default_max_steps(span),
                record_trajectory=False, frame_height=h, frame_width=w,
            )
            return (
                jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)
            )

        return one

    frames_dir = "/root/reference/frames"
    f1 = load_yuv(os.path.join(frames_dir, "ForemanYF1.yuv"), 288, 352)
    f2 = load_yuv(os.path.join(frames_dir, "ForemanYF2.yuv"), 288, 352)
    f4 = load_yuv(os.path.join(frames_dir, "ForemanYF4.yuv"), 288, 352)

    rows: list[tuple[str, float]] = []

    def record(tag, ms):
        rows.append((tag, ms))
        print(f"{tag}: kernel {ms:.4f} ms", flush=True)

    record(
        "config1: Foreman F1->F2, SAD, blk 16, span 7 (real frames)",
        timed(fs_one(16, 7, "sad"), f2, f1, 1024),
    )
    record(
        "config2: Foreman F1->F4, SSD (mse), blk 16, span 15 (real frames)",
        timed(fs_one(16, 15, "mse"), f4, f1, 1024),
    )

    # config 3: 1080p diamond vs full at 16x16 +-15, slow motion.
    hh, ww = 1080, 1920
    d_cur, d_ref = _synth(rng, hh, ww)
    record(
        "config3: synthetic-Beauty 1080p, DIAMOND, blk 16, span 15",
        timed(diamond_one(16, 15, "mse", hh, ww), d_cur, d_ref, 64),
    )
    record(
        "config3-ref: synthetic-Beauty 1080p, full search, blk 16, span 15",
        timed(fs_one(16, 15, "mse"), d_cur, d_ref, 64),
    )
    # round-5: what early termination buys on natural content (BASELINE
    # config 3 "early termination parity"): same content as config3 with
    # a per-pixel MSE threshold the true matches beat, so satisfied
    # blocks drop out of the replay rounds early (the staged level-1
    # volume is computed either way — the delta vs config3 is the
    # honest size of the win in this regime).
    record(
        "config3-early: synthetic-Beauty 1080p, DIAMOND early-term 2.0, "
        "blk 16, span 15",
        timed(diamond_one(16, 15, "mse", hh, ww, early_term=2.0),
              d_cur, d_ref, 64),
    )
    # round-4: diamond-SAD next to its full-search row.
    record(
        "config3-sad: synthetic-Beauty 1080p, DIAMOND SAD, blk 16, span 15",
        timed(diamond_one(16, 15, "sad", hh, ww), d_cur, d_ref, 64),
    )
    record(
        "config3-sad-ref: synthetic-Beauty 1080p, full search SAD, "
        "blk 16, span 15",
        timed(fs_one(16, 15, "sad"), d_cur, d_ref, 64),
    )
    # round-4: SSIM diamond — the staged path now covers SSIM via the
    # fast kernel's float score-volume emission (on TPU; the lazy
    # evaluator remains the off-TPU/auto fallback and is recorded too
    # for the round-3 verdict's "SSIM must get a recorded time").
    def diamond_ssim_lazy_one(cr):
        f = diamond.diamond_search_frame(
            cr[0], cr[1], blk_dim=16, span=15, metric="ssim",
            volume_mode="lazy",
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

    record(
        "config3-ssim: synthetic-Beauty 1080p, DIAMOND SSIM (lazy), "
        "blk 16, span 15",
        timed(diamond_ssim_lazy_one, d_cur, d_ref, 4),
    )

    def diamond_ssim_staged_one(cr):
        f, _ = diamond._diamond_staged(
            cr[0], cr[1], blk_dim=16, span=15, metric="ssim",
            early_term=None, max_steps=17, record_trajectory=False,
            frame_height=hh, frame_width=ww,
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

    record(
        "config3-ssim-staged: synthetic-Beauty 1080p, DIAMOND SSIM "
        "(staged volumes), blk 16, span 15",
        timed(diamond_ssim_staged_one, d_cur, d_ref, 16),
    )

    # round-4: adversarial worst case — global shift past every staged
    # escape radius forces the full escalation chain (levels 6 -> 15).
    # The _staged_levels bound is worst <= 1.4x the FULL-VOLUME replay
    # (the diamond path's own span-radius volume + trajectory replay,
    # recorded next so the ratio is checkable) — NOT vs the fused full
    # search, which skips volume emission entirely and wins on
    # adversarial content; diamond's advantage is content-dependent by
    # design (bench.py docstring).
    w_cur, w_ref = _synth(rng, hh, ww, shift=(14, -14), noise=2)
    record(
        "diamond-worstcase: adversarial 1080p (full escalation), "
        "DIAMOND, blk 16, span 15",
        timed(diamond_one(16, 15, "mse", hh, ww), w_cur, w_ref, 64),
    )

    # round-5: the crossover policy on the same adversarial content —
    # escaped blocks route through the fused full-search argmin
    # (escape_policy="crossover"), bounding the worst case near one
    # fused search instead of the staged escalation chain.
    def diamond_xover_one(cr):
        f, _ = diamond._diamond_staged(
            cr[0], cr[1], blk_dim=16, span=15, metric="mse",
            early_term=None, max_steps=diamond.default_max_steps(15),
            record_trajectory=False, frame_height=hh, frame_width=ww,
            escape_policy="crossover",
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)

    record(
        "diamond-worstcase-crossover: adversarial 1080p, DIAMOND "
        "escape_policy=crossover, blk 16, span 15",
        timed(diamond_xover_one, w_cur, w_ref, 64),
    )

    def diamond_fullvol_one(cr):
        f = diamond.diamond_search_frame(
            cr[0], cr[1], blk_dim=16, span=15, metric="mse",
            volume_mode="full",
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)

    record(
        "diamond-fullvol: adversarial 1080p, DIAMOND full-volume replay, "
        "blk 16, span 15 (worst-case bound denominator)",
        timed(diamond_fullvol_one, w_cur, w_ref, 64),
    )

    # config 4: 4K +-31 at blk 8/16/32.
    j_cur, j_ref = _synth(rng, 2160, 3840)
    for blk in (8, 16, 32):
        record(
            f"config4: synthetic-Jockey 4K, SSD, blk {blk}, span 31",
            timed(fs_one(blk, 31, "mse"), j_cur, j_ref, 16),
        )
    # round-4: diamond blk-32 next to its full-search row, plus its
    # adversarial worst case (levels 6 -> 12 -> 31).
    record(
        "config4-diamond: synthetic-Jockey 4K, DIAMOND, blk 32, span 31",
        timed(diamond_one(32, 31, "mse", 2160, 3840), j_cur, j_ref, 16),
    )
    w4_cur, w4_ref = _synth(rng, 2160, 3840, shift=(28, -28), noise=2)
    record(
        "diamond-worstcase-4k: adversarial 4K (full escalation), "
        "DIAMOND, blk 32, span 31",
        timed(diamond_one(32, 31, "mse", 2160, 3840), w4_cur, w4_ref, 16),
    )

    def diamond_xover4k_one(cr):
        f, _ = diamond._diamond_staged(
            cr[0], cr[1], blk_dim=32, span=31, metric="mse",
            early_term=None, max_steps=diamond.default_max_steps(31),
            record_trajectory=False, frame_height=2160, frame_width=3840,
            escape_policy="crossover",
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)

    record(
        "diamond-worstcase-crossover-4k: adversarial 4K, DIAMOND "
        "escape_policy=crossover, blk 32, span 31",
        timed(diamond_xover4k_one, w4_cur, w4_ref, 16),
    )

    def diamond_fullvol4k_one(cr):
        f = diamond.diamond_search_frame(
            cr[0], cr[1], blk_dim=32, span=31, metric="mse",
            volume_mode="full",
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x) + jnp.sum(f.best_cost_i32)

    record(
        "diamond-fullvol-4k: adversarial 4K, DIAMOND full-volume replay, "
        "blk 32, span 31 (worst-case bound denominator)",
        timed(diamond_fullvol4k_one, w4_cur, w4_ref, 16),
    )

    record(
        "headline: synthetic-Jockey 4K, SSD, blk 8, span 12",
        timed(fs_one(8, 12, "mse"), j_cur, j_ref, 32),
    )
    record(
        "north-star: synthetic-Jockey 4K, SSD, blk 16, span 15",
        timed(fs_one(16, 15, "mse"), j_cur, j_ref, 32),
    )

    def ssim_one(cr):
        f = ssim_search_frame_pallas(
            cr[0], cr[1], blk_dim=16, span=7, interpret=interpret,
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

    record(
        "ssim: synthetic-Jockey 4K, SSIM, blk 16, span 7",
        timed(ssim_one, j_cur, j_ref, 16),
    )

    # round-5: the SSIM blk-32 cell (BASELINE config 4 x SSIM) — the
    # fast kernel's split hi/lo horizontal folds carry the >2²⁴ block
    # sums exactly past the f32 mantissa (docs/SPEED_OF_LIGHT.md §7),
    # so blk 32 now runs the hoisted-box-sum fast path (2.5x the
    # per-pixel exact kernel it replaced: 44.3 -> ~17 ms at 4K).
    def ssim32_one(cr):
        f = ssim_search_frame_pallas(
            cr[0], cr[1], blk_dim=32, span=7, interpret=interpret,
        )
        return jnp.sum(f.mv_y) + jnp.sum(f.mv_x)

    record(
        "ssim-blk32: synthetic-Jockey 4K, SSIM, blk 32, span 7 "
        "(fast split-fold kernel)",
        timed(ssim32_one, j_cur, j_ref, 4),
    )

    # round-4: end-to-end pipelined GOP (8 pairs, one chunk dispatch).
    # round-5: the gated quantity is pct-of-link-bound — the link probe
    # brackets the timed run exactly like bench.py, so the row is
    # transport-normalized (compare_rows); raw ms stays informational.
    def probe_pass(frames):
        t0 = time.perf_counter()
        ds = [jax.device_put(jnp.asarray(f)) for f in frames]
        int(sum(jnp.sum(d[0], dtype=jnp.int32) for d in ds))
        return time.perf_counter() - t0

    # 16 pairs (two 8-pair chunks) so the pipeline's fill/drain ramp is
    # a minority of the wall, and best-of-2 runs — the same one-sided-
    # noise stance as the kernel rows (the link's drift only ever slows
    # a run down).
    with tempfile.TemporaryDirectory() as td:
        paths = []
        gop_frames = [j_ref]
        prev = j_ref
        for i in range(17):
            f = np.clip(
                np.roll(prev, (1, -2), (0, 1)).astype(np.int32)
                + rng.integers(-3, 4, prev.shape),
                0, 255,
            ).astype(np.uint8)
            p = os.path.join(td, f"f{i:03d}.yuv")
            save_yuv(p, f)
            paths.append(p)
            gop_frames.append(f)
            prev = f
        config = SearchConfig(
            blk_dim=8, span=12, metric="mse",
            frame_width=3840, frame_height=2160,
        )
        outdir = os.path.join(td, "out")
        runner.run_gop(paths[:2], config, output_dir=outdir, resume=False)
        probe_pass(gop_frames[:2])  # warm the tiny sum programs
        frame_mb = 2160 * 3840 / 1e6
        rates = [len(gop_frames[1:]) * frame_mb / probe_pass(gop_frames[1:])]
        gop_ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            runner.run_gop(paths, config, output_dir=outdir, resume=False)
            gop_ms = min(
                gop_ms,
                (time.perf_counter() - t0) / (len(paths) - 1) * 1e3,
            )
        post = np.stack(
            [rng.integers(0, 256, prev.shape, dtype=np.uint8)
             for _ in range(len(paths) - 1)]
        )
        rates.append(len(post) * frame_mb / probe_pass(post))
    link_bound_ms = frame_mb / max(rates) * 1e3
    record(
        "gop-e2e: synthetic-Jockey 4K GOP, SSD, blk 8, span 12 "
        "(pipelined end-to-end, link-bound; informational)",
        gop_ms,
    )
    record(
        "gop-e2e-pct: pct of bracketing link bound reached by the GOP "
        "pipeline (gated; higher is better)",
        100.0 * link_bound_ms / gop_ms,
    )

    os.makedirs(results_dir, exist_ok=True)
    out = os.path.join(results_dir, f"v{version}.txt")
    with open(out, "w") as f:
        f.write(
            "# TPU v5e, single chip. Search-KERNEL ms per frame, "
            "sync-amortized (motionestimation_tpu.bench --matrix):\n"
            "# N pairs chained through one jitted lax.map, result "
            "reduced on device, one host sync per timing.\n"
            "# MVs/costs identical to the fenced v1-v5 rows (same "
            "kernels); synthetic 4K/1080p stand-ins as in v5.txt.\n"
            "# diamond-worstcase rows: adversarial full-escalation "
            "content validating _staged_levels' <=1.4x bound.\n"
            "# gop-e2e row: end-to-end wall ms/frame (host link-bound; "
            "informational — the tunnel drifts ~2x between runs).\n"
            "# gop-e2e-pct row: pct of the bracketing link bound the "
            f"pipeline reached (gated: -{GOP_PCT_DROP:.0f} pts flags).\n"
        )
        for tag, ms in rows:
            f.write(f"[ {tag} ]\nkernel {ms:.4f} ms\n")
    print(f"wrote {out}")

    # v{N} vs v{N-1}: kernel rows under the reference 0.1 ms rule
    # (run.sh:79); the GOP row gated transport-normalized (compare_rows).
    prev_path = os.path.join(results_dir, f"v{version - 1}.txt")
    regressions = 0
    if os.path.exists(prev_path):
        prev_rows = dict(
            re.findall(
                r"\[ (.+?) \]\nkernel ([\d.]+) ms", open(prev_path).read()
            )
        )
        lines, regressions = compare_rows(rows, prev_rows)
        for line in lines:
            print(line)
    return 1 if regressions else 0
