"""Diamond search (LDSP/SDSP) block matching.

The reference implements only exhaustive full search (SURVEY.md §2); this
module is the fast-search algorithm the BASELINE configs require ("diamond
search (LDSP/SDSP) with early termination parity"). Since there is no C
oracle, the semantics below are *canonical by definition* and pinned by
`diamond_search_np` (plain numpy, the golden model); the batched JAX/TPU
version must reproduce its trajectories exactly (tests/test_diamond.py).

Canonical semantics
-------------------
Geometry, costs, and validity are identical to full search: truncated edge
blocks (prediction_frame.c:21-22), clamped windows — a displacement d is
legal iff the candidate block lies fully in-frame and |d| <= span
component-wise (main.c:53-54,73-76) — MSE compared on exact integer SSD
(strict <), SSIM on the float32 score (strict >).

Per block, starting from center d = (0, 0):

1. LDSP: evaluate the 9 large-diamond candidates around the center, in
   raster order
       (-2,0) (-1,-1) (-1,1) (0,-2) (0,0) (0,2) (1,-1) (1,1) (2,0);
   out-of-window candidates are skipped. First-in-order wins ties. If the
   winner is the center (offset (0,0)), LDSP converges; otherwise the
   center moves to the winner and LDSP repeats, up to `max_steps`
   iterations (default span + 2 — the step cap is part of the canonical
   trajectory definition, not just an implementation bound).
2. Early termination: if at the start of an LDSP round the center's
   per-pixel cost beats `early_term` (MSE <= threshold, SSIM >= threshold),
   the search stops and the MV is the center — SDSP is skipped too.
3. SDSP: one evaluation of the 5 small-diamond candidates, raster order
       (-1,0) (0,-1) (0,0) (0,1) (1,0);
   the final MV is the winner.

All blocks run in lockstep on TPU: a fixed `max_steps` fori_loop with a
per-block active mask (converged / early-terminated blocks stop updating),
then one masked SDSP pass — data-dependent per-block trajectories with no
data-dependent control flow, as XLA requires.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from motionestimation_tpu.core import geometry
from motionestimation_tpu.metrics import cost as cost_lib
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.search.full_search import MotionField

LDSP = ((-2, 0), (-1, -1), (-1, 1), (0, -2), (0, 0),
        (0, 2), (1, -1), (1, 1), (2, 0))
SDSP = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))


def default_max_steps(span: int) -> int:
    return span + 2


# ---------------------------------------------------------------------------
# Golden numpy model — defines the canonical trajectories.
# ---------------------------------------------------------------------------


def _np_cost(cur_blk, ref, tl_y, tl_x, h, w, d_y, d_x, span, metric,
             frame_height, frame_width):
    """Cost of displacement (d_y, d_x), or None if out of window."""
    if abs(d_y) > span or abs(d_x) > span:
        return None
    y, x = tl_y + d_y, tl_x + d_x
    if y < 0 or x < 0 or y + h > frame_height or x + w > frame_width:
        return None
    patch = ref[y : y + h, x : x + w].astype(np.int64)
    if metric == "mse":
        d = cur_blk.astype(np.int64) - patch
        return int(np.sum(d * d))
    if metric == "sad":
        d = cur_blk.astype(np.int64) - patch
        return int(np.sum(np.abs(d)))
    n = h * w
    sum_ref, sum_cur = int(patch.sum()), int(cur_blk.sum())
    score = cost_lib.ssim_from_sums(
        jnp.int32(sum_ref),
        jnp.int32(np.sum(patch * patch)),
        jnp.int32(sum_cur),
        jnp.int32(np.sum(cur_blk.astype(np.int64) ** 2)),
        jnp.int32(np.sum(patch * cur_blk.astype(np.int64))),
        jnp.int32(n),
    )
    return float(score)


def diamond_search_np(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    early_term: float | None = None,
    max_steps: int | None = None,
):
    """Golden diamond search. Returns (mv_y, mv_x, best_cost, trajectory)
    with trajectory [max_steps + 1, nby, nbx, 2] — the center after each
    LDSP round (frozen once converged), trajectory[0] = (0, 0)."""
    if max_steps is None:
        max_steps = default_max_steps(span)
    frame_height, frame_width = cur.shape
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    mv_y = np.zeros((nby, nbx), np.int32)
    mv_x = np.zeros((nby, nbx), np.int32)
    best = np.zeros((nby, nbx), np.float64)
    traj = np.zeros((max_steps + 1, nby, nbx, 2), np.int32)
    minimise = metric in ("mse", "sad")

    for by in range(nby):
        for bx in range(nbx):
            tl_y, tl_x = by * blk_dim, bx * blk_dim
            h = min(blk_dim, frame_height - tl_y)
            w = min(blk_dim, frame_width - tl_x)
            blk = cur[tl_y : tl_y + h, tl_x : tl_x + w]

            def cost(d_y, d_x):
                return _np_cost(
                    blk, ref, tl_y, tl_x, h, w, d_y, d_x, span, metric,
                    frame_height, frame_width,
                )

            cy = cx = 0
            ccost = cost(0, 0)
            done = False
            for step in range(max_steps):
                if not done:
                    if early_term is not None:
                        # float32 on both sides: matches the TPU compare.
                        per_px = (
                            np.float32(ccost) / np.float32(h * w)
                            if minimise
                            else np.float32(ccost)
                        )
                        if (minimise and per_px <= np.float32(early_term)) or (
                            not minimise and per_px >= np.float32(early_term)
                        ):
                            done = True
                    if not done:
                        wy, wx, wcost = 0, 0, ccost
                        for oy, ox in LDSP:
                            c = cost(cy + oy, cx + ox)
                            if c is None:
                                continue
                            if (minimise and c < wcost) or (
                                not minimise and c > wcost
                            ):
                                wy, wx, wcost = oy, ox, c
                        if (wy, wx) == (0, 0):
                            done = True
                        else:
                            cy, cx, ccost = cy + wy, cx + wx, wcost
                traj[step + 1, by, bx] = (cy, cx)
            early = False
            if early_term is not None:
                per_px = (
                    np.float32(ccost) / np.float32(h * w)
                    if minimise
                    else np.float32(ccost)
                )
                early = (minimise and per_px <= np.float32(early_term)) or (
                    not minimise and per_px >= np.float32(early_term)
                )
            if not early:
                # SDSP offsets are relative to the (fixed) pre-SDSP center.
                wy, wx, wcost = 0, 0, ccost
                for oy, ox in SDSP:
                    c = cost(cy + oy, cx + ox)
                    if c is None:
                        continue
                    if (minimise and c < wcost) or (
                        not minimise and c > wcost
                    ):
                        wy, wx, wcost = oy, ox, c
                cy, cx, ccost = cy + wy, cx + wx, wcost
            mv_y[by, bx], mv_x[by, bx] = cy, cx
            best[by, bx] = ccost
    return mv_y, mv_x, best, traj


# ---------------------------------------------------------------------------
# Static round plan for the lazy replay.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _round_plan(span: int, max_steps: int):
    """Static fill/lookup schedule shared by every block.

    The set of *possible* centers after t LDSP rounds is data-independent:
    R_0 = {(0,0)}, R_{t+1} = clamp(R_t ⊕ LDSP). Round t can therefore only
    ever look up displacements in R_{t+1} (LDSP around centers in R_t) and
    — for blocks that converge this round — SDSP around centers in
    R_{t+1}. Round t's *candidate* fill list is that whole set; at run
    time each plane is additionally gated on "some still-active block's
    center is within Chebyshev distance 3 of it" plus a not-yet-filled
    mask, so the planes actually evaluated track the data-dependent
    trajectory support, not the worst-case reachable ring (a handful of
    straggler blocks no longer pays for a whole ring).

    Returns (need_lists, radii, sdsp_radius):
      need_lists[t]: sorted flat displacement indices any round-t lookup
        (LDSP now, SDSP later) could touch — cumulative, since
        R_t ⊆ R_{t+1},
      radii[t]: Chebyshev radius bounding every round-t lookup,
      sdsp_radius: radius bounding the post-loop SDSP lookups.
    """
    k = 2 * span + 1

    def clamped(ps):
        return {
            (y, x) for (y, x) in ps if abs(y) <= span and abs(x) <= span
        }

    def flat(p):
        return (p[0] + span) * k + (p[1] + span)

    reach = {(0, 0)}
    need_lists, radii = [], []
    for _ in range(max_steps):
        r_c = max((max(abs(y), abs(x)) for y, x in reach), default=0)
        radii.append(min(r_c + 2, span))
        nxt = clamped(
            {(y + oy, x + ox) for (y, x) in reach for oy, ox in LDSP}
        )
        need = nxt | clamped(
            {(y + oy, x + ox) for (y, x) in nxt for oy, ox in SDSP}
        )
        need_lists.append(tuple(sorted(flat(p) for p in need)))
        reach = nxt
    sdsp_radius = min(
        max((max(abs(y), abs(x)) for y, x in reach), default=0) + 1, span
    )
    return tuple(need_lists), tuple(radii), sdsp_radius


# ---------------------------------------------------------------------------
# Batched JAX version.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "metric", "early_term", "max_steps",
        "record_trajectory", "frame_height", "frame_width",
        "track_escape",
    ),
)
def _diamond_replay(
    volume,
    y_origin=0,
    x_origin=0,
    *,
    blk_dim: int,
    span: int,
    metric: str,
    early_term,
    max_steps: int,
    record_trajectory: bool,
    frame_height: int,
    frame_width: int,
    track_escape: bool = False,
):
    """Replay the canonical diamond trajectory over a [K², nby, nbx] cost
    volume.

    TPU-shaped evaluation: the volume is materialised ONCE (Pallas fast
    kernel for MSE blk<=16, else a bandwidth-bound XLA scan — exactly the
    costs the canonical model computes, sentinel-masked for invalid
    displacements), then the trajectory is replayed with volume lookups.
    Per-block data-dependent *windows* (the natural formulation) need
    whole-frame gathers, and XLA:TPU lowers arbitrary gathers near-scalar
    — measured ~31 ms per candidate evaluation at 1080p (~7.7 s/frame);
    the volume replay runs the same frame in tens of milliseconds.
    Lookups avoid gathers too: a one-hot of the center index once per
    step, multiplied against *statically* shifted volume slices (pattern
    offsets are compile-time constants).

    With `track_escape`, `span` is interpreted as the RADIUS of a
    volume cropped below the true search window (the staged-volume fast
    path, `_diamond_staged`): the third return value marks blocks whose
    trajectory could touch displacements beyond the crop — any block
    whose center exceeds Chebyshev radius span-2 while still active
    (its LDSP lookups reach center+2), or span-1 at the SDSP step. Up to
    the first such event the trajectory is exactly canonical, so
    non-escaped blocks are exact and escaped ones are recomputed at the
    next level.

    (y_origin, x_origin) — traced global coordinates of the volume's
    first block's top-left pixel: (0, 0) for whole-frame volumes, the
    shard origin for per-tile volumes under shard_map (they only affect
    the truncated-extent pixel counts used by early_term and the mean
    score; window validity is encoded in the volume's sentinels)."""
    _, nby, nbx = volume.shape
    minimise = metric in ("mse", "sad")
    k = 2 * span + 1

    tl_y, tl_x, blk_h, blk_w = geometry.block_extents(
        y_origin, x_origin, nby, nbx, blk_dim, frame_height, frame_width
    )
    count = blk_h * blk_w

    if minimise:
        sentinel = jnp.int32(cost_lib.INT32_MAX)
        zero = jnp.int32(0)
    else:
        sentinel = jnp.float32(-jnp.inf)
        zero = jnp.float32(0)

    def lookup(cy, cx, offsets, radius):
        """Costs of center+offset per block over the radius-capped
        subvolume (the round schedule bounds |center| <= radius-2, so
        every in-window target stays inside); out-of-window lookups
        yield the sentinel."""
        m = 2 * radius + 1
        sub = lax.slice(
            volume.reshape(k, k, nby, nbx),
            (span - radius, span - radius, 0, 0),
            (span + radius + 1, span + radius + 1, nby, nbx),
        ).reshape(m * m, nby, nbx)
        pad = 2 * m + 2  # >= max |oy*m + ox| over LDSP/SDSP
        sub_p = jnp.pad(
            sub, ((pad, pad), (0, 0), (0, 0)), constant_values=sentinel
        )
        flat = (cy + radius) * m + (cx + radius)
        onehot = (
            lax.broadcasted_iota(jnp.int32, (m * m, nby, nbx), 0)
            == flat[None]
        )
        outs = []
        for o_y, o_x in offsets:
            delta = o_y * m + o_x
            v = lax.slice_in_dim(
                sub_p, pad + delta, pad + delta + m * m, axis=0
            )
            c = jnp.sum(jnp.where(onehot, v, zero), axis=0)
            # A horizontal step off the window edge aliases the flat index
            # into the adjacent dy row — mask it (vertical misses fall in
            # the sentinel padding already, but mask uniformly).
            ok = (jnp.abs(cy + o_y) <= span) & (jnp.abs(cx + o_x) <= span)
            outs.append(jnp.where(ok, c, sentinel))
        return outs

    def better(c, best):
        return (c < best) if minimise else (c > best)

    def pattern_step(cy, cx, ccost, offsets, radius):
        """Evaluate a diamond pattern; returns winning (offset, cost) per
        block — (0,0) with ccost when nothing beats the center. Evaluation
        order = list order, so strict comparison keeps
        first-in-order-wins ties."""
        offs = [o for o in offsets if o != (0, 0)]  # center is incumbent
        costs = lookup(cy, cx, offs, radius)
        wy = jnp.zeros_like(cy)
        wx = jnp.zeros_like(cx)
        wc = ccost
        for (o_y, o_x), c in zip(offs, costs):
            take = better(c, wc)
            wy = jnp.where(take, o_y, wy)
            wx = jnp.where(take, o_x, wx)
            wc = jnp.where(take, c, wc)
        return wy, wx, wc

    def early_mask(ccost):
        if early_term is None:
            return jnp.zeros(ccost.shape, bool)
        if minimise:
            per_px = ccost.astype(jnp.float32) / jnp.maximum(
                count, 1
            ).astype(jnp.float32)
            return per_px <= jnp.float32(early_term)
        return ccost >= jnp.float32(early_term)

    cy = jnp.zeros((nby, nbx), jnp.int32)
    cx = jnp.zeros((nby, nbx), jnp.int32)
    ccost = volume[span * k + span]
    active = jnp.ones((nby, nbx), bool)
    terminated = jnp.zeros((nby, nbx), bool)
    escaped = jnp.zeros((nby, nbx), bool)

    # Rounds are Python-unrolled: each gets a static radius cap
    # (|center| grows by <= 2 per round) so lookups touch only the
    # reachable subvolume, and the whole round sits under lax.cond —
    # skipped for free once every block converged/terminated.
    state = (cy, cx, ccost, active, terminated, escaped)
    trajs = (
        [jnp.zeros((nby, nbx, 2), jnp.int32)] if record_trajectory else None
    )
    for t in range(max_steps):
        radius_t = min(2 * t + 2, span)

        def ldsp_round(st, radius_t=radius_t):
            cy, cx, ccost, active, terminated, escaped = st
            hit = early_mask(ccost) & active
            terminated = terminated | hit
            active = active & ~hit
            if track_escape:
                escaped = escaped | (
                    active
                    & (jnp.maximum(jnp.abs(cy), jnp.abs(cx)) > span - 2)
                )
            wy, wx, wc = pattern_step(cy, cx, ccost, LDSP, radius_t)
            moved = active & ((wy != 0) | (wx != 0))
            active = active & moved
            cy = jnp.where(moved, cy + wy, cy)
            cx = jnp.where(moved, cx + wx, cx)
            ccost = jnp.where(moved, wc, ccost)
            return cy, cx, ccost, active, terminated, escaped

        state = lax.cond(jnp.any(state[3]), ldsp_round, lambda s: s, state)
        if record_trajectory:
            trajs.append(jnp.stack([state[0], state[1]], axis=-1))
    cy, cx, ccost, active, terminated, escaped = state
    traj = jnp.stack(trajs) if record_trajectory else None

    # Post-loop early check mirrors the golden model's final-state check.
    terminated = terminated | early_mask(ccost)

    sdsp_radius = min(2 * max_steps + 1, span)
    wy, wx, wc = pattern_step(cy, cx, ccost, SDSP, sdsp_radius)
    apply_sdsp = ~terminated
    if track_escape:
        escaped = escaped | (
            apply_sdsp
            & (jnp.maximum(jnp.abs(cy), jnp.abs(cx)) > span - 1)
        )
    cy = jnp.where(apply_sdsp, cy + wy, cy)
    cx = jnp.where(apply_sdsp, cx + wx, cx)
    ccost = jnp.where(apply_sdsp, wc, ccost)

    if minimise:
        best = ccost.astype(jnp.int32)
        mean = (
            cost_lib.mse_from_ssd(best, count)
            if metric == "mse"
            else cost_lib.mad_from_sad(best, count)
        )
        field = MotionField(cy, cx, best, mean)
    else:
        k = 2 * span + 1
        flat = (cy + span) * k + (cx + span)
        field = MotionField(cy, cx, flat, ccost)
    return field, traj, escaped


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "metric", "early_term", "max_steps",
        "record_trajectory", "frame_height", "frame_width",
    ),
)
def _diamond_lazy(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str,
    early_term,
    max_steps: int,
    record_trajectory: bool,
    frame_height: int,
    frame_width: int,
):
    """Lazy diamond replay: evaluate only reachable candidates, round by
    round.

    The work-efficient TPU formulation (round-2 verdict item 2): instead
    of materialising the full [K², nby, nbx] cost volume (2.1 GB of HBM
    traffic at 4K ±31 blk 8) and replaying over it, cost planes are
    computed lazily — before round t, one `lax.scan` over the round's
    static fill group (see `_round_plan`) evaluates those displacement
    planes with the *same* `make_displacement_cost` closure the golden
    full search uses (bit-identical costs ⇒ identical trajectories), and
    the whole round, fill included, is skipped by `lax.cond` once every
    block has converged or early-terminated. Lookups of per-block centers
    stay gather-free: a one-hot over the round's radius-capped subvolume
    times statically shifted slices, exactly the `_diamond_replay`
    scheme but on a (2r_t+1)² window instead of K².

    Evaluated candidates therefore scale with the actual trajectory
    depth t*: O(t*²) planes instead of K², which is what makes diamond
    *cheaper* than full search (the full-volume replay computed strictly
    more).
    """
    cur_p = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
    ref_halo = fs.make_ref_halo(
        ref, frame_height, frame_width, blk_dim, span
    )
    hp, wp = cur_p.shape
    nby, nbx = hp // blk_dim, wp // blk_dim
    minimise = metric in ("mse", "sad")
    k = 2 * span + 1

    disp_cost = fs.make_displacement_cost(
        cur_p, ref_halo, 0, 0,
        frame_height=frame_height, frame_width=frame_width,
        blk_dim=blk_dim, span=span, metric=metric,
    )
    need_lists, radii, sdsp_radius = _round_plan(span, max_steps)

    if minimise:
        sentinel = jnp.int32(cost_lib.INT32_MAX)
        zero = jnp.int32(0)
        dtype = jnp.int32
    else:
        sentinel = jnp.float32(-jnp.inf)
        zero = jnp.float32(0)
        dtype = jnp.float32
    # Slot k*k is a write dump: skipped planes write their (sentinel)
    # result there, keeping the scan's volume update UNconditional — a
    # lax.cond around a dynamic_update_slice of the whole volume would
    # copy the 30+ MB carry per step. Only the small [nby, nbx] plane
    # evaluation sits under the cond.
    vol = jnp.full((k * k + 1, nby, nbx), sentinel, dtype)
    filled = jnp.zeros((k * k,), bool)

    def fill(vol, filled, idxs, cy, cx, active):
        """Evaluate the planes in `idxs` that (a) aren't filled yet and
        (b) lie within Chebyshev distance 3 of some active block's
        center — the reach of this round's LDSP lookups plus next-step
        SDSP (|LDSP offset| <= 2 plus |SDSP offset| <= 1)."""

        def body(carry, idx):
            v, f = carry
            v_y = idx // k - span
            v_x = idx % k - span
            near = jnp.any(
                active
                & (jnp.abs(cy - v_y) <= 3)
                & (jnp.abs(cx - v_x) <= 3)
            )
            need = near & ~f[idx]
            c = lax.cond(
                need,
                lambda _: disp_cost(idx),
                lambda _: jnp.full((nby, nbx), sentinel, dtype),
                0,
            )
            write_idx = jnp.where(need, idx, k * k)
            v = lax.dynamic_update_slice(v, c[None], (write_idx, 0, 0))
            f = f.at[idx].set(f[idx] | need)
            return (v, f), None

        (v, f), _ = lax.scan(
            body, (vol, filled), jnp.asarray(idxs, jnp.int32)
        )
        return v, f

    def lookup(vol, cy, cx, offsets, radius):
        """Costs of center+offset per block over the radius-capped
        subvolume; out-of-window lookups yield the sentinel. Centers are
        bounded by radius-2 (static round plan), so every in-window
        center+offset stays inside the subwindow."""
        m = 2 * radius + 1
        sub = lax.slice(
            lax.slice_in_dim(vol, 0, k * k, axis=0).reshape(
                k, k, nby, nbx
            ),
            (span - radius, span - radius, 0, 0),
            (span + radius + 1, span + radius + 1, nby, nbx),
        ).reshape(m * m, nby, nbx)
        pad = 2 * m + 2
        sub_p = jnp.pad(
            sub, ((pad, pad), (0, 0), (0, 0)), constant_values=sentinel
        )
        flat = (cy + radius) * m + (cx + radius)
        onehot = (
            lax.broadcasted_iota(jnp.int32, (m * m, nby, nbx), 0)
            == flat[None]
        )
        outs = []
        for o_y, o_x in offsets:
            delta = o_y * m + o_x
            v = lax.slice_in_dim(
                sub_p, pad + delta, pad + delta + m * m, axis=0
            )
            c = jnp.sum(jnp.where(onehot, v, zero), axis=0)
            # Horizontal steps off the window edge alias into the
            # adjacent dy row — mask any out-of-window target uniformly.
            ok = (jnp.abs(cy + o_y) <= span) & (jnp.abs(cx + o_x) <= span)
            outs.append(jnp.where(ok, c, sentinel))
        return outs

    def better(c, best):
        return (c < best) if minimise else (c > best)

    def pattern_step(vol, cy, cx, ccost, offsets, radius):
        offs = [o for o in offsets if o != (0, 0)]  # center is incumbent
        costs = lookup(vol, cy, cx, offs, radius)
        wy = jnp.zeros_like(cy)
        wx = jnp.zeros_like(cx)
        wc = ccost
        for (o_y, o_x), c in zip(offs, costs):
            take = better(c, wc)
            wy = jnp.where(take, o_y, wy)
            wx = jnp.where(take, o_x, wx)
            wc = jnp.where(take, c, wc)
        return wy, wx, wc

    tl_y, tl_x, blk_h, blk_w = geometry.block_extents(
        0, 0, nby, nbx, blk_dim, frame_height, frame_width
    )
    count = blk_h * blk_w

    def early_mask(ccost):
        if early_term is None:
            return jnp.zeros(ccost.shape, bool)
        if minimise:
            per_px = ccost.astype(jnp.float32) / jnp.maximum(
                count, 1
            ).astype(jnp.float32)
            return per_px <= jnp.float32(early_term)
        return ccost >= jnp.float32(early_term)

    # Seed the (0,0) start unconditionally.
    centre = span * k + span
    vol = lax.dynamic_update_slice(
        vol, disp_cost(jnp.int32(centre))[None], (centre, 0, 0)
    )
    filled = filled.at[centre].set(True)
    cy = jnp.zeros((nby, nbx), jnp.int32)
    cx = jnp.zeros((nby, nbx), jnp.int32)
    ccost = vol[centre]
    active = jnp.ones((nby, nbx), bool)
    terminated = jnp.zeros((nby, nbx), bool)

    state = (vol, filled, cy, cx, ccost, active, terminated)
    trajs = [jnp.zeros((nby, nbx, 2), jnp.int32)] if record_trajectory else None

    for t in range(max_steps):

        def round_fn(st, t=t):
            vol, filled, cy, cx, ccost, active, terminated = st
            hit = early_mask(ccost) & active
            terminated = terminated | hit
            active = active & ~hit
            vol, filled = fill(
                vol, filled, need_lists[t], cy, cx, active
            )
            wy, wx, wc = pattern_step(vol, cy, cx, ccost, LDSP, radii[t])
            moved = active & ((wy != 0) | (wx != 0))
            active = active & moved
            cy = jnp.where(moved, cy + wy, cy)
            cx = jnp.where(moved, cx + wx, cx)
            ccost = jnp.where(moved, wc, ccost)
            return (vol, filled, cy, cx, ccost, active, terminated)

        state = lax.cond(jnp.any(state[5]), round_fn, lambda s: s, state)
        if record_trajectory:
            trajs.append(jnp.stack([state[2], state[3]], axis=-1))

    vol, filled, cy, cx, ccost, active, terminated = state
    terminated = terminated | early_mask(ccost)

    wy, wx, wc = pattern_step(vol, cy, cx, ccost, SDSP, sdsp_radius)
    apply_sdsp = ~terminated
    cy = jnp.where(apply_sdsp, cy + wy, cy)
    cx = jnp.where(apply_sdsp, cx + wx, cx)
    ccost = jnp.where(apply_sdsp, wc, ccost)

    if minimise:
        best = ccost.astype(jnp.int32)
        mean = (
            cost_lib.mse_from_ssd(best, count)
            if metric == "mse"
            else cost_lib.mad_from_sad(best, count)
        )
        field = MotionField(cy, cx, best, mean)
    else:
        flat = (cy + span) * k + (cx + span)
        field = MotionField(cy, cx, flat, ccost)
    traj = jnp.stack(trajs) if record_trajectory else None
    return field, traj


def diamond_search_frame(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    early_term: float | None = None,
    max_steps: int | None = None,
    record_trajectory: bool = False,
    volume_mode: str = "auto",
    escape_policy: str = "canonical",
):
    """Whole-frame diamond search. cur/ref: [H, W] u8/i32 arrays.

    escape_policy: "canonical" (default — staged escalation, results
    bit-exact vs `diamond_search_np` in every mode) or "crossover"
    (staged path only, MSE/SAD: blocks escaping the first level take
    the fused full-search argmin instead of escalating volumes —
    adversarial worst case drops from ~1.4x the full-volume replay to
    level-1 + one fused search, at the flagged cost of escaped blocks
    returning the global optimum instead of the canonical diamond
    endpoint; see `_diamond_staged`).

    volume_mode:
      "auto" / "staged" — adaptive staged volumes (MSE/SAD at blk 4-32,
        `staged_supported`; falls back to "lazy" otherwise — SSIM stays
        lazy): compute a radius-capped Pallas
        cost volume (radii from `_staged_levels`, e.g. 6 then span),
        replay over it, and
        escalate — under `lax.cond`, so skipped levels cost nothing —
        only when some block's trajectory could leave the cap. Typical
        content stays at the first level (169 candidate planes at fused-
        kernel efficiency vs (2s+1)² for full search), which is what
        makes diamond *cheaper* than full search; worst case (every
        block travels far) is bounded <= 1.4x the full volume BY
        CONSTRUCTION of the level set (see `_staged_levels`; validated
        on chip, results/tpu/v8.txt diamond-worstcase rows).
      "lazy" — evaluate only diamond-reachable candidate planes round by
        round with the golden XLA evaluator; works for every metric and
        block size, no Pallas dependency.
      "full" — materialise the whole [K², nby, nbx] volume up front and
        replay (cross-checking / Pallas-volume consumer).
    All modes produce identical MVs, costs, and trajectories.

    Returns a MotionField, or (MotionField, trajectory) when
    `record_trajectory` — trajectory [max_steps+1, nby, nbx, 2] matches
    `diamond_search_np` exactly.
    """
    if cur.shape != ref.shape:
        raise ValueError(
            f"current and reference frames must have identical shapes, "
            f"got {cur.shape} vs {ref.shape}"
        )
    if metric not in ("mse", "sad", "ssim"):
        raise ValueError(f"unknown metric {metric!r}")
    if volume_mode not in ("auto", "staged", "lazy", "full"):
        raise ValueError(f"unknown volume_mode {volume_mode!r}")
    frame_height, frame_width = cur.shape
    if max_steps is None:
        max_steps = default_max_steps(span)
    if escape_policy == "crossover" and (
        volume_mode not in ("auto", "staged")
        or not staged_supported(blk_dim, span, metric)
        or metric == "ssim"
    ):
        raise ValueError(
            "escape_policy='crossover' requires the staged MSE/SAD fast "
            f"path (volume_mode auto/staged; blk_dim={blk_dim}, "
            f"span={span}, metric={metric!r} not covered)"
        )
    if volume_mode in ("auto", "staged"):
        use_staged = staged_supported(blk_dim, span, metric)
        if metric == "ssim" and volume_mode == "auto":
            # Off-TPU the SSIM volume source is the golden full-plane
            # scan — strictly more work than lazy's reachable planes.
            use_staged = use_staged and jax.default_backend() == "tpu"
        if use_staged:
            field, traj = _diamond_staged(
                cur, ref,
                blk_dim=blk_dim, span=span, metric=metric,
                early_term=early_term, max_steps=max_steps,
                record_trajectory=record_trajectory,
                frame_height=frame_height, frame_width=frame_width,
                escape_policy=escape_policy,
            )
        else:
            volume_mode = "lazy"
    if volume_mode == "lazy":
        field, traj = _diamond_lazy(
            cur, ref,
            blk_dim=blk_dim, span=span, metric=metric,
            early_term=early_term, max_steps=max_steps,
            record_trajectory=record_trajectory,
            frame_height=frame_height, frame_width=frame_width,
        )
    elif volume_mode == "full":
        from motionestimation_tpu.kernels import full_search_pallas as _ker
        from motionestimation_tpu.kernels import ssim_pallas as _sker

        # Gate on the volume kernels' OWN coverage (not the staged-path
        # predicate, which additionally requires span >= 2): span-1
        # MSE/SAD configs take the fast Pallas volume too.
        fast_volume = (
            _sker.ssim_supported(blk_dim, span)
            if metric == "ssim"
            else _ker.volume_supported(blk_dim, span, metric)
        )
        if fast_volume:
            # Fast Pallas cost volume (bit-exact vs the golden tile's).
            if metric == "ssim":
                from motionestimation_tpu.kernels import ssim_pallas as sker

                volume = sker.ssim_volume_pallas(
                    cur, ref, blk_dim=blk_dim, span=span
                )
            else:
                from motionestimation_tpu.kernels import (
                    full_search_pallas as ker,
                )

                volume = ker.full_search_volume_pallas(
                    cur, ref, blk_dim=blk_dim, span=span, metric=metric
                )
        else:
            cur_p = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
            ref_halo = fs.make_ref_halo(
                ref, frame_height, frame_width, blk_dim, span
            )
            _, volume = _golden_volume_jit(
                cur_p, ref_halo,
                blk_dim=blk_dim, span=span, metric=metric,
                frame_height=frame_height, frame_width=frame_width,
            )
        field, traj, _ = _diamond_replay(
            volume,
            blk_dim=blk_dim, span=span, metric=metric,
            early_term=early_term, max_steps=max_steps,
            record_trajectory=record_trajectory,
            frame_height=frame_height, frame_width=frame_width,
        )
    if record_trajectory:
        return field, traj
    return field


def staged_supported(blk_dim: int, span: int, metric: str) -> bool:
    """Whether the adaptive staged-volume fast path covers this config:
    MSE/SAD wherever the Pallas volume kernel (or its golden off-TPU
    fallback) can emit level volumes — blk <= 16 via the chunked/phase
    families, blk 32 via the phase kernel's int32 sliding-sum fold —
    and SSIM wherever the fast SSIM kernel's float-score volume
    emission covers (blk <= 16). Note: in `volume_mode="auto"` SSIM
    only takes this path on real TPU — off-TPU the SSIM volume falls
    back to the golden full-plane scan, which evaluates MORE planes
    than the lazy path, so "auto" keeps lazy there."""
    from motionestimation_tpu.kernels import full_search_pallas as ker
    from motionestimation_tpu.kernels import ssim_pallas as ssim_ker

    if span < 2:
        return False
    if metric == "ssim":
        return ssim_ker.ssim_supported(blk_dim, span)
    return ker.volume_supported(blk_dim, span, metric)


def _staged_levels(span: int) -> tuple[int, ...]:
    """Volume radii to try in order: a subset of {6, 12, 24, ...} plus
    the full span.

    The worst case (content escalating through EVERY level) computes the
    sum of all level volumes, so levels are chosen to BOUND it: a
    candidate level r is kept iff planes(r) = (2r+1)² is at most
    0.3 * planes(span). Kept levels double in radius, i.e. roughly
    quadruple in planes, so the kept sum is <= 0.3 * (1 + 1/4 + 1/16 +
    ...) = 0.4 * planes(span) — the staged worst case is <= 1.4x the
    full volume BY CONSTRUCTION (validated on chip:
    results/tpu/v8.txt diamond-worstcase rows). Consequences: span 12
    -> (6, 12); span 15 -> (6, 15) (the former intermediate 12 cost
    more than it could save); span <= ~10 -> (span,) alone (staging
    cannot save enough to risk the escalation).

    6 (escape only past Chebyshev radius 4) keeps ordinary slow-motion
    content — including blocks that overshoot the true MV by a few
    steps — at the first level; starting lower was measured to escalate
    whole frames on a handful of |c|=3 stragglers."""
    full = (2 * span + 1) ** 2
    levels = []
    r = 6
    while r < span:
        if (2 * r + 1) ** 2 <= 0.3 * full:
            levels.append(r)
        r *= 2
    levels.append(span)
    return tuple(levels)


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "metric", "early_term", "max_steps",
        "record_trajectory", "frame_height", "frame_width",
        "escape_policy",
    ),
)
def _diamond_staged(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    early_term,
    max_steps: int,
    record_trajectory: bool,
    frame_height: int,
    frame_width: int,
    metric: str = "mse",
    escape_policy: str = "canonical",
):
    """Adaptive staged-volume diamond (MSE/SAD, blk_dim <= 32 — see
    `staged_supported`).

    Level r computes the radius-r sub-window cost volume with the fused
    Pallas volume kernel — identical integer costs to the golden path
    for every |d|∞ <= r (a displacement's cost does not depend on the
    window size) — and replays the canonical trajectory over it with
    escape tracking (`_diamond_replay(track_escape=True)`). Blocks that
    never approach the cap are exactly canonical; the rest are
    recomputed at the next level, whose whole computation sits under a
    `lax.cond` and is skipped when nothing escaped. The last level is
    the full span, where no escape is possible, so the result is always
    bit-exact vs `diamond_search_np`.

    escape_policy (round-4 verdict item 3 — adversarial crossover):
      "canonical" — escalate through staged level volumes as above;
        worst case <= 1.4x the full-volume replay BY CONSTRUCTION
        (`_staged_levels`), but ~3.8x the *fused* full search a user
        could have run instead.
      "crossover" — when any block escapes the first level, route ALL
        escaped blocks through the fused full-search argmin instead of
        escalating volumes. Escaped blocks get the raster-first-wins
        GLOBAL optimum rather than the canonical diamond trajectory
        endpoint (a flagged, non-default deviation; non-escaped blocks
        stay exactly canonical and every returned cost is exact), and
        the adversarial worst case becomes level-1 + one fused search.
        Threshold note: the level volumes are dense over all blocks, so
        escalation cost is independent of HOW MANY blocks escaped —
        measured, the crossover wins whenever any block escalates to
        the top level, hence the trigger is any-escape rather than a
        tuned fraction (see bench.py diamond_crossover_* fields).
        MSE/SAD only; trajectories are not recorded in this mode.
    """
    from motionestimation_tpu.kernels import full_search_pallas as ker
    from motionestimation_tpu.kernels import ssim_pallas as ssim_ker

    if escape_policy not in ("canonical", "crossover"):
        raise ValueError(f"unknown escape_policy {escape_policy!r}")
    if escape_policy == "crossover" and (
        record_trajectory or metric == "ssim"
    ):
        raise ValueError(
            "escape_policy='crossover' supports MSE/SAD without "
            "trajectory recording (escaped blocks take the full-search "
            "argmin, which has no diamond trajectory)"
        )

    levels = _staged_levels(span)

    def run_level(r):
        if metric == "ssim":
            vol = ssim_ker.ssim_volume_pallas(
                cur, ref, blk_dim=blk_dim, span=r
            )
        else:
            vol = ker.full_search_volume_pallas(
                cur, ref, blk_dim=blk_dim, span=r, metric=metric
            )
        field, traj, esc = _diamond_replay(
            vol,
            blk_dim=blk_dim, span=r, metric=metric,
            early_term=early_term, max_steps=max_steps,
            record_trajectory=record_trajectory,
            frame_height=frame_height, frame_width=frame_width,
            track_escape=(r < span),
        )
        if traj is None:
            traj = jnp.zeros((0,), jnp.int32)  # uniform pytree for cond
        return field, traj, esc

    field, traj, esc = run_level(levels[0])
    if escape_policy == "crossover" and levels[1:]:

        def crossover(state):
            field, traj, esc = state
            if jax.default_backend() == "tpu":
                f2 = ker.full_search_frame_pallas(
                    cur, ref, blk_dim=blk_dim, span=span, metric=metric,
                )
            else:
                f2 = fs.full_search_frame(
                    cur, ref, blk_dim=blk_dim, span=span, metric=metric,
                )
            merged = MotionField(
                jnp.where(esc, f2.mv_y, field.mv_y),
                jnp.where(esc, f2.mv_x, field.mv_x),
                jnp.where(esc, f2.best_cost_i32, field.best_cost_i32),
                jnp.where(esc, f2.score, field.score),
            )
            return merged, traj, esc & False

        field, traj, esc = lax.cond(
            jnp.any(esc), crossover, lambda s: s, (field, traj, esc)
        )
    elif escape_policy == "canonical":
        for r in levels[1:]:

            def escalate(state, r=r):
                field, traj, esc = state
                f2, t2, e2 = run_level(r)
                e = esc[..., None]
                merged = MotionField(
                    jnp.where(esc, f2.mv_y, field.mv_y),
                    jnp.where(esc, f2.mv_x, field.mv_x),
                    jnp.where(esc, f2.best_cost_i32, field.best_cost_i32),
                    jnp.where(esc, f2.score, field.score),
                )
                if record_trajectory:
                    traj = jnp.where(e[None], t2, traj)
                return merged, traj, esc & e2

            field, traj, esc = lax.cond(
                jnp.any(esc), escalate, lambda s: s, (field, traj, esc)
            )
    if metric == "ssim":
        # Level volumes index flat displacements by THEIR radius; remap
        # the merged field's flat-index proxy to the true span so it
        # matches the lazy/full paths' convention.
        k_full = 2 * span + 1
        field = MotionField(
            field.mv_y,
            field.mv_x,
            (field.mv_y + span) * k_full + (field.mv_x + span),
            field.score,
        )
    if not record_trajectory:
        traj = None
    return field, traj


def diamond_search_tile(
    cur_tile,
    ref_halo,
    y_origin,
    x_origin,
    *,
    frame_height: int,
    frame_width: int,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    early_term: float | None = None,
    max_steps: int | None = None,
    record_trajectory: bool = False,
    use_pallas_volume: bool = False,
):
    """Per-shard diamond search over one mesh tile — the shard_map
    analogue of `diamond_search_frame`, with the shard's global origin
    supplied as a traced (y_origin, x_origin) pair so one compiled
    program serves every shard (BASELINE config 3 on a mesh; the mesh
    launch is the analogue of the CUDA grid at main_mse.cu:212-223).

    cur_tile: [th, tw] (multiples of blk_dim); ref_halo:
    [th + 2*span, tw + 2*span] from `parallel.halo.halo_exchange_2d` —
    diamond candidates reach at most ±span, exactly the full-search
    halo footprint, so the same exchange serves both algorithms.

    Every metric runs the staged-volume fast path per shard (level-r
    volumes from the sliced halo; per-shard escalation under lax.cond —
    a shard's level choice never affects exactness, so
    sharded == unsharded == `diamond_search_np` stays bit-exact).
    Volumes come from the Pallas kernels when `use_pallas_volume`
    (real-TPU shards: the phase kernel for MSE/SAD, the fast SSIM
    kernel's score emission for SSIM) and the golden XLA tile otherwise
    (bit-identical; interpret mode cannot lower the Pallas emit loops).

    Blocks truncated by the GLOBAL frame edge are exact here only on
    the golden-volume path; the Pallas volume assumes whole blocks and
    the sharded driver repairs the last global block row/column with a
    golden thin-slab pass (same contract as the full-search kernels).

    Returns (mv_y, mv_x, cost[, trajectory]) — cost is the integer
    SSD/SAD (or float SSIM score); trajectory as `diamond_search_np`.
    """
    th, tw = cur_tile.shape
    if th % blk_dim or tw % blk_dim:
        raise ValueError(
            f"tile dims must be multiples of blk_dim, got {th}x{tw}"
        )
    if max_steps is None:
        max_steps = default_max_steps(span)

    def level_volume(r):
        """Radius-r cost volume for this tile (sentinel at invalid)."""
        s0 = span - r
        rh = ref_halo[s0 : s0 + th + 2 * r, s0 : s0 + tw + 2 * r]
        if use_pallas_volume and metric in ("mse", "sad"):
            from motionestimation_tpu.kernels import full_search_pallas as ker

            return ker.full_search_volume_tile_pallas(
                cur_tile, rh, y_origin, x_origin,
                frame_height=frame_height, frame_width=frame_width,
                blk_dim=blk_dim, span=r, metric=metric,
            )
        if use_pallas_volume and metric == "ssim":
            from motionestimation_tpu.kernels import ssim_pallas as sker

            return sker.ssim_volume_tile_pallas(
                cur_tile, rh, y_origin, x_origin,
                frame_height=frame_height, frame_width=frame_width,
                blk_dim=blk_dim, span=r,
            )
        _, vol = fs.full_search_tile(
            cur_tile, rh, y_origin, x_origin,
            frame_height=frame_height, frame_width=frame_width,
            blk_dim=blk_dim, span=r, metric=metric,
            return_cost_volume=True,
        )
        return vol

    replay_kw = dict(
        blk_dim=blk_dim, metric=metric, early_term=early_term,
        max_steps=max_steps, record_trajectory=record_trajectory,
        frame_height=frame_height, frame_width=frame_width,
    )

    levels = _staged_levels(span)

    def run_level(r):
        field, traj, esc = _diamond_replay(
            level_volume(r), y_origin, x_origin, span=r,
            track_escape=(r < span), **replay_kw,
        )
        if traj is None:
            traj = jnp.zeros((0,), jnp.int32)  # uniform pytree for cond
        return field, traj, esc

    field, traj, esc = run_level(levels[0])
    for r in levels[1:]:

        def escalate(state, r=r):
            field, traj, esc = state
            f2, t2, e2 = run_level(r)
            e = esc[..., None]
            merged = MotionField(
                jnp.where(esc, f2.mv_y, field.mv_y),
                jnp.where(esc, f2.mv_x, field.mv_x),
                jnp.where(esc, f2.best_cost_i32, field.best_cost_i32),
                jnp.where(esc, f2.score, field.score),
            )
            if record_trajectory:
                traj = jnp.where(e[None], t2, traj)
            return merged, traj, esc & e2

        field, traj, esc = lax.cond(
            jnp.any(esc), escalate, lambda s: s, (field, traj, esc)
        )
    out = (
        field.mv_y,
        field.mv_x,
        field.score if metric == "ssim" else field.best_cost_i32,
    )
    return out + (traj,) if record_trajectory else out


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "metric", "frame_height", "frame_width"
    ),
)
def _golden_volume_jit(cur_p, ref_halo, *, blk_dim, span, metric,
                       frame_height, frame_width):
    return fs.full_search_tile(
        cur_p, ref_halo, 0, 0,
        frame_height=frame_height, frame_width=frame_width,
        blk_dim=blk_dim, span=span, metric=metric,
        return_cost_volume=True,
    )
