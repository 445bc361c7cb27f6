"""Exhaustive (full-search) block matching — the XLA golden path.

TPU-first reformulation of the reference's per-block scalar scan
(/root/reference/src/cpu/main.c:39-82): instead of per-block structs and a
thread pool, the whole frame is one array; for each of the (2·span+1)²
candidate displacements we slide the reference frame under the current frame
and block-reduce the squared difference, carrying a running
(best_cost, best_flat_index) argmin. Raster iteration order over the flat
displacement index plus strict-inequality updates reproduce the reference's
first-in-raster-order-wins tie rule bit-exactly (main.c:53-60; see
core.geometry for the proof sketch).

The tile-level function is the *unit of sharding*: the single-chip path
calls it once with the whole (block-padded) frame and a zero origin, the
`parallel` package calls it per shard with halo-exchanged reference borders
and a mesh-derived origin. Both therefore execute identical arithmetic,
which is what makes sharded == unsharded an exact invariant.

This module is also the "golden model": it runs unchanged on CPU
(jnp on the host backend) and is validated against the compiled reference
binaries on the bundled Foreman frames (tests/fixtures).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from motionestimation_tpu.core import geometry
from motionestimation_tpu.metrics import cost as cost_lib


class MotionField(NamedTuple):
    """Per-block search result, shape [nby, nbx] each.

    mv_x / mv_y: integer displacement, candidate_topleft − block_topleft
      (main.c:58-59).
    best_cost_i32: exact integer SSD (MSE search) or SAD (SAD search); for
      SSIM this is the flat index cost proxy — SSIM search returns the
      score in `score` instead.
    score: float32 cost — MSE (SSD / (w·h), main.c:27), MAD (SAD / (w·h)),
      or SSIM score.
    """

    mv_y: jax.Array
    mv_x: jax.Array
    best_cost_i32: jax.Array
    score: jax.Array


def make_ref_halo(ref, frame_height: int, frame_width: int, blk_dim: int, span: int):
    """Zero-pad the reference frame to the block-padded dims plus a span halo.

    Global reference pixel (y, x) lands at halo[y + span, x + span]; pixels
    outside the frame are zero. Zeros are never observed by a valid
    (in-window) candidate over in-frame block pixels, so the padding value is
    arbitrary — zeros keep the masked SSD exact.
    """
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    return jnp.pad(
        ref.astype(jnp.int32),
        ((span, span + hp - frame_height), (span, span + wp - frame_width)),
    )


def _tile_masks(tile_h, tile_w, y0, x0, frame_height, frame_width):
    """Per-pixel in-frame mask for a tile with global origin (y0, x0)."""
    py = y0 + jnp.arange(tile_h, dtype=jnp.int32)[:, None]
    px = x0 + jnp.arange(tile_w, dtype=jnp.int32)[None, :]
    return ((py < frame_height) & (px < frame_width)).astype(jnp.int32)


def make_displacement_cost(
    cur_tile,
    ref_halo,
    y0,
    x0,
    *,
    frame_height: int,
    frame_width: int,
    blk_dim: int,
    span: int,
    metric: str,
):
    """Closure computing the per-block cost plane of one displacement.

    The returned `displacement_cost(idx)` maps a flat raster displacement
    index (idx = (d_y + span)*K + (d_x + span), traced or static) to the
    [nby, nbx] per-block cost with reference semantics: truncated-extent
    masking, true-pixel-count normalisation (main.c:27), window-clamp
    validity (main.c:53-54, 73-76); invalid (block, displacement) pairs
    get INT32_MAX (mse/sad) or -inf (ssim). This is the single source of
    cost truth shared by the golden full search and the lazy diamond
    replay (search/diamond.py), which keeps the two bit-identical.
    """
    tile_h, tile_w = cur_tile.shape
    nby, nbx = tile_h // blk_dim, tile_w // blk_dim
    k = 2 * span + 1
    cur_tile = cur_tile.astype(jnp.int32)
    ref_halo = ref_halo.astype(jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)
    tl_y, tl_x, blk_h, blk_w = geometry.block_extents(
        y0, x0, nby, nbx, blk_dim, frame_height, frame_width
    )
    count = blk_h * blk_w  # true (truncated) pixel count, main.c:27
    pix_mask = _tile_masks(tile_h, tile_w, y0, x0, frame_height, frame_width)

    if metric == "ssim":
        # Current-block sums are displacement-independent (ssim.c:49,51).
        cur_m = cur_tile * pix_mask
        sum_cur = cost_lib.block_reduce(cur_m, blk_dim)
        sum_sq_cur = cost_lib.block_reduce(cur_m * cur_m, blk_dim)

    def displacement_cost(idx):
        """Per-block cost for flat raster displacement index `idx`."""
        d_y = idx // k - span
        d_x = idx % k - span
        win = lax.dynamic_slice(
            ref_halo, (span + d_y, span + d_x), (tile_h, tile_w)
        )
        valid = geometry.displacement_valid(
            d_y, d_x, tl_y, tl_x, blk_h, blk_w, frame_height, frame_width
        )
        if metric == "mse":
            diff = (cur_tile - win) * pix_mask
            ssd = cost_lib.block_reduce(diff * diff, blk_dim)
            return jnp.where(valid, ssd, cost_lib.INT32_MAX)
        elif metric == "sad":
            diff = (cur_tile - win) * pix_mask
            sad = cost_lib.block_reduce(jnp.abs(diff), blk_dim)
            return jnp.where(valid, sad, cost_lib.INT32_MAX)
        else:
            win_m = win * pix_mask
            sum_ref = cost_lib.block_reduce(win_m, blk_dim)
            sum_sq_ref = cost_lib.block_reduce(win_m * win_m, blk_dim)
            sum_cross = cost_lib.block_reduce(
                win_m * (cur_tile * pix_mask), blk_dim
            )
            score = cost_lib.ssim_from_sums(
                sum_ref, sum_sq_ref, sum_cur, sum_sq_cur, sum_cross, count
            )
            return jnp.where(valid, score, -jnp.inf)

    return displacement_cost


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_height",
        "frame_width",
        "blk_dim",
        "span",
        "metric",
        "return_cost_volume",
    ),
)
def full_search_tile(
    cur_tile,
    ref_halo,
    y0,
    x0,
    *,
    frame_height: int,
    frame_width: int,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    return_cost_volume: bool = False,
):
    """Full search over one tile of the current frame.

    Args:
      cur_tile: [Th, Tw] int32 current-frame tile; Th, Tw multiples of
        blk_dim; pixels beyond the frame may hold anything (they are
        masked).
      ref_halo: [Th + 2*span, Tw + 2*span] int32 reference pixels such that
        global ref pixel (y0 + r - span, x0 + c - span) is at [r, c], zero
        outside the frame.
      y0, x0: global coordinates of cur_tile[0, 0] (traced or static).
      metric: "mse" (minimise integer SSD), "sad" (minimise integer SAD),
        or "ssim" (maximise float score).
      return_cost_volume: also return the [K², nby, nbx] per-candidate cost
        (masked candidates get INT32_MAX / -inf). Debug/testing only.

    Returns a MotionField (plus the cost volume if requested).
    """
    if metric not in ("mse", "sad", "ssim"):
        raise ValueError(f"unknown metric {metric!r}")
    tile_h, tile_w = cur_tile.shape
    if tile_h % blk_dim or tile_w % blk_dim:
        raise ValueError(
            f"tile dims ({tile_h},{tile_w}) must be multiples of blk_dim={blk_dim}"
        )
    nby, nbx = tile_h // blk_dim, tile_w // blk_dim
    k = 2 * span + 1

    cur_tile = cur_tile.astype(jnp.int32)
    ref_halo = ref_halo.astype(jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)

    tl_y, tl_x, blk_h, blk_w = geometry.block_extents(
        y0, x0, nby, nbx, blk_dim, frame_height, frame_width
    )
    count = blk_h * blk_w  # true (truncated) pixel count, main.c:27
    pix_mask = _tile_masks(tile_h, tile_w, y0, x0, frame_height, frame_width)

    displacement_cost = make_displacement_cost(
        cur_tile, ref_halo, y0, x0,
        frame_height=frame_height, frame_width=frame_width,
        blk_dim=blk_dim, span=span, metric=metric,
    )

    if metric in ("mse", "sad"):
        init = (
            jnp.full((nby, nbx), cost_lib.INT32_MAX, jnp.int32),
            jnp.full((nby, nbx), span * k + span, jnp.int32),  # mv=(0,0) default
        )

        def better(cand, best):
            return cand < best  # strict < keeps the earliest candidate, main.c:56
    else:
        # SSIM maximises with strict >, initial best score 0 (ssim.c:88,100).
        # If no candidate exceeds 0 the reference reads uninitialised memory
        # for the MV (ssim.c:86,100-104); we define MV=(0,0) instead
        # (documented deviation, cannot occur on natural images).
        init = (
            jnp.zeros((nby, nbx), jnp.float32),
            jnp.full((nby, nbx), span * k + span, jnp.int32),
        )

        def better(cand, best):
            return cand > best

    def body(carry, idx):
        best_cost, best_idx = carry
        cand = displacement_cost(idx)
        take = better(cand, best_cost)
        new_cost = jnp.where(take, cand, best_cost)
        new_idx = jnp.where(take, idx, best_idx)
        out = cand if return_cost_volume else None
        return (new_cost, new_idx), out

    (best_cost, best_idx), volume = lax.scan(
        body, init, jnp.arange(k * k, dtype=jnp.int32)
    )

    mv_y, mv_x = geometry.mv_from_flat_index(best_idx, span)
    if metric == "mse":
        score = cost_lib.mse_from_ssd(best_cost, count)
        field = MotionField(mv_y, mv_x, best_cost, score)
    elif metric == "sad":
        score = cost_lib.mad_from_sad(best_cost, count)
        field = MotionField(mv_y, mv_x, best_cost, score)
    else:
        field = MotionField(mv_y, mv_x, best_idx, best_cost)
    if return_cost_volume:
        return field, volume
    return field


def pad_cur_frame(cur, frame_height: int, frame_width: int, blk_dim: int):
    """Zero-pad the current frame to whole blocks (mask handles the rest)."""
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    return jnp.pad(
        cur.astype(jnp.int32), ((0, hp - frame_height), (0, wp - frame_width))
    )


def full_search_frame(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    return_cost_volume: bool = False,
):
    """Whole-frame full search (single tile, origin 0). cur/ref: [H, W] u8/i32."""
    if cur.shape != ref.shape:
        raise ValueError(
            f"current and reference frames must have identical shapes, "
            f"got {cur.shape} vs {ref.shape}"
        )
    frame_height, frame_width = cur.shape
    cur_p = pad_cur_frame(cur, frame_height, frame_width, blk_dim)
    ref_halo = make_ref_halo(ref, frame_height, frame_width, blk_dim, span)
    return full_search_tile(
        cur_p,
        ref_halo,
        0,
        0,
        frame_height=frame_height,
        frame_width=frame_width,
        blk_dim=blk_dim,
        span=span,
        metric=metric,
        return_cost_volume=return_cost_volume,
    )


@functools.partial(jax.jit, static_argnames=("blk_dim", "span"))
def compensate_tile(ref_halo, mv_y, mv_x, *, blk_dim: int, span: int):
    """Motion-compensated tile: comp[p] = ref[p + mv(block(p))] (utils.c:102-134).

    Valid candidates are always fully in-frame, so the gather never reads
    out-of-frame reference pixels for in-frame outputs (the reference's
    OOB-skip branch at utils.c:123 is unreachable for full-search MVs; we
    gather unconditionally from the halo which is in-bounds for |mv|<=span).

    Returns the [Th, Tw] compensated tile (crop to the frame at the caller).
    """
    nby, nbx = mv_y.shape
    tile_h, tile_w = nby * blk_dim, nbx * blk_dim
    mv_y_p = jnp.repeat(jnp.repeat(mv_y, blk_dim, axis=0), blk_dim, axis=1)
    mv_x_p = jnp.repeat(jnp.repeat(mv_x, blk_dim, axis=0), blk_dim, axis=1)
    yy = jnp.arange(tile_h, dtype=jnp.int32)[:, None] + mv_y_p + span
    xx = jnp.arange(tile_w, dtype=jnp.int32)[None, :] + mv_x_p + span
    return ref_halo[yy, xx]


def compensate_frame(ref, field: MotionField, *, frame_height, frame_width, blk_dim, span):
    """Whole-frame motion compensation, cropped to [H, W]."""
    ref_halo = make_ref_halo(ref, frame_height, frame_width, blk_dim, span)
    comp = compensate_tile(ref_halo, field.mv_y, field.mv_x, blk_dim=blk_dim, span=span)
    return comp[:frame_height, :frame_width]
