"""Block-grid and search-window geometry.

Reference semantics reproduced here (file:line in /root/reference):

* The frame is partitioned into a ceil-div grid of ``blk_dim``-square blocks,
  row-major; blocks on the right/bottom edge are **truncated** to the frame,
  never padded (src/common/prediction_frame.c:9-22).
* The search window for a block is the block extent grown by ``span`` on every
  side, clamped to the frame (src/cpu/main.c:73-76). A candidate top-left is
  scanned iff the candidate block (with the *truncated* block extent) lies
  fully inside the clamped window (src/cpu/main.c:53-54). Equivalently, the
  displacement (dx, dy) is valid iff

      -min(span, tlx) <= dx <= min(span, W - w - tlx)      (same for y)

  so MV=(0,0) is always a candidate and edge blocks see an asymmetric lattice.
* The scan is y-outer/x-inner raster order from the clamped window origin and
  strict-inequality argmin ⇒ the first candidate in raster order wins ties
  (src/cpu/main.c:53-60). We encode each displacement as the flat raster index

      idx = (dy + span) * (2*span + 1) + (dx + span)

  over the full lattice; because invalid displacements form a border of the
  lattice, lowest-valid-index order equals the reference scan order, so a
  stable lowest-index argmin reproduces the tie rule exactly.

Everything here is trace-time (static) or cheap vectorised index math; there
are no per-block Python objects (the reference's ``block`` structs dissolve
into index arrays).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference ceil-div: prediction_frame.c:9-10)."""
    return -(-a // b)


def grid_shape(height: int, width: int, blk_dim: int) -> Tuple[int, int]:
    """(num_blocks_y, num_blocks_x) for a frame."""
    return cdiv(height, blk_dim), cdiv(width, blk_dim)


def padded_dims(height: int, width: int, blk_dim: int) -> Tuple[int, int]:
    """Frame dims rounded up to a whole number of blocks.

    The compute path zero-pads frames to these dims and masks the padding;
    the reference instead truncates the edge blocks (prediction_frame.c:21-22)
    — the mask reproduces the truncated-extent cost exactly.
    """
    nby, nbx = grid_shape(height, width, blk_dim)
    return nby * blk_dim, nbx * blk_dim


def block_extents_np(height: int, width: int, blk_dim: int):
    """NumPy block geometry arrays, each [nby, nbx].

    Returns (tl_y, tl_x, blk_h, blk_w) — top-left pixel coordinates and
    truncated extents, matching createPredictionFrame
    (prediction_frame.c:15-23).
    """
    nby, nbx = grid_shape(height, width, blk_dim)
    tl_y = (np.arange(nby, dtype=np.int32) * blk_dim)[:, None] + np.zeros(
        (1, nbx), np.int32
    )
    tl_x = (np.arange(nbx, dtype=np.int32) * blk_dim)[None, :] + np.zeros(
        (nby, 1), np.int32
    )
    blk_h = np.minimum(blk_dim, height - tl_y).astype(np.int32)
    blk_w = np.minimum(blk_dim, width - tl_x).astype(np.int32)
    return tl_y, tl_x, blk_h, blk_w


def block_extents(
    y0,
    x0,
    nby: int,
    nbx: int,
    blk_dim: int,
    frame_height: int,
    frame_width: int,
):
    """Traced block geometry for a tile whose first pixel is global (y0, x0).

    Used by both the single-chip path (y0 = x0 = 0) and the sharded path
    (y0/x0 derived from mesh coordinates), so sharded and unsharded runs
    execute identical per-block math.

    Returns int32 jnp arrays (tl_y, tl_x, blk_h, blk_w), each [nby, nbx],
    in *global* frame coordinates. Blocks fully outside the frame (possible
    only in padding rows/cols) get extent clamped to >= 0.
    """
    iy = jnp.arange(nby, dtype=jnp.int32)[:, None]
    ix = jnp.arange(nbx, dtype=jnp.int32)[None, :]
    tl_y = y0 + iy * blk_dim + jnp.zeros((1, nbx), jnp.int32)
    tl_x = x0 + ix * blk_dim + jnp.zeros((nby, 1), jnp.int32)
    blk_h = jnp.clip(frame_height - tl_y, 0, blk_dim).astype(jnp.int32)
    blk_w = jnp.clip(frame_width - tl_x, 0, blk_dim).astype(jnp.int32)
    return tl_y, tl_x, blk_h, blk_w


def displacement_valid(
    d_y,
    d_x,
    tl_y,
    tl_x,
    blk_h,
    blk_w,
    frame_height: int,
    frame_width: int,
):
    """Boolean mask: is displacement (d_y, d_x) scanned for each block?

    Derived from the clamped-window candidate bounds (main.c:53-54, 73-76):
    candidate top-left must satisfy 0 <= tl+d and tl+d <= frame - extent.
    Shapes broadcast: d_* may be scalars or [...,1,1]; tl_*/blk_* are
    [nby, nbx].
    """
    ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_w)
    ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_h)
    return ok_x & ok_y


def mv_from_flat_index(flat_idx, span: int):
    """Decode the flat raster candidate index into (mv_y, mv_x).

    Inverse of idx = (dy+span)*(2*span+1) + (dx+span). MV semantics are
    candidate_topleft − block_topleft (main.c:58-59).
    """
    k = 2 * span + 1
    mv_y = flat_idx // k - span
    mv_x = flat_idx % k - span
    return mv_y, mv_x
