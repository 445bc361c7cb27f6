"""SPMD motion estimation over a ("dp", "ty", "tx") mesh.

The full step per shard: halo-exchange the reference tile, run the same
`full_search_tile` the single-chip path runs (identical arithmetic —
sharded == unsharded is bit-exact by construction), motion-compensate from
the halo, and psum the global residual statistics. The batch ("dp") axis
shards frame pairs of a GOP.

This is the TPU-native replacement for what the reference doesn't have:
it is single-process, single-device (SURVEY.md §2 "parallelism
strategies"); scaling here = spatial tile parallelism with ICI halo
exchange + batch parallelism, per the BASELINE.json north star.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from motionestimation_tpu.core import geometry
from motionestimation_tpu.parallel import halo as halo_lib
from motionestimation_tpu.search import full_search as fs


class ShardedStepResult(NamedTuple):
    """Batched, sharded results of one motion-estimation step.

    mv_y / mv_x: [B, nby, nbx] int32, sharded (dp, ty, tx)
    best_cost:   [B, nby, nbx] int32 (SSD) or float32 (SSIM score)
    comp:        [B, Hp, Wp] int32 motion-compensated frames
    sum_sq_hi / sum_sq_lo / frame_max: per-batch PSNR statistics, psum /
      pmax'd over the spatial mesh, computed over true frame pixels only.
      Σerr² is carried as two int32 halves (hi*2^15 + lo — TPU lanes have
      no int64); the exact integer recombines on host, so
      `frames.psnr_from_stats(hi << 15 | combine.., H*W, frame_max)` equals
      the host-side `image_psnr(comp, cur)` bit-for-bit — the GOP runner
      uses them instead of fetching `comp`.
    """

    mv_y: jax.Array
    mv_x: jax.Array
    best_cost: jax.Array
    comp: jax.Array
    sum_sq_hi: jax.Array
    sum_sq_lo: jax.Array
    frame_max: jax.Array


def padded_dims_for_mesh(
    frame_height: int, frame_width: int, blk_dim: int, mesh: Mesh
):
    """Frame dims padded so every ("ty","tx") shard holds whole blocks."""
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    hp = geometry.cdiv(frame_height, blk_dim * ty) * blk_dim * ty
    wp = geometry.cdiv(frame_width, blk_dim * tx) * blk_dim * tx
    return hp, wp


def _pad_batch(x, hp, wp):
    b, h, w = x.shape
    return jnp.pad(x.astype(jnp.int32), ((0, 0), (0, hp - h), (0, wp - w)))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "blk_dim", "span", "metric",
                     "frame_height", "frame_width"),
)
def sharded_motion_step(
    cur_batch,
    ref_batch,
    *,
    mesh: Mesh,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    frame_height: int,
    frame_width: int,
):
    """One full motion-estimation step for a batch of frame pairs.

    cur_batch / ref_batch: [B, H, W] u8/int32 (host or device). B must be
    divisible by mesh dp. Returns a ShardedStepResult.

    This is the function the multi-chip dry-run jits over the mesh: search
    + halo exchange + compensation + metric reduction in one program.
    """
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    hp, wp = padded_dims_for_mesh(frame_height, frame_width, blk_dim, mesh)
    cur_p = _pad_batch(cur_batch, hp, wp)
    ref_p = _pad_batch(ref_batch, hp, wp)

    tile_h, tile_w = hp // ty, wp // tx

    def step(cur_l, ref_l):
        # cur_l/ref_l: [B_l, tile_h, tile_w] local shard.
        iy = jax.lax.axis_index("ty")
        ix = jax.lax.axis_index("tx")
        y0 = iy * tile_h
        x0 = ix * tile_w

        def one_pair(cur_t, ref_t):
            ref_halo = halo_lib.halo_exchange_2d(
                ref_t, span, ty_size=ty, tx_size=tx
            )
            field = fs.full_search_tile(
                cur_t,
                ref_halo,
                y0,
                x0,
                frame_height=frame_height,
                frame_width=frame_width,
                blk_dim=blk_dim,
                span=span,
                metric=metric,
            )
            comp = fs.compensate_tile(
                ref_halo, field.mv_y, field.mv_x, blk_dim=blk_dim, span=span
            )
            # Residual stats over true frame pixels only.
            py = y0 + jnp.arange(tile_h, dtype=jnp.int32)[:, None]
            px = x0 + jnp.arange(tile_w, dtype=jnp.int32)[None, :]
            in_frame = (py < frame_height) & (px < frame_width)
            err = jnp.where(in_frame, comp - cur_t, 0)
            # Exact Σerr² without int64 (TPU int32 lanes): per-row int32
            # sums (err² ≤ 255², so a row sum < 2^31 for tile_w < 33k),
            # split into 15-bit halves and summed separately — each half
            # sum stays < 2^31 for any realistic tile, and the host
            # recombines hi*2^15 + lo into the exact integer.
            row = jnp.sum(err * err, axis=1, dtype=jnp.int32)
            sq_hi = jnp.sum(row >> 15, dtype=jnp.int32)
            sq_lo = jnp.sum(row & 0x7FFF, dtype=jnp.int32)
            fmax = jnp.max(
                jnp.where(in_frame, jnp.maximum(comp, cur_t), 0)
            )
            cost = (
                field.score if metric == "ssim" else field.best_cost_i32
            )
            return field.mv_y, field.mv_x, cost, comp, sq_hi, sq_lo, fmax

        mv_y, mv_x, cost, comp, sq_hi, sq_lo, fmax = jax.vmap(one_pair)(
            cur_l, ref_l
        )
        sq_hi = jax.lax.psum(jax.lax.psum(sq_hi, "ty"), "tx")
        sq_lo = jax.lax.psum(jax.lax.psum(sq_lo, "ty"), "tx")
        fmax = jax.lax.pmax(jax.lax.pmax(fmax, "ty"), "tx")
        return mv_y, mv_x, cost, comp, sq_hi, sq_lo, fmax

    spec_frame = P("dp", "ty", "tx")
    spec_scalar = P("dp")
    out = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_frame, spec_frame),
        out_specs=(
            spec_frame,      # mv_y  [B, nby, nbx]
            spec_frame,      # mv_x
            spec_frame,      # cost
            spec_frame,      # comp  [B, hp, wp]
            spec_scalar,     # sum_sq hi half, per batch element
            spec_scalar,     # sum_sq lo half
            spec_scalar,     # frame max
        ),
        check_vma=False,  # scan carries inside mix unvarying inits with
        # varying updates; skip the varying-axes check
    )(cur_p, ref_p)
    return ShardedStepResult(*out)


def sharded_full_search(
    cur,
    ref,
    *,
    mesh: Mesh,
    blk_dim: int,
    span: int,
    metric: str = "mse",
):
    """Single frame-pair convenience wrapper (batch of 1) returning a
    MotionField on the block grid plus the compensated frame, both global
    (unsharded views of sharded arrays)."""
    frame_height, frame_width = cur.shape
    res = sharded_motion_step(
        cur[None], ref[None],
        mesh=mesh, blk_dim=blk_dim, span=span, metric=metric,
        frame_height=frame_height, frame_width=frame_width,
    )
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    mv_y = res.mv_y[0, :nby, :nbx]
    mv_x = res.mv_x[0, :nby, :nbx]
    cost = res.best_cost[0, :nby, :nbx]
    comp = res.comp[0, :frame_height, :frame_width]
    return mv_y, mv_x, cost, comp
