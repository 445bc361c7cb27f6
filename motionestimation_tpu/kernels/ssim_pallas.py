"""Pallas TPU kernel: fused SSIM search (cost volume + argmax).

TPU-native analogue of the reference's CUDA SSIM kernel
(/root/reference/src/gpu/main_ssim.cu:92-168), built on the same stripe
skeleton as the exact-int MSE kernel (full_search_pallas._kernel_int): the
span-padded reference panel is staged HBM->VMEM once per stripe and rolled
by one row/lane per displacement step, so every candidate window is a
static slice. Per candidate, three box-filter pyramids (Σref, Σref²,
Σref·cur) feed the exact SSIM formula of metrics.cost.ssim_from_sums —
including the reference's int-truncated-mean quirk (ssim.c:29) — and a
strict-> running argmax over the raster-ordered displacement lattice
reproduces the CPU search's first-in-raster-order tie rule (ssim.c:97-105).

Parity target is the CPU SSIM path (ssim.c:83-108), not the CUDA kernel,
whose reduction drops elements and reads out of bounds (SURVEY.md §6
quirk 7). All sums are integers < 2²⁴ carried in int32; only the final
score is float32, with the identical operation sequence the golden XLA
path uses, so score comparisons — and therefore MVs — match bit-exactly.

Truncated edge blocks need no special casing here (unlike the fast MSE
kernel): pixels outside the frame are masked to zero in both operands and
the box sums anchored at a truncated block's top-left simply add zeros,
while the count uses the true clipped extent.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from motionestimation_tpu.core import geometry
from motionestimation_tpu.metrics import cost as cost_lib
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.kernels.full_search_pallas import (
    _pad_slab,
    _round_up,
    _sliding_sums,
)


def _kernel_ssim(
    ref_hbm,          # [rows, halo_w] int32, HBM
    cur_ref,          # [TH, W] int32, VMEM stripe
    score_hbm,        # [Hp2, W] f32, HBM (manual DMA out)
    idx_hbm,          # [Hp2, W] int32, HBM (manual DMA out)
    win_ref,          # [halo_rows, halo_w] int32 scratch (rolled in place)
    row_ref,          # [TH, halo_w] int32 scratch (rolled in place)
    bs_ref,           # [TH, W] f32 scratch (best score)
    bi_ref,           # [TH, W] int32 scratch (best flat index)
    in_sem,
    out_sems,
    *,
    blk_dim: int,
    span: int,
    tile_h: int,
    tile_w: int,
    frame_height: int,
    frame_width: int,
    x_origin: int,
    y_origin: int,
):
    k = 2 * span + 1
    y0 = y_origin + pl.program_id(0) * tile_h
    halo_rows = win_ref.shape[0]
    halo_w = win_ref.shape[1]

    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(pl.program_id(0) * tile_h, halo_rows), :],
        win_ref,
        in_sem,
    )
    copy_in.start()

    iy = lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
    ix = lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
    tl_y = y0 + iy
    tl_x = x_origin + ix
    blk_h = jnp.clip(frame_height - tl_y, 0, blk_dim)
    blk_w = jnp.clip(frame_width - tl_x, 0, blk_dim)
    count = blk_h * blk_w
    rep = ((iy % blk_dim) == 0) & ((ix % blk_dim) == 0)
    pix_mask = ((tl_y < frame_height) & (tl_x < frame_width)).astype(
        jnp.int32
    )

    # SSIM maximises with strict >, initial best 0 (ssim.c:88,100); MV
    # defaults to (0,0) — the golden path's documented deviation from the
    # reference's uninitialised-memory read.
    bs_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
    bi_ref[:] = jnp.full((tile_h, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    cur = cur_ref[:] * pix_mask
    # Current-block sums are displacement-independent (ssim.c:49,51).
    sum_cur = _sliding_sums(
        _sliding_sums(cur, blk_dim, axis=0), blk_dim, axis=1
    )
    sum_sq_cur = _sliding_sums(
        _sliding_sums(cur * cur, blk_dim, axis=0), blk_dim, axis=1
    )

    def dy_body(i, _):
        d_y = i - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_h)
        row_ref[:] = win_ref[0:tile_h, :]

        def dx_body(j, _):
            d_x = j - span
            win = row_ref[:, 0:tile_w] * pix_mask
            sum_ref = _sliding_sums(
                _sliding_sums(win, blk_dim, axis=0), blk_dim, axis=1
            )
            sum_sq_ref = _sliding_sums(
                _sliding_sums(win * win, blk_dim, axis=0), blk_dim, axis=1
            )
            sum_cross = _sliding_sums(
                _sliding_sums(win * cur, blk_dim, axis=0), blk_dim, axis=1
            )
            score = cost_lib.ssim_from_sums(
                sum_ref, sum_sq_ref, sum_cur, sum_sq_cur, sum_cross, count
            )
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_w)
            cand = jnp.where(ok_y & ok_x & rep, score, -jnp.inf)
            take = cand > bs_ref[:]  # strict > == first-raster-wins
            bs_ref[:] = jnp.where(take, cand, bs_ref[:])
            bi_ref[:] = jnp.where(take, i * k + j, bi_ref[:])
            row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, k, dx_body, 0)
        win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
        return 0

    lax.fori_loop(0, k, dy_body, 0)

    out_row = pl.program_id(0) * tile_h
    copy_score = pltpu.make_async_copy(
        bs_ref, score_hbm.at[pl.ds(out_row, tile_h), :], out_sems.at[0]
    )
    copy_idx = pltpu.make_async_copy(
        bi_ref, idx_hbm.at[pl.ds(out_row, tile_h), :], out_sems.at[1]
    )
    copy_score.start()
    copy_idx.start()
    copy_score.wait()
    copy_idx.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "tile_h", "interpret",
    ),
)
def _run_ssim(
    cur_padded,
    ref_padded,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    tile_h: int,
    interpret: bool,
):
    hp2, wp2 = cur_padded.shape
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    kernel = functools.partial(
        _kernel_ssim,
        blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
        frame_height=frame_height, frame_width=frame_width,
        x_origin=0, y_origin=0,
    )
    score_px, idx_px = pl.pallas_call(
        kernel,
        grid=(hp2 // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp2, wp2), jnp.float32),
            jax.ShapeDtypeStruct((hp2, wp2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, halo_w), jnp.int32),
            pltpu.VMEM((tile_h, halo_w), jnp.int32),
            pltpu.VMEM((tile_h, wp2), jnp.float32),
            pltpu.VMEM((tile_h, wp2), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_padded, cur_padded)
    return score_px[::blk_dim, ::blk_dim], idx_px[::blk_dim, ::blk_dim]


def ssim_search_frame_pallas(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    tile: int | None = None,
    interpret: bool | None = None,
):
    """Whole-frame SSIM full search via the fused Pallas kernel.

    MV-exact vs search.full_search_frame(metric="ssim") — identical
    float32 score sequence, identical raster tie-breaking. Returns a
    MotionField with (mv, flat-index proxy, score), mirroring the golden
    SSIM path's field layout (full_search.py).
    """
    if cur.shape != ref.shape:
        raise ValueError(
            f"current and reference frames must have identical shapes, "
            f"got {cur.shape} vs {ref.shape}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ssim_frame_jit(
        cur, ref, blk_dim=blk_dim, span=span,
        tile=tile if tile is not None else 128, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("blk_dim", "span", "tile", "interpret")
)
def _ssim_frame_jit(cur, ref, *, blk_dim, span, tile, interpret):
    frame_height, frame_width = cur.shape
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)

    stripe_unit = math.lcm(8, blk_dim)
    tile_h = min(_round_up(hp, stripe_unit), _round_up(tile, stripe_unit))
    hp2 = _round_up(hp, tile_h)
    wp2 = _round_up(wp, 128)
    halo_w = _round_up(wp2 + 2 * span, 128)
    halo_row_pad = _round_up(2 * span, 8)

    cur_p = _pad_slab(
        cur, row_range=(0, frame_height), col_range=(0, wp2),
        out_rows=hp2, out_cols=wp2, offset_r=0, offset_c=0,
        dtype=jnp.int32,
    )
    ref_p = _pad_slab(
        ref,
        row_range=(-span, hp2 + halo_row_pad - span),
        col_range=(-span, halo_w - span),
        out_rows=hp2 + halo_row_pad, out_cols=halo_w,
        offset_r=0, offset_c=0, dtype=jnp.int32,
    )
    score_g, idx_g = _run_ssim(
        cur_p, ref_p,
        blk_dim=blk_dim, span=span,
        frame_height=frame_height, frame_width=frame_width,
        tile_h=tile_h, interpret=interpret,
    )
    score = score_g[:nby, :nbx]
    idx = idx_g[:nby, :nbx]
    mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
    return fs.MotionField(mv_y, mv_x, idx, score)
