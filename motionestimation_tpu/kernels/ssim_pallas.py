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
    _panel_widths,
    _round_up,
    _row_selector,
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
        "tile_h", "x_origin", "y_origin", "interpret",
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
    x_origin: int = 0,
    y_origin: int = 0,
    interpret: bool,
):
    hp2, wp2 = cur_padded.shape
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    kernel = functools.partial(
        _kernel_ssim,
        blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
        frame_height=frame_height, frame_width=frame_width,
        x_origin=x_origin, y_origin=y_origin,
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


def _kernel_ssim_fast(
    org_ref,          # [2] i32, SMEM: (y_origin, x_origin) — traced so the
                      #   same program serves every shard under shard_map
    ref_hbm,          # [rows, halo_w] f32, HBM: span-padded reference panel
    cur_ref,          # [TH, W] f32, VMEM stripe
    score_out,        # [nby_t, W] f32 block of [Hp2/b, W]
    idx_out,          # [nby_t, W] int32 block
    vol_hbm,          # [S, K+1, K*nby_t, W] f32, HBM (emit_volume; else tiny)
    win_ref,          # [halo_rows, halo_w] f32 scratch (rolled per dy)
    s1_ref,           # [halo_rows, halo_w] f32 scratch: b×b box sums of ref
    s2_ref,           # [halo_rows, halo_w] f32 scratch: box sums of ref²
                      #   (split mode: the 2¹¹-scaled HI part)
    s2lo_ref,         # [halo_rows, halo_w] f32 scratch: LO part (split only)
    row_ref,          # [TH, halo_w] f32 scratch (rolled per dx)
    s1row_ref,        # [nby_t, halo_w] f32 scratch (rolled per dx)
    s2row_ref,        # [nby_t, halo_w] f32 scratch (rolled per dx)
    s2lorow_ref,      # [nby_t, halo_w] f32 scratch (split only)
    scur_ref,         # [nby_t, W] int32 scratch: Σcur per block
    sqcur_ref,        # [nby_t, W] int32 scratch: Σcur² per block
    bs_ref,           # [nby_t, W] f32 scratch (best score)
    bi_ref,           # [nby_t, W] int32 scratch (best flat index)
    p_ref,            # [TH, 2*chunk*W] f32 scratch (product staging)
    vbuf_ref,         # [K*nby_t, W] f32 scratch (emit_volume only)
    in_sem,
    vol_sems,         # DMA sem (emit_volume only)
    *,
    blk_dim: int,
    span: int,
    tile_h: int,
    tile_w: int,
    frame_height: int,
    frame_width: int,
    chunk: int,
    emit_volume: bool = False,
):
    """Fast SSIM search for interior (untruncated) blocks, blk_dim <= 32.

    Same stripe/panel skeleton and MXU machinery as the fast MSE kernel
    (full_search_pallas._kernel_f32, chunk mode): the only per-candidate
    work is the cross sum Σ cur·ref(d) — one VPU multiply batched `chunk`
    candidates at a time through one row-compaction matmul. Everything
    ref-only is hoisted: Σref and Σref² are b×b box-sum pyramids computed
    ONCE per stripe (the per-pixel kernel `_kernel_ssim` recomputes both
    per candidate — 6 sliding-sum pyramids per candidate vs 1 here, and on
    a [TH, W] lattice instead of [TH/b, W]).

    blk <= 16: all sums are integers < 2²⁴ carried exactly in f32.
    blk > 16 (split mode): Σx² and Σcur·ref(d) reach b²·255² (6.7e7 at
    blk 32) and would round in f32, BUT the vertical b-row compaction
    stays <= b·255² = 2.08e6 < 2²⁴ — so the compacted value is split
    hi·2¹¹ + lo (an exact f32 floor/scale, validated hi-sum <= 32.5k,
    lo-sum <= 65.5k for blk <= 32) and only the cheap final horizontal
    sliding sum runs twice; the parts recombine in int32. The MXU
    compactions are untouched, so split mode costs one extra VPU slide
    per pyramid, not extra matmuls.

    Sums are converted to int32 and fed to the *same*
    `cost_lib.ssim_from_sums` the golden XLA path uses (whose centered-
    variance arithmetic stays f32-exact through blk 32), so the float32
    score sequence — and therefore the argmax MVs under the strict->
    raster rule (ssim.c:97-105) — match bit-exactly.
    """
    k = 2 * span + 1
    nby_t = tile_h // blk_dim
    split = blk_dim > 16  # b²·255² > 2²⁴ ⟺ blk >= 17
    inv = jnp.float32(1.0 / 2048.0)
    y0 = pl.program_id(0) * tile_h
    halo_rows = win_ref.shape[0]
    halo_w = win_ref.shape[1]

    def hslide_i32(v):
        """Horizontal sliding b-sum of a vertically-compacted f32 plane,
        exact int32 result even past 2²⁴ (split mode)."""
        if not split:
            return _sliding_sums(v, blk_dim, axis=1).astype(jnp.int32)
        hi = jnp.floor(v * inv)
        lo = v - 2048.0 * hi
        return (
            _sliding_sums(hi, blk_dim, axis=1).astype(jnp.int32) * 2048
            + _sliding_sums(lo, blk_dim, axis=1).astype(jnp.int32)
        )

    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem
    )
    copy_in.start()

    sel_sum = _row_selector(nby_t, tile_h, blk_dim, "sum")
    sel_pick = _row_selector(nby_t, tile_h, blk_dim, "pick")
    tl_y = (
        org_ref[0] + y0
        + lax.broadcasted_iota(jnp.int32, (nby_t, 1), 0) * blk_dim
    )
    tl_x = org_ref[1] + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
    count = jnp.int32(blk_dim * blk_dim)

    cur = cur_ref[:]
    scur_ref[:] = _sliding_sums(
        jax.lax.dot(sel_sum, cur, precision=lax.Precision.HIGHEST),
        blk_dim, axis=1,
    ).astype(jnp.int32)
    sqcur_ref[:] = hslide_i32(
        jax.lax.dot(sel_sum, cur * cur, precision=lax.Precision.HIGHEST)
    )
    # SSIM maximises with strict >, initial best 0 (ssim.c:88,100); MV
    # defaults to (0,0) — the golden path's documented deviation from the
    # reference's uninitialised-memory read.
    bs_ref[:] = jnp.zeros((nby_t, tile_w), jnp.float32)
    bi_ref[:] = jnp.full((nby_t, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    win0 = win_ref[:]
    s1_ref[:] = _sliding_sums(
        _sliding_sums(win0, blk_dim, axis=0), blk_dim, axis=1
    )
    v2 = _sliding_sums(win0 * win0, blk_dim, axis=0)  # <= b·255² < 2²⁴
    if split:
        v2hi = jnp.floor(v2 * inv)
        s2_ref[:] = _sliding_sums(v2hi, blk_dim, axis=1)
        s2lo_ref[:] = _sliding_sums(v2 - 2048.0 * v2hi, blk_dim, axis=1)
    else:
        s2_ref[:] = _sliding_sums(v2, blk_dim, axis=1)

    def fold(i, j, cross, s1_band, s2_band):
        d_y = i - span
        d_x = j - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_dim)
        ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_dim)
        score = cost_lib.ssim_from_sums(
            s1_band.astype(jnp.int32),
            s2_band.astype(jnp.int32),
            scur_ref[:],
            sqcur_ref[:],
            cross.astype(jnp.int32),
            count,
        )
        # lax.select (the raw primitive), not jnp.where: jnp.where's
        # jit-wrapped subcall inside an effects-carrying loop body (the
        # volume DMAs) trips the interpret-mode lowering cache.
        ok = jnp.broadcast_to(ok_y & ok_x, score.shape)
        cand = lax.select(
            ok, score, jnp.full(score.shape, -jnp.inf, jnp.float32)
        )
        if emit_volume:
            vbuf_ref[j * nby_t : (j + 1) * nby_t, :] = cand
        take = cand > bs_ref[:]  # strict > == first-raster-wins
        bs_ref[:] = lax.select(take, cand, bs_ref[:])
        bi_ref[:] = lax.select(
            take, jnp.full(bi_ref.shape, i * k + j, jnp.int32), bi_ref[:]
        )

    if emit_volume:
        # Prime the single-buffer pipeline with a dummy DMA to the dump
        # row (vol_hbm dy slot k) so every dy iteration's wait is
        # unconditional (same scheme as the MSE phase kernel's emit).
        pltpu.make_async_copy(
            vbuf_ref, vol_hbm.at[pl.program_id(0), k], vol_sems
        ).start()

    def dy_body(i, _):
        if emit_volume:
            # Wait for the DMA issued last dy before overwriting vbuf.
            pltpu.make_async_copy(
                vbuf_ref, vol_hbm.at[pl.program_id(0), k], vol_sems
            ).wait()
        row_ref[:] = win_ref[0:tile_h, :]
        s1row_ref[:] = jax.lax.dot(
            sel_pick, s1_ref[0:tile_h, :], precision=lax.Precision.HIGHEST
        )
        s2row_ref[:] = jax.lax.dot(
            sel_pick, s2_ref[0:tile_h, :], precision=lax.Precision.HIGHEST
        )
        if split:
            s2lorow_ref[:] = jax.lax.dot(
                sel_pick, s2lo_ref[0:tile_h, :],
                precision=lax.Precision.HIGHEST,
            )
        cur_v = cur_ref[:]
        for g, c0 in enumerate(range(0, k, chunk)):
            n_t = min(chunk, k - c0)
            half = (g % 2) * chunk * tile_w
            for t in range(n_t):
                p_ref[
                    :, half + t * tile_w : half + (t + 1) * tile_w
                ] = cur_v * row_ref[:, 0:tile_w]
                row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
            # Vertical compaction is <= b·255² < 2²⁴ (f32-exact);
            # hslide_i32 handles the horizontal b-sum, split past 2²⁴.
            x_all = hslide_i32(
                jax.lax.dot(
                    sel_sum, p_ref[:, half : half + n_t * tile_w],
                    precision=lax.Precision.HIGHEST,
                )
            )
            for t in range(n_t):
                if split:
                    s2_band = (
                        s2row_ref[:, 0:tile_w].astype(jnp.int32) * 2048
                        + s2lorow_ref[:, 0:tile_w].astype(jnp.int32)
                    )
                else:
                    s2_band = s2row_ref[:, 0:tile_w]
                fold(
                    i, c0 + t,
                    x_all[:, t * tile_w : (t + 1) * tile_w],
                    s1row_ref[:, 0:tile_w],
                    s2_band,
                )
                s1row_ref[:] = pltpu.roll(s1row_ref[:], halo_w - 1, 1)
                s2row_ref[:] = pltpu.roll(s2row_ref[:], halo_w - 1, 1)
                if split:
                    s2lorow_ref[:] = pltpu.roll(
                        s2lorow_ref[:], halo_w - 1, 1
                    )
        if emit_volume:
            # Stream this dy's [K*nby_t, W] score slab (sentinel -inf at
            # invalid candidates); overlaps the next dy's chain compute.
            pltpu.make_async_copy(
                vbuf_ref, vol_hbm.at[pl.program_id(0), i], vol_sems
            ).start()
        win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
        s1_ref[:] = pltpu.roll(s1_ref[:], halo_rows - 1, 0)
        s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
        if split:
            s2lo_ref[:] = pltpu.roll(s2lo_ref[:], halo_rows - 1, 0)
        return 0

    lax.fori_loop(0, k, dy_body, 0)
    if emit_volume:
        pltpu.make_async_copy(
            vbuf_ref, vol_hbm.at[pl.program_id(0), k - 1], vol_sems
        ).wait()
    score_out[:] = bs_ref[:]
    idx_out[:] = bi_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "tile_h", "chunk", "interpret", "emit_volume",
    ),
)
def _run_ssim_fast(
    cur_padded,
    ref_padded,
    origins,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    tile_h: int,
    chunk: int,
    interpret: bool,
    emit_volume: bool = False,
):
    """Fast SSIM search over a padded f32 panel (interior blocks).
    Returns block-grid (score, idx) — plus, with `emit_volume`, the full
    per-candidate float32 score volume [K², hp2//blk, wp2] (sentinel
    -inf at invalid candidates), streamed from the kernel per dy.

    origins: int32 [2] = (y_origin, x_origin) of the panel's top-left in
    global frame coordinates — a *traced* value (SMEM scalar input), so
    one compiled program serves every shard of a `shard_map` mesh."""
    hp2, wp2 = cur_padded.shape
    nby_t = tile_h // blk_dim
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    k = 2 * span + 1
    kernel = functools.partial(
        _kernel_ssim_fast,
        blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
        frame_height=frame_height, frame_width=frame_width,
        chunk=chunk, emit_volume=emit_volume,
    )
    n_stripes = hp2 // tile_h
    # Volume layout (stripe, dy, dx*nby_t + R, lane): one DMA per dy
    # lands the dx-major slab contiguously; row k of the dy axis is the
    # dump slot for the pipeline-priming DMA.
    vol_shape = (
        (n_stripes, k + 1, k * nby_t, wp2) if emit_volume
        else (1, 1, 8, 128)
    )
    score_px, idx_px, vol = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nby_t, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nby_t, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.float32),
            jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.int32),
            jax.ShapeDtypeStruct(vol_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM(  # s2lo pyramid (split mode: blk > 16)
                (halo_rows, halo_w) if blk_dim > 16 else (8, 128),
                jnp.float32,
            ),
            pltpu.VMEM((tile_h, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, halo_w), jnp.float32),
            pltpu.VMEM(  # s2lo row extraction (split mode)
                (nby_t, halo_w) if blk_dim > 16 else (8, 128),
                jnp.float32,
            ),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((nby_t, wp2), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((tile_h, 2 * chunk * wp2), jnp.float32),
            pltpu.VMEM(
                (k * nby_t, wp2) if emit_volume else (8, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(origins.astype(jnp.int32), ref_padded, cur_padded)
    if emit_volume:
        # [S, dy, dx, R(nby_t), W] -> [dy*k + dx, S*nby_t + R, W]
        volume = (
            vol[:, :k]
            .reshape(n_stripes, k, k, nby_t, wp2)
            .transpose(1, 2, 0, 3, 4)
            .reshape(k * k, n_stripes * nby_t, wp2)
        )
        return score_px[:, ::blk_dim], idx_px[:, ::blk_dim], volume
    return score_px[:, ::blk_dim], idx_px[:, ::blk_dim]


def ssim_search_frame_pallas(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    tile: int | None = None,
    interpret: bool | None = None,
    chunk_dx: int = 4,
):
    """Whole-frame SSIM full search via the fused Pallas kernels.

    MV-exact vs search.full_search_frame(metric="ssim") — identical
    float32 score sequence, identical raster tie-breaking. Returns a
    MotionField with (mv, flat-index proxy, score), mirroring the golden
    SSIM path's field layout (full_search.py).

    blk_dim <= 32 uses the fast hoisted-box-sum kernel (interior blocks;
    blk > 16 via the split hi/lo horizontal folds) with exact per-pixel
    slabs for truncated edges; larger blocks use the per-pixel kernel
    throughout. `chunk_dx` batches dx candidates per MXU matmul in the
    fast kernel (default 4; larger overruns the 16 MB scoped-VMEM limit
    at 2048-lane panels — blk > 16 forces chunk 2 + 1024-lane panels).
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
        chunk_dx=chunk_dx,
    )


@functools.partial(
    jax.jit,
    static_argnames=("blk_dim", "span", "tile", "interpret", "chunk_dx"),
)
def _ssim_frame_jit(cur, ref, *, blk_dim, span, tile, interpret, chunk_dx=4):
    frame_height, frame_width = cur.shape
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)

    use_fast = blk_dim <= 32
    stripe_unit = 8 * blk_dim if use_fast else math.lcm(8, blk_dim)
    # Round the target DOWN to the stripe unit (min one unit): rounding up
    # inflates per-stripe VMEM past the 16 MB scoped limit (e.g. blk 7 →
    # unit 56 → a 128 target must become 112, not 168).
    tile_h = min(
        _round_up(hp, stripe_unit),
        max(stripe_unit, tile // stripe_unit * stripe_unit),
    )
    hp2 = _round_up(hp, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    dtype = jnp.float32 if use_fast else jnp.int32

    # Column panels (as in the fast MSE driver) bound per-stripe VMEM:
    # a full-width 4K stripe exceeds the 16 MB scoped-VMEM limit. Split
    # mode (blk > 16) runs 256-row stripes plus an extra pyramid, so it
    # takes narrower panels and a smaller dx chunk to stay under the
    # scoped-VMEM budget.
    panel_target = 2048 if blk_dim <= 16 else 1024
    eff_chunk = (chunk_dx if chunk_dx > 1 else 4) if blk_dim <= 16 else 3
    score_panels, idx_panels = [], []
    for x0, pw in _panel_widths(wp, blk_dim, panel_target):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur, row_range=(0, frame_height), col_range=(x0, x0 + pw),
            out_rows=hp2, out_cols=pw, offset_r=0, offset_c=0, dtype=dtype,
        )
        ref_p = _pad_slab(
            ref,
            row_range=(-span, hp2 + halo_row_pad - span),
            col_range=(x0 - span, x0 - span + halo_w),
            out_rows=hp2 + halo_row_pad, out_cols=halo_w,
            offset_r=0, offset_c=0, dtype=dtype,
        )
        if use_fast:
            s, i = _run_ssim_fast(
                cur_p, ref_p, jnp.array([0, x0], jnp.int32),
                blk_dim=blk_dim, span=span,
                frame_height=frame_height, frame_width=frame_width,
                tile_h=tile_h,
                chunk=eff_chunk,
                interpret=interpret,
            )
        else:
            s, i = _run_ssim(
                cur_p, ref_p, blk_dim=blk_dim, span=span,
                frame_height=frame_height, frame_width=frame_width,
                tile_h=tile_h, x_origin=x0, interpret=interpret,
            )
        score_panels.append(s)
        idx_panels.append(i)
    score = jnp.concatenate(score_panels, axis=1)[:nby, :nbx]
    idx = jnp.concatenate(idx_panels, axis=1)[:nby, :nbx]

    if use_fast:
        # Truncated edge blocks violate the fast kernel's uniform-box
        # assumptions; recompute them with the exact per-pixel kernel on
        # thin slabs and merge (same scheme as the fast MSE driver).
        if frame_height % blk_dim:
            e_s, e_i = _ssim_edge_bottom(
                cur, ref, blk_dim=blk_dim, span=span, interpret=interpret
            )
            score = score.at[nby - 1, :].set(e_s[0, :nbx])
            idx = idx.at[nby - 1, :].set(e_i[0, :nbx])
        if frame_width % blk_dim:
            e_s, e_i = _ssim_edge_right(
                cur, ref, blk_dim=blk_dim, span=span, interpret=interpret
            )
            score = score.at[:, nbx - 1].set(e_s[:nby, 0])
            idx = idx.at[:, nbx - 1].set(e_i[:nby, 0])

    mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
    return fs.MotionField(mv_y, mv_x, idx, score)


def ssim_supported(blk_dim: int, span: int) -> bool:
    """Whether the fast SSIM kernel covers this config (the tile entry's
    requirement): hoisted box-sum pyramids assume full blk×blk blocks.
    blk <= 16 carries every sum exactly in f32; 17..32 runs the split
    hi/lo horizontal folds (round-5 — see _kernel_ssim_fast)."""
    return blk_dim <= 32 and span >= 1


def ssim_volume_pallas(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    interpret: bool | None = None,
):
    """Full [K², nby, nbx] float32 SSIM score volume.

    The SSIM analogue of
    `full_search_pallas.full_search_volume_pallas`: per-dy score-slab
    streaming from the fast kernel on TPU (consumed by the staged
    diamond, search/diamond.py), the golden XLA volume off-TPU
    (bit-identical by construction; the emit loop's DMA effects cannot
    lower in interpret mode). Invalid displacements hold -inf; truncated
    edge blocks are recomputed with the golden tile on thin slabs.
    Scores are bit-exact vs `full_search_tile(metric="ssim",
    return_cost_volume=True)` in interpret/CPU mode; on real hardware
    they carry the documented few-ULP TPU float drift (PARITY.md
    deviation 6).
    """
    if not ssim_supported(blk_dim, span):
        raise ValueError(
            f"ssim_volume_pallas requires blk_dim <= 32 and span >= 1, "
            f"got blk_dim={blk_dim} span={span}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ssim_volume_jit(
        cur, ref, blk_dim=blk_dim, span=span, interpret=interpret
    )


def ssim_volume_tile_pallas(
    cur_tile,
    ref_halo,
    y_origin,
    x_origin,
    *,
    frame_height: int,
    frame_width: int,
    blk_dim: int,
    span: int,
    interpret: bool = False,
):
    """Per-shard [K², th//blk, tw//blk] float32 SSIM score volume via the
    fast kernel's emission — the tile/shard_map analogue of
    `ssim_volume_pallas`, with the shard's global origin supplied as a
    traced (y_origin, x_origin) pair (same contract as
    `ssim_search_tile_pallas`). Blocks truncated by the GLOBAL frame
    edge are NOT handled (uniform-box counts); the sharded driver
    repairs them with golden slabs. Consumer: the sharded staged
    diamond. Interpret-mode callers should use the golden tile volume
    (the emit loop's DMA effects cannot lower in interpret mode).
    """
    th, tw = cur_tile.shape
    if th % blk_dim or tw % blk_dim:
        raise ValueError(
            f"tile dims must be multiples of blk_dim, got {th}x{tw}"
        )
    if not ssim_supported(blk_dim, span):
        raise ValueError(
            f"fast SSIM kernel unsupported for blk_dim={blk_dim} "
            f"span={span}"
        )
    tile_h = 8 * blk_dim
    hp2 = _round_up(th, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    ref_rows = hp2 + halo_row_pad
    cur_f = cur_tile.astype(jnp.float32)
    ref_f = ref_halo.astype(jnp.float32)

    vol_panels = []
    for x0p, pw in _panel_widths(_round_up(tw, blk_dim), blk_dim, 1024):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur_f, row_range=(0, hp2), col_range=(x0p, x0p + pw),
            out_rows=hp2, out_cols=pw, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        # ref_halo row/col i ↔ tile row/col i - span, so tile-range
        # [x0p - span, …) starts at halo column x0p.
        ref_p = _pad_slab(
            ref_f, row_range=(0, ref_rows), col_range=(x0p, x0p + halo_w),
            out_rows=ref_rows, out_cols=halo_w, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        origins = jnp.stack(
            [jnp.asarray(y_origin), jnp.asarray(x_origin) + x0p]
        ).astype(jnp.int32)
        _, _, vol = _run_ssim_fast(
            cur_p, ref_p, origins,
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            tile_h=tile_h, chunk=4 if blk_dim <= 16 else 2,
            interpret=interpret,
            emit_volume=True,
        )
        vol_panels.append(
            vol[:, : th // blk_dim, ::blk_dim][:, :, : pw // blk_dim]
        )
    return jnp.concatenate(vol_panels, axis=2)[:, :, : tw // blk_dim]


@functools.partial(
    jax.jit, static_argnames=("blk_dim", "span", "interpret")
)
def _ssim_volume_jit(cur, ref, *, blk_dim, span, interpret):
    frame_height, frame_width = cur.shape
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    k = 2 * span + 1

    def golden_volume(cur_t, ref_halo, y0, x0):
        _, vol = fs.full_search_tile(
            cur_t, ref_halo, y0, x0,
            frame_height=frame_height, frame_width=frame_width,
            blk_dim=blk_dim, span=span, metric="ssim",
            return_cost_volume=True,
        )
        return vol

    if interpret:
        cur_p = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
        ref_halo = fs.make_ref_halo(
            ref, frame_height, frame_width, blk_dim, span
        )
        return golden_volume(cur_p, ref_halo, 0, 0)

    tile_h = 8 * blk_dim
    hp2 = _round_up(hp, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    # Narrow panels: the emit path adds a [K*nby_t, W] vbuf on top of
    # the fast kernel's scratches, so the 2048-lane panels of the
    # search path would overrun the ~16 MB scoped-VMEM budget.
    panels = []
    for x0, pw in _panel_widths(wp, blk_dim, 1024):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur, row_range=(0, frame_height), col_range=(x0, x0 + pw),
            out_rows=hp2, out_cols=pw, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        ref_p = _pad_slab(
            ref,
            row_range=(-span, hp2 + halo_row_pad - span),
            col_range=(x0 - span, x0 - span + halo_w),
            out_rows=hp2 + halo_row_pad, out_cols=halo_w,
            offset_r=0, offset_c=0, dtype=jnp.float32,
        )
        _, _, vol = _run_ssim_fast(
            cur_p, ref_p, jnp.array([0, x0], jnp.int32),
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            tile_h=tile_h, chunk=4 if blk_dim <= 16 else 2,
            interpret=interpret,
            emit_volume=True,
        )
        panels.append(vol[:, :nby, ::blk_dim][:, :, : pw // blk_dim])
    volume = jnp.concatenate(panels, axis=2)[:, :, :nbx]

    # Truncated edge blocks: the fast kernel's uniform-box count is
    # wrong there; golden-tile volumes on thin slabs.
    if frame_height % blk_dim or frame_width % blk_dim:
        cur_pad = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
        ref_halo = fs.make_ref_halo(
            ref, frame_height, frame_width, blk_dim, span
        )
        if frame_height % blk_dim:
            y_org = (nby - 1) * blk_dim
            v = golden_volume(
                cur_pad[y_org : y_org + blk_dim, :],
                ref_halo[y_org : y_org + blk_dim + 2 * span, :],
                y_org, 0,
            )
            volume = volume.at[:, nby - 1, :].set(v[:, 0, :])
        if frame_width % blk_dim:
            x_org = (nbx - 1) * blk_dim
            v = golden_volume(
                cur_pad[:, x_org : x_org + blk_dim],
                ref_halo[:, x_org : x_org + blk_dim + 2 * span],
                0, x_org,
            )
            volume = volume.at[:, :, nbx - 1].set(v[:, :, 0])
    return volume


def ssim_search_tile_pallas(
    cur_tile,
    ref_halo,
    y_origin,
    x_origin,
    *,
    frame_height: int,
    frame_width: int,
    blk_dim: int,
    span: int,
    interpret: bool = False,
):
    """Fast-SSIM-kernel search over one mesh shard's tile.

    The shard_map analogue of the CUDA SSIM grid launch
    (main_ssim.cu:236-245), mirroring full_search_tile_pallas
    (full_search_pallas.py): each shard runs this same compiled program on
    its own tile with its global origin supplied as a *traced*
    (y_origin, x_origin) pair read from SMEM.

    cur_tile: [th, tw] (multiples of blk_dim — mesh padding guarantees
    this); ref_halo: [th + 2*span, tw + 2*span], the exchanged reference
    halo, row/col i ↔ tile row/col i - span, zero outside the frame.

    Returns block-grid (score_f32, flat_idx), [th//blk, tw//blk] each,
    exact for full blocks. Blocks truncated by the global frame edge are
    NOT handled here — the sharded driver repairs them with a golden
    thin-slab pass (parallel/sharded.py).
    """
    th, tw = cur_tile.shape
    if th % blk_dim or tw % blk_dim:
        raise ValueError(
            f"tile dims must be multiples of blk_dim, got {th}x{tw}"
        )
    if not ssim_supported(blk_dim, span):
        raise ValueError(
            f"fast SSIM kernel unsupported for blk_dim={blk_dim} "
            f"span={span}"
        )
    stripe_unit = 8 * blk_dim
    tile_h = min(_round_up(th, stripe_unit), stripe_unit)
    hp2 = _round_up(th, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    ref_rows = hp2 + halo_row_pad  # tile rows [-span, hp2+halo_row_pad-span)
    cur_f = cur_tile.astype(jnp.float32)
    ref_f = ref_halo.astype(jnp.float32)

    score_panels, idx_panels = [], []
    for x0p, pw in _panel_widths(_round_up(tw, blk_dim), blk_dim):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur_f, row_range=(0, hp2), col_range=(x0p, x0p + pw),
            out_rows=hp2, out_cols=pw, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        # ref_halo row/col i ↔ tile row/col i - span, so tile-range
        # [x0p - span, …) starts at halo column x0p.
        ref_p = _pad_slab(
            ref_f, row_range=(0, ref_rows), col_range=(x0p, x0p + halo_w),
            out_rows=ref_rows, out_cols=halo_w, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        origins = jnp.stack(
            [jnp.asarray(y_origin), jnp.asarray(x_origin) + x0p]
        ).astype(jnp.int32)
        s, i = _run_ssim_fast(
            cur_p, ref_p, origins,
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            tile_h=tile_h, chunk=4, interpret=interpret,
        )
        score_panels.append(s)
        idx_panels.append(i)
    score = jnp.concatenate(score_panels, axis=1)
    idx = jnp.concatenate(idx_panels, axis=1)
    return score[: th // blk_dim, : tw // blk_dim], idx[
        : th // blk_dim, : tw // blk_dim
    ]


def _ssim_edge_bottom(cur, ref, *, blk_dim, span, interpret):
    """Exact SSIM search for the last (truncated) block row: thin
    horizontal slabs through the per-pixel kernel, panelled in columns
    (the per-pixel kernel's candidate temporaries exceed the scoped-VMEM
    limit on a full-width 4K slab)."""
    frame_height, frame_width = cur.shape
    nby, _ = geometry.grid_shape(frame_height, frame_width, blk_dim)
    y_org = (nby - 1) * blk_dim
    tile_h = math.lcm(8, blk_dim)
    wp = _round_up(frame_width, blk_dim)
    halo_row_pad = _round_up(2 * span, 8)
    s_panels, i_panels = [], []
    for x0, pw in _panel_widths(wp, blk_dim):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur, row_range=(y_org, y_org + tile_h),
            col_range=(x0, x0 + pw),
            out_rows=tile_h, out_cols=pw, offset_r=0, offset_c=0,
            dtype=jnp.int32,
        )
        ref_p = _pad_slab(
            ref,
            row_range=(y_org - span, y_org - span + tile_h + halo_row_pad),
            col_range=(x0 - span, x0 - span + halo_w),
            out_rows=tile_h + halo_row_pad, out_cols=halo_w,
            offset_r=0, offset_c=0, dtype=jnp.int32,
        )
        s, i = _run_ssim(
            cur_p, ref_p, blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            tile_h=tile_h, x_origin=x0, y_origin=y_org,
            interpret=interpret,
        )
        s_panels.append(s)
        i_panels.append(i)
    return (
        jnp.concatenate(s_panels, axis=1),
        jnp.concatenate(i_panels, axis=1),
    )


def _ssim_edge_right(cur, ref, *, blk_dim, span, interpret):
    """Exact SSIM search for the last (truncated) block column: a narrow
    full-height vertical slab through the per-pixel kernel."""
    frame_height, frame_width = cur.shape
    _, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    x_org = (nbx - 1) * blk_dim
    unit = math.lcm(8, blk_dim)
    tile_h = min(_round_up(_round_up(frame_height, blk_dim), unit),
                 _round_up(128, unit))
    hp2 = _round_up(_round_up(frame_height, blk_dim), tile_h)
    wp2 = 128
    halo_w = _round_up(wp2 + 2 * span, 128)
    halo_row_pad = _round_up(2 * span, 8)
    cur_p = _pad_slab(
        cur, row_range=(0, hp2), col_range=(x_org, x_org + wp2),
        out_rows=hp2, out_cols=wp2, offset_r=0, offset_c=0,
        dtype=jnp.int32,
    )
    ref_p = _pad_slab(
        ref,
        row_range=(-span, hp2 + halo_row_pad - span),
        col_range=(x_org - span, x_org - span + halo_w),
        out_rows=hp2 + halo_row_pad, out_cols=halo_w,
        offset_r=0, offset_c=0, dtype=jnp.int32,
    )
    return _run_ssim(
        cur_p, ref_p, blk_dim=blk_dim, span=span,
        frame_height=frame_height, frame_width=frame_width,
        tile_h=tile_h, x_origin=x_org, y_origin=0, interpret=interpret,
    )
