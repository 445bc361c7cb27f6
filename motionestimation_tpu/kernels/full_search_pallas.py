"""Pallas TPU kernels: fused full-search cost volume + argmin.

TPU-native analogue of the reference's optimized CUDA kernel
(/root/reference/src/gpu/main_mse.cu:41-141), redesigned for the TPU memory
hierarchy instead of translated. The kernels share one driver:

**Phase kernel** (`_kernel_phase`, the default for MSE/SAD with blk_dim
dividing 128 and <= 32): restages the stripe into stride-blk "phase
planes" once, then evaluates every candidate with a blk-term VPU diff
chain and a single cumulative lane roll per dx — no per-candidate matmul
or band roll at all (see its docstring). ~1.8x the chunked kernel at 4K
on TPU v5e (4x the wide kernel at blk 32), and the only path with
native SAD. blk 32 SSD runs the lane sliding-sum fold in int32 (the
only sum that can cross the f32-exact 2^24 range).

**Chunked fast kernel** (`_kernel_f32`, blk_dim <= 16): per full-width row stripe,
decompose SSD = (Qcur - X) + (Qref - X) where
  Qcur = Σ cur²  per block          — computed once per stripe,
  Qref = Σ ref²  over the candidate — a b×b box filter of ref², computed
         once per stripe and rolled along with the window,
  X    = Σ cur·ref(d)               — the only per-candidate work: one VPU
         multiply, one MXU row-compaction matmul (0/1 selector), one
         lane roll-tree.
All quantities are integers < 2²⁴ held in float32, so every add/compare is
exact (the grouping (Qcur-X)+(Qref-X) keeps every intermediate <= 2²⁴ in
magnitude; a naive Qcur+Qref-2X intermediate would exceed it). Truncated
edge blocks (frame not a multiple of blk_dim) violate the uniform-box
assumption of Qref, so the driver recomputes the last block row/column with
the exact kernel on thin slabs and merges.

**Exact kernel** (`_kernel_int`, any blk_dim): per-pixel int32 SSD with a
roll-and-add segmented reduction; handles truncated blocks directly via
per-position extents and masks. Used for edge slabs and any blk_dim the
fast paths don't cover (the part-row wide kernel `_kernel_f32_wide`
handles blk 24 when phase is off).

Mosaic-shaped design notes (learned the hard way):
* Grid = full-width row stripes: trailing block dims equal the array dims,
  which satisfies lane-divisibility for any frame width and any block size
  (including non-power-of-two blocks like the reference's 7×7 runs).
* Dynamic sublane/lane offsets are unprovable for Mosaic, so the candidate
  window is obtained by *cumulative roll-by-one*: the dy loop rolls the
  halo band up one row per step, the dx loop rolls the active row band
  left one lane per step; a static [0:h, 0:w] slice is then the candidate.
* 4-D reshapes and strided slices do not lower to TPU vectors; segmented
  sums use a roll-and-add tree or a 0/1-selector matmul instead, and
  block-grid compaction happens outside the kernel in XLA.
* DMA slices must be lane-aligned to 128 and sublane-aligned to 8; padded
  widths are rounded up accordingly (zeros, masked).
* fori_loop carries of large vectors are round-tripped through VMEM every
  iteration (measured ~25 us/iter of pure copy); all loop state lives in
  VMEM scratch refs mutated in place, and the loops carry nothing.
* Wide frames are processed in column panels (driver-level, using the
  kernels' x_origin) to keep the per-stripe VMEM footprint bounded.

Both kernels reproduce the *CPU* reference bit-exactly (the CUDA kernel's
tie-breaking differs from the CPU path and its indexing is only consistent
when 2*span+blk == 32 — SURVEY §6 quirk 7): the displacement loops walk
the flat raster index in order with a strict-< update, which is exactly
first-in-raster-order-wins (main.c:53-60).
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

# > any SSD (<= 255²·16² = 16.6M); python literal so the kernel does not
# close over a traced constant.
_BIG_F32 = 3.0e8

# Column-panel width target (lanes). Keeps per-stripe VMEM ~7 MB at 4K.
_PANEL_TARGET = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sliding_sums(x, b: int, axis: int):
    """Sliding-window sums of width b along `axis` via a roll-and-add tree.

    Position i holds sum(x[i .. i+b-1]) wherever i <= n-b; trailing
    positions contain wrapped garbage (callers only read positions
    <= n-b). log2(b) doubling steps plus one fold per set bit of b, so
    non-power-of-two block sizes work too.
    """
    if b == 1:
        return x
    n = x.shape[axis]
    widths = {1: x}
    w = 1
    while w * 2 <= b:
        widths[w * 2] = widths[w] + pltpu.roll(widths[w], n - w, axis)
        w *= 2
    acc = None
    offset = 0
    for w in sorted(widths, reverse=True):
        if b & w:
            term = (
                widths[w]
                if offset == 0
                else pltpu.roll(widths[w], n - offset, axis)
            )
            acc = term if acc is None else acc + term
            offset += w
    return acc


def _row_selector(nby_t: int, tile_h: int, blk_dim: int, mode: str):
    """0/1 f32 selector matrices for MXU row compaction.

    mode="sum":  S[r, y] = 1 iff y // blk_dim == r  (sums each block row)
    mode="pick": S[r, y] = 1 iff y == r * blk_dim   (picks block-top rows)
    """
    r = lax.broadcasted_iota(jnp.int32, (nby_t, tile_h), 0)
    y = lax.broadcasted_iota(jnp.int32, (nby_t, tile_h), 1)
    sel = (y // blk_dim) == r if mode == "sum" else y == r * blk_dim
    return sel.astype(jnp.float32)


def _kernel_f32(
    ref_hbm,          # [rows, halo_w] f32, HBM: span-padded reference panel
    cur_ref,          # [TH, W] f32, VMEM stripe
    cost_out,         # [nby_t, W] f32 block of [Hp2/b, W]
    idx_out,          # [nby_t, W] int32 block
    vol_hbm,          # [k², Hp2/b, W] f32, HBM (emit_volume only; else tiny)
    win_ref,          # [halo_rows, halo_w] f32 scratch (rolled in place)
    s2_ref,           # [halo_rows, halo_w] f32 scratch (rolled in place)
    row_ref,          # [TH, halo_w] f32 scratch (rolled in place)
    s2row_ref,        # [nby_t, halo_w] f32 scratch (rolled in place)
    qcur_ref,         # [nby_t, W] f32 scratch
    bc_ref,           # [nby_t, W] f32 scratch (best cost)
    bi_ref,           # [nby_t, W] int32 scratch (best flat index)
    p_ref,            # [TH, chunk_dx*W] f32 scratch (chunk_dx mode only)
    vbuf_ref,         # [2, nby_t, W] f32 scratch (emit_volume only)
    in_sem,
    vol_sems,         # DMA sems (2,) (emit_volume only)
    *,
    blk_dim: int,
    span: int,
    tile_h: int,
    tile_w: int,
    frame_height: int,
    frame_width: int,
    x_origin: int,
    unroll_dx: bool = False,
    chunk_dx: int = 0,
    emit_volume: bool = False,
):
    k = 2 * span + 1
    nby_t = tile_h // blk_dim
    y0 = pl.program_id(0) * tile_h
    halo_rows = win_ref.shape[0]
    halo_w = win_ref.shape[1]

    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem
    )
    copy_in.start()

    sel_sum = _row_selector(nby_t, tile_h, blk_dim, "sum")
    sel_pick = _row_selector(nby_t, tile_h, blk_dim, "pick")

    # Per-block-row / per-lane geometry (interior blocks only — truncated
    # edge blocks are recomputed by the exact kernel in the driver).
    tl_y = y0 + lax.broadcasted_iota(jnp.int32, (nby_t, 1), 0) * blk_dim
    tl_x = x_origin + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)

    cur = cur_ref[:]
    qcur_ref[:] = _sliding_sums(
        jax.lax.dot(sel_sum, cur * cur, precision=lax.Precision.HIGHEST),
        blk_dim,
        axis=1,
    )
    bc_ref[:] = jnp.full((nby_t, tile_w), _BIG_F32, jnp.float32)
    bi_ref[:] = jnp.full((nby_t, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    win0 = win_ref[:].astype(jnp.float32)
    # Qref: b×b box sums of ref² over the halo band, once per stripe.
    s2_ref[:] = _sliding_sums(
        _sliding_sums(win0 * win0, blk_dim, axis=0), blk_dim, axis=1
    )

    def candidate(i, j, x, s2row_band):
        """Fold candidate (dy=i, dx=j): x = Σ cur·ref(d) per block,
        s2row_band = Qref row band, both [nby_t, tile_w]. Returns the
        masked cost plane (for emit_volume)."""
        d_y = i - span
        d_x = j - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_dim)
        # Exact-in-f32 grouping: both parentheses are integers with
        # |.| <= 255²·b² <= 2²⁴, and their sum (the SSD) too.
        ssd = (qcur_ref[:] - x) + (s2row_band - x)
        ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_dim)
        cand = jnp.where(ok_y & ok_x, ssd, _BIG_F32)
        take = cand < bc_ref[:]  # strict < == first-raster-wins
        bc_ref[:] = jnp.where(take, cand, bc_ref[:])
        bi_ref[:] = jnp.where(take, i * k + j, bi_ref[:])
        return cand

    if chunk_dx > 1:
        # Batch C candidates per MXU call: stage C shifted products side
        # by side in p_ref, then ONE [nby_t, TH] x [TH, C*W] compaction
        # matmul. 625 tiny dependent matmuls serialize on MXU latency;
        # batching deepens each matmul ~C-fold. The lane sliding-sum tree
        # runs on the concatenated segments — its cross-segment wrap only
        # contaminates positions x > W-b, which are never block top-lefts.
        # Result segments are 128-aligned static slices (no lane rotate).
        # p_ref holds TWO C-wide halves used alternately, so the VPU
        # product staging of group g+1 is independent of (and can overlap)
        # the MXU matmul reading group g.
        vol_row = pl.program_id(0) * nby_t

        def dy_body(i, _):
            row_ref[:] = win_ref[0:tile_h, :]
            s2row_ref[:] = jax.lax.dot(
                sel_pick, s2_ref[0:tile_h, :],
                precision=lax.Precision.HIGHEST,
            )
            cur_v = cur_ref[:]
            cc = 0  # static per-dy candidate counter (volume DMA slots)
            for g, c0 in enumerate(range(0, k, chunk_dx)):
                n_t = min(chunk_dx, k - c0)
                half = (g % 2) * chunk_dx * tile_w
                for t in range(n_t):
                    p_ref[
                        :, half + t * tile_w : half + (t + 1) * tile_w
                    ] = cur_v * row_ref[:, 0:tile_w].astype(jnp.float32)
                    row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                x_all = _sliding_sums(
                    jax.lax.dot(
                        sel_sum, p_ref[:, half : half + n_t * tile_w],
                        precision=lax.Precision.HIGHEST,
                    ),
                    blk_dim,
                    axis=1,
                )
                for t in range(n_t):
                    cand = candidate(
                        i, c0 + t,
                        x_all[:, t * tile_w : (t + 1) * tile_w],
                        s2row_ref[:, 0:tile_w],
                    )
                    s2row_ref[:] = pltpu.roll(s2row_ref[:], halo_w - 1, 1)
                    if emit_volume:
                        # Stream the masked cost plane to HBM through two
                        # rotating buffers; waits are balanced within each
                        # dy body (fori carries no DMA state).
                        slot = cc % 2
                        if cc >= 2:
                            pltpu.make_async_copy(
                                vbuf_ref.at[slot],
                                vol_hbm.at[
                                    i * k + (cc - 2),
                                    pl.ds(vol_row, nby_t),
                                    :,
                                ],
                                vol_sems.at[slot],
                            ).wait()
                        vbuf_ref[slot] = cand
                        pltpu.make_async_copy(
                            vbuf_ref.at[slot],
                            vol_hbm.at[
                                i * k + (c0 + t), pl.ds(vol_row, nby_t), :
                            ],
                            vol_sems.at[slot],
                        ).start()
                        cc += 1
            if emit_volume:
                for last in (k - 2, k - 1):
                    pltpu.make_async_copy(
                        vbuf_ref.at[last % 2],
                        vol_hbm.at[i * k + last, pl.ds(vol_row, nby_t), :],
                        vol_sems.at[last % 2],
                    ).wait()
            win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
            s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
            return 0
    elif unroll_dx:
        # dx as a static Python unroll: candidate windows are *static*
        # slices of the (dy-rolled) halo band — no per-step roll copies of
        # the [TH, halo_w] row band. Measured SLOWER than the roll form
        # (unaligned static-slice reads lane-rotate per use); kept for
        # reference.
        def dy_body(i, _):
            s2band = jax.lax.dot(
                sel_pick, s2_ref[0:tile_h, :],
                precision=lax.Precision.HIGHEST,
            )
            for j in range(k):
                prod = cur_ref[:] * win_ref[0:tile_h, j : j + tile_w]
                x = _sliding_sums(
                    jax.lax.dot(
                        sel_sum, prod, precision=lax.Precision.HIGHEST
                    ),
                    blk_dim,
                    axis=1,
                )
                candidate(i, j, x, s2band[:, j : j + tile_w])
            win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
            s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
            return 0
    else:
        def dy_body(i, _):
            row_ref[:] = win_ref[0:tile_h, :]
            s2row_ref[:] = jax.lax.dot(
                sel_pick, s2_ref[0:tile_h, :],
                precision=lax.Precision.HIGHEST,
            )
            cur_v = cur_ref[:]

            def dx_body(j, _):
                prod = cur_v * row_ref[:, 0:tile_w].astype(jnp.float32)
                x = _sliding_sums(
                    jax.lax.dot(
                        sel_sum, prod, precision=lax.Precision.HIGHEST
                    ),
                    blk_dim,
                    axis=1,
                )  # [nby_t, W]
                candidate(i, j, x, s2row_ref[:, 0:tile_w])
                # roll by size-1 ≡ roll by -1: bring lane j+1 to lane j.
                row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                s2row_ref[:] = pltpu.roll(s2row_ref[:], halo_w - 1, 1)
                return 0

            lax.fori_loop(0, k, dx_body, 0)
            win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
            s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
            return 0

    lax.fori_loop(0, k, dy_body, 0)
    cost_out[:] = bc_ref[:]
    idx_out[:] = bi_ref[:]


def _kernel_f32_bf16(
    ref_hbm,          # [rows, halo_w] f32, HBM: span-padded reference panel
    cur_ref,          # [TH, W] f32, VMEM stripe
    cost_out,         # [nby_t, W] f32 block of [Hp2/b, W]
    idx_out,          # [nby_t, W] int32 block
    win_ref,          # [halo_rows, halo_w] f32 scratch (rolled per dy)
    s2_ref,           # [halo_rows, halo_w] f32 scratch (rolled per dy)
    band16_ref,       # [TH, halo_w] bf16 scratch (staged dy row band)
    cur16_ref,        # [TH, W] bf16 scratch (staged current stripe)
    s2row_ref,        # [nby_t, halo_w] f32 scratch
    qcur_ref,         # [nby_t, W] f32 scratch
    bc_ref,           # [nby_t, W] f32 scratch (best cost)
    bi_ref,           # [nby_t, W] int32 scratch (best flat index)
    p_ref,            # [TH, chunk*W] f32 scratch (product staging)
    in_sem,
    *,
    blk_dim: int,
    span: int,
    tile_h: int,
    tile_w: int,
    frame_height: int,
    frame_width: int,
    x_origin: int,
    chunk: int,
):
    """Half-width-operand variant of the chunked `_kernel_f32` (exact).

    Pixel values <= 255 are bf16-exact, so the per-candidate operands are
    *staged* as bf16 (halving the dominant VMEM read traffic) and widened
    to f32 in registers before the multiply — every product and sum is
    still computed exactly in f32.

    Mosaic on TPU v5e miscompiles `pltpu.roll` and dynamic slices on bf16
    vectors (crashes the backend), so nothing bf16 is ever rolled or
    dynamically sliced here: the dy loop rolls the *f32* window and
    re-stages its top band as bf16 once per dy (amortized over the k dx
    candidates), and each dx candidate reads a *static* lane slice
    `band16[:, j:j+W]`. dx candidates are batched `chunk` at a time
    through one MXU row-compaction matmul (same scheme as the chunk_dx
    mode of `_kernel_f32`); a full static dy unroll would shrink traffic
    further but blows Mosaic compile time past 10 minutes.
    """
    k = 2 * span + 1
    nby_t = tile_h // blk_dim
    y0 = pl.program_id(0) * tile_h
    halo_rows = win_ref.shape[0]

    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem
    )
    copy_in.start()

    sel_sum = _row_selector(nby_t, tile_h, blk_dim, "sum")
    sel_pick = _row_selector(nby_t, tile_h, blk_dim, "pick")
    tl_y = y0 + lax.broadcasted_iota(jnp.int32, (nby_t, 1), 0) * blk_dim
    tl_x = x_origin + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)

    cur16_ref[:] = cur_ref[:].astype(jnp.bfloat16)
    qcur_ref[:] = _sliding_sums(
        jax.lax.dot(
            sel_sum, cur_ref[:] * cur_ref[:], precision=lax.Precision.HIGHEST
        ),
        blk_dim,
        axis=1,
    )
    bc_ref[:] = jnp.full((nby_t, tile_w), _BIG_F32, jnp.float32)
    bi_ref[:] = jnp.full((nby_t, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    win0 = win_ref[:]
    s2_ref[:] = _sliding_sums(
        _sliding_sums(win0 * win0, blk_dim, axis=0), blk_dim, axis=1
    )

    def fold(i, j, x, s2row_band):
        d_y = i - span
        d_x = j - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_dim)
        ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_dim)
        ssd = (qcur_ref[:] - x) + (s2row_band - x)
        cand = jnp.where(ok_y & ok_x, ssd, _BIG_F32)
        take = cand < bc_ref[:]  # strict < == first-raster-wins
        bc_ref[:] = jnp.where(take, cand, bc_ref[:])
        bi_ref[:] = jnp.where(take, i * k + j, bi_ref[:])

    def dy_body(i, _):
        band16_ref[:] = win_ref[0:tile_h, :].astype(jnp.bfloat16)
        s2row_ref[:] = jax.lax.dot(
            sel_pick, s2_ref[0:tile_h, :], precision=lax.Precision.HIGHEST
        )
        cur16 = cur16_ref[:].astype(jnp.float32)
        for c0 in range(0, k, chunk):
            n_t = min(chunk, k - c0)
            for t in range(n_t):
                j = c0 + t
                p_ref[:, t * tile_w : (t + 1) * tile_w] = (
                    cur16
                    * band16_ref[:, j : j + tile_w].astype(jnp.float32)
                )
            x_all = _sliding_sums(
                jax.lax.dot(
                    sel_sum, p_ref[:, 0 : n_t * tile_w],
                    precision=lax.Precision.HIGHEST,
                ),
                blk_dim,
                axis=1,
            )
            for t in range(n_t):
                j = c0 + t
                fold(
                    i, j,
                    x_all[:, t * tile_w : (t + 1) * tile_w],
                    s2row_ref[:, j : j + tile_w],
                )
        win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
        s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
        return 0

    lax.fori_loop(0, k, dy_body, 0)
    cost_out[:] = bc_ref[:]
    idx_out[:] = bi_ref[:]


def _kernel_f32_wide(
    ref_hbm,          # [rows, halo_w] f32, HBM: span-padded reference panel
    cur_ref,          # [TH, W] f32, VMEM stripe
    cost_out,         # [nby_t, W] int32 block of [Hp2/b, W]
    idx_out,          # [nby_t, W] int32 block
    win_ref,          # [halo_rows, halo_w] f32 scratch (rolled per dy)
    s2_ref,           # [halo_rows, halo_w] f32 scratch: part-row Qref sums
    row_ref,          # [TH, halo_w] f32 scratch (rolled per dx)
    s2row_ref,        # [nby_t, halo_w] int32 scratch (rolled per dx)
    qcur_ref,         # [nby_t, W] int32 scratch
    bc_ref,           # [nby_t, W] int32 scratch (best cost)
    bi_ref,           # [nby_t, W] int32 scratch (best flat index)
    p_ref,            # [TH, 2*chunk*W] f32 scratch (product staging)
    in_sem,
    *,
    blk_dim: int,
    span: int,
    tile_h: int,
    tile_w: int,
    frame_height: int,
    frame_width: int,
    x_origin: int,
    chunk: int,
):
    """Fast search for wide blocks (blk_dim in {24, 32}, interior blocks).

    Same MXU machinery as the chunked `_kernel_f32`, but a 32-wide block's
    SSD terms reach 255²·32² ≈ 2²⁶ — past exact-f32 range. Split each
    block into `parts` 8-row slabs: every partial sum (products ≤ 255²,
    8-row matmul compaction ≤ 255²·8, lane sliding sum of width blk_dim
    ≤ 255²·8·32 < 2²⁴) stays f32-exact, and the parts are accumulated in
    int32. Costs, compares, and outputs are int32 — bit-exact vs the
    golden path and the exact per-pixel kernel."""
    k = 2 * span + 1
    q = 8  # part rows: 255²·8·blk_dim < 2²⁴ for blk_dim <= 32
    parts = blk_dim // q
    nby_t = tile_h // blk_dim
    m = parts * nby_t
    y0 = pl.program_id(0) * tile_h
    halo_rows = win_ref.shape[0]
    halo_w = win_ref.shape[1]

    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem
    )
    copy_in.start()

    # Part-row selectors: matmul row p*nby_t + r covers block-row r's
    # 8-row slab p (sum) / its first row (pick).
    rr = lax.broadcasted_iota(jnp.int32, (m, tile_h), 0)
    yy = lax.broadcasted_iota(jnp.int32, (m, tile_h), 1)
    top = (rr % nby_t) * blk_dim + (rr // nby_t) * q
    sel_sum = ((yy >= top) & (yy < top + q)).astype(jnp.float32)
    sel_pick = (yy == top).astype(jnp.float32)

    tl_y = y0 + lax.broadcasted_iota(jnp.int32, (nby_t, 1), 0) * blk_dim
    tl_x = x_origin + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)

    def part_sum_i32(x_m):
        """[m, n] f32 exact part sums -> [nby_t, n] int32 block sums."""
        acc = x_m[0:nby_t, :].astype(jnp.int32)
        for p in range(1, parts):
            acc = acc + x_m[p * nby_t : (p + 1) * nby_t, :].astype(
                jnp.int32
            )
        return acc

    cur = cur_ref[:]
    qcur_ref[:] = part_sum_i32(
        _sliding_sums(
            jax.lax.dot(
                sel_sum, cur * cur, precision=lax.Precision.HIGHEST
            ),
            blk_dim,
            axis=1,
        )
    )
    bc_ref[:] = jnp.full((nby_t, tile_w), cost_lib.INT32_MAX, jnp.int32)
    bi_ref[:] = jnp.full((nby_t, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    win0 = win_ref[:]
    # Qref part pyramid: 8-row column sums (≤ 255²·8, f32-exact), then a
    # blk-wide lane sliding sum (≤ 255²·8·blk < 2²⁴, f32-exact). The
    # 4 parts of a block's Qref are rows y+8p, summed per dy in int32.
    s2_ref[:] = _sliding_sums(
        _sliding_sums(win0 * win0, q, axis=0), blk_dim, axis=1
    )

    def candidate(i, j, x_int):
        d_y = i - span
        d_x = j - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_dim)
        ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_dim)
        ssd = (qcur_ref[:] - x_int) + (s2row_ref[:, 0:tile_w] - x_int)
        cand = jnp.where(ok_y & ok_x, ssd, cost_lib.INT32_MAX)
        take = cand < bc_ref[:]  # strict < == first-raster-wins
        bc_ref[:] = jnp.where(take, cand, bc_ref[:])
        bi_ref[:] = jnp.where(take, i * k + j, bi_ref[:])

    def dy_body(i, _):
        row_ref[:] = win_ref[0:tile_h, :]
        s2row_ref[:] = part_sum_i32(
            jax.lax.dot(
                sel_pick, s2_ref[0:tile_h, :],
                precision=lax.Precision.HIGHEST,
            )
        )
        cur_v = cur_ref[:]
        for g, c0 in enumerate(range(0, k, chunk)):
            n_t = min(chunk, k - c0)
            half = (g % 2) * chunk * tile_w
            for t in range(n_t):
                p_ref[
                    :, half + t * tile_w : half + (t + 1) * tile_w
                ] = cur_v * row_ref[:, 0:tile_w].astype(jnp.float32)
                row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
            x_all = _sliding_sums(
                jax.lax.dot(
                    sel_sum, p_ref[:, half : half + n_t * tile_w],
                    precision=lax.Precision.HIGHEST,
                ),
                blk_dim,
                axis=1,
            )
            for t in range(n_t):
                x_int = part_sum_i32(
                    x_all[:, t * tile_w : (t + 1) * tile_w]
                )
                candidate(i, c0 + t, x_int)
                s2row_ref[:] = pltpu.roll(s2row_ref[:], halo_w - 1, 1)
        win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
        s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)
        return 0

    lax.fori_loop(0, k, dy_body, 0)
    cost_out[0, :, :] = bc_ref[:]
    idx_out[0, :, :] = bi_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "tile_h", "x_origin", "chunk", "interpret",
    ),
)
def _run_f32_wide(
    cur_padded,
    ref_padded,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    tile_h: int,
    x_origin: int,
    chunk: int,
    interpret: bool,
):
    """Fast wide-block search over a padded f32 panel (interior blocks).
    Returns block-grid (ssd_i32, idx)."""
    hp2, wp2 = cur_padded.shape
    nby_t = tile_h // blk_dim
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    kernel = functools.partial(
        _kernel_f32_wide,
        blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
        frame_height=frame_height, frame_width=frame_width,
        x_origin=x_origin, chunk=chunk,
    )
    n_stripes = hp2 // tile_h
    # Outputs are 3-D [stripe, nby_t, W] with block (1, nby_t, W): nby_t
    # (e.g. 4 block rows per stripe at blk 32) is smaller than the 8-row
    # sublane tile, which a 2-D block spec would reject.
    cost_px, idx_px = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nby_t, wp2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nby_t, wp2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_stripes, nby_t, wp2), jnp.int32),
            jax.ShapeDtypeStruct((n_stripes, nby_t, wp2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((tile_h, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, halo_w), jnp.int32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((tile_h, 2 * chunk * wp2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ref_padded, cur_padded)
    cost_px = cost_px.reshape(n_stripes * nby_t, wp2)
    idx_px = idx_px.reshape(n_stripes * nby_t, wp2)
    return cost_px[:, ::blk_dim], idx_px[:, ::blk_dim]


def _lexmin_pairs(cost, idx, n_groups: int, g: int):
    """Static lexicographic min-tree over `n_groups` row groups of height g.

    cost/idx: [n_groups*g, W]. Returns ([g, W], [g, W]) — the per-(R, lane)
    minimum of (cost, idx) over groups, ties to the smallest idx (the flat
    raster index ⇒ reference first-in-raster-order-wins, main.c:53-60).
    """
    def lexmin(ca, ia, cb, ib):
        take = (cb < ca) | ((cb == ca) & (ib < ia))
        return jnp.where(take, cb, ca), jnp.where(take, ib, ia)

    while n_groups > 1:
        h = n_groups // 2
        ca, ia = cost[: h * g, :], idx[: h * g, :]
        cb, ib = cost[h * g : 2 * h * g, :], idx[h * g : 2 * h * g, :]
        cm, im = lexmin(ca, ia, cb, ib)
        if n_groups % 2:
            # odd tail group folds into the first group
            ct, it = cost[2 * h * g :, :], idx[2 * h * g :, :]
            c0, i0 = lexmin(cm[0:g, :], im[0:g, :], ct, it)
            cm = jnp.concatenate([c0, cm[g:, :]], 0) if h > 1 else c0
            im = jnp.concatenate([i0, im[g:, :]], 0) if h > 1 else i0
        cost, idx, n_groups = cm, im, h
    return cost, idx


def _keymin_tree(key, n_groups: int, g: int):
    """Static min-tree over `n_groups` row groups of height g (packed keys)."""
    while n_groups > 1:
        h = n_groups // 2
        m = jnp.minimum(key[: h * g, :], key[h * g : 2 * h * g, :])
        if n_groups % 2:
            tail = jnp.minimum(m[0:g, :], key[2 * h * g :, :])
            m = jnp.concatenate([tail, m[g:, :]], 0) if h > 1 else tail
        key, n_groups = m, h
    return key


def _phase_key_fits(blk_dim: int, span: int, metric: str) -> bool:
    """True iff cost*K^2 + flat fits int32 with a -2^31 bias (exact argmin
    by plain min over packed keys)."""
    k = 2 * span + 1
    max_cost = (255 * 255 if metric == "mse" else 255) * blk_dim * blk_dim
    return (max_cost + 1) * k * k <= 2**32 - 1


def _kernel_phase(
    org_ref,          # [2] i32, SMEM: (y_origin, x_origin) — dynamic so the
                      #   same program serves every shard under shard_map
    ref_hbm,          # [rows, halo_w] f32, HBM: span-padded reference panel
    cur_ref,          # [TH, W] f32, VMEM stripe (TH = 8*blk)
    cost_out,         # [8, W] i32 block of [Hp2/b, W]
    idx_out,          # [8, W] i32 block
    vol_hbm,          # [S, K, K*8, W] i32, HBM (emit_volume only; else tiny)
    win_ref,          # [halo_rows, halo_w] f32 scratch
    c_ref,            # [TH, W] f32 scratch: cur phase planes (r-major)
    e_ref,            # [n_phase*8, halo_w] f32 scratch: ref phase planes
    w_ref,            # [K*8, W] f32 scratch: per-dy block-row sums
    oky_ref,          # [K*8, 1] i32: dy*K (+bias) when dy valid, else MAX
    bc_ref,           # [K*8, W] i32: running min (packed key, or cost)
    bi_ref,           # [K*8 or 8, W] i32: running idx (lex path only)
    vbuf_ref,         # [K*8, W] i32 scratch (emit_volume only)
    in_sem,
    vol_sems,         # DMA sem (emit_volume only)
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    metric: str,
    use_key: bool,
    emit_volume: bool = False,
):
    """Phase-plane full-search kernel (blk_dim in {8, 16, 32}, interior
    blocks).

    TPU-native redesign of the CUDA kernel's work (main_mse.cu:41-141) with
    NO per-candidate matmul and no per-candidate roll of the window band —
    round 1's chunked-matmul kernel spent ~80% of its time in an M=16
    selector matmul padded 8x to the 128-row MXU (measured by ablation,
    tools/kern_lab.py). Scheme:

    * Once per stripe, restage cur and the halo band into stride-blk
      "phase planes" via two permutation matmuls: C[r][R, x] = cur row
      R*blk+r; E[p][R, x] = win row R*blk+p. Slabs are static sublane
      slices thereafter.
    * dx is the outer (fori) loop: ONE cumulative lane roll of E per dx
      serves all K dy candidates.
    * Per (dx, dy): block-row sums via a blk-term VPU chain in diff form —
      w = sum_r f(C[r] - E[dy+r]), f = square (SSD) or abs (SAD); every
      term is an exact integer < 2^24 in f32. The blk-wide lane sliding
      sum of w is then the full block cost.
    * Argmin: evaluation order is dx-outer, so the tie rule is enforced
      explicitly. When cost*K^2+flat fits int32 (blk 8, and SAD generally)
      the (cost, flat) pair packs into ONE biased int32 key and the argmin
      is a plain running `min` + a static min-tree over the dy groups;
      otherwise a lexicographic (cost, idx) running min. Both reproduce
      first-in-raster-order-wins exactly (main.c:53-60).
    """
    k = 2 * span + 1
    g = 8  # block rows per stripe (nby_t)
    tile_h = g * blk_dim
    n_phase = blk_dim + 2 * span
    halo_rows = win_ref.shape[0]
    halo_w = win_ref.shape[1]
    tile_w = cur_ref.shape[1]
    kk = k * k
    bias = -(2**31)
    i32max = 2**31 - 1

    y0 = pl.program_id(0) * tile_h
    copy_in = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem
    )
    copy_in.start()

    def perm(rows, cols):
        i = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        q = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return (q == (i % g) * blk_dim + i // g).astype(jnp.float32)

    c_ref[:] = jax.lax.dot(
        perm(tile_h, tile_h), cur_ref[:], precision=lax.Precision.HIGHEST
    )
    bc_ref[:] = jnp.full((k * g, tile_w), i32max, jnp.int32)
    if not use_key:
        bi_ref[:] = jnp.full((k * g, tile_w), i32max, jnp.int32)

    row = lax.broadcasted_iota(jnp.int32, (k * g, 1), 0)
    dyv = row // g
    tl_y = org_ref[0] + y0 + (row % g) * blk_dim
    ok_y = (tl_y + dyv - span >= 0) & (
        tl_y + dyv - span <= frame_height - blk_dim
    )
    oky_ref[:] = jnp.where(
        ok_y, dyv * k + (bias if use_key else 0), i32max
    )

    copy_in.wait()
    e_ref[:] = jax.lax.dot(
        perm(n_phase * g, halo_rows), win_ref[:],
        precision=lax.Precision.HIGHEST,
    )

    tl_x = org_ref[1] + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)

    def process_dx(j, slot, do_wait=False):
        """Everything for one dx candidate; slot is the static volume
        double-buffer index (emit_volume only), do_wait (static) waits
        for the DMA issued two dx ago on the same slot."""
        d_x = j - span
        ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_dim)
        for dy in range(k):
            terms = []
            for r in range(blk_dim):
                p = dy + r
                d = (
                    c_ref[r * g : (r + 1) * g, :]
                    - e_ref[p * g : (p + 1) * g, 0:tile_w]
                )
                terms.append(jnp.abs(d) if metric == "sad" else d * d)
            w_ref[dy * g : (dy + 1) * g, :] = functools.reduce(
                lambda a, b: a + b, terms
            )
        # Exactness gate for the lane sliding sum: the per-row chain sums
        # in w are <= 255^2 * blk < 2^24 (exact f32), but the blk-wide
        # lane sum can reach 255^2 * blk^2 — past 2^24 for blk 32 (SSD),
        # so wide SSD blocks run the roll-and-add tree in int32.
        if (65025 if metric == "mse" else 255) * blk_dim * blk_dim < 2**24:
            x = _sliding_sums(w_ref[:], blk_dim, axis=1).astype(jnp.int32)
        else:
            x = _sliding_sums(
                w_ref[:].astype(jnp.int32), blk_dim, axis=1
            )
        valid = ok_x & (oky_ref[:] != i32max)

        # lax.select (the raw primitive), not jnp.where: jnp.where's
        # jit-wrapped `_where` subcall inside an effects-carrying fori
        # body (the volume DMAs below) trips a JAX interpret-mode
        # lowering-cache KeyError.
        def sel(pred, a, b):
            shape = jnp.broadcast_shapes(pred.shape, a.shape, b.shape)
            return lax.select(
                jnp.broadcast_to(pred, shape),
                jnp.broadcast_to(a, shape),
                jnp.broadcast_to(b, shape),
            )

        full_max = jnp.full((k * g, tile_w), i32max, jnp.int32)
        if emit_volume:
            # Stream this dx's [K*8, W] cost slab (sentinel at invalid
            # candidates) to HBM. One buffer, overlapped in time: the
            # previous DMA (primed with a dummy before the loop so the
            # body stays uniform) ran during this dx's chain compute, so
            # the wait is effectively free, and the fresh DMA overlaps
            # the argmin fold + roll below. The wait descriptor names
            # the dump slot; only the semaphore identity matters.
            pltpu.make_async_copy(
                vbuf_ref, vol_hbm.at[pl.program_id(0), k], vol_sems
            ).wait()
            vbuf_ref[:] = sel(valid, x, full_max)
            pltpu.make_async_copy(
                vbuf_ref,
                vol_hbm.at[pl.program_id(0), j],
                vol_sems,
            ).start()
        if use_key:
            key = x * kk + (oky_ref[:] + j)
            bc_ref[:] = jnp.minimum(bc_ref[:], sel(valid, key, full_max))
        else:
            cand = sel(valid, x, full_max)
            flat = oky_ref[:] + j
            bc, bi = bc_ref[:], bi_ref[:]
            take = (cand < bc) | ((cand == bc) & (flat < bi))
            bc_ref[:] = sel(take, cand, bc)
            bi_ref[:] = sel(take, jnp.broadcast_to(flat, bi.shape), bi)
        e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)

    if emit_volume:
        # Prime the single-buffer pipeline with a dummy DMA to the dump
        # slot (vol_hbm row k) so every loop iteration's wait is
        # unconditional and the body stays uniform (no peeling — a
        # duplicated body trips a JAX interpret-mode lowering-cache bug).
        pltpu.make_async_copy(
            vbuf_ref, vol_hbm.at[pl.program_id(0), k], vol_sems
        ).start()

        def dx_body_emit(j, _):
            process_dx(j, None)
            return 0

        lax.fori_loop(0, k, dx_body_emit, 0)
        pltpu.make_async_copy(
            vbuf_ref, vol_hbm.at[pl.program_id(0), k - 1], vol_sems
        ).wait()
    else:

        def dx_body(j, _):
            process_dx(j, None)
            return 0

        lax.fori_loop(0, k, dx_body, 0)

    if use_key:
        key = _keymin_tree(bc_ref[:], k, g)
        # Decode key = cost*kk + flat + bias with int32-safe arithmetic:
        # 2^31 = q0*kk + r0  =>  flat = ((key mod kk) + r0) mod kk and
        # key - flat + r0 = kk*(cost - q0), an exact multiple.
        q0, r0 = divmod(2**31, kk)
        flat = jnp.mod(jnp.mod(key, kk) + r0, kk)
        cost = lax.div(key - flat + r0, kk) + q0
        # Blocks with no valid candidate (padding rows) decode garbage;
        # emit the centre displacement like the golden path's init.
        none = key == i32max
        cost_out[:] = jnp.where(none, i32max, cost)
        idx_out[:] = jnp.where(none, span * k + span, flat)
    else:
        cost, idx = _lexmin_pairs(bc_ref[:], bi_ref[:], k, g)
        none = cost == i32max
        cost_out[:] = cost
        idx_out[:] = jnp.where(none, span * k + span, idx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "metric", "interpret", "emit_volume",
    ),
)
def _run_phase(
    cur_padded,
    ref_padded,
    origins,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    metric: str,
    interpret: bool,
    emit_volume: bool = False,
):
    """Phase-plane search over a padded f32 panel. Returns block-grid
    (cost_i32, idx) for interior blocks — plus, with `emit_volume`, the
    full per-candidate cost volume [k², hp2//blk, wp2] int32 (sentinel
    at invalid candidates), streamed from the kernel per dx at phase-
    kernel efficiency (~1.9x the legacy chunked emit path).

    origins: int32 [2] = (y_origin, x_origin) of the panel's top-left in
    global frame coordinates — a *traced* value (SMEM scalar input), so
    one compiled program serves every shard of a `shard_map` mesh."""
    hp2, wp2 = cur_padded.shape
    g = 8
    tile_h = g * blk_dim
    k = 2 * span + 1
    n_phase = blk_dim + 2 * span
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    use_key = _phase_key_fits(blk_dim, span, metric)
    kernel = functools.partial(
        _kernel_phase,
        blk_dim=blk_dim, span=span,
        frame_height=frame_height, frame_width=frame_width,
        metric=metric, use_key=use_key, emit_volume=emit_volume,
    )
    n_stripes = hp2 // tile_h
    # Volume layout is (stripe, dx, dy*g + R, lane): the kernel's per-dx
    # [K*g, W] cost slab is dy-major, so one DMA per dx lands the whole
    # slab contiguously; the dy-major [k², rows, lanes] view the replay
    # wants is a cheap transpose below.
    # Row k of the dx axis is a dump slot for the pipeline-priming DMA.
    vol_shape = (
        (n_stripes, k + 1, k * g, wp2) if emit_volume else (1, 1, 8, 128)
    )
    cost_px, idx_px, vol = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, wp2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.int32),
            jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.int32),
            jax.ShapeDtypeStruct(vol_shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((tile_h, wp2), jnp.float32),
            pltpu.VMEM((n_phase * g, halo_w), jnp.float32),
            pltpu.VMEM((k * g, wp2), jnp.float32),
            pltpu.VMEM((k * g, 1), jnp.int32),
            pltpu.VMEM((k * g, wp2), jnp.int32),
            pltpu.VMEM(((k * g, wp2) if not use_key else (8, 128)),
                       jnp.int32),
            pltpu.VMEM(
                (k * g, wp2) if emit_volume else (8, 128),
                jnp.int32,
            ),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(origins.astype(jnp.int32), ref_padded, cur_padded)
    if emit_volume:
        # [S, dx, dy, R(g), W] -> [dy*k + dx, S*g + R, W] (drop dump row)
        volume = (
            vol[:, :k]
            .reshape(n_stripes, k, k, g, wp2)
            .transpose(2, 1, 0, 3, 4)
            .reshape(k * k, n_stripes * g, wp2)
        )
        return cost_px[:, ::blk_dim], idx_px[:, ::blk_dim], volume
    return cost_px[:, ::blk_dim], idx_px[:, ::blk_dim]


def _phase_panel_target(
    blk_dim: int, span: int, metric: str, emit_volume: bool = False
) -> int:
    """Widest 128-multiple panel whose phase-kernel VMEM fits ~11.5 MB."""
    g = 8
    k = 2 * span + 1
    n_phase = blk_dim + 2 * span
    tile_h = g * blk_dim
    halo_rows = _round_up(tile_h + 2 * span, 8)
    lex = not _phase_key_fits(blk_dim, span, metric)
    for pw in (2048, 1536, 1024, 768, 512, 384, 256, 128):
        halo_w = _round_up(pw + 2 * span, 128)
        b = 4 * (
            halo_rows * halo_w          # win
            + tile_h * pw               # c
            + n_phase * g * halo_w      # e
            + k * g * pw                # w
            + k * g * pw * (2 if lex else 1)  # bc (+ bi)
            + (k * g * pw if emit_volume else 0)  # vbuf
            + 2 * tile_h * pw           # input double buffer
            + 4 * g * pw                # output double buffers
        )
        if b <= 11.5e6:
            return pw
    return 128


def _kernel_int(
    ref_hbm,          # [rows, halo_w] int32, HBM
    cur_ref,          # [TH, W] int32, VMEM stripe
    ssd_hbm,          # [Hp2, W] int32, HBM (manual DMA out)
    idx_hbm,          # [Hp2, W] int32, HBM (manual DMA out)
    win_ref,          # [halo_rows, halo_w] int32 scratch (rolled in place)
    row_ref,          # [TH, halo_w] int32 scratch (rolled in place)
    bc_ref,           # [TH, W] int32 scratch
    bi_ref,           # [TH, W] int32 scratch
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
    metric: str = "mse",
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

    # Per-pixel geometry: every position is a potential block top-left with
    # *truncated* extents; only multiples of blk_dim are real blocks and
    # only those are unmasked.
    iy = lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
    ix = lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
    tl_y = y0 + iy
    tl_x = x_origin + ix
    blk_h = jnp.clip(frame_height - tl_y, 0, blk_dim)
    blk_w = jnp.clip(frame_width - tl_x, 0, blk_dim)
    rep = ((iy % blk_dim) == 0) & ((ix % blk_dim) == 0)
    pix_mask = ((tl_y < frame_height) & (tl_x < frame_width)).astype(
        jnp.int32
    )

    bc_ref[:] = jnp.full((tile_h, tile_w), cost_lib.INT32_MAX, jnp.int32)
    bi_ref[:] = jnp.full((tile_h, tile_w), span * k + span, jnp.int32)

    copy_in.wait()
    cur = cur_ref[:] * pix_mask

    def dy_body(i, _):
        d_y = i - span
        ok_y = (tl_y + d_y >= 0) & (tl_y + d_y <= frame_height - blk_h)
        row_ref[:] = win_ref[0:tile_h, :]

        def dx_body(j, _):
            d_x = j - span
            diff = cur - row_ref[:, 0:tile_w] * pix_mask
            per_px = jnp.abs(diff) if metric == "sad" else diff * diff
            sums = _sliding_sums(
                _sliding_sums(per_px, blk_dim, axis=0),
                blk_dim,
                axis=1,
            )
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= frame_width - blk_w)
            cand = jnp.where(ok_y & ok_x & rep, sums, cost_lib.INT32_MAX)
            take = cand < bc_ref[:]
            bc_ref[:] = jnp.where(take, cand, bc_ref[:])
            bi_ref[:] = jnp.where(take, i * k + j, bi_ref[:])
            row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, k, dx_body, 0)
        win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
        return 0

    lax.fori_loop(0, k, dy_body, 0)

    out_row = pl.program_id(0) * tile_h
    copy_cost = pltpu.make_async_copy(
        bc_ref, ssd_hbm.at[pl.ds(out_row, tile_h), :], out_sems.at[0]
    )
    copy_idx = pltpu.make_async_copy(
        bi_ref, idx_hbm.at[pl.ds(out_row, tile_h), :], out_sems.at[1]
    )
    copy_cost.start()
    copy_idx.start()
    copy_cost.wait()
    copy_idx.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "tile_h", "x_origin", "y_origin", "interpret", "metric",
    ),
)
def _run_int(
    cur_padded,
    ref_padded,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    tile_h: int,
    x_origin: int,
    y_origin: int,
    interpret: bool,
    metric: str = "mse",
):
    """Exact int32 search over a padded slab. Returns pixel-positioned
    (cost, idx); valid entries at positions that are multiples of blk_dim."""
    hp2, wp2 = cur_padded.shape
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    kernel = functools.partial(
        _kernel_int,
        blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
        frame_height=frame_height, frame_width=frame_width,
        x_origin=x_origin, y_origin=y_origin, metric=metric,
    )
    out_shape = jax.ShapeDtypeStruct((hp2, wp2), jnp.int32)
    ssd_px, idx_px = pl.pallas_call(
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
        out_shape=[out_shape, out_shape],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, halo_w), jnp.int32),
            pltpu.VMEM((tile_h, halo_w), jnp.int32),
            pltpu.VMEM((tile_h, wp2), jnp.int32),
            pltpu.VMEM((tile_h, wp2), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_padded, cur_padded)
    return ssd_px[::blk_dim, ::blk_dim], idx_px[::blk_dim, ::blk_dim]


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "frame_height", "frame_width",
        "tile_h", "x_origin", "interpret", "unroll_dx", "chunk_dx",
        "operand_bf16", "emit_volume",
    ),
)
def _run_f32(
    cur_padded,
    ref_padded,
    *,
    blk_dim: int,
    span: int,
    frame_height: int,
    frame_width: int,
    tile_h: int,
    x_origin: int,
    interpret: bool,
    unroll_dx: bool = False,
    chunk_dx: int = 0,
    operand_bf16: bool = False,
    emit_volume: bool = False,
):
    """Fast f32 search over a padded panel (interior blocks).
    Returns block-grid (ssd_i32, idx)[, cost volume [k², Hp2/b, W] f32]."""
    hp2, wp2 = cur_padded.shape
    nby_t = tile_h // blk_dim
    halo_rows = _round_up(tile_h + 2 * span, 8)
    halo_w = ref_padded.shape[1]
    k = 2 * span + 1
    if emit_volume and (operand_bf16 or chunk_dx <= 1):
        raise ValueError("emit_volume requires the chunk_dx f32 kernel")
    if operand_bf16:
        chunk = chunk_dx if chunk_dx > 1 else 5
        kernel = functools.partial(
            _kernel_f32_bf16,
            blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
            frame_height=frame_height, frame_width=frame_width,
            x_origin=x_origin, chunk=chunk,
        )
        scratch_shapes = [
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((tile_h, halo_w), jnp.bfloat16),
            pltpu.VMEM((tile_h, wp2), jnp.bfloat16),
            pltpu.VMEM((nby_t, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM((tile_h, chunk * wp2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = functools.partial(
            _kernel_f32,
            blk_dim=blk_dim, span=span, tile_h=tile_h, tile_w=wp2,
            frame_height=frame_height, frame_width=frame_width,
            x_origin=x_origin, unroll_dx=unroll_dx, chunk_dx=chunk_dx,
            emit_volume=emit_volume,
        )
        scratch_shapes = [
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((halo_rows, halo_w), jnp.float32),
            pltpu.VMEM((tile_h, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, halo_w), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.float32),
            pltpu.VMEM((nby_t, wp2), jnp.int32),
            pltpu.VMEM(
                (tile_h, 2 * chunk_dx * wp2)
                if chunk_dx > 1
                else (8, 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (2, nby_t, wp2) if emit_volume else (1, 8, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if operand_bf16:
        outs = pl.pallas_call(
            kernel,
            grid=(hp2 // tile_h,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, wp2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nby_t, wp2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nby_t, wp2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.float32),
                jax.ShapeDtypeStruct((hp2 // blk_dim, wp2), jnp.int32),
            ],
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(ref_padded, cur_padded)
        cost_px, idx_px = outs
        vol = None
    else:
        vol_shape = (
            (k * k, hp2 // blk_dim, wp2) if emit_volume else (1, 1, 128)
        )
        cost_px, idx_px, vol = pl.pallas_call(
            kernel,
            grid=(hp2 // tile_h,),
            in_specs=[
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
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(ref_padded, cur_padded)
    ssd = cost_px[:, ::blk_dim].astype(jnp.int32)  # exact: integers < 2²⁴
    if emit_volume:
        return ssd, idx_px[:, ::blk_dim], vol
    return ssd, idx_px[:, ::blk_dim]


def _pad_slab(frame, *, row_range, col_range, out_rows, out_cols, offset_r,
              offset_c, dtype):
    """Slice frame[rows, cols] (clamped to the frame) into a zero slab of
    [out_rows, out_cols] such that frame[r0, c0] lands at [offset_r +
    (r0 - row_range[0]), ...]. Used to build DMA-aligned halo slabs."""
    r0, r1 = row_range
    c0, c1 = col_range
    rc0, rc1 = max(0, r0), min(frame.shape[0], r1)
    cc0, cc1 = max(0, c0), min(frame.shape[1], c1)
    piece = frame[rc0:rc1, cc0:cc1].astype(dtype)
    top = offset_r + (rc0 - r0)
    left = offset_c + (cc0 - c0)
    return jnp.pad(
        piece,
        (
            (top, out_rows - top - piece.shape[0]),
            (left, out_cols - left - piece.shape[1]),
        ),
    )


def _panel_widths(wp: int, blk_dim: int, target: int = _PANEL_TARGET):
    """Split the block-padded width into DMA-aligned column panels.

    Panel width must be a multiple of lcm(128, blk_dim) so panel borders
    align to both the lane tiling and the block grid; the last panel is
    rounded up (zero-padded, masked)."""
    unit = math.lcm(128, blk_dim)
    panel = max(unit, (target // unit) * unit)
    starts = list(range(0, wp, panel))
    return [(s, min(panel, _round_up(wp - s, unit))) for s in starts]


def _phase_supported(blk_dim: int, span: int, metric: str) -> bool:
    """Whether the phase-plane kernel covers this config: MSE/SAD, blocks
    that divide the 128-lane tiling (panel borders must align to both),
    and a non-degenerate window. blk 32 runs the chain in f32 (row sums
    < 2^24 stay exact) with an int32 sliding-sum fold."""
    return (
        metric in ("mse", "sad")
        and blk_dim <= 32
        and 128 % blk_dim == 0
        and span >= 1
    )


def full_search_frame_pallas(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    tile: int | None = None,
    interpret: bool | None = None,
    unroll_dx: bool = False,
    chunk_dx: int = 5,
    operand_bf16: bool = False,
    phase: bool | None = None,
):
    """Whole-frame full-search (MSE or SAD) via the fused Pallas kernels.

    Bit-exact vs search.full_search_frame (and therefore vs the C
    reference): identical MVs, identical integer SSD/SAD costs.

    Args:
      metric: "mse" (minimise integer SSD, main.c:18-36) or "sad"
        (minimise integer SAD; reference cost slot, BASELINE config 1).
      tile: target stripe height in pixel rows (default 128); rounded up to
        a multiple of 8*blk_dim (fast path) or lcm(8, blk_dim) (exact
        path). Stripes span one column panel (~2048 lanes). Ignored by the
        phase kernel (fixed 8-block-row stripes).
      interpret: force interpreter mode (defaults to True off-TPU so tests
        run on CPU).
      phase: select the phase-plane kernel (the fastest path; default
        auto = on whenever supported: MSE/SAD, blk_dim in {4, 8, 16, 32},
        span >= 1). phase=False forces the legacy chunked kernels.
      unroll_dx / chunk_dx / operand_bf16: legacy chunked-kernel tuning
        knobs (chunk 5 was the fastest pre-phase config on TPU v5e).
    """
    if cur.shape != ref.shape:
        raise ValueError(
            f"current and reference frames must have identical shapes, "
            f"got {cur.shape} vs {ref.shape}"
        )
    if metric not in ("mse", "sad"):
        raise ValueError(
            f"full_search_frame_pallas supports metric 'mse' or 'sad', "
            f"got {metric!r} (SSIM lives in kernels.ssim_pallas)"
        )
    if phase and not _phase_supported(blk_dim, span, metric):
        raise ValueError(
            f"phase kernel requires metric mse/sad, blk_dim dividing 128 "
            f"and <= 32, span >= 1; got blk_dim={blk_dim} span={span} "
            f"metric={metric!r}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # One jitted program for the whole frame: padding, panel sweep, edge
    # slabs, and MV decode fuse into a single dispatch (eager per-op
    # dispatch otherwise dominates at ~1 ms/op on slow hosts).
    return _full_search_frame_jit(
        cur, ref, blk_dim=blk_dim, span=span, metric=metric,
        tile=tile if tile is not None else 128, interpret=interpret,
        unroll_dx=unroll_dx, chunk_dx=chunk_dx, operand_bf16=operand_bf16,
        phase=phase,
    )


@functools.partial(
    jax.jit,
    static_argnames=("blk_dim", "span", "tile", "interpret", "unroll_dx",
                     "chunk_dx", "operand_bf16", "metric", "phase"),
)
def _full_search_frame_jit(cur, ref, *, blk_dim, span, tile, interpret,
                           unroll_dx=False, chunk_dx=5,
                           operand_bf16=False, metric="mse", phase=None):
    frame_height, frame_width = cur.shape
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)

    use_phase = (
        _phase_supported(blk_dim, span, metric) if phase is None else phase
    )
    if use_phase:
        use_f32 = use_wide = False
    else:
        # Legacy kernels: the Qcur/Qref decomposition is SSD-specific, so
        # SAD falls through to the exact int kernel when phase is off.
        use_f32 = blk_dim <= 16 and metric == "mse"
        use_wide = (
            not use_f32 and blk_dim <= 32 and blk_dim % 8 == 0
            and metric == "mse"
        )
    fast = use_phase or use_f32 or use_wide
    if use_phase:
        stripe_unit = 8 * blk_dim
    elif use_f32:
        stripe_unit = 8 * blk_dim
    elif use_wide:
        stripe_unit = blk_dim
    else:
        stripe_unit = math.lcm(8, blk_dim)
    # Round the target DOWN to the stripe unit (min one unit): rounding up
    # inflates per-stripe VMEM past the 16 MB scoped limit (e.g. blk 7 →
    # unit 56 → a 128 target must become 112, not 168).
    if use_phase:
        tile_h = stripe_unit  # fixed 8 block rows per stripe
    else:
        tile_h = min(
            _round_up(hp, stripe_unit),
            max(stripe_unit, tile // stripe_unit * stripe_unit),
        )
    hp2 = _round_up(hp, tile_h)
    # must match _run_*'s halo_rows rounding
    halo_row_pad = _round_up(2 * span, 8)

    if use_phase:
        run = _run_phase
    elif use_f32:
        run = _run_f32
    elif use_wide:
        run = _run_f32_wide
    else:
        run = _run_int
    # operand_bf16 panels stay f32: the bf16 staging happens inside the
    # kernel (Mosaic v5e cannot DMA bf16 with dynamic sublane offsets).
    dtype = jnp.int32 if run is _run_int else jnp.float32

    panel_target = (
        _phase_panel_target(blk_dim, span, metric)
        if use_phase
        else _PANEL_TARGET
    )
    ssd_panels, idx_panels = [], []
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
        if use_phase:
            s, i = _run_phase(
                cur_p, ref_p, jnp.array([0, x0], jnp.int32),
                blk_dim=blk_dim, span=span,
                frame_height=frame_height, frame_width=frame_width,
                metric=metric, interpret=interpret,
            )
            ssd_panels.append(s)
            idx_panels.append(i)
            continue
        kwargs = dict(
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            x_origin=x0, interpret=interpret,
        )
        if use_f32:
            kwargs["tile_h"] = tile_h
            kwargs["unroll_dx"] = unroll_dx
            kwargs["chunk_dx"] = chunk_dx
            kwargs["operand_bf16"] = operand_bf16
        elif use_wide:
            # chunk 4 keeps 2*C product halves under the scoped-VMEM limit
            # at 2048-lane panels with the wider halo pyramids.
            kwargs["tile_h"] = tile_h
            kwargs["chunk"] = min(4, chunk_dx) if chunk_dx > 1 else 4
        else:
            kwargs["tile_h"] = tile_h
            kwargs["y_origin"] = 0
            kwargs["metric"] = metric
        s, i = run(cur_p, ref_p, **kwargs)
        ssd_panels.append(s)
        idx_panels.append(i)
    ssd = jnp.concatenate(ssd_panels, axis=1)[:nby, :nbx]
    idx = jnp.concatenate(idx_panels, axis=1)[:nby, :nbx]

    if fast:
        # Truncated edge blocks violate the fast kernels' uniform-block
        # assumptions; recompute them exactly on thin slabs and merge.
        if frame_height % blk_dim:
            e_ssd, e_idx = _edge_slab_bottom(
                cur, ref, blk_dim=blk_dim, span=span, interpret=interpret,
                metric=metric,
            )
            ssd = ssd.at[nby - 1, :].set(e_ssd[0, :nbx])
            idx = idx.at[nby - 1, :].set(e_idx[0, :nbx])
        if frame_width % blk_dim:
            e_ssd, e_idx = _edge_slab_right(
                cur, ref, blk_dim=blk_dim, span=span, interpret=interpret,
                metric=metric,
            )
            ssd = ssd.at[:, nbx - 1].set(e_ssd[:nby, 0])
            idx = idx.at[:, nbx - 1].set(e_idx[:nby, 0])

    mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
    _, _, blk_h, blk_w = geometry.block_extents(
        0, 0, nby, nbx, blk_dim, frame_height, frame_width
    )
    if metric == "sad":
        score = cost_lib.mad_from_sad(ssd, blk_h * blk_w)
    else:
        score = cost_lib.mse_from_ssd(ssd, blk_h * blk_w)
    return fs.MotionField(mv_y, mv_x, ssd, score)


def full_search_tile_pallas(
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
    interpret: bool = False,
):
    """Phase-kernel full search over one mesh shard's tile.

    The shard_map analogue of the CUDA grid launch (main_mse.cu:212-223):
    each shard runs this same compiled program on its own tile, with its
    global origin supplied as a *traced* (y_origin, x_origin) pair — the
    kernel reads it from SMEM, so one program serves every shard.

    cur_tile: [th, tw] f32/int (th, tw multiples of blk_dim — the mesh
      padding guarantees this); ref_halo: [th + 2*span, tw + 2*span], the
      exchanged reference halo, row/col i ↔ tile row/col i - span, zero
      outside the frame.

    Returns block-grid (cost_i32, flat_idx), [th//blk, tw//blk] each,
    exact for full blocks. Blocks truncated by the global frame edge
    (frame_height/width % blk_dim) are NOT handled here — the sharded
    driver repairs them with a golden thin-slab pass (sharded.py).
    """
    th, tw = cur_tile.shape
    if th % blk_dim or tw % blk_dim:
        raise ValueError(
            f"tile dims must be multiples of blk_dim, got {th}x{tw}"
        )
    if not _phase_supported(blk_dim, span, metric):
        raise ValueError(
            f"phase kernel unsupported for blk_dim={blk_dim} span={span} "
            f"metric={metric!r}"
        )
    tile_h = 8 * blk_dim
    hp2 = _round_up(th, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    ref_rows = hp2 + halo_row_pad  # tile rows [-span, hp2+halo_row_pad-span)
    panel_target = _phase_panel_target(blk_dim, span, metric)
    cur_f = cur_tile.astype(jnp.float32)
    ref_f = ref_halo.astype(jnp.float32)

    cost_panels, idx_panels = [], []
    for x0p, pw in _panel_widths(_round_up(tw, blk_dim), blk_dim,
                                 panel_target):
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
        c, i = _run_phase(
            cur_p, ref_p, origins,
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            metric=metric, interpret=interpret,
        )
        cost_panels.append(c)
        idx_panels.append(i)
    cost = jnp.concatenate(cost_panels, axis=1)
    idx = jnp.concatenate(idx_panels, axis=1)
    return cost[: th // blk_dim, : tw // blk_dim], idx[
        : th // blk_dim, : tw // blk_dim
    ]


def full_search_volume_tile_pallas(
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
    interpret: bool = False,
):
    """Per-shard [K², th//blk, tw//blk] int32 cost volume via the phase
    kernel's volume emission — the tile/shard_map analogue of
    `full_search_volume_pallas`, with the shard's global origin supplied
    as a traced (y_origin, x_origin) pair so one compiled program serves
    every shard (same contract as `full_search_tile_pallas`).

    cur_tile: [th, tw] (multiples of blk_dim); ref_halo:
    [th + 2*span, tw + 2*span], row/col i ↔ tile row/col i - span, zero
    outside the frame. Invalid displacements (candidate off the global
    frame) hold an int32-max sentinel. Consumer: the sharded staged
    diamond (`search.diamond.diamond_search_tile`).

    NOTE: interpret-mode lowering of the emit loop trips a JAX
    closed_call lowering-cache bug (same as `full_search_volume_pallas`);
    off-TPU callers should use the golden tile volume instead.
    """
    th, tw = cur_tile.shape
    if th % blk_dim or tw % blk_dim:
        raise ValueError(
            f"tile dims must be multiples of blk_dim, got {th}x{tw}"
        )
    if not _phase_supported(blk_dim, span, metric):
        raise ValueError(
            f"phase kernel unsupported for blk_dim={blk_dim} span={span} "
            f"metric={metric!r}"
        )
    tile_h = 8 * blk_dim
    hp2 = _round_up(th, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    ref_rows = hp2 + halo_row_pad
    panel_target = _phase_panel_target(
        blk_dim, span, metric, emit_volume=True
    )
    cur_f = cur_tile.astype(jnp.float32)
    ref_f = ref_halo.astype(jnp.float32)

    vol_panels = []
    for x0p, pw in _panel_widths(_round_up(tw, blk_dim), blk_dim,
                                 panel_target):
        halo_w = _round_up(pw + 2 * span, 128)
        cur_p = _pad_slab(
            cur_f, row_range=(0, hp2), col_range=(x0p, x0p + pw),
            out_rows=hp2, out_cols=pw, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        ref_p = _pad_slab(
            ref_f, row_range=(0, ref_rows), col_range=(x0p, x0p + halo_w),
            out_rows=ref_rows, out_cols=halo_w, offset_r=0, offset_c=0,
            dtype=jnp.float32,
        )
        origins = jnp.stack(
            [jnp.asarray(y_origin), jnp.asarray(x_origin) + x0p]
        ).astype(jnp.int32)
        _, _, vol = _run_phase(
            cur_p, ref_p, origins,
            blk_dim=blk_dim, span=span,
            frame_height=frame_height, frame_width=frame_width,
            metric=metric, interpret=interpret, emit_volume=True,
        )
        vol_panels.append(
            vol[:, : th // blk_dim, ::blk_dim][:, :, : pw // blk_dim]
        )
    return jnp.concatenate(vol_panels, axis=2)[:, :, : tw // blk_dim]


def volume_supported(blk_dim: int, span: int, metric: str) -> bool:
    """Whether `full_search_volume_pallas` covers this config: MSE/SAD
    with span >= 1 (the emit drain loop needs >= 2 DMA slots), at
    blk <= 16 (chunked emit family) or any phase-kernel config (blk 32
    via the int32 sliding-sum fold). The single source of truth for
    volume coverage — `search.diamond.staged_supported` and this
    module's own validation both call it, so extending the kernels'
    coverage cannot desynchronize the two."""
    return (
        metric in ("mse", "sad")
        and span >= 1
        and (blk_dim <= 16 or _phase_supported(blk_dim, span, metric))
    )


def full_search_volume_pallas(
    cur,
    ref,
    *,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    tile: int | None = None,
    interpret: bool | None = None,
    chunk_dx: int = 5,
):
    """Full [K², nby, nbx] int32 SSD/SAD cost volume via the fast Pallas
    kernel.

    Bit-exact (for valid candidates) vs the golden
    `full_search_tile(return_cost_volume=True)`; invalid displacements
    hold a sentinel larger than any cost. Truncated edge blocks are
    recomputed with the golden tile on thin slabs. Supports every
    phase-kernel config (MSE/SAD, blk_dim in {4, 8, 16, 32}); blk 32
    uses the int32 sliding-sum fold.

    The consumer is diamond search (search/diamond.py): on TPU the full
    volume is bandwidth-cheap to materialise while per-block sparse
    window evaluation is gather-bound, so diamond replays its trajectory
    over this volume.
    """
    if not volume_supported(blk_dim, span, metric):
        raise ValueError(
            f"full_search_volume_pallas: unsupported config blk_dim="
            f"{blk_dim} span={span} metric={metric!r} (needs MSE/SAD, "
            f"span >= 1, and blk_dim <= 16 or a phase-kernel config — "
            f"see volume_supported)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _full_search_volume_jit(
        cur, ref, blk_dim=blk_dim, span=span, metric=metric,
        tile=tile if tile is not None else 128, interpret=interpret,
        chunk_dx=chunk_dx if chunk_dx > 1 else 5,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "blk_dim", "span", "metric", "tile", "interpret", "chunk_dx"
    ),
)
def _full_search_volume_jit(cur, ref, *, blk_dim, span, metric, tile,
                            interpret, chunk_dx):
    frame_height, frame_width = cur.shape
    hp, wp = geometry.padded_dims(frame_height, frame_width, blk_dim)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    k = 2 * span + 1

    # Phase-kernel emission (~1.9x the chunked path) on real TPU only:
    # interpret-mode lowering of the emit fori (DMA effects in the body)
    # trips a JAX closed_call lowering-cache KeyError, so CPU/interpret
    # keeps the chunked emit path (bit-identical output; the hardware
    # cross-check of phase==chunked volumes is in results/tpu/ notes).
    use_phase = _phase_supported(blk_dim, span, metric) and not interpret
    if not use_phase and (metric != "mse" or blk_dim > 16):
        # The legacy chunked emit kernel covers MSE blk <= 16 only; other
        # interpret-mode configs (SAD volumes, blk 32) take the golden
        # XLA volume — bit-identical by construction, and the staged
        # diamond consumer only needs it off-TPU (tests / dry-runs).
        cur_p = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
        ref_halo = fs.make_ref_halo(
            ref, frame_height, frame_width, blk_dim, span
        )
        _, volume = fs.full_search_tile(
            cur_p, ref_halo, 0, 0,
            frame_height=frame_height, frame_width=frame_width,
            blk_dim=blk_dim, span=span, metric=metric,
            return_cost_volume=True,
        )
        return volume
    stripe_unit = 8 * blk_dim
    if use_phase:
        tile_h = stripe_unit
    else:
        tile_h = min(
            _round_up(hp, stripe_unit),
            max(stripe_unit, tile // stripe_unit * stripe_unit),
        )
    hp2 = _round_up(hp, tile_h)
    halo_row_pad = _round_up(2 * span, 8)
    panel_target = (
        _phase_panel_target(blk_dim, span, metric, emit_volume=True)
        if use_phase
        else _PANEL_TARGET
    )

    panels = []
    for x0, pw in _panel_widths(wp, blk_dim, panel_target):
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
        if use_phase:
            _, _, vol = _run_phase(
                cur_p, ref_p, jnp.array([0, x0], jnp.int32),
                blk_dim=blk_dim, span=span,
                frame_height=frame_height, frame_width=frame_width,
                metric=metric, interpret=interpret, emit_volume=True,
            )
        else:
            _, _, vol = _run_f32(
                cur_p, ref_p,
                blk_dim=blk_dim, span=span,
                frame_height=frame_height, frame_width=frame_width,
                tile_h=tile_h, x_origin=x0, interpret=interpret,
                chunk_dx=chunk_dx, emit_volume=True,
            )
        panels.append(vol[:, :nby, ::blk_dim][:, :, : pw // blk_dim])
    volume = jnp.concatenate(panels, axis=2)[:, :, :nbx].astype(jnp.int32)

    # Truncated edge blocks: golden-tile volumes on thin slabs.
    if frame_height % blk_dim or frame_width % blk_dim:
        cur_pad = fs.pad_cur_frame(cur, frame_height, frame_width, blk_dim)
        ref_halo = fs.make_ref_halo(
            ref, frame_height, frame_width, blk_dim, span
        )
        if frame_height % blk_dim:
            y_org = (nby - 1) * blk_dim
            _, v = fs.full_search_tile(
                cur_pad[y_org : y_org + blk_dim, :],
                ref_halo[y_org : y_org + blk_dim + 2 * span, :],
                y_org, 0,
                frame_height=frame_height, frame_width=frame_width,
                blk_dim=blk_dim, span=span, metric=metric,
                return_cost_volume=True,
            )
            volume = volume.at[:, nby - 1, :].set(v[:, 0, :])
        if frame_width % blk_dim:
            x_org = (nbx - 1) * blk_dim
            _, v = fs.full_search_tile(
                cur_pad[:, x_org : x_org + blk_dim],
                ref_halo[:, x_org : x_org + blk_dim + 2 * span],
                0, x_org,
                frame_height=frame_height, frame_width=frame_width,
                blk_dim=blk_dim, span=span, metric=metric,
                return_cost_volume=True,
            )
            volume = volume.at[:, :, nbx - 1].set(v[:, :, 0])
    return volume


def _edge_slab_bottom(cur, ref, *, blk_dim, span, interpret, metric="mse"):
    """Exact search for the last (truncated) block row: a thin full-width
    horizontal slab through the int kernel."""
    frame_height, frame_width = cur.shape
    nby, _ = geometry.grid_shape(frame_height, frame_width, blk_dim)
    y_org = (nby - 1) * blk_dim
    tile_h = math.lcm(8, blk_dim)
    wp = _round_up(frame_width, blk_dim)
    wp2 = _round_up(wp, 128)
    halo_w = _round_up(wp2 + 2 * span, 128)
    halo_row_pad = _round_up(2 * span, 8)
    cur_p = _pad_slab(
        cur, row_range=(y_org, y_org + tile_h), col_range=(0, wp2),
        out_rows=tile_h, out_cols=wp2, offset_r=0, offset_c=0,
        dtype=jnp.int32,
    )
    ref_p = _pad_slab(
        ref,
        row_range=(y_org - span, y_org - span + tile_h + halo_row_pad),
        col_range=(-span, halo_w - span),
        out_rows=tile_h + halo_row_pad, out_cols=halo_w,
        offset_r=0, offset_c=0, dtype=jnp.int32,
    )
    return _run_int(
        cur_p, ref_p,
        blk_dim=blk_dim, span=span,
        frame_height=frame_height, frame_width=frame_width,
        tile_h=tile_h, x_origin=0, y_origin=y_org, interpret=interpret,
        metric=metric,
    )


def _edge_slab_right(cur, ref, *, blk_dim, span, interpret, metric="mse"):
    """Exact search for the last (truncated) block column: a narrow
    full-height vertical slab through the int kernel."""
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
    return _run_int(
        cur_p, ref_p,
        blk_dim=blk_dim, span=span,
        frame_height=frame_height, frame_width=frame_width,
        tile_h=tile_h, x_origin=x_org, y_origin=0, interpret=interpret,
        metric=metric,
    )
