"""SPMD motion estimation over a ("dp", "ty", "tx") mesh.

The full step per shard: halo-exchange the reference tile, run the fused
Pallas search on the local tile — the phase-plane kernel for MSE/SAD, the
hoisted-box-sum SSIM kernel for SSIM; both are the same kernels the
single-chip path runs, with the shard's global origin fed in as a traced
SMEM scalar so one compiled program serves every shard — then
motion-compensate from the halo. Blocks truncated by the global frame
edge are repaired with a golden thin-slab pass outside the shard_map
(plain XLA, partitioned automatically), and the exact residual statistics
are reduced over the sharded result. sharded == unsharded stays bit-exact
by construction; `backend="golden"` keeps the pure-XLA tile search for
cross-checking.

This is the TPU-native replacement for what the reference doesn't have:
it is single-process, single-device (SURVEY.md §2 "parallelism
strategies"); scaling here = spatial tile parallelism with ICI halo
exchange + batch parallelism, per the BASELINE.json north star. The
per-shard Pallas launch is the mesh analogue of the CUDA grid launch at
/root/reference/src/gpu/main_mse.cu:212-223.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from motionestimation_tpu.core import geometry
from motionestimation_tpu.kernels import full_search_pallas as kp
from motionestimation_tpu.kernels import ssim_pallas as ssim_kp
from motionestimation_tpu.parallel import halo as halo_lib
from motionestimation_tpu.search import full_search as fs


class ShardedStepResult(NamedTuple):
    """Batched, sharded results of one motion-estimation step.

    mv_y / mv_x: [B, nby, nbx] int32, sharded (dp, ty, tx)
    best_cost:   [B, nby, nbx] int32 (SSD/SAD) or float32 (SSIM score)
    comp:        [B, Hp, Wp] int32 motion-compensated frames
    sum_sq_hi / sum_sq_lo / frame_max: per-batch PSNR statistics, reduced
      over the mesh, computed over true frame pixels only. Σerr² is
      carried as two int32 halves (hi*2^15 + lo — TPU lanes have no
      int64); the exact integer recombines on host, so
      `frames.psnr_from_stats((hi << 15) + lo, H*W, frame_max)` equals the
      host-side `image_psnr(comp, cur)` bit-for-bit — the GOP runner uses
      them instead of fetching `comp`.
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


def _pallas_supported(blk_dim: int, span: int, metric: str) -> bool:
    if metric == "ssim":
        return ssim_kp.ssim_supported(blk_dim, span)
    return kp._phase_supported(blk_dim, span, metric)


def _resolve_backend(backend: str, blk_dim: int, span: int, metric: str):
    if backend == "auto":
        return (
            "pallas"
            if _pallas_supported(blk_dim, span, metric)
            else "golden"
        )
    if backend == "pallas" and not _pallas_supported(blk_dim, span, metric):
        raise ValueError(
            f"pallas sharded backend unsupported for blk_dim={blk_dim} "
            f"span={span} metric={metric!r}"
        )
    if backend not in ("pallas", "golden"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    return backend


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "blk_dim", "span", "metric",
                     "frame_height", "frame_width", "backend",
                     "algorithm", "early_term"),
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
    backend: str = "auto",
    algorithm: str = "full",
    early_term: float | None = None,
):
    """One full motion-estimation step for a batch of frame pairs.

    cur_batch / ref_batch: [B, H, W] u8/int32 (host or device). B must be
    divisible by mesh dp. Returns a ShardedStepResult.

    backend: "pallas" (fused phase kernel per shard — the production
    path), "golden" (pure-XLA tile search, bit-identical, used for SSIM
    and cross-checks), or "auto" (pallas whenever the kernel supports the
    config).

    algorithm: "full" (exhaustive search) or "diamond" (per-shard staged
    diamond, BASELINE config 3 — `search.diamond.diamond_search_tile`;
    diamond candidates reach at most ±span, so the same halo exchange
    serves both; sharded == unsharded == diamond_search_np bit-exact).
    Under "diamond", backend "pallas" means phase-kernel level volumes
    per shard and "golden" means XLA tile volumes. `early_term` is the
    diamond early-termination per-pixel threshold (a per-block decision
    on per-block state, so sharding cannot change it; parity tests
    assert sharded == diamond_search_np with the same threshold).

    This is the function the multi-chip dry-run jits over the mesh: search
    + halo exchange + compensation + metric reduction in one program.
    """
    if algorithm not in ("full", "diamond"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    backend = _resolve_backend(backend, blk_dim, span, metric)
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    hp, wp = padded_dims_for_mesh(frame_height, frame_width, blk_dim, mesh)
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    cur_p = _pad_batch(cur_batch, hp, wp)
    ref_p = _pad_batch(ref_batch, hp, wp)

    tile_h, tile_w = hp // ty, wp // tx
    # Interpret-mode Pallas off-TPU so the virtual CPU mesh (tests,
    # multi-chip dry-run) executes the same program structure.
    interpret = mesh.devices.flat[0].platform != "tpu"

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
            if algorithm == "diamond":
                from motionestimation_tpu.search import diamond

                mv_y, mv_x, cost = diamond.diamond_search_tile(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                    early_term=early_term,
                    use_pallas_volume=(
                        backend == "pallas" and not interpret
                    ),
                )
            elif backend == "pallas" and metric == "ssim":
                cost, idx = ssim_kp.ssim_search_tile_pallas(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, interpret=interpret,
                )
                mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
            elif backend == "pallas":
                cost, idx = kp.full_search_tile_pallas(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                    interpret=interpret,
                )
                mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
            else:
                field = fs.full_search_tile(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                )
                mv_y, mv_x = field.mv_y, field.mv_x
                cost = (
                    field.score if metric == "ssim"
                    else field.best_cost_i32
                )
            comp = fs.compensate_tile(
                ref_halo, mv_y, mv_x, blk_dim=blk_dim, span=span
            )
            return mv_y, mv_x, cost, comp

        return jax.vmap(one_pair)(cur_l, ref_l)

    spec_frame = P("dp", "ty", "tx")
    mv_y, mv_x, cost, comp = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_frame, spec_frame),
        out_specs=(spec_frame,) * 4,
        check_vma=False,  # scan carries inside mix unvarying inits with
        # varying updates; skip the varying-axes check
    )(cur_p, ref_p)

    # --- Truncated-block repair (Pallas kernels/volumes only; the golden
    # tile search and golden tile volumes handle truncation natively via
    # masks). The phase kernel assumes full blk×blk blocks, so the global
    # last block row/column is recomputed on thin slabs — golden scan for
    # full search, golden-volume diamond replay for diamond — plain XLA
    # on the sharded arrays, partitioned automatically (the slabs are a
    # few hundred KB even at 4K).
    needs_repair = (
        backend == "pallas"
        and (algorithm == "full" or not interpret)
    )
    if needs_repair and (frame_height % blk_dim or frame_width % blk_dim):
        from motionestimation_tpu.search import diamond

        def slab_search(c, r, yo, xo):
            if algorithm == "diamond":
                mvy, mvx, fc = diamond.diamond_search_tile(
                    c, r, yo, xo,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                    early_term=early_term,
                    use_pallas_volume=False,
                )
            else:
                f = fs.full_search_tile(
                    c, r, yo, xo,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                )
                mvy, mvx = f.mv_y, f.mv_x
                fc = f.score if metric == "ssim" else f.best_cost_i32
            cm = fs.compensate_tile(
                r, mvy, mvx, blk_dim=blk_dim, span=span
            )
            return mvy, mvx, fc, cm

        ref_halo_g = jnp.pad(
            ref_p, ((0, 0), (span, span), (span, span))
        )
        if frame_height % blk_dim:
            y_t = (nby - 1) * blk_dim
            slab_cur = cur_p[:, y_t : y_t + blk_dim, :]
            slab_ref = ref_halo_g[:, y_t : y_t + blk_dim + 2 * span, :]

            def fix_row(c, r):
                mvy, mvx, fc, cm = slab_search(c, r, y_t, 0)
                return mvy[0], mvx[0], fc[0], cm

            fy, fx, fc, fcomp = jax.vmap(fix_row)(slab_cur, slab_ref)
            mv_y = mv_y.at[:, nby - 1, :].set(fy)
            mv_x = mv_x.at[:, nby - 1, :].set(fx)
            cost = cost.at[:, nby - 1, :].set(fc)
            comp = comp.at[:, y_t : y_t + blk_dim, :].set(fcomp)
        if frame_width % blk_dim:
            x_t = (nbx - 1) * blk_dim
            slab_cur = cur_p[:, :, x_t : x_t + blk_dim]
            slab_ref = ref_halo_g[:, :, x_t : x_t + blk_dim + 2 * span]

            def fix_col(c, r):
                mvy, mvx, fc, cm = slab_search(c, r, 0, x_t)
                return mvy[:, 0], mvx[:, 0], fc[:, 0], cm

            fy, fx, fc, fcomp = jax.vmap(fix_col)(slab_cur, slab_ref)
            mv_y = mv_y.at[:, :, nbx - 1].set(fy)
            mv_x = mv_x.at[:, :, nbx - 1].set(fx)
            cost = cost.at[:, :, nbx - 1].set(fc)
            comp = comp.at[:, :, x_t : x_t + blk_dim].set(fcomp)

    # --- Exact residual statistics over true frame pixels, on the sharded
    # result (XLA inserts the cross-shard reductions). Σerr² without int64
    # (TPU int32 lanes): per-row int32 sums (err² ≤ 255², so a row sum
    # < 2^31 for W < 33k), split into 15-bit halves summed separately —
    # each half sum stays < 2^31 — and recombined on host.
    yy = jnp.arange(hp, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(wp, dtype=jnp.int32)[None, None, :]
    in_frame = (yy < frame_height) & (xx < frame_width)
    err = jnp.where(in_frame, comp - cur_p, 0)
    row = jnp.sum(err * err, axis=2, dtype=jnp.int32)
    sq_hi = jnp.sum(row >> 15, axis=1, dtype=jnp.int32)
    sq_lo = jnp.sum(row & 0x7FFF, axis=1, dtype=jnp.int32)
    fmax = jnp.max(
        jnp.where(in_frame, jnp.maximum(comp, cur_p), 0), axis=(1, 2)
    )
    return ShardedStepResult(mv_y, mv_x, cost, comp, sq_hi, sq_lo, fmax)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "blk_dim", "span", "metric",
                     "frame_height", "frame_width", "backend"),
)
def sharded_gop_pipelined(
    frames,
    *,
    mesh: Mesh,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    frame_height: int,
    frame_width: int,
    backend: str = "auto",
):
    """Software-pipelined GOP search over a spatial mesh: ONE jitted
    program scanning consecutive pairs of a [P+1, H, W] frame stack,
    scheduled so pair i+1's halo exchange is independent of pair i's
    search (round-4 verdict item 7 — the cross-pair overlap schedule
    modeled in `parallel.scaling.spatial_gop_overlap_efficiency`).

    The scan carries the *already-exchanged* reference halo: step i
    searches pair (cur=frames[i+1], ref=frames[i]) against the carried
    halo and exchanges frames[i+1]'s halo for the next step. Inside one
    step the ppermute chain and the search kernel have no data
    dependency, which is exactly the shape XLA's async collectives
    overlap — no interior/border search split, hence none of the
    measured 135x border-slab recompute loss that rules out intra-pair
    overlap (scaling.py docstring).

    Returns (mv_y, mv_x, cost, sum_sq_hi, sum_sq_lo, frame_max): the
    MV/cost planes stacked [P, nby_p, nbx_p] sharded over ("ty", "tx")
    on the padded block grid (callers slice [:nby, :nbx]), plus the
    per-pair psum'd exact residual statistics ([P] each, same int32
    hi/lo encoding as ShardedStepResult — compensation happens per
    tile inside the scan, so the full compensated stack never
    materialises in HBM). Bit-exact vs running `sharded_motion_step`
    per pair — asserted on the virtual mesh by tests/test_sharded.py.
    Truncated global edges (frame dims not block multiples) require
    backend="golden", which handles them natively; the Pallas tile
    kernel assumes whole blocks.
    """
    backend = _resolve_backend(backend, blk_dim, span, metric)
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    hp, wp = padded_dims_for_mesh(frame_height, frame_width, blk_dim, mesh)
    if backend == "pallas" and (
        frame_height % blk_dim or frame_width % blk_dim
    ):
        raise ValueError(
            "sharded_gop_pipelined backend='pallas' requires frame dims "
            "to be block multiples (use backend='golden' for truncated "
            "edges)"
        )
    if tuple(frames.shape[1:]) == (hp, wp):
        frames_p = frames.astype(jnp.int32)  # caller pre-padded (GOP path)
    else:
        frames_p = jnp.pad(
            frames.astype(jnp.int32),
            ((0, 0), (0, hp - frame_height), (0, wp - frame_width)),
        )
    tile_h, tile_w = hp // ty, wp // tx
    interpret = mesh.devices.flat[0].platform != "tpu"

    def step(frames_l):
        # frames_l: [P+1, tile_h, tile_w] local shard stack.
        iy = jax.lax.axis_index("ty")
        ix = jax.lax.axis_index("tx")
        y0 = iy * tile_h
        x0 = ix * tile_w

        def exchange(t):
            return halo_lib.halo_exchange_2d(t, span, ty_size=ty, tx_size=tx)

        def search(cur_t, ref_halo):
            if backend == "pallas" and metric == "ssim":
                cost, idx = ssim_kp.ssim_search_tile_pallas(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, interpret=interpret,
                )
                mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
            elif backend == "pallas":
                cost, idx = kp.full_search_tile_pallas(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                    interpret=interpret,
                )
                mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
            else:
                f = fs.full_search_tile(
                    cur_t, ref_halo, y0, x0,
                    frame_height=frame_height, frame_width=frame_width,
                    blk_dim=blk_dim, span=span, metric=metric,
                )
                mv_y, mv_x = f.mv_y, f.mv_x
                cost = f.score if metric == "ssim" else f.best_cost_i32
            return mv_y, mv_x, cost

        yy = y0 + lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
        xx = x0 + lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
        in_frame = (yy < frame_height) & (xx < frame_width)

        def body(ref_halo, cur_t):
            # The exchange below consumes only cur_t (the NEXT pair's
            # reference) while the search consumes the carried halo —
            # independent subgraphs XLA may schedule concurrently.
            next_halo = exchange(cur_t)
            mv_y, mv_x, cost = search(cur_t, ref_halo)
            comp = fs.compensate_tile(
                ref_halo, mv_y, mv_x, blk_dim=blk_dim, span=span
            )
            err = jnp.where(in_frame, comp - cur_t, 0)
            row = jnp.sum(err * err, axis=1, dtype=jnp.int32)
            sq_hi = lax.psum(
                jnp.sum(row >> 15, dtype=jnp.int32), ("ty", "tx")
            )
            sq_lo = lax.psum(
                jnp.sum(row & 0x7FFF, dtype=jnp.int32), ("ty", "tx")
            )
            fmax = lax.pmax(
                jnp.max(jnp.where(in_frame, jnp.maximum(comp, cur_t), 0)),
                ("ty", "tx"),
            )
            return next_halo, (mv_y, mv_x, cost, sq_hi, sq_lo, fmax)

        halo0 = exchange(frames_l[0])
        _, outs = lax.scan(body, halo0, frames_l[1:])
        return outs

    spec_stack = P(None, "ty", "tx")
    spec_scalar = P(None)
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_stack,),
        out_specs=(spec_stack,) * 3 + (spec_scalar,) * 3,
        check_vma=False,
    )(frames_p)


def sharded_full_search(
    cur,
    ref,
    *,
    mesh: Mesh,
    blk_dim: int,
    span: int,
    metric: str = "mse",
    backend: str = "auto",
    algorithm: str = "full",
    early_term: float | None = None,
):
    """Single frame-pair convenience wrapper (batch of 1) returning a
    MotionField on the block grid plus the compensated frame, both global
    (unsharded views of sharded arrays)."""
    frame_height, frame_width = cur.shape
    res = sharded_motion_step(
        cur[None], ref[None],
        mesh=mesh, blk_dim=blk_dim, span=span, metric=metric,
        frame_height=frame_height, frame_width=frame_width,
        backend=backend, algorithm=algorithm, early_term=early_term,
    )
    nby, nbx = geometry.grid_shape(frame_height, frame_width, blk_dim)
    mv_y = res.mv_y[0, :nby, :nbx]
    mv_x = res.mv_x[0, :nby, :nbx]
    cost = res.best_cost[0, :nby, :nbx]
    comp = res.comp[0, :frame_height, :frame_width]
    return mv_y, mv_x, cost, comp
