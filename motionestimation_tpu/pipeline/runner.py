"""End-to-end frame-pair pipeline: ingest -> search -> compensate -> score.

TPU-native replacement for the reference drivers' main() bodies
(/root/reference/src/cpu/main.c:109-179, src/gpu/main_mse.cu:145-286):
host frames are staged to HBM (the analogue of the pinned-host
cudaMemcpy H2D at main_mse.cu:202-207), one jitted program runs the fused
search on device, and only the packed MV field comes back — the
reference, too, copies back just the block list and reconstructs /
scores on the host (main_mse.cu:227, 245-254). The timing split mirrors
the reference's machine-parsable `total h2d kernel d2h psnr` row
(main_mse.cu:255).

Timing caveat: on runtimes whose `block_until_ready` acks at enqueue (the
axon tunnel), phase boundaries are enforced by fetching a phase-dependent
scalar to host, which costs one tunnel round-trip (~30 ms) per phase.

GOP mode processes a sequence of frames pairwise with double-buffered
host->HBM prefetch (frame i+1 is staged while pair i computes) and dumps
one `mv_%05d.npz` per pair, which doubles as a frame-granular
checkpoint: a resumed run skips pairs whose dump already exists
(SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import queue
import threading
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from motionestimation_tpu.core import frames as frames_lib
from motionestimation_tpu.core import geometry
from motionestimation_tpu.core.config import SearchConfig
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.search.full_search import MotionField


@dataclasses.dataclass
class PairResult:
    """Everything one frame pair produces."""

    field: MotionField  # numpy arrays, [nby, nbx]
    comp: np.ndarray  # [H, W] int32 motion-compensated frame
    psnr: float  # compensated vs current (utils.c:137-164 rules)
    original_score: float  # residual MSE cur-vs-ref, C float32 accumulation
    compensated_score: float  # residual MSE cur-vs-comp
    total_ms: float
    h2d_ms: float
    kernel_ms: float
    d2h_ms: float

    @property
    def timing_row(self) -> str:
        """`total h2d kernel d2h psnr` (main_mse.cu:255)."""
        return (
            f"{self.total_ms:.6f} {self.h2d_ms:.6f} {self.kernel_ms:.6f} "
            f"{self.d2h_ms:.6f} {self.psnr:.4f}"
        )


def select_backend(backend: str = "auto") -> str:
    """Resolve "auto" to the best backend for the current platform."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend


@functools.lru_cache(maxsize=64)
def _search_fn(config: SearchConfig, backend: str):
    """One jitted device program: search + compensation for a frame pair.

    Cached per (config, backend): repeated run_pair calls reuse the same
    jit closure instead of re-tracing.
    """
    h, w = config.frame_height, config.frame_width

    if config.algorithm == "diamond":
        from motionestimation_tpu.search import diamond

        def run(cur, ref):
            return diamond.diamond_search_frame(
                cur, ref, blk_dim=config.blk_dim, span=config.span,
                metric=config.metric, early_term=config.early_term,
                escape_policy=config.escape_policy,
            )
    elif backend == "pallas" and config.metric in ("mse", "sad"):
        from motionestimation_tpu.kernels import full_search_pallas as ker

        def run(cur, ref):
            return ker.full_search_frame_pallas(
                cur, ref, blk_dim=config.blk_dim, span=config.span,
                metric=config.metric,
            )
    elif backend == "pallas" and config.metric == "ssim":
        from motionestimation_tpu.kernels import ssim_pallas as ker

        def run(cur, ref):
            return ker.ssim_search_frame_pallas(
                cur, ref, blk_dim=config.blk_dim, span=config.span
            )
    else:

        def run(cur, ref):
            return fs.full_search_frame(
                cur, ref, blk_dim=config.blk_dim, span=config.span,
                metric=config.metric,
            )

    @jax.jit
    def step(cur, ref):
        field = run(cur, ref)
        comp = fs.compensate_frame(
            ref, field,
            frame_height=h, frame_width=w,
            blk_dim=config.blk_dim, span=config.span,
        )
        # Tiny phase-fence scalar: fetching it on host guarantees the
        # search/compensate program has fully executed.
        fence = (
            jnp.sum(field.mv_y) + jnp.sum(field.mv_x) + jnp.sum(comp[0])
        )
        # Compensated pixels are gathered reference pixels: when the input
        # is u8 they fit u8, so ship them D2H as u8 — 4x less readback
        # traffic, exact. >8-bit int32 frames (PSNR supports them) keep
        # int32 to avoid a silent mod-256 wrap.
        if cur.dtype == jnp.uint8:
            comp = comp.astype(jnp.uint8)
        return field, comp, fence

    return step


@functools.lru_cache(maxsize=64)
def _pair_step_fn(config: SearchConfig, backend: str):
    """Device program for the timed pair pipeline: search ONLY — the
    reference copies back just the MV block list and reconstructs on the
    host (main_mse.cu:227, 245-254), so the TPU pipeline does the same:
    d2h is the packed MV field (int8 when |mv| <= 127), and compensation
    / PSNR / scores are untimed host post-processing.
    """
    base = _search_fn(config, backend)

    @jax.jit
    def step(cur, ref):
        field, _, _ = base(cur, ref)
        mv_dtype = jnp.int8 if config.span <= 127 else jnp.int32
        mv = jnp.stack([field.mv_y, field.mv_x]).astype(mv_dtype)
        # Fence scalar: depends on the whole field so fetching it proves
        # the search program ran to completion (cudaDeviceSynchronize
        # analogue at main_mse.cu:224).
        fence = (
            jnp.sum(field.mv_y)
            + jnp.sum(field.mv_x)
            + jnp.sum(field.best_cost_i32)
        )
        return mv, field.best_cost_i32, field.score, fence

    return step


def run_pair(
    cur: np.ndarray,
    ref: np.ndarray,
    config: SearchConfig,
    *,
    backend: str = "auto",
    _step=None,
) -> PairResult:
    """Run one frame pair end to end with a 4-phase timing split.

    Phase semantics mirror the reference GPU driver (main_mse.cu:202-229):
    h2d = staging both frames to HBM, kernel = the fused search program,
    d2h = fetching the packed MV field (the reference's block-list copy).
    Compensation, PSNR, and scores are untimed host post-processing, as
    in the reference (main_mse.cu:245-254). Note: phase fences on this
    host cost one tunnel round-trip (~30 ms) each, which inflates every
    phase vs the local-PCIe reference — the timing rows record it.
    """
    backend = select_backend(backend)
    step = _step if _step is not None else _pair_step_fn(config, backend)

    t0 = time.perf_counter()
    cur_d = jax.device_put(jnp.asarray(cur))
    ref_d = jax.device_put(jnp.asarray(ref))
    # Fence H2D: a scalar that depends on both transfers.
    int(jnp.sum(cur_d[0], dtype=jnp.int32) + jnp.sum(ref_d[0], dtype=jnp.int32))
    t1 = time.perf_counter()

    mv_d, cost_d, score_d, fence = step(cur_d, ref_d)
    int(fence)  # fence the device program
    t2 = time.perf_counter()

    mv = np.asarray(mv_d)
    t3 = time.perf_counter()

    # Host post-processing (untimed, reference parity).
    mv_y = mv[0].astype(np.int32)
    mv_x = mv[1].astype(np.int32)
    field = MotionField(
        mv_y, mv_x, np.asarray(cost_d), np.asarray(score_d)
    )
    comp = frames_lib.compensate_frame_np(ref, mv_y, mv_x, config.blk_dim)
    cur_i = cur.astype(np.int32)
    psnr = frames_lib.image_psnr(comp, cur_i)
    orig = frames_lib.residual_mse_c_float32(cur, ref)
    comp_score = frames_lib.residual_mse_c_float32(cur_i, comp)

    return PairResult(
        field=field,
        comp=comp,
        psnr=psnr,
        original_score=orig,
        compensated_score=comp_score,
        total_ms=(t3 - t0) * 1e3,
        h2d_ms=(t1 - t0) * 1e3,
        kernel_ms=(t2 - t1) * 1e3,
        d2h_ms=(t3 - t2) * 1e3,
    )


def write_artifacts(
    result: PairResult,
    cur: np.ndarray,
    ref: np.ndarray,
    config: SearchConfig,
    output_dir: str | os.PathLike,
) -> str:
    """Write the 5-frame stacked YUV (main.c:161-175); returns the path."""
    os.makedirs(output_dir, exist_ok=True)
    stack = frames_lib.stack_output(ref, cur, result.comp)
    path = frames_lib.output_filename(output_dir, config.blk_dim, config.span)
    frames_lib.save_yuv(path, stack)
    return path


def _mv_dump_path(output_dir, i: int) -> str:
    return os.path.join(os.fspath(output_dir), f"mv_{i:05d}.npz")


def _gop_pack_kk(config: SearchConfig) -> int | None:
    """(cost, mv) -> single uint32 packing spec for the GOP readback.

    When cost * K² + flat_mv_index fits uint32 (blk-8 MSE, SAD at every
    block size), MVs and integer costs ship D2H as ONE uint32 plane per
    pair instead of an int8 MV pair + int32 cost plane — 33% less
    readback traffic on the link that bounds end-to-end rate. Returns
    K² (the pack modulus) or None when packing does not apply."""
    if config.metric not in ("mse", "sad"):
        return None
    k = 2 * config.span + 1
    max_cost = (
        65025 if config.metric == "mse" else 255
    ) * config.blk_dim * config.blk_dim
    if (max_cost + 1) * k * k <= 2**32:
        return k * k
    return None


@functools.lru_cache(maxsize=64)
def _gop_chunk_fn(config: SearchConfig, backend: str, chunk_pairs: int):
    """Device program for CHUNK_PAIRS consecutive frame pairs in ONE
    dispatch: takes chunk_pairs+1 individual frames (each crosses the
    host link exactly once — consecutive pairs share a frame), stacks
    them on device, and lax.map's the per-pair search+stats body over
    the pair windows. One dispatch + one result fetch per chunk is what
    amortizes the per-call host round trip (~20-30 ms on the tunnel)
    that made the per-pair pipeline dispatch-bound (round-3 verdict:
    38.6% of the link bound)."""
    base = _search_fn(config, backend)
    mv_dtype = jnp.int8 if config.span <= 127 else jnp.int32
    kk = _gop_pack_kk(config)
    k = 2 * config.span + 1
    span = config.span

    @jax.jit
    def step(*frames):
        stack = jnp.stack(frames)  # [C+1, H, W] in HBM

        def one(cr):
            cur, ref = cr
            field, comp, _ = base(cur, ref)
            comp = comp.astype(jnp.int32)
            cur_i = cur.astype(jnp.int32)
            err = comp - cur_i
            row = jnp.sum(err * err, axis=1, dtype=jnp.int32)
            sq_hi = jnp.sum(row >> 15, dtype=jnp.int32)
            sq_lo = jnp.sum(row & 0x7FFF, dtype=jnp.int32)
            fmax = jnp.max(jnp.maximum(comp, cur_i))
            if kk is not None:
                flat = (field.mv_y + span) * k + (field.mv_x + span)
                payload = (
                    field.best_cost_i32.astype(jnp.uint32) * jnp.uint32(kk)
                    + flat.astype(jnp.uint32)
                )
                return payload, sq_hi, sq_lo, fmax
            mv = jnp.stack([field.mv_y, field.mv_x]).astype(mv_dtype)
            cost = (
                field.score if config.metric == "ssim"
                else field.best_cost_i32
            )
            return mv, cost, sq_hi, sq_lo, fmax

        return lax.map(one, (stack[1:], stack[:-1]))

    return step


def run_gop(
    frame_paths: Sequence[str | os.PathLike],
    config: SearchConfig,
    *,
    output_dir: str | os.PathLike,
    backend: str = "auto",
    resume: bool = True,
    chunk_pairs: int = 8,
    stats_out: dict | None = None,
) -> list[str]:
    """Process a GOP: pair i = (frames[i+1] as current, frames[i] as ref).

    Pipelined end to end: frames are loaded and `device_put` ahead
    (transfers are async, so the whole GOP's H2D traffic streams
    back-to-back over the link), `chunk_pairs` consecutive pairs run per
    jitted dispatch (lax.map inside — one host round trip per chunk, not
    per pair), and a writer thread materializes results and dumps
    `mv_%05d.npz` off the critical path. Steady state ships one new
    frame per pair, so the rate ceiling is link_MB_s / frame_MB — the
    analogue of the reference's pinned-host staging + single H2D at
    main_mse.cu:168-207.

    Each pair's `mv_%05d.npz` (mv_y, mv_x, best_cost, score, psnr)
    doubles as a frame-granular checkpoint: existing dumps are skipped
    when `resume` so a killed run restarts where it stopped.

    `stats_out`, when given, receives a wall-clock phase split:
    load_s (host YUV reads), h2d_enqueue_s (device_put issue; transfers
    themselves overlap downstream), dispatch_s (jit call + async-D2H
    issue), d2h_wait_s (writer blocked on results — covers the
    H2D+compute+D2H pipeline depth), dump_s (npz writes), wall_s.

    Returns the list of dump paths (one per pair, including skipped).
    """
    backend = select_backend(backend)
    if chunk_pairs < 1:
        raise ValueError("chunk_pairs must be >= 1")
    step = _gop_chunk_fn(config, backend, chunk_pairs)
    os.makedirs(output_dir, exist_ok=True)
    h, w = config.frame_height, config.frame_width
    blk = config.blk_dim
    nby, nbx = geometry.grid_shape(h, w, blk)
    # True (truncated) per-block pixel counts, for the host-side score
    # (same float32 division as metrics.cost.mse_from_ssd).
    bh = np.minimum(blk, h - np.arange(nby) * blk).astype(np.float32)
    bw = np.minimum(blk, w - np.arange(nbx) * blk).astype(np.float32)
    area = bh[:, None] * bw[None, :]

    paths = [os.fspath(p) for p in frame_paths]
    if len(paths) < 2:
        raise ValueError("a GOP needs at least two frames")

    todo = [
        i for i in range(len(paths) - 1)
        if not (resume and os.path.exists(_mv_dump_path(output_dir, i)))
    ]
    out = [_mv_dump_path(output_dir, i) for i in range(len(paths) - 1)]
    if not todo:
        return out

    stats = {
        "load_s": 0.0, "h2d_enqueue_s": 0.0, "dispatch_s": 0.0,
        "d2h_wait_s": 0.0, "dump_s": 0.0, "wall_s": 0.0,
        "pairs": len(todo), "chunks": 0,
    }
    t_wall = time.perf_counter()

    # Consecutive runs of todo indices (resume can leave holes); pairs in
    # a run share boundary frames. Runs are pairwise disjoint in frame
    # indices (a one-pair hole still separates them by two frames), so
    # the concatenated per-run frame ranges list each needed frame once,
    # in consumption order.
    runs: list[list[int]] = []
    for i in todo:
        if runs and runs[-1][-1] == i - 1:
            runs[-1].append(i)
        else:
            runs.append([i])
    frame_order: list[int] = []
    for run in runs:
        frame_order.extend(range(run[0], run[-1] + 2))

    # Reader thread: disk reads AND device_put issue run ahead of the
    # dispatch loop (window-bounded), so the transfer stream is fed as
    # fast as frames load and neither ever stalls a dispatch — the
    # analogue of the reference's pinned-host staging
    # (main_mse.cu:168-169). Transfers enqueue in reader order ==
    # consumption order, keeping the link FIFO busy end to end.
    #
    # Frames are read into a fixed pool of reusable host buffers: a
    # fresh allocation per 4K frame pays ~50-150 ms of first-touch page
    # faults on this host while transfers are in flight (measured — it
    # was 5.5 s of the 8.2 s round-4 GOP wall), vs ~2 ms into a reused
    # buffer. A buffer is recycled only after the writer has fetched the
    # results of the chunk that consumed its frame — the program output
    # depends on the staged frame, so its H2D transfer has provably
    # completed and the reuse can never race the copy.
    host_q: queue.Queue = queue.Queue()
    read_window = threading.Semaphore(2 * chunk_pairs + 2)
    reader_err: list[BaseException] = []

    cancel = threading.Event()

    n_bufs = min(3 * chunk_pairs + 6, len(frame_order))
    buf_pool: queue.Queue = queue.Queue()
    for _ in range(n_bufs):
        b = np.empty((h, w), np.uint8)
        b.fill(0)  # pre-fault so the first reads skip the slow path too
        buf_pool.put(b)
    frame_bufs: dict[int, np.ndarray] = {}

    def reader():
        for i in frame_order:
            read_window.acquire()
            if cancel.is_set():
                return
            buf = buf_pool.get()
            if buf is None or cancel.is_set():
                return
            try:
                t0 = time.perf_counter()
                f = frames_lib.load_yuv_into(paths[i], buf)
                t1 = time.perf_counter()
                d = jax.device_put(f)
                stats["load_s"] += t1 - t0
                stats["h2d_enqueue_s"] += time.perf_counter() - t1
            except BaseException as e:  # noqa: BLE001 — re-raised in main
                reader_err.append(e)
                host_q.put((i, None))
                return
            frame_bufs[i] = buf
            host_q.put((i, d))

    rt = threading.Thread(target=reader, name="gop-reader", daemon=True)
    rt.start()

    staged: dict[int, jax.Array] = {}

    def frame_dev(i):
        if i not in staged:
            j, d = host_q.get()
            assert j == i, f"reader order skew: wanted {i}, got {j}"
            if d is None:
                raise reader_err[0]
            staged[i] = d
            read_window.release()
        return staged[i]

    kk = _gop_pack_kk(config)
    k = 2 * config.span + 1

    def dump_chunk(idxs, nps):
        if kk is not None:
            payload, sq_hi, sq_lo, fmax = nps
            cost = (payload // kk).astype(np.int32)
            flat = (payload % kk).astype(np.int32)
            mv = np.stack([flat // k - config.span,
                           flat % k - config.span], axis=1)
        else:
            mv, cost, sq_hi, sq_lo, fmax = nps
        t0 = time.perf_counter()
        for slot, i in enumerate(idxs):
            psnr = frames_lib.psnr_from_stats(
                (int(sq_hi[slot]) << 15) + int(sq_lo[slot]),
                h * w,
                int(fmax[slot]),
            )
            if config.metric == "ssim":
                best_cost = score = cost[slot]
            else:
                best_cost = cost[slot]
                score = cost[slot].astype(np.float32) / area
            np.savez(
                _mv_dump_path(output_dir, i),
                mv_y=mv[slot, 0].astype(np.int32),
                mv_x=mv[slot, 1].astype(np.int32),
                best_cost=best_cost,
                score=score,
                psnr=psnr,
                cur=paths[i + 1],
                ref=paths[i],
            )
        stats["dump_s"] += time.perf_counter() - t0

    # Writer thread: blocking on device results and writing npz files
    # happen off the dispatch path, so the main loop keeps the link fed.
    work: queue.Queue = queue.Queue(maxsize=4)
    writer_err: list[BaseException] = []

    def writer():
        while True:
            item = work.get()
            if item is None:
                return
            if writer_err:
                continue  # drain mode: keep consuming so puts never block
            idxs, outs = item
            try:
                t0 = time.perf_counter()
                nps = [np.asarray(o) for o in outs]
                stats["d2h_wait_s"] += time.perf_counter() - t0
                # The fetched results depend on every frame this chunk
                # staged, so those H2D transfers are complete: recycle
                # their host buffers to the reader pool.
                for fr in range(idxs[0], idxs[-1] + 2):
                    b = frame_bufs.pop(fr, None)
                    if b is not None:
                        buf_pool.put(b)
                dump_chunk(idxs, nps)
            except BaseException as e:  # noqa: BLE001 — re-raised in main
                writer_err.append(e)

    wt = threading.Thread(target=writer, name="gop-writer", daemon=True)
    wt.start()

    try:
        for run in runs:
            for c0 in range(0, len(run), chunk_pairs):
                idxs = run[c0 : c0 + chunk_pairs]
                frame_idx = [idxs[0]] + [i + 1 for i in idxs]
                args = [frame_dev(i) for i in frame_idx]
                # Pad the tail chunk by repeating the last frame: the
                # extra (f, f) pairs compute throwaway results, keeping
                # one compiled program shape for the whole GOP.
                args += [args[-1]] * (chunk_pairs + 1 - len(args))
                t0 = time.perf_counter()
                outs = step(*args)
                for o in outs:
                    o.copy_to_host_async()
                stats["dispatch_s"] += time.perf_counter() - t0
                stats["chunks"] += 1
                work.put((idxs, outs))
                if writer_err:
                    break
                # Evict everything but the boundary frame shared with
                # the next chunk (the dispatched program holds its own
                # references while it runs).
                for i in frame_idx[:-1]:
                    staged.pop(i, None)
            if writer_err:
                break
    finally:
        work.put(None)
        wt.join()
        cancel.set()
        read_window.release()  # unblock a reader stuck on an error path
        buf_pool.put(None)  # ... or blocked waiting for a free buffer
        rt.join()
        staged.clear()  # drop boundary frames runs left pinned in HBM
        stats["wall_s"] = time.perf_counter() - t_wall
        if stats_out is not None:
            stats_out.update(stats)
    if writer_err:
        raise writer_err[0]
    return out


def run_gop_sharded(
    frame_paths: Sequence[str | os.PathLike],
    config: SearchConfig,
    *,
    mesh,
    output_dir: str | os.PathLike,
    resume: bool = True,
    pipelined: bool | str = "auto",
    chunk_pairs: int = 8,
) -> list[str]:
    """GOP processing over a device mesh (BASELINE config: sharded 4K GOP).

    Consecutive frame pairs are batched along the mesh's "dp" axis and
    each batch runs one `sharded_motion_step` (halo exchange + search +
    compensation + psum'd stats); frame tiles shard over ("ty", "tx").
    Ingest is mesh-sharded (parallel.ingest) with the next batch staged
    while the current one computes. Dumps the same `mv_%05d.npz`
    checkpoints as the single-device path, so runs are resumable and the
    two paths are drop-in interchangeable.

    Multi-host (jax.distributed initialised, process_count > 1): every
    process reads ONLY its own frame rows from disk
    (`ingest.local_row_range` + `frames.load_yuv_rows`) and contributes
    them via `make_array_from_process_local_data`; results are
    process_allgather'd and process 0 writes the dumps. Resume requires
    every process to see the same dump directory state — pass
    resume=False unless output_dir is on a shared filesystem.

    `pipelined`: on spatial-only meshes (dp == 1), consecutive pairs of
    a run go through `sharded_gop_pipelined` — one scanned program per
    `chunk_pairs` pairs whose cross-pair halo-overlap schedule lets XLA
    hide the exchange behind the previous pair's search
    (parallel/scaling.py's overlap model; dumps are bit-identical to
    the per-pair path). "auto" (default) uses it whenever the layout
    supports it (full search, no early_term, whole-block frames or the
    golden backend); True forces it (raising if unsupported), False
    keeps the per-pair batched path.
    """
    from motionestimation_tpu.parallel import ingest
    from motionestimation_tpu.parallel.sharded import (
        _resolve_backend,
        padded_dims_for_mesh,
        sharded_gop_pipelined,
        sharded_motion_step,
    )

    multi = jax.process_count() > 1
    is_lead = jax.process_index() == 0
    if is_lead:
        os.makedirs(output_dir, exist_ok=True)
    h, w = config.frame_height, config.frame_width
    paths = [os.fspath(p) for p in frame_paths]
    if len(paths) < 2:
        raise ValueError("a GOP needs at least two frames")
    npairs = len(paths) - 1
    todo = [
        i for i in range(npairs)
        if not (resume and os.path.exists(_mv_dump_path(output_dir, i)))
    ]
    out = [_mv_dump_path(output_dir, i) for i in range(npairs)]
    if not todo:
        return out

    dp = mesh.shape["dp"]
    hp, wp = padded_dims_for_mesh(h, w, config.blk_dim, mesh)
    chunks = [todo[i : i + dp] for i in range(0, len(todo), dp)]

    # Rows of the padded frame this process must provide (whole frame on
    # a single process).
    row_lo, row_hi = ingest.local_row_range(mesh, hp)

    frames_cache: dict[int, np.ndarray] = {}

    def frame_local(i):
        """This process's padded rows [row_lo, row_hi) of frame i."""
        if i not in frames_cache:
            r0, r1 = min(row_lo, h), min(row_hi, h)
            rows = frames_lib.load_yuv_rows(paths[i], h, w, r0, r1)
            # Padding rows (beyond the true frame height) sit at the
            # bottom of the global padded frame, so any missing rows of
            # this process's range pad below the read rows.
            frames_cache[i] = np.pad(
                rows.astype(np.int32),
                ((0, (row_hi - row_lo) - (r1 - r0)), (0, wp - w)),
            )
        return frames_cache[i]

    def host_batches(which):
        for chunk in chunks:
            idxs = chunk + [chunk[-1]] * (dp - len(chunk))  # pad batch
            sel = [i + 1 for i in idxs] if which == "cur" else idxs
            yield np.stack([frame_local(i) for i in sel])

    if multi:
        from jax.experimental import multihost_utils

        def fetch(x):
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
    else:
        fetch = np.asarray

    nby, nbx = geometry.grid_shape(h, w, config.blk_dim)

    whole_blocks = h % config.blk_dim == 0 and w % config.blk_dim == 0
    can_pipeline = (
        dp == 1
        and config.algorithm == "full"
        and config.early_term is None
        and (
            whole_blocks
            or _resolve_backend(
                "auto", config.blk_dim, config.span, config.metric
            )
            == "golden"
        )
    )
    if pipelined is True and not can_pipeline:
        raise ValueError(
            "pipelined=True requires a dp=1 mesh, algorithm='full', no "
            "early_term, and whole-block frame dims (or a golden-backend "
            "config)"
        )
    if (pipelined == "auto" and can_pipeline) or pipelined is True:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        stack_sharding = NamedSharding(
            mesh, PartitionSpec(None, "ty", "tx")
        )
        backend = "auto" if whole_blocks else "golden"
        runs: list[list[int]] = []
        for i in todo:
            if runs and runs[-1][-1] == i - 1:
                runs[-1].append(i)
            else:
                runs.append([i])
        for run in runs:
            for c0 in range(0, len(run), chunk_pairs):
                idxs = run[c0 : c0 + chunk_pairs]
                local = np.stack(
                    [frame_local(j) for j in [idxs[0]] + [i + 1 for i in idxs]]
                )
                if multi:
                    stack_g = jax.make_array_from_process_local_data(
                        stack_sharding, local
                    )
                else:
                    stack_g = jax.device_put(
                        jnp.asarray(local), stack_sharding
                    )
                mv_y_p, mv_x_p, cost_p, hi_p, lo_p, fmax_p = (
                    sharded_gop_pipelined(
                        stack_g, mesh=mesh, blk_dim=config.blk_dim,
                        span=config.span, metric=config.metric,
                        frame_height=h, frame_width=w, backend=backend,
                    )
                )
                mv_y = fetch(mv_y_p)[:, :nby, :nbx]
                mv_x = fetch(mv_x_p)[:, :nby, :nbx]
                cost = fetch(cost_p)[:, :nby, :nbx]
                hi, lo, fmax = fetch(hi_p), fetch(lo_p), fetch(fmax_p)
                for slot, i in enumerate(idxs):
                    if not is_lead:
                        continue
                    psnr = frames_lib.psnr_from_stats(
                        (int(hi[slot]) << 15) + int(lo[slot]),
                        h * w, int(fmax[slot]),
                    )
                    np.savez(
                        _mv_dump_path(output_dir, i),
                        mv_y=mv_y[slot], mv_x=mv_x[slot],
                        best_cost=cost[slot], score=cost[slot],
                        psnr=psnr, cur=paths[i + 1], ref=paths[i],
                    )
                for i in idxs:
                    frames_cache.pop(i, None)
        return out

    cur_stream = ingest.ShardedPrefetcher(host_batches("cur"), mesh)
    ref_stream = ingest.ShardedPrefetcher(host_batches("ref"), mesh)
    for chunk, cur_b, ref_b in zip(chunks, cur_stream, ref_stream):
        res = sharded_motion_step(
            cur_b, ref_b,
            mesh=mesh, blk_dim=config.blk_dim, span=config.span,
            metric=config.metric, frame_height=h, frame_width=w,
            algorithm=config.algorithm, early_term=config.early_term,
        )
        mv_y = fetch(res.mv_y)[:, :nby, :nbx]
        mv_x = fetch(res.mv_x)[:, :nby, :nbx]
        cost = fetch(res.best_cost)[:, :nby, :nbx]
        # PSNR from the psum'd exact device stats (Σerr² as two int32
        # halves, observed max) — bit-identical to image_psnr(comp, cur)
        # without fetching the [B, Hp, Wp] compensated frames D2H.
        sq_hi = fetch(res.sum_sq_hi)
        sq_lo = fetch(res.sum_sq_lo)
        fmax = fetch(res.frame_max)
        for slot, i in enumerate(chunk):
            if not is_lead:
                continue
            psnr = frames_lib.psnr_from_stats(
                (int(sq_hi[slot]) << 15) + int(sq_lo[slot]),
                h * w,
                fmax[slot],
            )
            np.savez(
                _mv_dump_path(output_dir, i),
                mv_y=mv_y[slot], mv_x=mv_x[slot],
                best_cost=cost[slot], score=cost[slot],
                psnr=psnr, cur=paths[i + 1], ref=paths[i],
            )
        for i in chunk:
            frames_cache.pop(i, None)
    return out
