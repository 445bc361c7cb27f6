"""Worker process for the 2-process multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices; together they form an
8-device ("dp"=1, "ty"=4, "tx"=2) mesh whose "ty" axis spans the two
processes. Every process reads ONLY its own frame rows
(`ingest.local_row_range`), contributes them via
`jax.make_array_from_process_local_data`, and runs the full sharded
motion step (halo exchange crosses the process boundary over the
distributed CPU backend — the DCN stand-in). Process 0's golden check:
the all-gathered MVs/costs must equal the single-device golden search,
and the stats-PSNR must equal host image_psnr.

Usage: python multihost_worker.py <pid> <nproc> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from motionestimation_tpu.core import frames as frames_lib  # noqa: E402
from motionestimation_tpu.parallel import ingest, make_mesh  # noqa: E402
from motionestimation_tpu.parallel.sharded import (  # noqa: E402
    padded_dims_for_mesh,
    sharded_motion_step,
)
from motionestimation_tpu.search import full_search as fs  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = make_mesh(1, 2 * nproc, 2)

for h, w, blk, span in [(64, 64, 8, 4), (60, 52, 8, 5)]:
    # Deterministic global frames (every process derives the same pair,
    # but only feeds its own rows to the mesh).
    rng = np.random.default_rng(h + w)
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.clip(
        np.roll(ref, (2, -3), (0, 1)).astype(np.int32)
        + rng.integers(-5, 6, (h, w)),
        0, 255,
    ).astype(np.uint8)

    hp, wp = padded_dims_for_mesh(h, w, blk, mesh)
    lo, hi = ingest.local_row_range(mesh, hp)
    assert 0 <= lo < hi <= hp and (hi - lo) == hp // (2 * nproc) * 2, (
        lo, hi, hp,
    )

    def pad(x):
        return np.pad(x.astype(np.int32), ((0, hp - h), (0, wp - w)))

    cur_g = ingest.put_frame_batch(pad(cur)[None, lo:hi, :], mesh)
    ref_g = ingest.put_frame_batch(pad(ref)[None, lo:hi, :], mesh)
    assert cur_g.shape == (1, hp, wp)

    res = sharded_motion_step(
        cur_g, ref_g,
        mesh=mesh, blk_dim=blk, span=span, metric="mse",
        frame_height=h, frame_width=w,
    )

    from jax.experimental import multihost_utils

    mv_y = np.asarray(
        multihost_utils.process_allgather(res.mv_y, tiled=True)
    )
    mv_x = np.asarray(
        multihost_utils.process_allgather(res.mv_x, tiled=True)
    )
    cost = np.asarray(
        multihost_utils.process_allgather(res.best_cost, tiled=True)
    )
    comp = np.asarray(
        multihost_utils.process_allgather(res.comp, tiled=True)
    )
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span)
    nby, nbx = golden.mv_y.shape
    np.testing.assert_array_equal(mv_y[0, :nby, :nbx], golden.mv_y)
    np.testing.assert_array_equal(mv_x[0, :nby, :nbx], golden.mv_x)
    np.testing.assert_array_equal(
        cost[0, :nby, :nbx], golden.best_cost_i32
    )
    want_psnr = frames_lib.image_psnr(
        comp[0, :h, :w], cur.astype(np.int32)
    )
    got_psnr = frames_lib.psnr_from_stats(
        (int(np.asarray(res.sum_sq_hi)[0]) << 15)
        + int(np.asarray(res.sum_sq_lo)[0]),
        h * w,
        int(np.asarray(res.frame_max)[0]),
    )
    assert got_psnr == want_psnr, (got_psnr, want_psnr)

print(f"MULTIHOST_OK pid={pid}", flush=True)
