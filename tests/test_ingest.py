"""Sharded ingest: pre-sharded device_put feeds the sharded step with
identical results, and the prefetcher preserves order."""
import os

import numpy as np
import pytest

from motionestimation_tpu.parallel import make_mesh
from motionestimation_tpu.parallel import ingest
from motionestimation_tpu.parallel.sharded import (
    padded_dims_for_mesh,
    sharded_motion_step,
)


def _batch(rng, b, h, w):
    refs = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    curs = np.clip(
        refs.astype(np.int32) + rng.integers(-6, 7, refs.shape), 0, 255
    ).astype(np.uint8)
    return curs, refs


def test_presharded_input_matches_host_input():
    rng = np.random.default_rng(0)
    mesh = make_mesh(2, 2, 2)
    h = w = 64
    blk, span = 8, 4
    curs, refs = _batch(rng, 2, h, w)
    hp, wp = padded_dims_for_mesh(h, w, blk, mesh)
    assert (hp, wp) == (64, 64)

    res_host = sharded_motion_step(
        curs, refs, mesh=mesh, blk_dim=blk, span=span,
        frame_height=h, frame_width=w,
    )
    cur_s = ingest.put_frame_batch(curs.astype(np.int32), mesh)
    ref_s = ingest.put_frame_batch(refs.astype(np.int32), mesh)
    res_shard = sharded_motion_step(
        cur_s, ref_s, mesh=mesh, blk_dim=blk, span=span,
        frame_height=h, frame_width=w,
    )
    np.testing.assert_array_equal(
        np.asarray(res_host.mv_y), np.asarray(res_shard.mv_y)
    )
    np.testing.assert_array_equal(
        np.asarray(res_host.comp), np.asarray(res_shard.comp)
    )


def test_local_row_range_single_process():
    mesh = make_mesh(1, 2, 2)
    assert ingest.local_row_range(mesh, 128) == (0, 128)


def test_prefetcher_order_and_sharding():
    rng = np.random.default_rng(1)
    mesh = make_mesh(1, 2, 2)
    batches = [
        rng.integers(0, 256, (1, 32, 32), dtype=np.uint8).astype(np.int32)
        for _ in range(5)
    ]
    out = list(ingest.ShardedPrefetcher(iter(batches), mesh))
    assert len(out) == 5
    for host, dev in zip(batches, out):
        assert dev.sharding == ingest.frame_sharding(mesh)
        np.testing.assert_array_equal(host, np.asarray(dev))


def test_run_gop_sharded_matches_single_device(tmp_path):
    """Sharded GOP == single-device GOP: identical MV dumps."""
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    frames_dir = "/root/reference/frames"
    gop = [
        f"{frames_dir}/ForemanYF1.yuv",
        f"{frames_dir}/ForemanYF2.yuv",
        f"{frames_dir}/ForemanYF4.yuv",
    ]
    config = SearchConfig(
        blk_dim=16, span=7, frame_width=352, frame_height=288
    )
    single = tmp_path / "single"
    shard = tmp_path / "shard"
    runner.run_gop(gop, config, output_dir=single, backend="xla")
    mesh = make_mesh(2, 2, 2)
    out = runner.run_gop_sharded(
        gop, config, mesh=mesh, output_dir=shard
    )
    assert len(out) == 2
    for i in range(2):
        a = np.load(single / f"mv_{i:05d}.npz")
        b = np.load(shard / f"mv_{i:05d}.npz")
        np.testing.assert_array_equal(a["mv_y"], b["mv_y"])
        np.testing.assert_array_equal(a["mv_x"], b["mv_x"])
        np.testing.assert_array_equal(a["best_cost"], b["best_cost"])
        assert abs(float(a["psnr"]) - float(b["psnr"])) < 1e-9
    # resume: second call is a no-op
    m = {p: (shard / p).stat().st_mtime for p in os.listdir(shard)}
    runner.run_gop_sharded(gop, config, mesh=mesh, output_dir=shard)
    for p, t in m.items():
        assert (shard / p).stat().st_mtime == t


def test_run_gop_psnr_matches_host_image_psnr(tmp_path):
    """The GOP dump's stats-derived PSNR equals run_pair's host-side
    image_psnr bit-for-bit (the transfer-minimal path loses nothing)."""
    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    frames_dir = "/root/reference/frames"
    f1 = f"{frames_dir}/ForemanYF1.yuv"
    f4 = f"{frames_dir}/ForemanYF4.yuv"
    config = SearchConfig(
        blk_dim=8, span=12, frame_width=352, frame_height=288
    )
    runner.run_gop([f1, f4], config, output_dir=tmp_path, backend="xla")
    d = np.load(tmp_path / "mv_00000.npz")
    cur = frames_lib.load_yuv(f4, 288, 352)
    ref = frames_lib.load_yuv(f1, 288, 352)
    pair = runner.run_pair(cur, ref, config, backend="xla")
    assert float(d["psnr"]) == pair.psnr
    np.testing.assert_array_equal(d["mv_y"], pair.field.mv_y)
    np.testing.assert_array_equal(d["best_cost"], pair.field.best_cost_i32)
    np.testing.assert_array_equal(d["score"], pair.field.score)


def test_run_gop_chunked_resume_holes_and_stats(tmp_path):
    """Chunked GOP pipeline: tail-chunk padding, resume holes (a deleted
    dump mid-GOP is recomputed alone, bit-identically), and the phase
    split in stats_out covers the wall clock."""
    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    rng = np.random.default_rng(7)
    h, w = 48, 64
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)]
    for _ in range(5):
        frames.append(
            np.clip(
                np.roll(frames[-1], (1, -1), (0, 1)).astype(np.int32)
                + rng.integers(-2, 3, (h, w)),
                0, 255,
            ).astype(np.uint8)
        )
    paths = []
    for i, f in enumerate(frames):
        p = tmp_path / f"f{i}.yuv"
        frames_lib.save_yuv(p, f)
        paths.append(p)
    config = SearchConfig(
        blk_dim=8, span=4, frame_width=w, frame_height=h
    )
    outdir = tmp_path / "out"
    stats: dict = {}
    out = runner.run_gop(
        paths, config, output_dir=outdir, backend="xla",
        chunk_pairs=2, stats_out=stats,
    )
    assert len(out) == 5 and all(os.path.exists(p) for p in out)
    assert stats["pairs"] == 5 and stats["chunks"] == 3
    assert stats["wall_s"] > 0
    golden = {}
    for i in range(5):
        d = np.load(out[i])
        pair = runner.run_pair(
            np.asarray(frames[i + 1]), np.asarray(frames[i]),
            config, backend="xla",
        )
        np.testing.assert_array_equal(d["mv_y"], pair.field.mv_y)
        np.testing.assert_array_equal(d["mv_x"], pair.field.mv_x)
        np.testing.assert_array_equal(
            d["best_cost"], pair.field.best_cost_i32
        )
        assert float(d["psnr"]) == pair.psnr
        golden[i] = dict(np.load(out[i]))
    # Punch a hole: pair 2 recomputes alone (an isolated 1-pair run,
    # padded to the chunk width), others untouched.
    os.remove(out[2])
    mtimes = {p: os.stat(p).st_mtime for p in out if os.path.exists(p)}
    runner.run_gop(
        paths, config, output_dir=outdir, backend="xla", chunk_pairs=2
    )
    for p, t in mtimes.items():
        assert os.stat(p).st_mtime == t
    d = np.load(out[2])
    np.testing.assert_array_equal(d["mv_y"], golden[2]["mv_y"])
    np.testing.assert_array_equal(d["best_cost"], golden[2]["best_cost"])
    assert float(d["psnr"]) == float(golden[2]["psnr"])


@pytest.mark.parametrize(
    "blk,span,metric",
    [
        (32, 5, "mse"),   # cost*K^2 overflows uint32 -> unpacked readback
        (8, 5, "ssim"),   # float scores -> unpacked readback
    ],
)
def test_run_gop_unpacked_readback(tmp_path, blk, span, metric):
    """Configs where the uint32 cost+MV packing doesn't apply ship the
    (mv, cost) pair readback; dumps still match run_pair exactly."""
    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    assert runner._gop_pack_kk(
        SearchConfig(blk_dim=blk, span=span, metric=metric,
                     frame_width=64, frame_height=64)
    ) is None
    rng = np.random.default_rng(blk + span)
    h, w = 64, 64
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.clip(
        np.roll(ref, (2, -1), (0, 1)).astype(np.int32)
        + rng.integers(-2, 3, (h, w)),
        0, 255,
    ).astype(np.uint8)
    p0, p1 = tmp_path / "a.yuv", tmp_path / "b.yuv"
    frames_lib.save_yuv(p0, ref)
    frames_lib.save_yuv(p1, cur)
    config = SearchConfig(
        blk_dim=blk, span=span, metric=metric,
        frame_width=w, frame_height=h,
    )
    out = runner.run_gop(
        [p0, p1], config, output_dir=tmp_path / "out", backend="xla",
        chunk_pairs=2,
    )
    d = np.load(out[0])
    pair = runner.run_pair(cur, ref, config, backend="xla")
    np.testing.assert_array_equal(d["mv_y"], pair.field.mv_y)
    np.testing.assert_array_equal(d["mv_x"], pair.field.mv_x)
    if metric != "ssim":
        np.testing.assert_array_equal(
            d["best_cost"], pair.field.best_cost_i32
        )
    assert float(d["psnr"]) == pair.psnr


def test_run_gop_writer_error_raises_not_hangs(tmp_path, monkeypatch):
    """A writer-side failure (e.g. disk full during np.savez) must
    propagate promptly — the bounded work queue previously deadlocked
    the dispatch loop once the writer died (round-4 review)."""
    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    rng = np.random.default_rng(3)
    h, w = 32, 32
    paths = []
    for i in range(14):  # 13 pairs at chunk_pairs=1 >> queue depth 4
        p = tmp_path / f"f{i}.yuv"
        frames_lib.save_yuv(
            p, rng.integers(0, 256, (h, w), dtype=np.uint8)
        )
        paths.append(p)
    config = SearchConfig(
        blk_dim=8, span=2, frame_width=w, frame_height=h
    )

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(np, "savez", boom)
    stats: dict = {}
    with pytest.raises(OSError, match="disk full"):
        runner.run_gop(
            paths, config, output_dir=tmp_path / "out", backend="xla",
            chunk_pairs=1, stats_out=stats,
        )
    assert stats["wall_s"] > 0  # stats filled even on the error path


def test_run_gop_sharded_diamond_matches_single_device(tmp_path):
    """GOP pipeline composition with algorithm="diamond": the sharded
    GOP's dumps equal the single-device diamond GOP's bit-for-bit."""
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    frames_dir = "/root/reference/frames"
    gop = [
        f"{frames_dir}/ForemanYF1.yuv",
        f"{frames_dir}/ForemanYF2.yuv",
        f"{frames_dir}/ForemanYF4.yuv",
    ]
    config = SearchConfig(
        blk_dim=16, span=7, frame_width=352, frame_height=288,
        algorithm="diamond",
    )
    single = tmp_path / "single"
    shard = tmp_path / "shard"
    runner.run_gop(gop, config, output_dir=single, backend="xla")
    mesh = make_mesh(2, 2, 2)
    runner.run_gop_sharded(gop, config, mesh=mesh, output_dir=shard)
    for i in range(2):
        a = np.load(single / f"mv_{i:05d}.npz")
        b = np.load(shard / f"mv_{i:05d}.npz")
        np.testing.assert_array_equal(a["mv_y"], b["mv_y"])
        np.testing.assert_array_equal(a["mv_x"], b["mv_x"])
        np.testing.assert_array_equal(a["best_cost"], b["best_cost"])
        assert abs(float(a["psnr"]) - float(b["psnr"])) < 1e-9


def test_run_gop_sharded_pipelined_matches_batched(tmp_path):
    """On a dp=1 spatial mesh the auto-selected cross-pair-overlap scan
    path dumps bit-identical npz checkpoints to the per-pair batched
    path (round-4 verdict item 7 made production-reachable)."""
    import numpy as np

    from motionestimation_tpu.core import frames as frames_lib
    from motionestimation_tpu.core.config import SearchConfig
    from motionestimation_tpu.pipeline import runner

    h, w, blk, span = 64, 64, 8, 4
    rng = np.random.default_rng(77)
    gop = [rng.integers(0, 256, (h, w), dtype=np.uint8)]
    for _ in range(3):
        gop.append(
            np.clip(
                np.roll(gop[-1], (1, -2), (0, 1)).astype(np.int32)
                + rng.integers(-3, 4, (h, w)),
                0, 255,
            ).astype(np.uint8)
        )
    paths = []
    for i, f in enumerate(gop):
        p = str(tmp_path / f"f{i}.yuv")
        frames_lib.save_yuv(p, f)
        paths.append(p)
    config = SearchConfig(
        blk_dim=blk, span=span, metric="mse", frame_width=w, frame_height=h
    )
    mesh = make_mesh(1, 2, 2)
    a = runner.run_gop_sharded(
        paths, config, mesh=mesh, output_dir=str(tmp_path / "pipe"),
        resume=False, pipelined=True,
    )
    b = runner.run_gop_sharded(
        paths, config, mesh=mesh, output_dir=str(tmp_path / "batch"),
        resume=False, pipelined=False,
    )
    assert len(a) == len(b) == 3
    for pa, pb in zip(a, b):
        za, zb = np.load(pa), np.load(pb)
        for key in ("mv_y", "mv_x", "best_cost", "score"):
            np.testing.assert_array_equal(za[key], zb[key])
        assert float(za["psnr"]) == float(zb["psnr"])
