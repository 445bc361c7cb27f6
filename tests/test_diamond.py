"""Diamond search: batched TPU version == golden numpy trajectories."""
import numpy as np
import pytest

from motionestimation_tpu.search import diamond
from motionestimation_tpu.search.full_search import full_search_frame


def _smooth(rng, h, w):
    """Low-frequency random image (diamond search needs a smooth cost
    surface to be meaningful)."""
    small = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float64)
    up = np.kron(small, np.ones((8, 8)))[:h, :w]
    return np.clip(up + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)


def _pair(rng, h, w, dy, dx):
    ref = _smooth(rng, h, w)
    cur = np.roll(ref, (dy, dx), (0, 1))
    cur = np.clip(
        cur.astype(np.int32) + rng.integers(-2, 3, (h, w)), 0, 255
    ).astype(np.uint8)
    return cur, ref


CASES = [
    # h, w, blk, span, metric, early_term
    (48, 64, 8, 7, "mse", None),
    (48, 64, 8, 7, "mse", 50.0),
    (52, 60, 8, 5, "mse", None),     # truncated edge blocks
    (64, 64, 16, 15, "mse", None),
    (48, 64, 8, 7, "ssim", None),
    (48, 64, 8, 7, "ssim", 0.9),
]


@pytest.mark.parametrize("h,w,blk,span,metric,early", CASES)
def test_trajectory_parity(h, w, blk, span, metric, early):
    rng = np.random.default_rng(h * w + blk + span)
    cur, ref = _pair(rng, h, w, 2, -3)
    g_mvy, g_mvx, g_cost, g_traj = diamond.diamond_search_np(
        cur, ref, blk_dim=blk, span=span, metric=metric, early_term=early
    )
    field, traj = diamond.diamond_search_frame(
        cur, ref, blk_dim=blk, span=span, metric=metric, early_term=early,
        record_trajectory=True,
    )
    assert np.array_equal(np.asarray(traj), g_traj), "trajectory mismatch"
    assert np.array_equal(np.asarray(field.mv_y), g_mvy)
    assert np.array_equal(np.asarray(field.mv_x), g_mvx)
    if metric == "mse":
        assert np.array_equal(
            np.asarray(field.best_cost_i32), g_cost.astype(np.int64)
        )


def test_finds_global_shift():
    rng = np.random.default_rng(7)
    ref = _smooth(rng, 64, 96)
    cur = np.roll(ref, (3, -4), (0, 1))
    field = diamond.diamond_search_frame(cur, ref, blk_dim=8, span=7)
    mvy = np.asarray(field.mv_y)[1:-1, 1:-1]
    mvx = np.asarray(field.mv_x)[1:-1, 1:-1]
    # wrap rows/cols aside, interior blocks should find the exact shift
    assert (mvy == -3).mean() > 0.8
    assert (mvx == 4).mean() > 0.8


def test_never_beats_full_search_but_close():
    rng = np.random.default_rng(11)
    cur, ref = _pair(rng, 48, 64, 1, 2)
    d = diamond.diamond_search_frame(cur, ref, blk_dim=8, span=7)
    f = full_search_frame(cur, ref, blk_dim=8, span=7)
    d_ssd = np.asarray(d.best_cost_i32)
    f_ssd = np.asarray(f.best_cost_i32)
    assert (d_ssd >= f_ssd).all()  # full search is optimal
    assert np.abs(np.asarray(d.mv_y)) .max() <= 7
    assert np.abs(np.asarray(d.mv_x)).max() <= 7


def test_early_term_keeps_center():
    """A huge threshold terminates every block at (0,0) immediately."""
    rng = np.random.default_rng(3)
    cur, ref = _pair(rng, 48, 64, 2, 2)
    field = diamond.diamond_search_frame(
        cur, ref, blk_dim=8, span=7, early_term=1e9
    )
    assert (np.asarray(field.mv_y) == 0).all()
    assert (np.asarray(field.mv_x) == 0).all()


@pytest.mark.parametrize("metric", ["mse", "sad", "ssim"])
def test_lazy_equals_full_volume(metric):
    """The lazy replay (round-by-round reachable-set fills) and the
    full-volume replay produce identical MVs, costs, and trajectories."""
    rng = np.random.default_rng(7)
    cur, ref = _pair(rng, 48, 64, 3, -4)
    kw = dict(blk_dim=8, span=7, metric=metric, record_trajectory=True)
    f_lazy, t_lazy = diamond.diamond_search_frame(
        cur, ref, volume_mode="lazy", **kw
    )
    f_full, t_full = diamond.diamond_search_frame(
        cur, ref, volume_mode="full", **kw
    )
    np.testing.assert_array_equal(np.asarray(t_lazy), np.asarray(t_full))
    np.testing.assert_array_equal(np.asarray(f_lazy.mv_y), np.asarray(f_full.mv_y))
    np.testing.assert_array_equal(np.asarray(f_lazy.mv_x), np.asarray(f_full.mv_x))
    np.testing.assert_array_equal(
        np.asarray(f_lazy.best_cost_i32), np.asarray(f_full.best_cost_i32)
    )


def test_round_plan_covers_lookups():
    """Every displacement a round can look up is in that round's fill
    candidate list, the lists are cumulative (a plane skipped earlier
    stays fillable), and the radius caps bound every possible center."""
    span, max_steps = 7, 9
    need_lists, radii, sdsp_radius = diamond._round_plan(span, max_steps)
    k = 2 * span + 1
    reach = {(0, 0)}

    def clamp(ps):
        return {p for p in ps if abs(p[0]) <= span and abs(p[1]) <= span}

    prev = set()
    for t in range(max_steps):
        need = set(need_lists[t])
        assert prev <= need  # cumulative
        prev = need
        r_c = max(max(abs(y), abs(x)) for y, x in reach)
        assert radii[t] >= min(r_c + 2, span)
        nxt = clamp({(y + oy, x + ox) for y, x in reach for oy, ox in diamond.LDSP})
        for p in nxt:
            assert (p[0] + span) * k + (p[1] + span) in need
        for p in clamp({(y + oy, x + ox) for y, x in nxt for oy, ox in diamond.SDSP}):
            assert (p[0] + span) * k + (p[1] + span) in need
        reach = nxt
    assert sdsp_radius >= min(
        max(max(abs(y), abs(x)) for y, x in reach) + 1, span
    )


@pytest.mark.parametrize("shift", [(1, -2), (6, 5)])
def test_staged_equals_golden(shift):
    """The adaptive staged-volume path (level escalation under lax.cond)
    matches the numpy golden trajectories exactly — both for content that
    stays within the first level's radius and content that escalates."""
    rng = np.random.default_rng(17)
    cur, ref = _pair(rng, 48, 64, *shift)
    f, t = diamond.diamond_search_frame(
        cur, ref, blk_dim=8, span=7, metric="mse",
        record_trajectory=True, volume_mode="staged",
    )
    mvy, mvx, best, traj = diamond.diamond_search_np(
        cur, ref, blk_dim=8, span=7, metric="mse"
    )
    np.testing.assert_array_equal(np.asarray(f.mv_y), mvy)
    np.testing.assert_array_equal(np.asarray(f.mv_x), mvx)
    np.testing.assert_array_equal(np.asarray(f.best_cost_i32), best.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(t), traj)


@pytest.mark.parametrize(
    "blk,span,metric,shift,hw",
    [
        (8, 7, "sad", (1, -2), (48, 64)),      # SAD staged, level 1 only
        (8, 15, "sad", (6, 5), (48, 64)),      # SAD staged, escalation
        (32, 12, "mse", (2, -1), (96, 128)),   # blk-32 staged (int32 fold)
        (32, 12, "mse", (9, -8), (96, 128)),   # blk-32 staged, escalation
        (32, 7, "sad", (1, 2), (100, 170)),    # blk-32 SAD + truncated edges
    ],
)
def test_staged_sad_blk32_equals_golden(blk, span, metric, shift, hw):
    """Round-4 extension: the staged fast path covers SAD and blk 32
    (phase-kernel volumes; golden volume fallback off-TPU), trajectories
    bit-exact vs diamond_search_np."""
    h, w = hw
    rng = np.random.default_rng(blk * span + h)
    cur, ref = _pair(rng, h, w, *shift)
    assert diamond.staged_supported(blk, span, metric)
    f, t = diamond.diamond_search_frame(
        cur, ref, blk_dim=blk, span=span, metric=metric,
        record_trajectory=True, volume_mode="staged",
    )
    mvy, mvx, best, traj = diamond.diamond_search_np(
        cur, ref, blk_dim=blk, span=span, metric=metric
    )
    np.testing.assert_array_equal(np.asarray(f.mv_y), mvy)
    np.testing.assert_array_equal(np.asarray(f.mv_x), mvx)
    np.testing.assert_array_equal(
        np.asarray(f.best_cost_i32), best.astype(np.int64)
    )
    np.testing.assert_array_equal(np.asarray(t), traj)


@pytest.mark.parametrize("metric,early", [("mse", 40.0), ("sad", 4.0)])
def test_staged_early_term_with_escalation(metric, early):
    """Early termination interacts with multi-level staged escalation:
    per-pixel thresholds divide by the truncated block areas, and
    early-terminated blocks must freeze identically whether or not the
    frame escalates past level 1 (span 15 -> levels (6, 15))."""
    rng = np.random.default_rng(99)
    h, w = 52, 68  # truncated edge blocks at blk 8
    cur, ref = _pair(rng, h, w, 6, 5)  # forces escalation
    f, t = diamond.diamond_search_frame(
        cur, ref, blk_dim=8, span=15, metric=metric, early_term=early,
        record_trajectory=True, volume_mode="staged",
    )
    mvy, mvx, best, traj = diamond.diamond_search_np(
        cur, ref, blk_dim=8, span=15, metric=metric, early_term=early
    )
    np.testing.assert_array_equal(np.asarray(f.mv_y), mvy)
    np.testing.assert_array_equal(np.asarray(f.mv_x), mvx)
    np.testing.assert_array_equal(
        np.asarray(f.best_cost_i32), best.astype(np.int64)
    )
    np.testing.assert_array_equal(np.asarray(t), traj)


@pytest.mark.parametrize(
    "h,w,blk,span,shift",
    [
        (48, 64, 8, 12, (1, -2)),    # level 1 only
        (52, 60, 8, 15, (6, 5)),     # escalation + truncated edges
        (64, 96, 16, 15, (6, 5)),    # blk 16 escalation
    ],
)
def test_staged_ssim_equals_golden(h, w, blk, span, shift):
    """Round-4 extension: staged diamond covers SSIM (float score
    volumes from the fast SSIM kernel on TPU; golden volumes off-TPU).
    Trajectories/MVs match the canonical numpy model exactly; scores
    match the JAX full-volume replay bit-exactly (the numpy oracle's
    eager, uncontracted float sequence can differ by 1 ULP from any
    jitted path — the same class of quirk as PARITY deviation 6)."""
    rng = np.random.default_rng(h + w + span)
    cur, ref = _pair(rng, h, w, *shift)
    assert diamond.staged_supported(blk, span, "ssim")
    f, t = diamond.diamond_search_frame(
        cur, ref, blk_dim=blk, span=span, metric="ssim",
        record_trajectory=True, volume_mode="staged",
    )
    mvy, mvx, _, traj = diamond.diamond_search_np(
        cur, ref, blk_dim=blk, span=span, metric="ssim"
    )
    np.testing.assert_array_equal(np.asarray(f.mv_y), mvy)
    np.testing.assert_array_equal(np.asarray(f.mv_x), mvx)
    np.testing.assert_array_equal(np.asarray(t), traj)
    full = diamond.diamond_search_frame(
        cur, ref, blk_dim=blk, span=span, metric="ssim",
        volume_mode="full",
    )
    np.testing.assert_array_equal(
        np.asarray(f.score), np.asarray(full.score)
    )
    np.testing.assert_array_equal(
        np.asarray(f.best_cost_i32), np.asarray(full.best_cost_i32)
    )


class TestCrossoverPolicy:
    """escape_policy="crossover" (round-4 verdict item 3): adversarial
    escapes route through the fused full-search argmin."""

    def test_no_escape_identical_to_canonical(self):
        rng = np.random.default_rng(3)
        # Noise-free non-wrapping shift (cropped windows of one larger
        # plane): every block has an exact zero-cost match at (-1, +2),
        # nothing escapes, so crossover must be bit-identical.
        big = _smooth(rng, 72, 104)
        ref = big[4:68, 4:100]
        cur = big[3:67, 6:102]
        f_c = diamond.diamond_search_frame(
            cur, ref, blk_dim=8, span=15, escape_policy="crossover",
        )
        f_n = diamond.diamond_search_frame(cur, ref, blk_dim=8, span=15)
        np.testing.assert_array_equal(np.asarray(f_c.mv_y), np.asarray(f_n.mv_y))
        np.testing.assert_array_equal(np.asarray(f_c.mv_x), np.asarray(f_n.mv_x))
        np.testing.assert_array_equal(
            np.asarray(f_c.best_cost_i32), np.asarray(f_n.best_cost_i32)
        )

    def test_adversarial_escapes_take_full_search_optimum(self):
        """Escaped blocks return the fused full-search result; blocks the
        two policies agree on stay canonical; crossover never returns a
        worse cost than canonical anywhere."""
        from motionestimation_tpu.search import full_search as fs_mod

        rng = np.random.default_rng(4)
        cur, ref = _pair(rng, 64, 96, 13, -13)  # past level-1 escape radius
        f_c = diamond.diamond_search_frame(
            cur, ref, blk_dim=8, span=15, escape_policy="crossover",
        )
        f_n = diamond.diamond_search_frame(cur, ref, blk_dim=8, span=15)
        full = fs_mod.full_search_frame(cur, ref, blk_dim=8, span=15)
        cost_c = np.asarray(f_c.best_cost_i32)
        cost_n = np.asarray(f_n.best_cost_i32)
        cost_f = np.asarray(full.best_cost_i32)
        assert (cost_c <= cost_n).all()
        differs = (np.asarray(f_c.mv_y) != np.asarray(f_n.mv_y)) | (
            np.asarray(f_c.mv_x) != np.asarray(f_n.mv_x)
        )
        assert differs.any(), "adversarial shift must actually escape"
        np.testing.assert_array_equal(
            np.asarray(f_c.mv_y)[differs], np.asarray(full.mv_y)[differs]
        )
        np.testing.assert_array_equal(
            np.asarray(f_c.mv_x)[differs], np.asarray(full.mv_x)[differs]
        )
        np.testing.assert_array_equal(cost_c[differs], cost_f[differs])

    def test_crossover_rejects_unsupported_modes(self):
        rng = np.random.default_rng(5)
        cur, ref = _pair(rng, 48, 64, 1, 1)
        with pytest.raises(ValueError):
            diamond.diamond_search_frame(
                cur, ref, blk_dim=8, span=7, metric="ssim",
                escape_policy="crossover",
            )
        with pytest.raises(ValueError):
            diamond.diamond_search_frame(
                cur, ref, blk_dim=8, span=15, escape_policy="crossover",
                volume_mode="lazy",
            )
        with pytest.raises(ValueError):
            diamond.diamond_search_frame(
                cur, ref, blk_dim=8, span=15, escape_policy="crossover",
                record_trajectory=True,
            )
