"""SAD metric tests: XLA path vs the NumPy oracle, tie-breaking, CLI,
diamond, and the BASELINE config-1 shape (Foreman, 16x16, +-7).

The reference has no SAD driver (src/cpu/main.c is MSE-only), so the
oracle `reference_model.full_search_sad` *defines* the canonical
semantics: the MSE driver's scan order, window clamp and strict-< raster
tie rule (main.c:39-82) with cost = exact integer SAD (BASELINE.json
demands bit-exact MVs and SAD costs).
"""
import numpy as np
import pytest

from motionestimation_tpu.search import diamond
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.search import reference_model as oracle

from conftest import foreman


def _random_pair(rng, h, w):
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.roll(ref, (rng.integers(-3, 4), rng.integers(-3, 4)), (0, 1))
    cur = np.clip(
        cur.astype(np.int32) + rng.integers(-6, 7, (h, w)), 0, 255
    ).astype(np.uint8)
    return cur, ref


@pytest.mark.parametrize(
    "h,w,blk,span",
    [
        (32, 32, 8, 4),
        (36, 52, 8, 5),    # truncated edge blocks
        (33, 45, 4, 7),    # span > blk
        (48, 64, 16, 9),
        (40, 40, 8, 0),    # degenerate span
        (70, 90, 32, 8),   # wide blocks + truncation
    ],
)
def test_full_search_sad_matches_oracle(h, w, blk, span):
    rng = np.random.default_rng(h * 1000 + w * 10 + blk + span + 7)
    cur, ref = _random_pair(rng, h, w)
    field = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="sad")
    o_mv_y, o_mv_x, o_sad, _ = oracle.full_search_sad(cur, ref, blk, span)
    np.testing.assert_array_equal(np.asarray(field.mv_y), o_mv_y)
    np.testing.assert_array_equal(np.asarray(field.mv_x), o_mv_x)
    np.testing.assert_array_equal(np.asarray(field.best_cost_i32), o_sad)


def test_sad_tie_break_raster_first_wins():
    """A flat frame makes EVERY candidate an exact tie (SAD = 0): the
    winner must be the first candidate in raster order, i.e. the clamped
    window's top-left — mv = -min(span, topleft) per component
    (main.c:53-60 semantics)."""
    h, w, blk, span = 32, 48, 8, 5
    cur = np.full((h, w), 77, np.uint8)
    ref = np.full((h, w), 77, np.uint8)
    field = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="sad")
    nby, nbx = h // blk, w // blk
    tl_y = np.arange(nby)[:, None] * blk
    tl_x = np.arange(nbx)[None, :] * blk
    exp_mv_y = np.maximum(-span, -tl_y) * np.ones((1, nbx), np.int64)
    exp_mv_x = np.maximum(-span, -tl_x) * np.ones((nby, 1), np.int64)
    np.testing.assert_array_equal(np.asarray(field.mv_y), exp_mv_y)
    np.testing.assert_array_equal(np.asarray(field.mv_x), exp_mv_x)
    assert int(np.asarray(field.best_cost_i32).max()) == 0


def test_sad_baseline_config1_foreman():
    """BASELINE.json config 1: Foreman F1->F2, full-search SAD, 16x16, +-7.
    XLA path must match the oracle bit-exactly (MVs and SAD costs)."""
    cur = foreman("ForemanYF2")
    ref = foreman("ForemanYF1")
    field = fs.full_search_frame(cur, ref, blk_dim=16, span=7, metric="sad")
    o_mv_y, o_mv_x, o_sad, _ = oracle.full_search_sad(cur, ref, 16, 7)
    np.testing.assert_array_equal(np.asarray(field.mv_y), o_mv_y)
    np.testing.assert_array_equal(np.asarray(field.mv_x), o_mv_x)
    np.testing.assert_array_equal(np.asarray(field.best_cost_i32), o_sad)


def test_sad_differs_from_mse_somewhere():
    """Sanity: SAD and SSD are different metrics — on a noisy pair with
    outlier pixels the MV fields should not be identical everywhere."""
    rng = np.random.default_rng(0)
    cur, ref = _random_pair(rng, 64, 64)
    # salt a few outliers to split SAD/SSD decisions
    ref = ref.copy()
    ref[::7, ::9] = 255
    f_sad = fs.full_search_frame(cur, ref, blk_dim=8, span=6, metric="sad")
    f_mse = fs.full_search_frame(cur, ref, blk_dim=8, span=6, metric="mse")
    same = np.array_equal(
        np.asarray(f_sad.mv_y), np.asarray(f_mse.mv_y)
    ) and np.array_equal(np.asarray(f_sad.mv_x), np.asarray(f_mse.mv_x))
    assert not same


def test_diamond_sad_matches_numpy_golden():
    rng = np.random.default_rng(3)
    cur, ref = _random_pair(rng, 48, 64)
    g_mv_y, g_mv_x, g_cost, g_traj = diamond.diamond_search_np(
        cur, ref, blk_dim=8, span=6, metric="sad"
    )
    field, traj = diamond.diamond_search_frame(
        cur, ref, blk_dim=8, span=6, metric="sad", record_trajectory=True
    )
    np.testing.assert_array_equal(np.asarray(field.mv_y), g_mv_y)
    np.testing.assert_array_equal(np.asarray(field.mv_x), g_mv_x)
    np.testing.assert_array_equal(
        np.asarray(field.best_cost_i32), g_cost.astype(np.int64)
    )
    np.testing.assert_array_equal(np.asarray(traj), g_traj)


def test_cli_sad_runs(tmp_path):
    from motionestimation_tpu import cli

    out = tmp_path / "out"
    rc = cli.main(
        [
            "/root/reference/frames/ForemanYF2.yuv",
            "/root/reference/frames/ForemanYF1.yuv",
            str(out),
            "16",
            "7",
            "352",
            "288",
            "--metric",
            "sad",
            "--backend",
            "xla",
        ]
    )
    assert rc == 0
    assert (out / "output_16_7.yuv").exists()
