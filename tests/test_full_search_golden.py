"""Golden full-search tests: JAX path vs the NumPy C-semantics oracle and
vs the compiled reference binary's outputs (tests/fixtures).

The strongest check is byte-exact equality of the full 5-frame stacked
output YUV against the reference binary — that pins MVs, compensation,
diffs, and the u8 narrowing all at once.
"""
import numpy as np
import pytest

from motionestimation_tpu.core import frames as frames_lib
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.search import reference_model as oracle

from conftest import FixtureCase, mse_cases


def _random_pair(rng, h, w):
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    # correlated current frame: shifted + noise (makes non-trivial MVs)
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
        (24, 24, 32, 4),   # block larger than frame → single truncated block
        (70, 90, 32, 8),
    ],
)
def test_full_search_mse_matches_oracle(h, w, blk, span):
    rng = np.random.default_rng(h * 1000 + w * 10 + blk + span)
    cur, ref = _random_pair(rng, h, w)
    field = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    o_mv_y, o_mv_x, o_ssd, o_mse = oracle.full_search_mse(cur, ref, blk, span)
    np.testing.assert_array_equal(np.asarray(field.mv_y), o_mv_y)
    np.testing.assert_array_equal(np.asarray(field.mv_x), o_mv_x)
    np.testing.assert_array_equal(np.asarray(field.best_cost_i32), o_ssd)
    # The float32 MSE *display* value may differ by 1 ULP: XLA lowers f32
    # division to reciprocal-multiply. MVs and integer SSDs above are exact,
    # which is the bit-exactness contract (BASELINE.json).
    np.testing.assert_allclose(np.asarray(field.score), o_mse, rtol=2e-7)


def test_tie_breaking_first_raster_candidate_wins():
    """Constant frames: every candidate has SSD 0 → the first candidate in
    raster order (top-left of the clamped window) must win (main.c:53-60)."""
    h = w = 32
    blk, span = 8, 4
    cur = np.full((h, w), 128, np.uint8)
    ref = np.full((h, w), 128, np.uint8)
    field = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    mv_y = np.asarray(field.mv_y)
    mv_x = np.asarray(field.mv_x)
    # Interior block (1,1): window starts at (tl-span) → first candidate is
    # displacement (-span, -span).
    assert mv_y[1, 1] == -span and mv_x[1, 1] == -span
    # Corner block (0,0): window clamped at 0 → first candidate is (0, 0).
    assert mv_y[0, 0] == 0 and mv_x[0, 0] == 0
    o = oracle.full_search_mse(cur, ref, blk, span)
    np.testing.assert_array_equal(mv_y, o[0])
    np.testing.assert_array_equal(mv_x, o[1])


def test_cost_volume_raster_order():
    """Cost volume index k encodes displacement (k//K - s, k%K - s) and the
    best index is the argmin of the masked volume (first occurrence)."""
    rng = np.random.default_rng(7)
    cur, ref = _random_pair(rng, 24, 24)
    blk, span = 8, 3
    field, vol = fs.full_search_frame(
        cur, ref, blk_dim=blk, span=span, metric="mse", return_cost_volume=True
    )
    vol = np.asarray(vol)  # [K², nby, nbx]
    flat_arg = vol.argmin(axis=0)
    k = 2 * span + 1
    np.testing.assert_array_equal(
        np.asarray(field.mv_y), flat_arg // k - span
    )
    np.testing.assert_array_equal(
        np.asarray(field.mv_x), flat_arg % k - span
    )


@pytest.mark.parametrize("fixture_case", mse_cases(), indirect=True)
def test_full_pipeline_matches_reference_binary(fixture_case):
    """Byte-exact 5-frame stacked YUV + printed PSNR vs the compiled C
    reference (main.c:161-175)."""
    case = fixture_case
    cur, ref = case.cur, case.ref
    field = fs.full_search_frame(
        cur, ref, blk_dim=case.blk_dim, span=case.span, metric="mse"
    )
    comp = np.asarray(
        fs.compensate_frame(
            ref, field,
            frame_height=case.height, frame_width=case.width,
            blk_dim=case.blk_dim, span=case.span,
        )
    )
    stack = frames_lib.stack_output(ref, cur, comp).astype(np.uint8)
    golden = case.golden_stack.reshape(5 * case.height, case.width)
    np.testing.assert_array_equal(stack, golden)

    psnr = frames_lib.image_psnr(comp, cur.astype(np.int32))
    assert f"{psnr:.6f}" == f"{case.golden_psnr():.6f}"


@pytest.mark.parametrize("fixture_case", ["foreman_mse_8_12"], indirect=True)
def test_published_foreman_psnr(fixture_case):
    """The de-facto headline number: PSNR 31.816000 on Foreman F4→F1 8×8±12
    (results/cpu/foreman/2990wx_threadripper_64_cores.txt:11)."""
    assert f"{fixture_case.golden_psnr():.6f}" == "31.816000"


@pytest.mark.parametrize("fixture_case", mse_cases(), indirect=True)
def test_oracle_matches_reference_binary(fixture_case):
    """The NumPy oracle itself reproduces the binary's compensated frame."""
    case = fixture_case
    mv_y, mv_x, _, _ = oracle.full_search_mse(
        case.cur, case.ref, case.blk_dim, case.span
    )
    comp = oracle.motion_compensate(case.ref.astype(np.int32), mv_y, mv_x, case.blk_dim)
    np.testing.assert_array_equal(
        comp.astype(np.uint8), case.golden_stack[2]
    )
