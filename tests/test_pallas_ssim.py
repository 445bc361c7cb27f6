"""Pallas SSIM search kernel vs the golden XLA SSIM path (interpret mode).

MV-exactness requires the kernel's float32 score sequence to match the
golden path's bit-for-bit (same sums, same formula), so these tests check
scores exactly, not approximately.
"""
import numpy as np
import pytest

from motionestimation_tpu.kernels.ssim_pallas import ssim_search_frame_pallas
from motionestimation_tpu.search import full_search as fs


def _random_pair(rng, h, w):
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.roll(ref, (rng.integers(-3, 4), rng.integers(-3, 4)), (0, 1))
    cur = np.clip(
        cur.astype(np.int32) + rng.integers(-6, 7, (h, w)), 0, 255
    ).astype(np.uint8)
    return cur, ref


@pytest.mark.parametrize(
    "h,w,blk,span,tile",
    [
        (32, 32, 8, 4, 32),
        (36, 52, 8, 5, 32),     # truncated edge blocks
        (48, 64, 16, 7, 32),
        (33, 45, 4, 3, 24),     # ragged, small blocks
        (72, 96, 32, 4, 32),    # blk 32 split-fold fast path + edge slab
        (64, 128, 32, 7, 32),   # blk 32 whole-block, wider span
        (96, 96, 24, 3, 32),    # 16 < blk < 32 split-fold coverage
        (96, 96, 12, 3, 32),    # non-power-of-two <= 16 (ULP-drift case)
    ],
)
def test_ssim_pallas_matches_golden_random(h, w, blk, span, tile):
    rng = np.random.default_rng(h * 3 + w + blk + span)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(
        cur, ref, blk_dim=blk, span=span, metric="ssim"
    )
    pallas = ssim_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=tile, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(pallas.mv_y), np.asarray(golden.mv_y)
    )
    np.testing.assert_array_equal(
        np.asarray(pallas.mv_x), np.asarray(golden.mv_x)
    )
    if blk & (blk - 1) == 0:
        np.testing.assert_array_equal(
            np.asarray(pallas.score), np.asarray(golden.score)
        )
    else:
        # Non-power-of-two block sizes: the integer sums are exact (the
        # same ints reach ssim_from_sums) but XLA:CPU contracts the
        # float score arithmetic differently in the two programs, a
        # ~1e-8 FMA-contraction drift — measured against float64 truth
        # the KERNEL's scores are the closer ones. MVs stay exact.
        # Predates round 5 (blk 7/12 behaved identically at blk <= 16).
        np.testing.assert_allclose(
            np.asarray(pallas.score), np.asarray(golden.score),
            rtol=0, atol=1e-6,
        )


def test_ssim_pallas_foreman_16_7():
    """Real Foreman pair at the SSIM fixture config (16x16 +-7), golden is
    MV-exact vs the compiled C reference (test_ssim_golden)."""
    from conftest import FixtureCase

    case = FixtureCase("foreman_ssim_16_7")
    golden = fs.full_search_frame(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span,
        metric="ssim",
    )
    pallas = ssim_search_frame_pallas(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span, tile=96,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(pallas.mv_y), np.asarray(golden.mv_y)
    )
    np.testing.assert_array_equal(
        np.asarray(pallas.mv_x), np.asarray(golden.mv_x)
    )
