"""SSIM full-search tests: JAX path vs NumPy C-emulator oracle and vs the
compiled reference binary (main_ssim.c driver).

SSIM scores are float32; the JAX path computes variances algebraically from
exact integer sums while the C code accumulates (x-mean)^2 sequentially in
float32, so scores can differ by a few ULP. MVs must still agree except
where two candidates' scores are within that float noise; the tests assert
byte-exact compensated frames vs the binary (which implies MV-identical
behaviour on these inputs) — if that ever fails on a near-tie, the weaker
score-tolerance oracle test localises it.
"""
import numpy as np
import pytest

from motionestimation_tpu.core import frames as frames_lib
from motionestimation_tpu.search import full_search as fs
from motionestimation_tpu.search import reference_model as oracle

from conftest import ssim_cases


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
        (24, 32, 8, 3),
        (36, 52, 8, 5),
        (33, 45, 4, 4),
        (32, 32, 16, 5),
    ],
)
def test_ssim_matches_oracle(h, w, blk, span):
    rng = np.random.default_rng(h * 100 + w + blk + span)
    cur, ref = _random_pair(rng, h, w)
    field = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="ssim")
    o_mv_y, o_mv_x, o_score = oracle.full_search_ssim(cur, ref, blk, span)
    mv_y = np.asarray(field.mv_y)
    mv_x = np.asarray(field.mv_x)
    score = np.asarray(field.score)
    # MVs must match except where the oracle's own score margin is in float
    # noise (then both choices are "correct" under the C float semantics).
    mism = (mv_y != o_mv_y) | (mv_x != o_mv_x)
    if mism.any():
        # At any mismatch the two scores must be nearly identical ties.
        np.testing.assert_allclose(
            score[mism], o_score[mism], rtol=1e-5,
            err_msg="MV mismatch without a near-tie score",
        )
        assert mism.mean() < 0.05, "too many near-tie MV mismatches"
    np.testing.assert_allclose(score, o_score, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("fixture_case", ssim_cases(), indirect=True)
def test_ssim_pipeline_matches_reference_binary(fixture_case):
    """Byte-exact 5-frame stacked output + residual scores vs the compiled
    SSIM driver (main_ssim.c:79-100)."""
    case = fixture_case
    cur, ref = case.cur, case.ref
    field = fs.full_search_frame(
        cur, ref, blk_dim=case.blk_dim, span=case.span, metric="ssim"
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

    # Residual-MSE score line (main_ssim.c:90-96): emulate the reference's
    # float32 sequential accumulation; must match the printed %.4f exactly.
    orig_golden, comp_golden = case.golden_scores()
    orig = frames_lib.residual_mse_c_float32(cur, ref)
    compensated = frames_lib.residual_mse_c_float32(comp, cur)
    assert f"{orig:.4f}" == f"{orig_golden:.4f}"
    assert f"{compensated:.4f}" == f"{comp_golden:.4f}"
