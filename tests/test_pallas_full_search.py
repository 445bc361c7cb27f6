"""Pallas fused-search kernel vs the golden XLA path (interpret mode on CPU).

The Pallas kernel must be bit-exact: identical MVs and integer SSDs to
search.full_search_frame, which is itself byte-exact vs the compiled C
reference (test_full_search_golden).
"""
import numpy as np
import pytest

from motionestimation_tpu.kernels import full_search_frame_pallas
from motionestimation_tpu.search import full_search as fs

from conftest import FixtureCase


def _random_pair(rng, h, w):
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = np.roll(ref, (rng.integers(-3, 4), rng.integers(-3, 4)), (0, 1))
    cur = np.clip(
        cur.astype(np.int32) + rng.integers(-6, 7, (h, w)), 0, 255
    ).astype(np.uint8)
    return cur, ref


def _assert_fields_equal(a: fs.MotionField, b: fs.MotionField):
    np.testing.assert_array_equal(np.asarray(a.mv_y), np.asarray(b.mv_y))
    np.testing.assert_array_equal(np.asarray(a.mv_x), np.asarray(b.mv_x))
    np.testing.assert_array_equal(
        np.asarray(a.best_cost_i32), np.asarray(b.best_cost_i32)
    )


@pytest.mark.parametrize(
    "h,w,blk,span,tile",
    [
        (32, 32, 8, 4, 32),     # single tile
        (64, 64, 8, 4, 32),     # 2x2 tiles, interior tile borders
        (36, 52, 8, 5, 32),     # truncated edge blocks + ragged tiling
        (48, 64, 16, 7, 32),    # span crosses tile border
        (40, 56, 8, 12, 16),    # halo wider than the tile
        (33, 45, 4, 3, 24),
    ],
)
def test_pallas_matches_golden_random(h, w, blk, span, tile):
    rng = np.random.default_rng(h + w * 7 + blk + span)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=tile, interpret=True
    )
    _assert_fields_equal(pallas, golden)


def test_pallas_tie_breaking():
    """Constant frames: every SSD ties at 0 → raster-first must win."""
    cur = np.full((32, 32), 77, np.uint8)
    ref = np.full((32, 32), 77, np.uint8)
    golden = fs.full_search_frame(cur, ref, blk_dim=8, span=4, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=8, span=4, tile=16, interpret=True
    )
    _assert_fields_equal(pallas, golden)
    assert int(np.asarray(pallas.mv_y)[1, 1]) == -4  # window top-left wins


def test_pallas_matches_reference_binary_foreman():
    """End-to-end on the real Foreman pair against the C-binary fixture MVs
    (via the golden path, already byte-exact vs the binary)."""
    case = FixtureCase("foreman_mse_8_12")
    golden = fs.full_search_frame(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span, metric="mse"
    )
    pallas = full_search_frame_pallas(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span, tile=96,
        interpret=True,
    )
    _assert_fields_equal(pallas, golden)


def test_pallas_phase_blk32_matches_reference_binary_foreman():
    """blk-32 phase kernel on the real Foreman pair (C fixture
    foreman_mse_32_8). 288x352 = 9x11 whole 32px blocks, so this case has
    NO truncated blocks; blk-32 edge truncation (the thin-slab merge) is
    covered by the (100, 170) random case in
    test_pallas_phase_blk32_matches_golden."""
    case = FixtureCase("foreman_mse_32_8")
    golden = fs.full_search_frame(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span, metric="mse"
    )
    pallas = full_search_frame_pallas(
        case.cur, case.ref, blk_dim=case.blk_dim, span=case.span,
        interpret=True, phase=True,
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize("h,w,blk,span", [(64, 64, 8, 4), (36, 52, 8, 5)])
def test_pallas_unroll_dx_matches_golden(h, w, blk, span):
    """The static-slice (unrolled dx) kernel variant is bit-exact too."""
    rng = np.random.default_rng(h + w + blk)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=32, interpret=True,
        unroll_dx=True, phase=False,
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize(
    "h,w,blk,span",
    [
        (96, 128, 32, 8),     # wide-block fast kernel (part-row int32)
        (100, 130, 32, 5),    # truncated edges
        (96, 120, 24, 7),     # blk 24
    ],
)
def test_pallas_wide_block_matches_golden(h, w, blk, span):
    """blk 24/32 route through the part-row f32+int32 fast kernel."""
    rng = np.random.default_rng(h + w * 11 + blk)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=64, interpret=True
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize("h,w,blk,span", [(64, 64, 8, 4), (36, 52, 8, 5)])
def test_pallas_roll_mode_matches_golden(h, w, blk, span):
    """chunk_dx=0 selects the unchunked roll-by-one kernel; bit-exact."""
    rng = np.random.default_rng(h * 3 + w + blk)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=32, interpret=True,
        chunk_dx=0, phase=False,
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize(
    "h,w,blk,span", [(64, 64, 8, 4), (36, 52, 8, 5), (61, 75, 8, 5)]
)
def test_pallas_volume_matches_golden(h, w, blk, span):
    """emit_volume cost volumes: bit-exact SSDs for valid candidates,
    never-winning sentinels for invalid ones (incl. truncated edges)."""
    import jax.numpy as jnp
    from motionestimation_tpu.kernels.full_search_pallas import (
        full_search_volume_pallas,
    )
    from motionestimation_tpu.metrics import cost as cost_lib

    rng = np.random.default_rng(h * 5 + w + blk)
    cur, ref = _random_pair(rng, h, w)
    vol = np.asarray(
        full_search_volume_pallas(
            jnp.asarray(cur), jnp.asarray(ref), blk_dim=blk, span=span,
            interpret=True,
        )
    )
    cur_p = fs.pad_cur_frame(jnp.asarray(cur), h, w, blk)
    halo = fs.make_ref_halo(jnp.asarray(ref), h, w, blk, span)
    _, golden = fs.full_search_tile(
        cur_p, halo, 0, 0, frame_height=h, frame_width=w,
        blk_dim=blk, span=span, metric="mse", return_cost_volume=True,
    )
    golden = np.asarray(golden)
    valid = golden != cost_lib.INT32_MAX
    np.testing.assert_array_equal(vol[valid], golden[valid])
    assert (vol[~valid] > 255**2 * blk * blk).all()


@pytest.mark.parametrize(
    "h,w,blk,span,chunk",
    [(64, 64, 8, 4, 3), (36, 52, 8, 5, 5), (48, 64, 16, 7, 4)],
)
def test_pallas_bf16_matches_golden(h, w, blk, span, chunk):
    """The bf16-staged kernel variant is still bit-exact (pixels <= 255 are
    bf16-exact; products are widened to f32 before the multiply)."""
    rng = np.random.default_rng(h + w + blk + span + chunk)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=blk, span=span, metric="mse")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, tile=32, interpret=True,
        operand_bf16=True, chunk_dx=chunk, phase=False,
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize(
    "h,w,blk,span,metric",
    [
        (64, 96, 8, 4, "mse"),
        (36, 52, 8, 5, "mse"),     # truncated edges
        (36, 52, 8, 5, "sad"),
        (64, 96, 16, 15, "mse"),   # key > int32 → lexicographic path
        (64, 96, 16, 15, "sad"),   # SAD key fits → packed-key path
        (33, 45, 4, 3, "sad"),
        (40, 288, 8, 12, "mse"),   # CIF-ish width, deep span
    ],
)
def test_pallas_phase_matches_golden(h, w, blk, span, metric):
    """The phase-plane kernel (the default fast path) is bit-exact for
    both MSE and SAD, across the packed-key and lexicographic argmins."""
    rng = np.random.default_rng(h * 5 + w + blk + span + len(metric))
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(
        cur, ref, blk_dim=blk, span=span, metric=metric
    )
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=blk, span=span, metric=metric, interpret=True,
        phase=True,
    )
    _assert_fields_equal(pallas, golden)
    np.testing.assert_allclose(
        np.asarray(pallas.score), np.asarray(golden.score)
    )


def test_pallas_phase_tie_breaking():
    """Constant frames: every cost ties at 0 → raster-first must win in
    both packed-key and lexicographic argmin schemes."""
    cur = np.full((64, 64), 77, np.uint8)
    ref = np.full((64, 64), 77, np.uint8)
    for blk, span, metric in [(8, 4, "mse"), (16, 15, "mse"), (8, 4, "sad")]:
        golden = fs.full_search_frame(
            cur, ref, blk_dim=blk, span=span, metric=metric
        )
        pallas = full_search_frame_pallas(
            cur, ref, blk_dim=blk, span=span, metric=metric,
            interpret=True, phase=True,
        )
        _assert_fields_equal(pallas, golden)


def test_pallas_sad_legacy_int_path():
    """SAD with phase=False routes through the exact int kernel."""
    rng = np.random.default_rng(3)
    cur, ref = _random_pair(rng, 36, 52)
    golden = fs.full_search_frame(cur, ref, blk_dim=8, span=5, metric="sad")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=8, span=5, metric="sad", interpret=True,
        phase=False,
    )
    _assert_fields_equal(pallas, golden)


def test_pallas_sad_wide_block_int_path():
    """SAD at blk 32 with phase=False uses the exact int kernel."""
    rng = np.random.default_rng(4)
    cur, ref = _random_pair(rng, 96, 128)
    golden = fs.full_search_frame(cur, ref, blk_dim=32, span=5, metric="sad")
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=32, span=5, metric="sad", interpret=True,
        phase=False,
    )
    _assert_fields_equal(pallas, golden)


@pytest.mark.parametrize(
    "h,w,span,metric",
    [
        (96, 160, 5, "mse"),    # int32 sliding-sum fold (SSD > 2^24)
        (96, 160, 5, "sad"),    # packed-key path at blk 32
        (100, 170, 7, "mse"),   # truncated edge blocks
        (64, 64, 9, "mse"),     # window clamped to the whole frame
    ],
)
def test_pallas_phase_blk32_matches_golden(h, w, span, metric):
    """blk 32 on the phase kernel: chain sums stay exact in f32
    (< 2^24) but the blk-wide lane sliding sum runs in int32."""
    rng = np.random.default_rng(21)
    cur, ref = _random_pair(rng, h, w)
    golden = fs.full_search_frame(cur, ref, blk_dim=32, span=span,
                                  metric=metric)
    pallas = full_search_frame_pallas(
        cur, ref, blk_dim=32, span=span, metric=metric, interpret=True,
        phase=True,
    )
    _assert_fields_equal(pallas, golden)


def test_pallas_phase_blk32_tie_breaking():
    """Flat frames: every candidate ties; first-in-raster-order wins."""
    cur = np.full((64, 64), 9, np.uint8)
    golden = fs.full_search_frame(cur, cur, blk_dim=32, span=6,
                                  metric="mse")
    pallas = full_search_frame_pallas(
        cur, cur, blk_dim=32, span=6, metric="mse", interpret=True,
        phase=True,
    )
    _assert_fields_equal(pallas, golden)


def test_pallas_phase_unsupported_raises():
    cur = np.zeros((48, 48), np.uint8)
    with pytest.raises(ValueError):
        # 128 % 24 != 0: panel borders cannot align to the block grid
        full_search_frame_pallas(
            cur, cur, blk_dim=24, span=4, phase=True, interpret=True
        )
    with pytest.raises(ValueError):
        full_search_frame_pallas(
            cur, cur, blk_dim=8, span=0, phase=True, interpret=True
        )
