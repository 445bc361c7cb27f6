"""Block-grid / window geometry unit tests (ref: prediction_frame.c, main.c:67-76)."""
import numpy as np
import jax.numpy as jnp

from motionestimation_tpu.core import geometry


def test_cdiv():
    assert geometry.cdiv(352, 8) == 44
    assert geometry.cdiv(353, 8) == 45
    assert geometry.cdiv(8, 8) == 1
    assert geometry.cdiv(1, 8) == 1


def test_grid_shape_foreman():
    # 352x288 @ 8 → 44x36 = 1584 blocks (SURVEY §6 baseline row)
    nby, nbx = geometry.grid_shape(288, 352, 8)
    assert (nby, nbx) == (36, 44)
    assert nby * nbx == 1584


def test_block_extents_truncation():
    # 52x36 @ 8 → right column width 4, bottom row height 4
    tl_y, tl_x, blk_h, blk_w = geometry.block_extents_np(36, 52, 8)
    assert tl_x.shape == (5, 7)
    assert blk_w[0, -1] == 52 - 6 * 8  # = 4
    assert blk_h[-1, 0] == 36 - 4 * 8  # = 4
    assert blk_w[0, 0] == 8 and blk_h[0, 0] == 8
    assert tl_x[0, -1] == 48 and tl_y[-1, 0] == 32


def test_block_extents_traced_matches_np():
    tl_y, tl_x, blk_h, blk_w = geometry.block_extents_np(47, 61, 8)
    jtl_y, jtl_x, jblk_h, jblk_w = geometry.block_extents(0, 0, 6, 8, 8, 47, 61)
    np.testing.assert_array_equal(np.asarray(jtl_y), tl_y)
    np.testing.assert_array_equal(np.asarray(jtl_x), tl_x)
    np.testing.assert_array_equal(np.asarray(jblk_h), blk_h)
    np.testing.assert_array_equal(np.asarray(jblk_w), blk_w)


def test_block_extents_origin_offset():
    """Sharded tiles see the same global geometry as the whole frame."""
    full = geometry.block_extents(0, 0, 4, 4, 8, 32, 32)
    tile = geometry.block_extents(16, 8, 2, 3, 8, 32, 32)
    np.testing.assert_array_equal(np.asarray(tile[0]), np.asarray(full[0])[2:4, 1:4])
    np.testing.assert_array_equal(np.asarray(tile[1]), np.asarray(full[1])[2:4, 1:4])


def _c_window_candidates(tl_x, tl_y, w, h, span, width, height):
    """Candidate displacement set derived literally from main.c:53-54,73-76."""
    w_tl_x = max(0, tl_x - span)
    w_tl_y = max(0, tl_y - span)
    w_br_x = min(width - 1, tl_x + w - 1 + span)
    w_br_y = min(height - 1, tl_y + h - 1 + span)
    cands = set()
    for y in range(w_tl_y, w_br_y - h + 2):
        for x in range(w_tl_x, w_br_x - w + 2):
            cands.add((y - tl_y, x - tl_x))
    return cands


def test_displacement_valid_equals_c_window_scan():
    height, width, blk, span = 36, 52, 8, 5
    tl_y, tl_x, blk_h, blk_w = geometry.block_extents_np(height, width, blk)
    nby, nbx = tl_y.shape
    k = 2 * span + 1
    # One vectorised call over the whole displacement lattice: [k, k, nby, nbx]
    d_y = jnp.arange(-span, span + 1, dtype=jnp.int32)[:, None, None, None]
    d_x = jnp.arange(-span, span + 1, dtype=jnp.int32)[None, :, None, None]
    valid = np.asarray(
        geometry.displacement_valid(
            d_y, d_x,
            jnp.asarray(tl_y), jnp.asarray(tl_x),
            jnp.asarray(blk_h), jnp.asarray(blk_w),
            height, width,
        )
    )
    assert valid.shape == (k, k, nby, nbx)
    for by in range(nby):
        for bx in range(nbx):
            expect = _c_window_candidates(
                int(tl_x[by, bx]), int(tl_y[by, bx]),
                int(blk_w[by, bx]), int(blk_h[by, bx]), span, width, height,
            )
            got = {
                (dy - span, dx - span)
                for dy in range(k)
                for dx in range(k)
                if valid[dy, dx, by, bx]
            }
            assert got == expect, f"block ({by},{bx})"
            assert (0, 0) in got  # MV=(0,0) always scanned


def test_mv_from_flat_index_roundtrip():
    span = 12
    k = 2 * span + 1
    idx = jnp.arange(k * k, dtype=jnp.int32)
    mv_y, mv_x = geometry.mv_from_flat_index(idx, span)
    flat = (np.asarray(mv_y) + span) * k + (np.asarray(mv_x) + span)
    np.testing.assert_array_equal(flat, np.arange(k * k))
    assert int(np.asarray(mv_y)[0]) == -span and int(np.asarray(mv_x)[0]) == -span


def test_search_config_validation():
    import pytest

    from motionestimation_tpu.core.config import SearchConfig

    with pytest.raises(ValueError):
        SearchConfig(blk_dim=0)
    with pytest.raises(ValueError):
        SearchConfig(span=-1)
    with pytest.raises(ValueError):
        SearchConfig(metric="mad")
    assert SearchConfig(metric="sad").metric == "sad"
    with pytest.raises(ValueError):
        SearchConfig(algorithm="hexagon")
    with pytest.raises(ValueError):
        SearchConfig(frame_width=0)
    c = SearchConfig(blk_dim=16, span=7)
    assert c.num_candidates == 15 * 15
