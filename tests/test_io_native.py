"""Native IO library vs the pure-numpy fallback: byte-identical."""
import os

import numpy as np
import pytest

from motionestimation_tpu import io_native
from motionestimation_tpu.core import frames

pytestmark = pytest.mark.skipif(
    not (io_native.available() or io_native.build()),
    reason="native IO library not built and no toolchain",
)

REF = "/root/reference/frames/ForemanYF1.yuv"


def test_read_matches_python():
    native = io_native.read_frame(REF, 288, 352)
    with open(REF, "rb") as f:
        py = np.frombuffer(f.read(288 * 352), np.uint8).reshape(288, 352)
    assert np.array_equal(native, py)


def test_read_errors():
    with pytest.raises(IOError):
        io_native.read_frame("/nonexistent/file.yuv", 288, 352)
    with pytest.raises(IOError):
        io_native.read_frame(REF, 4000, 4000)  # file too small


def test_write_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (64, 48), dtype=np.int32)
    p = tmp_path / "w.yuv"
    io_native.write_frame(p, frame)
    assert np.array_equal(
        frames.load_yuv(p, 64, 48), frame.astype(np.uint8)
    )
    # mod-256 narrowing like the C cast (utils.c:57)
    io_native.write_frame(p, frame + 256)
    assert np.array_equal(
        frames.load_yuv(p, 64, 48), frame.astype(np.uint8)
    )


def test_stack_output_matches_python():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (32, 40), dtype=np.int32)
    cur = rng.integers(0, 256, (32, 40), dtype=np.int32)
    comp = rng.integers(0, 256, (32, 40), dtype=np.int32)
    native = io_native.stack_output(ref, cur, comp)
    py = np.concatenate(
        [ref, cur, comp, np.abs(ref - cur), np.abs(comp - cur)], axis=0
    )
    assert np.array_equal(native, py)


def test_motion_compensate_matches_reference_model():
    from motionestimation_tpu.search.reference_model import (
        full_search_mse, motion_compensate,
    )

    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    cur = np.roll(ref, (2, -1), (0, 1))
    mv_y, mv_x, _, _ = full_search_mse(cur, ref, 8, 4)
    golden = motion_compensate(ref.astype(np.int32), mv_y, mv_x, 8)
    native = io_native.motion_compensate(
        ref.astype(np.int32), mv_y, mv_x, 8
    )
    assert np.array_equal(native, golden)


def test_frames_routes_native(tmp_path):
    """core.frames transparently uses the native library when available."""
    assert io_native.available()
    f = frames.load_yuv(REF, 288, 352)
    assert f.shape == (288, 352) and f.dtype == np.uint8


def test_load_yuv_rows_matches_full_read(tmp_path):
    """Multi-host row ingest: load_yuv_rows returns exactly the row
    slice of the full read, with one seek (round-5)."""
    import numpy as np

    from motionestimation_tpu.core import frames as fl

    rng = np.random.default_rng(3)
    h, w = 37, 53
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    p = tmp_path / "f.yuv"
    fl.save_yuv(str(p), frame)
    full = fl.load_yuv(str(p), h, w)
    for lo, hi in ((0, h), (5, 20), (0, 0), (36, 37), (h, h)):
        np.testing.assert_array_equal(
            fl.load_yuv_rows(str(p), h, w, lo, hi), full[lo:hi]
        )
    import pytest

    with pytest.raises(ValueError):
        fl.load_yuv_rows(str(p), h, w, 5, 3)
    with pytest.raises(ValueError):
        fl.load_yuv_rows(str(p), h, w, 0, h + 1)


def test_load_yuv_into_matches_load_yuv(tmp_path):
    """The pooled-buffer read path is byte-identical to the allocating
    one, and validates the buffer contract."""
    import numpy as np
    import pytest

    from motionestimation_tpu.core import frames as fl

    rng = np.random.default_rng(4)
    h, w = 41, 29
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    p = tmp_path / "f.yuv"
    fl.save_yuv(str(p), frame)
    buf = np.empty((h, w), np.uint8)
    out = fl.load_yuv_into(str(p), buf)
    assert out is buf
    np.testing.assert_array_equal(buf, fl.load_yuv(str(p), h, w))
    with pytest.raises(ValueError):
        fl.load_yuv_into(str(p), np.empty((h, w), np.int32))
    with pytest.raises(IOError):
        fl.load_yuv_into(str(p), np.empty((h + 1, w), np.uint8))
