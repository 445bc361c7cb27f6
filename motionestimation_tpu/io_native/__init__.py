"""ctypes bindings for the native IO library (libme_io.so).

Build with `make -C motionestimation_tpu/io_native`. Every entry point has
a numpy fallback in core.frames; `available()` reports whether the native
path is active. core.frames routes hot IO through here automatically when
the .so exists, so Python-only checkouts keep working.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libme_io.so")


def _lib():
    global _LIB
    if _LIB is None and os.path.exists(_SO):
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.me_read_frame_u8.argtypes = [ctypes.c_char_p, i64, i64, u8p]
        lib.me_widen_u8_i32.argtypes = [u8p, i64, i32p]
        lib.me_write_frame_i32.argtypes = [ctypes.c_char_p, i32p, i64]
        lib.me_frame_diff.argtypes = [i32p, i32p, i64, i32p]
        lib.me_motion_compensate.argtypes = [
            i32p, i64, i64, i32p, i32p, i64, i64, i64, i32p,
        ]
        lib.me_stack_output.argtypes = [i32p, i32p, i32p, i64, i64, i32p]
        for f in (
            lib.me_read_frame_u8, lib.me_widen_u8_i32,
            lib.me_write_frame_i32, lib.me_frame_diff,
            lib.me_motion_compensate, lib.me_stack_output,
        ):
            f.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def build(quiet: bool = True) -> bool:
    """Best-effort `make` of the .so; returns availability."""
    global _LIB
    if available():
        return True
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        subprocess.run(
            ["make", "-C", here],
            check=True,
            capture_output=quiet,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    _LIB = None
    return available()


def _check(rc: int, what: str):
    if rc != 0:
        raise IOError(f"{what} failed with native error {rc} ({os.strerror(-rc)})")


def read_frame(path: str | os.PathLike, height: int, width: int) -> np.ndarray:
    out = np.empty((height, width), np.uint8)
    read_frame_into(path, out)
    return out


def read_frame_into(path: str | os.PathLike, out: np.ndarray) -> np.ndarray:
    """Read a frame into a caller-owned [H, W] uint8 buffer (no allocation).

    The GOP reader thread recycles a fixed buffer pool through this: a
    fresh np.empty per 4K frame pays ~50-150 ms of first-touch page
    faults on this host while device transfers are in flight (measured;
    reused buffers read the same frame in ~2 ms)."""
    h, w = out.shape
    _check(
        _lib().me_read_frame_u8(os.fsencode(path), h, w, out),
        f"read_frame({path})",
    )
    return out


def write_frame(path: str | os.PathLike, frame_i32: np.ndarray) -> None:
    data = np.ascontiguousarray(frame_i32, np.int32)
    _check(
        _lib().me_write_frame_i32(os.fsencode(path), data, data.size),
        f"write_frame({path})",
    )


def stack_output(
    ref: np.ndarray, cur: np.ndarray, comp: np.ndarray
) -> np.ndarray:
    h, w = ref.shape
    out = np.empty((5 * h, w), np.int32)
    _check(
        _lib().me_stack_output(
            np.ascontiguousarray(ref, np.int32),
            np.ascontiguousarray(cur, np.int32),
            np.ascontiguousarray(comp, np.int32),
            h, w, out,
        ),
        "stack_output",
    )
    return out


def motion_compensate(
    ref: np.ndarray, mv_y: np.ndarray, mv_x: np.ndarray, blk_dim: int
) -> np.ndarray:
    h, w = ref.shape
    nby, nbx = mv_y.shape
    comp = np.zeros((h, w), np.int32)
    _check(
        _lib().me_motion_compensate(
            np.ascontiguousarray(ref, np.int32), h, w,
            np.ascontiguousarray(mv_y, np.int32),
            np.ascontiguousarray(mv_x, np.int32),
            nby, nbx, blk_dim, comp,
        ),
        "motion_compensate",
    )
    return comp
