"""Raw YUV (luma plane) frame I/O and host-side frame ops.

Reference semantics reproduced (file:line in /root/reference):

* ``yuvReadFrame`` reads exactly H*W bytes from the start of the file and
  widens u8 -> int (src/common/utils.c:61-73). We load into uint8 and widen
  to int32 on demand.
* ``yuvWriteFrame`` narrows int -> u8 with a plain C cast, i.e. modulo-256
  truncation (utils.c:55-59,75-92). All values written by the pipeline are
  already in [0, 255], so this is lossless in practice; we reproduce the
  cast anyway.
* ``frameDiff`` is |a - b| (utils.c:94-100).
* ``imagePSNR`` uses the *observed* max pixel of either frame (not 255),
  double-precision MSE, returns 99.0 when MSE == 0, and
  psnr = 20*log10(MAX) - 10*log10(MSE) (utils.c:137-164). Computed here on
  host in float64 for exact parity with the printed reference values.
* The emitted artifact is a 5-frame vertical stack
  [ref, cur, compensated, |ref-cur|, |comp-cur|] named
  ``output_<blk>_<span>.yuv`` (src/cpu/main.c:129,161-175).
"""
from __future__ import annotations

import math
import os
from typing import Sequence

import numpy as np

from motionestimation_tpu import io_native


def load_yuv(path: str | os.PathLike, height: int, width: int) -> np.ndarray:
    """Read the first H*W bytes of a raw YUV file as a [H, W] uint8 luma plane.

    Uses the native mmap reader (io_native/libme_io.so) when built; the
    Python fallback is byte-identical.
    """
    if io_native.available():
        return io_native.read_frame(path, height, width)
    n = height * width
    with open(path, "rb") as f:
        raw = f.read(n)
    if len(raw) < n:
        raise IOError(
            f"{path}: expected at least {n} bytes for {width}x{height} luma, "
            f"got {len(raw)}"
        )
    return np.frombuffer(raw, dtype=np.uint8, count=n).reshape(height, width)


def load_yuv_into(path: str | os.PathLike, out: np.ndarray) -> np.ndarray:
    """`load_yuv` into a caller-owned [H, W] uint8 buffer (no allocation).

    Same bytes as `load_yuv`; exists so the pipelined GOP reader can
    recycle a fixed buffer pool — a fresh allocation per 4K frame costs
    ~50-150 ms of first-touch page faults on this host while transfers
    are in flight, vs ~2 ms into a reused buffer (the userspace analogue
    of the reference's pinned-host staging, main_mse.cu:168-169)."""
    if out.dtype != np.uint8 or out.ndim != 2 or not out.flags.c_contiguous:
        raise ValueError("out must be a C-contiguous [H, W] uint8 array")
    if io_native.available():
        return io_native.read_frame_into(path, out)
    n = out.size
    with open(path, "rb") as f:
        got = f.readinto(out.reshape(-1))
    if got < n:
        h, w = out.shape
        raise IOError(
            f"{path}: expected at least {n} bytes for {w}x{h} luma, got {got}"
        )
    return out


def load_yuv_rows(
    path: str | os.PathLike, height: int, width: int, row_lo: int, row_hi: int
) -> np.ndarray:
    """Read only rows [row_lo, row_hi) of a [height, width] luma plane.

    Multi-host sharded ingest (SURVEY.md §2 distributed row): each host
    reads just the frame rows its mesh rows own
    (`parallel.ingest.local_row_range`), so a 4K GOP's disk traffic
    scales down with the host count instead of replicating. Rows are
    contiguous bytes, so this is one seek + one read."""
    if not (0 <= row_lo <= row_hi <= height):
        raise ValueError(
            f"row range [{row_lo}, {row_hi}) outside [0, {height}]"
        )
    n = (row_hi - row_lo) * width
    if n == 0:
        return np.empty((0, width), np.uint8)
    with open(path, "rb") as f:
        f.seek(row_lo * width)
        raw = f.read(n)
    if len(raw) < n:
        raise IOError(
            f"{path}: expected {n} bytes for rows [{row_lo}, {row_hi}) of "
            f"{width}x{height} luma, got {len(raw)}"
        )
    return np.frombuffer(raw, dtype=np.uint8, count=n).reshape(-1, width)


def save_yuv(path: str | os.PathLike, frame: np.ndarray) -> None:
    """Write an integer frame as raw u8 bytes (C-cast narrowing, utils.c:57)."""
    data = np.asarray(frame)
    if io_native.available() and data.dtype == np.int32:
        io_native.write_frame(path, data)
        return
    if data.dtype != np.uint8:
        data = data.astype(np.uint8)  # wraps mod 256 like the C cast
    with open(path, "wb") as f:
        f.write(data.tobytes())


def frame_diff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """|a - b| elementwise in int32 (utils.c:94-100)."""
    return np.abs(a.astype(np.int32) - b.astype(np.int32))


def image_psnr(frame1: np.ndarray, frame2: np.ndarray) -> float:
    """PSNR with the reference's exact conventions (utils.c:137-164).

    MAX is the maximum observed sample of either frame (utils.c:147-152),
    MSE accumulates |diff|^2 in float64, MSE == 0 returns 99.0 (utils.c:159).
    """
    a = frame1.astype(np.int64).ravel()
    b = frame2.astype(np.int64).ravel()
    max_val = int(max(a.max(initial=0), b.max(initial=0)))
    diff = np.abs(a - b).astype(np.float64)
    mse = float(np.dot(diff, diff)) / a.size
    if mse == 0:
        return 99.0
    return 20.0 * math.log10(max_val) - 10.0 * math.log10(mse)


def psnr_from_stats(sum_sq_err: int, count: int, max_val: int) -> float:
    """PSNR from an exact integer Σerr² + observed max (utils.c:137-164).

    Bit-identical to `image_psnr` when the stats are exact: Σerr² for 8-bit
    frames is < 2^53, so the float64 division reproduces image_psnr's
    `np.dot(float64)` value exactly. Lets sharded runs compute PSNR from
    psum'd device statistics without fetching the compensated frame.
    """
    mse = float(int(sum_sq_err)) / count
    if mse == 0:
        return 99.0
    return 20.0 * math.log10(int(max_val)) - 10.0 * math.log10(mse)


def compensate_frame_np(
    ref: np.ndarray, mv_y: np.ndarray, mv_x: np.ndarray, blk_dim: int
) -> np.ndarray:
    """Host-side motion compensation: comp[p] = ref[p + mv(block(p))]
    (utils.c:102-134).

    The reference reconstructs on the host from the fetched MV block list
    (main_mse.cu:245-254) — mirrored here so the device ships only MVs
    (~0.3 MB at 4K) instead of the 8.3 MB compensated frame. Bit-identical
    to the device `compensate_frame` gather: valid full-search MVs keep
    every gather in-frame.
    """
    h, w = ref.shape
    mvy_px = np.repeat(np.repeat(mv_y, blk_dim, 0), blk_dim, 1)[:h, :w]
    mvx_px = np.repeat(np.repeat(mv_x, blk_dim, 0), blk_dim, 1)[:h, :w]
    yy = np.arange(h, dtype=np.int64)[:, None] + mvy_px
    xx = np.arange(w, dtype=np.int64)[None, :] + mvx_px
    return ref.astype(np.int32)[yy, xx]


def residual_mse(a: np.ndarray, b: np.ndarray) -> float:
    """Mean squared residual between two frames (float64, the true value)."""
    d = a.astype(np.float64).ravel() - b.astype(np.float64).ravel()
    return float(np.dot(d, d)) / d.size


def residual_mse_c_float32(a: np.ndarray, b: np.ndarray) -> float:
    """Mean squared residual with the reference's float32 accumulation.

    The SSIM driver accumulates the squared diffs sequentially in a float
    (src/cpu/main_ssim.c:90-96); at frame scale the running sum reaches ~2^25
    and late terms are absorbed with large rounding error, so the printed
    "Original Score"/"Compensated Score" differ measurably from the true
    value (e.g. 384.4514 vs 384.7116 on Foreman). Reproduced here with a
    sequential float32 accumulate for output parity.
    """
    d = a.astype(np.int64).ravel() - b.astype(np.int64).ravel()
    terms = (d * d).astype(np.float32)
    total = np.add.accumulate(terms, dtype=np.float32)[-1]
    return float(np.float32(total) / np.float32(d.size))


def stack_output(
    ref: np.ndarray, cur: np.ndarray, comp: np.ndarray
) -> np.ndarray:
    """Build the 5-frame stacked output [ref, cur, comp, |ref-cur|, |comp-cur|]

    (src/cpu/main.c:161-168). Returns [5*H, W] int32.
    """
    if (
        io_native.available()
        and ref.shape == cur.shape == comp.shape
    ):
        return io_native.stack_output(
            ref.astype(np.int32), cur.astype(np.int32),
            comp.astype(np.int32),
        )
    frames: Sequence[np.ndarray] = (
        ref.astype(np.int32),
        cur.astype(np.int32),
        comp.astype(np.int32),
        frame_diff(ref, cur),
        frame_diff(comp, cur),
    )
    return np.concatenate(frames, axis=0)


def output_filename(output_dir: str | os.PathLike, blk_dim: int, span: int) -> str:
    """``<dir>/output_<blk>_<span>.yuv`` (main.c:129)."""
    return os.path.join(os.fspath(output_dir), f"output_{blk_dim}_{span}.yuv")
