"""NumPy emulator of the reference CPU implementation's exact semantics.

This is a deliberately *independent* second implementation, structured like
the C code (per-block Python loop, C window-clamp expressions, float32
arithmetic in C evaluation order) rather than like the vectorised JAX path.
It serves as the oracle for randomized tests; it is itself validated against
the compiled reference binaries on the bundled Foreman frames (see
tools/gen_fixtures.py and tests/fixtures).

Citations are to /root/reference.

Not for production use — O(blocks) Python loop; use search.full_search.
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def _window_bounds(tl_x, tl_y, br_x, br_y, span, width, height):
    """Clamped search window, exactly main.c:73-76 / main_ssim.c:21-24."""
    w_tl_x = 0 if tl_x - span < 0 else tl_x - span
    w_tl_y = 0 if tl_y - span < 0 else tl_y - span
    w_br_x = width - 1 if br_x + span >= width else br_x + span
    w_br_y = height - 1 if br_y + span >= height else br_y + span
    return w_tl_x, w_tl_y, w_br_x, w_br_y


def _block_grid(height, width, blk_dim):
    """Row-major ceil-div grid with truncated edge blocks
    (prediction_frame.c:9-23)."""
    nbx = (width + blk_dim - 1) // blk_dim
    nby = (height + blk_dim - 1) // blk_dim
    blocks = []
    for i in range(nbx * nby):
        bx, by = i % nbx, i // nbx
        tl_x, tl_y = bx * blk_dim, by * blk_dim
        w = blk_dim if tl_x + blk_dim < width else width - tl_x
        h = blk_dim if tl_y + blk_dim < height else height - tl_y
        blocks.append((bx, by, tl_x, tl_y, w, h))
    return nby, nbx, blocks


def full_search_mse(cur: np.ndarray, ref: np.ndarray, blk_dim: int, span: int):
    """Oracle full-search MSE. cur/ref: [H, W] integer arrays.

    Returns (mv_y, mv_x, best_ssd, best_mse_f32), each [nby, nbx].
    Candidate scan order and tie-breaking follow main.c:39-64: y-outer
    raster order, strict < on the float32 MSE.

    blk-32 caveat (advisor round 3): this oracle's comparison domain is
    the float32 cast of the EXACT integer SSD, while the C binary
    (main.c:18-27) accumulates SSD sequentially in float32. For
    blk_dim <= 16 both are exact (SSD < 2^24) and all domains agree
    bit-for-bit; at blk 32 the SSD can reach 255²·1024 ≈ 2^26, where
    C's accumulation order introduces rounding the exact-int domains
    don't have, so on adversarial near-ties (candidates within the
    float accumulation error, ~thousands at that magnitude) the C
    binary, this oracle, and the integer-SSD golden/Pallas argmin can
    each pick different MVs. The framework's canonical blk-32 semantics
    are the EXACT integer SSD (golden/Pallas); parity with the C binary
    at blk 32 is validated empirically on the committed fixtures
    (tests/fixtures/foreman_mse_32_8), not guaranteed analytically.
    See PARITY.md "blk-32 argmin domain".
    """
    height, width = cur.shape
    cur = cur.astype(np.int64)
    ref = ref.astype(np.int64)
    nby, nbx, blocks = _block_grid(height, width, blk_dim)
    mv_y = np.zeros((nby, nbx), np.int32)
    mv_x = np.zeros((nby, nbx), np.int32)
    best_ssd = np.zeros((nby, nbx), np.int64)
    best_mse = np.zeros((nby, nbx), np.float32)

    for bx, by, tl_x, tl_y, w, h in blocks:
        w_tl_x, w_tl_y, w_br_x, w_br_y = _window_bounds(
            tl_x, tl_y, tl_x + w - 1, tl_y + h - 1, span, width, height
        )
        blk = cur[tl_y : tl_y + h, tl_x : tl_x + w]
        # Candidate top-lefts fully inside the window (main.c:53-54).
        ys = np.arange(w_tl_y, w_br_y - h + 2)
        xs = np.arange(w_tl_x, w_br_x - w + 2)
        # Sliding windows over the candidate rectangle, raster layout.
        region = ref[w_tl_y : w_br_y + 1, w_tl_x : w_br_x + 1]
        win = np.lib.stride_tricks.sliding_window_view(region, (h, w))
        # win: [len(ys), len(xs), h, w]
        diff = win - blk[None, None]
        ssd = np.einsum("yxhw,yxhw->yx", diff, diff)
        # float32 MSE exactly as C: float sum / float(w*h). The float32 SSD
        # equals the integer SSD whenever SSD < 2^24 (always for blk_dim<=16);
        # comparisons are then identical to C's float comparisons.
        mse = ssd.astype(np.float32) / np.float32(w * h)
        flat = int(np.argmin(mse))  # first minimum in raster order wins
        cy, cx = divmod(flat, len(xs))
        mv_x[by, bx] = int(xs[cx]) - tl_x
        mv_y[by, bx] = int(ys[cy]) - tl_y
        best_ssd[by, bx] = ssd[cy, cx]
        best_mse[by, bx] = mse[cy, cx]
    return mv_y, mv_x, best_ssd, best_mse


def full_search_sad(cur: np.ndarray, ref: np.ndarray, blk_dim: int, span: int):
    """Oracle full-search SAD. cur/ref: [H, W] integer arrays.

    Returns (mv_y, mv_x, best_sad, best_mad_f32), each [nby, nbx].

    The reference has no SAD driver; the canonical SAD semantics are
    defined to mirror the MSE driver exactly (main.c:39-64): identical
    clamped window (main.c:73-76), y-outer raster scan, strict < with
    first-in-raster-order-wins ties — only the per-candidate cost changes
    to the exact integer Σ|cur-ref| (BASELINE.json: "bit-exact ... SAD
    costs"). Integer SADs make every comparison exact (max SAD =
    255·32² < 2¹⁸).
    """
    height, width = cur.shape
    cur = cur.astype(np.int64)
    ref = ref.astype(np.int64)
    nby, nbx, blocks = _block_grid(height, width, blk_dim)
    mv_y = np.zeros((nby, nbx), np.int32)
    mv_x = np.zeros((nby, nbx), np.int32)
    best_sad = np.zeros((nby, nbx), np.int64)
    best_mad = np.zeros((nby, nbx), np.float32)

    for bx, by, tl_x, tl_y, w, h in blocks:
        w_tl_x, w_tl_y, w_br_x, w_br_y = _window_bounds(
            tl_x, tl_y, tl_x + w - 1, tl_y + h - 1, span, width, height
        )
        blk = cur[tl_y : tl_y + h, tl_x : tl_x + w]
        ys = np.arange(w_tl_y, w_br_y - h + 2)
        xs = np.arange(w_tl_x, w_br_x - w + 2)
        region = ref[w_tl_y : w_br_y + 1, w_tl_x : w_br_x + 1]
        win = np.lib.stride_tricks.sliding_window_view(region, (h, w))
        sad = np.abs(win - blk[None, None]).sum(axis=(2, 3))
        flat = int(np.argmin(sad))  # first minimum in raster order wins
        cy, cx = divmod(flat, len(xs))
        mv_x[by, bx] = int(xs[cx]) - tl_x
        mv_y[by, bx] = int(ys[cy]) - tl_y
        best_sad[by, bx] = sad[cy, cx]
        best_mad[by, bx] = np.float32(sad[cy, cx]) / np.float32(w * h)
    return mv_y, mv_x, best_sad, best_mad


def _f32(x):
    return np.float32(x)


def full_search_ssim(cur: np.ndarray, ref: np.ndarray, blk_dim: int, span: int):
    """Oracle full-search SSIM (maximise), reproducing ssim.c:44-108.

    Returns (mv_y, mv_x, best_score_f32). Float operations follow the C
    evaluation order closely; the sequentially-accumulated float sums
    (mean/var/crossvar loops) are emulated with np.add.accumulate along the
    pixel axis, which performs the same left-to-right float32 additions.
    """
    height, width = cur.shape
    cur_i = cur.astype(np.int32)
    ref_i = ref.astype(np.int32)
    nby, nbx, blocks = _block_grid(height, width, blk_dim)
    mv_y = np.zeros((nby, nbx), np.int32)
    mv_x = np.zeros((nby, nbx), np.int32)
    best_score = np.zeros((nby, nbx), np.float32)

    c1, c2, c3 = _f32(0.01), _f32(0.09), _f32(0.045)

    def seq_sum_f32(terms):
        """Sequential float32 accumulation along the last axis (C loop order)."""
        flat = terms.reshape(terms.shape[0], -1).astype(np.float32)
        return np.add.accumulate(flat, axis=1, dtype=np.float32)[:, -1]

    for bx, by, tl_x, tl_y, w, h in blocks:
        w_tl_x, w_tl_y, w_br_x, w_br_y = _window_bounds(
            tl_x, tl_y, tl_x + w - 1, tl_y + h - 1, span, width, height
        )
        blk = cur_i[tl_y : tl_y + h, tl_x : tl_x + w]
        ys = np.arange(w_tl_y, w_br_y - h + 2)
        xs = np.arange(w_tl_x, w_br_x - w + 2)
        region = ref_i[w_tl_y : w_br_y + 1, w_tl_x : w_br_x + 1]
        win = np.lib.stride_tricks.sliding_window_view(region, (h, w))
        ncand = len(ys) * len(xs)
        win = win.reshape(ncand, h, w)
        n = _f32(w * h)

        # computeMean (ssim.c:3-14): float accumulation of ints (exact for
        # sums < 2^24, i.e. always), then float division.
        mean_ref = (seq_sum_f32(win) / n).astype(np.float32)
        mean_cur = _f32(seq_sum_f32(blk[None])[0] / n)

        # computeVar (ssim.c:16-27): sequential float32 Σ(x-mean)² / N.
        var_ref = (
            seq_sum_f32(
                (win.astype(np.float32) - mean_ref[:, None, None]) ** 2
            )
            / n
        ).astype(np.float32)
        var_cur = _f32(
            seq_sum_f32((blk[None].astype(np.float32) - mean_cur) ** 2)[0] / n
        )

        # sqrt: C calls double sqrt on the float var, result narrowed to float
        # (ssim.c:52-53).
        std_ref = np.sqrt(var_ref.astype(np.float64)).astype(np.float32)
        std_cur = _f32(math.sqrt(float(var_cur)))

        # computeCrossVar (ssim.c:29-41) with int-truncated means (ssim.c:54).
        imean_ref = mean_ref.astype(np.int32)  # C float->int trunc (non-neg)
        imean_cur = np.int32(mean_cur)
        cross = (
            (win - imean_ref[:, None, None]) * (blk[None] - imean_cur)
        )
        cross_var = (seq_sum_f32(cross) / n).astype(np.float32)

        luminance = (
            _f32(2.0) * mean_ref * mean_cur + c1
        ) / (mean_ref * mean_ref + mean_cur * mean_cur + c1)
        contrast = (_f32(2.0) * std_ref * std_cur + c2) / (
            std_ref * std_ref + std_cur * std_cur + c2
        )
        structure = (cross_var + c3) / (std_ref * std_cur + c3)
        score = (luminance * contrast * structure).astype(np.float32)

        # findBestMatchSSIM (ssim.c:83-108): maximise, init 0, strict >.
        best = _f32(0.0)
        best_flat = None
        for i in range(ncand):
            if score[i] > best:
                best = score[i]
                best_flat = i
        if best_flat is None:
            mv_x[by, bx] = 0
            mv_y[by, bx] = 0  # deviation: C reads uninitialised memory here
            best_score[by, bx] = 0.0
        else:
            cy, cx = divmod(best_flat, len(xs))
            mv_x[by, bx] = int(xs[cx]) - tl_x
            mv_y[by, bx] = int(ys[cy]) - tl_y
            best_score[by, bx] = best
    return mv_y, mv_x, best_score


def motion_compensate(
    ref: np.ndarray, mv_y: np.ndarray, mv_x: np.ndarray, blk_dim: int
) -> np.ndarray:
    """Oracle motion compensation (utils.c:102-134); gathers ref[cur+mv]."""
    height, width = ref.shape
    comp = np.zeros((height, width), np.int32)
    nby, nbx, blocks = _block_grid(height, width, blk_dim)
    for bx, by, tl_x, tl_y, w, h in blocks:
        dy, dx = int(mv_y[by, bx]), int(mv_x[by, bx])
        comp[tl_y : tl_y + h, tl_x : tl_x + w] = ref[
            tl_y + dy : tl_y + dy + h, tl_x + dx : tl_x + dx + w
        ]
    return comp
