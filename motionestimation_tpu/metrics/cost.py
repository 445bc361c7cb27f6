"""Cost metrics: SSD/MSE and SSIM, as pure functions over block sums.

The reference computes per-candidate costs with scalar pixel loops
(MSE: /root/reference/src/cpu/main.c:18-36; SSIM mean/var/crossvar passes:
/root/reference/src/common/ssim.c:3-60). The TPU-native formulation reduces
each candidate to a handful of *exact integer block sums* (Σx, Σx², Σxy,
pixel count) computed on the VPU, then applies the scalar cost formula to
whole [nby, nbx] (or [..., K²]) arrays at once. Keeping the sums in int32
makes MV comparisons exact (BASELINE.json demands bit-exact MVs and integer
SAD/SSD costs); only the final SSIM formula is float.

Quirks reproduced deliberately (SURVEY.md §6):
* SSIM constants C1=0.01, C2=0.09, C3=0.045 (ssim.c:47).
* ``computeCrossVar`` receives the two means as **int** parameters
  (ssim.h:12, ssim.c:29), truncating fractional means before the
  cross-variance pass. We reproduce that truncation exactly via integer
  mean floors (means are non-negative, so C's toward-zero truncation is a
  floor).
* Variance is the biased /N estimator with the *float* mean (ssim.c:16-27).
"""
from __future__ import annotations

import jax.numpy as jnp

SSIM_C1 = 0.01
SSIM_C2 = 0.09
SSIM_C3 = 0.045

INT32_MAX = jnp.iinfo(jnp.int32).max


def block_reduce(x, blk_dim: int):
    """Sum a [..., nby*blk, nbx*blk] pixel array into per-block [..., nby, nbx]."""
    *lead, hp, wp = x.shape
    nby, nbx = hp // blk_dim, wp // blk_dim
    return x.reshape(*lead, nby, blk_dim, nbx, blk_dim).sum(axis=(-3, -1))


def mse_from_ssd(ssd, count):
    """MSE = SSD / (w*h) in float32 (main.c:27).

    ``count`` is the true (truncated) block pixel count; 0-count padding
    blocks map to 0 rather than NaN.
    """
    denom = jnp.maximum(count, 1).astype(jnp.float32)
    return ssd.astype(jnp.float32) / denom


def mad_from_sad(sad, count):
    """Mean absolute difference = SAD / (w*h) in float32.

    The SAD metric itself is the exact integer Σ|cur-ref| (the bit-exact
    quantity BASELINE.json's north star demands); this derived mean is the
    reported score, mirroring how MSE relates to SSD (main.c:27). The
    reference has no SAD driver, so the canonical semantics are defined
    here: same raster scan, same strict-< first-wins tie rule as MSE
    (main.c:53-60), cost = integer SAD.
    """
    denom = jnp.maximum(count, 1).astype(jnp.float32)
    return sad.astype(jnp.float32) / denom


def ssim_from_sums(sum_ref, sum_sq_ref, sum_cur, sum_sq_cur, sum_cross, count):
    """SSIM score from exact integer block sums (ssim.c:44-60).

    Arguments are integer sums over the (masked, truncated) block extent:
      sum_ref / sum_sq_ref   — candidate patch in the reference frame
      sum_cur / sum_sq_cur   — block in the current frame
      sum_cross              — Σ ref*cur
      count                  — number of in-frame pixels (w*h)

    Mean     = Σx / N                                  (ssim.c:3-14)
    Var      = Σ(x-Mean)² / N = (Σx² - 2·Mean·Σx + N·Mean²) / N
                                                       (ssim.c:16-27)
    CrossVar = Σ(ref - int(Mean_ref))·(cur - int(Mean_cur)) / N
             = (Σ ref·cur - iMc·Σref - iMr·Σcur + N·iMr·iMc) / N
      with iM* = integer-truncated means — the reference's silent
      float→int narrowing at the computeCrossVar call (ssim.c:29,54).
    L = (2·Mr·Mc + C1) / (Mr² + Mc² + C1)
    C = (2·σr·σc + C2) / (σr² + σc² + C2)
    S = (CrossVar + C3) / (σr·σc + C3)
    score = L·C·S                                      (ssim.c:55-58)
    """
    n_i = jnp.maximum(count, 1)
    n = n_i.astype(jnp.float32)
    mean_ref = sum_ref.astype(jnp.float32) / n
    mean_cur = sum_cur.astype(jnp.float32) / n

    # Variance with the float mean, computed without catastrophic
    # cancellation: center on the integer floor-mean c = ΣX // N first.
    #   Σ(x-M)² = Σ(x-c)² - 2(M-c)·Σ(x-c) + N(M-c)²
    # Σ(x-c)² = Σx² - 2cΣx + Nc² is an exact int32 (≤ ~2^24, fits f32
    # exactly), Σ(x-c) = Σx - Nc is an exact small int32, and (M-c) ∈ [0,1)
    # is an exact f32 difference — so var matches the real Σ(x-M_f)²/N value
    # to f32 ULP, versus the C code's sequentially-accumulated float sum
    # (ssim.c:16-27) whose positive-term rounding noise is of the same order.
    # A naive Σx² - 2MΣx + NM² in f32 loses ~4e-3 absolute on flat 16×16
    # blocks, enough to flip MVs — observed on Foreman.
    # C truncates the *float* mean (ssim.c:54 → int params at ssim.c:29);
    # trunc(f32 mean) can differ from the exact floor S//N when the f32
    # division rounds up across an integer, so truncate the f32 value itself.
    imean_ref = mean_ref.astype(jnp.int32)
    imean_cur = mean_cur.astype(jnp.int32)

    def centered_var(sum_x, sum_sq, imean, mean):
        csq = sum_sq - 2 * imean * sum_x + n_i * imean * imean  # int32 exact
        cs = sum_x - n_i * imean  # int32 exact
        frac = mean - imean.astype(jnp.float32)  # exact f32, in [0, 1)
        num = (
            csq.astype(jnp.float32)
            - 2.0 * frac * cs.astype(jnp.float32)
            + n * frac * frac
        )
        return num / n

    var_ref = centered_var(sum_ref, sum_sq_ref, imean_ref, mean_ref)
    var_cur = centered_var(sum_cur, sum_sq_cur, imean_cur, mean_cur)
    # Guard tiny negative rounding residue before sqrt.
    std_ref = jnp.sqrt(jnp.maximum(var_ref, 0.0))
    std_cur = jnp.sqrt(jnp.maximum(var_cur, 0.0))
    cross_sum = (
        sum_cross
        - imean_cur * sum_ref
        - imean_ref * sum_cur
        + count * imean_ref * imean_cur
    )
    cross_var = cross_sum.astype(jnp.float32) / n

    c1 = jnp.float32(SSIM_C1)
    c2 = jnp.float32(SSIM_C2)
    c3 = jnp.float32(SSIM_C3)
    luminance = (2.0 * mean_ref * mean_cur + c1) / (
        mean_ref * mean_ref + mean_cur * mean_cur + c1
    )
    # Denominator uses StdDev*StdDev (not Var): matches ssim.c:56, where the
    # sqrt-rounded float std is squared again.
    contrast = (2.0 * std_ref * std_cur + c2) / (
        std_ref * std_ref + std_cur * std_cur + c2
    )
    structure = (cross_var + c3) / (std_ref * std_cur + c3)
    return luminance * contrast * structure
