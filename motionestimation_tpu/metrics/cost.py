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
    n = jnp.maximum(count, 1).astype(jnp.float32)
    sr = sum_ref.astype(jnp.float32)
    sc = sum_cur.astype(jnp.float32)
    mean_ref = sr / n
    mean_cur = sc / n

    var_ref = (
        sum_sq_ref.astype(jnp.float32) - 2.0 * mean_ref * sr + n * mean_ref * mean_ref
    ) / n
    var_cur = (
        sum_sq_cur.astype(jnp.float32) - 2.0 * mean_cur * sc + n * mean_cur * mean_cur
    ) / n
    # Guard tiny negative rounding residue before sqrt.
    std_ref = jnp.sqrt(jnp.maximum(var_ref, 0.0))
    std_cur = jnp.sqrt(jnp.maximum(var_cur, 0.0))

    # Integer-truncated means (non-negative, so trunc == floor). Exact in
    # int32: Σref·cur fits because 255*255*1024 < 2^31.
    imean_ref = (sum_ref // jnp.maximum(count, 1)).astype(jnp.int32)
    imean_cur = (sum_cur // jnp.maximum(count, 1)).astype(jnp.int32)
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
