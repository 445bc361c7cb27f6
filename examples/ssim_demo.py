"""Standalone single-pair SSIM demo.

Parity companion to the reference's scratch prototype
(/root/reference/src/gpu/ssim.cu:56-115): computes SSIM between two random
16x16 blocks with that file's *different* convention — integer constants
C1=2, C2=2, C3=1 and the unbiased /(N-1) variance estimator — rather than
the production path's C1=.01/C2=.09/C3=.045 with biased /N variance
(ssim.c:47). The reference demo is not launched by any run script; this is
the same kind of self-contained sanity tool, minus its uninitialised-
accumulator bug.

    python examples/ssim_demo.py [seed]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def ssim_unbiased(block_a, block_b):
    """SSIM with the demo's conventions (ssim.cu:56-89): float means,
    sqrt of the unbiased variance, integer constants."""
    a = block_a.astype(jnp.float32)
    b = block_b.astype(jnp.float32)
    n = a.size
    mu_a = jnp.sum(a) / n
    mu_b = jnp.sum(b) / n
    sigma_a = jnp.sqrt(jnp.sum((a - mu_a) ** 2) / (n - 1))
    sigma_b = jnp.sqrt(jnp.sum((b - mu_b) ** 2) / (n - 1))
    sigma_ab = jnp.sum((a - mu_a) * (b - mu_b)) / (n - 1)
    c1, c2, c3 = 2.0, 2.0, 1.0
    luminance = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    contrast = (2 * sigma_a * sigma_b + c2) / (
        sigma_a**2 + sigma_b**2 + c2
    )
    structure = (sigma_ab + c3) / (sigma_a * sigma_b + c3)
    return luminance * contrast * structure


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    rng = np.random.default_rng(seed)
    # rand()%10 + 10, like initBlock (ssim.cu:92-101)
    block_a = rng.integers(10, 20, (16, 16))
    block_b = rng.integers(10, 20, (16, 16))
    value = float(ssim_unbiased(jnp.asarray(block_a), jnp.asarray(block_b)))
    print(f"SSIM VALUE OBTAINED IS {value:f} ")
    ident = float(ssim_unbiased(jnp.asarray(block_a), jnp.asarray(block_a)))
    print(f"(self-SSIM sanity: {ident:f})")


if __name__ == "__main__":
    main()
