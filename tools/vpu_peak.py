"""Empirical VPU peak measurement for the MFU denominator.

The full-search chain is elementwise VPU work (sub + multiply-add per
term), so its speed-of-light is the VPU's sustained elementwise
throughput — not the MXU TFLOPs headline. This microbenchmark measures
that ceiling on the actual chip with three instruction mixes:

  FMA   — x = a*x + b chains (the densest VPU op; 2 flops/elem-op)
  MIX   — sub + FMA pairs (the exact full-search chain mix)
  ROLL  — pltpu.roll + add (the sliding-sum mix)
  CHAIN — the phase kernel's inner loop in isolation: per (dy) group, 8
          slab reads of C and E phase planes, d = c - e, acc += d*d.
          This is the achievable ceiling for the production kernel's
          dominant work (operand slabs stream from VMEM exactly as in
          the kernel), so kernel_diff_rate / CHAIN ≈ honest MFU.

Usage: python tools/vpu_peak.py [iters]
Prints T elem-ops/s for each mix; bench.py cites the FMA number as
`vpu_peak_ops` and reports the kernel's achieved fraction.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

ROWS, COLS = 64, 1024   # 256 KB f32 tile: 4 streams + temps fit VMEM
INNER = 64              # ops per fori iteration (static unroll)
OUTER = 4096            # fori iterations
CHAIN = 4               # kernel invocations chained per jit call


def make_kernel(mix: str):
    def kernel(a_ref, out_ref, x_ref):
        x_ref[:] = a_ref[:]
        a = a_ref[:]

        def body(i, _):
            # 4 independent accumulator streams so the measurement is
            # throughput-bound, not serial-latency-bound.
            xs = [x_ref[:], a * 0.5, a * 0.25, a * 0.125]
            if mix == "fma":
                for _ in range(INNER // 4):
                    xs = [a * x + 1.0 for x in xs]
            elif mix == "mix":
                # the full-search term mix: d = c - e; acc = d*d + acc
                for _ in range(INNER // 8):
                    ds = [x - a for x in xs]
                    xs = [d * d + x for d, x in zip(ds, xs)]
            elif mix == "roll":
                for _ in range(INNER // 8):
                    xs = [x + pltpu.roll(x, COLS - 1, 1) for x in xs]
            x_ref[:] = ((xs[0] + xs[1]) + (xs[2] + xs[3]))
            return 0

        lax.fori_loop(0, OUTER, body, 0)
        out_ref[:] = x_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("mix",))
def run(a, *, mix):
    kernel = make_kernel(mix)

    def call(a_in):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, COLS), jnp.float32)],
        )(a_in)
        return jnp.sum(out)

    def step(carry, _):
        out = call(a + (carry - carry))
        return out, None

    last, _ = lax.scan(step, jnp.float32(0), None, length=CHAIN)
    return last


CH_G, CH_BLK, CH_K, CH_W = 8, 8, 25, 2048  # phase-kernel stripe shape


@jax.jit
def run_chain(c_in, e_in):
    """The production phase kernel's inner loop in isolation: for each of
    CH_K dy groups, a CH_BLK-term chain of d = C[r] - E[dy+r]; acc += d*d
    over [CH_G, CH_W] slabs (exactly _kernel_phase's dominant work, minus
    sliding sums / keys / argmin / rolls)."""
    n_phase = CH_BLK + CH_K - 1

    def kernel(c_ref, e_ref, out_ref):
        def body(i, _):
            total = None
            for dy in range(CH_K):
                acc = None
                for r in range(CH_BLK):
                    d = (
                        c_ref[r * CH_G : (r + 1) * CH_G, :]
                        - e_ref[(dy + r) * CH_G : (dy + r + 1) * CH_G, :]
                    )
                    acc = d * d if acc is None else d * d + acc
                total = acc if total is None else jnp.minimum(total, acc)
            out_ref[:] = total
            return 0

        lax.fori_loop(0, 64, body, 0)

    def call(c):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((CH_G, CH_W), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c, e_in)
        return jnp.sum(out)

    def step(carry, _):
        out = call(c_in + (carry - carry))
        return out, None

    last, _ = lax.scan(step, jnp.float32(0), None, length=CHAIN)
    return last


def measure_chain(reps: int = 3) -> float:
    """Sustained elem-ops/s of the isolated chain (sub + FMA = 2 ops per
    term). This is the kernel's achievable ceiling denominator."""
    rng = np.random.default_rng(0)
    n_phase = CH_BLK + CH_K - 1
    c = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (CH_BLK * CH_G, CH_W)), jnp.float32))
    e = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (n_phase * CH_G, CH_W)), jnp.float32))
    jax.block_until_ready((c, e))
    float(run_chain(c, e))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_chain(c, e))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / CHAIN
    ops = 2 * CH_K * CH_BLK * CH_G * CH_W * 64  # sub + fma per term
    return ops / dt / 1e12


def measure(mix: str, reps: int = 3) -> float:
    """Returns sustained T elem-ops/s (an FMA = 1 elem-op)."""
    rng = np.random.default_rng(0)
    # values in (0, 1) so x stays finite through the fma chain
    a = jax.device_put(
        jnp.asarray(rng.uniform(0.1, 0.9, (ROWS, COLS)), jnp.float32) * 1e-6
    )
    jax.block_until_ready(a)
    float(run(a, mix=mix))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(a, mix=mix))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / CHAIN
    if mix == "fma":
        ops = ROWS * COLS * INNER * OUTER  # each fma = 1 elem-op
    elif mix == "mix":
        ops = ROWS * COLS * INNER * OUTER  # sub + fma = 2 elem-ops per pair
    else:
        ops = ROWS * COLS * INNER * OUTER  # roll + add = 2 "ops" per pair
    return ops / dt / 1e12


def main():
    for mix in sys.argv[1:] or ["fma", "mix", "roll", "chain"]:
        t = measure_chain() if mix == "chain" else measure(mix)
        print(f"{mix:5s} {t:7.3f} T elem-ops/s")


if __name__ == "__main__":
    main()
