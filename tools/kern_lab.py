"""Ablation lab for the full-search kernel: self-contained simplified
Pallas kernels (interior blocks only, divisible dims, single panel) to
isolate where per-candidate time goes on real TPU.

Not part of the package — a measurement harness. Winning schemes get
ported into motionestimation_tpu/kernels/full_search_pallas.py with full
edge handling + golden tests.

Variant spec: NAME[:tile_h[:chunk]]
  NOP  — output-write only (harness floor)
  L0   — replica of the current default (roll products, f32 HIGHEST matmul)
  L1   — L0 minus the compaction matmul (VPU product+roll+fold bound)
  M1   — roll products, hi/lo bf16 split -> single wide bf16 matmul
  M2   — SAD: |cur-ref| is bf16-exact -> single bf16 matmul, no Qcur/Qref
  M3   — L0 with DEFAULT-precision matmul (inexact; measures f32 passes)

Usage: python tools/kern_lab.py L0 L1:128:5 M2 ...
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

H = W = 2048
BLK = 8
SPAN = 12
K = 2 * SPAN + 1
BIG = 3.0e8
CHAIN = 8  # kernel invocations chained inside one jit


def _round_up(x, m):
    return -(-x // m) * m


def _sliding_sums(x, b, axis):
    if b == 1:
        return x
    n = x.shape[axis]
    widths = {1: x}
    w = 1
    while w * 2 <= b:
        widths[w * 2] = widths[w] + pltpu.roll(widths[w], n - w, axis)
        w *= 2
    acc, offset = None, 0
    for w in sorted(widths, reverse=True):
        if b & w:
            t = widths[w] if offset == 0 else pltpu.roll(
                widths[w], n - offset, axis)
            acc = t if acc is None else acc + t
            offset += w
    return acc


def _sel(nby_t, tile_h, blk, mode, dtype=jnp.float32):
    r = lax.broadcasted_iota(jnp.int32, (nby_t, tile_h), 0)
    y = lax.broadcasted_iota(jnp.int32, (nby_t, tile_h), 1)
    s = (y // blk) == r if mode == "sum" else y == r * blk
    return s.astype(dtype)


def make_kernel(variant, tile_h, chunk):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    use_p16 = variant in ("M1", "M2")

    def kernel(ref_hbm, cur_ref, cost_out, idx_out,
               win_ref, s2_ref, row_ref, s2row_ref, qcur_ref,
               bc_ref, bi_ref, p_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()
        sel_sum = _sel(nby_t, tile_h, BLK, "sum")
        sel_pick = _sel(nby_t, tile_h, BLK, "pick")
        sel_sum16 = _sel(nby_t, tile_h, BLK, "sum", jnp.bfloat16)

        bc_ref[:] = jnp.full((nby_t, W), BIG, jnp.float32)
        bi_ref[:] = jnp.full((nby_t, W), SPAN * K + SPAN, jnp.int32)

        if variant == "NOP":
            copy_in.wait()
            cost_out[:] = bc_ref[:]
            idx_out[:] = bi_ref[:]
            return

        cur = cur_ref[:]
        if variant != "M2":
            qcur_ref[:] = _sliding_sums(
                jax.lax.dot(sel_sum, cur * cur,
                            precision=lax.Precision.HIGHEST), BLK, axis=1)
        copy_in.wait()
        if variant != "M2":
            win0 = win_ref[:]
            s2_ref[:] = _sliding_sums(
                _sliding_sums(win0 * win0, BLK, axis=0), BLK, axis=1)

        def fold(i, j, x):
            ssd = (qcur_ref[:] - x) + (s2row_ref[:, 0:W] - x)
            take = ssd < bc_ref[:]
            bc_ref[:] = jnp.where(take, ssd, bc_ref[:])
            bi_ref[:] = jnp.where(take, i * K + j, bi_ref[:])
            s2row_ref[:] = pltpu.roll(s2row_ref[:], halo_w - 1, 1)

        def dy_prologue(i):
            row_ref[:] = win_ref[0:tile_h, :]
            if variant != "M2":
                s2row_ref[:] = jax.lax.dot(
                    sel_pick, s2_ref[0:tile_h, :],
                    precision=lax.Precision.HIGHEST)

        def dy_epilogue(i):
            win_ref[:] = pltpu.roll(win_ref[:], halo_rows - 1, 0)
            if variant != "M2":
                s2_ref[:] = pltpu.roll(s2_ref[:], halo_rows - 1, 0)

        if variant in ("L0", "M3"):
            prec = (lax.Precision.HIGHEST if variant == "L0"
                    else lax.Precision.DEFAULT)

            def dy_body(i, _):
                dy_prologue(i)
                cur_v = cur_ref[:]
                for g, c0 in enumerate(range(0, K, chunk)):
                    n_t = min(chunk, K - c0)
                    half = (g % 2) * chunk * W
                    for t in range(n_t):
                        p_ref[:, half + t * W: half + (t + 1) * W] = (
                            cur_v * row_ref[:, 0:W])
                        row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                    x_all = _sliding_sums(
                        jax.lax.dot(sel_sum, p_ref[:, half: half + n_t * W],
                                    precision=prec),
                        BLK, axis=1)
                    for t in range(n_t):
                        fold(i, c0 + t, x_all[:, t * W:(t + 1) * W])
                dy_epilogue(i)
                return 0
        elif variant == "L1":
            def dy_body(i, _):
                dy_prologue(i)
                cur_v = cur_ref[:]
                for g, c0 in enumerate(range(0, K, chunk)):
                    n_t = min(chunk, K - c0)
                    half = (g % 2) * chunk * W
                    for t in range(n_t):
                        p_ref[:, half + t * W: half + (t + 1) * W] = (
                            cur_v * row_ref[:, 0:W])
                        row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                    x_all = p_ref[0:nby_t, half: half + n_t * W]
                    for t in range(n_t):
                        fold(i, c0 + t, x_all[:, t * W:(t + 1) * W])
                dy_epilogue(i)
                return 0
        elif variant == "M1":
            def dy_body(i, _):
                dy_prologue(i)
                cur_v = cur_ref[:]
                for g, c0 in enumerate(range(0, K, chunk)):
                    n_t = min(chunk, K - c0)
                    half = (g % 2) * chunk * (2 * W)
                    for t in range(n_t):
                        prod = cur_v * row_ref[:, 0:W]
                        hi16 = prod.astype(jnp.bfloat16)
                        lo16 = (prod - hi16.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        base = half + 2 * t * W
                        p_ref[:, base: base + W] = hi16
                        p_ref[:, base + W: base + 2 * W] = lo16
                        row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                    x2 = _sliding_sums(
                        jax.lax.dot(
                            sel_sum16,
                            p_ref[:, half: half + 2 * n_t * W],
                            preferred_element_type=jnp.float32),
                        BLK, axis=1)
                    for t in range(n_t):
                        base = 2 * t * W
                        fold(i, c0 + t,
                             x2[:, base: base + W]
                             + x2[:, base + W: base + 2 * W])
                dy_epilogue(i)
                return 0
        elif variant == "M2":
            def dy_body(i, _):
                dy_prologue(i)
                cur_v = cur_ref[:]
                for g, c0 in enumerate(range(0, K, chunk)):
                    n_t = min(chunk, K - c0)
                    half = (g % 2) * chunk * W
                    for t in range(n_t):
                        p_ref[:, half + t * W: half + (t + 1) * W] = (
                            jnp.abs(cur_v - row_ref[:, 0:W])
                            .astype(jnp.bfloat16))
                        row_ref[:] = pltpu.roll(row_ref[:], halo_w - 1, 1)
                    x_all = _sliding_sums(
                        jax.lax.dot(
                            sel_sum16, p_ref[:, half: half + n_t * W],
                            preferred_element_type=jnp.float32),
                        BLK, axis=1)
                    for t in range(n_t):
                        sad = x_all[:, t * W:(t + 1) * W]
                        take = sad < bc_ref[:]
                        bc_ref[:] = jnp.where(take, sad, bc_ref[:])
                        bi_ref[:] = jnp.where(take, i * K + c0 + t,
                                              bi_ref[:])
                dy_epilogue(i)
                return 0
        else:
            raise ValueError(variant)

        lax.fori_loop(0, K, dy_body, 0)
        cost_out[:] = bc_ref[:]
        idx_out[:] = bi_ref[:]

    return kernel, nby_t, halo_rows, halo_w, use_p16


@functools.partial(jax.jit, static_argnames=("variant", "tile_h", "chunk"))
def run_variant(cur_p, ref_p, *, variant, tile_h, chunk):
    kernel, nby_t, halo_rows, halo_w, use_p16 = make_kernel(
        variant, tile_h, chunk)
    n_stripes = H // tile_h
    p_cols = 2 * chunk * W * (2 if variant == "M1" else 1)
    p_dtype = jnp.bfloat16 if use_p16 else jnp.float32

    def call(cur_in):
        cost, idx = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H // BLK, W), jnp.float32),
                jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, halo_w), jnp.float32),
                pltpu.VMEM((nby_t, halo_w), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.int32),
                pltpu.VMEM((tile_h, p_cols), p_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        return jnp.sum(cost[:, ::BLK]) + jnp.sum(idx[:, ::BLK])

    def step(carry, _):
        # data-dependence on carry so CHAIN calls serialize on device
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=CHAIN)
    return last


def main():
    variants = sys.argv[1:] or ["NOP", "L0", "L1", "M1", "M2"]
    rng = np.random.default_rng(0)
    cur = rng.integers(0, 256, (H, W)).astype(np.float32)
    refr = rng.integers(0, 256, (H, W)).astype(np.float32)
    halo_w = _round_up(W + 2 * SPAN, 128)
    halo_row_pad = _round_up(2 * SPAN, 8)
    ref_p = np.zeros((H + halo_row_pad, halo_w), np.float32)
    ref_p[SPAN:SPAN + H, SPAN:SPAN + W] = refr
    cur_d = jax.device_put(jnp.asarray(cur))
    ref_d = jax.device_put(jnp.asarray(ref_p))
    jax.block_until_ready((cur_d, ref_d))
    REPS = 3
    for spec in variants:
        parts = spec.split(":")
        v = parts[0]
        tile_h = int(parts[1]) if len(parts) > 1 else 128
        chunk = int(parts[2]) if len(parts) > 2 else 5
        try:
            if v.startswith("P6"):
                fn = lambda: float(run_p6(cur_d, ref_d, tile_h=tile_h,
                                          bf16="B" in v))
            elif v.startswith("P7"):
                fn = lambda: float(run_p7(cur_d, ref_d, tile_h=tile_h,
                                          sad="S" in v))
            elif v.startswith("P5"):
                fn = lambda: float(run_p5(cur_d, ref_d, tile_h=tile_h,
                                          sad="S" in v, bf16="B" in v))
            elif v.startswith("P4"):
                fn = lambda: float(run_p4(cur_d, ref_d, tile_h=tile_h,
                                          sad=v == "P4S"))
            elif v.startswith("P3"):
                abl = ("nochain" if v == "P3A"
                       else "nofold" if v == "P3B" else None)
                fn = lambda: float(run_p3(cur_d, ref_d, tile_h=tile_h,
                                          sad=v == "P3S", ablate=abl))
            elif v.startswith("P"):
                fn = lambda: float(run_phase(cur_d, ref_d, variant=v,
                                             tile_h=tile_h))
            else:
                fn = lambda: float(run_variant(cur_d, ref_d, variant=v,
                                               tile_h=tile_h, chunk=chunk))
            t0 = time.perf_counter()
            chk = fn()
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn()
                ts.append((time.perf_counter() - t0) / CHAIN)
            ms = float(np.median(ts) * 1e3)
            print(f"{spec:14s} {ms:9.3f} ms  (compile {comp:5.1f}s, "
                  f"chk {chk:.8g})")
        except Exception as e:
            print(f"{spec:14s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")




# ---------------------------------------------------------------------------
# Phase-plane variants: no per-candidate matmul. cur and the halo band are
# restaged once per stripe into stride-BLK "phase planes" (one permutation
# matmul each); each candidate is then a BLK-term VPU FMA chain over
# [nby_t, W] tiles. dx is the outer loop: one cumulative lane roll of the
# phase buffers per dx serves all K dy candidates. Tie-break is an explicit
# lexicographic (cost, flat raster index) min.
# ---------------------------------------------------------------------------

def _perm(rows, cols, f):
    i = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    q = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (q == f(i)).astype(jnp.float32)


def make_phase_kernel(variant, tile_h):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN  # r + dy spans [0, BLK + 2*SPAN)
    sad = variant == "P1"

    def kernel(ref_hbm, cur_ref, cost_out, idx_out,
               win_ref, c_ref, e_ref, s2e_ref, qcur_ref,
               bc_ref, bi_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        sel_sum = _sel(nby_t, tile_h, BLK, "sum")
        # C planes: row r*nby_t + R = cur[R*BLK + r]
        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        # E planes: row p*nby_t + R = win[R*BLK + p]
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        # S2E planes: row dy*nby_t + R = s2[R*BLK + dy]
        ps2 = _perm(K * nby_t, halo_rows,
                    lambda i: (i % nby_t) * BLK + i // nby_t)

        cur = cur_ref[:]
        if not sad:
            qcur_ref[:] = _sliding_sums(
                jax.lax.dot(sel_sum, cur * cur,
                            precision=lax.Precision.HIGHEST), BLK, axis=1)
        c_ref[:] = jax.lax.dot(pc, cur, precision=lax.Precision.HIGHEST)
        bc_ref[:] = jnp.full((nby_t, W), BIG, jnp.float32)
        bi_ref[:] = jnp.full((nby_t, W), K * K, jnp.int32)

        copy_in.wait()
        win0 = win_ref[:]
        if not sad:
            s2val = _sliding_sums(
                _sliding_sums(win0 * win0, BLK, axis=0), BLK, axis=1)
            s2e_ref[:] = jax.lax.dot(ps2, s2val,
                                     precision=lax.Precision.HIGHEST)
        e_ref[:] = jax.lax.dot(pe, win0, precision=lax.Precision.HIGHEST)

        tl_y = y0 + lax.broadcasted_iota(jnp.int32, (nby_t, 1), 0) * BLK
        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            for dy in range(K):
                d_y = dy - SPAN
                ok_y = ((tl_y + d_y >= 0)
                        & (tl_y + d_y <= H - BLK))
                terms = []
                for r in range(BLK):
                    p = dy + r
                    cslab = c_ref[r * nby_t:(r + 1) * nby_t, :]
                    eslab = e_ref[p * nby_t:(p + 1) * nby_t, 0:W]
                    terms.append(
                        jnp.abs(cslab - eslab) if sad else cslab * eslab)
                w = functools.reduce(lambda a, b: a + b, terms)
                x = _sliding_sums(w, BLK, axis=1)
                if sad:
                    cost = x
                else:
                    cost = ((qcur_ref[:] - x)
                            + (s2e_ref[dy * nby_t:(dy + 1) * nby_t, 0:W]
                               - x))
                flat = dy * K + j
                cand = jnp.where(ok_y & ok_x, cost, BIG)
                bc = bc_ref[:]
                take = (cand < bc) | ((cand == bc) & (flat < bi_ref[:]))
                bc_ref[:] = jnp.where(take, cand, bc)
                bi_ref[:] = jnp.where(take, flat, bi_ref[:])
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            if not sad:
                s2e_ref[:] = pltpu.roll(s2e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        cost_out[:] = bc_ref[:]
        idx_out[:] = bi_ref[:]

    return kernel, nby_t, halo_rows, halo_w, n_phase


@functools.partial(jax.jit, static_argnames=("variant", "tile_h"))
def run_phase(cur_p, ref_p, *, variant, tile_h):
    kernel, nby_t, halo_rows, halo_w, n_phase = make_phase_kernel(
        variant, tile_h)
    n_stripes = H // tile_h

    def call(cur_in):
        cost, idx = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H // BLK, W), jnp.float32),
                jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), jnp.float32),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.float32),
                pltpu.VMEM((nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        return jnp.sum(cost[:, ::BLK]) + jnp.sum(idx[:, ::BLK])

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=CHAIN)
    return last




# ---------------------------------------------------------------------------
# P3: phase planes + dy-batched fold. Per dx: write all K dy-candidate
# row-sum slabs into one [K*nby_t, W] buffer, slide/SSD/mask in bulk, pack
# (cost, flat raster idx) into one exact int32 key (cost*K^2 + flat - 2^31;
# fits for blk 8 SSD and any SAD), then a static min-tree over the dy groups
# and a running min across dx. Decode (cost, idx) outside the kernel.
# ---------------------------------------------------------------------------

KEY_BIAS = -(2 ** 31)
I32_MAX = 2 ** 31 - 1


def make_p3_kernel(tile_h, sad=False, ablate=None):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN
    g = nby_t  # rows per dy group

    def kernel(ref_hbm, cur_ref, key_out,
               win_ref, c_ref, e_ref, s2e_ref, qcur_ref, w_ref,
               oky_ref, bk_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        sel_sum = _sel(nby_t, tile_h, BLK, "sum")
        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        ps2 = _perm(K * nby_t, halo_rows,
                    lambda i: (i % nby_t) * BLK + i // nby_t)

        cur = cur_ref[:]
        if not sad:
            # qcur tiled per dy group: [K*nby_t, W], row dy*g+R = qcur[R]
            pq = _perm(K * nby_t, nby_t, lambda i: i % nby_t)
            qc = _sliding_sums(
                jax.lax.dot(sel_sum, cur * cur,
                            precision=lax.Precision.HIGHEST), BLK, axis=1)
            qcur_ref[:] = jax.lax.dot(pq, qc,
                                      precision=lax.Precision.HIGHEST)
        c_ref[:] = jax.lax.dot(pc, cur, precision=lax.Precision.HIGHEST)
        bk_ref[:] = jnp.full((nby_t, W), I32_MAX, jnp.int32)

        # ok_y per (dy, R): [K*nby_t, 1]; flat base dy*K per row.
        row = lax.broadcasted_iota(jnp.int32, (K * nby_t, 1), 0)
        dyv = row // g
        tly = y0 + (row % g) * BLK
        oky_ref[:] = jnp.where(
            (tly + dyv - SPAN >= 0) & (tly + dyv - SPAN <= H - BLK),
            dyv * K + KEY_BIAS, I32_MAX)

        copy_in.wait()
        win0 = win_ref[:]
        if not sad:
            s2val = _sliding_sums(
                _sliding_sums(win0 * win0, BLK, axis=0), BLK, axis=1)
            s2e_ref[:] = jax.lax.dot(ps2, s2val,
                                     precision=lax.Precision.HIGHEST)
        e_ref[:] = jax.lax.dot(pe, win0, precision=lax.Precision.HIGHEST)

        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            if ablate == "nochain":
                w_ref[0:g, :] = c_ref[0:nby_t, :] * e_ref[0:nby_t, 0:W]
            else:
                for dy in range(K):
                    terms = []
                    for r in range(BLK):
                        p = dy + r
                        cs = c_ref[r * nby_t:(r + 1) * nby_t, :]
                        es = e_ref[p * nby_t:(p + 1) * nby_t, 0:W]
                        terms.append(jnp.abs(cs - es) if sad else cs * es)
                    w_ref[dy * g:(dy + 1) * g, :] = functools.reduce(
                        lambda a, b: a + b, terms)
            if ablate == "nofold":
                bk_ref[:] = jnp.minimum(
                    bk_ref[:], w_ref[0:g, :].astype(jnp.int32))
                e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
                if not sad:
                    s2e_ref[:] = pltpu.roll(s2e_ref[:], halo_w - 1, 1)
                return 0
            x = _sliding_sums(w_ref[:], BLK, axis=1)
            if sad:
                cost = x
            else:
                cost = (qcur_ref[:] + s2e_ref[:, 0:W]) - (x + x)
            # key = cost*K^2 + dy*K + j + BIAS; invalid -> I32_MAX
            key = cost.astype(jnp.int32) * (K * K) + (oky_ref[:] + j)
            key = jnp.where(ok_x & (oky_ref[:] != I32_MAX), key, I32_MAX)
            # min over the K dy groups: 25 = 12+12+1 static tree
            t = jnp.minimum(key[0:12 * g, :], key[12 * g:24 * g, :])
            t = jnp.minimum(t[0:6 * g, :], t[6 * g:12 * g, :])
            t = jnp.minimum(t[0:3 * g, :], t[3 * g:6 * g, :])
            t = jnp.minimum(
                jnp.minimum(t[0:g, :], t[g:2 * g, :]),
                jnp.minimum(t[2 * g:3 * g, :], key[24 * g:25 * g, :]))
            bk_ref[:] = jnp.minimum(bk_ref[:], t)
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            if not sad:
                s2e_ref[:] = pltpu.roll(s2e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        key_out[:] = bk_ref[:]

    return kernel, nby_t, halo_rows, halo_w, n_phase


@functools.partial(jax.jit, static_argnames=("tile_h", "sad", "nchain", "ablate"))
def run_p3(cur_p, ref_p, *, tile_h, sad=False, nchain=CHAIN, ablate=None):
    kernel, nby_t, halo_rows, halo_w, n_phase = make_p3_kernel(tile_h, sad, ablate)
    n_stripes = H // tile_h

    def call(cur_in):
        key = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), jnp.float32),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((K * nby_t, 1), jnp.int32),
                pltpu.VMEM((nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        ku = key[:, ::BLK].astype(jnp.int64) - KEY_BIAS
        cost = (ku // (K * K)).astype(jnp.float32)
        idx = (ku % (K * K)).astype(jnp.int32)
        return jnp.sum(cost) + jnp.sum(idx)

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=nchain)
    return last




# ---------------------------------------------------------------------------
# P4: diff-form phase kernel. SSD = slide(sum_r (C_r - E_{r+dy})^2) computed
# directly — no Qcur/Qref/s2e at all. Unified with SAD (abs instead of
# square). Running min per (dy,lane) across dx; one min-tree per stripe.
# ---------------------------------------------------------------------------

def make_p4_kernel(tile_h, sad=False):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN
    g = nby_t
    KK = K * K

    def kernel(ref_hbm, cur_ref, key_out,
               win_ref, c_ref, e_ref, w_ref, oky_ref, bk2_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        c_ref[:] = jax.lax.dot(pc, cur_ref[:],
                               precision=lax.Precision.HIGHEST)
        bk2_ref[:] = jnp.full((K * nby_t, W), I32_MAX, jnp.int32)

        row = lax.broadcasted_iota(jnp.int32, (K * nby_t, 1), 0)
        dyv = row // g
        tly = y0 + (row % g) * BLK
        oky_ref[:] = jnp.where(
            (tly + dyv - SPAN >= 0) & (tly + dyv - SPAN <= H - BLK),
            dyv * K + KEY_BIAS, I32_MAX)

        copy_in.wait()
        e_ref[:] = jax.lax.dot(pe, win_ref[:],
                               precision=lax.Precision.HIGHEST)

        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            for dy in range(K):
                terms = []
                for r in range(BLK):
                    p = dy + r
                    d = (c_ref[r * nby_t:(r + 1) * nby_t, :]
                         - e_ref[p * nby_t:(p + 1) * nby_t, 0:W])
                    terms.append(jnp.abs(d) if sad else d * d)
                w_ref[dy * g:(dy + 1) * g, :] = functools.reduce(
                    lambda a, b: a + b, terms)
            x = _sliding_sums(w_ref[:], BLK, axis=1)
            key = x.astype(jnp.int32) * KK + (oky_ref[:] + j)
            key = jnp.where(ok_x & (oky_ref[:] != I32_MAX), key, I32_MAX)
            bk2_ref[:] = jnp.minimum(bk2_ref[:], key)
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        k2 = bk2_ref[:]
        t = jnp.minimum(k2[0:12 * g, :], k2[12 * g:24 * g, :])
        t = jnp.minimum(t[0:6 * g, :], t[6 * g:12 * g, :])
        t = jnp.minimum(t[0:3 * g, :], t[3 * g:6 * g, :])
        key_out[:] = jnp.minimum(
            jnp.minimum(t[0:g, :], t[g:2 * g, :]),
            jnp.minimum(t[2 * g:3 * g, :], k2[24 * g:25 * g, :]))

    return kernel, nby_t, halo_rows, halo_w, n_phase


@functools.partial(jax.jit, static_argnames=("tile_h", "sad", "nchain"))
def run_p4(cur_p, ref_p, *, tile_h, sad=False, nchain=CHAIN):
    kernel, nby_t, halo_rows, halo_w, n_phase = make_p4_kernel(tile_h, sad)
    n_stripes = H // tile_h

    def call(cur_in):
        key = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), jnp.float32),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((K * nby_t, 1), jnp.int32),
                pltpu.VMEM((K * nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        kk = key[:, ::BLK]
        flat = (kk % (K * K) + (2 ** 31) % (K * K)) % (K * K)
        cost = (kk - flat + (2 ** 31) % (K * K)) // (K * K) + (
            2 ** 31) // (K * K)
        return jnp.sum(cost.astype(jnp.float32)) + jnp.sum(flat)

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=nchain)
    return last




# ---------------------------------------------------------------------------
# P5: no W scratch (per-dy value-form slide/key/min into a [K*nby_t, W]
# running-min buffer), tile_h=128 (nby_t=16 => slabs align to bf16 tiles),
# optional bf16 phase planes (pixels are bf16-exact; halves chain reads).
# ---------------------------------------------------------------------------

def make_p5_kernel(tile_h, sad=False, bf16=False):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN
    g = nby_t
    KK = K * K
    pdt = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(ref_hbm, cur_ref, key_out,
               win_ref, c_ref, e_ref, oky_ref, bk2_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        c_ref[:] = jax.lax.dot(
            pc, cur_ref[:], precision=lax.Precision.HIGHEST).astype(pdt)
        bk2_ref[:] = jnp.full((K * nby_t, W), I32_MAX, jnp.int32)

        row = lax.broadcasted_iota(jnp.int32, (K * nby_t, 1), 0)
        dyv = row // g
        tly = y0 + (row % g) * BLK
        oky_ref[:] = jnp.where(
            (tly + dyv - SPAN >= 0) & (tly + dyv - SPAN <= H - BLK),
            dyv * K + KEY_BIAS, I32_MAX)

        copy_in.wait()
        e_ref[:] = jax.lax.dot(
            pe, win_ref[:], precision=lax.Precision.HIGHEST).astype(pdt)

        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            for dy in range(K):
                terms = []
                for r in range(BLK):
                    p = dy + r
                    cs = c_ref[r * nby_t:(r + 1) * nby_t, :].astype(
                        jnp.float32)
                    es = e_ref[p * nby_t:(p + 1) * nby_t, 0:W].astype(
                        jnp.float32)
                    d = cs - es
                    terms.append(jnp.abs(d) if sad else d * d)
                w = functools.reduce(lambda a, b: a + b, terms)
                x = _sliding_sums(w, BLK, axis=1)
                sl = slice(dy * g, (dy + 1) * g)
                key = (x.astype(jnp.int32) * KK
                       + (oky_ref[sl, :] + j))
                key = jnp.where(ok_x & (oky_ref[sl, :] != I32_MAX),
                                key, I32_MAX)
                bk2_ref[sl, :] = jnp.minimum(bk2_ref[sl, :], key)
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        k2 = bk2_ref[:]
        t = jnp.minimum(k2[0:12 * g, :], k2[12 * g:24 * g, :])
        t = jnp.minimum(t[0:6 * g, :], t[6 * g:12 * g, :])
        t = jnp.minimum(t[0:3 * g, :], t[3 * g:6 * g, :])
        key_out[:] = jnp.minimum(
            jnp.minimum(t[0:g, :], t[g:2 * g, :]),
            jnp.minimum(t[2 * g:3 * g, :], k2[24 * g:25 * g, :]))

    return kernel, nby_t, halo_rows, halo_w, n_phase, pdt


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "sad", "bf16", "nchain"))
def run_p5(cur_p, ref_p, *, tile_h, sad=False, bf16=False, nchain=CHAIN):
    kernel, nby_t, halo_rows, halo_w, n_phase, pdt = make_p5_kernel(
        tile_h, sad, bf16)
    n_stripes = H // tile_h

    def call(cur_in):
        key = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), pdt),
                pltpu.VMEM((n_phase * nby_t, halo_w), pdt),
                pltpu.VMEM((K * nby_t, 1), jnp.int32),
                pltpu.VMEM((K * nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        kk = key[:, ::BLK]
        flat = (kk % (K * K) + (2 ** 31) % (K * K)) % (K * K)
        cost = (kk - flat + (2 ** 31) % (K * K)) // (K * K) + (
            2 ** 31) // (K * K)
        return jnp.sum(cost.astype(jnp.float32)) + jnp.sum(flat)

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=nchain)
    return last


# ---------------------------------------------------------------------------
# P6: cross-term phase kernel. SSD = (Qcur - X) + (S2E - X) with
# X = slide(sum_r C_r * E_{r+dy}) — the chain is b mul+add (FMA-fusable)
# terms instead of P4's b sub+square+add, at the price of the hoisted
# Qcur/S2E buffers and one extra [K*g, halo_w] roll per dx. P6B stages
# bf16 copies of the (f32-rolled) C/E planes once per dx to halve the
# chain's VMEM read traffic (bf16 is exact for pixels <= 255; Mosaic
# cannot roll bf16 on v5e, hence the stage-from-f32 dance).
# ---------------------------------------------------------------------------

def make_p6_kernel(tile_h, bf16=False):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN
    g = nby_t
    KK = K * K

    def kernel(ref_hbm, cur_ref, key_out,
               win_ref, c_ref, e_ref, s2e_ref, qcur_ref,
               c16_ref, e16_ref, w_ref, oky_ref, bk2_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        sel_sum = _sel(nby_t, tile_h, BLK, "sum")
        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        ps2 = _perm(K * nby_t, halo_rows,
                    lambda i: (i % nby_t) * BLK + i // nby_t)
        pq = _perm(K * nby_t, nby_t, lambda i: i % nby_t)

        cur = cur_ref[:]
        qc = _sliding_sums(
            jax.lax.dot(sel_sum, cur * cur,
                        precision=lax.Precision.HIGHEST), BLK, axis=1)
        qcur_ref[:] = jax.lax.dot(pq, qc, precision=lax.Precision.HIGHEST)
        c_ref[:] = jax.lax.dot(pc, cur, precision=lax.Precision.HIGHEST)
        if bf16:
            c16_ref[:] = c_ref[:].astype(jnp.bfloat16)
        bk2_ref[:] = jnp.full((K * nby_t, W), I32_MAX, jnp.int32)

        row = lax.broadcasted_iota(jnp.int32, (K * nby_t, 1), 0)
        dyv = row // g
        tly = y0 + (row % g) * BLK
        oky_ref[:] = jnp.where(
            (tly + dyv - SPAN >= 0) & (tly + dyv - SPAN <= H - BLK),
            dyv * K + KEY_BIAS, I32_MAX)

        copy_in.wait()
        win0 = win_ref[:]
        s2val = _sliding_sums(
            _sliding_sums(win0 * win0, BLK, axis=0), BLK, axis=1)
        s2e_ref[:] = jax.lax.dot(ps2, s2val,
                                 precision=lax.Precision.HIGHEST)
        e_ref[:] = jax.lax.dot(pe, win0, precision=lax.Precision.HIGHEST)

        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            if bf16:
                e16_ref[:] = e_ref[:].astype(jnp.bfloat16)
            for dy in range(K):
                acc = None
                for r in range(BLK):
                    p = dy + r
                    if bf16:
                        cs = c16_ref[r * g:(r + 1) * g, :].astype(
                            jnp.float32)
                        es = e16_ref[p * g:(p + 1) * g, 0:W].astype(
                            jnp.float32)
                    else:
                        cs = c_ref[r * g:(r + 1) * g, :]
                        es = e_ref[p * g:(p + 1) * g, 0:W]
                    t = cs * es
                    acc = t if acc is None else acc + t
                w_ref[dy * g:(dy + 1) * g, :] = acc
            x = _sliding_sums(w_ref[:], BLK, axis=1)
            ssd = (qcur_ref[:] - x) + (s2e_ref[:, 0:W] - x)
            key = ssd.astype(jnp.int32) * KK + (oky_ref[:] + j)
            key = jnp.where(ok_x & (oky_ref[:] != I32_MAX), key, I32_MAX)
            bk2_ref[:] = jnp.minimum(bk2_ref[:], key)
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            s2e_ref[:] = pltpu.roll(s2e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        k2 = bk2_ref[:]
        t = jnp.minimum(k2[0:12 * g, :], k2[12 * g:24 * g, :])
        t = jnp.minimum(t[0:6 * g, :], t[6 * g:12 * g, :])
        t = jnp.minimum(t[0:3 * g, :], t[3 * g:6 * g, :])
        key_out[:] = jnp.minimum(
            jnp.minimum(t[0:g, :], t[g:2 * g, :]),
            jnp.minimum(t[2 * g:3 * g, :], k2[24 * g:25 * g, :]))

    return kernel, nby_t, halo_rows, halo_w, n_phase


@functools.partial(jax.jit, static_argnames=("tile_h", "bf16", "nchain"))
def run_p6(cur_p, ref_p, *, tile_h, bf16=False, nchain=CHAIN):
    kernel, nby_t, halo_rows, halo_w, n_phase = make_p6_kernel(tile_h, bf16)
    n_stripes = H // tile_h

    def call(cur_in):
        key = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), jnp.float32),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((tile_h, W) if bf16 else (16, 128),
                           jnp.bfloat16),
                pltpu.VMEM((n_phase * nby_t, halo_w) if bf16
                           else (16, 128), jnp.bfloat16),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((K * nby_t, 1), jnp.int32),
                pltpu.VMEM((K * nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        kk = key[:, ::BLK]
        flat = (kk % (K * K) + (2 ** 31) % (K * K)) % (K * K)
        cost = (kk - flat + (2 ** 31) % (K * K)) // (K * K) + (
            2 ** 31) // (K * K)
        return jnp.sum(cost.astype(jnp.float32)) + jnp.sum(flat)

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=nchain)
    return last


# ---------------------------------------------------------------------------
# P7: P4's diff form with bf16-staged phase planes (stage from the f32
# rolled buffers once per dx, as in P6B) — isolates the VMEM-read-traffic
# effect on the diff chain.
# ---------------------------------------------------------------------------

def make_p7_kernel(tile_h, sad=False):
    nby_t = tile_h // BLK
    halo_rows = _round_up(tile_h + 2 * SPAN, 8)
    halo_w = _round_up(W + 2 * SPAN, 128)
    n_phase = BLK + 2 * SPAN
    g = nby_t
    KK = K * K

    def kernel(ref_hbm, cur_ref, key_out,
               win_ref, c16_ref, e_ref, e16_ref, w_ref,
               oky_ref, bk2_ref, in_sem):
        y0 = pl.program_id(0) * tile_h
        copy_in = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, halo_rows), :], win_ref, in_sem)
        copy_in.start()

        pc = _perm(tile_h, tile_h,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        pe = _perm(n_phase * nby_t, halo_rows,
                   lambda i: (i % nby_t) * BLK + i // nby_t)
        c16_ref[:] = jax.lax.dot(
            pc, cur_ref[:], precision=lax.Precision.HIGHEST
        ).astype(jnp.bfloat16)
        bk2_ref[:] = jnp.full((K * nby_t, W), I32_MAX, jnp.int32)

        row = lax.broadcasted_iota(jnp.int32, (K * nby_t, 1), 0)
        dyv = row // g
        tly = y0 + (row % g) * BLK
        oky_ref[:] = jnp.where(
            (tly + dyv - SPAN >= 0) & (tly + dyv - SPAN <= H - BLK),
            dyv * K + KEY_BIAS, I32_MAX)

        copy_in.wait()
        e_ref[:] = jax.lax.dot(pe, win_ref[:],
                               precision=lax.Precision.HIGHEST)

        tl_x = lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def dx_body(j, _):
            d_x = j - SPAN
            ok_x = (tl_x + d_x >= 0) & (tl_x + d_x <= W - BLK)
            e16_ref[:] = e_ref[:].astype(jnp.bfloat16)
            for dy in range(K):
                acc = None
                for r in range(BLK):
                    p = dy + r
                    d = (c16_ref[r * g:(r + 1) * g, :].astype(jnp.float32)
                         - e16_ref[p * g:(p + 1) * g, 0:W].astype(
                             jnp.float32))
                    t = jnp.abs(d) if sad else d * d
                    acc = t if acc is None else acc + t
                w_ref[dy * g:(dy + 1) * g, :] = acc
            x = _sliding_sums(w_ref[:], BLK, axis=1)
            key = x.astype(jnp.int32) * KK + (oky_ref[:] + j)
            key = jnp.where(ok_x & (oky_ref[:] != I32_MAX), key, I32_MAX)
            bk2_ref[:] = jnp.minimum(bk2_ref[:], key)
            e_ref[:] = pltpu.roll(e_ref[:], halo_w - 1, 1)
            return 0

        lax.fori_loop(0, K, dx_body, 0)
        k2 = bk2_ref[:]
        t = jnp.minimum(k2[0:12 * g, :], k2[12 * g:24 * g, :])
        t = jnp.minimum(t[0:6 * g, :], t[6 * g:12 * g, :])
        t = jnp.minimum(t[0:3 * g, :], t[3 * g:6 * g, :])
        key_out[:] = jnp.minimum(
            jnp.minimum(t[0:g, :], t[g:2 * g, :]),
            jnp.minimum(t[2 * g:3 * g, :], k2[24 * g:25 * g, :]))

    return kernel, nby_t, halo_rows, halo_w, n_phase


@functools.partial(jax.jit, static_argnames=("tile_h", "sad", "nchain"))
def run_p7(cur_p, ref_p, *, tile_h, sad=False, nchain=CHAIN):
    kernel, nby_t, halo_rows, halo_w, n_phase = make_p7_kernel(tile_h, sad)
    n_stripes = H // tile_h

    def call(cur_in):
        key = pl.pallas_call(
            kernel,
            grid=(n_stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tile_h, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nby_t, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // BLK, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((halo_rows, halo_w), jnp.float32),
                pltpu.VMEM((tile_h, W), jnp.bfloat16),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.float32),
                pltpu.VMEM((n_phase * nby_t, halo_w), jnp.bfloat16),
                pltpu.VMEM((K * nby_t, W), jnp.float32),
                pltpu.VMEM((K * nby_t, 1), jnp.int32),
                pltpu.VMEM((K * nby_t, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ref_p, cur_in)
        kk = key[:, ::BLK]
        flat = (kk % (K * K) + (2 ** 31) % (K * K)) % (K * K)
        cost = (kk - flat + (2 ** 31) % (K * K)) // (K * K) + (
            2 ** 31) // (K * K)
        return jnp.sum(cost.astype(jnp.float32)) + jnp.sum(flat)

    def step(carry, _):
        out = call(cur_p + (carry - carry))
        return out, out

    last, _ = lax.scan(step, jnp.float32(0), None, length=nchain)
    return last


if __name__ == "__main__":
    main()
