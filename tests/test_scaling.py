"""Scaling-efficiency model: halo-byte accounting + BASELINE >=90% claim.

Hardware for 1 -> N chips is unavailable (single-chip environment), so
the model in parallel/scaling.py is the evidence for the BASELINE
scaling target; these tests pin the byte accounting to the actual
halo_exchange_2d arrays and assert the predicted efficiencies.
"""
import numpy as np
import pytest

from motionestimation_tpu.parallel import scaling


def test_halo_bytes_match_exchange_arrays():
    """The model's byte count equals the sizes of the slices
    halo_exchange_2d actually ppermutes (one interior chip, both
    sweeps), including the multi-hop case span > tile."""

    def expected(h, w, span, ty, tx):
        tile_h, tile_w = h // ty, w // tx
        total = 0
        if tx > 1:
            rem = span
            while rem > 0:  # hop widths: tile_w, tile_w, ..., remainder
                width = min(tile_w, rem)
                total += 2 * tile_h * width * 4
                rem -= width
        if ty > 1:
            wide_w = tile_w + (2 * span if tx > 1 else 0)
            rem = span
            while rem > 0:
                width = min(tile_h, rem)
                total += 2 * width * wide_w * 4
                rem -= width
        return total

    for h, w, span, ty, tx in [
        (2160, 3840, 12, 2, 4),
        (2160, 3840, 31, 2, 4),
        (64, 64, 12, 2, 2),     # span > tile/2
        (64, 64, 40, 4, 4),     # span > tile: multi-hop
        (2160, 3840, 12, 1, 8),  # 1-D mesh: no vertical sweep
    ]:
        got = scaling.halo_bytes_per_chip(h, w, span, ty, tx)
        assert got == expected(h, w, span, ty, tx), (h, w, span, ty, tx)


def test_scaling_efficiency_4k_exceeds_90pct():
    """BASELINE north star: >=90% frames/s scaling efficiency from 1 to
    N>=2 hosts at 4K. Modeled with the round-2 measured single-chip rate
    (11.7 M blocks/s, BENCH_r02.json) — conservative (round 3 is faster).

    Hosts scale over the dp (GOP batch) axis — the run_gop_sharded
    layout, with no cross-host halo — so the claim holds with large
    margin; the within-host spatial mesh also stays >=90%."""
    host_effs = scaling.gop_scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        n_hosts=[2, 4, 8, 16], measured_mblocks_per_s=11.7,
    )
    for n, e in host_effs.items():
        assert e >= 0.90, (n, e)

    # Within one host (spatial tiling over ICI): every mesh >= 90% too.
    effs = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        meshes=[(1, 2), (2, 2), (2, 4)],
        measured_mblocks_per_s=11.7,
    )
    for n, e in effs.items():
        assert e >= 0.90, (n, e)

    # Pessimistic mode — ONE frame spread spatially across hosts so the
    # halo rides DCN: still >= 85% at 16/32 chips; documented, not the
    # deployment layout.
    cross = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        meshes=[(4, 4), (4, 8)],
        measured_mblocks_per_s=11.7,
    )
    assert cross[16] >= 0.85
    assert cross[32] >= 0.75


def test_scaling_efficiency_monotone_costs():
    """Sanity: communication time grows with span and the model never
    reports >100% efficiency."""
    e_small = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=4,
        meshes=[(2, 4)], measured_mblocks_per_s=11.7,
    )[8]
    e_big = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=31,
        meshes=[(2, 4)], measured_mblocks_per_s=11.7,
    )[8]
    assert 0 < e_big <= e_small <= 1.0

    m4 = scaling.model_step(
        frame_height=2160, frame_width=3840, blk_dim=8, span=4,
        ty=2, tx=4, measured_mblocks_per_s=11.7,
    )
    m31 = scaling.model_step(
        frame_height=2160, frame_width=3840, blk_dim=8, span=31,
        ty=2, tx=4, measured_mblocks_per_s=11.7,
    )
    assert m31.halo_bytes > m4.halo_bytes
    assert not m4.crosses_hosts
    big = scaling.model_step(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        ty=4, tx=4, measured_mblocks_per_s=11.7,
    )
    assert big.crosses_hosts


def test_gop_ingest_term():
    """The end-to-end GOP model charges per-host ingest at the measured
    rate, pipelined with compute: per-pair time = max(ingest, step+sync)
    (round-4; verdict item 7)."""
    kw = dict(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        n_hosts=[1, 16], measured_mblocks_per_s=14.41,
    )
    base = scaling.model_step(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        ty=2, tx=4, measured_mblocks_per_s=14.41,
    )
    sync16 = 2 * scaling.DCN_LATENCY_S * (15).bit_length()
    # Transport-bound host (this environment's tunnel): ingest hides the
    # sync entirely — efficiency flat at 1.0, absolute rate = link's.
    slow = scaling.gop_scaling_efficiency(**kw, host_ingest_mb_s=57.7)
    ingest_slow = 2160 * 3840 / (57.7 * 1e6)
    assert ingest_slow > base.step_s + sync16
    assert slow[16] == 1.0
    # Ingest between step and step+sync: partial hiding, efficiency
    # strictly between the kernel-bound value and 1.0.
    mid_rate = 2160 * 3840 / ((base.step_s + sync16 / 2) * 1e6)
    kernel_bound = scaling.gop_scaling_efficiency(**kw)
    mid = scaling.gop_scaling_efficiency(**kw, host_ingest_mb_s=mid_rate)
    assert kernel_bound[16] < mid[16] < 1.0
    # Exact arithmetic of the pinned term.
    ingest_mid = 2160 * 3840 / (mid_rate * 1e6)
    assert mid[16] == pytest.approx(
        max(ingest_mid, base.step_s)
        / max(ingest_mid, base.step_s + sync16)
    )
    # No ingest arg == compute-bound deployment (backwards compatible).
    assert kernel_bound[1] == 1.0


def test_spatial_16_chip_efficiency_target():
    """Per-link charging (host-boundary direction at DCN, rest at ICI)
    puts the 4x4 spatial mesh at >= 90% (round-4; was 84.5% under
    blanket-DCN charging)."""
    s = scaling.scaling_efficiency(
        frame_height=2160, frame_width=3840, blk_dim=8, span=12,
        meshes=[(4, 4)], measured_mblocks_per_s=14.41,
    )
    assert s[16] >= 0.90


def test_host_orientation_agnostic():
    """(4,2) and (2,4) 8-chip meshes both fit one 2x4 host board: the
    model must not charge DCN for the transposed orientation (round-4
    review)."""
    for ty, tx in ((2, 4), (4, 2), (1, 8), (8, 1)):
        m = scaling.model_step(
            frame_height=2160, frame_width=3840, blk_dim=8, span=12,
            ty=ty, tx=tx, measured_mblocks_per_s=14.41,
        )
        assert not m.crosses_hosts, (ty, tx)
