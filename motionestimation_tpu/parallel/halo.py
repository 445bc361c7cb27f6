"""Halo exchange of reference-frame borders between mesh neighbours.

Each spatial shard searches a ±span window around its blocks, so it needs
`span` pixels of the *reference* frame beyond every tile edge — exactly the
window-dependency footprint defined by the reference's clamped search
window (/root/reference/src/cpu/main.c:73-76). The exchange is two
`lax.ppermute` sweeps over ICI:

  1. horizontal: strips travel along "tx" → tile widens to [h, w + 2*span];
  2. vertical: the *widened* rows are exchanged along "ty" → corners arrive
     transitively, no separate diagonal step.

When span exceeds the neighbour tile size, the halo spans multiple shards:
hop k (a ppermute with shift k) contributes the slice of the k-th
neighbour that intersects the halo, so any span up to the full frame works.

Shards at the frame boundary have no neighbour; non-wrapping ppermute
permutations deliver zeros there, which is exactly the zero padding the
single-chip path uses (never read by a valid candidate). This makes the
sharded ref-halo construction bit-identical to
search.full_search.make_ref_halo, which is what makes sharded == unsharded
an exact invariant.

Must be called inside shard_map with the named axes in scope.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from motionestimation_tpu.core.geometry import cdiv


def _from_lower(x, axis_name: str, n: int, hop: int):
    """Each shard receives x from the neighbour `hop` below (index-hop);
    the first `hop` shards receive zeros (non-wrapping)."""
    if hop >= n:
        return jnp.zeros_like(x)
    return lax.ppermute(
        x, axis_name, [(i, i + hop) for i in range(n - hop)]
    )


def _from_upper(x, axis_name: str, n: int, hop: int):
    """Each shard receives x from the neighbour `hop` above (index+hop);
    the last `hop` shards receive zeros."""
    if hop >= n:
        return jnp.zeros_like(x)
    return lax.ppermute(
        x, axis_name, [(i + hop, i) for i in range(n - hop)]
    )


def _halo_1d(local, span: int, axis: int, axis_name: str, n: int):
    """Extend `local` by span on both ends of `axis` with neighbour data.

    Hop k carries the slice of the k-th neighbour's tile that overlaps the
    halo: the k-th nearest `min(size, span - (k-1)*size)` rows/cols.
    """
    size = local.shape[axis]
    hops = cdiv(span, size)

    def take(x, start, stop):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, stop)
        return x[tuple(idx)]

    before, after = [], []
    for k in range(hops, 0, -1):
        width = min(size, span - (k - 1) * size)
        before.append(
            _from_lower(take(local, size - width, size), axis_name, n, k)
        )
        after.insert(
            0, _from_upper(take(local, 0, width), axis_name, n, k)
        )
    return jnp.concatenate(before + [local] + after, axis=axis)


def halo_exchange_2d(
    local,
    span: int,
    *,
    ty_axis: str = "ty",
    tx_axis: str = "tx",
    ty_size: int,
    tx_size: int,
):
    """Widen a local [h, w] tile to [h + 2*span, w + 2*span] with neighbour
    data (zeros beyond the frame). Call inside shard_map. Works for any
    span, including halos wider than the neighbour tile (multi-hop)."""
    if span == 0:
        return local
    wide = _halo_1d(local, span, axis=1, axis_name=tx_axis, n=tx_size)
    return _halo_1d(wide, span, axis=0, axis_name=ty_axis, n=ty_size)
