"""Halo exchange of reference-frame borders between mesh neighbours.

Each spatial shard searches a ±span window around its blocks, so it needs
`span` pixels of the *reference* frame beyond every tile edge — exactly the
window-dependency footprint defined by the reference's clamped search
window (/root/reference/src/cpu/main.c:73-76). The exchange is two
`lax.ppermute` sweeps over ICI:

  1. horizontal: each shard sends its left/right `span`-wide edge strips to
     its lane neighbours → tile widens to [h, w + 2*span];
  2. vertical: the *widened* rows are exchanged up/down → corners arrive
     transitively, no separate diagonal step.

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


def _shift_from_lower(x, axis_name: str, n: int):
    """Each shard receives x from its lower neighbour (index-1); shard 0
    receives zeros."""
    if n == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])


def _shift_from_upper(x, axis_name: str, n: int):
    """Each shard receives x from its upper neighbour (index+1); the last
    shard receives zeros."""
    if n == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name, [(i + 1, i) for i in range(n - 1)])


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
    data (zeros beyond the frame). Call inside shard_map."""
    if span == 0:
        return local
    h, w = local.shape
    # Horizontal sweep: edge strips travel along "tx".
    from_left = _shift_from_lower(local[:, w - span:], tx_axis, tx_size)
    from_right = _shift_from_upper(local[:, :span], tx_axis, tx_size)
    wide = jnp.concatenate([from_left, local, from_right], axis=1)
    # Vertical sweep on the widened tile: corners arrive transitively.
    from_top = _shift_from_lower(wide[h - span:, :], ty_axis, ty_size)
    from_bottom = _shift_from_upper(wide[:span, :], ty_axis, ty_size)
    return jnp.concatenate([from_top, wide, from_bottom], axis=0)
