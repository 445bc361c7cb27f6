"""Sharded host->HBM frame ingest for multi-chip / multi-host runs.

The reference stages frames with pinned-host cudaMemcpy on one GPU
(/root/reference/src/gpu/main_mse.cu:168-169,202-207). The TPU-native
equivalent feeds the ("dp", "ty", "tx") mesh directly:

* single host, many chips: `device_put` with a NamedSharding so each chip
  receives only its frame tile (no full-frame replication before
  shard_map);
* many hosts: `jax.distributed.initialize` +
  `jax.make_array_from_process_local_data` — each host reads only the
  frame rows its mesh row owns and contributes its local shard over DCN;
* GOP pipelining: `ShardedPrefetcher` keeps the next frame pair's
  transfers in flight while the current pair computes (the analogue of
  pinned-memory double buffering).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise multi-host JAX (no-op if already initialised or single
    process). Call once per host before building the mesh."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a [B, H, W] frame batch over ("dp", "ty", "tx")."""
    return NamedSharding(mesh, P("dp", "ty", "tx"))


def put_frame_batch(batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Stage a process-local [B, Hp, Wp] batch onto the mesh.

    Dims must already be padded to mesh-divisible sizes
    (sharded.padded_dims_for_mesh). On a single process this is a sharded
    device_put (each chip gets its tile); under multi-host it assembles
    the global array from per-process shards — `batch` must then hold
    exactly this process's rows of the global array, in process-local
    layout (make_array_from_process_local_data contract).
    """
    sharding = frame_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(batch), sharding)
    return jax.make_array_from_process_local_data(sharding, batch)


def local_row_range(mesh: Mesh, frame_rows: int) -> tuple[int, int]:
    """[start, end) of the global frame rows this process must provide
    (multi-host ingest: each host reads only its rows from disk).

    Assumes the "ty" axis is the slowest-varying axis across processes
    for the row dimension; on one process this is the whole frame.
    """
    if jax.process_count() == 1:
        return 0, frame_rows
    # Rows covered by this process's addressable shards: derive from the
    # index map of a row-only sharding (a full (dp, ty, tx) spec would
    # demand the probe shape divide the tx axis too).
    sharding = NamedSharding(mesh, P(None, "ty"))
    lo, hi = frame_rows, 0
    for d, idx in sharding.addressable_devices_indices_map(
        (1, frame_rows)
    ).items():
        rs = idx[1]
        lo = min(lo, rs.start if rs.start is not None else 0)
        hi = max(hi, rs.stop if rs.stop is not None else frame_rows)
    return lo, hi


class ShardedPrefetcher:
    """Double-buffered sharded ingest over a GOP.

    Wraps an iterator of host [B, Hp, Wp] numpy batches; `__next__`
    returns the batch already staged on the mesh while the following one
    transfers in the background (device_put is async — the transfer
    overlaps the caller's compute until the array is first used).
    """

    def __init__(self, host_batches, mesh: Mesh, depth: int = 2):
        self._it = iter(host_batches)
        self._mesh = mesh
        self._queue = []
        self._depth = max(1, depth)
        self._fill()

    def _fill(self):
        while len(self._queue) < self._depth:
            try:
                batch = next(self._it)
            except StopIteration:
                return
            self._queue.append(put_frame_batch(batch, self._mesh))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._queue:
            raise StopIteration
        out = self._queue.pop(0)
        self._fill()
        return out
