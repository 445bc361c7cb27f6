"""Device-mesh construction for spatial + batch parallelism.

The reference has no distributed backend at all (no NCCL/MPI/Gloo —
SURVEY.md §2); its only parallelism is a pthread pool over blocks
(/root/reference/src/cpu/main.c:144-156) and a CUDA grid
(/root/reference/src/gpu/main_mse.cu:212-223). The TPU-native design
replaces both with one SPMD mesh:

  axis "dp" — batch of frame pairs (a GOP), pure data parallelism
  axis "ty" — frame tiles, vertical
  axis "tx" — frame tiles, horizontal

Tile parallelism is the spatial analogue of context parallelism: each
shard owns an [H/ty, W/tx] tile of both frames and needs a halo of
`span` reference-frame pixels beyond its tile boundary, exchanged with
mesh neighbours over ICI (see parallel.halo).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    ty: int = 1,
    tx: int = 1,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ("dp", "ty", "tx") mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = dp * ty * tx
    if len(devices) < n:
        raise ValueError(
            f"mesh {dp}x{ty}x{tx} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(dp, ty, tx)
    return Mesh(arr, ("dp", "ty", "tx"))
