"""Device-mesh construction + frame sharding.

The reference is single-GPU (SURVEY §2.10.8: one queue, one command buffer);
its "parallelism" is intra-device work distribution. On TPU the natural
scale-out axis is the *frame*: pixels/rays are embarrassingly parallel, so
we shard image rows (and ray batches) over a 1-D ``tiles`` mesh axis —
the scene/BVH is replicated (it's read-only and small next to per-pixel
state), traces run per-device via shard_map (parallel/trace.py), and the
GSPMD partitioner inserts stencil halos / gather collectives for the rest
of the frame (parallel/sharding.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the frame-tile axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an (H, ...) image over rows."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows(h: int, n: int) -> int:
    """Rows padded to a multiple of the tile-axis size."""
    return (h + n - 1) // n * n
