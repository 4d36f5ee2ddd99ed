"""GSPMD sharding of the full hybrid frame.

The frame is data-parallel over image rows: every (H, W, ...) plane in
RenderState/outputs shards along rows of the tiles mesh axis; scene arrays,
probe atlases, and camera/light scalars replicate. XLA's SPMD partitioner
inserts the halo exchanges for the stencil filters (pad+slice chains) and
the collectives for reprojection gathers — the TPU-native equivalent of
splitting the frame across GPUs with explicit NCCL halos.

The Pallas FlashTrace kernel is not GSPMD-partitionable by itself, so
multi-chip frames wrap it in ``parallel.trace.shard_ray_fn`` (shard_map
over the ray axis, per-device pallas_call) — pass ``mesh=`` to
``HybridRenderer`` to get the production flash-sharded frame; the pure-XLA
tracer ("brute"/"bvh") also works under plain GSPMD.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybrid_rendering_tpu.parallel.mesh import TILE_AXIS


def _leaf_sharding(leaf, mesh: Mesh, heights):
    n = mesh.shape[TILE_AXIS]
    if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[0] in heights \
            and leaf.shape[0] % n == 0:
        return NamedSharding(mesh, P(TILE_AXIS))
    return NamedSharding(mesh, P())


def frame_shardings(tree, mesh: Mesh, height: int):
    """Pytree of shardings: row-shard anything whose leading dim is a known
    image height (full/half/quarter res), replicate the rest."""
    heights = {height, height // 2, height // 4}
    return jax.tree_util.tree_map(
        lambda leaf: _leaf_sharding(leaf, mesh, heights), tree
    )


def shard_frame_state(state, mesh: Mesh, height: int):
    """device_put a RenderState with row sharding on image planes."""
    return jax.device_put(state, frame_shardings(state, mesh, height))
