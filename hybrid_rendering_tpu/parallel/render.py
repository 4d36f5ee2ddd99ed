"""Multi-chip frame rendering: shard_map over image-row tiles.

Pixels/rays are embarrassingly parallel, so the frame shards along rows
over the 1-D ``tiles`` mesh axis. Each device generates + traces rays for
its own row block locally (its own stackless BVH while-loop — no global
sync per traversal step); the scene/BVH and camera are replicated. The
hybrid pipeline's denoiser stencils run under GSPMD (parallel/sharding.py),
where the SPMD partitioner inserts the halo exchange for pad+slice chains
itself; the production FlashTrace kernel shards per-device via
parallel/trace.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hybrid_rendering_tpu.config import PathTracerConfig
from hybrid_rendering_tpu.models import path_tracer
from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.ops import rng as rng_ops
from hybrid_rendering_tpu.parallel.mesh import TILE_AXIS
from hybrid_rendering_tpu.types import Camera, Light, SceneArrays
from hybrid_rendering_tpu.utils import camera as camera_utils


def path_trace_frame_sharded(
    mesh: Mesh,
    scene: SceneArrays,
    camera: Camera,
    light: Light,
    sky,
    width: int,
    height: int,
    cfg: PathTracerConfig = PathTracerConfig(),
):
    """Build a jittable sharded GT-path-trace step.

    Returns step(state) -> state where state.color is row-sharded over the
    mesh. height must divide evenly by the mesh size."""
    n = mesh.shape[TILE_AXIS]
    assert height % n == 0, f"height {height} must divide mesh size {n}"
    rows = height // n

    def shard_fn(scene_, camera_, light_, sky_, color_local, num_frames):
        tile = jax.lax.axis_index(TILE_AXIS)
        y0 = tile * rows
        yy, xx = jnp.meshgrid(
            jnp.arange(rows, dtype=jnp.uint32),
            jnp.arange(width, dtype=jnp.uint32),
            indexing="ij",
        )
        gy = yy + y0.astype(jnp.uint32)
        rng = rng_ops.rng_init(
            xx.reshape(-1), gy.reshape(-1), num_frames.astype(jnp.uint32)
        )
        rng, jit2 = rng_ops.next_vec2(rng)
        px = xx.astype(jnp.float32) + jit2.reshape(rows, width, 2)[..., 0]
        py = gy.astype(jnp.float32) + jit2.reshape(rows, width, 2)[..., 1]
        origins, dirs = camera_utils.camera_rays_for_pixels(
            camera_, px, py, width, height
        )
        closest_surface = bvh_mod.make_surface_tracer(scene_, method="bvh")
        _, vis = bvh_mod.make_tracers(scene_, method="bvh")
        L = path_tracer.trace_wavefront(
            scene_, closest_surface, vis, light_, sky_.radiance,
            origins.reshape(-1, 3), dirs.reshape(-1, 3), rng, cfg,
        ).reshape(rows, width, 3)
        # running-mean accumulate (reference rgen:94-111)
        nf = num_frames
        blended = color_local + (L - color_local) / jnp.maximum(nf, 1).astype(jnp.float32)
        return jnp.where(nf == 0, L, blended)

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(TILE_AXIS), P()),
        out_specs=P(TILE_AXIS),
        check_rep=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: path_tracer.GroundTruthState):
        color = sharded(scene, camera, light, sky, state.color, state.num_frames)
        return path_tracer.GroundTruthState(
            color=color, num_frames=state.num_frames + 1
        )

    return step
