"""shard_map ray distribution: run the production FlashTrace kernel
per-device on its slice of the ray batch.

Rays are embarrassingly parallel and the scene/BVH replicates, so a
tracer call shards over the ray axis of the batch: each device runs its
own ``pallas_call`` (or interpret-mode fallback) on its local rays —
the TPU analog of the reference splitting `traceRayEXT` dispatches
across GPUs, with XLA inserting the all-gather only where a consumer
actually needs the full batch (e.g. the replicated DDGI probe-atlas
update; VERDICT r2 #5).

Image-shaped (H, W, 3) ray batches shard along rows — matching
``parallel.sharding.frame_shardings``'s row layout, so camera-ray traces
stay local with no resharding. Flat (N, 3) batches (probe rays) shard
over N with edge-replication padding when N doesn't divide the mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hybrid_rendering_tpu.parallel.mesh import TILE_AXIS


def shard_ray_fn(mesh: Mesh, fn, axis: str = TILE_AXIS):
    """Wrap a tracer closure ``fn(origin, direction, t_max) -> pytree``
    (every output leaf leading with the ray batch axes) so each device
    traces its own slice of the batch under ``shard_map``.

    The scene data stays closed over inside ``fn`` — it lowers to
    replicated constants on every device, exactly like the reference's
    per-GPU BLAS/TLAS copies.
    """
    n = mesh.shape[axis]

    def wrapped(origin, direction, t_max):
        shape = origin.shape[:-1]
        # non-scalar t_max (masked-t gating) shards with the rays; a
        # scalar stays closed over (replicated)
        tm = jnp.asarray(t_max)
        tm_arr = tm.ndim > 0
        if tm_arr:
            tm = jnp.broadcast_to(tm, shape)
        image = len(shape) == 2 and shape[0] % n == 0
        if image:
            o, d = origin, direction
        else:
            o = origin.reshape(-1, 3)
            d = direction.reshape(-1, 3)
            if tm_arr:
                tm = tm.reshape(-1)
            pad = (-o.shape[0]) % n
            if pad:
                # edge-replicate the final ray: traced redundantly on the
                # last device, sliced away below (never NaN-producing)
                o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
                d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])
                if tm_arr:
                    tm = jnp.concatenate(
                        [tm, jnp.broadcast_to(tm[-1:], (pad,))])

        if tm_arr:
            body = shard_map(
                lambda o_, d_, t_: fn(o_, d_, t_),
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis)),
                out_specs=P(axis),
                check_rep=False,
            )
            out = body(o, d, tm)
        else:
            body = shard_map(
                lambda o_, d_: fn(o_, d_, t_max),
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=P(axis),
                check_rep=False,
            )
            out = body(o, d)
        if image:
            return out
        N = origin.reshape(-1, 3).shape[0]
        return jax.tree_util.tree_map(
            lambda a: a[:N].reshape(shape + a.shape[1:]), out
        )

    return wrapped


def shard_renderer_tracers(mesh: Mesh, closest, vis, surface):
    """Shard the three HybridRenderer tracer closures over the mesh."""
    return (
        shard_ray_fn(mesh, closest),
        shard_ray_fn(mesh, vis),
        shard_ray_fn(mesh, surface),
    )
