"""Ray-triangle intersection — batched Möller–Trumbore.

The TPU-native replacement for VK_KHR_ray_tracing traversal. Two tiers:
  - brute force (this module): every ray tested against every triangle in
    VMEM-friendly tiles. Dense, branch-free, VPU-saturating; optimal for the
    small procedural test scenes and the correctness oracle.
  - BVH traversal (ops/bvh.py): log-time for large scenes.

Interface mirrors the reference's inline ray queries
(src/shaders/ray_query.glsl:6-59): ``query_distance`` -> closest-hit,
``query_visibility`` -> any-hit boolean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops.math3d import INF_T
from hybrid_rendering_tpu.types import Hit

# Triangles are processed in tiles of this many at once to bound the
# (rays x tris) intermediate. 512 tris x 8k rays x 4B ~= 16 MB per plane.
TRI_TILE = 512


def moller_trumbore(origin, direction, v0, v1, v2, t_min=1e-3):
    """Batched ray-triangle test.

    origin/direction: (R, 3); v0/v1/v2: (T, 3).
    Returns (t, u, v, hit_mask) each (R, T). Backface culling is OFF, as in
    the reference ray queries (gl_RayFlagsOpaqueEXT only, ray_query.glsl:14).
    """
    e1 = v1 - v0  # (T,3)
    e2 = v2 - v0
    # pvec = d x e2 : (R,T,3)
    pvec = jnp.cross(direction[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # (R,T)
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvec = origin[:, None, :] - v0[None, :, :]  # (R,T,3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])  # (R,T,3)
    v = jnp.sum(direction[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-9)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return t, u, v, hit


def closest_hit_brute(tri_pos, origin, direction, t_max=None, t_min=1e-3) -> Hit:
    """Closest hit over a triangle soup. tri_pos: (T,3,3); rays (R,3)."""
    R = origin.shape[0]
    T = tri_pos.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), INF_T, origin.dtype)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, origin.dtype), (R,))

    num_tiles = (T + TRI_TILE - 1) // TRI_TILE
    pad = num_tiles * TRI_TILE - T
    tp = jnp.pad(tri_pos, ((0, pad), (0, 0), (0, 0)), constant_values=jnp.nan)
    tp = tp.reshape(num_tiles, TRI_TILE, 3, 3)

    def body(carry, tile):
        best_t, best_id, best_u, best_v, tile_idx = carry
        v0, v1, v2 = tile[:, 0], tile[:, 1], tile[:, 2]
        t, u, v, hit = moller_trumbore(origin, direction, v0, v1, v2, t_min)
        t = jnp.where(hit & (t < best_t[:, None]), t, jnp.inf)
        k = jnp.argmin(t, axis=1)  # (R,)
        tk = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        improved = jnp.isfinite(tk)
        rows = jnp.arange(R)
        best_id = jnp.where(improved, tile_idx * TRI_TILE + k, best_id)
        best_u = jnp.where(improved, u[rows, k], best_u)
        best_v = jnp.where(improved, v[rows, k], best_v)
        best_t = jnp.where(improved, tk, best_t)
        return (best_t, best_id, best_u, best_v, tile_idx + 1), None

    init = (
        t_max,
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), origin.dtype),
        jnp.zeros((R,), origin.dtype),
        jnp.int32(0),
    )
    if num_tiles == 1:
        (best_t, best_id, best_u, best_v, _), _ = body(init, tp[0])
    else:
        (best_t, best_id, best_u, best_v, _), _ = jax.lax.scan(body, init, tp)
    return Hit(t=best_t, tri_id=best_id, u=best_u, v=best_v)


def occluded_brute(tri_pos, origin, direction, t_max, t_min=1e-3):
    """Any-hit visibility: returns 1.0 if UNoccluded (visible), 0.0 if
    blocked — matching reference query_visibility/query_distance return
    convention (ray_query.glsl:6-59). rays (R,3), t_max (R,)."""
    T = tri_pos.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, origin.dtype), (origin.shape[0],))

    num_tiles = (T + TRI_TILE - 1) // TRI_TILE
    pad = num_tiles * TRI_TILE - T
    tp = jnp.pad(tri_pos, ((0, pad), (0, 0), (0, 0)), constant_values=jnp.nan)
    tp = tp.reshape(num_tiles, TRI_TILE, 3, 3)

    def body(blocked, tile):
        v0, v1, v2 = tile[:, 0], tile[:, 1], tile[:, 2]
        t, _, _, hit = moller_trumbore(origin, direction, v0, v1, v2, t_min)
        any_hit = jnp.any(hit & (t < t_max[:, None]), axis=1)
        return blocked | any_hit, None

    init = jnp.zeros((origin.shape[0],), bool)
    if num_tiles == 1:
        blocked, _ = body(init, tp[0])
    else:
        blocked, _ = jax.lax.scan(body, init, tp)
    return jnp.where(blocked, 0.0, 1.0).astype(origin.dtype)
