"""Dynamic (animated-instance) scene support.

The reference rebuilds its TLAS every frame from per-instance transforms
(src/main.cpp:74 build_tlas; instances carry a transform in
dw::RayTracedScene). The TPU-native equivalent: the compiled scene keeps
its world-space BASE pose, and a per-frame (I, 4, 4) rigid transform per
instance re-poses the triangle soup ON DEVICE (a one-hot instance matmul
— MXU work, traced inside the frame jit). The FlashTrace acceleration
data (triangle matrices + cluster AABBs) is pure array math
(ops/pallas/flashtrace.py make_flash_scene), so "rebuilding the TLAS"
is just re-running it on the transformed soup inside the same XLA
program — no host round trip, no BVH pointer surgery.

Motion vectors: a moving surface's previous NDC comes from re-posing the
hit position with delta_i = M_prev_i @ inv(M_cur_i) per instance
(g_buffer.vert:71-84 uses per-draw prev model matrices the same way).

Restriction: transforms must be rigid (rotation + translation + uniform
scale) — normals/tangents are transformed by the rotation part only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.types import SceneArrays


def _per_tri_mats(transforms, tri_instance, num_instances):
    """(T, 4, 4) transform per triangle via one-hot matmul (instance
    counts are small; gathers would hit the scalar core)."""
    oh = jax.nn.one_hot(tri_instance, num_instances, dtype=jnp.float32)
    flat = transforms.reshape(num_instances, 16)
    return (oh @ flat).reshape(tri_instance.shape[0], 4, 4)


def refit_scene(scene: SceneArrays, transforms: jax.Array) -> SceneArrays:
    """Re-pose the scene's triangle soup: transforms (I, 4, 4) indexed by
    tri_mesh_id (= instance id, one per add_instance). Returns a
    SceneArrays with transformed positions/normals/tangents; BVH node
    arrays are dropped (the flash tracer rebuilds its cluster AABBs from
    the new soup; the CPU BVH path must rebuild or use brute)."""
    T = scene.tri_pos.shape[0]
    num_i = transforms.shape[0]
    m = _per_tri_mats(transforms, scene.tri_mesh_id, num_i)  # (T,4,4)
    rot = m[:, :3, :3]
    trans = m[:, :3, 3]

    pos = jnp.einsum("tij,tvj->tvi", rot, scene.tri_pos) + trans[:, None, :]
    nrm = jnp.einsum("tij,tvj->tvi", rot, scene.tri_normal)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    kw = {}
    if scene.tri_tangent is not None:
        tan = jnp.einsum("tij,tj->ti", rot, scene.tri_tangent[:, :3])
        tan = tan / jnp.maximum(
            jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-8)
        kw["tri_tangent"] = jnp.concatenate(
            [tan, scene.tri_tangent[:, 3:4]], axis=1)

    return SceneArrays(
        tri_pos=pos,
        tri_normal=nrm,
        tri_uv=scene.tri_uv,
        tri_mat=scene.tri_mat,
        tri_mesh_id=scene.tri_mesh_id,
        materials=scene.materials,
        atlas=scene.atlas,
        **kw,
    )


def motion_deltas(cur_transforms: jax.Array,
                  prev_transforms: jax.Array) -> jax.Array:
    """Per-instance previous-pose matrices: delta_i maps a CURRENT world
    position of instance i to its PREVIOUS world position."""
    inv_cur = jnp.linalg.inv(cur_transforms)
    return jnp.einsum("iab,ibc->iac", prev_transforms, inv_cur)


def prev_positions(pos, mesh_id, deltas):
    """Apply per-instance deltas to (..., 3) world positions by
    (...,) instance ids (one-hot matmul; -1/invalid ids -> identity)."""
    num_i = deltas.shape[0]
    idx = jnp.clip(mesh_id, 0, num_i - 1)
    oh = jax.nn.one_hot(idx, num_i, dtype=jnp.float32)
    flat = deltas.reshape(num_i, 16)
    m = (oh @ flat).reshape(pos.shape[:-1] + (4, 4))
    out = jnp.einsum("...ij,...j->...i", m[..., :3, :3], pos) + m[..., :3, 3]
    return jnp.where((mesh_id >= 0)[..., None], out, pos)


def identity_transforms(num_instances: int) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                            (num_instances, 4, 4))
