"""Hit-point surface fetch: interpolate triangle attributes + materials.

TPU equivalent of the bindless hit fetch (reference
src/shaders/scene_descriptor_set.glsl:95-228: fetch_vertex / interpolation /
material fetch). Gathers from the flat scene arrays by triangle id.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops.math3d import normalize
from hybrid_rendering_tpu.types import Hit, SceneArrays, Surface


def take_rows_onehot(table, idx):
    """Row lookup from a SMALL table via one-hot matmul (MXU) — avoids the
    TPU scalar-core gather path entirely. table (M, ...) with M <= ~64."""
    M = table.shape[0]
    flat = table.reshape(M, -1).astype(jnp.float32)
    onehot = jax.nn.one_hot(idx, M, dtype=jnp.float32)
    out = onehot @ flat
    return out.reshape(idx.shape + table.shape[1:])


def surface_from_attrs(scene: SceneArrays, origin, direction, hit: Hit,
                       attrs) -> Surface:
    """Build a Surface from the FlashTrace fused-attribute output
    (ops/pallas/flashtrace.py ATTR layout) — gather-free: positions come
    from o + t*d, vertex attributes were selected in-kernel, and material
    constants use a one-hot matmul over the small material table."""
    w = (1.0 - hit.u - hit.v)[..., None]
    u = hit.u[..., None]
    v = hit.v[..., None]
    n0, n1, n2 = attrs[..., 0:3], attrs[..., 3:6], attrs[..., 6:9]
    normal = normalize(w * n0 + u * n1 + v * n2)
    uv = w[..., :1] * attrs[..., 9:11] + u[..., :1] * attrs[..., 11:13] \
        + v[..., :1] * attrs[..., 13:15]
    mat_id = jnp.round(attrs[..., 15]).astype(jnp.int32)
    mesh_id = jnp.round(attrs[..., 16]).astype(jnp.int32)
    geo_n = attrs[..., 17:20]
    geo_n = jnp.where(
        (jnp.sum(geo_n * direction, axis=-1) > 0.0)[..., None], -geo_n, geo_n
    )
    normal = jnp.where(
        (jnp.sum(normal * geo_n, axis=-1) < 0.0)[..., None], -normal, normal
    )
    position = origin + hit.t[..., None] * direction

    mats = scene.materials
    valid = hit.valid
    mat_id = jnp.where(valid, mat_id, 0)
    albedo = take_rows_onehot(mats.albedo, mat_id)
    albedo = _apply_albedo_texture(scene, albedo, mat_id, uv, valid)
    return Surface(
        position=position,
        normal=normal,
        geo_normal=geo_n,
        uv=uv,
        albedo=albedo,
        roughness=take_rows_onehot(mats.roughness[:, None], mat_id)[..., 0],
        metallic=take_rows_onehot(mats.metallic[:, None], mat_id)[..., 0],
        emissive=take_rows_onehot(mats.emissive, mat_id),
        mesh_id=jnp.where(valid, mesh_id, -1),
        mat_id=mat_id,
    )


def _apply_albedo_texture(scene, albedo, mat_id, uv, valid):
    """albedo *= atlas sample (glTF-style factor x texture; reference
    fetch_albedo, scene_descriptor_set.glsl:180-196). No-op for untextured
    scenes."""
    mats = scene.materials
    if scene.atlas is None or mats.albedo_tex is None:
        return albedo
    from hybrid_rendering_tpu.scene.textures import sample_atlas

    tex_idx = jnp.round(
        take_rows_onehot(
            mats.albedo_tex.astype(jnp.float32)[:, None], mat_id
        )[..., 0]
    ).astype(jnp.int32)
    tex = sample_atlas(scene.atlas, tex_idx, uv, valid=valid)
    return albedo * tex[..., :3]


def fetch_surface(scene: SceneArrays, origin, direction, hit: Hit) -> Surface:
    """Interpolate surface attributes at hits. Invalid hits (tri_id < 0)
    return safe dummy values (mask with hit.valid downstream).

    origin/direction: (..., 3); hit fields (...,)."""
    from hybrid_rendering_tpu.ops.filters import take_rows

    tid = jnp.clip(hit.tri_id, 0, scene.tri_pos.shape[0] - 1)
    w = (1.0 - hit.u - hit.v)[..., None]
    u = hit.u[..., None]
    v = hit.v[..., None]

    tp = take_rows(scene.tri_pos, tid)  # (..., 3, 3)
    tn = take_rows(scene.tri_normal, tid)
    tuv = take_rows(scene.tri_uv, tid)

    position = w * tp[..., 0, :] + u * tp[..., 1, :] + v * tp[..., 2, :]
    normal = normalize(w * tn[..., 0, :] + u * tn[..., 1, :] + v * tn[..., 2, :])
    uv = w[..., :1] * tuv[..., 0, :] + u[..., :1] * tuv[..., 1, :] + v[..., :1] * tuv[..., 2, :]

    e1 = tp[..., 1, :] - tp[..., 0, :]
    e2 = tp[..., 2, :] - tp[..., 0, :]
    geo_n = normalize(jnp.cross(e1, e2))
    # face-forward the geometric normal against the incoming ray
    geo_n = jnp.where(
        (jnp.sum(geo_n * direction, axis=-1) > 0.0)[..., None], -geo_n, geo_n
    )
    # keep the shading normal in the same hemisphere as the geometric one
    normal = jnp.where(
        (jnp.sum(normal * geo_n, axis=-1) < 0.0)[..., None], -normal, normal
    )

    mat_id = take_rows(scene.tri_mat, tid)
    mats = scene.materials
    albedo = take_rows(mats.albedo, mat_id)
    albedo = _apply_albedo_texture(scene, albedo, mat_id, uv, hit.valid)
    return Surface(
        position=position,
        normal=normal,
        geo_normal=geo_n,
        uv=uv,
        albedo=albedo,
        roughness=take_rows(mats.roughness, mat_id),
        metallic=take_rows(mats.metallic, mat_id),
        emissive=take_rows(mats.emissive, mat_id),
        mesh_id=take_rows(scene.tri_mesh_id, tid),
        mat_id=mat_id,
    )
