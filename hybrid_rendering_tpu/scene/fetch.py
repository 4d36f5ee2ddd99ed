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
    frontface = jnp.sum(geo_n * direction, axis=-1) <= 0.0
    geo_n = jnp.where(~frontface[..., None], -geo_n, geo_n)
    normal = jnp.where(
        (jnp.sum(normal * geo_n, axis=-1) < 0.0)[..., None], -normal, normal
    )
    position = origin + hit.t[..., None] * direction

    mats = scene.materials
    valid = hit.valid
    mat_id = jnp.where(valid, mat_id, 0)
    albedo = take_rows_onehot(mats.albedo, mat_id)
    albedo = _apply_albedo_texture(scene, albedo, mat_id, uv, valid)
    surf = Surface(
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
        frontface=frontface,
    )
    # tangent travels in attr lanes 20:24 (ops/pallas/flashtrace.py ATTR)
    return apply_material_maps(scene, surf, attrs[..., 20:24], valid)


def _mat_int_col(col, mat_id):
    """Per-pixel int column lookup from the small material table."""
    return jnp.round(
        take_rows_onehot(col.astype(jnp.float32)[:, None], mat_id)[..., 0]
    ).astype(jnp.int32)


def _apply_albedo_texture(scene, albedo, mat_id, uv, valid):
    """albedo *= atlas sample (glTF-style factor x texture; reference
    fetch_albedo, scene_descriptor_set.glsl:180-196). No-op for untextured
    scenes."""
    mats = scene.materials
    if scene.atlas is None or mats.albedo_tex is None:
        return albedo
    from hybrid_rendering_tpu.scene.textures import sample_atlas

    tex_idx = _mat_int_col(mats.albedo_tex, mat_id)
    tex = sample_atlas(scene.atlas, tex_idx, uv, valid=valid)
    return albedo * tex[..., :3]


def _select_channel(tex, channel, mat_id):
    """Per-material texel channel selector (texture_indices1.zw,
    scene_descriptor_set.glsl:204-218)."""
    ch = _mat_int_col(channel, mat_id)
    out = tex[..., 0]
    for c in range(1, 4):
        out = jnp.where(ch == c, tex[..., c], out)
    return out


def apply_material_maps(scene, surf: Surface, tangent4=None,
                        valid=None) -> Surface:
    """Apply the remaining material maps to a constant-material Surface:
    tangent-space normal map (fetch_normal, scene_descriptor_set.glsl:190-
    196 + get_normal_from_map:165-176), per-channel roughness/metallic
    textures (fetch_roughness/fetch_metallic :200-218, incl. the 0.1
    roughness floor), and emissive map (fetch_emissive :222-228; glTF
    factor x texture). The albedo map is applied during the base fetch.

    tangent4: (..., 4) [tangent.xyz, bitangent sign], or None to skip
    normal mapping. No-op when the scene has no atlas."""
    mats = scene.materials
    if scene.atlas is None or mats.normal_tex is None:
        return surf
    from hybrid_rendering_tpu.scene.textures import sample_atlas

    if valid is None:
        valid = surf.mesh_id >= 0
    mat_id = surf.mat_id
    uv = surf.uv
    normal = surf.normal
    roughness = surf.roughness
    metallic = surf.metallic
    emissive = surf.emissive

    if tangent4 is not None and _static_any(mats.normal_tex):
        n_idx = _mat_int_col(mats.normal_tex, mat_id)
        tex = sample_atlas(scene.atlas, n_idx, uv, valid=valid)
        tn = tex[..., :3] * 2.0 - 1.0  # tangent-space normal
        t = tangent4[..., :3]
        # re-orthogonalize against the interpolated shading normal
        t = normalize(t - normal * jnp.sum(t * normal, -1, keepdims=True))
        b = tangent4[..., 3:4] * jnp.cross(normal, t)
        mapped = normalize(
            tn[..., 0:1] * t + tn[..., 1:2] * b + tn[..., 2:3] * normal)
        use = (n_idx >= 0) & valid
        normal = jnp.where(use[..., None], mapped, normal)

    if _static_any(mats.roughness_tex):
        r_idx = _mat_int_col(mats.roughness_tex, mat_id)
        tex = sample_atlas(scene.atlas, r_idx, uv, valid=valid)
        r_tex = _select_channel(tex, mats.roughness_channel, mat_id)
        use = (r_idx >= 0) & valid
        roughness = jnp.where(use, jnp.maximum(r_tex, 0.1), roughness)

    if _static_any(mats.metallic_tex):
        m_idx = _mat_int_col(mats.metallic_tex, mat_id)
        tex = sample_atlas(scene.atlas, m_idx, uv, valid=valid)
        m_tex = _select_channel(tex, mats.metallic_channel, mat_id)
        use = (m_idx >= 0) & valid
        metallic = jnp.where(use, m_tex, metallic)

    if _static_any(mats.emissive_tex):
        e_idx = _mat_int_col(mats.emissive_tex, mat_id)
        tex = sample_atlas(scene.atlas, e_idx, uv, valid=valid)
        use = (e_idx >= 0) & valid
        emissive = jnp.where(
            use[..., None], emissive * tex[..., :3], emissive)

    return surf.replace(normal=normal, roughness=roughness,
                        metallic=metallic, emissive=emissive)


def _static_any(col):
    """True when any material actually has this map. Material tables are
    concrete at trace time (the scene is a captured constant), so unused
    map fetches compile away entirely; conservatively True for tracers."""
    if col is None:
        return False
    try:
        import numpy as _np

        return bool(_np.any(_np.asarray(col) >= 0))
    except Exception:
        return True


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
    frontface = jnp.sum(geo_n * direction, axis=-1) <= 0.0
    geo_n = jnp.where(~frontface[..., None], -geo_n, geo_n)
    # keep the shading normal in the same hemisphere as the geometric one
    normal = jnp.where(
        (jnp.sum(normal * geo_n, axis=-1) < 0.0)[..., None], -normal, normal
    )

    mat_id = take_rows(scene.tri_mat, tid)
    mats = scene.materials
    albedo = take_rows(mats.albedo, mat_id)
    albedo = _apply_albedo_texture(scene, albedo, mat_id, uv, hit.valid)
    surf = Surface(
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
        frontface=frontface,
    )
    tangent4 = (take_rows(scene.tri_tangent, tid)
                if scene.tri_tangent is not None else None)
    return apply_material_maps(scene, surf, tangent4, hit.valid)
