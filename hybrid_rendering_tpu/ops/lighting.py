"""Punctual-light sampling + direct lighting.

Behavioural twin of src/shaders/lighting.glsl: three light types with
disk-sampled soft-shadow directions, smoothstep spot falloff, inverse-square
attenuation, and optional cosine-sampled sky light. Branch-free over batches
(the three light types are computed and selected by mask — a single Light is
scalar per frame so XLA folds the selects).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from hybrid_rendering_tpu.ops import brdf as brdf_ops
from hybrid_rendering_tpu.ops.math3d import dot, normalize, smoothstep
from hybrid_rendering_tpu.types import (
    LIGHT_TYPE_DIRECTIONAL,
    LIGHT_TYPE_POINT,
    Light,
)

M_PI = jnp.pi


def _disk_perturb(light_dir, radius, rng2):
    """Perturb a light direction within a disk of given angular radius
    (lighting.glsl:41-47 and the point/spot variants)."""
    up = jnp.array([0.0, 1.0, 0.0], light_dir.dtype)
    tangent = normalize(jnp.cross(light_dir, jnp.broadcast_to(up, light_dir.shape)))
    bitangent = normalize(jnp.cross(tangent, light_dir))
    point_radius = radius * jnp.sqrt(rng2[..., 0])
    point_angle = rng2[..., 1] * 2.0 * M_PI
    dx = point_radius * jnp.cos(point_angle)
    dy = point_radius * jnp.sin(point_angle)
    return normalize(light_dir + dx[..., None] * tangent + dy[..., None] * bitangent)


def fetch_light_properties(light: Light, p, n, rng2=None, soft_shadows=True):
    """Returns (Li, Wi, t_max, attenuation) for surface points p (...,3)
    with normals n. Semantics: lighting.glsl fetch_light_properties.
    attenuation includes the clamped N.Wi factor (lighting.glsl:107)."""
    li = light.color * light.intensity  # (3,)
    shape = p.shape[:-1]

    # --- directional ---
    dir_wi = jnp.broadcast_to(light.direction, p.shape)
    if soft_shadows and rng2 is not None:
        dir_wi = _disk_perturb(dir_wi, light.radius, rng2)
    dir_tmax = jnp.full(shape, 1e4, p.dtype)
    dir_att = jnp.ones(shape, p.dtype)

    # --- point / spot shared ---
    to_light = light.position - p
    light_distance = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-12))
    pl_dir = to_light / light_distance[..., None]
    if soft_shadows and rng2 is not None:
        # angular radius shrinks with distance (lighting.glsl:69-76)
        ang_radius = light.radius / light_distance
        up = jnp.array([0.0, 1.0, 0.0], p.dtype)
        tangent = normalize(jnp.cross(pl_dir, jnp.broadcast_to(up, pl_dir.shape)))
        bitangent = normalize(jnp.cross(tangent, pl_dir))
        point_radius = ang_radius * jnp.sqrt(rng2[..., 0])
        point_angle = rng2[..., 1] * 2.0 * M_PI
        dx = point_radius * jnp.cos(point_angle)
        dy = point_radius * jnp.sin(point_angle)
        pl_wi = normalize(pl_dir + dx[..., None] * tangent + dy[..., None] * bitangent)
    else:
        pl_wi = pl_dir
    inv_sq = 1.0 / jnp.maximum(light_distance * light_distance, 1e-8)

    # Spot cone falloff (lighting.glsl:105-107). Our Light.direction for a
    # spot is the BEAM axis (light -> scene); the point sits inside the cone
    # when the light->point vector (-Wi) aligns with the axis.
    angle_att = smoothstep(
        light.cos_theta_outer, light.cos_theta_inner, -dot(pl_wi, light.direction)
    )

    is_dir = light.type == LIGHT_TYPE_DIRECTIONAL
    is_point = light.type == LIGHT_TYPE_POINT

    wi = jnp.where(is_dir, dir_wi, pl_wi)
    t_max = jnp.where(is_dir, dir_tmax, light_distance)
    att = jnp.where(is_dir, dir_att, jnp.where(is_point, inv_sq, angle_att * inv_sq))
    att = att * jnp.clip(dot(n, wi), 0.0, 1.0)
    return li, wi, t_max, att


def direct_lighting(
    light: Light,
    wo,
    n,
    p,
    f0,
    diffuse_color,
    roughness,
    *,
    visibility_fn: Optional[Callable] = None,
    throughput=None,
    rng_shadow=None,
    rng_sky=None,
    sky_radiance_fn: Optional[Callable] = None,
    ray_origin_bias: float = 0.1,
):
    """Reference direct_lighting (lighting.glsl:117-196).

    visibility_fn(origin, dir, t_max) -> visibility in {0,1} replaces the
    inline ray query. sky_radiance_fn(dir) -> (...,3) replaces the sky
    cubemap sample; when given, one cosine-sampled sky ray is added.
    """
    lo = jnp.zeros_like(p)
    T = throughput if throughput is not None else jnp.ones_like(p)
    ray_origin = p + n * ray_origin_bias

    li, wi, t_max, att = fetch_light_properties(
        light, p, n, rng2=rng_shadow, soft_shadows=rng_shadow is not None
    )
    if visibility_fn is not None:
        vis = visibility_fn(ray_origin, wi, t_max)
        att = att * jnp.where(att > 0.0, vis, 0.0)
    wh = normalize(wo + wi)
    val = brdf_ops.evaluate_uber_brdf(diffuse_color, roughness, n, f0, wo, wh, wi)
    lo = lo + T * val * att[..., None] * li

    if sky_radiance_fn is not None and rng_sky is not None:
        wi_s = brdf_ops.sample_cosine_lobe(n, rng_sky)
        li_s = sky_radiance_fn(wi_s)
        if visibility_fn is not None:
            vis_s = visibility_fn(ray_origin, wi_s, jnp.full(p.shape[:-1], 1e4, p.dtype))
            li_s = li_s * vis_s[..., None]
        wh_s = normalize(wo + wi_s)
        val_s = brdf_ops.evaluate_uber_brdf(diffuse_color, roughness, n, f0, wo, wh_s, wi_s)
        # NOTE: reference does not divide by the cosine pdf here
        # (lighting.glsl:177-190) — the N.L it would multiply by cancels
        # against pdf = N.L/pi only up to the missing pi factor; we keep
        # exact reference behaviour for parity.
        lo = lo + T * val_s * li_s

    return lo
