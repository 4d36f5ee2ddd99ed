"""Deferred shading combine + skybox.

Behavioural twin of src/deferred_shading.{h,cpp} + src/shaders/deferred.frag
(SURVEY §2.8): direct punctual lighting x shadow visibility + indirect
diffuse (DDGI screen irradiance OR SH-9 environment fallback) + indirect
specular (reflections texture OR prefiltered env fallback, split-sum BRDF)
x AO, with fresnel-roughness weighting and IndirectSpecularStrength=2
(deferred.frag:28,162-205). Sky pixels get the environment radiance
(skybox pass, deferred_shading.cpp:800-818)."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.config import DeferredConfig
from hybrid_rendering_tpu.ops import brdf as brdf_ops
from hybrid_rendering_tpu.ops.lighting import fetch_light_properties
from hybrid_rendering_tpu.ops.math3d import dot, normalize, reflect
from hybrid_rendering_tpu.types import Camera, GBuffer, Light
from hybrid_rendering_tpu.utils import camera as camera_utils


def deferred_shading(
    gb: GBuffer,
    camera: Camera,
    light: Light,
    sky_radiance_fn: Callable,
    width: int,
    height: int,
    shadow_visibility: Optional[jax.Array] = None,  # (H,W)
    ao: Optional[jax.Array] = None,  # (H,W)
    reflections: Optional[jax.Array] = None,  # (H,W,3)
    gi_irradiance: Optional[jax.Array] = None,  # (H,W,3) DDGI screen irradiance
    env_irradiance_fn: Optional[Callable] = None,  # dir -> (..,3) SH-9 fallback
    env_prefiltered_fn: Optional[Callable] = None,  # (dir, roughness) -> (..,3)
    cfg: DeferredConfig = DeferredConfig(),
    components_out: Optional[dict] = None,
):
    """Combine all effect outputs into the HDR frame (deferred.frag:144-205).
    Returns (H,W,3) HDR radiance. Pass a dict as `components_out` to also
    receive the direct / indirect-diffuse / indirect-specular planes (a
    debug split the reference exposes only implicitly through its
    per-feature enable pushes, deferred_shading.cpp:704-711)."""
    geom = gb.mesh_id >= 0

    n = gb.normal
    p = gb.position
    wo = normalize(camera.position - p)
    ndotv = jnp.clip(dot(n, wo), 0.0, 1.0)

    f0 = brdf_ops.f0_from_metallic(gb.albedo, gb.metallic)
    c_diffuse = gb.albedo * (1.0 - f0) * (1.0 - gb.metallic[..., None])

    # --- direct lighting x shadow visibility (deferred.frag:177-183) ---
    li, wi, _, att = fetch_light_properties(light, p, n, soft_shadows=False)
    wh = normalize(wo + wi)
    brdf_val = brdf_ops.evaluate_uber_brdf(
        c_diffuse, gb.roughness, n, f0, wo, wh, wi
    )
    vis = shadow_visibility if shadow_visibility is not None else jnp.ones_like(att)
    direct = brdf_val * (att * vis)[..., None] * li

    # --- indirect (deferred.frag:153-173) ---
    kS = brdf_ops.fresnel_schlick_roughness(ndotv, f0, gb.roughness)
    kD = (1.0 - kS) * (1.0 - gb.metallic[..., None])

    if gi_irradiance is not None:
        irradiance = gi_irradiance
    elif env_irradiance_fn is not None:
        irradiance = env_irradiance_fn(n)
    else:
        irradiance = jnp.zeros_like(gb.albedo)
    # kD * c_diffuse * irradiance — the reference weights indirect diffuse
    # by c_diffuse (deferred.frag:152,162-163 `diffuse = irradiance *
    # diffuse_color` with diffuse_color = c_diffuse), NOT raw albedo; the
    # GT path tracer uses the same c_diffuse (gi_ray_trace.rchit:117).
    indirect_diffuse = irradiance * c_diffuse * kD

    if reflections is not None:
        prefiltered = reflections
    elif env_prefiltered_fn is not None:
        r = reflect(-wo, n)
        prefiltered = env_prefiltered_fn(r, gb.roughness)
    else:
        prefiltered = jnp.zeros_like(gb.albedo)
    scale, bias = brdf_ops.env_brdf_approx(gb.roughness, ndotv)
    indirect_specular = (
        prefiltered * (f0 * scale[..., None] + bias[..., None])
        * cfg.indirect_specular_strength
    )

    ao_term = ao[..., None] if ao is not None else 1.0
    indirect = (indirect_diffuse + indirect_specular) * ao_term

    color = direct + indirect

    if components_out is not None:
        off = jnp.zeros_like(direct)
        geom3 = geom[..., None]
        components_out["direct"] = jnp.where(geom3, direct, off)
        components_out["indirect_diffuse"] = jnp.where(
            geom3, indirect_diffuse * ao_term, off)
        components_out["indirect_specular"] = jnp.where(
            geom3, indirect_specular * ao_term, off)

    # --- skybox (deferred_shading.cpp:800-818) ---
    _, dirs = camera_utils.camera_rays(camera, width, height)
    sky = sky_radiance_fn(dirs)
    return jnp.where(geom[..., None], color, sky)
