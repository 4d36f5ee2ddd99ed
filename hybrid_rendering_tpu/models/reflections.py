"""Stochastic ray-traced reflections with reflections-specific SVGF.

Behavioural twin of src/ray_traced_reflections.{h,cpp} +
src/shaders/reflections/* (SURVEY §2.6):

  - roughness-branched ray strategy (reflections_ray_trace.rgen:119-171):
    roughness < 0.05 -> perfect mirror ray; roughness > 0.75 with
    approximate_with_ddgi -> NO ray, sample the probe grid along R; else
    GGX importance-sampled half vector with `trim` scaling of the random
    sample; firefly clamp at 0.7; ray length (hit T, -1 on miss) kept for
    virtual-point reprojection;
  - hit shading (rchit:117-150): direct lighting with an inline shadow ray
    + optional indirect (DDGI diffuse + IBL specular);
  - temporal pass (reflections_denoise_reprojection.comp): virtual-point
    reprojection where ray_length > 0 and curvature == 0, 17x17 color
    mean/sigma AABB *clip* (not clamp), camera-motion accumulation cap of
    8 frames, luminance moments -> variance;
  - a-trous passing mirror/DDGI-approximated pixels through unchanged;
  - edge-aware upsample. Default scale HALF (ray_traced_reflections.h:24).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import ReflectionsConfig
from hybrid_rendering_tpu.ops import (
    bluenoise, brdf as brdf_ops, filters, rng as rng_ops,
)
from hybrid_rendering_tpu.ops.lighting import direct_lighting
from hybrid_rendering_tpu.ops.math3d import dot, luminance, normalize, reflect
from hybrid_rendering_tpu.ops.reprojection import (
    reproject, virtual_point_coords,
)
from hybrid_rendering_tpu.types import Camera, GBuffer, Light, SceneArrays


@struct.dataclass
class ReflectionsState:
    history: jax.Array  # (h,w,3)
    moments: jax.Array  # (h,w,2)
    history_length: jax.Array  # (h,w)

    @staticmethod
    def create(height: int, width: int):
        return ReflectionsState(
            history=jnp.zeros((height, width, 3), jnp.float32),
            moments=jnp.zeros((height, width, 2), jnp.float32),
            history_length=jnp.zeros((height, width), jnp.float32),
        )


class ReflectionsOutputs(NamedTuple):
    ray_trace: jax.Array  # (h,w,3)
    ray_length: jax.Array  # (h,w)
    temporal: jax.Array
    atrous: jax.Array
    final: jax.Array  # (H,W,3)


def ray_trace(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    visibility_fn: Callable,
    gb: GBuffer,
    camera: Camera,
    light: Light,
    sky_radiance_fn: Callable,
    frame_index,
    cfg: ReflectionsConfig,
    gi_sample_fn: Optional[Callable] = None,  # (pos, normal, wo) -> (..,3)
    env_prefiltered_fn: Optional[Callable] = None,
):
    """1 reflection ray/pixel with the roughness-branched strategy.
    Returns (color (h,w,3), ray_length (h,w))."""
    h, w = gb.depth.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.uint32), jnp.arange(w, dtype=jnp.uint32),
        indexing="ij",
    )
    rng = rng_ops.rng_init(xx.reshape(-1), yy.reshape(-1), frame_index)
    bu, bv = bluenoise.sample2d_grid(h, w, frame_index, dim=2)
    r2 = jnp.stack([bu, bv], axis=-1) * cfg.trim  # trim (rgen:157-166)

    p = gb.position
    n = gb.normal
    wo = normalize(camera.position - p)
    geom = gb.mesh_id >= 0

    # ray direction: mirror / GGX half-vector sample
    mirror_dir = reflect(-wo, n)
    alpha = gb.roughness * gb.roughness
    wh = brdf_ops.sample_specular_ggx_lobe(n, alpha, r2)
    ggx_dir = reflect(-wo, wh)
    # keep the sampled ray above the surface
    ggx_dir = jnp.where(
        (dot(ggx_dir, n) < 1e-3)[..., None], mirror_dir, ggx_dir
    )
    is_mirror = gb.roughness < cfg.mirror_roughness_threshold
    ray_dir = jnp.where(is_mirror[..., None], mirror_dir, ggx_dir)

    use_ddgi = (
        (gb.roughness > cfg.ddgi_roughness_threshold)
        if (cfg.approximate_with_ddgi and gi_sample_fn is not None)
        else jnp.zeros_like(geom)
    )
    needs_ray = geom & ~use_ddgi

    origin = p + n * cfg.bias
    # pixels whose reflection is DDGI-approximated (or sky) never use the
    # trace result: give them t_max = 0 so fully-masked packets produce
    # empty cluster lists and skip all kernel work (rough scenes trace
    # only their mirror/GGX pixels)
    hit, surf = closest_surface_fn(
        origin, ray_dir, jnp.where(needs_ray, 1e4, 0.0))
    hit_valid = hit.valid & needs_ray

    # --- shade hits (rchit) ---
    sp = surf.position
    sn = surf.normal
    s_albedo = surf.albedo
    s_rough = surf.roughness
    s_metal = surf.metallic
    s_emis = surf.emissive

    f0 = brdf_ops.f0_from_metallic(s_albedo, s_metal)
    c_diff = s_albedo * (1.0 - f0) * (1.0 - s_metal[..., None])
    s_wo = -ray_dir

    rng, rs = rng_ops.next_vec2(rng)

    def vis_at_hits(o_, d_, tm_):
        # hit-point shadow rays only matter where the reflection ray hit
        # real geometry; masked packets skip the visibility kernel
        return visibility_fn(o_, d_, jnp.where(hit_valid, tm_, 0.0))

    hit_color = direct_lighting(
        light, s_wo, sn, sp, f0, c_diff, s_rough,
        visibility_fn=vis_at_hits,
        rng_shadow=rs.reshape(h, w, 2),
    ) + s_emis

    # One merged probe-grid evaluation serves both DDGI consumers — the
    # hit-point diffuse (rchit:87-111, needs_ray pixels) and the
    # rough-pixel DDGI approximation along R (rgen:152-156, use_ddgi
    # pixels). The two pixel sets are disjoint, so a single sampler call
    # with per-pixel selected inputs is exact and halves the (expensive)
    # probe-cage sampling.
    gi_merged = None
    want_hit_gi = cfg.sample_gi and gi_sample_fn is not None
    want_ddgi_approx = cfg.approximate_with_ddgi and gi_sample_fn is not None
    if want_hit_gi or want_ddgi_approx:
        sel = use_ddgi[..., None]
        gi_p = jnp.where(sel, p, sp)
        gi_n = jnp.where(sel, mirror_dir, sn)
        gi_wo = jnp.where(sel, wo, s_wo)
        # validity keeps sky pixels / ray misses out of the sampler's
        # shared tile-window bases (their outputs are masked anyway)
        gi_valid = (use_ddgi & geom) | (needs_ray & hit.valid)
        s = int(cfg.gi_sample_step)
        if s > 1 and (s & (s - 1)) == 0 and h % s == 0 and w % s == 0:
            # sparse probe-cage eval + joint-bilateral upsample on the
            # PRIMARY surface guides: exact for the use_ddgi pixels (their
            # sample point is the primary surface) and a smooth-field
            # interpolation for hit-point GI (indirect diffuse at the hit
            # is low-frequency and feeds the SVGF chain anyway)
            from hybrid_rendering_tpu.models.gbuffer import (
                nearest_downsample as _nds)
            gi_low = gi_sample_fn(
                _nds(gi_p, s), _nds(gi_n, s), _nds(gi_wo, s),
                valid=_nds(gi_valid, s))
            gi_merged = filters.upsample_edge_aware(
                gi_low, _nds(gb.normal, s), _nds(gb.linear_z, s),
                gb.normal, gb.linear_z, s.bit_length() - 1)
        else:
            gi_merged = gi_sample_fn(gi_p, gi_n, gi_wo, valid=gi_valid)

    # indirect at the hit (rchit:87-111): kD x DDGI diffuse + split-sum
    # IBL specular, exactly reflections_ray_trace.rchit:91-110
    if want_hit_gi or env_prefiltered_fn is not None:
        s_ndotv = jnp.clip(dot(sn, s_wo), 0.0, 1.0)
        kS = brdf_ops.fresnel_schlick_roughness(s_ndotv, f0, s_rough)
    if want_hit_gi:
        kD = (1.0 - kS) * (1.0 - s_metal[..., None])
        hit_color = hit_color + kD * gi_merged * c_diff * cfg.gi_intensity
    if env_prefiltered_fn is not None:
        refl_at_hit = reflect(-s_wo, sn)
        spec = env_prefiltered_fn(refl_at_hit, s_rough)
        scale, bias = brdf_ops.env_brdf_approx(s_rough, s_ndotv)
        hit_color = hit_color + spec * (
            kS * scale[..., None] + bias[..., None]
        ) * cfg.ibl_indirect_specular_intensity

    # --- misses: environment (rmiss) ---
    miss_color = sky_radiance_fn(ray_dir)

    color = jnp.where(hit_valid[..., None], hit_color, miss_color)
    # rough pixels approximated with DDGI along R (rgen:152-156)
    if want_ddgi_approx:
        ddgi_color = gi_merged * cfg.rough_ddgi_intensity
        color = jnp.where(use_ddgi[..., None], ddgi_color, color)

    color = jnp.minimum(color, cfg.firefly_clamp)  # rgen:168
    color = jnp.where(geom[..., None], color, 0.0)

    ray_length = jnp.where(hit_valid, hit.t, -1.0)
    ray_length = jnp.where(needs_ray, ray_length, -1.0)
    return color, ray_length


def temporal_accumulation(
    raw: jax.Array,
    ray_length: jax.Array,
    gb: GBuffer,
    prev_gb: GBuffer,
    camera: Camera,
    camera_delta: jax.Array,  # () scalar: frame-to-frame camera movement
    state: ReflectionsState,
    cfg: ReflectionsConfig,
):
    """Reflections temporal pass (reflections_denoise_reprojection.comp):
    virtual-point reprojection, AABB clip, motion-capped accumulation."""
    geom = gb.mesh_id >= 0
    H, W = gb.depth.shape

    # virtual-point coords where ray_length > 0 and curvature == 0
    # (reprojection.glsl:98-111)
    vx, vy = virtual_point_coords(gb, camera, jnp.maximum(ray_length, 0.0))
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    sx = xx + gb.motion[..., 0] * W
    sy = yy + gb.motion[..., 1] * H
    use_virtual = (ray_length > 0.0) & (gb.curvature == 0.0)
    hx = jnp.where(use_virtual, vx, sx)
    hy = jnp.where(use_virtual, vy, sy)

    rep = reproject(
        gb, prev_gb, state.history,
        history_moments=state.moments,
        history_length=state.history_length,
        reprojected_coord=(hx, hy),
    )
    success = rep.valid & geom

    # camera-motion-aware accumulation cap (comp:161-168)
    cap = jnp.where(camera_delta > 1e-5, cfg.accumulation_cap_moving,
                    cfg.history_cap)
    history_length = jnp.minimum(
        cap, jnp.where(success, rep.history_length + 1.0, 1.0)
    )

    # 17x17 color mean/sigma AABB *clip* (comp:111-157, 221-232)
    n17 = 17.0 * 17.0
    m1 = filters.box_filter_sum(raw, 8) / n17
    m2 = filters.box_filter_sum(raw * raw, 8) / n17
    sigma = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))
    box_min = m1 - sigma
    box_max = m1 + sigma
    center = 0.5 * (box_max + box_min)
    extent = 0.5 * (box_max - box_min) + 1e-5
    vc = rep.history - center
    ma = jnp.max(jnp.abs(vc / extent), axis=-1, keepdims=True)
    hist = jnp.where(ma > 1.0, center + vc / jnp.maximum(ma, 1e-6), rep.history)
    hist = jnp.where(success[..., None], hist, 0.0)

    alpha = jnp.where(success, jnp.maximum(cfg.alpha, 1.0 / history_length), 1.0)
    alpha_m = jnp.where(
        success, jnp.maximum(cfg.moments_alpha, 1.0 / history_length), 1.0
    )

    lum = luminance(raw)
    cur_moments = jnp.stack([lum, lum * lum], axis=-1)
    prev_moments = jnp.where(success[..., None], rep.history_moments, 0.0)
    moments = prev_moments + (cur_moments - prev_moments) * alpha_m[..., None]
    variance = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)

    color = hist + (raw - hist) * alpha[..., None]
    color = jnp.where(geom[..., None], color, 0.0)
    return color, variance, moments, jnp.where(geom, history_length, 0.0)


def reflections_pass(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    visibility_fn: Callable,
    gb_scaled: GBuffer,
    prev_gb_scaled: GBuffer,
    gb_full: GBuffer,
    camera: Camera,
    camera_delta,
    light: Light,
    sky_radiance_fn: Callable,
    state: ReflectionsState,
    frame_index,
    cfg: ReflectionsConfig,
    gi_sample_fn: Optional[Callable] = None,
    env_prefiltered_fn: Optional[Callable] = None,
):
    """Full reflections pipeline (ray_traced_reflections.cpp:107-123)."""
    raw, ray_length = ray_trace(
        scene, closest_surface_fn, visibility_fn, gb_scaled, camera, light,
        sky_radiance_fn, frame_index, cfg, gi_sample_fn, env_prefiltered_fn,
    )

    if not cfg.denoise:
        final = raw
        if cfg.scale != 0:
            final = filters.upsample_edge_aware(
                raw, gb_scaled.normal, gb_scaled.linear_z,
                gb_full.normal, gb_full.linear_z, int(cfg.scale),
            )
        return ReflectionsOutputs(raw, ray_length, raw, raw, final), state

    color, variance, moments, hist_len = temporal_accumulation(
        raw, ray_length, gb_scaled, prev_gb_scaled, camera, camera_delta,
        state, cfg,
    )
    temporal_out = color

    # denoise only 0.05 <= roughness <= 0.75 pixels; mirror / DDGI-approx
    # tiles pass through (comp:262-288, reflections_denoise_copy_tiles)
    denoise_mask = (
        (gb_scaled.mesh_id >= 0)
        & (gb_scaled.roughness >= cfg.mirror_roughness_threshold)
        & (gb_scaled.roughness <= cfg.ddgi_roughness_threshold)
    )
    feedback = color
    out = color
    from hybrid_rendering_tpu.ops.bvh import _is_tpu_backend

    if cfg.atrous_iterations > 0 and _is_tpu_backend():
        from hybrid_rendering_tpu.ops.pallas.stencil import atrous_chain

        steps = tuple(1 << i for i in range(cfg.atrous_iterations))
        out, feedback, variance = atrous_chain(
            color, variance, gb_scaled.normal, gb_scaled.linear_z,
            denoise_mask, steps=steps, radius=cfg.atrous_radius,
            phi_color=cfg.phi_color, phi_normal=cfg.phi_normal,
            sigma_depth=cfg.sigma_depth,
            feedback_iteration=cfg.feedback_iteration,
        )
    else:
        for i in range(cfg.atrous_iterations):
            out, variance = filters.atrous_iteration(
                out, variance, gb_scaled.normal, gb_scaled.linear_z,
                step=1 << i,
                radius=cfg.atrous_radius,
                phi_color=cfg.phi_color,
                phi_normal=cfg.phi_normal,
                sigma_depth=cfg.sigma_depth,
                mask=denoise_mask,
            )
            if i == cfg.feedback_iteration:
                feedback = out

    new_state = ReflectionsState(
        history=feedback, moments=moments, history_length=hist_len
    )

    final = out
    if cfg.scale != 0:
        final = filters.upsample_edge_aware(
            out, gb_scaled.normal, gb_scaled.linear_z,
            gb_full.normal, gb_full.linear_z, int(cfg.scale),
        )
    return ReflectionsOutputs(raw, ray_length, temporal_out, out, final), new_state
