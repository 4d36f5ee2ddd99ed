"""Ray-traced soft shadows with SVGF denoising.

Behavioural twin of src/ray_traced_shadows.{h,cpp} + src/shaders/shadows/*:
  ray_trace -> temporal accumulation -> a-trous x N -> (upsample if scaled)

TPU redesign notes (SURVEY §2.10):
  - the 32-ray bitmask packing (shadows_ray_trace.comp:83-131) becomes a
    dense f32 visibility plane — no atomics exist or are needed;
  - tile classification + indirect dispatch (comp:274-292) becomes dense
    masked execution;
  - the a-trous feedback copy at iteration 1 (cpp:1177-1207) is just
    capturing the loop value — no image copies.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import ShadowsConfig
from hybrid_rendering_tpu.ops import bluenoise, filters, rng as rng_ops
from hybrid_rendering_tpu.ops.lighting import fetch_light_properties
from hybrid_rendering_tpu.ops.reprojection import reproject
from hybrid_rendering_tpu.types import Camera, GBuffer, Light


@struct.dataclass
class ShadowsState:
    """Temporal state (the reference's history/moments image pair,
    ray_traced_shadows.h:120-135)."""

    history: jax.Array  # (h,w) denoised visibility fed back at iteration 1
    moments: jax.Array  # (h,w,2)
    history_length: jax.Array  # (h,w)

    @staticmethod
    def create(height: int, width: int):
        return ShadowsState(
            history=jnp.zeros((height, width), jnp.float32),
            moments=jnp.zeros((height, width, 2), jnp.float32),
            history_length=jnp.zeros((height, width), jnp.float32),
        )


class ShadowsOutputs(NamedTuple):
    """Per-stage debug outputs (reference output_ds() switching,
    ray_traced_shadows.cpp:135-155)."""

    ray_trace: jax.Array
    temporal: jax.Array
    atrous: jax.Array
    final: jax.Array  # full-res visibility


def make_rays(gb: GBuffer, light: Light, frame_index, cfg: ShadowsConfig):
    """Shadow ray-gen (shadows_ray_trace.comp:73-131): blue-noise disk
    sample on the light, biased origin, masked t_max. Returns
    (origin, dir, t_max, att) — split from the trace so the renderer can
    batch this wavefront with AO's into one launch (visibility_fn.many)."""
    h, w = gb.depth.shape
    # blue-noise light-disk sample (reference uses BLUE_NOISE_1SPP,
    # shadows_ray_trace.comp:73-77)
    u, v = bluenoise.sample2d_grid(h, w, frame_index, dim=0)
    r2 = jnp.stack([u, v], axis=-1)

    p = gb.position
    n = gb.normal
    _, wi, t_max, att = fetch_light_properties(
        light, p, n, rng2=r2 if cfg.soft_shadows else None,
        soft_shadows=cfg.soft_shadows,
    )
    origin = p + n * cfg.bias
    # t_max = 0 for pixels whose result is masked anyway (sky, zero
    # attenuation outside a spot cone): packets that are fully masked
    # produce empty cluster lists in the sparse-tracer prepass and skip
    # ALL kernel work (packet_cluster_lists culls on per-packet max t)
    live = (gb.mesh_id >= 0) & (att > 0.0)
    return origin, wi, jnp.where(live, t_max, 0.0), att


def finish_rays(vis, gb: GBuffer, att) -> jax.Array:
    """Mask the traced visibility back to the image (sky pixels -> 0)."""
    vis = jnp.where(att > 0.0, vis, 0.0)
    return jnp.where(gb.mesh_id >= 0, vis, 0.0)


def ray_trace(
    visibility_fn: Callable,
    gb: GBuffer,
    light: Light,
    frame_index,
    cfg: ShadowsConfig,
) -> jax.Array:
    """1 shadow ray/pixel with blue-noise disk sampling on the light
    (shadows_ray_trace.comp:73-131). Sky pixels get visibility 0."""
    origin, wi, t_max, att = make_rays(gb, light, frame_index, cfg)
    vis = visibility_fn(origin, wi, t_max)
    return finish_rays(vis, gb, att)


def temporal_accumulation(
    raw: jax.Array,
    gb: GBuffer,
    prev_gb: GBuffer,
    state: ShadowsState,
    cfg: ShadowsConfig,
):
    """SVGF temporal pass (shadows_denoise_reprojection.comp:196-280):
    17x17 neighborhood mean for the history clamp (binary signal =>
    variance = mean - mean^2), alpha boosted by 1/history_length, moments
    EMA, variance estimate. Returns (visibility, variance, moments,
    history_length)."""
    geom = gb.mesh_id >= 0

    rep = reproject(
        gb, prev_gb, state.history,
        history_moments=state.moments,
        history_length=state.history_length,
    )
    success = rep.valid & geom
    history_length = jnp.minimum(
        cfg.history_cap, jnp.where(success, rep.history_length + 1.0, 1.0)
    )

    mean = filters.box_filter_sum(raw, 8) / (17.0 * 17.0)
    # binary signal: E[x^2] = E[x] (comp:242-246)
    std = jnp.sqrt(jnp.maximum(mean - mean * mean, 0.0))
    k = cfg.clamp_std_factor  # comp:246-247 hardcodes 0.5; see config.py
    hist = jnp.clip(rep.history, mean - k * std, mean + k * std)
    hist = jnp.where(success, hist, 0.0)

    alpha = jnp.where(success, jnp.maximum(cfg.alpha, 1.0 / history_length), 1.0)
    alpha_m = jnp.where(
        success, jnp.maximum(cfg.moments_alpha, 1.0 / history_length), 1.0
    )

    cur_moments = jnp.stack([raw, raw * raw], axis=-1)
    prev_moments = jnp.where(success[..., None], rep.history_moments, 0.0)
    moments = prev_moments + (cur_moments - prev_moments) * alpha_m[..., None]
    variance = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    visibility = hist + (raw - hist) * alpha

    visibility = jnp.where(geom, visibility, 0.0)
    variance = jnp.where(geom, variance, 0.0)
    moments = jnp.where(geom[..., None], moments, 0.0)
    history_length = jnp.where(geom, history_length, 0.0)
    return visibility, variance, moments, history_length


def shadows_pass(
    visibility_fn: Callable,
    gb_scaled: GBuffer,
    prev_gb_scaled: GBuffer,
    gb_full: GBuffer,
    light: Light,
    state: ShadowsState,
    frame_index,
    cfg: ShadowsConfig,
    raw=None,
):
    """Full shadows pipeline (ray_traced_shadows.cpp:100-116). Returns
    (outputs, new_state). gb_scaled is the mip-matched G-buffer for the
    configured RayTraceScale; gb_full drives the upsample. raw: an
    already-traced visibility plane (the renderer's batched wavefront);
    None traces here."""
    if raw is None:
        raw = ray_trace(visibility_fn, gb_scaled, light, frame_index, cfg)

    if not cfg.denoise:
        final = raw
        if cfg.scale != 0:
            final = filters.upsample_edge_aware(
                raw, gb_scaled.normal, gb_scaled.linear_z,
                gb_full.normal, gb_full.linear_z, int(cfg.scale),
            )
        return ShadowsOutputs(raw, raw, raw, final), state

    vis, variance, moments, hist_len = temporal_accumulation(
        raw, gb_scaled, prev_gb_scaled, state, cfg
    )
    temporal_out = vis

    geom = gb_scaled.mesh_id >= 0
    feedback = vis
    from hybrid_rendering_tpu.ops.bvh import _is_tpu_backend

    if cfg.atrous_iterations > 0 and _is_tpu_backend():
        # fused whole-image Pallas chain: the XLA pad+slice formulation
        # materializes every tap to HBM (~40 ms at 1080p full-res)
        from hybrid_rendering_tpu.ops.pallas.stencil import atrous_chain

        steps = tuple(1 << i for i in range(cfg.atrous_iterations))
        vis, feedback, variance = atrous_chain(
            vis, variance, gb_scaled.normal, gb_scaled.linear_z, geom,
            steps=steps, radius=cfg.atrous_radius,
            phi_color=cfg.phi_visibility, phi_normal=cfg.phi_normal,
            sigma_depth=cfg.sigma_depth,
            feedback_iteration=cfg.feedback_iteration,
        )
        vis = jnp.power(jnp.maximum(vis, 0.0), cfg.power)  # comp:170-171
    else:
        for i in range(cfg.atrous_iterations):
            vis, variance = filters.atrous_iteration(
                vis, variance, gb_scaled.normal, gb_scaled.linear_z,
                step=1 << i,
                radius=cfg.atrous_radius,
                phi_color=cfg.phi_visibility,
                phi_normal=cfg.phi_normal,
                sigma_depth=cfg.sigma_depth,
                mask=geom,
            )
            if i == cfg.feedback_iteration:
                feedback = vis  # history feedback copy (cpp:1177-1207)
            if i == cfg.atrous_iterations - 1:
                vis = jnp.power(jnp.maximum(vis, 0.0),
                                cfg.power)  # comp:170-171

    new_state = ShadowsState(
        history=feedback, moments=moments, history_length=hist_len
    )

    final = vis
    if cfg.scale != 0:
        final = filters.upsample_edge_aware(
            vis, gb_scaled.normal, gb_scaled.linear_z,
            gb_full.normal, gb_full.linear_z, int(cfg.scale),
        )
    return ShadowsOutputs(raw, temporal_out, vis, final), new_state
