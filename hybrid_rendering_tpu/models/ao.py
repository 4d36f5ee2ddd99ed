"""Ray-traced ambient occlusion with temporal accumulation + bilateral blur.

Behavioural twin of src/ray_traced_ao.{h,cpp} + src/shaders/ao/*
(SURVEY §2.5): cosine-lobe hemisphere ray of finite length (default 7.0,
bias 0.3), single-channel temporal reprojection WITHOUT moments (separate
history-length plane), separable bilateral Gaussian blur (not a-trous), and
pow(ao, power) applied at upsample. Default scale HALF
(ray_traced_ao.h:23)."""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import AOConfig
from hybrid_rendering_tpu.ops import (
    bluenoise, brdf as brdf_ops, filters, rng as rng_ops,
)
from hybrid_rendering_tpu.ops.reprojection import reproject
from hybrid_rendering_tpu.types import GBuffer


@struct.dataclass
class AOState:
    history: jax.Array  # (h,w)
    history_length: jax.Array  # (h,w)

    @staticmethod
    def create(height: int, width: int):
        return AOState(
            history=jnp.zeros((height, width), jnp.float32),
            history_length=jnp.zeros((height, width), jnp.float32),
        )


class AOOutputs(NamedTuple):
    ray_trace: jax.Array
    temporal: jax.Array
    blur: jax.Array
    final: jax.Array


def make_rays(gb: GBuffer, frame_index, cfg: AOConfig):
    """AO ray-gen (ao_ray_trace.comp:90-126): cosine-lobe sample, biased
    origin, finite masked t_max. Split from the trace so the renderer can
    batch this wavefront with shadows' into one launch."""
    h, w = gb.depth.shape
    # per-pixel cosine sample (reference ao_ray_trace.comp:90-126). A
    # g x g block-shared-sample variant ("sample_granularity") was
    # measured in r4 at 14.4 s vs 114 ms per-pixel on TPU (clusters/
    # packet barely moved, 4.98 -> 4.47, and the repeat defeated the
    # packet linearization) — deleted, per-pixel is the only mode.
    u, v = bluenoise.sample2d_grid(h, w, frame_index, dim=1)
    r2 = jnp.stack([u, v], axis=-1)

    wi = brdf_ops.sample_cosine_lobe(gb.normal, r2)
    origin = gb.position + gb.normal * cfg.bias
    # sky pixels: t_max = 0 so fully-sky packets trace nothing (the
    # sparse prepass culls on per-packet max t)
    geom = gb.mesh_id >= 0
    return origin, wi, jnp.where(geom, cfg.ray_length, 0.0)


def finish_rays(vis, gb: GBuffer) -> jax.Array:
    """Mask the traced visibility back to the image (sky pixels -> 1)."""
    return jnp.where(gb.mesh_id >= 0, vis, 1.0)


def ray_trace(
    visibility_fn: Callable,
    gb: GBuffer,
    frame_index,
    cfg: AOConfig,
) -> jax.Array:
    """1 cosine-lobe occlusion ray/pixel, finite length
    (ao_ray_trace.comp:90-126)."""
    origin, wi, t_max = make_rays(gb, frame_index, cfg)
    vis = visibility_fn(origin, wi, t_max)
    return finish_rays(vis, gb)


def temporal_accumulation(
    raw: jax.Array,
    gb: GBuffer,
    prev_gb: GBuffer,
    state: AOState,
    cfg: AOConfig,
):
    """Single-channel reprojection without moments
    (ao_denoise_reprojection.comp:222-259)."""
    geom = gb.mesh_id >= 0
    rep = reproject(gb, prev_gb, state.history, history_length=state.history_length)
    success = rep.valid & geom
    history_length = jnp.minimum(
        cfg.history_cap, jnp.where(success, rep.history_length + 1.0, 1.0)
    )
    alpha = jnp.where(success, jnp.maximum(cfg.alpha, 1.0 / history_length), 1.0)
    hist = jnp.where(success, rep.history, 0.0)
    ao = hist + (raw - hist) * alpha
    ao = jnp.where(geom, ao, 1.0)
    return ao, history_length


def ao_pass(
    visibility_fn: Callable,
    gb_scaled: GBuffer,
    prev_gb_scaled: GBuffer,
    gb_full: GBuffer,
    state: AOState,
    frame_index,
    cfg: AOConfig,
    raw=None,
):
    """Full AO pipeline (ray_traced_ao.cpp:98-112). Returns
    (outputs, new_state). raw: an already-traced visibility plane (the
    renderer's batched wavefront); None traces here."""
    if raw is None:
        raw = ray_trace(visibility_fn, gb_scaled, frame_index, cfg)

    if not cfg.denoise:
        ao = raw
        temporal_out = raw
        hist_len = state.history_length
    else:
        ao, hist_len = temporal_accumulation(raw, gb_scaled, prev_gb_scaled, state, cfg)
        temporal_out = ao
        from hybrid_rendering_tpu.ops.bvh import _is_tpu_backend

        if _is_tpu_backend():
            from hybrid_rendering_tpu.ops.pallas.stencil import (
                bilateral_blur,
            )

            ao = bilateral_blur(
                ao, gb_scaled.normal, gb_scaled.linear_z,
                gb_scaled.mesh_id >= 0, radius=cfg.blur_radius,
            )
        else:
            ao = filters.bilateral_blur_separable(
                ao, gb_scaled.normal, gb_scaled.linear_z,
                radius=cfg.blur_radius, mask=gb_scaled.mesh_id >= 0,
            )

    new_state = AOState(history=ao, history_length=hist_len)

    final = ao
    if cfg.scale != 0:
        final = filters.upsample_edge_aware(
            ao, gb_scaled.normal, gb_scaled.linear_z,
            gb_full.normal, gb_full.linear_z, int(cfg.scale),
        )
    # pow() darkening applied at the final stage (ao_upsample.comp:108)
    final = jnp.power(jnp.clip(final, 0.0, 1.0), cfg.power)
    return AOOutputs(raw, temporal_out, ao, final), new_state
