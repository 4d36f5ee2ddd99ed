"""Ground-truth progressive path tracer — the fidelity oracle.

Behavioural twin of the reference GroundTruthPathTracer
(src/ground_truth_path_tracer.{h,cpp} + src/shaders/ground_truth/*):
per-pixel xoroshiro RNG seeded by pixel id + frame index, jittered primary
ray, per-bounce direct lighting (soft-shadowed punctual light + cosine-
sampled sky light) with path throughput, BRDF-sampled indirect bounce with
Russian roulette, radiance clamped to RADIANCE_CLAMP_COLOR (=1), and
running-mean accumulation ``prev + (c - prev)/num_frames``
(ground_truth_path_trace.rgen:94-111).

One deliberate upgrade: the reference ships with its recursive indirect
bounce commented out (ground_truth_path_trace.rchit:94-105) so it only
renders direct lighting + environment. Here the bounce loop is LIVE —
recursion becomes a bounded wavefront loop (TPU has no recursion, and
doesn't need it: the payload stack becomes carried loop state over the
whole ray batch).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import PathTracerConfig
from hybrid_rendering_tpu.ops import brdf as brdf_ops
from hybrid_rendering_tpu.ops import lighting, rng as rng_ops
from hybrid_rendering_tpu.ops.math3d import INF_T, dot, normalize
from hybrid_rendering_tpu.types import Camera, Light, SceneArrays
from hybrid_rendering_tpu.utils import camera as camera_utils

RADIANCE_CLAMP = 1.0  # common.glsl:19 RADIANCE_CLAMP_COLOR


@struct.dataclass
class GroundTruthState:
    """Progressive accumulation state (ping-pong pair in the reference,
    ground_truth_path_tracer.h; here a single donated buffer)."""

    color: jax.Array  # (H, W, 3) running mean
    num_frames: jax.Array  # () int32

    @staticmethod
    def create(height: int, width: int):
        return GroundTruthState(
            color=jnp.zeros((height, width, 3), jnp.float32),
            num_frames=jnp.int32(0),
        )

    def restart(self):
        """restart_accumulation() — reference resets the frame counter on
        any camera/light/scene change (ground_truth_path_tracer.h:17)."""
        return self.replace(num_frames=jnp.int32(0))


def trace_wavefront(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    visibility_fn: Callable,
    light: Light,
    sky_radiance_fn: Callable,
    origin,
    direction,
    rng,
    cfg: PathTracerConfig = PathTracerConfig(),
):
    """Path-trace a flat wavefront of rays. origin/direction: (R,3);
    rng: per-ray RNG state. Returns (R,3) clamped radiance.

    This is the recursion-free core: the reference's recursive
    traceRayEXT payload stack becomes carried loop state over the whole
    batch (SURVEY §2.10.7)."""
    R = origin.shape[0]
    L = jnp.zeros((R, 3), jnp.float32)
    T = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones((R,), bool)

    for depth in range(cfg.max_ray_bounces):
        # dead rays get t_max = 0: packets that fully died (RR, misses)
        # produce empty cluster lists in the sparse prepass and trace
        # nothing at later depths
        hit, surf = closest_surface_fn(
            origin, direction,
            INF_T if depth == 0 else jnp.where(alive, INF_T, 0.0))
        miss = ~hit.valid

        # environment on miss (rmiss: depth 0 -> raw env, else T * env)
        env = sky_radiance_fn(direction)
        env_contrib = env if depth == 0 else T * env
        L = jnp.where((alive & miss)[:, None], L + env_contrib, L)
        alive = alive & hit.valid

        wo = -direction
        n = surf.normal
        p = surf.position

        f0 = brdf_ops.f0_from_metallic(surf.albedo, surf.metallic)
        # c_diffuse = mix(albedo*(1-F0), 0, metallic) (rchit:135)
        c_diffuse = surf.albedo * (1.0 - f0) * (1.0 - surf.metallic[:, None])

        rng, rs = rng_ops.next_vec2(rng)
        rng, rsky = rng_ops.next_vec2(rng)
        alive_now = alive

        def vis_alive(o_, d_, tm_, _alive=alive_now):
            return visibility_fn(o_, d_, jnp.where(_alive, tm_, 0.0))

        lo = lighting.direct_lighting(
            light, wo, n, p, f0, c_diffuse, surf.roughness,
            visibility_fn=vis_alive,
            throughput=T,
            rng_shadow=rs,
            rng_sky=rsky if cfg.sample_sky else None,
            sky_radiance_fn=sky_radiance_fn if cfg.sample_sky else None,
            ray_origin_bias=cfg.shadow_ray_bias,
        )
        L = jnp.where(alive[:, None], L + lo + T * surf.emissive, L)

        if depth + 1 >= cfg.max_ray_bounces:
            break

        # indirect bounce (rchit indirect_lighting:66-105)
        rng, r3 = rng_ops.next_vec3(rng)
        brdf_val, wi, pdf = brdf_ops.sample_uber_brdf(
            c_diffuse, f0, n, surf.roughness, wo, r3
        )
        cos_theta = jnp.clip(dot(n, wi), 0.0, 1.0)
        T_new = T * brdf_val * cos_theta[:, None] / jnp.maximum(pdf, 1e-6)[:, None]

        # Russian roulette on max throughput component; clamp the survival
        # probability to 1 so high-throughput (specular) paths aren't biased
        # low by dividing through by prob > 1.
        prob = jnp.minimum(jnp.max(T_new, axis=-1), 1.0)
        rng, rr = rng_ops.next_float(rng)
        survive = rr <= prob
        T = T_new / jnp.maximum(prob, 1e-6)[:, None]
        alive = alive & survive & (cos_theta > 0.0)

        origin = p + surf.geo_normal * 1e-3
        direction = wi

    return jnp.minimum(L, RADIANCE_CLAMP)


def trace_sample(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    visibility_fn: Callable,
    camera: Camera,
    light: Light,
    sky_radiance_fn: Callable,
    width: int,
    height: int,
    frame_index,
    cfg: PathTracerConfig = PathTracerConfig(),
):
    """One 1-spp path-traced sample of the frame. Returns (H, W, 3) radiance
    (already clamped to RADIANCE_CLAMP as the reference does pre-average)."""
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.uint32),
        jnp.arange(width, dtype=jnp.uint32),
        indexing="ij",
    )
    rng = rng_ops.rng_init(xx.reshape(-1), yy.reshape(-1), frame_index)

    # jittered primary ray (rgen:56-60)
    rng, jit2 = rng_ops.next_vec2(rng)
    origins, dirs = camera_utils.camera_rays(
        camera, width, height, jitter_uv=jit2.reshape(height, width, 2)
    )
    L = trace_wavefront(
        scene, closest_surface_fn, visibility_fn, light, sky_radiance_fn,
        origins.reshape(-1, 3), dirs.reshape(-1, 3), rng, cfg,
    )
    return L.reshape(height, width, 3)


def accumulate(state: GroundTruthState, sample):
    """Running mean (rgen:94-111): first frame overwrites, later frames
    blend prev + (c - prev)/num_frames."""
    nf = state.num_frames
    first = nf == 0
    blended = state.color + (sample - state.color) / jnp.maximum(nf, 1).astype(jnp.float32)
    color = jnp.where(first, sample, blended)
    return GroundTruthState(color=color, num_frames=nf + 1)


def render_progressive(
    scene: SceneArrays,
    closest_surface_fn,
    visibility_fn,
    camera: Camera,
    light: Light,
    sky_radiance_fn,
    width: int,
    height: int,
    num_samples: int,
    cfg: PathTracerConfig = PathTracerConfig(),
    state: GroundTruthState | None = None,
):
    """Convenience host loop: accumulate num_samples progressive frames.
    Each sample is one jitted device program; the accumulator buffer is
    donated between iterations."""
    if state is None:
        state = GroundTruthState.create(height, width)

    @partial(jax.jit, donate_argnums=(0,))
    def step(st):
        s = trace_sample(
            scene, closest_surface_fn, visibility_fn, camera, light, sky_radiance_fn,
            width, height, st.num_frames, cfg,
        )
        return accumulate(st, s)

    for _ in range(num_samples):
        state = step(state)
    return state
