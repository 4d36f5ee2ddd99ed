"""Environment / sky radiance.

The reference's environment stack (SURVEY §2.2): procedural Hosek-Wilkie sky
rendered to a cubemap + SH projection + GGX prefilter, or loaded HDR
cubemaps, or "None" (black). Round 1 provides:

  - ``ProceduralSky``: an analytic Preetham-style clear sky with sun disc —
    a closed-form stand-in evaluated per-direction (no cubemap resampling
    needed on TPU: directions are already batched arrays). Hosek-Wilkie
    coefficients land in a later round.
  - ``ConstantSky`` / black.

Every sky exposes ``radiance(dirs) -> (...,3)`` — the TPU-native equivalent
of sampling the skybox cubemap (reference *.rmiss shaders).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.ops.math3d import dot, normalize


@struct.dataclass
class ConstantSky:
    color: jnp.ndarray  # (3,)

    def radiance(self, dirs):
        return jnp.broadcast_to(self.color, dirs.shape[:-1] + (3,))


@struct.dataclass
class ProceduralSky:
    """Analytic clear-sky: Rayleigh-ish gradient + sun glow + ground.
    Parameterized by sun direction (pointing TOWARD the sun)."""

    sun_direction: jnp.ndarray  # (3,)
    sun_intensity: jnp.ndarray  # ()
    turbidity: jnp.ndarray  # ()

    @staticmethod
    def create(sun_direction, sun_intensity=20.0, turbidity=2.5):
        d = jnp.asarray(sun_direction, jnp.float32)
        return ProceduralSky(
            sun_direction=d / jnp.linalg.norm(d),
            sun_intensity=jnp.float32(sun_intensity),
            turbidity=jnp.float32(turbidity),
        )

    def radiance(self, dirs):
        d = normalize(dirs)
        sun = self.sun_direction
        cos_gamma = jnp.clip(dot(d, jnp.broadcast_to(sun, d.shape)), -1.0, 1.0)
        up = jnp.clip(d[..., 1], -1.0, 1.0)

        # horizon->zenith gradient
        zenith = jnp.array([0.22, 0.45, 0.90], jnp.float32)
        horizon = jnp.array([0.80, 0.85, 0.95], jnp.float32)
        t = jnp.clip(up, 0.0, 1.0)[..., None] ** 0.5
        sky = horizon + (zenith - horizon) * t

        # circumsolar glow + sun disc
        glow = jnp.exp((cos_gamma - 1.0) * 12.0)[..., None] * jnp.array(
            [1.0, 0.85, 0.6], jnp.float32
        )
        disc = (cos_gamma > 0.9996)[..., None].astype(jnp.float32) * jnp.array(
            [1.0, 0.95, 0.85], jnp.float32
        )

        below = (up < 0.0)[..., None]
        ground = jnp.array([0.12, 0.10, 0.09], jnp.float32) * jnp.ones_like(sky)

        sun_h = jnp.clip(sun[1], 0.0, 1.0)
        result = sky * (0.2 + 0.8 * sun_h) + glow * 0.5 * sun_h + disc * self.sun_intensity
        return jnp.where(below, ground, result)
