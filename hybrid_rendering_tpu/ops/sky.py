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
class PreethamSky:
    """Preetham analytic daylight model — the physically-based procedural
    sky standing in for the reference's Hosek-Wilkie extra
    (SURVEY §2.9 HosekWilkieSkyModel; re-rendered per frame on light
    changes, main.cpp:976-990 — here it's just a function of direction so
    there is nothing to re-render). Perez luminance/chromaticity
    distributions driven by turbidity."""

    sun_direction: jnp.ndarray  # (3,) toward the sun
    turbidity: jnp.ndarray  # ()
    exposure: jnp.ndarray  # () output scale

    @staticmethod
    def create(sun_direction, turbidity=2.5, exposure=0.05):
        d = jnp.asarray(sun_direction, jnp.float32)
        return PreethamSky(
            sun_direction=d / jnp.linalg.norm(d),
            turbidity=jnp.float32(turbidity),
            exposure=jnp.float32(exposure),
        )

    def _perez(self, theta, gamma, A, B, C, D, E):
        cos_t = jnp.maximum(jnp.cos(theta), 1e-3)
        return (1.0 + A * jnp.exp(B / cos_t)) * (
            1.0 + C * jnp.exp(D * gamma) + E * jnp.cos(gamma) ** 2
        )

    def radiance(self, dirs):
        d = normalize(dirs)
        T = self.turbidity
        sun = self.sun_direction
        cos_theta = jnp.clip(d[..., 1], 0.0, 1.0)
        theta = jnp.arccos(cos_theta)
        cos_gamma = jnp.clip(dot(d, jnp.broadcast_to(sun, d.shape)), -1.0, 1.0)
        gamma = jnp.arccos(cos_gamma)
        theta_s = jnp.arccos(jnp.clip(sun[1], 0.0, 1.0))

        # Perez coefficients (Preetham et al. 1999, A Practical Analytic
        # Model for Daylight)
        AY = 0.1787 * T - 1.4630
        BY = -0.3554 * T + 0.4275
        CY = -0.0227 * T + 5.3251
        DY = 0.1206 * T - 2.5771
        EY = -0.0670 * T + 0.3703
        Ax = -0.0193 * T - 0.2592
        Bx = -0.0665 * T + 0.0008
        Cx = -0.0004 * T + 0.2125
        Dx = -0.0641 * T - 0.8989
        Ex = -0.0033 * T + 0.0452
        Az = -0.0167 * T - 0.2608
        Bz = -0.0950 * T + 0.0092
        Cz = -0.0079 * T + 0.2102
        Dz = -0.0441 * T - 1.6537
        Ez = -0.0109 * T + 0.0529

        chi = (4.0 / 9.0 - T / 120.0) * (jnp.pi - 2.0 * theta_s)
        Yz = (4.0453 * T - 4.9710) * jnp.tan(chi) - 0.2155 * T + 2.4192
        ts2, ts3 = theta_s**2, theta_s**3
        Tv = jnp.stack([T * T, T, jnp.ones_like(T)])
        xz = jnp.dot(
            Tv,
            jnp.stack([
                0.00166 * ts3 - 0.00375 * ts2 + 0.00209 * theta_s,
                -0.02903 * ts3 + 0.06377 * ts2 - 0.03202 * theta_s + 0.00394,
                0.11693 * ts3 - 0.21196 * ts2 + 0.06052 * theta_s + 0.25886,
            ]),
        )
        zz = jnp.dot(
            Tv,
            jnp.stack([
                0.00275 * ts3 - 0.00610 * ts2 + 0.00317 * theta_s,
                -0.04214 * ts3 + 0.08970 * ts2 - 0.04153 * theta_s + 0.00516,
                0.15346 * ts3 - 0.26756 * ts2 + 0.06670 * theta_s + 0.26688,
            ]),
        )

        def ratio(A, B, C, D, E, zenith):
            num = self._perez(theta, gamma, A, B, C, D, E)
            den = self._perez(jnp.zeros_like(theta), theta_s, A, B, C, D, E)
            return zenith * num / jnp.maximum(den, 1e-6)

        Y = ratio(AY, BY, CY, DY, EY, Yz)  # luminance (kcd/m2-ish)
        x = ratio(Ax, Bx, Cx, Dx, Ex, xz)  # CIE x chromaticity
        y_c = jnp.maximum(ratio(Az, Bz, Cz, Dz, Ez, zz), 1e-6)  # CIE y

        # xyY -> XYZ -> linear sRGB
        X = x / y_c * Y
        Z = (1.0 - x - y_c) / y_c * Y
        r = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
        g = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
        b = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
        rgb = jnp.maximum(jnp.stack([r, g, b], axis=-1), 0.0) * self.exposure

        # sun disc
        disc = (cos_gamma > 0.9996).astype(jnp.float32)[..., None]
        rgb = rgb + disc * jnp.asarray([1.0, 0.95, 0.85]) * 50.0 * self.exposure

        below = (d[..., 1] < 0.0)[..., None]
        ground = jnp.asarray([0.12, 0.10, 0.09]) * jnp.ones_like(rgb) * (
            0.5 + 0.5 * jnp.clip(sun[1], 0.0, 1.0)
        )
        return jnp.where(below, ground, rgb)


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
