"""Hosek-Wilkie sky model (functional form, runtime-fitted parameters).

The reference renders its procedural sky with the dw framework's
HosekWilkieSkyModel extra (src/common.cpp:541-546, re-rendered per frame
on light-direction change, src/main.cpp:976-990), which evaluates the
Hosek-Wilkie 2012 analytic radiance

    F(theta, gamma) = (1 + A e^{B/(cos theta + 0.01)}) *
        (C + D e^{E gamma} + F cos^2 gamma + G chi(H, gamma)
         + I sqrt(max(cos theta, 0)))
    chi(g, a) = (1 + cos^2 a) / (1 + g^2 - 2 g cos a)^{3/2}

with per-channel parameters read from the published ArHosekSkyModel
dataset (~3 MB of turbidity x albedo x solar-elevation Bezier control
points). That dataset is not reproducible from first principles and is
unavailable in this offline build, so this module implements the EXACT
functional form with parameters obtained by an alternating least-squares
fit to the Preetham daylight field at construction time (per sun
direction + turbidity). The fit preserves the HW form's extra degrees of
freedom (the chi anisotropy around the sun and the sqrt-zenith term, both
absent from Perez/Preetham). Swapping in the published tables (a
`params_rgb` array of 9 values per channel) recovers the exact reference
model; everything downstream only consumes `radiance(dirs)`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.ops.math3d import dot, normalize


def chi(g, cos_alpha):
    return (1.0 + cos_alpha * cos_alpha) / jnp.power(
        1.0 + g * g - 2.0 * g * cos_alpha, 1.5
    )


def hw_radiance_channel(cos_theta, cos_gamma, gamma, params):
    """Evaluate the HW form for one channel. params: (9,) [A..I]."""
    A, B, C, D, E, F, G, H, I = [params[i] for i in range(9)]
    up = 1.0 + A * jnp.exp(B / (jnp.maximum(cos_theta, 0.0) + 0.01))
    lobe = (
        C
        + D * jnp.exp(E * gamma)
        + F * cos_gamma * cos_gamma
        + G * chi(H, cos_gamma)
        + I * jnp.sqrt(jnp.maximum(cos_theta, 0.0))
    )
    return jnp.maximum(up * lobe, 0.0)


def _fit_channel_fixed(ct, cg, g, y, B, E, H, iters=4):
    """Alternating linear least squares for (A, C, D, F, G, I) with the
    nonlinear shape constants (B, E, H) fixed. Returns (params, sse)."""
    e_up = np.exp(B / (np.maximum(ct, 0.0) + 0.01))
    basis = np.stack(
        [
            np.ones_like(g),
            np.exp(E * g),
            cg * cg,
            np.asarray(chi(H, jnp.asarray(cg))),
            np.sqrt(np.maximum(ct, 0.0)),
        ],
        axis=-1,
    )  # (N, 5) -> C D F G I
    A = 0.0
    coef = np.zeros(5)
    for _ in range(iters):
        up = 1.0 + A * e_up
        coef, *_ = np.linalg.lstsq(basis * up[:, None], y, rcond=None)
        lobe = basis @ coef
        denom = np.sum((e_up * lobe) ** 2) + 1e-12
        A = float(np.sum((y - lobe) * e_up * lobe) / denom)
        A = float(np.clip(A, -0.99, 5.0))
    C, D, F, G, I = coef
    pred = (1.0 + A * e_up) * (basis @ coef)
    # relative error objective (matches how sky error is perceived)
    sse = float(np.sum(((pred - y) / (np.abs(y) + 1e-3)) ** 2))
    return np.asarray([A, B, C, D, E, F, G, H, I], np.float64), sse


def _fit_channel(cos_theta, cos_gamma, gamma, y):
    """Coarse grid search over the nonlinear shape constants (B, E, H)
    around canonical HW ranges + alternating LS for the linear ones."""
    ct = np.asarray(cos_theta, np.float64)
    cg = np.asarray(cos_gamma, np.float64)
    g = np.asarray(gamma, np.float64)
    y = np.asarray(y, np.float64)
    best = None
    for B in (-0.05, -0.15, -0.4, -1.0):
        for E in (-1.0, -2.5, -5.0):
            for H in (0.6, 0.8):
                params, sse = _fit_channel_fixed(ct, cg, g, y, B, E, H)
                if best is None or sse < best[1]:
                    best = (params, sse)
    return best[0]


@struct.dataclass
class HosekWilkieSky:
    """HW-form sky; `params_rgb` (3, 9) per-channel [A..I]."""

    sun_direction: jnp.ndarray  # (3,)
    params_rgb: jnp.ndarray  # (3, 9)
    ground_albedo: jnp.ndarray  # (3,)

    @staticmethod
    def create(sun_direction, turbidity: float = 2.5,
               ground_albedo=(0.12, 0.11, 0.10), num_fit: int = 4096,
               seed: int = 0):
        """Fit the HW form to the Preetham+sun field for this sun/turbidity
        (see module docstring for why the published tables are not used)."""
        from hybrid_rendering_tpu.ops.sky import PreethamSky

        sun = np.asarray(sun_direction, np.float32)
        sun = sun / np.linalg.norm(sun)
        target = PreethamSky.create(sun, turbidity=turbidity)

        rs = np.random.RandomState(seed)
        # fit over the upper hemisphere, denser near horizon + sun
        u = rs.uniform(size=(num_fit, 2))
        ct = u[:, 0] ** 1.5  # horizon-weighted cos(theta)
        phi = 2.0 * np.pi * u[:, 1]
        st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
        dirs = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], -1)
        # extra samples in the circumsolar region (the chi lobe)
        n_sun = num_fit // 4
        cone = rs.uniform(size=(n_sun, 2))
        ca = 1.0 - cone[:, 0] * 0.15
        sa = np.sqrt(np.maximum(1.0 - ca * ca, 0.0))
        ph = 2.0 * np.pi * cone[:, 1]
        w = sun
        t = np.cross(np.broadcast_to([0.0, 1.0, 0.0], (n_sun, 3)), w)
        t_bad = np.linalg.norm(t, axis=1) < 1e-5
        t[t_bad] = [1.0, 0.0, 0.0]
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        b = np.cross(w, t)
        sdirs = (w[None, :] * ca[:, None] + t * (sa * np.cos(ph))[:, None]
                 + b * (sa * np.sin(ph))[:, None])
        sdirs = sdirs[sdirs[:, 1] > 0.0]
        dirs = np.concatenate([dirs, sdirs], axis=0).astype(np.float32)

        y = np.asarray(target.radiance(jnp.asarray(dirs)))  # (N, 3)
        cos_theta = dirs[:, 1]
        cos_gamma = np.clip(dirs @ sun, -1.0, 1.0)
        gamma = np.arccos(cos_gamma)
        params = np.stack([
            _fit_channel(cos_theta, cos_gamma, gamma, y[:, c])
            for c in range(3)
        ])
        return HosekWilkieSky(
            sun_direction=jnp.asarray(sun),
            params_rgb=jnp.asarray(params, jnp.float32),
            ground_albedo=jnp.asarray(ground_albedo, jnp.float32),
        )

    def radiance(self, dirs):
        d = normalize(dirs)
        sun = self.sun_direction
        cos_theta = d[..., 1]
        cos_gamma = jnp.clip(
            dot(d, jnp.broadcast_to(sun, d.shape)), -1.0, 1.0)
        gamma = jnp.arccos(cos_gamma)
        sky = jnp.stack(
            [
                hw_radiance_channel(
                    jnp.maximum(cos_theta, 0.0), cos_gamma, gamma,
                    self.params_rgb[c])
                for c in range(3)
            ],
            axis=-1,
        )
        # below-horizon: constant ground tinted by the horizon radiance
        horizon = jnp.stack(
            [
                hw_radiance_channel(
                    jnp.zeros_like(cos_theta), cos_gamma, gamma,
                    self.params_rgb[c])
                for c in range(3)
            ],
            axis=-1,
        )
        ground = horizon * self.ground_albedo
        return jnp.where((cos_theta < 0.0)[..., None], ground, sky)
