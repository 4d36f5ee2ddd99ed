"""Image-based environments: equirectangular HDR maps.

Replaces the reference's HDR environment stack (SURVEY §2.2: 4 HDR equirect
maps -> 1024^2 cubemaps with 5 mips + SH projection + GGX prefilter,
common.cpp:597-625). On TPU there is no sampler hardware to feed, so the
cubemap conversion step disappears entirely: directions sample the equirect
image directly (bilinear, per-channel gathers), SH-9 projection gives the
irradiance fallback, and the GGX "prefilter mip chain" becomes pre-blurred
pyramid levels selected by roughness.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.ops.filters import gather_at
from hybrid_rendering_tpu.ops.math3d import normalize


def _dir_to_equirect_uv(d):
    """Unit dirs -> equirect uv in [0,1]^2 (u wraps, v: +Y up -> v=0)."""
    phi = jnp.arctan2(d[..., 2], d[..., 0])  # [-pi, pi]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))  # [0, pi]
    u = phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    return u, v


@struct.dataclass
class EquirectEnvironment:
    """HDR equirect environment with a pre-blurred roughness pyramid."""

    levels: tuple  # tuple of (H_l, W_l, 3) arrays, level 0 = sharp

    @staticmethod
    def from_image(img, num_levels: int = 5):
        """img: (H, W, 3) float HDR array."""
        img = jnp.asarray(img, jnp.float32)
        levels = [img]
        cur = img
        for _ in range(num_levels - 1):
            h, w = cur.shape[:2]
            if min(h, w) < 4:
                levels.append(cur)
                continue
            # 2x2 box downsample = cheap gaussian-ish prefilter chain
            cur = cur.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
            levels.append(cur)
        return EquirectEnvironment(levels=tuple(levels))

    def _sample_level(self, level, dirs):
        img = self.levels[level]
        h, w = img.shape[:2]
        u, v = _dir_to_equirect_uv(normalize(dirs))
        x = u * w - 0.5
        y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
        # horizontal wrap via modulo on the tap coords
        x0 = jnp.floor(x)
        fx = (x - x0)[..., None]
        y0 = jnp.floor(y)
        fy = (y - y0)[..., None]
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        def tap(xi, yi):
            return gather_at(img, xi % w, jnp.clip(yi, 0, h - 1))

        v00 = tap(x0, y0)
        v10 = tap(x0 + 1, y0)
        v01 = tap(x0, y0 + 1)
        v11 = tap(x0 + 1, y0 + 1)
        return (
            v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
            + v01 * (1 - fx) * fy + v11 * fx * fy
        )

    def radiance(self, dirs):
        """Sharp environment lookup (the *.rmiss cubemap sample)."""
        return self._sample_level(0, dirs)

    def prefiltered(self, dirs, roughness):
        """GGX-prefilter stand-in: blend pyramid levels by roughness
        (the reference's prefiltered cubemap mips, deferred.frag:166)."""
        n = len(self.levels)
        lvl = jnp.clip(roughness, 0.0, 1.0) * (n - 1)
        lo = jnp.floor(lvl).astype(jnp.int32)
        frac = (lvl - jnp.floor(lvl))[..., None]
        # static unroll over levels, select per pixel
        out = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)
        for k in range(n):
            s_k = self._sample_level(k, dirs)
            w_lo = jnp.where(lo == k, 1.0 - frac[..., 0], 0.0)
            w_hi = jnp.where(lo == k - 1, frac[..., 0], 0.0)
            out = out + s_k * (w_lo + w_hi)[..., None]
        return out


def checkerboard_env(h: int = 64, w: int = 128, bright=4.0):
    """Tiny procedural HDR for tests."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    c = ((yy // 8 + xx // 8) % 2).astype(np.float32)
    img = np.stack([c * bright, c * bright * 0.8, np.ones_like(c)], -1)
    return img.astype(np.float32)
