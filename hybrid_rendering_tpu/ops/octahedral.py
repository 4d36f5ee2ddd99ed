"""Octahedral unit-vector codec.

Used for G-buffer normal storage (src/shaders/g_buffer.frag:47-51) and DDGI
probe-atlas addressing (src/shaders/gi/gi_common.glsl:143-184). Decode
matches reference common.glsl:150-156.
"""
from __future__ import annotations

import jax.numpy as jnp

from hybrid_rendering_tpu.ops.math3d import normalize


def _sign_not_zero(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def direction_to_octahedral(n):
    """(..., 3) unit vectors -> (..., 2) in [-1, 1]."""
    denom = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / jnp.maximum(denom, 1e-8)
    fold = (1.0 - jnp.abs(p[..., ::-1])) * _sign_not_zero(p)
    return jnp.where(n[..., 2:3] < 0.0, fold, p)


def octahedral_to_direction(e):
    """(..., 2) in [-1,1] -> (..., 3) unit vectors (common.glsl:150-156)."""
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    fold = (1.0 - jnp.abs(e[..., ::-1])) * _sign_not_zero(e)
    xy = jnp.where(z[..., None] < 0.0, fold, e)
    return normalize(jnp.concatenate([xy, z[..., None]], axis=-1))
