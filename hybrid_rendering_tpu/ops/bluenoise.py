"""Blue-noise sampler for ray-gen decorrelation.

Replaces the reference's Heitz sobol + scrambling/ranking texture sampler
(src/shaders/bnd_sampler.glsl, blue_noise.cpp:5-19; the binary textures are
not in the reference repo). A precomputed void-and-cluster rank mask
(tools/gen_blue_noise.py) is tiled over the screen and decorrelated across
frames with a golden-ratio Cranley-Patterson rotation — same spectral
purpose (neighboring pixels get well-separated sample values) with zero
external assets. Falls back to pcg2d white noise if the data file is
missing.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops import rng as rng_ops

_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "blue_noise_128.npy")

_GOLDEN = 0.61803398875
_PLASTIC = (0.7548776662466927, 0.5698402909980532)  # R2 sequence


def _load_mask():
    if os.path.exists(_DATA):
        # keep as numpy: converted per-trace as a constant (caching a
        # device array created inside a jit trace would leak tracers)
        return np.load(_DATA)  # (N, N, 2)
    return None


_MASK = _load_mask()


def get_mask():
    return _MASK


def sample2d(pixel_x, pixel_y, frame_index, dim: int = 0):
    """Per-pixel 2D sample in [0,1): blue-noise mask + per-frame R2
    Cranley-Patterson rotation. pixel_x/y: integer arrays (...,).
    dim decorrelates different uses within one frame."""
    mask = get_mask()
    fi = jnp.asarray(frame_index, jnp.float32)
    d = jnp.float32(dim)
    if mask is None:
        v = rng_ops.pcg2d(
            jnp.stack(
                [
                    jnp.asarray(pixel_x, jnp.uint32)
                    + jnp.asarray(frame_index, jnp.uint32) * jnp.uint32(9781),
                    jnp.asarray(pixel_y, jnp.uint32)
                    + jnp.uint32(dim) * jnp.uint32(6271),
                ],
                -1,
            )
        )
        return rng_ops.uint_to_unit_float(v[..., 0]), rng_ops.uint_to_unit_float(
            v[..., 1]
        )
    mask_j = jnp.asarray(mask)
    n = mask.shape[0]
    mx = jnp.asarray(pixel_x, jnp.int32) % n
    my = jnp.asarray(pixel_y, jnp.int32) % n
    base = mask_j[my, mx]  # (..., 2)
    rot_x = (fi + d * 0.38196601) * _PLASTIC[0]
    rot_y = (fi + d * 0.38196601) * _PLASTIC[1]
    u = (base[..., 0] + rot_x) % 1.0
    v = (base[..., 1] + rot_y) % 1.0
    return u, v


def sample2d_grid(height: int, width: int, frame_index, dim: int = 0):
    """Full-pixel-grid variant: the mask tiles the screen with period N, so
    this is a zero-gather jnp.tile (TPU-friendly fast path used by the
    per-pixel ray-gen passes). Returns (u, v) each (height, width)."""
    mask = get_mask()
    if mask is None:
        yy, xx = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.uint32),
            jnp.arange(width, dtype=jnp.uint32),
            indexing="ij",
        )
        return sample2d(xx, yy, frame_index, dim)
    n = mask.shape[0]
    reps_y = -(-height // n)
    reps_x = -(-width // n)
    tiled = jnp.tile(jnp.asarray(mask), (reps_y, reps_x, 1))[:height, :width]
    fi = jnp.asarray(frame_index, jnp.float32)
    d = jnp.float32(dim)
    rot_x = (fi + d * 0.38196601) * _PLASTIC[0]
    rot_y = (fi + d * 0.38196601) * _PLASTIC[1]
    u = (tiled[..., 0] + rot_x) % 1.0
    v = (tiled[..., 1] + rot_y) % 1.0
    return u, v
