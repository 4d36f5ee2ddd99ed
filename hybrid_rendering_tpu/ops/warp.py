"""Gather-free image warping for temporal reprojection.

XLA TPU gathers execute on the scalar core (~7 cycles/element: a 1080p
history fetch costs ~15 ms per channel tap). Reprojection motion is almost
always a few pixels/frame, so the warp is reformulated as a SEPARABLE
STATIC-WINDOW select: for every integer offset o in [-M, M], shift the
image by o (pad+slice, fuses on the VPU) and select it where
floor(coord) - pixel == o. Two 1-D passes give exact bilinear warping for
any displacement within +-M pixels; pixels displaced further report
invalid (treated as disocclusion, which matches how extreme camera cuts
behave anyway).

This replaces the texelFetch-based history fetch of the reference's
reprojection shaders (src/shaders/reprojection.glsl) with the TPU-shaped
equivalent.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops.filters import shift2d

MAX_RESIDUAL = 6  # +-6 pixel window


def _axis_warp(img, k, f, m, axis):
    """1-D warp along `axis`: out[p] = (1-f)*img[p+k] + f*img[p+k+1] for
    k in [-m, m-1], via (2m+1) static shifts. img (H,W,C); k,f (H,W)."""
    out = jnp.zeros_like(img)
    for o in range(-m, m + 1):
        # weight for source offset o: (1-f) where k==o, plus f where k==o-1
        w = jnp.where(k == o, 1.0 - f, 0.0) + jnp.where(k == o - 1, f, 0.0)
        if axis == 0:
            shifted = shift2d(img, -o, 0)
        else:
            shifted = shift2d(img, 0, -o)
        out = out + shifted * w[..., None]
    return out


def warp_bilinear(
    planes: jax.Array,  # (H, W, C) stacked continuous planes
    hx: jax.Array,  # (H, W) source x pixel coords (float)
    hy: jax.Array,  # (H, W) source y pixel coords
    max_residual: int = MAX_RESIDUAL,
) -> Tuple[jax.Array, jax.Array]:
    """Separable two-pass bilinear warp. Returns (warped (H,W,C),
    in_window (H,W) bool). Out-of-window or out-of-frame pixels are
    invalid (values undefined).

    Approximation note: the row pass evaluates its (ky, fy) displacement at
    the shifted column x+kx rather than at the destination pixel, so this
    equals a true bilinear gather only where the per-axis displacement is
    locally constant (rigid camera translation, the common case). For
    spatially varying motion (depth edges, rotation) it can fetch from a
    neighboring source row; downstream mesh-id/plane disocclusion tests
    degrade such pixels to a history reset, which is graceful."""
    H, W = hy.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    fx = hx - jnp.floor(hx)
    fy = hy - jnp.floor(hy)
    kx = (jnp.floor(hx) - xx).astype(jnp.int32)
    ky = (jnp.floor(hy) - yy).astype(jnp.int32)
    m = max_residual
    ok = (
        (kx >= -m) & (kx <= m - 1) & (ky >= -m) & (ky <= m - 1)
        & (hx >= 0.0) & (hx <= W - 1.0) & (hy >= 0.0) & (hy <= H - 1.0)
    )
    v = _axis_warp(planes, ky, fy, m, axis=0)
    v = _axis_warp(v, kx, fx, m, axis=1)
    return v, ok


def warp_nearest(
    planes: jax.Array,  # (H, W, C)
    hx: jax.Array,
    hy: jax.Array,
    max_residual: int = MAX_RESIDUAL,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest-tap warp (for id planes that must not interpolate)."""
    H, W = hy.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    rx = jnp.round(hx)
    ry = jnp.round(hy)
    kx = (rx - xx).astype(jnp.int32)
    ky = (ry - yy).astype(jnp.int32)
    m = max_residual
    ok = (
        (kx >= -m) & (kx <= m) & (ky >= -m) & (ky <= m)
        & (rx >= 0) & (rx <= W - 1) & (ry >= 0) & (ry <= H - 1)
    )
    # separable nearest: rows then cols
    v = jnp.zeros_like(planes)
    for o in range(-m, m + 1):
        w = (ky == o).astype(planes.dtype)
        v = v + shift2d(planes, -o, 0) * w[..., None]
    out = jnp.zeros_like(planes)
    for o in range(-m, m + 1):
        w = (kx == o).astype(planes.dtype)
        out = out + shift2d(v, 0, -o) * w[..., None]
    return out, ok
