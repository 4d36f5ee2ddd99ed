"""Temporal anti-aliasing (Playdead-style resolve).

Behavioural twin of src/temporal_aa.{h,cpp} + src/shaders/taa.comp
(SURVEY §2.8): Halton(2,3) 16-sample subpixel jitter (applied to the
projection matrix by the camera builder), 3x3 closest-depth velocity
dilation (taa.comp:157-188), rounded 3x3 min/max/avg neighborhood, history
AABB clipping (:120-153), luminance-feedback weight lerp between
feedback_min 0.88 / max 0.97 (:341-352), optional 5-tap sharpen (:355-366),
Reinhard-space blending (:368-378)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import TAAConfig
from hybrid_rendering_tpu.ops import filters
from hybrid_rendering_tpu.ops.math3d import luminance
from hybrid_rendering_tpu.types import GBuffer

HALTON_16 = tuple(
    (
        sum(((i // (2**j)) % 2) / (2 ** (j + 1)) for j in range(16)),
        sum(((i // (3**j)) % 3) / (3 ** (j + 1)) for j in range(16)),
    )
    for i in range(1, 17)
)


def halton_jitter(frame_index: int, width: int, height: int):
    """Subpixel jitter in NDC units for the projection matrix
    (temporal_aa.cpp:54-81). Host-side helper (static per frame)."""
    hx, hy = HALTON_16[frame_index % 16]
    return ((hx - 0.5) * 2.0 / width, (hy - 0.5) * 2.0 / height)


@struct.dataclass
class TAAState:
    history: jax.Array  # (H,W,3)
    initialized: jax.Array  # () bool-ish int32

    @staticmethod
    def create(height: int, width: int):
        return TAAState(
            history=jnp.zeros((height, width, 3), jnp.float32),
            initialized=jnp.int32(0),
        )


def _clip_aabb(aabb_min, aabb_max, history, current):
    """Clip history toward the neighborhood AABB center (taa.comp:120-153)."""
    center = 0.5 * (aabb_max + aabb_min)
    extent = 0.5 * (aabb_max - aabb_min) + 1e-5
    vc = history - center
    unit = jnp.abs(vc / extent)
    ma = jnp.max(unit, axis=-1, keepdims=True)
    return jnp.where(ma > 1.0, center + vc / ma, history)


def taa_resolve(
    color: jax.Array,  # (H,W,3) current frame HDR
    gb: GBuffer,
    state: TAAState,
    cfg: TAAConfig,
):
    """One TAA resolve. Returns (output, new_state)."""
    H, W = gb.depth.shape

    # 3x3 closest-depth velocity dilation (taa.comp:157-188)
    best_depth = gb.depth
    best_motion = gb.motion
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nd = filters.shift2d(gb.depth, dy, dx)
            nm = filters.shift2d(gb.motion, dy, dx)
            closer = nd < best_depth
            best_depth = jnp.where(closer, nd, best_depth)
            best_motion = jnp.where(closer[..., None], nm, best_motion)

    # history fetch at uv + motion (motion = prev - curr in uv units) —
    # gather-free static-window warp (ops/warp.py); beyond-window pixels
    # fall back to the current color (history reset, as on a cut)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    hx = xx + best_motion[..., 0] * W
    hy = yy + best_motion[..., 1] * H
    from hybrid_rendering_tpu.ops import warp as warp_ops

    history, hist_ok = warp_ops.warp_bilinear(state.history, hx, hy)
    history = jnp.where(hist_ok[..., None], history, color)

    if cfg.motion_blur:
        # sample_color_motion (taa.comp:218-236): box-average the current
        # color along +-taps of half the screen-space velocity, start
        # offset jittered by the sin-hash noise (noise.glsl srand)
        taps = int(cfg.motion_blur_taps)
        uvx = (xx + 0.5) / W
        uvy = (yy + 0.5) / H
        s = jnp.sin(uvx * 12.9898 + uvy * 78.233) * 43758.5453
        srand = (s - jnp.floor(s)) * 2.0 - 1.0  # fract -> [-1,1)
        # velocity points prev - curr: blur along -motion (pixel units)
        vx = -best_motion[..., 0] * W * 0.5 / taps
        vy = -best_motion[..., 1] * H * 0.5 / taps
        acc = jnp.zeros_like(color)
        for i in range(-taps, taps + 1):
            o = i + 0.5 * srand
            tap, ok = warp_ops.warp_bilinear(color, xx + vx * o,
                                             yy + vy * o)
            acc = acc + jnp.where(ok[..., None], tap, color)
        color = acc / (2 * taps + 1)

    # rounded 3x3 neighborhood min/max/avg (box + cross blended)
    box_min = color
    box_max = color
    cross_min = color
    cross_max = color
    avg = jnp.zeros_like(color)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = filters.shift2d(color, dy, dx)
            avg = avg + s / 9.0
            box_min = jnp.minimum(box_min, s)
            box_max = jnp.maximum(box_max, s)
            if dx == 0 or dy == 0:
                cross_min = jnp.minimum(cross_min, s)
                cross_max = jnp.maximum(cross_max, s)
    nmin = 0.5 * (box_min + cross_min)
    nmax = 0.5 * (box_max + cross_max)

    history = _clip_aabb(nmin, nmax, history, color)

    # luminance-weighted feedback (taa.comp:341-352)
    lum0 = luminance(color)
    lum1 = luminance(history)
    unbiased_diff = jnp.abs(lum0 - lum1) / jnp.maximum(
        lum0, jnp.maximum(lum1, 0.2)
    )
    unbiased_weight = 1.0 - unbiased_diff
    feedback = (
        cfg.feedback_min
        + (cfg.feedback_max - cfg.feedback_min) * unbiased_weight * unbiased_weight
    )[..., None]

    # Reinhard-space blend (HDR correction, taa.comp:368-378)
    def tm(x):
        return x / (1.0 + luminance(x))[..., None]

    def tm_inv(x):
        return x / jnp.maximum(1.0 - luminance(x), 1e-4)[..., None]

    blended = tm_inv(tm(color) * (1.0 - feedback) + tm(history) * feedback)

    # first frame: no history
    out = jnp.where(state.initialized > 0, blended, color)

    if cfg.sharpen:
        blur = (
            out
            + filters.shift2d(out, 0, 1)
            + filters.shift2d(out, 0, -1)
            + filters.shift2d(out, 1, 0)
            + filters.shift2d(out, -1, 0)
        ) / 5.0
        out = jnp.clip(out + (out - blur) * 0.5, 0.0, None)

    return out, TAAState(history=out, initialized=jnp.int32(1))
