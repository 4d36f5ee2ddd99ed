"""Texture atlas — the TPU replacement for 2048 bindless samplers.

The reference binds up to 2048 material textures PARTIALLY_BOUND
(src/common.cpp:635-666) and fetches albedo / normal / metallic-roughness
per hit (src/shaders/scene_descriptor_set.glsl:180-228). With no sampler
hardware to feed, all textures pack into ONE atlas array plus a per-texture
rect table; repeat wrapping is emulated by frac() before the rect
transform.

Runtime sampling (`sample_atlas`) is an XLA per-channel gather — correct
everywhere but scalar-core-bound on TPU (see README perf notes), so
texturing is config-gated (`MaterialDef.albedo_tex`); a tile-windowed
Pallas sampler (same recipe as ops/pallas/ddgi_sample.py) is the planned
fast path.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.ops.filters import take_rows


@struct.dataclass
class TextureAtlas:
    """Packed texture atlas + per-texture rects."""

    image: jax.Array  # (H, W, 4) float32
    rects: jax.Array  # (T, 4) [x0, y0, w, h] in pixels

    @property
    def num_textures(self) -> int:
        return self.rects.shape[0]


class AtlasBuilder:
    """Shelf-packs images into one atlas (images: (h, w, 3|4) float arrays)."""

    def __init__(self):
        self._images: List[np.ndarray] = []

    def add(self, img: np.ndarray) -> int:
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=2)
        self._images.append(img)
        return len(self._images) - 1

    def build(self) -> Optional[TextureAtlas]:
        if not self._images:
            return None
        # simple shelf packing, sorted by height
        order = sorted(range(len(self._images)),
                       key=lambda i: -self._images[i].shape[0])
        atlas_w = max(1, 1 << int(np.ceil(np.log2(
            max(max(im.shape[1] for im in self._images), 1)))))
        atlas_w = max(atlas_w, 256)
        shelves = []  # (y, height, x_cursor)
        rects = [None] * len(self._images)
        total_h = 0
        for i in order:
            h, w = self._images[i].shape[:2]
            placed = False
            for s in shelves:
                if s[1] >= h and s[2] + w <= atlas_w:
                    rects[i] = (s[2], s[0], w, h)
                    s[2] += w
                    placed = True
                    break
            if not placed:
                shelves.append([total_h, h, w])
                rects[i] = (0, total_h, w, h)
                total_h += h
        atlas = np.zeros((max(total_h, 1), atlas_w, 4), np.float32)
        for i, im in enumerate(self._images):
            x0, y0, w, h = rects[i]
            atlas[y0 : y0 + h, x0 : x0 + w] = im
        return TextureAtlas(
            image=jnp.asarray(atlas),
            rects=jnp.asarray(np.asarray(rects, np.float32)),
        )


def sample_atlas(atlas: TextureAtlas, tex_idx, uv, valid=None):
    """Bilinear atlas sample with repeat wrap. tex_idx (...,) int32 (-1 =
    none -> returns 1s); uv (...,2). Returns (...,4)."""
    H, W = atlas.image.shape[:2]
    idx = jnp.clip(tex_idx, 0, atlas.num_textures - 1)
    rect = take_rows(atlas.rects, idx)  # (...,4)
    u = uv[..., 0] % 1.0
    v = uv[..., 1] % 1.0
    # texel coords inside the rect (clamp a half texel to avoid bleeding)
    x = rect[..., 0] + jnp.clip(u * rect[..., 2] - 0.5, 0.0, rect[..., 2] - 1.0)
    y = rect[..., 1] + jnp.clip(v * rect[..., 3] - 0.5, 0.0, rect[..., 3] - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = atlas.image.reshape(H * W, 4)

    def tap(xi, yi):
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return take_rows(flat, lin)

    out = (
        tap(x0, y0) * (1 - fx) * (1 - fy)
        + tap(x0 + 1, y0) * fx * (1 - fy)
        + tap(x0, y0 + 1) * (1 - fx) * fy
        + tap(x0 + 1, y0 + 1) * fx * fy
    )
    none = (tex_idx < 0)[..., None]
    out = jnp.where(none, 1.0, out)
    if valid is not None:
        out = jnp.where(valid[..., None], out, 1.0)
    return out


def checkerboard(size: int = 64, a=(1.0, 1.0, 1.0), b=(0.2, 0.2, 0.2),
                 cells: int = 8) -> np.ndarray:
    """Procedural test texture."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    c = ((yy // (size // cells) + xx // (size // cells)) % 2).astype(np.float32)
    return (np.asarray(a, np.float32)[None, None] * c[..., None]
            + np.asarray(b, np.float32)[None, None] * (1 - c[..., None]))
