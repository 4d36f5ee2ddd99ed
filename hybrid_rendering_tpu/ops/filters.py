"""Dense stencil filter primitives for the denoiser stack.

The reference runs these as compute shaders with shared-memory caches and
indirect tile dispatch (SURVEY §2.10.1/§2.10.3); on TPU every filter is a
dense masked (H, W) op — XLA fuses the tap chains, and "skipped" tiles are
just lanes whose mask is 0 (dense-masked beats compaction on this
hardware).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops.math3d import luminance


def shift2d(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift an (H, W, ...) image by (dy, dx) with edge-clamp padding —
    the stencil-tap primitive (texelFetch with clamped coords). The value
    at (y, x) of the result is img[y - dy, x - dx] clamped to the frame."""
    if dy == 0 and dx == 0:
        return img
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = [(py0, py1), (px0, px1)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return padded[py1 : py1 + h, px1 : px1 + w]


_shift = shift2d


def box_filter_sum(img: jax.Array, radius: int) -> jax.Array:
    """(2r+1)^2 box sum via separable shift-adds (log-depth doubling) —
    replaces the reference's shared-memory separable sums
    (shadows_denoise_reprojection.comp:157-190). reduce_window lowers
    poorly on this TPU; explicit pad+slice adds fuse well.

    Note: edge-clamp padding (slightly over-counts at borders vs zero
    padding; matches sampler clamp behaviour)."""

    def axis_sum(x, axis):
        # prefix-doubling: sum of 2^k-shifted partials, then combine to
        # exactly (2r+1) taps
        k = 2 * radius + 1
        # simple loop of shifts is fine: k <= 17 -> 16 adds
        total = x
        for o in range(1, radius + 1):
            if axis == 0:
                total = total + shift2d(x, o, 0) + shift2d(x, -o, 0)
            else:
                total = total + shift2d(x, 0, o) + shift2d(x, 0, -o)
        return total

    return axis_sum(axis_sum(img, 0), 1)


def neighborhood_mean_std(img: jax.Array, radius: int):
    """Mean and std over a (2r+1)^2 window (history-clamp statistics)."""
    n = float((2 * radius + 1) ** 2)
    m1 = box_filter_sum(img, radius) / n
    m2 = box_filter_sum(img * img, radius) / n
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return m1, jnp.sqrt(var)


def bilinear_gather(img: jax.Array, coord_x: jax.Array, coord_y: jax.Array):
    """Bilinear sample of (H, W, C) or (H, W) img at float pixel coords
    (same shape grids). Returns sampled values (no validity logic)."""
    squeeze = img.ndim == 2
    x0 = jnp.floor(coord_x)
    y0 = jnp.floor(coord_y)
    fx = (coord_x - x0)[..., None]
    fy = (coord_y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yy, xx):
        v = gather_at(img, xx, yy)
        return v[..., None] if squeeze else v

    v00 = tap(y0, x0)
    v10 = tap(y0, x0 + 1)
    v01 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out[..., 0] if squeeze else out


def take_rows(table: jax.Array, idx: jax.Array):
    """Row gather from a (N, ...) table, one trailing-channel plane at a
    time (see gather_at for why: column-major table layouts make row
    gathers pathological on TPU). idx may be any shape."""
    if table.ndim == 1:
        return jnp.take(table, idx)
    flat = table.reshape(table.shape[0], -1)
    chans = [jnp.take(flat[:, c], idx) for c in range(flat.shape[1])]
    out = jnp.stack(chans, axis=-1)
    return out.reshape(idx.shape + table.shape[1:])


def gather_at(img: jax.Array, ix: jax.Array, iy: jax.Array):
    """Nearest gather of (H, W, ...) at integer pixel coords (clamped).

    Channels are gathered one plane at a time: XLA lays multi-channel
    tables out column-major when the concatenate is free, and row-gathers
    against that layout run ~1000x slower on TPU (255 ms vs 0.2 ms per tap
    at 1080p, measured). Per-channel 1-D gathers always hit the fast path.
    """
    h, w = img.shape[:2]
    idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    if img.ndim == 2:
        return jnp.take(img.reshape(-1), idx)
    flat = img.reshape(h * w, -1)
    chans = [jnp.take(flat[:, c], idx) for c in range(flat.shape[1])]
    out = jnp.stack(chans, axis=-1)
    return out.reshape(idx.shape + img.shape[2:])


# ---------------------------------------------------------------------------
# Edge-stopping weights (reference src/shaders/edge_stopping.glsl, SVGF form)
# ---------------------------------------------------------------------------


def normal_weight(center_n, sample_n, power):
    return jnp.power(
        jnp.clip(jnp.sum(center_n * sample_n, -1), 0.0, 1.0), power
    )


def depth_weight(center_z, sample_z, phi):
    return jnp.exp(-jnp.abs(center_z - sample_z) / jnp.maximum(phi, 1e-6))


def luma_weight(center_l, sample_l, phi):
    return jnp.exp(-jnp.abs(center_l - sample_l) / jnp.maximum(phi, 1e-6))


# ---------------------------------------------------------------------------
# À-trous wavelet filter (SVGF) — reference shadows/reflections
# *_denoise_atrous.comp
# ---------------------------------------------------------------------------

_ATROUS_KERNEL = (1.0, 2.0 / 3.0, 1.0 / 6.0)  # 3-tap B-spline per axis


def atrous_iteration(
    color: jax.Array,  # (H,W) or (H,W,3)
    variance: jax.Array,  # (H,W)
    normal: jax.Array,  # (H,W,3)
    depth: jax.Array,  # (H,W) linear depth
    step: int,
    radius: int = 1,
    phi_color: float = 10.0,
    phi_normal: float = 32.0,
    sigma_depth: float = 1.0,
    mask=None,  # (H,W) bool: pixels to filter (sky stays untouched)
):
    """One edge-aware à-trous iteration with variance-driven luma weight
    (shadows_denoise_atrous.comp:104-167). Returns (color, variance)."""
    single = color.ndim == 2
    cimg = color[..., None] if single else color
    center_l = luminance(cimg) if not single else color

    # variance-driven luma phi: phi * sqrt(3x3-blurred variance)
    var_blur = box_filter_sum(variance, 1) / 9.0
    phi_l = phi_color * jnp.sqrt(jnp.maximum(var_blur, 1e-10))

    sum_c = jnp.zeros_like(cimg)
    sum_v = jnp.zeros_like(variance)
    sum_w = jnp.zeros_like(variance)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            k = _ATROUS_KERNEL[abs(dy)] * _ATROUS_KERNEL[abs(dx)]
            sc = _shift(cimg, dy * step, dx * step)
            sv = _shift(variance, dy * step, dx * step)
            sn = _shift(normal, dy * step, dx * step)
            sz = _shift(depth, dy * step, dx * step)
            sl = luminance(sc) if not single else sc[..., 0]
            w = (
                normal_weight(normal, sn, phi_normal)
                * depth_weight(depth, sz, sigma_depth * abs(step) + 1e-4)
                * luma_weight(center_l, sl, phi_l)
                * k
            )
            sum_c = sum_c + sc * w[..., None]
            sum_v = sum_v + sv * w * w
            sum_w = sum_w + w
    out_c = sum_c / jnp.maximum(sum_w, 1e-8)[..., None]
    out_v = sum_v / jnp.maximum(sum_w * sum_w, 1e-8)
    if mask is not None:
        out_c = jnp.where(mask[..., None], out_c, cimg)
        out_v = jnp.where(mask, out_v, variance)
    return (out_c[..., 0] if single else out_c), out_v


# ---------------------------------------------------------------------------
# Separable bilateral Gaussian blur — reference ao_denoise_bilateral_blur.comp
# ---------------------------------------------------------------------------


def bilateral_blur_separable(
    img: jax.Array,  # (H,W)
    normal: jax.Array,
    depth: jax.Array,  # linear eye depth
    radius: int = 4,
    depth_phi: float = 1.0,
    normal_power: float = 32.0,
    mask=None,
):
    """Two-pass (vertical then horizontal) bilateral Gaussian, sigma =
    radius/1.5 with depth/normal edge stops (ao_denoise_bilateral_blur
    .comp:75-110)."""
    sigma = radius / 1.5

    def one_axis(x, axis):
        sum_c = jnp.zeros_like(x)
        sum_w = jnp.zeros_like(x)
        for o in range(-radius, radius + 1):
            dy, dx = (o, 0) if axis == 0 else (0, o)
            g = jnp.exp(-(o * o) / (2.0 * sigma * sigma))
            sc = _shift(x, dy, dx)
            sn = _shift(normal, dy, dx)
            sz = _shift(depth, dy, dx)
            w = g * normal_weight(normal, sn, normal_power) * depth_weight(
                depth, sz, depth_phi
            )
            sum_c = sum_c + sc * w
            sum_w = sum_w + w
        return sum_c / jnp.maximum(sum_w, 1e-8)

    out = one_axis(one_axis(img, 0), 1)
    if mask is not None:
        out = jnp.where(mask, out, img)
    return out


# ---------------------------------------------------------------------------
# Edge-aware upsample — reference *_upsample.comp (4-tap joint bilateral)
# ---------------------------------------------------------------------------


def upsample_edge_aware(
    low: jax.Array,  # (h,w) or (h,w,C) low-res signal
    low_normal: jax.Array,
    low_depth: jax.Array,  # linear depth at low res
    hi_normal: jax.Array,
    hi_depth: jax.Array,
    scale: int,
):
    """Joint bilateral upsample from 1/2**scale res to full res
    (shadows_upsample.comp:62-108): 4 nearest low-res taps weighted by
    bilinear x depth x normal agreement with the full-res pixel."""
    s = 1 << scale
    H, W = hi_depth.shape
    single = low.ndim == 2
    low_c = low[..., None] if single else low

    # Gather-free taps: the 4 bilinear source texels for full-res pixel i
    # along an axis are low[(i - s//2)//s] and the next texel — i.e. a
    # repeat-by-s followed by static +-s//2 shifts (static-index gathers
    # would still hit the TPU scalar-core gather path).
    half = s // 2

    def up_rep(x):
        x = jnp.repeat(x, s, axis=0)
        return jnp.repeat(x, s, axis=1)

    def tap_img(x, dy, dx):
        return shift2d(up_rep(x), half - dy * s, half - dx * s)[:H, :W]

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    fx = ((xx + 0.5) / s - 0.5) % 1.0
    fy = ((yy + 0.5) / s - 0.5) % 1.0

    sum_c = jnp.zeros((H, W, low_c.shape[-1]), low_c.dtype)
    sum_w = jnp.zeros_like(hi_depth)
    for dy in range(2):
        for dx in range(2):
            wbil = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            c = tap_img(low_c, dy, dx)
            n = tap_img(low_normal, dy, dx)
            z = tap_img(low_depth, dy, dx)
            w = (
                wbil
                * normal_weight(hi_normal, n, 32.0)
                * depth_weight(hi_depth, z, 1.0)
                + 1e-6
            )
            sum_c = sum_c + c * w[..., None]
            sum_w = sum_w + w
    out = sum_c / sum_w[..., None]
    return out[..., 0] if single else out
