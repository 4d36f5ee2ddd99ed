"""SVGF-style temporal reprojection with disocclusion tests.

Behavioural twin of src/shaders/reprojection.glsl: motion-vector surface
reprojection (plus virtual-point reprojection for reflections), four
disocclusion tests (out-of-frame, mesh-id, plane-distance, normal), 4-tap
validity-weighted bilinear history fetch with a 3x3 binary-weight fallback.

Vectorized over the whole frame: each "texelFetch of a neighbor" becomes a
gather of a stacked history tensor; validity logic is branch-free masks.
One deliberate improvement: history world positions come from the stored
previous-frame position plane (exact) instead of reconstructing prev depth
with the *current* inverse view-proj as the reference does
(reprojection.glsl:163, a small approximation under camera motion).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops import filters
from hybrid_rendering_tpu.types import Camera, GBuffer

PLANE_DISTANCE = 5.0  # reprojection.glsl:7
NORMAL_DISTANCE = 0.1  # reprojection.glsl:6


class ReprojectionResult(NamedTuple):
    history: jax.Array  # (H,W,C) reprojected history signal
    history_moments: Optional[jax.Array]  # (H,W,2) or None
    history_length: jax.Array  # (H,W)
    valid: jax.Array  # (H,W) bool


def _disocclusion_valid(cur_pos, cur_normal, cur_mesh, prev_pos, prev_normal,
                        prev_mesh, in_frame):
    """is_reprojection_valid (reprojection.glsl:53-69), branch-free."""
    to_cur = cur_pos - prev_pos
    plane_dist = jnp.abs(jnp.sum(to_cur * cur_normal, -1))
    plane_ok = plane_dist <= PLANE_DISTANCE
    mesh_ok = cur_mesh == prev_mesh
    ndot = jnp.abs(jnp.sum(cur_normal * prev_normal, -1))
    normal_ok = ndot * ndot > NORMAL_DISTANCE
    return in_frame & mesh_ok & plane_ok & normal_ok


def reproject(
    gb: GBuffer,
    prev_gb: GBuffer,
    history: jax.Array,  # (H,W) or (H,W,C) previous-frame output
    history_moments: Optional[jax.Array] = None,  # (H,W,2)
    history_length: Optional[jax.Array] = None,  # (H,W)
    reprojected_coord: Optional[tuple] = None,  # override (hx, hy) float pixel coords
    fallback: bool = True,  # 3x3 cross-bilateral rescue taps (glsl:267-311)
) -> ReprojectionResult:
    """Reproject history into the current frame.

    reprojected_coord overrides the surface motion-vector reprojection
    (used by reflections' virtual-point reprojection)."""
    H, W = gb.depth.shape
    single = history.ndim == 2
    hist_c = history[..., None] if single else history

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    if reprojected_coord is None:
        # floor(frag) + motion*dim (reprojection.glsl:186-187)
        hx = xx + gb.motion[..., 0] * W
        hy = yy + gb.motion[..., 1] * H
    else:
        hx, hy = reprojected_coord

    x0f = jnp.floor(hx)
    y0f = jnp.floor(hy)
    fx = hx - x0f
    fy = hy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # stack everything gathered from the previous frame into one tensor so
    # each tap is a single gather
    C = hist_c.shape[-1]
    mom = history_moments if history_moments is not None else jnp.zeros((H, W, 2))
    hlen = history_length if history_length is not None else jnp.zeros((H, W))
    prev_stack = jnp.concatenate(
        [
            hist_c,  # 0:C
            mom,  # C:C+2
            hlen[..., None],  # C+2
            prev_gb.normal,  # C+3 : C+6
            prev_gb.position,  # C+6 : C+9
            prev_gb.mesh_id.astype(jnp.float32)[..., None],  # C+9
        ],
        axis=-1,
    )

    def tap(ix, iy):
        in_frame = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        vals = filters.gather_at(prev_stack, ix, iy)
        prev_normal = vals[..., C + 3 : C + 6]
        prev_pos = vals[..., C + 6 : C + 9]
        prev_mesh = vals[..., C + 9].astype(jnp.int32)
        ok = _disocclusion_valid(
            gb.position, gb.normal, gb.mesh_id, prev_pos, prev_normal,
            prev_mesh, in_frame,
        )
        return vals, ok

    # 4-tap bilinear with per-tap validity (reprojection.glsl:196-265)
    sum_vals = jnp.zeros((H, W, prev_stack.shape[-1]))
    sum_w = jnp.zeros((H, W))
    any_valid = jnp.zeros((H, W), bool)
    for dy in range(2):
        for dx in range(2):
            vals, ok = tap(x0 + dx, y0 + dy)
            wb = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            w = jnp.where(ok, wb, 0.0)
            sum_vals = sum_vals + vals * w[..., None]
            sum_w = sum_w + w
            any_valid = any_valid | ok
    bil_valid = any_valid & (sum_w >= 0.01)
    bil_vals = sum_vals / jnp.maximum(sum_w, 1e-8)[..., None]

    # 3x3 binary-weight fallback around the rounded coord
    # (reprojection.glsl:267-311)
    hxr = (hx + 0.5).astype(jnp.int32)
    hyr = (hy + 0.5).astype(jnp.int32)
    if fallback:
        fb_vals = jnp.zeros_like(sum_vals)
        fb_cnt = jnp.zeros((H, W))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                vals, ok = tap(hxr + dx, hyr + dy)
                w = ok.astype(jnp.float32)
                fb_vals = fb_vals + vals * w[..., None]
                fb_cnt = fb_cnt + w
        fb_valid = fb_cnt > 0
        fb_vals = fb_vals / jnp.maximum(fb_cnt, 1e-8)[..., None]

        use_fb = (~bil_valid) & fb_valid
        valid = bil_valid | fb_valid
        out = jnp.where(use_fb[..., None], fb_vals, bil_vals)
    else:
        valid = bil_valid
        out = bil_vals
    out = jnp.where(valid[..., None], out, 0.0)

    hist_out = out[..., :C]
    mom_out = out[..., C : C + 2] if history_moments is not None else None
    # history length read at the nearest coord (reprojection.glsl:313-318)
    hlen_tap = filters.gather_at(hlen, hxr, hyr)
    hlen_out = jnp.where(valid, hlen_tap, 0.0)

    return ReprojectionResult(
        history=hist_out[..., 0] if single else hist_out,
        history_moments=mom_out,
        history_length=hlen_out,
        valid=valid,
    )


def virtual_point_coords(gb: GBuffer, camera: Camera, ray_length: jax.Array):
    """Virtual-point reprojection for mirror reflections
    (reprojection.glsl:78-111): reproject the parallax hit point
    cam + camdir*(|camray| + hitT) through the previous view-proj. Returns
    float pixel coords (hx, hy); caller blends with surface reprojection
    where ray_length <= 0 or curvature != 0."""
    H, W = gb.depth.shape
    cam_ray = gb.position - camera.position
    cam_len = jnp.sqrt(jnp.maximum(jnp.sum(cam_ray * cam_ray, -1), 1e-12))
    cam_dir = cam_ray / cam_len[..., None]
    parallax = camera.position + cam_dir * (cam_len + ray_length)[..., None]
    clip = jnp.einsum(
        "ij,hwj->hwi",
        camera.prev_view_proj,
        jnp.concatenate([parallax, jnp.ones_like(parallax[..., :1])], -1),
    )
    ndc = clip[..., :2] / jnp.maximum(jnp.abs(clip[..., 3:4]), 1e-8) * jnp.sign(
        clip[..., 3:4]
    )
    # framework convention: ndc y = +1 at top row
    hx = (ndc[..., 0] * 0.5 + 0.5) * W - 0.5
    hy = ((1.0 - ndc[..., 1]) * 0.5) * H - 0.5
    return hx, hy
