"""SVGF-style temporal reprojection with disocclusion tests.

Behavioural twin of src/shaders/reprojection.glsl: motion-vector surface
reprojection (plus virtual-point reprojection for reflections), the four
disocclusion tests (out-of-frame, mesh-id, plane-distance, normal), and a
nearest-tap rescue replacing the 3x3 cross-bilateral fallback.

TPU redesign: the per-tap texelFetches become a gather-free separable
static-window warp (ops/warp.py) — XLA TPU gathers run on the scalar core
(~15 ms per 1080p tap), while the warp is pure VPU shifts+selects.
Semantic deltas vs the reference, both graceful:
  - validity applies to the warped (bilinearly blended) history rather
    than per bilinear tap (glsl:196-265 weights taps individually);
  - displacement beyond the +-6 px window invalidates (treated as
    disocclusion) instead of fetching far history — large camera jumps
    restart accumulation, as a scene cut would.
History world positions come from the stored previous-frame position plane
(exact) instead of reconstructing prev depth with the *current* inverse
view-proj as the reference does (reprojection.glsl:163).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops import warp as warp_ops
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
    reprojected_coord: Optional[tuple] = None,  # override (hx, hy) float coords
    fallback: bool = True,  # nearest-tap rescue when bilinear fails
) -> ReprojectionResult:
    """Reproject history into the current frame."""
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

    C = hist_c.shape[-1]
    mom = history_moments if history_moments is not None else jnp.zeros((H, W, 2))
    hlen = history_length if history_length is not None else jnp.zeros((H, W))
    # continuous planes warp bilinearly; ids + positions warp nearest
    cont = jnp.concatenate([hist_c, mom, hlen[..., None], prev_gb.normal], -1)
    ids = jnp.concatenate(
        [prev_gb.position, prev_gb.mesh_id.astype(jnp.float32)[..., None]], -1
    )

    bil, ok_b = warp_ops.warp_bilinear(cont, hx, hy)
    near, ok_n = warp_ops.warp_nearest(
        jnp.concatenate([cont, ids], -1), hx, hy
    )

    def validity(warped_normal, warped_pos, warped_mesh, in_frame):
        return _disocclusion_valid(
            gb.position, gb.normal, gb.mesh_id,
            warped_pos, warped_normal, warped_mesh, in_frame,
        )

    prev_pos_n = near[..., C + 3 + 3 : C + 3 + 6]
    prev_mesh_n = jnp.round(near[..., C + 3 + 6]).astype(jnp.int32)

    # Documented delta vs reprojection.glsl:196-265: the reference weights
    # each bilinear tap's validity individually; here the bilinear blend is
    # validated against the nearest-warped prev position/mesh only. A blend
    # straddling a geometry edge can therefore pass and briefly ghost — if
    # that shows up in animated scenes, add a per-tap validity mask to
    # warp_bilinear (the 4 taps are static shifts) and renormalize.
    bil_normal = bil[..., C + 3 : C + 6]
    valid_b = validity(bil_normal, prev_pos_n, prev_mesh_n, ok_b)

    near_normal = near[..., C + 3 : C + 6]
    valid_n = validity(near_normal, prev_pos_n, prev_mesh_n, ok_n)

    if fallback:
        use_near = (~valid_b) & valid_n
        valid = valid_b | valid_n
        out = jnp.where(use_near[..., None], near[..., : C + 3], bil[..., : C + 3])
    else:
        valid = valid_b
        out = bil[..., : C + 3]
    out = jnp.where(valid[..., None], out, 0.0)

    hist_out = out[..., :C]
    mom_out = out[..., C : C + 2] if history_moments is not None else None
    hlen_out = jnp.where(valid, near[..., C + 2], 0.0)

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
