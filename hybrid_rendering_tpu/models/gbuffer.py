"""G-buffer pass — ray-based deferred geometry buffer.

Replaces the reference's raster G-buffer (src/g_buffer.{h,cpp} +
g_buffer.{vert,frag}, SURVEY §2.3): primary rays against the scene BVH
produce the same contents — albedo+metallic, octahedral-codec-able normals,
motion vectors, roughness, curvature, mesh_id, linear z, NDC depth — as
named planes instead of packed MRTs. Static scenes mean motion vectors
come purely from camera reprojection of the hit position
(g_buffer.vert:71-84 relies on the same invariant).

Curvature is a screen-space stencil on the normal plane (the reference
computes it from fragment-shader derivatives, g_buffer.frag:71-80).

The mip chain for scaled ray passes (g_buffer.cpp:236-244: nearest-filter
downsample so half/quarter-res passes fetch mip = scale) becomes
``downsample_gbuffer``: strided nearest sampling of the full-res planes.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.ops.math3d import INF_T
from hybrid_rendering_tpu.types import Camera, GBuffer, SceneArrays
from hybrid_rendering_tpu.utils import camera as camera_utils


def _ndc_from_world(view_proj, pos):
    w = jnp.einsum(
        "ij,...j->...i",
        view_proj,
        jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1),
    )
    return w[..., :3] / jnp.maximum(jnp.abs(w[..., 3:4]), 1e-8) * jnp.sign(w[..., 3:4])


def screen_curvature(normal, mask):
    """Magnitude of screen-space normal change (g_buffer.frag:71-80
    computes length(dFdx(N)) + length(dFdy(N)); forward differences here)."""
    dx = normal - jnp.roll(normal, -1, axis=1)
    dy = normal - jnp.roll(normal, -1, axis=0)
    curv = jnp.sqrt(jnp.sum(dx * dx, -1)) + jnp.sqrt(jnp.sum(dy * dy, -1))
    return jnp.where(mask, curv, 0.0)


def render_gbuffer(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    camera: Camera,
    width: int,
    height: int,
    motion_deltas=None,  # (I,4,4) per-instance prev-pose maps (dynamic
    #                       scenes; scene/dynamic.py motion_deltas)
) -> GBuffer:
    """Trace primary rays and fill every G-buffer plane.
    closest_surface_fn: from ops.bvh.make_surface_tracer (fused trace +
    attribute fetch on the flash path)."""
    origins, dirs = camera_utils.camera_rays(camera, width, height)
    hit, surf = closest_surface_fn(origins, dirs, INF_T)

    pos = surf.position
    normal = surf.normal
    vmask = hit.valid

    # depth / linear z
    ndc = _ndc_from_world(camera.view_proj, pos)
    depth = jnp.where(vmask, jnp.clip(ndc[..., 2], 0.0, 1.0), 1.0)
    view_pos = jnp.einsum(
        "ij,...j->...i",
        camera.view,
        jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1),
    )
    linear_z = jnp.where(vmask, -view_pos[..., 2], camera.far)

    # motion vectors: prev_uv - curr_uv (reference g_buffer.frag:55-67,
    # stored as prev - current; static geometry -> same world position;
    # animated instances re-pose the hit through their prev transform,
    # g_buffer.vert:71-84)
    if motion_deltas is not None:
        from hybrid_rendering_tpu.scene.dynamic import prev_positions

        pos_prev = prev_positions(pos, surf.mesh_id, motion_deltas)
    else:
        pos_prev = pos
    ndc_prev = _ndc_from_world(camera.prev_view_proj, pos_prev)

    def uv_of(ndc_xy):
        return jnp.stack(
            [(ndc_xy[..., 0] + 1.0) * 0.5, (1.0 - ndc_xy[..., 1]) * 0.5], -1
        )

    motion = jnp.where(
        vmask[..., None], uv_of(ndc_prev) - uv_of(ndc), jnp.zeros_like(ndc[..., :2])
    )

    curvature = screen_curvature(
        jnp.where(vmask[..., None], normal, 0.0), vmask
    )

    return GBuffer(
        albedo=jnp.where(vmask[..., None], surf.albedo, 0.0),
        metallic=jnp.where(vmask, surf.metallic, 0.0),
        normal=jnp.where(vmask[..., None], normal, 0.0),
        motion=motion,
        roughness=jnp.where(vmask, surf.roughness, 1.0),
        curvature=curvature,
        mesh_id=jnp.where(vmask, surf.mesh_id, -1),
        linear_z=linear_z,
        depth=depth,
        position=jnp.where(vmask[..., None], pos, 0.0),
    )


def _ds2(x):
    """One 2x nearest downsample. A plain ``x[::2, ::2]`` lowers to a
    serialized per-element gather on TPU (measured 5.6 ms per 1080p plane
    — the three per-pass downsample_gbuffer calls were ~54 ms of the r4
    frame); a sublane-stride row slice followed by a reshape that splits
    the lane dim and selects element 0 stays dense (0.72 ms measured)."""
    h, w = x.shape[0] // 2, x.shape[1] // 2
    rows = x[: 2 * h : 2, : 2 * w]  # sublane stride: cheap
    return rows.reshape((h, w, 2) + x.shape[2:])[:, :, 0]


def nearest_downsample(x, step: int):
    """Nearest downsample by a power-of-two ``step`` via the dense _ds2
    cascade — the drop-in for ``x[::step, ::step]``, which serializes into
    per-element gathers on TPU (see _ds2)."""
    assert step & (step - 1) == 0, step
    while step > 1:
        x = _ds2(x)
        step //= 2
    return x


def downsample_gbuffer(gb: GBuffer, scale: int) -> GBuffer:
    """Nearest-filter downsample by 2**scale — the mip-chain equivalent
    (g_buffer.cpp:236-244) for half/quarter-res ray passes."""
    if scale == 0:
        return gb
    out = gb
    for _ in range(scale):
        out = GBuffer(
            albedo=_ds2(out.albedo),
            metallic=_ds2(out.metallic),
            normal=_ds2(out.normal),
            motion=_ds2(out.motion),
            roughness=_ds2(out.roughness),
            curvature=_ds2(out.curvature),
            mesh_id=_ds2(out.mesh_id),
            linear_z=_ds2(out.linear_z),
            depth=_ds2(out.depth),
            position=_ds2(out.position),
        )
    return out
