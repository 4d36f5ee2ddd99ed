"""Camera construction — replaces dw::Camera + update_uniforms
(reference src/main.cpp:937-972, src/common.h:161-179).

Conventions: right-handed world, y-up. View looks down -Z in view space.
Projection produces NDC with x,y in [-1,1] and depth in [0,1] (Vulkan-style,
matching the reference's reconstruction math common.glsl:169-191).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hybrid_rendering_tpu.types import Camera


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m.astype(np.float32)


def perspective(fov_y_deg: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Perspective with depth mapped to [0,1] (z=near -> 0, z=far -> 1)."""
    f = 1.0 / np.tan(np.deg2rad(fov_y_deg) / 2.0)
    m = np.zeros((4, 4))
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = far / (near - far)
    m[2, 3] = near * far / (near - far)
    m[3, 2] = -1.0
    return m.astype(np.float32)


def jittered_proj(proj: np.ndarray, jitter_ndc_x: float, jitter_ndc_y: float) -> np.ndarray:
    """Add subpixel jitter to a projection matrix (TAA —
    reference temporal_aa.cpp:66-81 applies jitter via matrix translation)."""
    j = proj.copy()
    j[0, 2] += jitter_ndc_x
    j[1, 2] += jitter_ndc_y
    return j


def make_camera(
    eye,
    target,
    fov_y_deg: float = 60.0,
    width: int = 256,
    height: int = 256,
    near: float = 1.0,
    far: float = 1000.0,
    jitter=(0.0, 0.0),
    prev_view_proj: np.ndarray | None = None,
    prev_jitter=(0.0, 0.0),
    up=(0.0, 1.0, 0.0),
) -> Camera:
    """Build a full Camera pytree (reference fov 60 / near 1 / far 1000:
    src/main.cpp:248-255)."""
    view = look_at(eye, target, up)
    proj = perspective(fov_y_deg, width / height, near, far)
    # NOTE: jitter sign — moving the projection center by j shifts samples
    proj_j = jittered_proj(proj, jitter[0], jitter[1])
    view_proj = (proj_j @ view).astype(np.float32)
    if prev_view_proj is None:
        prev_view_proj = view_proj
    f64 = np.float64
    return Camera(
        view=jnp.asarray(view),
        proj=jnp.asarray(proj_j),
        view_inverse=jnp.asarray(np.linalg.inv(view.astype(f64)).astype(np.float32)),
        proj_inverse=jnp.asarray(np.linalg.inv(proj_j.astype(f64)).astype(np.float32)),
        view_proj=jnp.asarray(view_proj),
        view_proj_inverse=jnp.asarray(
            np.linalg.inv(view_proj.astype(f64)).astype(np.float32)
        ),
        prev_view_proj=jnp.asarray(prev_view_proj),
        position=jnp.asarray(np.asarray(eye, np.float32)),
        near=jnp.float32(near),
        far=jnp.float32(far),
        jitter=jnp.asarray(np.asarray(jitter, np.float32)),
        prev_jitter=jnp.asarray(np.asarray(prev_jitter, np.float32)),
    )


def camera_rays_for_pixels(camera: Camera, px, py, width: int, height: int):
    """Primary rays through arbitrary pixel coordinates (any shape).
    px/py are float pixel coords (0.5 = first pixel center). Used by the
    sharded renderer where each device generates rays for its own rows."""
    # pixel -> ndc; image row 0 = top => ndc y positive at top
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = 1.0 - py / height * 2.0
    ndc = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5), jnp.ones_like(ndc_x)], -1)
    world = jnp.einsum("ij,...j->...i", camera.view_proj_inverse, ndc)
    world = world[..., :3] / world[..., 3:4]
    origins = jnp.broadcast_to(camera.position, world.shape)
    d = world - origins
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return origins, d


def camera_rays(camera: Camera, width: int, height: int, jitter_uv=None):
    """Primary rays through pixel centers.

    Returns (origins (H,W,3), directions (H,W,3)). jitter_uv: optional
    (H,W,2) subpixel offsets in [0,1) added to pixel corners (the GT path
    tracer jitters per-sample, ground_truth_path_trace.rgen:56-60).
    """
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    if jitter_uv is None:
        px = x + 0.5
        py = y + 0.5
    else:
        px = x + jitter_uv[..., 0]
        py = y + jitter_uv[..., 1]
    return camera_rays_for_pixels(camera, px, py, width, height)


def pixel_uv(width: int, height: int):
    """(H,W,2) texel-center UVs in [0,1] (v=0 at top row, matching image
    layout)."""
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([(x + 0.5) / width, (y + 0.5) / height], -1)
