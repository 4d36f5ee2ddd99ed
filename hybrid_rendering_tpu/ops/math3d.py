"""Small vector/matrix helpers shared by all passes.

Everything is batched: a "vec3" is an (..., 3) array. These replace GLSL
built-ins used throughout the reference shader library.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

EPSILON = 1e-4
INF_T = 1e5  # reference INFINITY = 100000.0 (src/shaders/common.glsl:17)


def dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1)


def length(v: Array) -> Array:
    return jnp.sqrt(jnp.maximum(dot(v, v), 1e-20))


def normalize(v: Array) -> Array:
    return v / length(v)[..., None]


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def reflect(i: Array, n: Array) -> Array:
    """GLSL reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    return i - 2.0 * dot(n, i)[..., None] * n


def luminance(rgb: Array) -> Array:
    """Reference luminance (src/shaders/common.glsl:143-146)."""
    w = jnp.array([0.299, 0.587, 0.114], rgb.dtype)
    return jnp.maximum(jnp.sum(rgb * w, axis=-1), 1e-4)


def make_rotation_matrix(z: Array):
    """Orthonormal basis with +Z = z (reference brdf.glsl:8-16).
    Returns (x, y, z) tangent-frame columns, each (..., 3)."""
    up_y = jnp.array([0.0, 1.0, 0.0], z.dtype)
    up_z = jnp.array([0.0, 0.0, 1.0], z.dtype)
    use_z = (jnp.abs(dot(z, jnp.broadcast_to(up_y, z.shape))) > 0.99)[..., None]
    ref = jnp.where(use_z, up_z, up_y)
    x = normalize(jnp.cross(ref, z))
    y = jnp.cross(z, x)
    return x, y, z


def to_world(frame, v: Array) -> Array:
    """Rotate tangent-space v into the world frame (x,y,z columns)."""
    x, y, z = frame
    return v[..., 0:1] * x + v[..., 1:2] * y + v[..., 2:3] * z


def transform_point(m: Array, p: Array) -> Array:
    """Apply 4x4 matrix to (..., 3) points with perspective divide."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum("ij,...j->...i", m, ph)
    return out[..., :3] / out[..., 3:4]


def transform_point_noperspective(m: Array, p: Array) -> Array:
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum("ij,...j->...i", m, ph)
    return out[..., :3]


def transform_dir(m: Array, d: Array) -> Array:
    return jnp.einsum("ij,...j->...i", m[:3, :3], d)


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / jnp.maximum(edge1 - edge0, 1e-8), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def world_position_from_depth(tex_coords: Array, ndc_depth: Array,
                              view_proj_inverse: Array) -> Array:
    """Depth -> world reconstruction (reference common.glsl:169-184).
    tex_coords: (..., 2) in [0,1] with v=0 at the TOP row; ndc_depth: (...,)
    in [0,1]. Framework convention: ndc y = +1 at the top row (see
    utils/camera.py camera_rays), hence the v flip."""
    screen = jnp.stack(
        [tex_coords[..., 0] * 2.0 - 1.0, 1.0 - tex_coords[..., 1] * 2.0], axis=-1
    )
    ndc = jnp.concatenate(
        [screen, ndc_depth[..., None], jnp.ones_like(ndc_depth)[..., None]], axis=-1
    )
    world = jnp.einsum("ij,...j->...i", view_proj_inverse, ndc)
    return world[..., :3] / world[..., 3:4]


def linear_eye_depth(z: Array, z_buffer_params: Array) -> Array:
    """Reference common.glsl:188-191."""
    return 1.0 / (z_buffer_params[2] * z + z_buffer_params[3])
