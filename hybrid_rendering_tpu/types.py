"""Core pytree types shared by all render passes.

These replace the reference's C++ structs and Vulkan resources:
  - ``Light``        <- reference Light 4xvec4 pack (src/common.h:106-158,
                        src/shaders/common.glsl:77-139)
  - ``Camera``       <- dw::Camera + the per-frame UBO matrices
                        (src/common.h:161-179, src/main.cpp:937-972)
  - ``SceneArrays``  <- the bindless scene descriptor set flattened into
                        dense device arrays (src/shaders/scene_descriptor_set.glsl)
  - ``Hit``          <- ray-tracing payload / hit attributes
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

LIGHT_TYPE_DIRECTIONAL = 0
LIGHT_TYPE_POINT = 1
LIGHT_TYPE_SPOT = 2


@struct.dataclass
class Light:
    """Single punctual light. Mirrors reference Light accessors
    (src/shaders/common.glsl:84-139) but as named fields instead of a
    packed 4xvec4 struct — XLA keeps scalars in SMEM regardless."""

    direction: Array  # (3,) normalized, points FROM surface TOWARD light
    position: Array  # (3,)
    color: Array  # (3,)
    intensity: Array  # ()
    radius: Array  # () soft-shadow disk radius
    type: Array  # () int32, LIGHT_TYPE_*
    cos_theta_outer: Array  # () spot outer cone
    cos_theta_inner: Array  # () spot inner cone

    @staticmethod
    def directional(direction, color=(1.0, 1.0, 1.0), intensity=1.0, radius=0.1):
        d = jnp.asarray(direction, jnp.float32)
        d = d / jnp.linalg.norm(d)
        return Light(
            direction=d,
            position=jnp.zeros(3, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.float32(intensity),
            radius=jnp.float32(radius),
            type=jnp.int32(LIGHT_TYPE_DIRECTIONAL),
            cos_theta_outer=jnp.float32(0.0),
            cos_theta_inner=jnp.float32(0.0),
        )

    @staticmethod
    def point(position, color=(1.0, 1.0, 1.0), intensity=1.0, radius=0.1):
        return Light(
            direction=jnp.array([0.0, -1.0, 0.0], jnp.float32),
            position=jnp.asarray(position, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.float32(intensity),
            radius=jnp.float32(radius),
            type=jnp.int32(LIGHT_TYPE_POINT),
            cos_theta_outer=jnp.float32(0.0),
            cos_theta_inner=jnp.float32(0.0),
        )

    @staticmethod
    def spot(position, direction, color=(1.0, 1.0, 1.0), intensity=1.0,
             radius=0.1, inner_angle_deg=20.0, outer_angle_deg=30.0):
        d = jnp.asarray(direction, jnp.float32)
        d = d / jnp.linalg.norm(d)
        return Light(
            direction=d,
            position=jnp.asarray(position, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.float32(intensity),
            radius=jnp.float32(radius),
            type=jnp.int32(LIGHT_TYPE_SPOT),
            cos_theta_outer=jnp.float32(jnp.cos(jnp.deg2rad(outer_angle_deg))),
            cos_theta_inner=jnp.float32(jnp.cos(jnp.deg2rad(inner_angle_deg))),
        )


@struct.dataclass
class Camera:
    """Camera matrices — the per-frame UBO (reference src/common.h:161-179,
    built in src/main.cpp:937-972). All matrices are row-vector-convention
    free 4x4 float32; points transform as ``M @ [x,y,z,1]``."""

    view: Array  # (4,4) world -> view
    proj: Array  # (4,4) view -> clip (possibly jittered)
    view_inverse: Array  # (4,4)
    proj_inverse: Array  # (4,4)
    view_proj: Array  # (4,4)
    view_proj_inverse: Array  # (4,4)
    prev_view_proj: Array  # (4,4) previous frame view_proj (with current jitter)
    position: Array  # (3,)
    near: Array  # ()
    far: Array  # ()
    jitter: Array  # (2,) current subpixel jitter in NDC units
    prev_jitter: Array  # (2,)

    @property
    def z_buffer_params(self) -> Array:
        """Matches dw::Camera z_buffer_params consumed by
        linear_eye_depth (src/shaders/common.glsl:188-191):
        ``1 / (z*p.z + p.w)`` maps ndc depth -> linear eye depth."""
        n, f = self.near, self.far
        return jnp.stack([1.0 - f / n, f / n, (1.0 - f / n) / f, (f / n) / f])


@struct.dataclass
class Material:
    """Flat material table row — the reference's material SSBO with its
    five per-map texture indices and roughness/metallic channel selectors
    (src/shaders/scene_descriptor_set.glsl:20-24, 180-228). Texture
    indices are -1 when the map is absent (constants used instead)."""

    albedo: Array  # (M,3)
    roughness: Array  # (M,)
    metallic: Array  # (M,)
    emissive: Array  # (M,3)
    albedo_tex: Array = None  # (M,) int32 atlas texture index, -1 = none
    normal_tex: Array = None  # (M,) int32 tangent-space normal map
    roughness_tex: Array = None  # (M,) int32
    metallic_tex: Array = None  # (M,) int32
    emissive_tex: Array = None  # (M,) int32
    roughness_channel: Array = None  # (M,) int32 texel channel selector
    metallic_channel: Array = None  # (M,) int32


@struct.dataclass
class SceneArrays:
    """The whole scene compiled to flat device arrays — the TPU-native
    replacement for the reference's bindless descriptor set
    (src/shaders/scene_descriptor_set.glsl:60-89): 1024 vertex/index SSBOs
    + TLAS become dense triangle soup + (optional) BVH arrays.

    All geometry is pre-transformed to world space (reference scenes are
    static: src/g_buffer.vert:73-74 relies on this too)."""

    # triangle soup, world space
    tri_pos: Array  # (T, 3, 3) vertex positions per triangle
    tri_normal: Array  # (T, 3, 3) per-vertex shading normals
    tri_uv: Array  # (T, 3, 2)
    tri_mat: Array  # (T,) int32 material index
    tri_mesh_id: Array  # (T,) int32 submesh id (disocclusion identity,
    #                       reference g_buffer.cpp:141-176)
    materials: Material
    # per-triangle tangent frame for normal mapping (xyz = tangent,
    # w = bitangent handedness) — the reference interpolates per-vertex
    # Assimp tangents (dw::Vertex, g_buffer.cpp:406-412); flat per-triangle
    # tangents from the UV parameterization are equivalent for the maps'
    # TBN transform. None for scenes without normal maps.
    tri_tangent: Optional[Array] = None  # (T, 4)
    # texture atlas (None when the scene is untextured)
    atlas: Optional[Any] = None
    # BVH arrays (filled by ops.bvh.build_bvh; zeros when brute-force)
    bvh_nodes_min: Optional[Array] = None  # (N, 3)
    bvh_nodes_max: Optional[Array] = None  # (N, 3)
    bvh_nodes_meta: Optional[Array] = None  # (N, 3) int32 [left/first, right/count, is_leaf]
    bvh_tri_order: Optional[Array] = None  # (T,) int32 leaf triangle permutation

    @property
    def num_triangles(self) -> int:
        return self.tri_pos.shape[0]

    def aabb(self):
        lo = self.tri_pos.reshape(-1, 3).min(axis=0)
        hi = self.tri_pos.reshape(-1, 3).max(axis=0)
        return lo, hi


@struct.dataclass
class Hit:
    """Ray-hit record (the TPU equivalent of the RT pipeline hit
    attributes + instance fetch, src/shaders/scene_descriptor_set.glsl:95-176)."""

    t: Array  # (...,) hit distance; >= t_max means miss
    tri_id: Array  # (...,) int32, -1 on miss
    u: Array  # (...,) barycentric
    v: Array  # (...,)

    @property
    def valid(self) -> Array:
        return self.tri_id >= 0


@struct.dataclass
class Surface:
    """Interpolated surface attributes at a hit point."""

    position: Array  # (..., 3)
    normal: Array  # (..., 3) shading normal (normalized)
    geo_normal: Array  # (..., 3) geometric normal
    uv: Array  # (..., 2)
    albedo: Array  # (..., 3)
    roughness: Array  # (...,)
    metallic: Array  # (...,)
    emissive: Array  # (..., 3)
    mesh_id: Array  # (...,) int32
    mat_id: Array  # (...,) int32
    # True where the ray struck the geometric front face (dot(d, geo) < 0
    # BEFORE the two-sided flip). Shading stays two-sided everywhere; the
    # DDGI probe trace uses this to zero backface radiance and shorten the
    # stored visibility distance (Majercik et al. 2019 §4.2) so probes
    # embedded in / behind walls cannot leak light into the cage.
    frontface: Array = None  # (...,) bool


@struct.dataclass
class GBuffer:
    """Deferred G-buffer — reference layout (src/g_buffer.h:34-37, SURVEY §2.3):
    GB1 = albedo+metallic, GB2 = oct normal + motion, GB3 = roughness,
    curvature, mesh_id, linear_z, plus depth. Stored as named planes; XLA
    lays them out, we don't pack channels."""

    albedo: Array  # (H, W, 3)
    metallic: Array  # (H, W)
    normal: Array  # (H, W, 3)  decoded normal (oct codec used for storage tests)
    motion: Array  # (H, W, 2)  prev - curr ndc
    roughness: Array  # (H, W)
    curvature: Array  # (H, W)
    mesh_id: Array  # (H, W) int32, -1 for sky
    linear_z: Array  # (H, W)
    depth: Array  # (H, W) ndc depth in [0,1], 1 = far/sky
    position: Array  # (H, W, 3) world position (reference reconstructs from
    #                   depth, src/shaders/common.glsl:169-184; we keep both)
