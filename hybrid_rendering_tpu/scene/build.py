"""Scene builder: instanced meshes + materials -> flat device arrays.

TPU-native replacement for dw::RayTracedScene (SURVEY §2.9): instead of a
bindless descriptor set (1024 vertex/index SSBOs + TLAS), the whole scene is
compiled once to a dense world-space triangle soup with per-triangle
material / mesh-id arrays, plus an optional BVH. Static scenes (all
reference scenes are static — src/g_buffer.vert:73-74) compile once at load.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from hybrid_rendering_tpu.scene.primitives import Mesh
from hybrid_rendering_tpu.types import Material, SceneArrays


@dataclasses.dataclass
class MaterialDef:
    """Material row mirroring the reference's 4-map material SSBO with
    per-channel roughness/metallic selectors
    (src/shaders/scene_descriptor_set.glsl:20-24, 180-228)."""

    albedo: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    roughness: float = 0.5
    metallic: float = 0.0
    emissive: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    albedo_tex: int = -1  # AtlasBuilder texture index (multiplies albedo,
    #                        matching glTF baseColorFactor x texture)
    normal_tex: int = -1  # tangent-space normal map
    roughness_tex: int = -1
    metallic_tex: int = -1
    emissive_tex: int = -1  # multiplies emissive factor (glTF semantics)
    roughness_channel: int = 1  # texel channel (glTF metallicRoughness: G)
    metallic_channel: int = 2  # (glTF metallicRoughness: B)


def _triangle_tangents(tp: np.ndarray, tuv: np.ndarray) -> np.ndarray:
    """Per-triangle tangent + bitangent handedness from the UV
    parameterization: (F,3,3) positions + (F,3,2) uvs -> (F,4)
    [tangent.xyz, sign]. Replaces the reference's per-vertex Assimp
    tangents (dw::Vertex tangent/bitangent, g_buffer.cpp:406-412)."""
    e1 = tp[:, 1] - tp[:, 0]
    e2 = tp[:, 2] - tp[:, 0]
    d1 = tuv[:, 1] - tuv[:, 0]  # (F,2)
    d2 = tuv[:, 2] - tuv[:, 0]
    det = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
    ok = np.abs(det) > 1e-12
    r = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
    t = r * (d2[:, 1:2] * e1 - d1[:, 1:2] * e2)
    b = r * (d1[:, 0:1] * e2 - d2[:, 0:1] * e1)
    n = np.cross(e1, e2)
    # degenerate UVs: any stable vector perpendicular to the face normal
    fallback = np.cross(n, np.where(
        np.abs(n[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]]))
    t = np.where(ok[:, None] & (np.linalg.norm(t, axis=1, keepdims=True)
                                > 1e-12), t, fallback)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    sign = np.where(np.sum(np.cross(n, t) * b, axis=1) < 0.0, -1.0, 1.0)
    return np.concatenate([t, sign[:, None]], axis=1).astype(np.float32)


def translation(x, y, z) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


def scaling(sx, sy=None, sz=None) -> np.ndarray:
    sy = sx if sy is None else sy
    sz = sx if sz is None else sz
    return np.diag([sx, sy, sz, 1.0]).astype(np.float32)


def rotation_y(angle_rad) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rotation_x(angle_rad) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


class SceneBuilder:
    def __init__(self):
        from hybrid_rendering_tpu.scene.textures import AtlasBuilder

        self._tri_pos: List[np.ndarray] = []
        self._tri_nrm: List[np.ndarray] = []
        self._tri_uv: List[np.ndarray] = []
        self._tri_tan: List[np.ndarray] = []
        self._tri_mat: List[np.ndarray] = []
        self._tri_mesh: List[np.ndarray] = []
        self._materials: List[MaterialDef] = []
        self._next_mesh_id = 0
        self._atlas = AtlasBuilder()

    def add_texture(self, img) -> int:
        """Register a texture image; reference it from
        MaterialDef.albedo_tex."""
        return self._atlas.add(img)

    def add_material(self, mat: MaterialDef) -> int:
        self._materials.append(mat)
        return len(self._materials) - 1

    def add_instance(self, mesh: Mesh, material: int,
                     transform: Optional[np.ndarray] = None) -> int:
        """Instance a mesh with a rigid/affine transform; returns its
        mesh_id (the reprojection disocclusion identity,
        reference g_buffer.cpp:141-176)."""
        m = np.eye(4, dtype=np.float32) if transform is None else np.asarray(transform, np.float32)
        pos_h = np.concatenate([mesh.positions, np.ones_like(mesh.positions[:, :1])], axis=1)
        world_pos = (pos_h @ m.T)[:, :3]
        normal_mat = np.linalg.inv(m[:3, :3]).T
        world_nrm = mesh.normals @ normal_mat.T
        world_nrm /= np.maximum(np.linalg.norm(world_nrm, axis=1, keepdims=True), 1e-8)

        idx = mesh.indices
        # A mirroring (negative-determinant) transform reverses triangle
        # winding, which would point the cross-product geometric normal
        # opposite the shading normals (e.g. a ceiling plane placed with a
        # y-flip reads as wound "outward" — its geo normal faces out of
        # the room). Swap two indices to restore winding so frontface
        # classification (scene/fetch.py) stays consistent scene-wide.
        if np.linalg.det(m[:3, :3]) < 0.0:
            idx = idx[:, ::-1]
        self._tri_pos.append(world_pos[idx])  # (F,3,3)
        self._tri_nrm.append(world_nrm[idx])
        self._tri_uv.append(mesh.uvs[idx])
        self._tri_tan.append(
            _triangle_tangents(world_pos[idx], mesh.uvs[idx]))
        f = idx.shape[0]
        self._tri_mat.append(np.full((f,), material, np.int32))
        self._tri_mesh.append(np.full((f,), self._next_mesh_id, np.int32))
        mesh_id = self._next_mesh_id
        self._next_mesh_id += 1
        return mesh_id

    def build(self, use_bvh: bool = True) -> SceneArrays:
        tri_pos = np.concatenate(self._tri_pos, axis=0).astype(np.float32)
        tri_nrm = np.concatenate(self._tri_nrm, axis=0).astype(np.float32)
        tri_uv = np.concatenate(self._tri_uv, axis=0).astype(np.float32)
        tri_mat = np.concatenate(self._tri_mat, axis=0)
        tri_mesh = np.concatenate(self._tri_mesh, axis=0)

        tri_tan = np.concatenate(self._tri_tan, axis=0).astype(np.float32)

        def icol(name):
            return jnp.asarray(
                [getattr(m, name) for m in self._materials], jnp.int32)

        mats = Material(
            albedo=jnp.asarray([m.albedo for m in self._materials], jnp.float32),
            roughness=jnp.asarray([m.roughness for m in self._materials], jnp.float32),
            metallic=jnp.asarray([m.metallic for m in self._materials], jnp.float32),
            emissive=jnp.asarray([m.emissive for m in self._materials], jnp.float32),
            albedo_tex=icol("albedo_tex"),
            normal_tex=icol("normal_tex"),
            roughness_tex=icol("roughness_tex"),
            metallic_tex=icol("metallic_tex"),
            emissive_tex=icol("emissive_tex"),
            roughness_channel=icol("roughness_channel"),
            metallic_channel=icol("metallic_channel"),
        )
        atlas = self._atlas.build()

        bvh_kw = {}
        if use_bvh:
            # prefer the native binned-SAH builder (native/hr_native.cpp);
            # fall back to the Python Morton median-split build
            from hybrid_rendering_tpu.scene import native as native_mod

            built = native_mod.build_bvh_native(tri_pos)
            if built is None:
                from hybrid_rendering_tpu.ops import bvh as bvh_mod

                built = bvh_mod.build_bvh(tri_pos)
            nodes_min, nodes_max, nodes_meta, order = built
            # permute triangles into BVH leaf order so leaves index
            # contiguous ranges (better locality for traversal gathers)
            tri_pos = tri_pos[order]
            tri_nrm = tri_nrm[order]
            tri_uv = tri_uv[order]
            tri_tan = tri_tan[order]
            tri_mat = tri_mat[order]
            tri_mesh = tri_mesh[order]
            bvh_kw = dict(
                bvh_nodes_min=jnp.asarray(nodes_min),
                bvh_nodes_max=jnp.asarray(nodes_max),
                bvh_nodes_meta=jnp.asarray(nodes_meta),
                bvh_tri_order=jnp.asarray(order),
            )

        return SceneArrays(
            tri_pos=jnp.asarray(tri_pos),
            tri_normal=jnp.asarray(tri_nrm),
            tri_uv=jnp.asarray(tri_uv),
            tri_mat=jnp.asarray(tri_mat),
            tri_mesh_id=jnp.asarray(tri_mesh),
            materials=mats,
            tri_tangent=jnp.asarray(tri_tan),
            atlas=atlas,
            **bvh_kw,
        )
