"""Full material model: normal maps, per-channel metallic/roughness
selectors, emissive maps (reference scene_descriptor_set.glsl:180-228)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.scene.build import (
    MaterialDef, SceneBuilder, _triangle_tangents,
)


def _trace_plane_scene(mdef_kwargs, textures, n_rays=2):
    """Build a 2x2 ground plane with the given maps, trace straight-down
    rays at two quadrant centers, return the Surface."""
    b = SceneBuilder()
    tex_ids = {k: b.add_texture(img) for k, img in textures.items()}
    kw = {k: tex_ids[v] if isinstance(v, str) else v
          for k, v in mdef_kwargs.items()}
    m = b.add_material(MaterialDef(**kw))
    b.add_instance(prim.plane(2.0, 2.0), m)
    scene = b.build(use_bvh=True)
    closest_surface = bvh_mod.make_surface_tracer(scene)
    o = jnp.asarray([[-0.5, 1.0, -0.5], [0.5, 1.0, 0.5]], jnp.float32)[:n_rays]
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n_rays, 3))
    hit, surf = closest_surface(o, d, 10.0)
    assert bool(hit.valid.all())
    return surf


def test_triangle_tangents_orthonormal():
    """Tangents follow +u in world space, unit length, perpendicular-able
    to the face normal; degenerate UVs get a finite fallback."""
    tp = np.asarray([[[0, 0, 0], [2, 0, 0], [0, 0, 2]]], np.float32)
    tuv = np.asarray([[[0, 0], [1, 0], [0, 1]]], np.float32)
    t4 = _triangle_tangents(tp, tuv)
    assert t4.shape == (1, 4)
    np.testing.assert_allclose(t4[0, :3], [1, 0, 0], atol=1e-6)
    assert np.isfinite(t4).all()
    # degenerate uv (all equal) -> finite unit fallback
    t4d = _triangle_tangents(tp, np.zeros_like(tuv))
    assert np.isfinite(t4d).all()
    assert abs(np.linalg.norm(t4d[0, :3]) - 1.0) < 1e-5


def test_normal_map_perturbs_shading_normal():
    """A uniform tangent-space normal tilted toward +u must tilt the
    shading normal along the world tangent direction (fetch_normal +
    get_normal_from_map, scene_descriptor_set.glsl:190-196)."""
    # tangent-space normal (0.6, 0, 0.8): tilt toward +tangent
    nm = np.zeros((8, 8, 3), np.float32)
    nm[..., 0] = 0.6 * 0.5 + 0.5
    nm[..., 1] = 0.5
    nm[..., 2] = 0.8 * 0.5 + 0.5
    surf = _trace_plane_scene({"normal_tex": "nm"}, {"nm": nm})
    n = np.asarray(surf.normal)
    flat = _trace_plane_scene({}, {"dummy": nm})  # untextured control
    n0 = np.asarray(flat.normal)
    np.testing.assert_allclose(n0, [[0, 1, 0]] * 2, atol=1e-4)
    assert np.all(np.abs(np.linalg.norm(n, axis=1) - 1.0) < 1e-4)
    # tilted by ~37 degrees away from straight up
    assert np.all(n[:, 1] < 0.9)
    assert np.all(np.abs(np.abs(n[:, 0]) + np.abs(n[:, 2]) ) > 0.4)


def test_metallic_roughness_channel_selectors():
    """roughness from G, metallic from B of one packed texture (glTF
    metallicRoughness; reference texture_indices1.zw selectors)."""
    mr = np.zeros((8, 8, 3), np.float32)
    mr[..., 1] = 0.7  # roughness channel
    mr[..., 2] = 0.9  # metallic channel
    surf = _trace_plane_scene(
        {"roughness": 0.2, "metallic": 0.0,
         "roughness_tex": "mr", "metallic_tex": "mr",
         "roughness_channel": 1, "metallic_channel": 2},
        {"mr": mr})
    np.testing.assert_allclose(np.asarray(surf.roughness), 0.7, atol=0.02)
    np.testing.assert_allclose(np.asarray(surf.metallic), 0.9, atol=0.02)


def test_roughness_floor():
    """Textured roughness clamps at 0.1 (MIN_ROUGHNESS,
    scene_descriptor_set.glsl:202)."""
    mr = np.zeros((8, 8, 3), np.float32)  # zero roughness texel
    surf = _trace_plane_scene(
        {"roughness": 0.5, "roughness_tex": "mr", "roughness_channel": 1},
        {"mr": mr})
    np.testing.assert_allclose(np.asarray(surf.roughness), 0.1, atol=1e-5)


def test_emissive_map_multiplies_factor():
    em = np.zeros((8, 8, 3), np.float32)
    em[..., 0] = 0.5
    surf = _trace_plane_scene(
        {"emissive": (2.0, 2.0, 2.0), "emissive_tex": "em"}, {"em": em})
    e = np.asarray(surf.emissive)
    np.testing.assert_allclose(e[:, 0], 1.0, atol=0.02)
    np.testing.assert_allclose(e[:, 1:], 0.0, atol=0.02)


def test_untextured_materials_unchanged():
    """Constant materials pass through when no maps are registered."""
    surf = _trace_plane_scene(
        {"albedo": (0.3, 0.4, 0.5), "roughness": 0.33, "metallic": 0.66},
        {"pad": np.zeros((4, 4, 3), np.float32)})
    np.testing.assert_allclose(np.asarray(surf.albedo),
                               [[0.3, 0.4, 0.5]] * 2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(surf.roughness), 0.33, atol=1e-5)
    np.testing.assert_allclose(np.asarray(surf.metallic), 0.66, atol=1e-5)


def test_gltf_material_maps_import(tmp_path):
    """glTF with normal + metallicRoughness + emissive textures maps to
    the right MaterialDef fields."""
    import base64
    import json
    import struct as pystruct

    from hybrid_rendering_tpu.scene.gltf import load_gltf_scene
    from hybrid_rendering_tpu.utils import image as img_utils

    # one triangle
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    uvc = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    blob = pos.tobytes() + uvc.tobytes() + idx.tobytes()

    def png_bytes(rgb):
        img = np.zeros((4, 4, 3), np.float32)
        img[:] = rgb
        p = str(tmp_path / f"t{hash(rgb) & 0xffff}.png")
        img_utils.write_png(p, img)
        return p

    paths = {
        "nrm": png_bytes((0.5, 0.5, 1.0)),
        "mr": png_bytes((0.0, 0.8, 0.6)),
        "em": png_bytes((1.0, 0.5, 0.25)),
    }
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0,
        }]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "metallicRoughnessTexture": {"index": 1},
            },
            "normalTexture": {"index": 0},
            "emissiveTexture": {"index": 2},
            "emissiveFactor": [2.0, 2.0, 2.0],
        }],
        "textures": [{"source": 0}, {"source": 1}, {"source": 2}],
        "images": [{"uri": paths["nrm"].split("/")[-1]},
                   {"uri": paths["mr"].split("/")[-1]},
                   {"uri": paths["em"].split("/")[-1]}],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
    }
    path = str(tmp_path / "scene.gltf")
    with open(path, "w") as f:
        json.dump(gltf, f)
    scene = load_gltf_scene(path, use_bvh=False)
    mats = scene.materials
    assert int(mats.normal_tex[0]) >= 0
    assert int(mats.roughness_tex[0]) >= 0
    assert int(mats.roughness_tex[0]) == int(mats.metallic_tex[0])
    assert int(mats.emissive_tex[0]) >= 0
    assert int(mats.roughness_channel[0]) == 1
    assert int(mats.metallic_channel[0]) == 2
    assert scene.tri_tangent is not None and scene.tri_tangent.shape == (1, 4)
