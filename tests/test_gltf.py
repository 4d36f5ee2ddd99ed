"""glTF loader test: build a tiny GLB in memory and load it."""
import json
import struct

import numpy as np
import pytest

from hybrid_rendering_tpu.scene.gltf import load_gltf_scene


def _make_glb(path):
    """Two-triangle quad with a red metallic material, translated node."""
    positions = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)

    bin_data = (positions.tobytes() + normals.tobytes() + uvs.tobytes()
                + indices.tobytes())
    pad = (-len(bin_data)) % 4
    bin_data += b"\x00" * pad

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "roughnessFactor": 0.3,
                "metallicFactor": 0.9,
            }
        }],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))
        f.write(bin_data)


def test_glb_roundtrip(tmp_path):
    p = str(tmp_path / "quad.glb")
    _make_glb(p)
    scene = load_gltf_scene(p, use_bvh=True)
    assert scene.num_triangles == 2
    pos = np.asarray(scene.tri_pos).reshape(-1, 3)
    # node translation applied
    assert pos[:, 0].min() >= 2.0 - 1e-5
    assert pos[:, 0].max() <= 3.0 + 1e-5
    mats = scene.materials
    np.testing.assert_allclose(np.asarray(mats.albedo[0]), [0.8, 0.1, 0.1],
                               atol=1e-6)
    assert abs(float(mats.roughness[0]) - 0.3) < 1e-6
    assert abs(float(mats.metallic[0]) - 0.9) < 1e-6
    # BVH arrays present
    assert scene.bvh_nodes_min is not None
