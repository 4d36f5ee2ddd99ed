"""Native toolkit tests: SAH BVH builder + OBJ loader (with fallbacks)."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.scene import native
from hybrid_rendering_tpu.scene.loader import _load_obj_python, load_obj

OBJ_SAMPLE = """
# tiny quad + tri, mixed face formats
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 2 0 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f 2/2/1 5//1 3/3/1
"""


@pytest.fixture()
def obj_file():
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(OBJ_SAMPLE)
        path = f.name
    yield path
    os.unlink(path)


def test_python_obj_loader(obj_file):
    mesh = _load_obj_python(obj_file)
    assert mesh.num_triangles == 3  # quad triangulated + 1 tri
    assert mesh.positions.shape[1] == 3
    np.testing.assert_allclose(
        np.abs(mesh.normals[:, 2]), 1.0, atol=1e-6
    )  # all +Z normals


def test_native_obj_loader_matches_python(obj_file):
    out = native.load_obj_native(obj_file)
    if out is None:
        pytest.skip("native library unavailable")
    pos, nrm, uv, idx = out
    ref = _load_obj_python(obj_file)
    assert idx.shape == ref.indices.shape
    # triangle soup must be identical regardless of vertex dedup order
    soup_native = np.sort(pos[idx].reshape(-1, 9), axis=0)
    soup_py = np.sort(ref.positions[ref.indices].reshape(-1, 9), axis=0)
    np.testing.assert_allclose(soup_native, soup_py, atol=1e-6)


def test_native_bvh_structure_and_traversal():
    rs = np.random.RandomState(3)
    base = rs.uniform(-4, 4, size=(400, 1, 3))
    tris = (base + rs.uniform(-0.3, 0.3, size=(400, 3, 3))).astype(np.float32)
    out = native.build_bvh_native(tris, leaf_size=4)
    if out is None:
        pytest.skip("native library unavailable")
    nmin, nmax, meta, order = out
    assert sorted(order.tolist()) == list(range(400))
    leaves = meta[meta[:, 1] > 0]
    covered = sorted(sum([list(range(f, f + c)) for f, c, _ in leaves], []))
    assert covered == list(range(400))
    N = meta.shape[0]
    assert (meta[:, 2] > np.arange(N)).all() and (meta[:, 2] <= N).all()

    from hybrid_rendering_tpu.ops import bvh as bvh_mod, intersect

    tri_sorted = tris[order]
    o = rs.uniform(-6, 6, size=(48, 3)).astype(np.float32)
    d = rs.normal(size=(48, 3)).astype(np.float32)
    # aim half the rays at triangles
    targets = tris.mean(axis=1)[rs.randint(0, 400, 24)]
    d[:24] = targets - o[:24]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit = bvh_mod.traverse(
        jnp.asarray(nmin), jnp.asarray(nmax), jnp.asarray(meta),
        jnp.asarray(tri_sorted), jnp.asarray(o), jnp.asarray(d),
        jnp.full(48, 1e5, np.float32),
    )
    ref = intersect.closest_hit_brute(
        jnp.asarray(tri_sorted), jnp.asarray(o), jnp.asarray(d)
    )
    np.testing.assert_array_equal(
        np.asarray(hit.tri_id) >= 0, np.asarray(ref.tri_id) >= 0
    )
    sel = np.asarray(ref.tri_id) >= 0
    assert sel.sum() >= 24
    np.testing.assert_allclose(
        np.asarray(hit.t)[sel], np.asarray(ref.t)[sel], rtol=3e-4, atol=1e-4
    )
