"""Intersection + BVH tests: brute force vs NumPy reference, BVH vs brute
force (BVH build/traversal is hard-kernel #1, SURVEY §7)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.ops import intersect
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.scene.build import MaterialDef, SceneBuilder, translation


def _random_tris(n, seed=0, scale=1.0):
    rs = np.random.RandomState(seed)
    base = rs.uniform(-scale, scale, size=(n, 1, 3))
    offs = rs.uniform(-0.3, 0.3, size=(n, 3, 3))
    return (base + offs).astype(np.float32)


def _numpy_closest(tri, o, d, t_min=1e-3):
    """Scalar NumPy Möller-Trumbore closest-hit oracle."""
    best_t = np.full(o.shape[0], np.inf)
    best_id = np.full(o.shape[0], -1, np.int64)
    for i in range(tri.shape[0]):
        v0, v1, v2 = tri[i]
        e1, e2 = v1 - v0, v2 - v0
        pvec = np.cross(d, e2)
        det = (pvec * e1).sum(1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0
        u = (tvec * pvec).sum(1) * inv
        qvec = np.cross(tvec, e1)
        v = (d * qvec).sum(1) * inv
        t = (e2 * qvec).sum(1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_id = np.where(hit, i, best_id)
    return best_t, best_id


class TestBruteForce:
    def test_single_triangle(self):
        tri = jnp.asarray(
            [[[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.0, -2.0]]], jnp.float32
        )
        o = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
        hit = intersect.closest_hit_brute(tri, o, d)
        assert int(hit.tri_id[0]) == 0
        assert abs(float(hit.t[0]) - 2.0) < 1e-5
        assert int(hit.tri_id[1]) == -1

    def test_matches_numpy_oracle(self):
        tri = _random_tris(100, seed=3)
        rs = np.random.RandomState(4)
        o = rs.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        d = rs.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        hit = intersect.closest_hit_brute(jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d))
        ref_t, ref_id = _numpy_closest(tri, o, d)
        got_id = np.asarray(hit.tri_id)
        got_t = np.asarray(hit.t)
        miss_ref = ref_id < 0
        np.testing.assert_array_equal(got_id < 0, miss_ref)
        sel = ~miss_ref
        np.testing.assert_allclose(got_t[sel], ref_t[sel], rtol=2e-4, atol=1e-4)

    def test_occlusion(self):
        tri = jnp.asarray(
            [[[-10.0, -10.0, -5.0], [10.0, -10.0, -5.0], [0.0, 10.0, -5.0]]],
            jnp.float32,
        )
        o = jnp.zeros((3, 3), jnp.float32)
        d = jnp.asarray(
            [[0, 0, -1.0], [0, 0, 1.0], [0, 0, -1.0]], jnp.float32
        )
        tmax = jnp.asarray([10.0, 10.0, 2.0], jnp.float32)
        vis = intersect.occluded_brute(tri, o, d, tmax)
        # blocked / pointing away / tmax shorter than hit distance
        np.testing.assert_allclose(np.asarray(vis), [0.0, 1.0, 1.0])


class TestBVH:
    def test_build_structure(self):
        tri = _random_tris(200, seed=5, scale=5.0)
        nmin, nmax, meta, order = bvh_mod.build_bvh(tri)
        N = meta.shape[0]
        assert sorted(order.tolist()) == list(range(200))
        # leaves cover all triangles exactly once
        leaves = meta[meta[:, 1] > 0]
        covered = []
        for first, count, _ in leaves:
            covered.extend(range(first, first + count))
        assert sorted(covered) == list(range(200))
        # skip links are strictly increasing targets and <= N
        assert (meta[:, 2] <= N).all()
        assert (meta[:, 2] > np.arange(N)).all()
        # root AABB contains all triangles
        np.testing.assert_array_less(nmin[0] - 1e-5, tri.reshape(-1, 3).min(0) + 1e-4)

    @pytest.mark.parametrize("nrays", [64])
    def test_traversal_matches_brute(self, nrays):
        tri = _random_tris(300, seed=6, scale=4.0)
        nmin, nmax, meta, order = bvh_mod.build_bvh(tri)
        tri_sorted = tri[order]
        rs = np.random.RandomState(7)
        o = rs.uniform(-6, 6, size=(nrays, 3)).astype(np.float32)
        d = rs.normal(size=(nrays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t_max = np.full(nrays, 1e5, np.float32)

        hit = bvh_mod.traverse(
            jnp.asarray(nmin), jnp.asarray(nmax), jnp.asarray(meta),
            jnp.asarray(tri_sorted), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(t_max),
        )
        ref_t, ref_id = _numpy_closest(tri_sorted, o, d)
        got_id = np.asarray(hit.tri_id)
        got_t = np.asarray(hit.t)
        np.testing.assert_array_equal(got_id >= 0, ref_id >= 0)
        sel = ref_id >= 0
        np.testing.assert_allclose(got_t[sel], ref_t[sel], rtol=2e-4, atol=1e-4)
        # same triangle found (modulo exact ties)
        agree = (got_id[sel] == ref_id[sel]).mean()
        assert agree > 0.95

    def test_any_hit_visibility(self):
        tri = _random_tris(100, seed=8, scale=2.0)
        nmin, nmax, meta, order = bvh_mod.build_bvh(tri)
        tri_sorted = tri[order]
        rs = np.random.RandomState(9)
        o = rs.uniform(-4, 4, size=(32, 3)).astype(np.float32)
        d = rs.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t_max = np.full(32, 1e5, np.float32)
        hit = bvh_mod.traverse(
            jnp.asarray(nmin), jnp.asarray(nmax), jnp.asarray(meta),
            jnp.asarray(tri_sorted), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(t_max), any_hit=True,
        )
        ref_t, ref_id = _numpy_closest(tri_sorted, o, d)
        np.testing.assert_array_equal(np.asarray(hit.tri_id) >= 0, ref_id >= 0)

    def test_scene_tracers(self):
        b = SceneBuilder()
        m = b.add_material(MaterialDef())
        b.add_instance(prim.plane(10, 10), m)
        b.add_instance(prim.box(1, 1, 1), m, translation(0, 0.5, 0))
        scene = b.build(use_bvh=True)
        closest, vis = bvh_mod.make_tracers(scene)
        o = jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        hit = closest(o, d, 1e5)
        assert abs(float(hit.t[0]) - 4.0) < 1e-4  # hits box top at y=1
        v = vis(o, d, jnp.asarray([10.0]))
        assert float(v[0]) == 0.0
        v2 = vis(o, d, jnp.asarray([2.0]))
        assert float(v2[0]) == 1.0
