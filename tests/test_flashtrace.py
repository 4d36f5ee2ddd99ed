"""FlashTrace (MXU-dense Pallas tracer) vs the XLA brute-force oracle.
Runs in Pallas interpret mode on the CPU backend."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import intersect
from hybrid_rendering_tpu.ops.pallas import flashtrace


def _random_tris(n, seed=0, scale=3.0):
    rs = np.random.RandomState(seed)
    base = rs.uniform(-scale, scale, size=(n, 1, 3))
    offs = rs.uniform(-0.4, 0.4, size=(n, 3, 3))
    return (base + offs).astype(np.float32)


def _random_rays(n, seed=1, scale=5.0, aim_at=None):
    """Random rays; with aim_at (K,3) targets, half the rays point at a
    jittered target so hit coverage is guaranteed."""
    rs = np.random.RandomState(seed)
    o = rs.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    if aim_at is not None:
        k = n // 2
        targets = aim_at[rs.randint(0, aim_at.shape[0], size=k)]
        targets = targets + rs.normal(scale=0.05, size=(k, 3))
        d[:k] = targets - o[:k]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


@pytest.mark.parametrize("ntri", [37, 600])  # < and > TRI_TILE
def test_closest_matches_brute(ntri):
    tri = _random_tris(ntri, seed=2)
    o, d = _random_rays(100, seed=3, aim_at=tri.mean(axis=1))
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    hit = flashtrace.flash_closest_hit(
        fs, jnp.asarray(o), jnp.asarray(d), jnp.full((100,), 1e5, jnp.float32),
        interpret=True,
    )
    ref = intersect.closest_hit_brute(jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d))
    got_id = np.asarray(hit.tri_id)
    ref_id = np.asarray(ref.tri_id)
    np.testing.assert_array_equal(got_id >= 0, ref_id >= 0)
    sel = ref_id >= 0
    np.testing.assert_allclose(
        np.asarray(hit.t)[sel], np.asarray(ref.t)[sel], rtol=3e-4, atol=3e-4
    )
    # same triangle modulo exact ties
    assert (got_id[sel] == ref_id[sel]).mean() > 0.95
    # barycentrics agree where ids agree
    agree = sel & (got_id == ref_id)
    np.testing.assert_allclose(
        np.asarray(hit.u)[agree], np.asarray(ref.u)[agree], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(hit.v)[agree], np.asarray(ref.v)[agree], atol=2e-3
    )


def test_visibility_matches_brute():
    tri = _random_tris(200, seed=4)
    o, d = _random_rays(128, seed=5, aim_at=tri.mean(axis=1))
    t_max = np.full(128, 4.0, np.float32)
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    vis = flashtrace.flash_visibility(
        fs, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), interpret=True
    )
    ref = intersect.occluded_brute(
        jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)
    )
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(ref))


def test_tmax_respected():
    tri = jnp.asarray(
        [[[-5.0, -5.0, -3.0], [5.0, -5.0, -3.0], [0.0, 5.0, -3.0]]], jnp.float32
    )
    fs = flashtrace.make_flash_scene(tri)
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
    hit = flashtrace.flash_closest_hit(
        fs, o, d, jnp.asarray([10.0, 1.0], jnp.float32), interpret=True
    )
    assert int(hit.tri_id[0]) == 0 and abs(float(hit.t[0]) - 3.0) < 1e-4
    assert int(hit.tri_id[1]) == -1  # t_max 1.0 < 3.0


def test_make_tracers_flash_method():
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.scene.build import MaterialDef, SceneBuilder, translation
    from hybrid_rendering_tpu.scene import primitives as prim

    b = SceneBuilder()
    m = b.add_material(MaterialDef())
    b.add_instance(prim.plane(10, 10), m)
    b.add_instance(prim.box(1, 1, 1), m, translation(0, 0.5, 0))
    scene = b.build(use_bvh=False)
    closest, vis = bvh_mod.make_tracers(scene, method="flash")
    o = jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hit = closest(o, d, 1e5)
    assert abs(float(hit.t[0]) - 4.0) < 1e-3
    assert float(vis(o, d, jnp.asarray([10.0]))[0]) == 0.0
    assert float(vis(o, d, jnp.asarray([2.0]))[0]) == 1.0


# ---------------------------------------------------------------------------
# v2 sparse (cluster-culled) path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ntri", [37, 1500])
def test_sparse_closest_matches_brute(ntri):
    tri = _random_tris(ntri, seed=5)
    o, d = _random_rays(300, seed=6, aim_at=tri.mean(axis=1))
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    hit = flashtrace.flash_closest_hit_sparse(
        fs, jnp.asarray(o), jnp.asarray(d), jnp.full((300,), 1e5, jnp.float32),
        interpret=True,
    )
    ref = intersect.closest_hit_brute(jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d))
    got_id = np.asarray(hit.tri_id)
    ref_id = np.asarray(ref.tri_id)
    np.testing.assert_array_equal(got_id >= 0, ref_id >= 0)
    sel = ref_id >= 0
    np.testing.assert_allclose(
        np.asarray(hit.t)[sel], np.asarray(ref.t)[sel], rtol=3e-4, atol=3e-4
    )
    assert (got_id[sel] == ref_id[sel]).mean() > 0.95
    agree = sel & (got_id == ref_id)
    np.testing.assert_allclose(
        np.asarray(hit.u)[agree], np.asarray(ref.u)[agree], atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(hit.v)[agree], np.asarray(ref.v)[agree], atol=3e-3
    )


def test_sparse_visibility_matches_brute():
    tri = _random_tris(900, seed=7)
    o, d = _random_rays(300, seed=8, aim_at=tri.mean(axis=1))
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    vis = flashtrace.flash_visibility_sparse(
        fs, jnp.asarray(o), jnp.asarray(d), jnp.full((300,), 1e5, jnp.float32),
        interpret=True, vis_bf16=False,
    )
    ref = intersect.occluded_brute(
        jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d),
        jnp.full((300,), 1e5, jnp.float32))
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(ref))
    # production single-pass bf16 accept: edge-adjacent flips bounded
    vis16 = flashtrace.flash_visibility_sparse(
        fs, jnp.asarray(o), jnp.asarray(d), jnp.full((300,), 1e5, jnp.float32),
        interpret=True, vis_bf16=True,
    )
    assert (np.asarray(vis16) != np.asarray(ref)).mean() <= 0.03


def test_sparse_attrs_match_dense():
    tri = _random_tris(700, seed=9)
    rs = np.random.RandomState(10)
    tn = rs.normal(size=(700, 3, 3)).astype(np.float32)
    tn /= np.linalg.norm(tn, axis=-1, keepdims=True)
    uv = rs.uniform(size=(700, 3, 2)).astype(np.float32)
    mat = rs.randint(0, 5, size=(700,)).astype(np.int32)
    mesh = rs.randint(0, 3, size=(700,)).astype(np.int32)
    fs = flashtrace.make_flash_scene(
        jnp.asarray(tri), jnp.asarray(tn), jnp.asarray(uv),
        jnp.asarray(mat), jnp.asarray(mesh))
    o, d = _random_rays(256, seed=11, aim_at=tri.mean(axis=1))
    tm = jnp.full((256,), 1e5, jnp.float32)
    hit_s, attr_s = flashtrace.flash_closest_hit_attrs_sparse(
        fs, jnp.asarray(o), jnp.asarray(d), tm, interpret=True)
    hit_d, attr_d = flashtrace.flash_closest_hit_attrs(
        fs, jnp.asarray(o), jnp.asarray(d), tm, interpret=True)
    same = np.asarray(hit_s.tri_id) == np.asarray(hit_d.tri_id)
    assert same.mean() > 0.95
    np.testing.assert_allclose(
        np.asarray(attr_s)[same], np.asarray(attr_d)[same], atol=3e-3)


def test_packet_lists_no_overflow_on_scenes():
    """Our scenes' coherent packets must fit MAX_CLUSTERS (completeness
    condition of the sparse tracer)."""
    from hybrid_rendering_tpu.scene.scenes import load_scene

    for name in ("shadows_test", "gi_test"):
        scene, light, camkw = load_scene(name)
        fs = flashtrace.make_flash_scene(scene.tri_pos)
        # camera-style coherent packet
        R = 2048
        o = np.asarray(camkw["eye"], np.float32)[None].repeat(R, 0)
        rs = np.random.RandomState(12)
        d = rs.normal(scale=0.08, size=(R, 3)).astype(np.float32)
        d += np.float32([0, -0.2, -1.0])
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ids, counts, raw = flashtrace.packet_cluster_lists(
            fs, jnp.asarray(o), jnp.asarray(d),
            jnp.full((R,), 1e4, jnp.float32))
        assert int(np.asarray(counts).max()) <= flashtrace.MAX_CLUSTERS


def test_sparse_overflow_exact_rounds():
    """When a packet's raw candidate count exceeds the list capacity K,
    the sparse call must trace the remaining rank windows in extra
    same-payload rounds instead of silently dropping clusters (ADVICE r2
    high: incoherent probe/AO packets list every cluster and an arbitrary
    first-K was kept; r4 replaced the r3 dense lax.cond fallback with the
    rounds loop — one Mosaic payload per site instead of two). Winners
    must match the dense fp32 oracle exactly by id; t/u/v to the sparse
    kernel's bf16x3 split-operand precision (~2^-16 relative — the r3
    test compared bitwise only because its fallback literally RAN the
    fp32 dense kernel)."""
    tri = _random_tris(1024, seed=7)  # 8 clusters at TRI_TILE=128
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    assert fs.num_tri_tiles >= 8
    # incoherent packet: one origin, directions over the whole sphere
    rs = np.random.RandomState(5)
    o = np.zeros((256, 3), np.float32)
    d = rs.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = jnp.full((256,), 1e5, jnp.float32)
    _, _, raw = flashtrace.packet_cluster_lists(
        fs, jnp.asarray(o), jnp.asarray(d), tm, k_list=4)
    assert int(np.asarray(raw).max()) > 4, "test premise: packet overflows"

    hit_s = flashtrace._flash_sparse_impl(
        fs, jnp.asarray(o), jnp.asarray(d), tm, 1e-3, True,
        with_attrs=False, k_cap=4)
    hit_d = flashtrace.flash_closest_hit(
        fs, jnp.asarray(o), jnp.asarray(d), tm, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(hit_s.tri_id), np.asarray(hit_d.tri_id))
    np.testing.assert_allclose(
        np.asarray(hit_s.t), np.asarray(hit_d.t), rtol=3e-4, atol=3e-4)

    vis_s = flashtrace._flash_sparse_impl(
        fs, jnp.asarray(o), jnp.asarray(d), tm, 1e-3, True,
        with_attrs=False, any_hit=True, k_cap=4)
    vis_d = flashtrace.flash_visibility(
        fs, jnp.asarray(o), jnp.asarray(d), tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(vis_s), np.asarray(vis_d))


def test_short_ray_distance_cull():
    """The direction-free distance bound must cull far clusters for
    hemisphere-style (straddling) packets with short t_max — AO packets
    rely on this to stay under the list capacity."""
    tri = _random_tris(1024, seed=9, scale=20.0)
    # spatially-sorted tris -> tight cluster AABBs (scene compile uses
    # BVH/Morton leaf order in production)
    tri = tri[np.argsort(tri.mean(axis=1)[:, 0], kind="stable")]
    fs = flashtrace.make_flash_scene(jnp.asarray(tri))
    rs = np.random.RandomState(6)
    o = np.float32([0.0, 0.0, 0.0])[None].repeat(256, 0)
    o += rs.normal(scale=0.2, size=(256, 3)).astype(np.float32)
    d = rs.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    short = jnp.full((256,), 0.5, jnp.float32)
    long = jnp.full((256,), 1e5, jnp.float32)
    _, _, raw_short = flashtrace.packet_cluster_lists(
        fs, jnp.asarray(o), jnp.asarray(d), short)
    _, _, raw_long = flashtrace.packet_cluster_lists(
        fs, jnp.asarray(o), jnp.asarray(d), long)
    assert int(np.asarray(raw_short).max()) < int(np.asarray(raw_long).max())
    # and the culled short-ray trace still matches the dense oracle
    hit_s = flashtrace.flash_closest_hit_sparse(
        fs, jnp.asarray(o), jnp.asarray(d), short, interpret=True)
    hit_d = flashtrace.flash_closest_hit(
        fs, jnp.asarray(o), jnp.asarray(d), short, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(hit_s.tri_id), np.asarray(hit_d.tri_id))
