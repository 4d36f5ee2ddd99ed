"""Multi-chip tracing: the production FlashTrace kernel under shard_map
on the 8-virtual-device CPU mesh (conftest provisions it; Pallas runs in
interpret mode off-TPU). VERDICT r2 #5: multi-chip frames must exercise
the flash path, not the slow pure-XLA walk.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.parallel.mesh import make_mesh
from hybrid_rendering_tpu.parallel.trace import shard_ray_fn
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.scene.build import (
    MaterialDef, SceneBuilder, translation,
)


@pytest.fixture(scope="module")
def scene():
    b = SceneBuilder()
    ground = b.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8), roughness=0.9))
    red = b.add_material(MaterialDef(albedo=(0.8, 0.2, 0.2), roughness=0.4))
    b.add_instance(prim.plane(20.0, 20.0), ground)
    b.add_instance(prim.box(1.0, 1.0, 1.0), red, translation(0, 0.5, 0))
    b.add_instance(prim.uv_sphere(0.6, 8, 12), ground,
                   translation(1.5, 0.6, 0.5))
    return b.build(use_bvh=True)


def _rand_rays(n, seed=3):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)
                    + np.array([0, 2.0, 0], np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def test_sharded_flash_closest_matches_unsharded(scene):
    closest, vis = bvh_mod.make_tracers(scene, method="flash")
    mesh = make_mesh(8)
    s_closest = shard_ray_fn(mesh, closest)
    s_vis = shard_ray_fn(mesh, vis)

    # 1003 rays: not a multiple of 8 — exercises the edge-replication pad
    o, d = _rand_rays(1003)
    ref = closest(o, d, 100.0)
    got = s_closest(o, d, 100.0)
    assert got.t.shape == ref.t.shape
    np.testing.assert_array_equal(np.asarray(got.tri_id),
                                  np.asarray(ref.tri_id))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)

    v_ref = np.asarray(vis(o, d, 100.0))
    v_got = np.asarray(s_vis(o, d, 100.0))
    np.testing.assert_array_equal(v_got, v_ref)


def test_sharded_flash_image_rays_row_local(scene):
    """(H, W, 3) camera-ray batches shard along rows (no resharding from
    the row-sharded frame planes)."""
    closest, _ = bvh_mod.make_tracers(scene, method="flash")
    mesh = make_mesh(8)
    s_closest = shard_ray_fn(mesh, closest)

    H, W = 16, 32
    o, d = _rand_rays(H * W, seed=11)
    o = o.reshape(H, W, 3)
    d = d.reshape(H, W, 3)
    ref = closest(o, d, 100.0)
    got = s_closest(o, d, 100.0)
    assert got.t.shape == (H, W)
    hit_ref = np.asarray(ref.tri_id) >= 0
    hit_got = np.asarray(got.tri_id) >= 0
    # row-local pixel-block linearization differs from the full-image
    # blocking, so packets regroup — hits must still agree everywhere
    np.testing.assert_array_equal(hit_got, hit_ref)
    np.testing.assert_allclose(np.asarray(got.t)[hit_ref],
                               np.asarray(ref.t)[hit_ref],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_full_hybrid_frame_sharded_flash(scene):
    """The ENTIRE hybrid frame under GSPMD row sharding with the
    production FlashTrace kernel shard_map'd per device (the multi-chip
    production path, VERDICT r2 #5). ~4 min CPU compile."""
    import jax

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.parallel.sharding import (
        frame_shardings, shard_frame_state,
    )
    from hybrid_rendering_tpu.types import Light

    n, width, height = 8, 64, 64
    mesh = make_mesh(n)
    light = Light.directional(direction=(0.3, 0.9, 0.2), intensity=5.0,
                              radius=0.05)
    sky = ProceduralSky.create(sun_direction=(0.3, 0.9, 0.2))
    cfg = RendererConfig(
        width=width, height=height,
        shadows=ShadowsConfig(atrous_iterations=2),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(probe_distance=4.0, rays_per_probe=32,
                        scale=RayTraceScale.HALF),
        taa=TAAConfig(enabled=True),
    )
    r = HybridRenderer(scene, cfg, sky.radiance, tracer_method="flash",
                       mesh=mesh)
    state = shard_frame_state(r.create_state(), mesh, height)
    cam = r.make_camera((4.0, 3.0, 6.0), (0.0, 0.5, 0.0), 0)
    out_tree = jax.eval_shape(r.render_frame, state, cam, light)
    step = jax.jit(r.render_frame, donate_argnums=(0,),
                   out_shardings=frame_shardings(out_tree, mesh, height))
    outputs, state = step(state, cam, light)
    ldr = np.asarray(outputs["ldr"])
    assert ldr.shape == (height, width, 3)
    assert np.isfinite(ldr).all()
    assert 0.05 < ldr.mean() < 0.99


def test_sharded_flash_surface_tracer(scene):
    surface = bvh_mod.make_surface_tracer(scene, method="flash")
    mesh = make_mesh(8)
    s_surface = shard_ray_fn(mesh, surface)

    o, d = _rand_rays(512, seed=7)
    hit_ref, surf_ref = surface(o, d, 100.0)
    hit_got, surf_got = s_surface(o, d, 100.0)
    np.testing.assert_array_equal(np.asarray(hit_got.tri_id),
                                  np.asarray(hit_ref.tri_id))
    np.testing.assert_allclose(np.asarray(surf_got.albedo),
                               np.asarray(surf_ref.albedo),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(surf_got.normal),
                               np.asarray(surf_ref.normal),
                               rtol=1e-4, atol=1e-4)
