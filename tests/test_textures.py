"""Texture atlas tests."""
import numpy as np
import jax.numpy as jnp

from hybrid_rendering_tpu.scene.build import MaterialDef, SceneBuilder
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.scene.textures import (
    AtlasBuilder, checkerboard, sample_atlas,
)


def test_atlas_pack_and_sample():
    b = AtlasBuilder()
    t0 = b.add(np.full((32, 32, 3), 0.25, np.float32))
    t1 = b.add(np.full((16, 48, 3), 0.75, np.float32))
    atlas = b.build()
    assert atlas.num_textures == 2
    uv = jnp.asarray([[0.5, 0.5], [0.1, 0.9]], jnp.float32)
    s0 = np.asarray(sample_atlas(atlas, jnp.asarray([0, 0]), uv))
    np.testing.assert_allclose(s0[:, :3], 0.25, atol=1e-5)
    s1 = np.asarray(sample_atlas(atlas, jnp.asarray([1, 1]), uv))
    np.testing.assert_allclose(s1[:, :3], 0.75, atol=1e-5)
    # no texture -> ones
    sn = np.asarray(sample_atlas(atlas, jnp.asarray([-1, -1]), uv))
    np.testing.assert_allclose(sn, 1.0)


def test_checker_uv_lookup():
    b = AtlasBuilder()
    tex = checkerboard(64, a=(1, 1, 1), b=(0, 0, 0), cells=2)  # 2x2 checker
    ti = b.add(tex)
    atlas = b.build()
    # centers of the four quadrants (v=0 top row of the image array)
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    s = np.asarray(sample_atlas(atlas, jnp.full(4, ti, jnp.int32), uv))[:, 0]
    assert abs(s[0] - s[3]) < 1e-5  # diagonal quadrants equal
    assert abs(s[1] - s[2]) < 1e-5
    assert abs(s[0] - s[1]) > 0.9  # adjacent quadrants differ


def test_textured_surface_fetch():
    from hybrid_rendering_tpu.ops import bvh as bvh_mod

    b = SceneBuilder()
    tex = b.add_texture(checkerboard(64, a=(1, 0, 0), b=(0, 0, 1), cells=2))
    m = b.add_material(MaterialDef(albedo=(1.0, 1.0, 1.0), albedo_tex=tex))
    b.add_instance(prim.plane(2.0, 2.0), m)
    scene = b.build(use_bvh=True)
    assert scene.atlas is not None
    closest_surface = bvh_mod.make_surface_tracer(scene)
    # rays straight down onto quadrants of the plane (uv 0..1 across)
    o = jnp.asarray([[-0.5, 1.0, -0.5], [0.5, 1.0, -0.5]], jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (2, 3))
    hit, surf = closest_surface(o, d, 10.0)
    assert bool(hit.valid.all())
    alb = np.asarray(surf.albedo)
    # one quadrant red-ish, the other blue-ish
    assert (abs(alb[0] - alb[1]).max() > 0.9)
    assert set(np.argmax(alb, axis=1)) == {0, 2}
