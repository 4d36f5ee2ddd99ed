"""Dynamic scenes: per-frame instance refit, object motion vectors,
disocclusion (reference: per-frame TLAS rebuild main.cpp:74; per-draw
prev model matrices g_buffer.vert:71-84)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.scene import dynamic as dyn
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.scene.build import (
    MaterialDef, SceneBuilder, translation,
)
from hybrid_rendering_tpu.types import Light


def _scene():
    b = SceneBuilder()
    ground = b.add_material(MaterialDef(albedo=(0.7, 0.7, 0.7),
                                        roughness=0.9))
    red = b.add_material(MaterialDef(albedo=(0.8, 0.1, 0.1), roughness=0.5))
    gid = b.add_instance(prim.plane(20.0, 20.0), ground)
    bid = b.add_instance(prim.box(2.0, 2.0, 2.0), red,
                         translation(0.0, 1.0, 0.0))
    scene = b.build(use_bvh=False)
    return scene, gid, bid


def _transforms(frame, speed=0.5):
    """Ground static; box slides +x at `speed` units/frame."""
    t = jnp.asarray(frame, jnp.float32) * speed
    m_box = jnp.eye(4).at[0, 3].set(t)
    return jnp.stack([jnp.eye(4), m_box])


def test_refit_moves_only_the_instance():
    scene, gid, bid = _scene()
    moved = dyn.refit_scene(scene, _transforms(2))
    base = np.asarray(scene.tri_pos)
    new = np.asarray(moved.tri_pos)
    inst = np.asarray(scene.tri_mesh_id)
    np.testing.assert_allclose(new[inst == gid], base[inst == gid],
                               atol=1e-6)
    np.testing.assert_allclose(new[inst == bid][..., 0],
                               base[inst == bid][..., 0] + 1.0, atol=1e-5)
    np.testing.assert_allclose(new[inst == bid][..., 1:],
                               base[inst == bid][..., 1:], atol=1e-6)
    # normals unchanged under pure translation
    np.testing.assert_allclose(np.asarray(moved.tri_normal),
                               np.asarray(scene.tri_normal), atol=1e-6)


@pytest.mark.slow
def test_motion_vectors_and_disocclusion():
    """Animated box produces object motion vectors (static camera) and
    disocclusion in the vacated region (the reference's side-to-side
    motion stress, main.cpp:513-522)."""
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.reprojection import reproject
    from hybrid_rendering_tpu.utils import camera as cam_utils

    scene, gid, bid = _scene()
    W = H = 96
    cam0 = cam_utils.make_camera(eye=(0.0, 4.0, 12.0),
                                 target=(0.0, 1.0, 0.0), width=W, height=H)
    cam = cam_utils.make_camera(eye=(0.0, 4.0, 12.0),
                                target=(0.0, 1.0, 0.0), width=W, height=H,
                                prev_view_proj=np.asarray(cam0.view_proj))

    def gb_at(frame):
        sc = dyn.refit_scene(scene, _transforms(frame))
        fn = bvh_mod.make_surface_tracer(sc, method="brute")
        deltas = dyn.motion_deltas(_transforms(frame),
                                   _transforms(frame - 1))
        return render_gbuffer(sc, fn, cam, W, H, motion_deltas=deltas)

    gb0 = gb_at(0)
    gb1 = gb_at(1)

    box1 = np.asarray(gb1.mesh_id) == bid
    ground1 = np.asarray(gb1.mesh_id) == gid
    motion = np.asarray(gb1.motion)
    assert box1.sum() > 20
    # box moved +x by 0.5 world units: prev uv is to the LEFT -> motion.x<0
    assert np.all(motion[box1][:, 0] < -1.0 / W)
    # static ground: no motion
    assert np.abs(motion[ground1]).max() < 1e-4

    # disocclusion: ground pixels that were covered by the box in frame 0
    # must fail reprojection (mesh-id mismatch -> history reset)
    rep = reproject(gb1, gb0, np.zeros((H, W), np.float32))
    valid = np.asarray(rep.valid)
    vacated = ground1 & (np.asarray(gb0.mesh_id) == bid)
    assert vacated.sum() > 10
    assert valid[vacated].mean() < 0.1
    # ground far from the box reprojects fine
    far = ground1 & (np.asarray(gb0.mesh_id) == gid)
    far[:, W // 3:] = False  # left third only, well away from the box
    assert valid[far].mean() > 0.9


@pytest.mark.slow
def test_renderer_with_animator_runs():
    """Full pipeline with an animator: refit + tracer rebuild traced into
    the frame; output stays finite over several frames."""
    from hybrid_rendering_tpu.config import (
        DDGIConfig, ReflectionsConfig, RendererConfig,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ConstantSky

    scene, gid, bid = _scene()
    sky = ConstantSky(color=jnp.asarray([0.4, 0.5, 0.7]))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance, num_samples=256)
    cfg = RendererConfig(
        width=64, height=64,
        reflections=ReflectionsConfig(enabled=False),
        ddgi=DDGIConfig(enabled=False),
    )
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn,
                       animator=_transforms)
    light = Light.directional((0.3, 0.9, 0.2), intensity=3.0)
    state = r.create_state()
    cam = r.make_camera((0.0, 4.0, 12.0), (0.0, 1.0, 0.0), 0)
    step = jax.jit(r.render_frame, donate_argnums=(0,))
    for _ in range(3):
        outputs, state = step(state, cam, light)
    ldr = np.asarray(outputs["ldr"])
    assert np.isfinite(ldr).all() and ldr.max() > 0.05
