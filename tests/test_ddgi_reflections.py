"""Config 3-4 tests: reflections pass + DDGI probe grid."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.config import (
    AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig, ShadowsConfig,
    TAAConfig, RayTraceScale,
)
from hybrid_rendering_tpu.models import ddgi as ddgi_mod
from hybrid_rendering_tpu.models.renderer import HybridRenderer
from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.ops.sky import ConstantSky
from hybrid_rendering_tpu.scene.build import MaterialDef, SceneBuilder, translation
from hybrid_rendering_tpu.scene import primitives as prim
from hybrid_rendering_tpu.types import Light


def _small_scene():
    b = SceneBuilder()
    white = b.add_material(MaterialDef(albedo=(0.8, 0.8, 0.8), roughness=0.9))
    mirror = b.add_material(MaterialDef(albedo=(0.95, 0.95, 0.95), roughness=0.01, metallic=1.0))
    red = b.add_material(MaterialDef(albedo=(0.9, 0.1, 0.1), roughness=0.6))
    b.add_instance(prim.plane(12.0, 12.0), mirror)  # mirror floor
    b.add_instance(prim.box(2.0, 2.0, 2.0), red, translation(0, 1.0, -2.0))
    b.add_instance(prim.box(12.0, 4.0, 0.3), white, translation(0, 2.0, -5.0))
    return b.build(use_bvh=True)


class TestDDGICore:
    def test_probe_grid_sizing(self):
        cfg = DDGIConfig(probe_distance=2.0)
        grid = ddgi_mod.make_probe_grid([-4, 0, -4], [4, 4, 4], cfg)
        # ceil(extent/dist) + 2 per axis (ddgi.cpp:150-169)
        assert grid.counts == (6, 4, 6)
        assert grid.num_probes == 144
        pos = np.asarray(ddgi_mod.probe_positions(grid))
        assert pos.shape == (144, 3)
        np.testing.assert_allclose(pos[0], [-4, 0, -4])
        # x-major layout (gi_common grid_coord_to_probe_index)
        np.testing.assert_allclose(pos[1], [-2, 0, -4])

    def test_oct_bilinear_roundtrip(self):
        """A constant atlas samples back to the constant; a direction-coded
        atlas samples approximately the texel direction."""
        cfg = DDGIConfig()
        S = 8
        atlas = jnp.ones((2, S, S, 3)) * jnp.asarray([0.25, 0.5, 0.75])
        rs = np.random.RandomState(0)
        dirs = rs.normal(size=(100, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        out = ddgi_mod.oct_bilinear_sample(
            atlas, jnp.zeros(100, jnp.int32), jnp.asarray(dirs)
        )
        np.testing.assert_allclose(
            np.asarray(out), np.tile([0.25, 0.5, 0.75], (100, 1)), atol=1e-5
        )

    def test_update_converges_to_constant_env(self):
        """Probes in an empty scene lit by a constant sky must converge to
        that constant radiance in the irradiance atlas."""
        b = SceneBuilder()
        m = b.add_material(MaterialDef())
        # one tiny far-away triangle so the scene isn't empty
        b.add_instance(prim.plane(0.01, 0.01), m, translation(500, -500, 500))
        scene = b.build(use_bvh=True)
        closest, vis = (bvh_mod.make_surface_tracer(scene),
                    bvh_mod.make_tracers(scene)[1])
        cfg = DDGIConfig(
            probe_distance=2.0, rays_per_probe=64, infinite_bounces=False,
            visibility_test=False,
        )
        grid = ddgi_mod.make_probe_grid([0, 0, 0], [2, 2, 2], cfg)
        state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
        sky = ConstantSky(color=jnp.asarray([0.5, 0.5, 0.5]))
        light = Light.directional(direction=(0, 1, 0), intensity=0.0)
        for i in range(3):
            state = ddgi_mod.ddgi_update(
                scene, closest, vis, grid, state, light, sky.radiance, i, cfg
            )
        irr = np.asarray(state.irradiance)
        # energy-calibrated update: texels converge to the cosine-weighted
        # mean radiance (0.5 for this half-bright env), no 0.95 haircut
        assert abs(irr.mean() - 0.5) < 0.05
        assert irr.std() < 0.02

        # sampled irradiance at the grid center: energy-calibrated to
        # texel x energy_preservation (E/pi chain; see sample_irradiance)
        p = jnp.asarray([[1.0, 1.0, 1.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        out = np.asarray(
            ddgi_mod.sample_irradiance(grid, state, cfg, p, n, n)
        )
        expected = 0.5 * cfg.energy_preservation
        assert abs(out.mean() - expected) < 0.15 * expected

    def test_depth_atlas_chebyshev(self):
        """Probes near a wall record shorter mean distances toward it."""
        b = SceneBuilder()
        m = b.add_material(MaterialDef())
        b.add_instance(prim.box(10.0, 10.0, 0.5), m, translation(0, 0, -1.0))
        scene = b.build(use_bvh=True)
        closest, vis = (bvh_mod.make_surface_tracer(scene),
                    bvh_mod.make_tracers(scene)[1])
        cfg = DDGIConfig(
            probe_distance=2.0, rays_per_probe=128, infinite_bounces=False
        )
        grid = ddgi_mod.make_probe_grid([-1, -1, 0], [1, 1, 2], cfg)
        state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
        sky = ConstantSky(color=jnp.zeros(3))
        light = Light.directional(direction=(0, 1, 0), intensity=0.0)
        state = ddgi_mod.ddgi_update(
            scene, closest, vis, grid, state, light, sky.radiance, 0, cfg
        )
        dep = np.asarray(state.depth)  # (P, D, D, 2)
        assert np.isfinite(dep).all()
        assert dep[..., 0].min() < grid.max_distance - 1e-3  # wall seen
        # mean^2 >= mean**2 is not generally true, but second moment must
        # be positive wherever mean is
        assert (dep[..., 1] >= 0).all()


class TestReflections:
    @pytest.mark.slow
    def test_mirror_floor_reflects_red_box(self):
        scene = _small_scene()
        sky = ConstantSky(color=jnp.asarray([0.1, 0.1, 0.12]))
        light = Light.directional(direction=(0.2, 0.9, 0.3), intensity=3.0)
        cfg = RendererConfig(
            width=64, height=64, debug_outputs=True,
            shadows=ShadowsConfig(atrous_iterations=1),
            ao=AOConfig(enabled=False),
            reflections=ReflectionsConfig(
                scale=RayTraceScale.FULL, atrous_iterations=1,
                approximate_with_ddgi=False, sample_gi=False,
            ),
            ddgi=DDGIConfig(enabled=False),
            taa=TAAConfig(enabled=False),
        )
        r = HybridRenderer(scene, cfg, sky.radiance)
        state = r.create_state()
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        cam = r.make_camera((0.0, 2.0, 5.0), (0.0, 0.5, -2.0))
        outputs, state = step(state, cam, light)
        refl = np.asarray(outputs["reflections"])
        assert np.isfinite(refl).all()
        # the mirror floor must reflect the red box: red-dominant pixels
        red_pixels = (refl[..., 0] > refl[..., 1] * 1.5) & (refl[..., 0] > 0.02)
        assert red_pixels.sum() > 5

    @pytest.mark.slow
    def test_full_pipeline_with_ddgi(self):
        scene = _small_scene()
        sky = ConstantSky(color=jnp.asarray([0.2, 0.25, 0.3]))
        light = Light.directional(direction=(0.2, 0.9, 0.3), intensity=3.0)
        cfg = RendererConfig(
            width=32, height=32, debug_outputs=True,
            shadows=ShadowsConfig(atrous_iterations=1),
            ao=AOConfig(scale=RayTraceScale.HALF, blur_radius=2),
            reflections=ReflectionsConfig(
                scale=RayTraceScale.HALF, atrous_iterations=1
            ),
            ddgi=DDGIConfig(
                probe_distance=4.0, rays_per_probe=32,
                scale=RayTraceScale.HALF,
            ),
            taa=TAAConfig(enabled=True),
        )
        r = HybridRenderer(scene, cfg, sky.radiance)
        state = r.create_state()
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        for i in range(2):
            cam = r.make_camera((0.0, 2.0, 5.0), (0.0, 0.5, -2.0), i)
            outputs, state = step(state, cam, light)
        for key in ("ldr", "ddgi", "reflections", "shadows", "ao"):
            assert np.isfinite(np.asarray(outputs[key])).all(), key
        ldr = np.asarray(outputs["ldr"])
        assert ldr.mean() > 0.01
        gi = np.asarray(outputs["ddgi"])
        assert gi.max() > 0.0  # some indirect light present


def test_coherent_probe_packets_match_naive_layout(monkeypatch):
    """The (probe tile x direction cone) packet reorder must produce the
    same probe atlases as the naive probe-major layout — it only changes
    ray ORDER (plus duplicate padded probes whose results are dropped).
    Einsum accumulation order differs, so compare with a float tolerance."""
    scene = _small_scene()
    closest = bvh_mod.make_surface_tracer(scene)
    vis = bvh_mod.make_tracers(scene)[1]
    cfg = DDGIConfig(probe_distance=2.0, rays_per_probe=32,
                     infinite_bounces=False)
    grid = ddgi_mod.make_probe_grid([-3, 0, -3], [3, 3, 3], cfg)
    sky = ConstantSky(color=jnp.asarray([0.4, 0.5, 0.6]))
    light = Light.directional(direction=(0.3, 0.9, 0.2), intensity=4.0)

    states = {}
    for coherent in (False, True):
        monkeypatch.setattr(ddgi_mod, "COHERENT_RAYS", coherent)
        state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
        for i in range(2):
            state = ddgi_mod.ddgi_update(
                scene, closest, vis, grid, state, light, sky.radiance, i, cfg
            )
        states[coherent] = state

    np.testing.assert_allclose(
        np.asarray(states[True].irradiance),
        np.asarray(states[False].irradiance), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(states[True].depth),
        np.asarray(states[False].depth), rtol=2e-4, atol=2e-3)


def test_probe_radiance_clamp_matches_gt_oracle():
    """Per-ray probe radiance clips at probe_radiance_clamp (the GT
    oracle's RADIANCE_CLAMP_COLOR, ground_truth_path_trace.rgen:93-95):
    a sky of radiance 3.0 converges to 1.0 with the default clamp and to
    3.0 with the clamp disabled."""
    import dataclasses

    b = SceneBuilder()
    m = b.add_material(MaterialDef())
    b.add_instance(prim.plane(0.01, 0.01), m, translation(500, -500, 500))
    scene = b.build(use_bvh=True)
    closest = bvh_mod.make_surface_tracer(scene)
    vis = bvh_mod.make_tracers(scene)[1]
    sky = ConstantSky(color=jnp.asarray([3.0, 3.0, 3.0]))
    light = Light.directional(direction=(0, 1, 0), intensity=0.0)
    for clamp, expect in ((1.0, 1.0), (0.0, 3.0)):
        cfg = DDGIConfig(
            probe_distance=2.0, rays_per_probe=64, infinite_bounces=False,
            visibility_test=False, probe_radiance_clamp=clamp,
        )
        grid = ddgi_mod.make_probe_grid([0, 0, 0], [2, 2, 2], cfg)
        state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
        for i in range(3):
            state = ddgi_mod.ddgi_update(
                scene, closest, vis, grid, state, light, sky.radiance, i, cfg
            )
        irr = np.asarray(state.irradiance)
        assert abs(irr.mean() - expect) < 0.1 * max(expect, 1.0), (clamp, irr.mean())
