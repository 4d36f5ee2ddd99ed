"""Hosek-Wilkie-form sky (ops/hosek.py) — fit quality + form properties."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops.hosek import HosekWilkieSky, chi
from hybrid_rendering_tpu.ops.sky import PreethamSky


def _dirs(n=2000, seed=3):
    rs = np.random.RandomState(seed)
    u = rs.uniform(size=(n, 2))
    ct = u[:, 0]
    phi = 2 * np.pi * u[:, 1]
    st = np.sqrt(1 - ct**2)
    return np.stack([st * np.cos(phi), ct, st * np.sin(phi)], -1).astype(
        np.float32)


def test_chi_normalization():
    # chi(0, a) = 1 + cos^2 a (isotropic limit)
    a = jnp.linspace(-1, 1, 11)
    np.testing.assert_allclose(np.asarray(chi(0.0, a)), 1 + np.asarray(a)**2,
                               rtol=1e-6)


def test_fit_approximates_target_field():
    """The fitted HW form tracks the target daylight field closely (the
    channels of Preetham's Y/x/y formulation are not exactly of HW form,
    so this is an approximation bound, not exact parity — the fit only
    seeds plausible daylight parameters; see ops/hosek.py docstring)."""
    sun = np.asarray([0.3, 0.8, 0.4])
    sky = HosekWilkieSky.create(sun, turbidity=2.5)
    target = PreethamSky.create(sun / np.linalg.norm(sun), turbidity=2.5)
    d = _dirs()
    got = np.asarray(sky.radiance(jnp.asarray(d)))
    want = np.asarray(target.radiance(jnp.asarray(d)))
    rel = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert np.median(rel) < 0.12
    assert np.mean(rel) < 0.15


def test_brighter_toward_sun_and_horizon_gradient():
    sun = np.asarray([0.0, 0.7, 0.7])
    sky = HosekWilkieSky.create(sun, turbidity=3.0)
    near_sun = np.asarray(sky.radiance(
        jnp.asarray([sun / np.linalg.norm(sun)], jnp.float32)))
    away = np.asarray(sky.radiance(
        jnp.asarray([[0.0, 0.7, -0.7]], jnp.float32) / np.sqrt(0.98)))
    assert near_sun.mean() > away.mean() * 1.5
    # finite + positive everywhere incl. below horizon
    d = _dirs()
    d[:, 1] = -np.abs(d[:, 1])
    below = np.asarray(sky.radiance(jnp.asarray(d)))
    assert np.all(np.isfinite(below)) and np.all(below >= 0)


@pytest.mark.slow
def test_renderer_integration():
    """HW sky drops in as sky_radiance_fn for the full pipeline."""
    from hybrid_rendering_tpu.config import DDGIConfig, RendererConfig
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.scene.scenes import load_scene

    scene, light, camkw = load_scene("shadows_test")
    sky = HosekWilkieSky.create(np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance, num_samples=512)
    cfg = RendererConfig(width=64, height=64, ddgi=DDGIConfig(enabled=False))
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    state = r.create_state()
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)
    outputs, _ = r.render_frame(state, cam, light)
    ldr = np.asarray(outputs["ldr"])
    assert np.all(np.isfinite(ldr)) and ldr.max() > 0.05
