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


# --- ArHosek dataset machinery (exact reference parameter path) ---

from hybrid_rendering_tpu.ops.hosek import (  # noqa: E402
    arhosek_config_to_params, cook_configuration,
    cook_radiance_configuration, hw_radiance_channel, load_arhosek_header,
    quintic_bezier,
)


def test_quintic_bezier_endpoints_and_unity():
    rs = np.random.RandomState(0)
    ctrl = rs.uniform(size=(4, 6))
    np.testing.assert_allclose(quintic_bezier(ctrl, 0.0), ctrl[:, 0])
    np.testing.assert_allclose(quintic_bezier(ctrl, 1.0), ctrl[:, 5])
    # partition of unity: constant control points stay constant
    np.testing.assert_allclose(quintic_bezier(np.full((6,), 3.5), 0.37), 3.5)


def _synthetic_tables(seed=1):
    rs = np.random.RandomState(seed)
    ds = rs.uniform(0.1, 1.0, size=(2, 10, 6, 9))
    rad = rs.uniform(10.0, 100.0, size=(2, 10, 6))
    return ds, rad


def test_cook_configuration_grid_selection():
    ds, rad = _synthetic_tables()
    # integer turbidity + albedo 0 + zenith sun (x=1) picks ctrl point 5
    # of the turbidity-4 row exactly
    got = cook_configuration(ds, 4.0, 0.0, np.pi / 2)
    np.testing.assert_allclose(got, ds[0, 3, 5], rtol=1e-12)
    # albedo blends linearly
    a0 = cook_configuration(ds, 4.0, 0.0, 0.3)
    a1 = cook_configuration(ds, 4.0, 1.0, 0.3)
    mid = cook_configuration(ds, 4.0, 0.25, 0.3)
    np.testing.assert_allclose(mid, 0.75 * a0 + 0.25 * a1, rtol=1e-12)
    # turbidity blends linearly between integer rows
    t4 = cook_configuration(ds, 4.0, 0.3, 0.5)
    t5 = cook_configuration(ds, 5.0, 0.3, 0.5)
    t45 = cook_configuration(ds, 4.5, 0.3, 0.5)
    np.testing.assert_allclose(t45, 0.5 * t4 + 0.5 * t5, rtol=1e-12)
    # elevation enters through the published cube-root warp
    elev = 0.4
    x = (elev / (np.pi / 2)) ** (1 / 3)
    manual = quintic_bezier(np.moveaxis(ds[0, 3], 0, -1), x)
    np.testing.assert_allclose(
        cook_configuration(ds, 4.0, 0.0, elev), manual, rtol=1e-12)
    # radiance cook shares the same path
    np.testing.assert_allclose(
        cook_radiance_configuration(rad, 4.0, 0.0, np.pi / 2),
        rad[0, 3, 5], rtol=1e-12)


def test_config_fold_matches_arhosek_eval():
    """Folding the radiance scale into the linear lobe coefficients is
    exact: our hw_radiance_channel(params) == scale *
    ArHosekSkyModel_GetRadianceInternal(config)."""
    rs = np.random.RandomState(7)
    config = np.asarray(
        [-1.1, -0.2, 0.3, 0.6, -2.8, 0.1, 0.05, 0.4, 0.7])  # A..(I@7)(H@8)
    scale = 42.0
    params = arhosek_config_to_params(config, scale)
    ct = rs.uniform(0.05, 1.0, size=64)
    cg = rs.uniform(-1.0, 1.0, size=64)
    gamma = np.arccos(cg)
    # ArHosekSkyModel_GetRadianceInternal, transcribed
    expM = np.exp(config[4] * gamma)
    rayM = cg * cg
    mieM = (1 + cg * cg) / (1 + config[8] ** 2 - 2 * config[8] * cg) ** 1.5
    zenith = np.sqrt(ct)
    want = scale * (
        (1 + config[0] * np.exp(config[1] / (ct + 0.01)))
        * (config[2] + config[3] * expM + config[5] * rayM
           + config[6] * mieM + config[7] * zenith))
    got = np.asarray(hw_radiance_channel(
        jnp.asarray(ct), jnp.asarray(cg), jnp.asarray(gamma),
        jnp.asarray(params)))
    np.testing.assert_allclose(got, np.maximum(want, 0.0), rtol=1e-5)


def test_load_arhosek_header_roundtrip(tmp_path):
    ds, rad = _synthetic_tables(seed=2)
    dss, rads = np.stack([ds, ds * 2, ds * 3]), np.stack(
        [rad, rad * 2, rad * 3])
    lines = ["// fake ArHosekSkyModelData_RGB.h for the parser test"]
    for c, name in enumerate("RGB"):
        flat = dss[c].reshape(-1)
        lines.append(f"static const double dataset{name}[] = "
                     "{" + ",".join(f"{v:.17g}" for v in flat) + "};")
    for c, name in enumerate("RGB"):
        flat = rads[c].reshape(-1)
        lines.append(f"static const double dataset{name}Rad[] = "
                     "{" + ",".join(f"{v:.17g}" for v in flat) + "};")
    path = tmp_path / "ArHosekSkyModelData_RGB.h"
    path.write_text("\n".join(lines))
    got_ds, got_rad = load_arhosek_header(str(path))
    np.testing.assert_allclose(got_ds, dss, rtol=1e-12)
    np.testing.assert_allclose(got_rad, rads, rtol=1e-12)
    # layout contract: flat index albedo*540 + turb*54 + ctrl*9 + coeff
    assert got_ds[1, 1, 2, 3, 4] == dss[1].reshape(-1)[540 + 2 * 54
                                                       + 3 * 9 + 4]


def test_from_dataset_end_to_end():
    ds, rad = _synthetic_tables(seed=3)
    dss, rads = np.stack([ds] * 3), np.stack([rad] * 3)
    sun = np.asarray([0.2, 0.9, 0.1])
    sky = HosekWilkieSky.from_dataset(sun, (dss, rads), turbidity=4.0,
                                      exposure=0.01)
    d = _dirs(512)
    out = np.asarray(sky.radiance(jnp.asarray(d)))
    assert out.shape == (512, 3)
    assert np.all(np.isfinite(out)) and np.all(out >= 0) and out.max() > 0


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
