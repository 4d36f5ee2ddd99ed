"""HDR environment stack: RGBE codec, SH projection, env loading
(reference: common.cpp:597-625 HDR equirect -> cubemap/SH/prefilter)."""
import numpy as np
import pytest

from hybrid_rendering_tpu.utils import image as img_utils


def test_hdr_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = (rs.uniform(0.0, 1.0, (32, 64, 3)) ** 2 * 50.0).astype(np.float32)
    img[4, 7] = [900.0, 0.01, 3.0]  # extreme dynamic range texel
    path = str(tmp_path / "t.hdr")
    img_utils.write_hdr(path, img)
    back = img_utils.read_hdr(path)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: error <= 2^-8 of the max
    maxc = img.max(axis=2, keepdims=True)
    err = np.abs(back - img)
    assert np.all(err <= maxc / 256.0 + 1e-6)


def test_hdr_rle_decode():
    """New-style RLE scanlines (what stb_image-written files use)."""
    h, w = 2, 16
    img = np.zeros((h, w, 3), np.float32)
    img[0, :] = [1.0, 0.5, 0.25]  # constant row -> runs
    img[1, :, 0] = np.arange(w) / w + 0.5  # varying row -> literals

    # encode manually with new-style RLE
    maxc = img.max(axis=2)
    m, e = np.frexp(np.maximum(maxc, 1e-32))
    scale = m * 256.0 / np.maximum(maxc, 1e-32)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = (e + 128).astype(np.uint8)

    payload = b""
    for y in range(h):
        payload += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            col = rgbe[y, :, c]
            if np.all(col == col[0]):  # one run
                payload += bytes([128 + w, int(col[0])])
            else:  # one literal block
                payload += bytes([w]) + col.tobytes()
    data = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode() + payload)
    back = img_utils.read_hdr(data)
    maxc3 = img.max(axis=2, keepdims=True)
    assert np.all(np.abs(back - img) <= maxc3 / 256.0 + 1e-6)


def test_equirect_sh_projection_constant():
    """A constant map must project to SH with irradiance == the constant."""
    from hybrid_rendering_tpu.ops.sh import (
        eval_irradiance_sh9, project_equirect_sh9,
    )

    img = np.full((64, 128, 3), 2.0, np.float32)
    coeffs = project_equirect_sh9(img)
    # DC coefficient = 2.0 * integral(Y00) = 2 * 0.282095 * 4pi
    assert abs(float(coeffs[0, 0]) - 2.0 * 0.282095 * 4 * np.pi) < 0.02
    n = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    irr = np.asarray(eval_irradiance_sh9(coeffs, n))
    np.testing.assert_allclose(irr, 2.0, rtol=0.02)


def test_equirect_sh_matches_mc_on_gradient():
    """Exact texel-sum projection vs the Monte-Carlo projector on a
    y-gradient environment."""
    import jax.numpy as jnp

    from hybrid_rendering_tpu.ops.sh import (
        project_equirect_sh9, project_sky_sh9,
    )

    def grad_env(d):
        y = jnp.clip(d[..., 1], -1.0, 1.0)
        return jnp.stack([1.0 + y, 1.0 - y, jnp.ones_like(y)], -1)

    from hybrid_rendering_tpu.scene.environments import _dirs_equirect

    d = _dirs_equirect(128, 256)
    img = np.asarray(grad_env(jnp.asarray(d.reshape(-1, 3)))).reshape(
        128, 256, 3)
    exact = np.asarray(project_equirect_sh9(img))
    mc = np.asarray(project_sky_sh9(grad_env, num_samples=200_000))
    np.testing.assert_allclose(exact, mc, atol=0.05)


def test_named_environments_load(tmp_path):
    from hybrid_rendering_tpu.scene.environments import (
        _SYNTH, environment_hdr_path, load_environment,
    )

    for name in _SYNTH:
        path = environment_hdr_path(name, cache_dir=str(tmp_path))
        env = load_environment(path)
        assert len(env.levels) == 5
        rad = np.asarray(env.radiance(
            np.array([[0.0, 1.0, 0.0], [0.3, -0.8, 0.5]], np.float32)))
        assert rad.shape == (2, 3)
        assert np.all(np.isfinite(rad)) and rad.max() > 0


@pytest.mark.slow
def test_renderer_with_file_environment(tmp_path):
    """Full hybrid frame lit by a loaded .hdr environment (the reference's
    non-procedural environment modes, main.cpp:292-308)."""
    import dataclasses

    from hybrid_rendering_tpu.config import (
        DDGIConfig, ReflectionsConfig, RendererConfig,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_image_env_fallbacks
    from hybrid_rendering_tpu.scene.environments import (
        environment_hdr_path, load_environment,
    )
    from hybrid_rendering_tpu.scene.scenes import load_scene

    scene, light, camkw = load_scene("shadows_test")
    env = load_environment(
        environment_hdr_path("arches", cache_dir=str(tmp_path)),
        num_levels=3)
    irr_fn, pref_fn = make_image_env_fallbacks(env)
    cfg = RendererConfig(
        width=64, height=64,
        reflections=ReflectionsConfig(enabled=False),
        ddgi=DDGIConfig(enabled=False),
    )
    r = HybridRenderer(scene, cfg, env.radiance, irr_fn, pref_fn)
    state = r.create_state()
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)
    outputs, state = r.render_frame(state, cam, light)
    ldr = np.asarray(outputs["ldr"])
    assert ldr.shape == (64, 64, 3)
    assert np.all(np.isfinite(ldr)) and ldr.max() > 0.05


def test_image_env_fallbacks_shapes(tmp_path):
    from hybrid_rendering_tpu.ops.sh import make_image_env_fallbacks
    from hybrid_rendering_tpu.scene.environments import (
        environment_hdr_path, load_environment,
    )

    env = load_environment(
        environment_hdr_path("overcast", cache_dir=str(tmp_path)))
    irr_fn, pref_fn = make_image_env_fallbacks(env)
    n = np.random.RandomState(0).normal(size=(5, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    irr = np.asarray(irr_fn(n))
    pref = np.asarray(pref_fn(n, np.full((5,), 0.4, np.float32)))
    assert irr.shape == (5, 3) and pref.shape == (5, 3)
    assert np.all(np.isfinite(irr)) and np.all(irr >= 0)
    # overcast is top-weighted: up-facing irradiance must exceed down-facing
    up = np.asarray(irr_fn(np.array([[0.0, 1.0, 0.0]], np.float32)))
    dn = np.asarray(irr_fn(np.array([[0.0, -1.0, 0.0]], np.float32)))
    assert up[0].mean() > dn[0].mean()
