"""Environment stack tests: equirect maps, SH projection, BRDF LUT, sky."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import sh as sh_mod
from hybrid_rendering_tpu.ops.envmap import EquirectEnvironment, checkerboard_env
from hybrid_rendering_tpu.ops.sky import ConstantSky, PreethamSky


class TestEquirect:
    def test_constant_map_samples_constant(self):
        img = np.full((32, 64, 3), 0.7, np.float32)
        env = EquirectEnvironment.from_image(img)
        rs = np.random.RandomState(0)
        d = rs.normal(size=(100, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        out = np.asarray(env.radiance(jnp.asarray(d)))
        np.testing.assert_allclose(out, 0.7, atol=1e-4)

    def test_directional_lookup(self):
        """A map bright only at the +Y pole reads bright looking up."""
        img = np.zeros((64, 128, 3), np.float32)
        img[:4, :, :] = 10.0  # top rows = +Y pole
        env = EquirectEnvironment.from_image(img)
        up = jnp.asarray([[0.0, 1.0, 0.0]])
        down = jnp.asarray([[0.0, -1.0, 0.0]])
        assert float(env.radiance(up).mean()) > 5.0
        assert float(env.radiance(down).mean()) < 0.1

    def test_prefilter_blurs(self):
        env = EquirectEnvironment.from_image(checkerboard_env())
        d = jnp.asarray([[0.3, 0.2, 0.9]])
        d = d / jnp.linalg.norm(d)
        sharp = np.asarray(env.prefiltered(d, jnp.asarray([0.0])))
        rough = np.asarray(env.prefiltered(d, jnp.asarray([1.0])))
        # fully rough = heavily averaged -> between checker extremes
        assert 0.2 < rough[0, 0] < 3.8
        assert np.isfinite(sharp).all()


class TestSH:
    def test_constant_env_irradiance(self):
        sky = ConstantSky(color=jnp.asarray([1.0, 0.5, 0.25]))
        irr_fn, pref_fn = sh_mod.make_env_fallbacks(sky.radiance, 2048)
        n = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        e = np.asarray(irr_fn(n))
        # E/pi for constant radiance L is exactly L
        np.testing.assert_allclose(e[0], [1.0, 0.5, 0.25], rtol=0.08)
        np.testing.assert_allclose(e[0], e[1], rtol=0.05)  # isotropic

    def test_brdf_lut_properties(self):
        lut = np.asarray(sh_mod.brdf_integrate_lut(16, 64))
        assert lut.shape == (16, 16, 2)
        assert np.isfinite(lut).all()
        assert (lut >= -1e-3).all() and (lut[..., 0] <= 1.5).all()
        # smooth surfaces at normal incidence: scale ~1, bias ~0
        assert lut[-1, 0, 0] > 0.8
        assert lut[-1, 0, 1] < 0.15


class TestPreetham:
    def test_sky_physical_shape(self):
        sky = PreethamSky.create((0.0, 0.8, 0.4))
        up = jnp.asarray([[0.0, 1.0, 0.0]])
        horizon = jnp.asarray([[1.0, 0.02, 0.0]])
        r_up = np.asarray(sky.radiance(up))
        r_h = np.asarray(sky.radiance(horizon))
        assert np.isfinite(r_up).all() and (r_up >= 0).all()
        # clear sky: horizon brighter than zenith in luminance
        assert r_h.mean() > r_up.mean() * 0.8
        # sky should be blue-ish away from the sun
        side = jnp.asarray([[-0.7, 0.5, -0.5]])
        r_s = np.asarray(sky.radiance(side / jnp.linalg.norm(side)))
        assert r_s[0, 2] > r_s[0, 0] * 0.9
