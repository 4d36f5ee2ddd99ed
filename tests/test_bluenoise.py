"""Blue-noise sampler tests: distribution + spectral properties."""
import numpy as np
import jax.numpy as jnp

from hybrid_rendering_tpu.ops import bluenoise


def test_mask_exists_and_uniform():
    mask = bluenoise.get_mask()
    assert mask is not None, "blue_noise_128.npy missing"
    m = np.asarray(mask)
    assert m.shape == (128, 128, 2)
    # rank masks are exactly uniform
    for c in range(2):
        v = np.sort(m[..., c].ravel())
        assert abs(v.mean() - 0.5) < 1e-3
        assert v[0] >= 0.0 and v[-1] <= 1.0


def test_blue_spectrum():
    """Blue noise has suppressed low-frequency energy vs white noise."""
    m = np.asarray(bluenoise.get_mask())[..., 0] - 0.5
    f = np.abs(np.fft.fftshift(np.fft.fft2(m)))
    n = m.shape[0]
    c = n // 2
    yy, xx = np.meshgrid(np.arange(n) - c, np.arange(n) - c, indexing="ij")
    r = np.sqrt(xx**2 + yy**2)
    low = f[(r > 0) & (r < n * 0.08)].mean()
    high = f[(r > n * 0.25) & (r < n * 0.45)].mean()
    assert low < 0.5 * high, f"low {low} vs high {high}"


def test_sample2d_decorrelates_frames():
    xx = jnp.arange(64, dtype=jnp.int32)
    yy = jnp.zeros(64, jnp.int32)
    u0, _ = bluenoise.sample2d(xx, yy, 0, dim=0)
    u1, _ = bluenoise.sample2d(xx, yy, 1, dim=0)
    assert not np.allclose(np.asarray(u0), np.asarray(u1))
    assert np.asarray(u0).min() >= 0.0 and np.asarray(u0).max() < 1.0
