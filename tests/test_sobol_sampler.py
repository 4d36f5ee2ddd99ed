"""Sobol (0,2) + blue-noise scrambling sampler (bnd_sampler.glsl twin
with computed tables — the Heitz PNGs don't ship with the reference)."""
import numpy as np
import jax.numpy as jnp

from hybrid_rendering_tpu.ops import bluenoise as bn


def _frames(h, w, n, dim=0):
    us, vs = [], []
    for f in range(n):
        u, v = bn._sample2d_grid_sobol(h, w, jnp.uint32(f), dim)
        us.append(np.asarray(u))
        vs.append(np.asarray(v))
    return np.stack(us), np.stack(vs)  # (n, h, w)


def test_temporal_stratification_per_pixel():
    """XOR-ranking keeps aligned power-of-2 blocks: any pixel's first 32
    samples land exactly one per 1/32 bin (elementary intervals)."""
    us, vs = _frames(8, 8, 32)
    for y in range(0, 8, 3):
        for x in range(0, 8, 3):
            for s in (us, vs):
                bins = np.sort((s[:, y, x] * 32).astype(int))
                assert (bins == np.arange(32)).all(), (y, x, bins)


def test_spatially_decorrelated():
    us, vs = _frames(16, 16, 1)
    u = us[0]
    # neighbouring pixels must not share values (scramble separates them)
    assert np.abs(np.diff(u, axis=1)).min() > 1e-6
    # and the field should span [0,1) broadly
    assert u.min() < 0.05 and u.max() > 0.95


def test_dims_decorrelated():
    u0, _ = bn._sample2d_grid_sobol(16, 16, jnp.uint32(0), 0)
    u1, _ = bn._sample2d_grid_sobol(16, 16, jnp.uint32(0), 1)
    assert np.abs(np.asarray(u0) - np.asarray(u1)).mean() > 0.05


def test_mean_convergence_beats_r2():
    """Integrating a smooth function per pixel: the Sobol mode's 32-frame
    mean error should beat (or match) the R2-rotation mode."""
    h = w = 16
    n = 32

    def err(mode_fn):
        tot = np.zeros((h, w))
        for f in range(n):
            u, v = mode_fn(h, w, jnp.uint32(f))
            tot += np.asarray(u) ** 2 + np.asarray(v) ** 2  # E = 2/3
        return np.abs(tot / n - 2.0 / 3.0).mean()

    e_sobol = err(lambda hh, ww, f: bn._sample2d_grid_sobol(hh, ww, f, 0))

    def r2(hh, ww, f):
        old = bn.SAMPLER
        bn.SAMPLER = "bn_r2"
        try:
            return bn.sample2d_grid(hh, ww, f, 0)
        finally:
            bn.SAMPLER = old

    e_r2 = err(r2)
    assert e_sobol <= e_r2 * 1.05, (e_sobol, e_r2)
