"""Fused Pallas à-trous chain vs the XLA reference (ops/filters.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import filters
from hybrid_rendering_tpu.ops.pallas.stencil import atrous_chain


def _inputs(H=96, W=128, seed=0):
    rs = np.random.RandomState(seed)
    color = rs.uniform(0, 1, (H, W)).astype(np.float32)
    var = rs.uniform(0, 0.1, (H, W)).astype(np.float32)
    n = rs.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # piecewise-flat normals so edge-stopping has real structure
    n[:, : W // 2] = [0, 1, 0]
    depth = rs.uniform(1, 10, (H, W)).astype(np.float32)
    depth[: H // 2] = 2.0
    mask = np.ones((H, W), bool)
    mask[:4, :4] = False
    return color, var, n, depth, mask


def _xla_chain(color, var, n, depth, mask, steps, feedback_iteration=1):
    c = jnp.asarray(color)
    v = jnp.asarray(var)
    fb = c
    for i, s in enumerate(steps):
        c, v = filters.atrous_iteration(
            c, v, jnp.asarray(n), jnp.asarray(depth), step=s,
            radius=1, phi_color=10.0, phi_normal=32.0, sigma_depth=1.0,
            mask=jnp.asarray(mask),
        )
        if i == feedback_iteration:
            fb = c
    return np.asarray(c), np.asarray(fb), np.asarray(v)


@pytest.mark.parametrize("steps", [(1, 2), (1, 2, 4, 8)])
@pytest.mark.slow
def test_matches_xla_chain(steps):
    color, var, n, depth, mask = _inputs()
    ref_c, ref_fb, ref_v = _xla_chain(color, var, n, depth, mask, steps)
    out, fb, v_out = atrous_chain(
        jnp.asarray(color), jnp.asarray(var), jnp.asarray(n),
        jnp.asarray(depth), jnp.asarray(mask), steps=steps,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref_c, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb), ref_fb, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_out), ref_v, atol=2e-5)


def test_mask_passthrough():
    color, var, n, depth, mask = _inputs(seed=3)
    out, _, v_out = atrous_chain(
        jnp.asarray(color), jnp.asarray(var), jnp.asarray(n),
        jnp.asarray(depth), jnp.asarray(mask), steps=(1, 2),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out)[:4, :4], color[:4, :4],
                               atol=1e-6)


@pytest.mark.parametrize("steps", [(1, 2, 4)])
@pytest.mark.slow
def test_matches_xla_chain_rgb(steps):
    H, W = 64, 128
    rs = np.random.RandomState(2)
    color = rs.uniform(0, 1, (H, W, 3)).astype(np.float32)
    var = rs.uniform(0, 0.1, (H, W)).astype(np.float32)
    n = np.zeros((H, W, 3), np.float32)
    n[..., 1] = 1.0
    n[:, W // 2:] = [1, 0, 0]
    depth = np.full((H, W), 3.0, np.float32)
    mask = np.ones((H, W), bool)

    c = jnp.asarray(color)
    v = jnp.asarray(var)
    fb_ref = c
    for i, s in enumerate(steps):
        c, v = filters.atrous_iteration(
            c, v, jnp.asarray(n), jnp.asarray(depth), step=s, radius=1,
            phi_color=10.0, phi_normal=32.0, sigma_depth=1.0,
            mask=jnp.asarray(mask))
        if i == 1:
            fb_ref = c

    out, fb, v_out = atrous_chain(
        jnp.asarray(color), jnp.asarray(var), jnp.asarray(n),
        jnp.asarray(depth), jnp.asarray(mask), steps=steps,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fb_ref),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v), atol=3e-5)


def test_bilateral_blur_matches_xla():
    from hybrid_rendering_tpu.ops.pallas.stencil import bilateral_blur

    H, W = 96, 128
    rs = np.random.RandomState(5)
    img = rs.uniform(0, 1, (H, W)).astype(np.float32)
    n = np.zeros((H, W, 3), np.float32)
    n[..., 1] = 1.0
    n[H // 2:] = [1, 0, 0]
    depth = np.full((H, W), 4.0, np.float32)
    depth[:, W // 2:] = 8.0
    mask = np.ones((H, W), bool)
    mask[:3, :3] = False

    ref = np.asarray(filters.bilateral_blur_separable(
        jnp.asarray(img), jnp.asarray(n), jnp.asarray(depth), radius=4,
        depth_phi=1.0, normal_power=32.0, mask=jnp.asarray(mask)))
    out = np.asarray(bilateral_blur(
        jnp.asarray(img), jnp.asarray(n), jnp.asarray(depth),
        jnp.asarray(mask), radius=4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)
