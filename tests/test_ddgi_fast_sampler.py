"""Pallas DDGI sampler (interpret mode) vs the XLA reference sampler."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.config import DDGIConfig
from hybrid_rendering_tpu.models import ddgi as ddgi_mod
from hybrid_rendering_tpu.ops.pallas.ddgi_sample import make_fast_sampler


def _setup(seed=0, visibility=True):
    cfg = DDGIConfig(probe_distance=2.0, visibility_test=visibility)
    grid = ddgi_mod.make_probe_grid([-3, 0, -3], [3, 4, 3], cfg)
    rs = np.random.RandomState(seed)
    P = grid.num_probes
    state = ddgi_mod.DDGIState.create(P, cfg)
    state = state.replace(
        irradiance=jnp.asarray(
            rs.uniform(0.0, 1.0, size=state.irradiance.shape), jnp.float32
        ),
        depth=jnp.asarray(
            np.stack(
                [
                    rs.uniform(0.5, 3.0, size=state.depth.shape[:-1]),
                    rs.uniform(1.0, 9.0, size=state.depth.shape[:-1]),
                ],
                -1,
            ),
            jnp.float32,
        ),
        first_frame=jnp.int32(0),
    )
    return cfg, grid, state


@pytest.mark.parametrize("visibility", [False, True])
def test_fast_matches_reference_coherent_points(visibility):
    """Coherent point tiles (same probe cell): fast kernel must match the
    reference sampler closely."""
    cfg, grid, state = _setup(visibility=visibility)
    rs = np.random.RandomState(1)
    # 256 points inside one probe cell (plus jitter into neighbors)
    center = np.asarray([0.3, 1.2, -0.4])
    p = (center + rs.uniform(-0.9, 0.9, size=(256, 3))).astype(np.float32)
    n = rs.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    wo = rs.normal(size=(256, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)

    ref = np.asarray(
        ddgi_mod.sample_irradiance(
            grid, state, cfg, jnp.asarray(p), jnp.asarray(n), jnp.asarray(wo)
        )
    )
    fast_fn = make_fast_sampler(grid, cfg, interpret=True)
    fast = np.asarray(fast_fn(state, jnp.asarray(p), jnp.asarray(n),
                              jnp.asarray(wo)))
    assert np.isfinite(fast).all()
    # the kernel blends bilinearly in sqrt space (vs sqrt-of-bilinear) and
    # uses a half-res depth atlas — exact on smooth atlases, approximate on
    # this worst-case white-noise atlas
    err = np.abs(fast - ref) / (np.abs(ref) + 1e-3)
    assert np.median(err) < 0.15
    assert (err < 0.5).mean() > 0.95


def test_fast_matches_reference_smooth_atlas():
    """On a smooth (realistic) atlas the approximations vanish."""
    cfg, grid, state = _setup(visibility=False)
    # smooth atlas: constant per probe + gentle texel gradient
    P = grid.num_probes
    S = state.irradiance.shape[1]
    rs = np.random.RandomState(5)
    base = rs.uniform(0.2, 0.8, size=(P, 1, 1, 3))
    grad = np.linspace(0, 0.05, S)[None, :, None, None]
    smooth = np.broadcast_to(base + grad, (P, S, S, 3))
    state = state.replace(irradiance=jnp.asarray(smooth, jnp.float32))
    rs2 = np.random.RandomState(6)
    p = (np.asarray([0.3, 1.2, -0.4]) +
         rs2.uniform(-0.9, 0.9, size=(256, 3))).astype(np.float32)
    n = rs2.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    ref = np.asarray(ddgi_mod.sample_irradiance(
        grid, state, cfg, jnp.asarray(p), jnp.asarray(n), jnp.asarray(n)))
    fast_fn = make_fast_sampler(grid, cfg, interpret=True)
    fast = np.asarray(fast_fn(state, jnp.asarray(p), jnp.asarray(n),
                              jnp.asarray(n)))
    err = np.abs(fast - ref) / (np.abs(ref) + 1e-3)
    assert np.median(err) < 5e-3
    assert (err < 0.05).mean() > 0.97


@pytest.mark.slow
def test_full_frame_rmse_gi_test():
    """Full-frame fast-vs-XLA bound at gi_test probe counts with REAL
    atlases (one ddgi_update on the gi_test scene) and a real G-buffer —
    window clamp + half-res depth + sqrt-space bilinear all included.
    Gate: relative RMSE <= 1% (VERDICT r1 weak #5)."""
    import jax

    from hybrid_rendering_tpu.config import DDGIConfig, RendererConfig
    from hybrid_rendering_tpu.models import gbuffer as gbuffer_mod
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils import camera as cam_utils
    from hybrid_rendering_tpu.utils.image import relative_rmse

    base = RendererConfig(width=160, height=128)
    scene, light, camkw, cfg_all, _ = apply_preset("gi_test", base)
    cfg = cfg_all.ddgi
    grid = ddgi_mod.make_probe_grid(*scene.aabb(), cfg)

    closest_surface = bvh_mod.make_surface_tracer(scene)
    _, vis = bvh_mod.make_tracers(scene)
    sky = PreethamSky.create(np.asarray(light.direction))
    state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
    state = ddgi_mod.ddgi_update(
        scene, closest_surface, vis, grid, state, light, sky.radiance,
        jnp.int32(0), cfg)

    cam = cam_utils.make_camera(width=160, height=128, **camkw)
    gb = gbuffer_mod.render_gbuffer(scene, closest_surface, cam, 160, 128)

    ref = np.asarray(ddgi_mod.sample_irradiance(
        grid, state, cfg, gb.position, gb.normal, gb.normal))
    fast_fn = make_fast_sampler(grid, cfg, interpret=True)
    fast = np.asarray(fast_fn(state, gb.position, gb.normal, gb.normal,
                              valid=gb.mesh_id >= 0))

    valid = np.asarray(gb.mesh_id) >= 0
    rel = relative_rmse(fast[valid], ref[valid])
    assert rel <= 0.01, f"fast sampler deviates {rel:.4f} rel RMSE (>1%)"


def test_fast_image_shaped_input():
    cfg, grid, state = _setup(visibility=False)
    rs = np.random.RandomState(2)
    H = W = 16
    p = jnp.asarray(rs.uniform(-2, 2, size=(H, W, 3)), jnp.float32)
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (H, W, 3))
    fast_fn = make_fast_sampler(grid, cfg, interpret=True)
    out = fast_fn(state, p, n, n)
    assert out.shape == (H, W, 3)
    assert np.isfinite(np.asarray(out)).all()
