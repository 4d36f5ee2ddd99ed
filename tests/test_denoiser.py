"""Denoiser-core unit tests: filters, reprojection, TAA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybrid_rendering_tpu.ops import filters
from hybrid_rendering_tpu.ops.reprojection import reproject
from hybrid_rendering_tpu.types import GBuffer


def _flat_gbuffer(H, W, mesh_id=0, z=5.0):
    """Synthetic G-buffer: a fronto-parallel plane."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xx * 0.01, yy * 0.01, np.full((H, W), -z)], -1)
    return GBuffer(
        albedo=jnp.full((H, W, 3), 0.5),
        metallic=jnp.zeros((H, W)),
        normal=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3)),
        motion=jnp.zeros((H, W, 2)),
        roughness=jnp.full((H, W), 0.5),
        curvature=jnp.zeros((H, W)),
        mesh_id=jnp.full((H, W), mesh_id, jnp.int32),
        linear_z=jnp.full((H, W), z),
        depth=jnp.full((H, W), 0.5),
        position=jnp.asarray(pos, jnp.float32),
    )


class TestFilters:
    def test_box_filter_matches_numpy(self):
        rs = np.random.RandomState(0)
        img = rs.normal(size=(24, 32)).astype(np.float32)
        r = 2
        got = np.asarray(filters.box_filter_sum(jnp.asarray(img), r))
        # numpy reference with edge-clamped padding
        pad = np.pad(img, r, mode="edge")
        ref = np.zeros_like(img)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ref += pad[r + dy : r + dy + 24, r + dx : r + dx + 32]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_shift2d(self):
        img = jnp.asarray(np.arange(12).reshape(3, 4), jnp.float32)
        s = np.asarray(filters.shift2d(img, 1, 0))
        np.testing.assert_allclose(s[1], np.asarray(img)[0])
        np.testing.assert_allclose(s[0], np.asarray(img)[0])  # edge clamp

    def test_atrous_preserves_constant(self):
        H = W = 32
        c = jnp.full((H, W), 0.7)
        v = jnp.full((H, W), 0.1)
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
        z = jnp.full((H, W), 3.0)
        out, var = filters.atrous_iteration(c, v, n, z, step=2)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)
        assert np.asarray(var).max() <= 0.1 + 1e-6  # variance shrinks

    def test_atrous_smooths_noise(self):
        rs = np.random.RandomState(1)
        H = W = 64
        noisy = jnp.asarray(0.5 + 0.3 * rs.normal(size=(H, W)), jnp.float32)
        v = jnp.full((H, W), 0.09)
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
        z = jnp.full((H, W), 3.0)
        out, _ = filters.atrous_iteration(noisy, v, n, z, step=1)
        assert np.asarray(out).std() < np.asarray(noisy).std() * 0.8

    def test_bilateral_blur_edge_preserving(self):
        """Blur must not leak across a depth edge."""
        H = W = 32
        img = jnp.concatenate([jnp.ones((H, W // 2)), jnp.zeros((H, W // 2))], 1)
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
        z = jnp.concatenate([jnp.full((H, W // 2), 2.0), jnp.full((H, W // 2), 50.0)], 1)
        out = np.asarray(filters.bilateral_blur_separable(img, n, z, radius=3))
        assert out[:, : W // 2 - 4].min() > 0.95  # left side stays 1
        assert out[:, W // 2 + 4 :].max() < 0.05  # right side stays 0

    def test_upsample_shapes_and_identity_signal(self):
        H = W = 32
        low = jnp.full((H // 2, W // 2), 0.42)
        ln = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H // 2, W // 2, 3))
        lz = jnp.full((H // 2, W // 2), 3.0)
        hn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
        hz = jnp.full((H, W), 3.0)
        up = filters.upsample_edge_aware(low, ln, lz, hn, hz, 1)
        assert up.shape == (H, W)
        np.testing.assert_allclose(np.asarray(up), 0.42, atol=1e-4)


class TestReprojection:
    def test_static_identity(self):
        """Zero motion + identical G-buffers: history passes through."""
        H = W = 32
        gb = _flat_gbuffer(H, W)
        rs = np.random.RandomState(2)
        hist = jnp.asarray(rs.uniform(size=(H, W)), jnp.float32)
        hlen = jnp.full((H, W), 5.0)
        rep = reproject(gb, gb, hist, history_length=hlen)
        assert bool(np.asarray(rep.valid).all())
        np.testing.assert_allclose(np.asarray(rep.history), np.asarray(hist),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(rep.history_length), 5.0)

    def test_mesh_id_disocclusion(self):
        H = W = 16
        gb = _flat_gbuffer(H, W, mesh_id=1)
        prev = _flat_gbuffer(H, W, mesh_id=2)  # different surface
        hist = jnp.ones((H, W))
        rep = reproject(gb, prev, hist)
        assert not bool(np.asarray(rep.valid).any())
        np.testing.assert_allclose(np.asarray(rep.history), 0.0)

    def test_plane_distance_disocclusion(self):
        H = W = 16
        gb = _flat_gbuffer(H, W, z=5.0)
        prev = _flat_gbuffer(H, W, z=25.0)  # > PLANE_DISTANCE apart
        rep = reproject(gb, prev, jnp.ones((H, W)))
        assert not bool(np.asarray(rep.valid).any())

    def test_motion_shifts_history(self):
        """A horizontal motion vector fetches the shifted history."""
        H = W = 32
        gb = _flat_gbuffer(H, W)
        # motion = prev_uv - curr_uv = +4 pixels in u
        gb = gb.replace(
            motion=jnp.broadcast_to(jnp.asarray([4.0 / W, 0.0]), (H, W, 2))
        )
        hist = jnp.asarray(
            np.tile(np.arange(W, dtype=np.float32)[None, :], (H, 1))
        )
        rep = reproject(gb, _flat_gbuffer(H, W), hist)
        got = np.asarray(rep.history)
        # interior pixels should read hist at x+4
        np.testing.assert_allclose(got[8, 4:-8], np.arange(8, W - 4), atol=1e-3)


class TestTAA:
    def test_static_convergence(self):
        from hybrid_rendering_tpu.config import TAAConfig
        from hybrid_rendering_tpu.models.taa import TAAState, taa_resolve

        H = W = 32
        gb = _flat_gbuffer(H, W)
        rs = np.random.RandomState(3)
        base = jnp.asarray(rs.uniform(size=(H, W, 3)), jnp.float32)
        state = TAAState.create(H, W)
        cfg = TAAConfig(sharpen=False)
        out = None
        for i in range(4):
            out, state = taa_resolve(base, gb, state, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-2)

    def test_flicker_suppression(self):
        from hybrid_rendering_tpu.config import TAAConfig
        from hybrid_rendering_tpu.models.taa import TAAState, taa_resolve

        H = W = 32
        gb = _flat_gbuffer(H, W)
        rs = np.random.RandomState(4)
        a = jnp.asarray(0.5 + 0.2 * rs.normal(size=(H, W, 3)), jnp.float32)
        state = TAAState.create(H, W)
        cfg = TAAConfig(sharpen=False)
        outs = []
        for i in range(6):
            frame = a if i % 2 == 0 else 1.0 - a  # alternating flicker
            out, state = taa_resolve(frame, gb, state, cfg)
            outs.append(np.asarray(out))
        # successive outputs differ less than the inputs flicker
        out_delta = np.abs(outs[-1] - outs[-2]).mean()
        in_delta = float(jnp.abs(a - (1.0 - a)).mean())
        assert out_delta < in_delta * 0.6


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from hybrid_rendering_tpu.utils.checkpoint import load_state, save_state
        from hybrid_rendering_tpu.models.shadows import ShadowsState

        st = ShadowsState.create(8, 8)
        st = st.replace(history=st.history + 0.25)
        p = str(tmp_path / "ckpt.npz")
        save_state(p, st)
        back = load_state(p, like=st)
        np.testing.assert_allclose(np.asarray(back.history), 0.25)

    def test_requires_like_and_checks_keypaths(self, tmp_path):
        import pytest
        from hybrid_rendering_tpu.utils.checkpoint import load_state, save_state

        st = {"a": jnp.ones((3, 3)), "b": [jnp.zeros(2), jnp.full((1,), 7.0)]}
        p = str(tmp_path / "ckpt2.npz")
        save_state(p, st)
        back = load_state(p, like=st)
        np.testing.assert_allclose(np.asarray(back["b"][1]), 7.0)
        # no pickled structure in the file -> like is mandatory
        with pytest.raises(ValueError):
            load_state(p, like=None)
        # refactored layout (different key paths) fails loudly
        wrong = {"a": jnp.ones((3, 3)), "c": [jnp.zeros(2), jnp.zeros((1,))]}
        with pytest.raises(ValueError):
            load_state(p, like=wrong)


def test_taa_motion_blur_blurs_along_velocity():
    """sample_color_motion equivalent (taa.comp:218-236 + noise.glsl):
    with a uniform velocity, a hard vertical edge smears along x."""
    import dataclasses

    import jax.numpy as jnp

    from hybrid_rendering_tpu.config import TAAConfig
    from hybrid_rendering_tpu.models import taa as taa_mod

    H = W = 32
    color = np.zeros((H, W, 3), np.float32)
    color[:, W // 2:] = 1.0
    gb = _flat_gbuffer(H, W)
    # uniform motion: prev - curr = -8 px in x -> velocity +8 px
    gb = gb.replace(motion=jnp.full((H, W, 2), 0.0).at[..., 0].set(-8.0 / W))
    state = taa_mod.TAAState.create(H, W)

    cfg = TAAConfig(motion_blur=False, sharpen=False)
    out0, _ = taa_mod.taa_resolve(jnp.asarray(color), gb, state, cfg)
    cfg = TAAConfig(motion_blur=True, sharpen=False)
    out1, _ = taa_mod.taa_resolve(jnp.asarray(color), gb, state, cfg)

    row0 = np.asarray(out0)[H // 2, :, 0]
    row1 = np.asarray(out1)[H // 2, :, 0]
    # without blur the edge transition is <= ~2 px; with blur it spreads
    trans0 = np.sum((row0 > 0.05) & (row0 < 0.95))
    trans1 = np.sum((row1 > 0.05) & (row1 < 0.95))
    assert trans1 > trans0 + 2
    assert np.isfinite(row1).all()


class TestShadowTemporalClamp:
    def test_clamp_std_factor_widens_history_window(self):
        """A wider clamp_std_factor keeps converged history closer to the
        true per-pixel mean near a shadow edge (the 17x17 neighborhood
        mean mixes lit and umbra pixels; k=0.5 drags lit history toward
        it — the r5 GT-calibrated preset fix)."""
        import dataclasses
        from hybrid_rendering_tpu.config import ShadowsConfig
        from hybrid_rendering_tpu.models.shadows import (
            ShadowsState, temporal_accumulation)

        H = W = 32
        gb = _flat_gbuffer(H, W)
        # left half umbra (0), right half lit (1); history converged at
        # the true signal
        raw = jnp.concatenate(
            [jnp.zeros((H, W // 2)), jnp.ones((H, W // 2))], axis=1)
        state = ShadowsState(
            history=raw, moments=jnp.stack([raw, raw], -1),
            history_length=jnp.full((H, W), 32.0))

        def run(k):
            cfg = ShadowsConfig(clamp_std_factor=k)
            vis, _, _, _ = temporal_accumulation(raw, gb, gb, state, cfg)
            # lit pixel adjacent to the edge: neighborhood mean < 1
            return float(vis[H // 2, W // 2 + 2])

        v_tight, v_wide = run(0.5), run(4.0)
        assert v_wide > v_tight  # wide clamp preserves lit history
        assert v_wide > 0.97  # and is nearly unbiased
