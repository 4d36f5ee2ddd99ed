"""Config-level contracts: reference-parity preset, probe-grid layouts,
preset ownership of AO tuning."""
import numpy as np

from hybrid_rendering_tpu.config import (
    DDGIConfig, RendererConfig, reference_parity,
)
from hybrid_rendering_tpu.models.ddgi import make_probe_grid
from hybrid_rendering_tpu.scene.presets import apply_preset


def test_reference_parity_restores_upstream_constants():
    cfg = reference_parity(RendererConfig())
    assert cfg.ddgi.energy_preservation == 0.85  # ddgi.h:88
    assert cfg.ddgi.recursive_energy_preservation == 0.95
    assert cfg.ddgi.infinite_bounce_intensity == 1.7
    np.testing.assert_allclose(cfg.ddgi.gi_intensity, 0.5 * np.pi)
    assert cfg.ddgi.probe_radiance_clamp == 0.0  # GT clamp is ours, not theirs


def test_probe_grid_layouts():
    lo, hi = np.zeros(3), np.array([10.0, 10.0, 10.0])
    padded = make_probe_grid(lo, hi, DDGIConfig(probe_distance=1.5,
                                                grid_layout="padded"))
    interior = make_probe_grid(lo, hi, DDGIConfig(probe_distance=1.5,
                                                  grid_layout="interior"))
    # padded: rows start ON the min and run past the max (ddgi.cpp:150-169)
    assert np.allclose(padded.start, lo)
    top = padded.start[1] + (padded.counts[1] - 1) * padded.step[1]
    assert top > hi[1]
    # interior: all rows strictly inside the AABB
    pos_lo = interior.start
    pos_hi = interior.start + (np.array(interior.counts) - 1) * interior.step
    assert (pos_lo > lo).all() and (pos_hi < hi).all()
    assert interior.num_probes < padded.num_probes


def test_preset_owns_ao_power():
    scene, light, camkw, cfg, _ = apply_preset("gi_test")
    assert cfg.ao.ray_length == 0.6 and cfg.ao.power == 0.3
    # keep= lets a caller hold its own value
    base = RendererConfig()
    import dataclasses
    base = base.replace(ao=dataclasses.replace(base.ao, power=9.0))
    _, _, _, cfg2, _ = apply_preset("gi_test", base, keep=("ao.power",))
    assert cfg2.ao.power == 9.0
