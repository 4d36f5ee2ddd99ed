"""Fidelity oracle: RMSE of the hybrid pipeline vs the GT path tracer.

The reference's verification is visual A/B against the bundled progressive
path tracer (SURVEY §4.2: "Ground Truth" visualization mode with
accumulation restarts). This module automates it: render N hybrid frames
(temporal filters converge), render the GT to M spp from the identical
camera, compare tonemapped outputs. north star: <= 2% RMSE (BASELINE.md).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax

from hybrid_rendering_tpu.config import PathTracerConfig, ToneMapConfig
from hybrid_rendering_tpu.models import path_tracer, tonemap as tonemap_mod
from hybrid_rendering_tpu.models.renderer import HybridRenderer
from hybrid_rendering_tpu.types import Light
from hybrid_rendering_tpu.utils import image as image_utils


def render_hybrid_converged(
    renderer: HybridRenderer, camera, light: Light, frames: int = 16
):
    """Render `frames` static frames so temporal accumulation converges;
    returns the final outputs dict."""
    state = renderer.create_state()
    step = jax.jit(renderer.render_frame, donate_argnums=(0,))
    outputs = None
    for _ in range(frames):
        outputs, state = step(state, camera, light)
    return outputs


def render_ground_truth(
    renderer: HybridRenderer, camera, light: Light, spp: int = 64,
    max_bounces: int = 3,
):
    """Progressive GT render through the same tracers (the reference's
    GroundTruthPathTracer view, tone_map.cpp:122)."""
    cfg = PathTracerConfig(max_ray_bounces=max_bounces)
    state = path_tracer.render_progressive(
        renderer.scene, renderer.closest_surface_fn, renderer.visibility_fn,
        camera, light, renderer.sky_radiance_fn,
        renderer.config.width, renderer.config.height, spp, cfg,
    )
    return state.color


def fidelity_report(
    renderer: HybridRenderer, camera, light: Light,
    hybrid_frames: int = 16, gt_spp: int = 64,
    tonemap_cfg: Optional[ToneMapConfig] = None,
    gt_ldr: Optional[np.ndarray] = None,
):
    """Returns dict with rmse / relative rmse between tonemapped hybrid
    and GT frames. Pass gt_ldr (H,W,3 float in [0,1]) to reuse a
    previously rendered oracle image (bench.py keeps one on disk: the GT
    render is the expensive half of the report)."""
    tm = tonemap_cfg or renderer.config.tonemap
    outputs = render_hybrid_converged(renderer, camera, light, hybrid_frames)
    # compare in display space; GT is radiance-clamped at 1.0
    # (ground_truth_path_trace.rgen:94) so clamp the hybrid the same way
    import jax.numpy as jnp

    hybrid_ldr = np.asarray(
        tonemap_mod.tonemap(jnp.minimum(outputs["deferred"], 1.0), tm)
    )
    if gt_ldr is None:
        gt = render_ground_truth(renderer, camera, light, gt_spp)
        gt_ldr = np.asarray(tonemap_mod.tonemap(gt, tm))
    else:
        gt_ldr = np.asarray(gt_ldr, np.float32)

    def pool4(img):
        h, w = img.shape[:2]
        return img[: h - h % 4, : w - w % 4].reshape(
            h // 4, 4, w // 4, 4, -1).mean(axis=(1, 3))

    # pooled metrics: 4x4 box-pooling both images averages away the GT
    # path tracer's per-pixel Monte-Carlo noise (~sigma/4), isolating the
    # structural error the fidelity gate is about
    hp, gp = pool4(hybrid_ldr), pool4(gt_ldr)
    return {
        "rmse": image_utils.rmse(hybrid_ldr, gt_ldr),
        "relative_rmse": image_utils.relative_rmse(hybrid_ldr, gt_ldr),
        "pooled_rmse": image_utils.rmse(hp, gp),
        "pooled_relative_rmse": image_utils.relative_rmse(hp, gp),
        "hybrid_mean": float(hybrid_ldr.mean()),
        "gt_mean": float(gt_ldr.mean()),
        "hybrid_ldr": hybrid_ldr,
        "gt_ldr": gt_ldr,
    }
