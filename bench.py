"""Benchmark driver — prints ONE JSON line.

North-star metric (BASELINE.md): full hybrid pipeline (shadows + AO +
reflections + DDGI + TAA + tonemap) at 1920x1080 on one TPU chip, target
< 33 ms/frame. vs_baseline = 33 / measured_ms (>1 means faster than
target).
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.scenes import load_scene

    W, H = 1920, 1080
    scene, light, camkw = load_scene("shadows_test")
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)

    # reference default operating point: shadows FULL, AO/reflections HALF
    # (ray_traced_shadows.h:23, ray_traced_ao.h:23, ray_traced_reflections.h:24)
    cfg = RendererConfig(
        width=W, height=H,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(
            probe_distance=4.0, rays_per_probe=256, scale=RayTraceScale.HALF
        ),
        taa=TAAConfig(enabled=True),
    )
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)

    step = jax.jit(r.render_frame, donate_argnums=(0,))
    state = r.create_state()
    # pre-stage per-frame inputs on device: through the remote tunnel a
    # host->device upload costs ~100 ms of latency per frame otherwise
    cam = jax.device_put(r.make_camera(camkw["eye"], camkw["target"], 0))
    light = jax.device_put(light)

    t0 = time.perf_counter()
    outputs, state = step(state, cam, light)
    outputs["ldr"].block_until_ready()
    compile_s = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        outputs, state = step(state, cam, light)
    outputs["ldr"].block_until_ready()
    ms = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({
        "metric": "hybrid_pipeline_1080p",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(33.0 / ms, 3),
        "detail": {
            "resolution": f"{W}x{H}",
            "passes": "gbuffer+shadows(F)+ao(H)+ddgi(256rpp)+reflections(H)+deferred+taa+tonemap",
            "probes": r.probe_grid.num_probes,
            "triangles": int(scene.num_triangles),
            "compile_s": round(compile_s, 1),
            "scene": "shadows_test (pillars)",
            "device": str(jax.devices()[0]),
            "target_ms": 33.0,
        },
    }))


if __name__ == "__main__":
    main()
