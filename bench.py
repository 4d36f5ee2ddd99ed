"""Benchmark driver — prints ONE JSON line.

Round-1 metric: GT path-tracer throughput (Mrays/s) on the Pillars scene on
the real chip. As the hybrid pipeline lands, this becomes ms/frame at 1080p
for the full pipeline (BASELINE.md north star: < 33 ms/frame; vs_baseline
is measured against that 33 ms target once the full pipeline is benched).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from hybrid_rendering_tpu.config import PathTracerConfig
    from hybrid_rendering_tpu.models import path_tracer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.utils import camera as cam_utils

    W = H = 256
    BOUNCES = 2
    scene, light, camkw = load_scene("shadows_test")
    closest, vis = bvh_mod.make_tracers(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    cfg = PathTracerConfig(max_ray_bounces=BOUNCES)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(st):
        s = path_tracer.trace_sample(
            scene, closest, vis, cam, light, sky.radiance, W, H, st.num_frames, cfg
        )
        return path_tracer.accumulate(st, s)

    state = path_tracer.GroundTruthState.create(H, W)
    state = step(state)  # compile + warmup
    state.color.block_until_ready()

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    state.color.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    # rays per frame: primary + per-bounce (shadow + sky shadow + bounce)
    # conservative count: primary rays * (bounces closest + 2 shadow per bounce)
    rays_per_px = BOUNCES * 3  # closest + shadow + sky-shadow per bounce
    mrays = W * H * rays_per_px / dt / 1e6

    print(json.dumps({
        "metric": "gt_path_tracer_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays, 3),
        "detail": {
            "resolution": f"{W}x{H}",
            "bounces": BOUNCES,
            "ms_per_1spp_frame": round(dt * 1e3, 3),
            "scene": "shadows_test (pillars)",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
