"""Trace one full hybrid frame and dump xplane for parse_trace.py."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGDIR = "/tmp/jaxtrace_frame"


def main():
    import jax

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.scenes import load_scene

    W, H = 1920, 1080
    scene, light, camkw = load_scene("shadows_test")
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    cfg = RendererConfig(
        width=W, height=H,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(probe_distance=4.0, rays_per_probe=256,
                        scale=RayTraceScale.HALF),
        taa=TAAConfig(enabled=True),
    )
    r = HybridRenderer(scene, cfg, sky.radiance)
    step = jax.jit(r.render_frame, donate_argnums=(0,))
    state = r.create_state()
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)
    outputs, state = step(state, cam, light)
    jax.block_until_ready(outputs["ldr"])

    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        for _ in range(2):
            outputs, state = step(state, cam, light)
        jax.block_until_ready(outputs["ldr"])
    print("trace written to", LOGDIR)


if __name__ == "__main__":
    main()
