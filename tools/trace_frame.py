"""Trace one full hybrid frame (bench.py's exact config) and dump xplane
for parse_trace.py — the per-op attribution that decides where the frame's
milliseconds actually go (VERDICT r4 weak #1/#5: isolated-pass timings
don't reconcile with the headline; the xplane is ground truth)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGDIR = "/tmp/jaxtrace_frame"


def main():
    import dataclasses

    import jax

    try:  # reuse bench.py's persistent compile cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.presets import apply_preset

    W, H = 1920, 1080
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "shadows_test"
    base = RendererConfig(
        width=W, height=H,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(),
        taa=TAAConfig(),
    )
    scene, light, camkw, cfg, _ = apply_preset(scene_name, base)
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    step = jax.jit(r.render_frame, donate_argnums=(0,))
    state = r.create_state()
    cam = jax.device_put(r.make_camera(camkw["eye"], camkw["target"], 0))
    light = jax.device_put(light)
    # dump the EXACT compiled program alongside the trace so
    # attrib_scopes joins the same HLO the xplane measured (a stale
    # /tmp/frame_hlo.txt silently mis-attributes)
    lowered = jax.jit(r.render_frame, donate_argnums=(0,)).lower(
        state, cam, light)
    with open("/tmp/frame_hlo.txt", "w") as f:
        f.write(lowered.compile().as_text())
    outputs, state = step(state, cam, light)
    jax.block_until_ready(outputs["ldr"])
    print("compiled; tracing", flush=True)
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            outputs, state = step(state, cam, light)
        jax.block_until_ready(outputs["ldr"])
    print("trace written to", LOGDIR, flush=True)


if __name__ == "__main__":
    main()
