"""Per-pass cost bisect of the hybrid pipeline on the current backend."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    variants = {
        "gbuffer_only": dict(sh=False, ao=False, rf=False, gi=False, taa=False),
        "+shadows": dict(sh=True, ao=False, rf=False, gi=False, taa=False),
        "+ao": dict(sh=True, ao=True, rf=False, gi=False, taa=False),
        "+reflections": dict(sh=True, ao=True, rf=True, gi=False, taa=False),
        "+ddgi": dict(sh=True, ao=True, rf=True, gi=True, taa=False),
        "full(+taa)": dict(sh=True, ao=True, rf=True, gi=True, taa=True),
    }
    for name, v in variants.items():
        cfg = RendererConfig(
            width=W, height=H,
            shadows=ShadowsConfig(enabled=v["sh"]),
            ao=AOConfig(enabled=v["ao"], scale=RayTraceScale.HALF),
            reflections=ReflectionsConfig(enabled=v["rf"], scale=RayTraceScale.HALF),
            ddgi=DDGIConfig(enabled=v["gi"], probe_distance=4.0,
                            rays_per_probe=256, scale=RayTraceScale.HALF),
            taa=TAAConfig(enabled=v["taa"]),
        )
        r = HybridRenderer(scene, cfg, sky.radiance)
        step = jax.jit(r.render_frame, donate_argnums=(0,))
        state = r.create_state()
        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        t0 = time.perf_counter()
        outputs, state = step(state, cam, light)
        outputs["ldr"].block_until_ready()
        compile_s = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            outputs, state = step(state, cam, light)
        outputs["ldr"].block_until_ready()
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:16s} {ms:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
