"""Per-effect fidelity bisection vs matched GT decompositions.

VERDICT r1 weak #2: gi_test relative RMSE was 0.35 with "energy matches,
structure differs". This tool isolates WHICH effect deviates by comparing
each hybrid stage against the ground-truth path tracer configured to
produce the matching light transport:

  direct   : hybrid shadows-only (no AO/refl/GI)  vs GT max_bounces=1
             (bounces counts traced segments: 1 = primary hit + direct)
  +gi      : hybrid shadows+DDGI (no AO/refl)     vs GT max_bounces=4
  full     : everything (the BASELINE gate)       vs GT max_bounces=4

Usage: [JAX_PLATFORMS=cpu] python tools/fidelity_bisect.py [scene] [size]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "gi_test"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 96

    import jax.numpy as jnp

    from hybrid_rendering_tpu.config import (
        PathTracerConfig, RendererConfig, ToneMapConfig,
    )
    from hybrid_rendering_tpu.models import path_tracer, tonemap as tm_mod
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils import image as img_utils
    from hybrid_rendering_tpu.utils.oracle import render_hybrid_converged

    base = RendererConfig(width=size, height=size, debug_outputs=True)
    scene, light, camkw, cfg0, _ = apply_preset(scene_name, base)
    sky = PreethamSky.create(np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    tm = ToneMapConfig()

    def hybrid(cfg, env_fallbacks=True):
        fb = (irr_fn, pref_fn) if env_fallbacks else (None, None)
        r = HybridRenderer(scene, cfg, sky.radiance, *fb)
        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        out = render_hybrid_converged(r, cam, light, frames=24)
        return np.asarray(
            tm_mod.tonemap(jnp.minimum(out["deferred"], 1.0), tm))

    def gt(bounces):
        r = HybridRenderer(scene, cfg0, sky.radiance, irr_fn, pref_fn)
        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        from hybrid_rendering_tpu.utils.oracle import render_ground_truth

        img = render_ground_truth(r, cam, light, spp, max_bounces=bounces)
        return np.asarray(tm_mod.tonemap(img, tm))

    def off(c):
        return dataclasses.replace(c, enabled=False)

    stages = {
        "direct": (
            dataclasses.replace(
                cfg0, ao=off(cfg0.ao), reflections=off(cfg0.reflections),
                ddgi=off(cfg0.ddgi), taa=off(cfg0.taa)),
            1,
        ),
        "+gi": (
            dataclasses.replace(
                cfg0, ao=off(cfg0.ao), reflections=off(cfg0.reflections),
                taa=off(cfg0.taa)),
            4,
        ),
        "full": (dataclasses.replace(cfg0, taa=off(cfg0.taa)), 4),
    }
    for name, (cfg, bounces) in stages.items():
        # decomposition stages drop the env-ambient fallbacks: GT with
        # few bounces has no ambient term to match them
        h = hybrid(cfg, env_fallbacks=(name == "full"))
        g = gt(bounces)
        img_utils.write_png(f"/tmp/bisect_{scene_name}_{name}_h.png", h)
        img_utils.write_png(f"/tmp/bisect_{scene_name}_{name}_g.png", g)
        def pool4(img):
            hh, ww = img.shape[:2]
            return img[: hh - hh % 4, : ww - ww % 4].reshape(
                hh // 4, 4, ww // 4, 4, -1).mean(axis=(1, 3))

        print(f"{name:8s} rmse={img_utils.rmse(h, g):.4f} "
              f"rel={img_utils.relative_rmse(h, g):.4f} "
              f"pooled_rel={img_utils.relative_rmse(pool4(h), pool4(g)):.4f} "
              f"h_mean={h.mean():.3f} g_mean={g.mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
