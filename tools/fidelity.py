"""Measure hybrid-vs-GT RMSE (the BASELINE fidelity gate) on a scene."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "gi_test"
    from hybrid_rendering_tpu.config import RendererConfig
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils.oracle import fidelity_report
    from hybrid_rendering_tpu.utils import image as img_utils

    base = RendererConfig(width=320, height=320)
    scene, light, camkw, cfg, preset = apply_preset(scene_name, base)
    sky = PreethamSky.create(np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)

    rep = fidelity_report(r, cam, light, hybrid_frames=24, gt_spp=96)
    img_utils.write_png(f"/tmp/fid_{scene_name}_hybrid.png", rep["hybrid_ldr"])
    img_utils.write_png(f"/tmp/fid_{scene_name}_gt.png", rep["gt_ldr"])
    print(f"scene={scene_name} rmse={rep['rmse']:.4f} "
          f"relative_rmse={rep['relative_rmse']:.4f} "
          f"hybrid_mean={rep['hybrid_mean']:.3f} gt_mean={rep['gt_mean']:.3f}")


if __name__ == "__main__":
    main()
