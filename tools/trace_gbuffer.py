"""Trace one G-buffer render step and dump the xplane for parse_trace.py."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGDIR = "/tmp/jaxtrace_gb"


def main():
    import jax

    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.utils import camera as cam_utils

    H, W = 1080, 1920
    scene, light, camkw = load_scene("shadows_test", use_bvh=False)
    closest = bvh_mod.make_surface_tracer(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)

    @jax.jit
    def gbuf(c):
        return render_gbuffer(scene, closest, c, W, H)

    gb = gbuf(cam)
    jax.block_until_ready(gb.depth)

    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            gb = gbuf(cam)
        jax.block_until_ready(gb.depth)
    print("trace written to", LOGDIR)


if __name__ == "__main__":
    main()
