"""Capture an xprof device trace of the shadows temporal pass and print
the top ops by self time."""
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGDIR = "/tmp/jaxtrace"


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.reprojection import reproject
    from hybrid_rendering_tpu.utils import camera as cam_utils

    H, W = 1080, 1920
    scene, light, camkw = load_scene("shadows_test", use_bvh=False)
    closest, vis = bvh_mod.make_tracers(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)
    gb = jax.jit(lambda c: render_gbuffer(scene, closest, c, W, H))(cam)
    mom = jnp.zeros((H, W, 2))
    hlen = jnp.zeros((H, W))

    @jax.jit
    def rep_chain(g, h0):
        def body(_, hh):
            r = reproject(g, g, hh, history_moments=mom, history_length=hlen)
            return r.history * 0.5 + hh * 0.5
        return jax.lax.fori_loop(0, 4, body, h0)

    h0 = jnp.zeros((H, W))
    out = rep_chain(gb, h0)
    out.block_until_ready()

    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        out = rep_chain(gb, h0)
        out.block_until_ready()

    # parse the xplane proto with tensorboard_plugin_profile
    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xplanes, "trace_viewer", {})
        trace = json.loads(data)
        events = trace.get("traceEvents", [])
        # sum durations by name for TensorCore events
        totals = {}
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                totals[name] = totals.get(name, 0) + e["dur"]
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
        for name, dur in top:
            print(f"{dur/1e3:10.2f} ms  {name[:120]}")
    except Exception as ex:
        print("trace parse failed:", ex)


if __name__ == "__main__":
    main()
