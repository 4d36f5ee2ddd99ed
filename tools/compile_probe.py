"""Attribute frame compile seconds to components on the REAL device.

Times `.lower().compile()` of each isolated piece (a-trous chains,
bilateral blur, DDGI sampler, sparse FlashTrace, and the full frame) so
compile-time work targets the actual cost center instead of the largest
payload count (VERDICT r3 #1: compile_s must drop below 100 s).

Usage: python tools/compile_probe.py [WxH] [scene]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def probe(name, fn, *args, **kw):
    t0 = time.time()
    jax.jit(fn, **kw).lower(*args).compile()
    dt = time.time() - t0
    print(json.dumps({"component": name, "compile_s": round(dt, 1)}),
          flush=True)
    return dt


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "shadows_test"
    W, H = (int(v) for v in res.split("x"))

    from hybrid_rendering_tpu.ops.pallas.stencil import (atrous_chain,
                                                         bilateral_blur)

    img = jnp.zeros((H, W), jnp.float32)
    img3 = jnp.zeros((H, W, 3), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32)
    msk = jnp.zeros((H, W), bool)

    probe("atrous_chain 1ch full-res x4",
          lambda c, v, n, d, m: atrous_chain(c, v, n, d, m,
                                             steps=(1, 2, 4, 8)),
          img, img, nrm, img, msk)
    h2, w2 = H // 2, W // 2
    probe("atrous_chain 3ch half-res x4",
          lambda c, v, n, d, m: atrous_chain(c, v, n, d, m,
                                             steps=(1, 2, 4, 8)),
          img3[:h2, :w2], img[:h2, :w2], nrm[:h2, :w2], img[:h2, :w2],
          msk[:h2, :w2])
    probe("bilateral_blur half-res",
          lambda i, n, d, m: bilateral_blur(i, n, d, m),
          img[:h2, :w2], nrm[:h2, :w2], img[:h2, :w2], msk[:h2, :w2])

    # full renderer pieces need the scene
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        r, light, camkw = bm._build(scene_name, W, H)
        state = r.create_state()
        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
    tpu = jax.devices()[0]

    # one sparse-trace site at representative packet count
    if getattr(r, "flash_scene", None) is not None:
        from hybrid_rendering_tpu.ops import bvh as bvh_ops

        fs = jax.device_put(r.flash_scene, tpu)
        o = jnp.zeros((H * W // 4, 3), jnp.float32)
        d = jnp.zeros((H * W // 4, 3), jnp.float32) + jnp.asarray(
            [0.0, 1.0, 0.0])
        tm = jnp.full((H * W // 4,), 100.0, jnp.float32)

        def closest(o_, d_, t_):
            return bvh_ops.flash_closest_hit(fs, o_, d_, t_)

        try:
            probe("sparse closest-hit (1/4-res rays)", closest, o, d, tm)
        except Exception as e:  # noqa: BLE001
            print("closest probe failed:", type(e).__name__, str(e)[:200])

    state = jax.device_put(state, tpu)
    cam = jax.device_put(cam, tpu)
    light = jax.device_put(light, tpu)
    t_full = probe("FULL frame", r.render_frame, state, cam, light,
                   donate_argnums=(0,))
    print(json.dumps({"component": "TOTAL", "compile_s": round(t_full, 1)}))


if __name__ == "__main__":
    main()
