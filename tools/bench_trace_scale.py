"""Closest-hit tracer throughput vs scene scale (VERDICT r1 #4).

Measures FlashTrace Mrays/s on the 2.5k-tri shadows_test vs the 191k-tri
sponza_hi hero scene with primary-ray workloads. Gate: the hero scene's
rate must be within 4x of the small scene's (the sparse per-packet
cluster-list path must actually cull).

Usage: python tools/bench_trace_scale.py [--width 1920 --height 1080]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.utils import camera as cam_utils

    W, H = args.width, args.height
    rates = {}
    for name in ("shadows_test", "sponza_hi"):
        scene, light, camkw = load_scene(name)
        cam = cam_utils.make_camera(width=W, height=H, **camkw)
        closest_surface = bvh_mod.make_surface_tracer(scene)

        from hybrid_rendering_tpu.utils.camera import camera_rays

        o, d = camera_rays(cam, W, H)
        fn = jax.jit(lambda o, d: closest_surface(o, d, 1e4)[0].t)
        t = fn(o, d)
        t.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            t = fn(o, d)
        t.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        mrays = W * H / dt / 1e6
        rates[name] = mrays
        print(f"{name}: {scene.num_triangles} tris, "
              f"{dt*1e3:.2f} ms/frame, {mrays:.1f} Mrays/s", flush=True)

    ratio = rates["shadows_test"] / rates["sponza_hi"]
    print(f"small/hero rate ratio: {ratio:.2f}x (gate: <= 4x)")


if __name__ == "__main__":
    main()
