"""Bisect the reproject pass cost on the current backend (chained iters)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 8


def bench(name, jitted, *args):
    import jax

    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms/iter",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    H, W = 1080, 1920
    rs = np.random.RandomState(0)
    stack = jnp.asarray(rs.normal(size=(H, W, 12)), jnp.float32)
    mx = jnp.asarray(rs.randint(0, W, size=(H, W)), jnp.int32)
    my = jnp.asarray(rs.randint(0, H, size=(H, W)), jnp.int32)

    from hybrid_rendering_tpu.ops.filters import gather_at

    @jax.jit
    def honest_gather(s, ix, iy):
        def body(_, c):
            v = gather_at(s, ix, iy)  # (H,W,12)
            return c + v.sum(-1)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((H, W)))

    bench("gather_at full 12ch random", honest_gather, stack, mx, my)

    # near-identity coords (typical reprojection motion)
    mx2 = jnp.clip(
        jnp.arange(W)[None, :] + jnp.asarray(rs.randint(-2, 2, (H, W))), 0, W - 1
    ).astype(jnp.int32)
    my2 = jnp.clip(
        jnp.arange(H)[:, None] + jnp.asarray(rs.randint(-2, 2, (H, W))), 0, H - 1
    ).astype(jnp.int32)
    bench("gather_at full 12ch coherent", honest_gather, stack, mx2, my2)

    # 13 taps like reproject
    @jax.jit
    def taps13(s, ix, iy):
        def body(_, c):
            acc = jnp.zeros((H, W))
            for k in range(13):
                v = gather_at(s, jnp.clip(ix + k % 3, 0, W - 1),
                              jnp.clip(iy + k // 3, 0, H - 1))
                acc = acc + v.sum(-1)
            return c + acc * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((H, W)))

    bench("13 taps x 12ch coherent", taps13, stack, mx2, my2)

    # full reproject on real gbuffers
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.reprojection import reproject
    from hybrid_rendering_tpu.utils import camera as cam_utils

    scene, light, camkw = load_scene("shadows_test", use_bvh=False)
    closest, vis = bvh_mod.make_tracers(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)
    gb = jax.jit(lambda c: render_gbuffer(scene, closest, c, W, H))(cam)
    mom = jnp.zeros((H, W, 2))
    hlen = jnp.zeros((H, W))

    @jax.jit
    def rep_chain(g, h):
        def body(_, hh):
            r = reproject(g, g, hh, history_moments=mom, history_length=hlen)
            return r.history * 0.5 + hh * 0.5
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((H, W)))

    bench("full reproject", rep_chain, gb, None)

    # re-check flash after cluster culling (coherent primary-style rays)
    from hybrid_rendering_tpu.ops.pallas import flashtrace
    fs = flashtrace.make_flash_scene(scene.tri_pos)
    origins, dirs = cam_utils.camera_rays(cam, W, H)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    N = H * W
    tm = jnp.full((N,), 1e5, jnp.float32)

    @jax.jit
    def flash_chain(origin, direction):
        def body(_, dd):
            hit = flashtrace.flash_closest_hit(fs, origin, dd, tm)
            dd = dd + (hit.t[:, None] % 0.001) * 1e-6
            return dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
        return jax.lax.fori_loop(0, ITERS, body, direction)

    bench("flash closest 2M scanline", flash_chain, o, d)

    # blocked (coherent packets) via make_tracers wrapper
    closest_f, vis_f = bvh_mod.make_tracers(scene, method="flash")

    @jax.jit
    def flash_blocked(og, dg):
        def body(_, dd):
            hit = closest_f(og, dd, 1e5)
            dd = dd + (hit.t[..., None] % 0.001) * 1e-6
            return dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
        return jax.lax.fori_loop(0, ITERS, body, dg)

    bench("flash closest 2M 16x16-blocked", flash_blocked, origins, dirs)

    from hybrid_rendering_tpu.ops.filters import box_filter_sum

    @jax.jit
    def box_chain(x):
        def body(_, xx):
            return box_filter_sum(xx, 8) * 1e-2
        return jax.lax.fori_loop(0, ITERS, body, x)

    bench("box 17x17 shift-add", box_chain, jnp.zeros((H, W)) + 0.5)


if __name__ == "__main__":
    main()
