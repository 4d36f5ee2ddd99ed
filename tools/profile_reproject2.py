"""Deep bisect of reproject cost: honest carry-dependent gathers and tap
count variants."""
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
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms/iter",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from hybrid_rendering_tpu.ops.filters import gather_at

    H, W = 1080, 1920
    rs = np.random.RandomState(0)
    stack = jnp.asarray(rs.normal(size=(H, W, 12)), jnp.float32)
    mx = jnp.asarray(rs.randint(0, W, size=(H, W)), jnp.int32)
    my = jnp.asarray(rs.randint(0, H, size=(H, W)), jnp.int32)

    @jax.jit
    def honest(s, ix, iy):
        def body(_, carry):
            c, ixx = carry
            v = gather_at(s, ixx, iy)
            c = c + v.sum(-1)
            ixx = (ixx + (c > 0).astype(jnp.int32)) % W  # carry-dependent
            return (c, ixx)
        c, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((H, W)), ix))
        return c

    bench("honest gather 12ch random", honest, stack, mx, my)

    mx2 = jnp.clip(jnp.arange(W)[None, :].astype(jnp.int32)
                   + jnp.asarray(rs.randint(-2, 2, (H, W)), jnp.int32), 0, W - 1)
    bench("honest gather 12ch coherent", honest, stack, mx2, my)

    # reproject variants on real gbuffers
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

    def make_chain(**kw):
        @jax.jit
        def rep_chain(g, h0):
            def body(_, hh):
                r = reproject(g, g, hh, history_moments=mom,
                              history_length=hlen, **kw)
                return r.history * 0.5 + hh * 0.5
            return jax.lax.fori_loop(0, ITERS, body, h0)
        return rep_chain

    h0 = jnp.zeros((H, W))
    bench("reproject 4-tap only", make_chain(fallback=False), gb, h0)
    bench("reproject full 13-tap", make_chain(fallback=True), gb, h0)

    # flash after culling fix
    from hybrid_rendering_tpu.ops.pallas import flashtrace
    fs = flashtrace.make_flash_scene(scene.tri_pos)
    origins, dirs = cam_utils.camera_rays(cam, W, H)
    closest_f, vis_f = bvh_mod.make_tracers(scene, method="flash")

    @jax.jit
    def flash_blocked(og, dg):
        def body(_, dd):
            hit = closest_f(og, dd, 1e5)
            dd = dd + (hit.t[..., None] % 0.001) * 1e-6
            return dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
        return jax.lax.fori_loop(0, ITERS, body, dg)

    bench("flash closest 2M blocked+culled", flash_blocked, origins, dirs)

    @jax.jit
    def flashv_blocked(og, dg):
        def body(_, dd):
            v = vis_f(og, dd, 1e4)
            dd = dd + v[..., None] * 1e-7
            return dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
        return jax.lax.fori_loop(0, ITERS, body, dg)

    bench("flash anyhit 2M blocked+culled", flashv_blocked, origins, dirs)

    from hybrid_rendering_tpu.ops.filters import box_filter_sum

    @jax.jit
    def box_chain(x):
        def body(_, xx):
            return box_filter_sum(xx, 8) * 1e-2
        return jax.lax.fori_loop(0, ITERS, body, x)

    bench("box 17x17 shift-add", box_chain, h0 + 0.5)


if __name__ == "__main__":
    main()
