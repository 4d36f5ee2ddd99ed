"""Trustworthy op microbenchmarks: each op is iterated with DATA
DEPENDENCIES inside one jit (fori_loop), so async dispatch / remote-tunnel
artifacts can't fake the numbers."""
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
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:9.2f} ms/iter", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    H, W = 1080, 1920
    N = H * W
    rs = np.random.RandomState(0)

    # --- gather: 2M rows from (N, 12), chained ---
    table = jnp.asarray(rs.normal(size=(N, 12)), jnp.float32)
    idx0 = jnp.asarray(rs.randint(0, N, size=N), jnp.int32)

    @jax.jit
    def take_chain(t, i):
        def body(_, carry):
            i_ = carry
            v = jnp.take(t, i_, axis=0)
            i_ = (i_ + v[:, 0].astype(jnp.int32) % 7 + 1) % t.shape[0]
            return i_
        return jax.lax.fori_loop(0, ITERS, body, i)

    bench("gather 2M rows (N,12) random", take_chain, table, idx0)

    # --- flash closest 2M rays, chained ---
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.ops.pallas import flashtrace

    scene, light, camkw = load_scene("shadows_test", use_bvh=False)
    fs = flashtrace.make_flash_scene(scene.tri_pos)
    o = jnp.asarray(rs.uniform(-10, 10, size=(N, 3)), jnp.float32)
    d0 = rs.normal(size=(N, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d0 = jnp.asarray(d0)
    tm = jnp.full((N,), 1e5, jnp.float32)

    @jax.jit
    def flash_chain(origin, direction):
        def body(_, dd):
            from hybrid_rendering_tpu.ops.pallas.flashtrace import flash_closest_hit
            hit = flash_closest_hit(fs, origin, dd, tm)
            # perturb direction with the result -> dependency
            dd = dd + (hit.t[:, None] % 0.001) * 1e-6
            dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
            return dd
        return jax.lax.fori_loop(0, ITERS, body, direction)

    bench("flash closest 2M rays", flash_chain, o, d0)

    @jax.jit
    def flashv_chain(origin, direction):
        def body(_, dd):
            from hybrid_rendering_tpu.ops.pallas.flashtrace import flash_visibility
            v = flash_visibility(fs, origin, dd, tm)
            dd = dd + v[:, None] * 1e-7
            return dd
        return jax.lax.fori_loop(0, ITERS, body, direction)

    bench("flash anyhit 2M rays", flashv_chain, o, d0)

    # --- fetch_surface chained ---
    from hybrid_rendering_tpu.scene.fetch import fetch_surface
    from hybrid_rendering_tpu.types import Hit

    tid0 = jnp.asarray(rs.randint(0, 2498, size=N), jnp.int32)

    @jax.jit
    def fetch_chain(sc, tid):
        def body(_, ti):
            h = Hit(t=jnp.ones(N), tri_id=ti, u=jnp.zeros(N), v=jnp.zeros(N))
            s = fetch_surface(sc, o, d0, h)
            return (ti + s.mat_id + 1) % sc.tri_pos.shape[0]
        return jax.lax.fori_loop(0, ITERS, body, tid)

    bench("fetch_surface 2M", fetch_chain, scene, tid0)

    # --- box filter / atrous chained ---
    img0 = jnp.asarray(rs.normal(size=(H, W)), jnp.float32)
    nrm = jnp.asarray(rs.normal(size=(H, W, 3)), jnp.float32)
    depth = jnp.abs(jnp.asarray(rs.normal(size=(H, W)), jnp.float32))

    @jax.jit
    def box_chain(x):
        from hybrid_rendering_tpu.ops.filters import box_filter_sum
        def body(_, xx):
            return box_filter_sum(xx, 8) * 1e-2
        return jax.lax.fori_loop(0, ITERS, body, x)

    bench("box 17x17 @1080p", box_chain, img0)

    @jax.jit
    def atrous_chain(x):
        from hybrid_rendering_tpu.ops.filters import atrous_iteration
        def body(_, xx):
            c, v = atrous_iteration(xx, jnp.abs(xx), nrm, depth, step=2)
            return c
        return jax.lax.fori_loop(0, ITERS, body, x)

    bench("atrous iter @1080p", atrous_chain, img0)

    # --- reprojection chained ---
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.reprojection import reproject
    from hybrid_rendering_tpu.utils import camera as cam_utils

    closest, vis = bvh_mod.make_tracers(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)

    @jax.jit
    def gbuf_chain(c, seed):
        def body(_, s):
            gb = render_gbuffer(scene, closest, c, W, H)
            return s + gb.depth * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, seed)

    bench("render_gbuffer @1080p", gbuf_chain, cam, img0)

    gb = jax.jit(lambda c: render_gbuffer(scene, closest, c, W, H))(cam)
    mom = jnp.zeros((H, W, 2))
    hlen = jnp.zeros((H, W))

    @jax.jit
    def rep_chain(g, h):
        def body(_, hh):
            r = reproject(g, g, hh, history_moments=mom, history_length=hlen)
            return r.history * 0.5 + hh * 0.5
        return jax.lax.fori_loop(0, ITERS, body, h)

    bench("reproject @1080p", rep_chain, gb, img0)

    # --- ddgi sample_irradiance at half-res chained ---
    from hybrid_rendering_tpu.models import ddgi as ddgi_mod
    from hybrid_rendering_tpu.config import DDGIConfig

    cfg = DDGIConfig(probe_distance=4.0)
    lo, hi = scene.aabb()
    grid = ddgi_mod.make_probe_grid(np.asarray(lo), np.asarray(hi), cfg)
    st = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
    h2, w2 = H // 2, W // 2
    P = jnp.asarray(rs.uniform(-10, 10, size=(h2, w2, 3)), jnp.float32)
    Nrm = nrm[:h2, :w2]

    @jax.jit
    def gi_chain(p):
        def body(_, pp):
            e = ddgi_mod.sample_irradiance(grid, st, cfg, pp, Nrm, Nrm)
            return pp + e * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, p)

    bench(f"ddgi sample_irradiance 540p ({grid.num_probes} probes)", gi_chain, P)


if __name__ == "__main__":
    main()
