"""Microbenchmarks of the suspected hot ops on the current backend.
All inputs passed as jit ARGS (no closure constants)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(f, *a, n=10):
    import jax

    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    H, W = 1080, 1920
    N = H * W
    rs = np.random.RandomState(0)

    # --- gather patterns ---
    for M, C in [(N, 4), (N, 12), (2498, 9), (1156 * 64, 3)]:
        table = jnp.asarray(rs.normal(size=(M, C)), jnp.float32)
        idx = jnp.asarray(rs.randint(0, M, size=N), jnp.int32)

        @jax.jit
        def take(t, i):
            return jnp.take(t, i, axis=0)

        print(f"take {N} rows from ({M},{C}): {timeit(take, table, idx):8.2f} ms",
              flush=True)

    # --- coherent gather (small offsets, like reprojection) ---
    table = jnp.asarray(rs.normal(size=(N, 12)), jnp.float32)
    base = jnp.arange(N, dtype=jnp.int32)
    idx_local = jnp.clip(base + jnp.asarray(rs.randint(-3, 3, size=N), jnp.int32), 0, N - 1)

    @jax.jit
    def take2(t, i):
        return jnp.take(t, i, axis=0)

    print(f"coherent take (+-3): {timeit(take2, table, idx_local):8.2f} ms", flush=True)

    # --- box filter 17x17 ---
    img = jnp.asarray(rs.normal(size=(H, W)), jnp.float32)

    @jax.jit
    def box(x):
        from hybrid_rendering_tpu.ops.filters import box_filter_sum
        return box_filter_sum(x, 8)

    print(f"box 17x17 @1080p: {timeit(box, img):8.2f} ms", flush=True)

    # --- atrous iteration ---
    nrm = jnp.asarray(rs.normal(size=(H, W, 3)), jnp.float32)
    depth = jnp.abs(jnp.asarray(rs.normal(size=(H, W)), jnp.float32))

    @jax.jit
    def atrous(c, v, n_, d):
        from hybrid_rendering_tpu.ops.filters import atrous_iteration
        return atrous_iteration(c, v, n_, d, step=2)

    print(f"atrous iter @1080p: {timeit(atrous, img, jnp.abs(img), nrm, depth):8.2f} ms",
          flush=True)

    # --- fetch_surface (scene as arg) ---
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.scene.fetch import fetch_surface
    from hybrid_rendering_tpu.types import Hit

    scene, light, camkw = load_scene("shadows_test", use_bvh=False)
    o = jnp.asarray(rs.uniform(-10, 10, size=(N, 3)), jnp.float32)
    d = jnp.asarray(rs.normal(size=(N, 3)), jnp.float32)
    hit = Hit(
        t=jnp.abs(jnp.asarray(rs.normal(size=N), jnp.float32)),
        tri_id=jnp.asarray(rs.randint(0, 2498, size=N), jnp.int32),
        u=jnp.zeros(N), v=jnp.zeros(N),
    )

    @jax.jit
    def fetch(sc, oo, dd, h):
        return fetch_surface(sc, oo, dd, h)

    print(f"fetch_surface 2M rays: {timeit(fetch, scene, o, d, hit):8.2f} ms",
          flush=True)

    # --- flash trace 2M rays ---
    from hybrid_rendering_tpu.ops.pallas import flashtrace
    fs = flashtrace.make_flash_scene(scene.tri_pos)
    tm = jnp.full((N,), 1e5, jnp.float32)
    dd = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    print(f"flash closest 2M: {timeit(lambda: flashtrace.flash_closest_hit(fs, o, dd, tm), n=5):8.2f} ms",
          flush=True)
    print(f"flash anyhit 2M: {timeit(lambda: flashtrace.flash_visibility(fs, o, dd, tm), n=5):8.2f} ms",
          flush=True)

    # --- reprojection (gbuffers as args) ---
    from hybrid_rendering_tpu.models.gbuffer import render_gbuffer
    from hybrid_rendering_tpu.ops.reprojection import reproject
    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.utils import camera as cam_utils

    closest, vis = bvh_mod.make_tracers(scene)
    cam = cam_utils.make_camera(width=W, height=H, **camkw)

    @jax.jit
    def gbuf(c):
        return render_gbuffer(scene, closest, c, W, H)

    print(f"render_gbuffer @1080p: {timeit(gbuf, cam, n=5):8.2f} ms", flush=True)
    gb = gbuf(cam)

    hist = jnp.zeros((H, W))
    mom = jnp.zeros((H, W, 2))
    hlen = jnp.zeros((H, W))

    @jax.jit
    def rep(g, pg, h, m, l):
        return reproject(g, pg, h, history_moments=m, history_length=l)

    print(f"reproject @1080p: {timeit(rep, gb, gb, hist, mom, hlen, n=5):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
