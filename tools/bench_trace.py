"""Micro-benchmark: FlashTrace v1 (dense) vs v2 (sparse cluster lists)
on realistic ray loads — camera primary rays and shadow rays at 1080p,
block-linearized into coherent 256-ray packets."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


_SYNC_JIT = None


def _sync(out):
    """block_until_ready is a NO-OP on the remote tunnel; drain through a
    4-byte scalar fetch. The reduction jit is cached at module level — a
    fresh lambda per call meant a ~470 ms remote recompile inside every
    timing (see bench.py _sync, r4)."""
    global _SYNC_JIT
    import jax
    import jax.numpy as jnp

    if _SYNC_JIT is None:
        _SYNC_JIT = jax.jit(
            lambda v: jnp.sum(v.ravel()[:1].astype(jnp.float32)))
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(np.asarray(_SYNC_JIT(leaves[-1])))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_rendering_tpu.ops import bvh as bvh_mod
    from hybrid_rendering_tpu.ops.pallas import flashtrace as ft
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.utils import camera as camera_utils

    scene, light, camkw = load_scene(
        sys.argv[1] if len(sys.argv) > 1 else "shadows_test")
    W, H = 1920, 1080
    cam = camera_utils.make_camera(
        eye=camkw["eye"], target=camkw["target"], width=W, height=H)
    fs = ft.make_flash_scene(scene.tri_pos, scene.tri_normal, scene.tri_uv,
                             scene.tri_mat, scene.tri_mesh_id)
    print(f"tris={fs.num_tris} tiles={fs.num_tri_tiles} "
          f"tile={ft.TRI_TILE}", flush=True)

    # camera rays, block-linearized into coherent packets
    o_img, d_img = camera_utils.camera_rays(cam, W, H)
    b = bvh_mod._pick_block(H, W)
    o = bvh_mod._block_linearize(o_img, H, W, b)
    d = bvh_mod._block_linearize(d_img, H, W, b)
    tm = jnp.full((H * W,), 1e4, jnp.float32)

    ids, counts, raw = jax.jit(
        lambda oo, dd, t: ft.packet_cluster_lists(fs, oo, dd, t))(o, d, tm)
    c = np.asarray(raw)
    print(f"primary packets: clusters/packet mean={c.mean():.2f} "
          f"max={c.max()} of {fs.num_tri_tiles}", flush=True)

    skip_v1 = os.environ.get("BT_SKIP_V1", "0") == "1"
    for name, fn in [
        ("closest_attrs v1", lambda oo, dd, t: ft.flash_closest_hit_attrs(
            fs, oo, dd, t)),
        ("closest_attrs v2", lambda oo, dd, t:
            ft.flash_closest_hit_attrs_sparse(fs, oo, dd, t)),
    ]:
        if skip_v1 and "v1" in name:
            continue
        ms = timeit(jax.jit(fn), o, d, tm)
        print(f"{name}: {ms:.1f} ms  ({H*W/ms/1e3:.1f} Mrays/s)", flush=True)

    # shadow rays from primary hit points toward the light
    hit, attrs = jax.jit(lambda oo, dd, t: ft.flash_closest_hit_attrs_sparse(
        fs, oo, dd, t))(o, d, tm)
    hitp = o + d * hit.t[:, None]
    ldir = -jnp.asarray(light.direction)[None, :]
    ldir = jnp.broadcast_to(ldir, hitp.shape)
    so = hitp + 1e-2 * ldir
    stm = jnp.where(hit.tri_id >= 0, 1e4, 0.0)

    ids, counts, raw = jax.jit(
        lambda oo, dd, t: ft.packet_cluster_lists(fs, oo, dd, t))(so, ldir, stm)
    c = np.asarray(raw)
    print(f"shadow packets: clusters/packet mean={c.mean():.2f} max={c.max()}",
          flush=True)
    for name, fn in [
        ("visibility v1", lambda oo, dd, t: ft.flash_visibility(
            fs, oo, dd, t)),
        ("visibility v2", lambda oo, dd, t: ft.flash_visibility_sparse(
            fs, oo, dd, t)),
    ]:
        if skip_v1 and "v1" in name:
            continue
        ms = timeit(jax.jit(fn), so, ldir, stm)
        print(f"{name}: {ms:.1f} ms  ({H*W/ms/1e3:.1f} Mrays/s)", flush=True)

    # AO-style rays: cosine hemisphere at primary hits (the most
    # incoherent screen trace). The 8x8-block shared-sample variant was
    # measured 100x SLOWER (14.4 s, r4) and the config knob was deleted;
    # kept here as the negative-result record.
    from hybrid_rendering_tpu.ops import brdf as brdf_ops
    from hybrid_rendering_tpu.ops import bluenoise

    n_img = jnp.where(
        (hit.tri_id >= 0)[:, None], attrs[:, 0:3], jnp.zeros((1, 3)))
    nn = n_img / jnp.maximum(
        jnp.linalg.norm(n_img, axis=-1, keepdims=True), 1e-6)
    for gran, label in (((1, "per-pixel"),) if skip_v1
                        else ((1, "per-pixel"), (8, "8x8-block"))):
        hh, ww = H // gran, W // gran
        u, v = bluenoise.sample2d_grid(hh, ww, 0, dim=1)
        u = jnp.repeat(jnp.repeat(u, gran, 0), gran, 1).reshape(-1)
        v = jnp.repeat(jnp.repeat(v, gran, 0), gran, 1).reshape(-1)
        u = bvh_mod._block_linearize(u.reshape(H, W), H, W, b)
        v = bvh_mod._block_linearize(v.reshape(H, W), H, W, b)
        wi = brdf_ops.sample_cosine_lobe(nn, jnp.stack([u, v], -1))
        ao_o = hitp + nn * 0.3
        ao_tm = jnp.where(hit.tri_id >= 0, 7.0, 0.0)
        ids, counts, raw = jax.jit(
            lambda oo, dd, t: ft.packet_cluster_lists(fs, oo, dd, t))(
                ao_o, wi, ao_tm)
        c = np.asarray(raw)
        ms = timeit(jax.jit(lambda oo, dd, t: ft.flash_visibility_sparse(
            fs, oo, dd, t)), ao_o, wi, ao_tm)
        print(f"AO vis ({label}): {ms:.1f} ms ({H*W/ms/1e3:.1f} Mrays/s) "
              f"clusters/packet mean={c.mean():.2f} max={c.max()}",
              flush=True)

    # correctness spot-check v1 vs v2 on device
    if skip_v1:
        return
    h1 = jax.jit(lambda oo, dd, t: ft.flash_closest_hit(fs, oo, dd, t))(
        o, d, tm)
    same = (np.asarray(h1.tri_id) == np.asarray(hit.tri_id)).mean()
    dt = np.abs(np.asarray(h1.t) - np.asarray(hit.t))
    sel = np.asarray(h1.tri_id) >= 0
    print(f"v1 vs v2 on TPU: tri agree={same:.4f} "
          f"max|dt|={dt[sel].max():.2e}")


if __name__ == "__main__":
    main()
