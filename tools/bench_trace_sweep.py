"""FlashTrace v4 knob sweep in ONE process (one axon handshake).

Times closest_attrs + visibility + AO-style visibility on realistic
1080p ray loads across (GROUP, EARLY_EXIT, resident) combos by mutating
the module-level knobs between timings (they are read at call time;
each combo is a distinct jit static -> its own compile, but the
handshake and scene build are paid once).

Usage: python tools/bench_trace_sweep.py [scene] [combo ...]
  combo format: g<GROUP>_e<0|1>_r<0|1>   e.g. g8_e1_r1 g1_e0_r1
  default combos: g1_e0_r0 (v3 baseline-ish), g8_e0_r1, g8_e1_r1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SYNC_JIT = None


def _sync(out):
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
    from hybrid_rendering_tpu.ops import brdf as brdf_ops
    from hybrid_rendering_tpu.ops import bluenoise
    from hybrid_rendering_tpu.ops.pallas import flashtrace as ft
    from hybrid_rendering_tpu.scene.scenes import load_scene
    from hybrid_rendering_tpu.utils import camera as camera_utils

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "shadows_test"
    combos = sys.argv[2:] or ["g1_e0_r0", "g8_e0_r1", "g8_e1_r1"]

    scene, light, camkw = load_scene(scene_name)
    W, H = 1920, 1080
    cam = camera_utils.make_camera(
        eye=camkw["eye"], target=camkw["target"], width=W, height=H)
    fs = ft.make_flash_scene(scene.tri_pos, scene.tri_normal, scene.tri_uv,
                             scene.tri_mat, scene.tri_mesh_id)
    print(f"tris={fs.num_tris} tiles={fs.num_tri_tiles}", flush=True)

    o_img, d_img = camera_utils.camera_rays(cam, W, H)
    b = bvh_mod._pick_block(H, W)
    o = bvh_mod._block_linearize(o_img, H, W, b)
    d = bvh_mod._block_linearize(d_img, H, W, b)
    tm = jnp.full((H * W,), 1e4, jnp.float32)

    # shadow + AO ray loads from the primary hits (one warmup trace)
    hit, attrs = jax.jit(lambda oo, dd, t: ft.flash_closest_hit_attrs_sparse(
        fs, oo, dd, t))(o, d, tm)
    hitp = o + d * hit.t[:, None]
    ldir = jnp.broadcast_to(-jnp.asarray(light.direction)[None, :],
                            hitp.shape)
    so = hitp + 1e-2 * ldir
    stm = jnp.where(hit.tri_id >= 0, 1e4, 0.0)
    n_img = jnp.where((hit.tri_id >= 0)[:, None], attrs[:, 0:3],
                      jnp.zeros((1, 3)))
    nn = n_img / jnp.maximum(
        jnp.linalg.norm(n_img, axis=-1, keepdims=True), 1e-6)
    u, v = bluenoise.sample2d_grid(H, W, 0, dim=1)
    u = bvh_mod._block_linearize(u, H, W, b)
    v = bvh_mod._block_linearize(v, H, W, b)
    wi = brdf_ops.sample_cosine_lobe(nn, jnp.stack([u, v], -1))
    ao_o = hitp + nn * 0.3
    ao_tm = jnp.where(hit.tri_id >= 0, 7.0, 0.0)

    # --- stage decomposition on the shadow load: where does a
    # visibility call's time actually go? ---
    if os.environ.get("SWEEP_STAGES", "1") == "1":
        def pack_fn(oo, dd):
            z1 = jnp.zeros_like(oo[:, :1])
            return jnp.concatenate([oo - fs.center, z1, dd, z1], axis=-1)
        pfn = jax.jit(pack_fn)
        ms = timeit(pfn, so, ldir)
        print(f"[stage] ray pack (R,8)     : {ms:7.1f} ms", flush=True)

        K = min(fs.num_tri_tiles, ft.MAX_CLUSTERS)

        def prepass_fn(oo, dd, t):
            order, raw, ent = ft.packet_cluster_order(fs, oo, dd, t)
            order, ent = ft._pad_ranking(order, ent, K)
            return ft._round_lists(order, ent, raw, 0, K)
        ofn = jax.jit(prepass_fn)
        ms = timeit(ofn, so, ldir, stm)
        print(f"[stage] order+lists        : {ms:7.1f} ms", flush=True)

        ids0, entries0, counts0 = ofn(so, ldir, stm)
        rays_v = pfn(so, ldir)
        tmax_col = stm[:, None]

        def kernel_only(f_, t_, i_, c_, e_):
            # replicate the production chunk loop (CHUNK_P packets per
            # pallas_call) so launch count matches _flash_sparse_impl
            P = c_.shape[0]
            cp = min(ft.CHUNK_P, P)
            outs = []
            for p0 in range(0, P, cp):
                p1 = p0 + cp
                sl = slice(p0 * ft.RAY_TILE, p1 * ft.RAY_TILE)
                outs.append(ft._sparse_call(
                    fs, f_[sl], t_[sl], i_[p0 * K: p1 * K], c_[p0:p1],
                    e_[p0 * K: p1 * K], 1e-3, False, False, True, K, 1))
            return jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        kfn = jax.jit(kernel_only)
        ms = timeit(kfn, rays_v, tmax_col, ids0, counts0, entries0)
        print(f"[stage] vis kernel only    : {ms:7.1f} ms", flush=True)

    ref = {}
    for combo in combos:
        parts = {p[0]: p[1:] for p in combo.split("_")}
        ft.GROUP = int(parts["g"])
        # EARLY_EXIT / RESIDENT_LIMIT are read at call time
        ft.EARLY_EXIT = parts["e"] == "1"
        ft.RESIDENT_LIMIT = (8 << 20) if parts["r"] == "1" else 0
        label = (f"GROUP={ft.GROUP} early={int(ft.EARLY_EXIT)} "
                 f"resident={int(ft.RESIDENT_LIMIT > 0)}")
        for name, fn, args in [
            ("closest_attrs", lambda oo, dd, t:
                ft.flash_closest_hit_attrs_sparse(fs, oo, dd, t),
             (o, d, tm)),
            ("vis_shadow   ", lambda oo, dd, t:
                ft.flash_visibility_sparse(fs, oo, dd, t), (so, ldir, stm)),
            ("vis_ao      ", lambda oo, dd, t:
                ft.flash_visibility_sparse(fs, oo, dd, t),
             (ao_o, wi, ao_tm)),
        ]:
            jfn = jax.jit(fn)
            ms = timeit(jfn, *args)
            out = jfn(*args)
            key = name.strip()
            if key not in ref:
                ref[key] = jax.tree_util.tree_map(np.asarray, out)
                agree = ""
            else:
                a = ref[key]
                bb = jax.tree_util.tree_map(np.asarray, out)
                la = jax.tree_util.tree_leaves(a)
                lb = jax.tree_util.tree_leaves(bb)
                mism = max(float(np.mean(x != y)) for x, y in zip(la, lb))
                agree = f"  mismatch={mism:.2e}"
            print(f"[{label}] {name}: {ms:7.1f} ms "
                  f"({H*W/ms/1e3:7.1f} Mrays/s){agree}", flush=True)


if __name__ == "__main__":
    main()
