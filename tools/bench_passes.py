"""Per-pass timing on the real device — the optimization dashboard.

Times each render pass as an independently-jitted function with realistic
inputs (produced by one full frame), plus the raw trace kernels, so perf
work can be localized (VERDICT round 1: per-pass breakdown required).

Usage: python tools/bench_passes.py [--scene shadows_test] [--width 1920]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=5, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="shadows_test")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:  # compiles dominate; cache across runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models import (
        ao as ao_mod, ddgi as ddgi_mod, deferred as deferred_mod,
        gbuffer as gbuffer_mod, reflections as refl_mod,
        shadows as shadows_mod, taa as taa_mod, tonemap as tonemap_mod,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops import filters as filters_mod
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.scenes import load_scene

    W, H = args.width, args.height
    scene, light, camkw = load_scene(args.scene)
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    cfg = RendererConfig(
        width=W, height=H,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(probe_distance=4.0, rays_per_probe=256,
                        scale=RayTraceScale.HALF),
        taa=TAAConfig(enabled=True),
    )
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    state = r.create_state()
    cam = jax.device_put(r.make_camera(camkw["eye"], camkw["target"], 0))
    light = jax.device_put(light)

    # one real frame for realistic pass inputs / temporal state
    step = jax.jit(r.render_frame)
    t0 = time.perf_counter()
    outputs, state = jax.block_until_ready(step(state, cam, light))
    compile_s = time.perf_counter() - t0
    frame_ms = timeit(step, state, cam, light, iters=args.iters)

    results = {"frame_total": frame_ms}
    print(f"frame_total: {frame_ms:.1f} ms", flush=True)
    fi = state.frame_index

    # --- G-buffer ---
    gb_fn = jax.jit(lambda c: gbuffer_mod.render_gbuffer(
        scene, r.closest_surface_fn, c, W, H))
    gb = gb_fn(cam)
    results["gbuffer"] = timeit(gb_fn, cam, iters=args.iters)
    print(f"gbuffer: {results['gbuffer']:.1f} ms", flush=True)

    ds = jax.jit(lambda g, s: gbuffer_mod.downsample_gbuffer(g, s),
                 static_argnums=1)
    gb_h = ds(gb, 1)
    prev_gb_h = ds(state.prev_gbuffer, 1)

    # --- shadows (full res) ---
    sh_fn = jax.jit(lambda g, pg, st: shadows_mod.shadows_pass(
        r.visibility_fn, g, pg, g, light, st, fi, cfg.shadows))
    results["shadows"] = timeit(sh_fn, gb, state.prev_gbuffer, state.shadows,
                                iters=args.iters)
    print(f"shadows: {results['shadows']:.1f} ms", flush=True)

    # --- AO (half res) ---
    ao_fn = jax.jit(lambda g, pg, st: ao_mod.ao_pass(
        r.visibility_fn, g, pg, gb, st, fi, cfg.ao))
    results["ao"] = timeit(ao_fn, gb_h, prev_gb_h, state.ao, iters=args.iters)
    print(f"ao: {results['ao']:.1f} ms", flush=True)

    # --- DDGI update + screen sample ---
    dd_fn = jax.jit(lambda st: ddgi_mod.ddgi_update(
        scene, r.closest_surface_fn, r.visibility_fn, r.probe_grid, st,
        light, r.sky_radiance_fn, fi, cfg.ddgi, sampler=r.gi_sampler))
    results["ddgi_update"] = timeit(dd_fn, state.ddgi, iters=args.iters)
    print(f"ddgi_update: {results['ddgi_update']:.1f} ms", flush=True)

    gs_fn = jax.jit(lambda st, g: ddgi_mod.sample_probe_grid_screen(
        r.probe_grid, st, cfg.ddgi, g, cam.position, sampler=r.gi_sampler))
    results["ddgi_sample_screen"] = timeit(gs_fn, state.ddgi, gb_h,
                                           iters=args.iters)
    print(f"ddgi_sample_screen: {results['ddgi_sample_screen']:.1f} ms", flush=True)

    # --- reflections (half res) ---
    def gi_sample_fn(p, n, wo, valid=None, _st=state.ddgi):
        return r.gi_sampler(_st, p, n, wo, valid=valid)

    rf_fn = jax.jit(lambda g, pg, st: refl_mod.reflections_pass(
        scene, r.closest_surface_fn, r.visibility_fn, g, pg, gb, cam,
        jnp.float32(0.0), light, r.sky_radiance_fn, st, fi, cfg.reflections,
        gi_sample_fn=gi_sample_fn, env_prefiltered_fn=pref_fn))
    results["reflections"] = timeit(rf_fn, gb_h, prev_gb_h,
                                    state.reflections, iters=args.iters)
    print(f"reflections: {results['reflections']:.1f} ms", flush=True)

    # --- deferred / TAA / tonemap ---
    shadow_vis = sh_fn(gb, state.prev_gbuffer, state.shadows)[0].final
    ao_plane = ao_fn(gb_h, prev_gb_h, state.ao)[0].final
    refl_plane = rf_fn(gb_h, prev_gb_h, state.reflections)[0].final
    gi_low = gs_fn(state.ddgi, gb_h)
    up_fn = jax.jit(lambda lo, g, gl: filters_mod.upsample_edge_aware(
        lo, gl.normal, gl.linear_z, g.normal, g.linear_z, 1))
    gi_screen = up_fn(gi_low, gb, gb_h)
    results["ddgi_upsample"] = timeit(up_fn, gi_low, gb, gb_h,
                                      iters=args.iters)
    print(f"ddgi_upsample: {results['ddgi_upsample']:.1f} ms", flush=True)

    df_fn = jax.jit(lambda g, sv, aop, rp, gis: deferred_mod.deferred_shading(
        g, cam, light, r.sky_radiance_fn, W, H, shadow_visibility=sv,
        ao=aop, reflections=rp, gi_irradiance=gis,
        env_irradiance_fn=irr_fn, env_prefiltered_fn=pref_fn,
        cfg=cfg.deferred))
    hdr = df_fn(gb, shadow_vis, ao_plane, refl_plane, gi_screen)
    results["deferred"] = timeit(df_fn, gb, shadow_vis, ao_plane, refl_plane,
                                 gi_screen, iters=args.iters)
    print(f"deferred: {results['deferred']:.1f} ms", flush=True)

    taa_fn = jax.jit(lambda h, g, st: taa_mod.taa_resolve(h, g, st, cfg.taa))
    results["taa"] = timeit(taa_fn, hdr, gb, state.taa, iters=args.iters)
    print(f"taa: {results['taa']:.1f} ms", flush=True)

    tm_fn = jax.jit(lambda h: tonemap_mod.tonemap(h, cfg.tonemap))
    results["tonemap"] = timeit(tm_fn, hdr, iters=args.iters)
    print(f"tonemap: {results['tonemap']:.1f} ms", flush=True)

    # --- raw trace kernels ---
    o = jnp.broadcast_to(cam.position, (H * W, 3))
    d = jnp.tile(jnp.asarray([[0.0, -0.3, -1.0]]), (H * W, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    vis_flat = jax.jit(lambda oo, dd: r.visibility_fn(oo, dd, 1e4))
    results["trace_visibility_2M"] = timeit(vis_flat, o, d, iters=args.iters)
    print(f"trace_visibility_2M: {results['trace_visibility_2M']:.1f} ms", flush=True)
    cs_flat = jax.jit(lambda oo, dd: r.closest_surface_fn(oo, dd, 1e4))
    results["trace_closest_surface_2M"] = timeit(cs_flat, o, d,
                                                 iters=args.iters)
    print(f"trace_closest_surface_2M: {results['trace_closest_surface_2M']:.1f} ms", flush=True)

    known = sum(v for k, v in results.items()
                if k not in ("frame_total", "trace_visibility_2M",
                             "trace_closest_surface_2M"))
    results["sum_of_passes"] = known
    results["compile_s"] = compile_s
    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
