"""Isolated per-pass timing — the reference GPU profiler's per-pass view.

The reference reads per-pass GPU timestamps each frame (dw::profiler scopes
around each pass, main.cpp:79-108). XLA fuses the whole frame into one
program, so per-pass cost is recovered by jitting each pass FUNCTION in
isolation on real frame inputs and timing it with a pipeline-draining
scalar fetch.

Used by bench.py's `passes_ms` detail section: unlike the old
cumulative-variant scheme (4 extra full-frame compiles, 100+ s each — the
reason rounds 2–3 never landed a per-pass artifact), each isolated pass
reuses the already-compiled Mosaic payloads (shape-quantized trace calls +
stencils hit the in-process cache), so only thin XLA graphs compile here.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from hybrid_rendering_tpu.models import (
    ao as ao_mod,
    ddgi as ddgi_mod,
    deferred as deferred_mod,
    gbuffer as gbuffer_mod,
    reflections as reflections_mod,
    shadows as shadows_mod,
    taa as taa_mod,
    tonemap as tonemap_mod,
)
from hybrid_rendering_tpu.ops import filters as filters_mod


_SYNC_JIT = None


def _default_sync(x) -> float:
    # cached reduction jit: a fresh lambda per call would recompile on
    # the remote tunnel (~470 ms) inside every timing (bench.py _sync, r4)
    global _SYNC_JIT
    if _SYNC_JIT is None:
        _SYNC_JIT = jax.jit(
            lambda v: jnp.sum(v.ravel()[:1].astype(jnp.float32)))
    leaves = [v for v in jax.tree_util.tree_leaves(x) if hasattr(v, "dtype")]
    if not leaves:
        return 0.0
    return float(_SYNC_JIT(leaves[-1]).block_until_ready())


def time_passes(r, state, camera, light, sync: Callable = _default_sync,
                iters: int = 5, budget_left: Callable = lambda: True,
                ) -> Dict[str, float]:
    """Time each enabled pass in isolation on real frame inputs.

    r: HybridRenderer; state: a RenderState that has already advanced a
    few frames (so temporal inputs are warm); sync: drains the device
    pipeline and returns after the value is on host (pass bench.py's
    _sync on the remote tunnel). Returns {pass_name: ms}. Stops early
    (partial dict) when budget_left() goes False.
    """
    cfg = r.config
    W, H = cfg.width, cfg.height
    out: Dict[str, float] = {}

    def bench(name, fn, *args):
        if not budget_left():
            out["skipped"] = f"budget at {name}"
            raise TimeoutError
        jfn = jax.jit(fn)
        res = jfn(*args)
        sync(res)
        t0 = time.perf_counter()
        for _ in range(iters):
            res = jfn(*args)
        sync(res)
        out[name] = round((time.perf_counter() - t0) / iters * 1e3, 2)
        return res

    fi = state.frame_index

    try:
        gb = bench(
            "gbuffer",
            lambda cam: gbuffer_mod.render_gbuffer(
                r.scene, r.closest_surface_fn, cam, W, H),
            camera)

        shadow_vis = None
        if cfg.shadows.enabled:
            s = int(cfg.shadows.scale)
            sh_out, _ = bench(
                "shadows",
                lambda gb_, pgb_, st_, fi_: shadows_mod.shadows_pass(
                    r.visibility_fn,
                    gbuffer_mod.downsample_gbuffer(gb_, s),
                    gbuffer_mod.downsample_gbuffer(pgb_, s),
                    gb_, light, st_, fi_, cfg.shadows),
                gb, state.prev_gbuffer, state.shadows, fi)
            shadow_vis = sh_out.final

        ao_plane = None
        if cfg.ao.enabled:
            s = int(cfg.ao.scale)
            ao_out, _ = bench(
                "ao",
                lambda gb_, pgb_, st_, fi_: ao_mod.ao_pass(
                    r.visibility_fn,
                    gbuffer_mod.downsample_gbuffer(gb_, s),
                    gbuffer_mod.downsample_gbuffer(pgb_, s),
                    gb_, st_, fi_, cfg.ao),
                gb, state.prev_gbuffer, state.ao, fi)
            ao_plane = ao_out.final

        gi_screen = None
        gi_sample_fn = None
        ddgi_state = state.ddgi
        if cfg.ddgi.enabled:
            ddgi_state = bench(
                "ddgi_update",
                lambda st_, fi_: ddgi_mod.ddgi_update(
                    r.scene, r.closest_surface_fn, r.visibility_fn,
                    r.probe_grid, st_, light, r.sky_radiance_fn, fi_,
                    cfg.ddgi, sampler=r.gi_sampler),
                state.ddgi, fi)

            def gi_sample_fn(p, n, wo, valid=None, _st=ddgi_state):
                return r.gi_sampler(_st, p, n, wo, valid=valid)

            def _sample_screen(st_, gb_, cam_pos):
                gb_g = gbuffer_mod.downsample_gbuffer(gb_, int(cfg.ddgi.scale))
                gi_low = ddgi_mod.sample_probe_grid_screen(
                    r.probe_grid, st_, cfg.ddgi, gb_g, cam_pos,
                    sampler=r.gi_sampler)
                if cfg.ddgi.scale != 0:
                    return filters_mod.upsample_edge_aware(
                        gi_low, gb_g.normal, gb_g.linear_z,
                        gb_.normal, gb_.linear_z, int(cfg.ddgi.scale))
                return gi_low

            gi_screen = bench("ddgi_sample", _sample_screen,
                              ddgi_state, gb, camera.position)

        refl_plane = None
        if cfg.reflections.enabled:
            s = int(cfg.reflections.scale)

            def _refl(gb_, pgb_, st_, fi_, cam_):
                delta = jnp.linalg.norm(cam_.position - state.prev_cam_pos)
                return reflections_mod.reflections_pass(
                    r.scene, r.closest_surface_fn, r.visibility_fn,
                    gbuffer_mod.downsample_gbuffer(gb_, s),
                    gbuffer_mod.downsample_gbuffer(pgb_, s),
                    gb_, cam_, delta, light, r.sky_radiance_fn, st_, fi_,
                    cfg.reflections, gi_sample_fn=gi_sample_fn,
                    env_prefiltered_fn=r.env_prefiltered_fn)

            refl_out, _ = bench("reflections", _refl, gb,
                                state.prev_gbuffer, state.reflections, fi,
                                camera)
            refl_plane = refl_out.final

        hdr = bench(
            "deferred",
            lambda gb_, *planes: deferred_mod.deferred_shading(
                gb_, camera, light, r.sky_radiance_fn, W, H,
                shadow_visibility=planes[0], ao=planes[1],
                reflections=planes[2], gi_irradiance=planes[3],
                env_irradiance_fn=r.env_irradiance_fn,
                env_prefiltered_fn=r.env_prefiltered_fn,
                cfg=cfg.deferred),
            gb, shadow_vis, ao_plane, refl_plane, gi_screen)

        color = hdr
        if cfg.taa.enabled:
            color, _ = bench(
                "taa",
                lambda h_, gb_, st_: taa_mod.taa_resolve(h_, gb_, st_,
                                                         cfg.taa),
                hdr, gb, state.taa)

        bench("tonemap", lambda c_: tonemap_mod.tonemap(c_, cfg.tonemap),
              color)
    except TimeoutError:
        pass
    return out
