"""A/B the DDGI probe-update pass on TPU: naive probe-major ray layout vs
coherent (probe tile x direction cone) packets (VERDICT r3 item: the probe
update is the most incoherent trace in the frame)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax, jax.numpy as jnp

from hybrid_rendering_tpu.scene.scenes import load_scene
from hybrid_rendering_tpu.config import DDGIConfig
from hybrid_rendering_tpu.models import ddgi as ddgi_mod
from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.ops.sky import ProceduralSky

def run(scene_name="shadows_test", rays=128):
    from hybrid_rendering_tpu.scene import presets
    scene, light, camkw = load_scene(scene_name)
    pd = presets.PRESETS[scene_name].ddgi_probe_distance if scene_name in getattr(presets, "PRESETS", {}) else 4.0
    closest = bvh_mod.make_surface_tracer(scene)
    vis = bvh_mod.make_tracers(scene)[1]
    cfg = DDGIConfig(rays_per_probe=rays, probe_distance=pd)
    lo = np.asarray(scene.tri_pos.reshape(-1,3).min(0))
    hi = np.asarray(scene.tri_pos.reshape(-1,3).max(0))
    grid = ddgi_mod.make_probe_grid(lo, hi, cfg)
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    print(f"{scene_name}: probes={grid.num_probes} rays={rays}", flush=True)
    for coherent in (False, True):
        ddgi_mod.COHERENT_RAYS = coherent
        state = ddgi_mod.DDGIState.create(grid.num_probes, cfg)
        sampler = ddgi_mod.make_irradiance_sampler(grid, cfg)
        step = jax.jit(lambda st, i: ddgi_mod.ddgi_update(
            scene, closest, vis, grid, st, light, sky.radiance, i, cfg,
            sampler=sampler))
        t0 = time.perf_counter()
        state = step(state, 0)
        jax.block_until_ready(state.irradiance)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 10
        for i in range(1, iters+1):
            state = step(state, i)
        jax.block_until_ready(state.irradiance)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"  coherent={coherent}: {ms:8.2f} ms/update (compile {compile_s:.0f}s) irr_mean={float(np.asarray(state.irradiance).mean()):.4f}", flush=True)

if __name__ == "__main__":
    for s in sys.argv[1:] or ["shadows_test"]:
        run(s)
