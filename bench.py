"""Benchmark driver — prints the headline JSON line IMMEDIATELY after the
north-star metric is measured, then (budget permitting) a second, richer
JSON line with the detail dashboard. The driver's timeout can kill this
process at any point after the first line without losing the round's
evidence; a watchdog thread additionally guarantees a clean rc=0 exit
inside BENCH_BUDGET_S even if a section hangs in a C call.

North-star metric (BASELINE.md): full hybrid pipeline (shadows + AO +
reflections + DDGI + TAA + tonemap) at 1920x1080 on one TPU chip, target
< 33 ms/frame. vs_baseline = 33 / measured_ms (>1 means faster than
target).

detail sections, cheapest-evidence-first (each guarded by budget), and
the CODE runs them in exactly this order (r4 ran passes_ms first and
starved fidelity for the 4th round — VERDICT r4 weak #2):
  - fidelity: pooled relative RMSE vs the GT path tracer on gi_test
  - golden: on-device LDR vs the committed golden image (catches
    Mosaic/bf16 numeric drift mechanically; gate 2%)
  - passes_ms: isolated per-pass timings (hard 120 s section cap)
  - hero_ms: the same pipeline on the hero scene (priciest compile)
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "golden", "gi_test_256.png")

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))

_t0 = time.perf_counter()
_print_lock = threading.Lock()
_result: dict = {}  # headline fields + detail, shared with the watchdog


def _elapsed() -> float:
    return time.perf_counter() - _t0


def _budget_left(reserve_s: float = 30.0) -> bool:
    """True if at least reserve_s of wall budget remains."""
    return _elapsed() < (BUDGET_S - reserve_s)


def _emit(result: dict) -> None:
    with _print_lock:
        print(json.dumps(result), flush=True)


def _watchdog() -> None:
    """Hard exit at BUDGET_S: re-print the best result so far and leave
    rc=0. Runs in a daemon thread so a hang inside block_until_ready or
    a remote compile cannot consume the driver's whole timeout."""
    deadline = BUDGET_S - _elapsed()
    if deadline > 0:
        time.sleep(deadline)
    if _result.get("value") is not None:
        _result.setdefault("detail", {})["watchdog"] = "budget exhausted"
        _emit(_result)
    os._exit(0)


def _build(scene_name, W, H, *, sh=True, ao=True, rf=True, gi=True,
           taa=True, debug=False):
    import dataclasses

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.presets import apply_preset

    base = RendererConfig(
        width=W, height=H, debug_outputs=debug,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL, enabled=sh),
        ao=AOConfig(scale=RayTraceScale.HALF, enabled=ao),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF, enabled=rf),
        ddgi=DDGIConfig(enabled=gi),  # rays/scale from the scene preset
        taa=TAAConfig(enabled=taa),
    )
    scene, light, camkw, cfg, _ = apply_preset(scene_name, base)
    cfg = cfg.replace(
        shadows=dataclasses.replace(cfg.shadows, enabled=sh),
        ao=dataclasses.replace(cfg.ao, enabled=ao),
        reflections=dataclasses.replace(cfg.reflections, enabled=rf),
        ddgi=dataclasses.replace(cfg.ddgi, enabled=gi),
        taa=dataclasses.replace(cfg.taa, enabled=taa),
    )
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    return r, light, camkw


_SYNC_JIT = None


def _sync(x) -> float:
    """Force completion of x's dependency chain and return a scalar.

    block_until_ready() is a NO-OP on the remote-TPU tunnel platform
    (measured round 4: 10 dispatched frames "completed" in 0.3 ms), so
    every timing must drain the queue through an actual value fetch. A
    jitted scalar reduction keeps the host transfer to 4 bytes.

    The reduction jit MUST be cached at module level: a fresh lambda per
    call is a new jax cache entry, i.e. a full remote recompile (~470 ms
    measured r4) silently folded into every timing — at iters=5 that
    inflated every per-iter number by ~94 ms and the r4 headline by
    ~47 ms/frame. Sums the first element of ONE leaf: completion of any
    output of the final dispatch implies the whole chain drained
    (XLA program order). SINGLE-DEVICE assumption: one in-order stream —
    a one-leaf fetch does NOT drain other devices' queues, so this must
    not be reused for the multi-chip path (parallel/, MULTICHIP)."""
    import jax
    import jax.numpy as jnp

    global _SYNC_JIT
    if _SYNC_JIT is None:
        _SYNC_JIT = jax.jit(lambda v: jnp.sum(v.ravel()[:1]
                                              .astype(jnp.float32)))
    leaves = [v for v in jax.tree_util.tree_leaves(x)
              if hasattr(v, "dtype")]
    if not leaves:
        return 0.0
    return float(np.asarray(_SYNC_JIT(leaves[-1])))


def _time_frames(r, light, camkw, iters=20, keep_state=False):
    import jax

    step = jax.jit(r.render_frame, donate_argnums=(0,))
    state = r.create_state()
    cam = jax.device_put(r.make_camera(camkw["eye"], camkw["target"], 0))
    light = jax.device_put(light)
    t0 = time.perf_counter()
    outputs, state = step(state, cam, light)
    _sync(outputs["ldr"])
    compile_s = time.perf_counter() - t0
    # true throughput: frames chain through the donated state, one
    # scalar fetch at the end drains the pipeline
    t0 = time.perf_counter()
    for _ in range(iters):
        outputs, state = step(state, cam, light)
    _sync(outputs["ldr"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    if keep_state:
        # donation consumed the old buffers; `state` is the live post-run
        # pytree (warm temporal history) for the per-pass harness
        return ms, compile_s, outputs, state, cam, light
    return ms, compile_s, outputs


def _wait_for_device() -> None:
    """The remote-TPU tunnel can be transiently down; probing it from a
    SUBPROCESS (a failed in-process backend init is cached by jax and
    poisons every later jax.devices() call) and retrying within budget
    turns "tunnel blip at bench time" from a lost round into a delay."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").lower() in ("cpu", ""):
        return  # local platform — nothing to wait for
    attempt = 0
    while True:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=max(60.0, BUDGET_S / 3))
        if probe.returncode == 0:
            return
        attempt += 1
        if not _budget_left(180.0):
            sys.stderr.write(
                f"device probe failed x{attempt}; proceeding anyway:\n"
                + probe.stderr.decode()[-500:] + "\n")
            return
        time.sleep(20)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    _wait_for_device()
    import jax

    try:  # compiles dominate bench wall time; cache across runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    # BENCH_RES=WxH shrinks the run for smoke-testing the bench itself
    # (e.g. BENCH_RES=128x128 JAX_PLATFORMS=cpu python bench.py)
    res = os.environ.get("BENCH_RES", "1920x1080")
    W, H = (int(v) for v in res.split("x"))
    detail = {"resolution": f"{W}x{H}", "target_ms": 33.0,
              "device": str(jax.devices()[0]), "budget_s": BUDGET_S}

    # --- north-star metric: full pipeline on shadows_test ---
    r, light, camkw = _build("shadows_test", W, H)
    ms, compile_s, _, live_state, live_cam, live_light = _time_frames(
        r, light, camkw, keep_state=True)
    detail.update(
        passes="gbuffer+shadows(F)+ao(H)+ddgi(128rpp,Q)+reflections(H)"
               "+deferred+taa+tonemap",
        probes=r.probe_grid.num_probes,
        triangles=int(r.scene.num_triangles),
        compile_s=round(compile_s, 1),
        scene="shadows_test (pillars)",
    )
    _result.update({
        "metric": "hybrid_pipeline_1080p",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(33.0 / ms, 3),
        "detail": detail,
    })
    _emit(_result)  # evidence is on the wire before any optional section

    # --- fidelity vs GT on gi_test (tracked per round, VERDICT r2 #4).
    # Cheapest-evidence-first: the 256^2 compile is a fraction of a 1080p
    # one, so this section runs IMMEDIATELY after the headline — r4 put
    # passes_ms first on the claim its isolated jits were cheap, and the
    # measurement falsified it (~340 s of fresh 1080p XLA compiles,
    # VERDICT r4 weak #2). Fidelity/golden land before anything else. ---
    ldr = None
    try:
        if not _budget_left(90.0):
            raise TimeoutError(f"budget ({_elapsed():.0f}s elapsed)")
        from hybrid_rendering_tpu.utils import image as img_utils
        from hybrid_rendering_tpu.utils.oracle import fidelity_report

        rg, lg, cg = _build("gi_test", 256, 256, taa=False, debug=True)
        cam = rg.make_camera(cg["eye"], cg["target"], 0)
        # the committed 96-spp oracle render makes this section cheap
        # (the GT render is ~5x the hybrid's cost); delete the file or
        # set BENCH_GT_REFRESH=1 to re-render + re-save it
        gt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "data", "golden", "gt_gi_test_256_96.png")
        gt_cached = None
        if os.path.exists(gt_path) and not os.environ.get("BENCH_GT_REFRESH"):
            gt_cached = img_utils.read_png(gt_path)
        rep = fidelity_report(rg, cam, lg, hybrid_frames=32, gt_spp=96,
                              gt_ldr=gt_cached)
        if gt_cached is None:
            os.makedirs(os.path.dirname(gt_path), exist_ok=True)
            img_utils.write_png(gt_path, rep["gt_ldr"])
        detail["fidelity"] = {
            "pooled_relative_rmse": round(rep["pooled_relative_rmse"], 4),
            "relative_rmse": round(rep["relative_rmse"], 4),
            "gate": 0.05,
        }
        ldr = rep["hybrid_ldr"]
    except Exception as e:  # noqa: BLE001
        detail["fidelity_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- golden-image drift check (TPU numerics regression harness) ---
    try:
        from hybrid_rendering_tpu.utils import image as img_utils

        if ldr is not None:
            if os.path.exists(GOLDEN_PATH):
                golden = img_utils.read_png(GOLDEN_PATH)
                drift = img_utils.relative_rmse(ldr, golden)
                detail["golden"] = {"relative_rmse": round(drift, 4),
                                    "ok": bool(drift <= 0.02)}
                if drift > 0.02:
                    print(f"GOLDEN DRIFT {drift:.4f} > 0.02 vs "
                          f"{GOLDEN_PATH}", file=sys.stderr)
            else:
                os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
                img_utils.write_png(GOLDEN_PATH, ldr)
                detail["golden"] = {"created": True}
    except Exception as e:  # noqa: BLE001
        detail["golden_error"] = f"{type(e).__name__}: {e}"[:200]
    _emit(_result)  # checkpoint: fidelity + golden on the wire

    # --- per-pass breakdown: isolated pass jits on the live renderer.
    # Runs AFTER fidelity/golden with a hard 120 s section cap: each
    # isolated jax.jit(pass) at 1080p is a fresh XLA compile on the
    # remote tunnel (~40-60 s measured r4), so this section can eat the
    # whole budget if unguarded (VERDICT r4 weak #2). ---
    try:
        from hybrid_rendering_tpu.utils.passbench import time_passes

        section_t0 = _elapsed()
        detail["passes_ms"] = time_passes(
            r, live_state, live_cam, live_light, sync=_sync, iters=10,
            budget_left=lambda: (_budget_left(90.0)
                                 and _elapsed() - section_t0 < 120.0))
        _emit(_result)  # checkpoint
    except Exception as e:  # noqa: BLE001
        detail["passes_ms_error"] = f"{type(e).__name__}: {e}"[:200]
    del r, live_state

    # --- hero scene at reference scale (VERDICT r2 #6, r3 #7): the most
    # expensive compile (fresh geometry at 1080p) runs LAST. sponza_scan:
    # ~250k topologically UNIQUE triangles (irregular Delaunay sheets +
    # per-seed scanified solids) — scan statistics, not instanced
    # repetition; no scanned asset can be fetched offline ---
    try:
        if not _budget_left(60.0):
            raise TimeoutError(f"budget ({_elapsed():.0f}s elapsed)")
        rh, lh, ch = _build("sponza_scan", W, H)
        hero_ms, hero_compile, _ = _time_frames(rh, lh, ch, iters=5)
        detail["hero_ms"] = round(hero_ms, 2)
        detail["hero_triangles"] = int(rh.scene.num_triangles)
        detail["hero_scene"] = "sponza_scan (unique scan-like topology)"
        del rh
    except Exception as e:  # noqa: BLE001 — keep the JSON line alive
        detail["hero_error"] = f"{type(e).__name__}: {e}"[:200]

    detail["bench_wall_s"] = round(_elapsed(), 1)
    _emit(_result)  # final line: same headline + the full detail


if __name__ == "__main__":
    main()
