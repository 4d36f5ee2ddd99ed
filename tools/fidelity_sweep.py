"""Cached-GT fidelity A/B harness.

Renders (or loads) one ground-truth oracle image, then measures any
number of hybrid config variants against it — the workflow behind every
round-3 fidelity decision (probe clamp, AO calibration, grid layout,
bias). The GT render dominates the cost of a fidelity comparison, so
caching it makes each variant ~35 s instead of ~290 s.

Usage:
  python tools/fidelity_sweep.py [scene] [size] [spp] [variant ...]

Variants are dotted config overrides, comma-separated per variant:
  python tools/fidelity_sweep.py gi_test 256 96 \
      baseline shadows.bias=0.1 "ao.enabled=False,ddgi.normal_bias=0.25"
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE_DIR = "/tmp"


def apply_overrides(cfg, spec: str):
    """'shadows.bias=0.1,ao.enabled=False' -> new RendererConfig."""
    if spec == "baseline":
        return cfg
    for item in spec.split(","):
        path, _, raw = item.partition("=")
        section, _, field = path.partition(".")
        val = {"True": True, "False": False}.get(raw)
        if val is None:
            val = int(raw) if raw.lstrip("-").isdigit() else float(raw)
        sub = dataclasses.replace(getattr(cfg, section), **{field: val})
        cfg = cfg.replace(**{section: sub})
    return cfg


def pool4(img):
    h, w = img.shape[:2]
    return img[: h - h % 4, : w - w % 4].reshape(
        h // 4, 4, w // 4, 4, -1).mean(axis=(1, 3))


def main():
    args = sys.argv[1:]
    scene = args[0] if args else "gi_test"
    size = int(args[1]) if len(args) > 1 else 256
    spp = int(args[2]) if len(args) > 2 else 96
    variants = args[3:] or ["baseline"]

    import jax.numpy as jnp

    import bench
    from hybrid_rendering_tpu.config import ToneMapConfig
    from hybrid_rendering_tpu.models import tonemap as tm_mod
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.utils import image as img_utils
    from hybrid_rendering_tpu.utils.oracle import (
        render_ground_truth, render_hybrid_converged,
    )

    t0 = time.perf_counter()
    r0, light, camkw = bench._build(scene, size, size, taa=False, debug=True)
    cam = r0.make_camera(camkw["eye"], camkw["target"], 0)
    tm = ToneMapConfig()

    cache = os.path.join(CACHE_DIR, f"gt_{scene}_{size}_{spp}.npz")
    if os.path.exists(cache):
        gt_ldr = np.load(cache)["ldr"]
        print(f"gt cache hit {cache}", flush=True)
    else:
        gt = render_ground_truth(r0, cam, light, spp, max_bounces=4)
        gt_ldr = np.asarray(tm_mod.tonemap(gt, tm))
        np.savez(cache, ldr=gt_ldr)
        print(f"gt rendered + cached {time.perf_counter() - t0:.0f}s",
              flush=True)

    for spec in variants:
        cfg = apply_overrides(r0.config, spec)
        r = HybridRenderer(r0.scene, cfg, r0.sky_radiance_fn,
                           r0.env_irradiance_fn, r0.env_prefiltered_fn)
        out = render_hybrid_converged(r, cam, light, frames=32)
        h_ldr = np.asarray(
            tm_mod.tonemap(jnp.minimum(out["deferred"], 1.0), tm))
        prel = img_utils.relative_rmse(pool4(h_ldr), pool4(gt_ldr))
        rel = img_utils.relative_rmse(h_ldr, gt_ldr)
        print(f"{spec:44s} pooled_rel={prel:.4f} rel={rel:.4f} "
              f"h_mean={h_ldr.mean():.4f} g_mean={gt_ldr.mean():.4f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
