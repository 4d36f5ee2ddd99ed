"""Count Mosaic (tpu_custom_call) kernel instances in the lowered frame.

Compile time on the remote-TPU tunnel is dominated by per-kernel Mosaic
compiles (PALLAS_AXON_REMOTE_COMPILE round-trips), so the number of
DISTINCT serialized kernel payloads ~ compile wall time. This lowers the
full frame for the TPU platform from the CPU backend (jax.export
cross-platform lowering — no device needed) and reports:

  - total tpu_custom_call sites
  - distinct payloads (identical payloads are compiled once, cached)

Usage: JAX_PLATFORMS=cpu python tools/count_kernels.py [WxH] [scene]
"""
from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402

# Force the TPU kernel path (interpret=False) even on the CPU backend:
# _is_tpu_backend is the single gate, and every model re-imports it from
# the module at call time, so patching the module attribute is enough.
from hybrid_rendering_tpu.ops import bvh as _bvh  # noqa: E402

_bvh._is_tpu_backend = lambda: True


def build(scene_name, W, H):
    import dataclasses  # noqa: F401

    from hybrid_rendering_tpu.config import (
        AOConfig, DDGIConfig, ReflectionsConfig, RendererConfig,
        ShadowsConfig, TAAConfig, RayTraceScale,
    )
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import ProceduralSky
    from hybrid_rendering_tpu.scene.presets import apply_preset

    base = RendererConfig(
        width=W, height=H,
        shadows=ShadowsConfig(scale=RayTraceScale.FULL),
        ao=AOConfig(scale=RayTraceScale.HALF),
        reflections=ReflectionsConfig(scale=RayTraceScale.HALF),
        ddgi=DDGIConfig(),
        taa=TAAConfig(),
    )
    scene, light, camkw, cfg, _ = apply_preset(scene_name, base)
    sky = ProceduralSky.create(sun_direction=np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    # tracer_method must be forced: "auto" picks bvh on cpu
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn,
                       tracer_method="flash")
    return r, light, camkw


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "shadows_test"
    W, H = (int(v) for v in res.split("x"))
    r, light, camkw = build(scene_name, W, H)
    state = r.create_state()
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)

    from jax import export

    exp = export.export(jax.jit(r.render_frame), platforms=["tpu"])(
        state, cam, light)
    txt = exp.mlir_module()

    # Each tpu_custom_call site carries its serialized Mosaic module;
    # dedupe by the whole op text (everything between the op and the end
    # of its attribute dict) — identical payloads compile once (cached).
    sites = [m.group(0) for m in re.finditer(
        r'@tpu_custom_call.*?(?=\n)', txt, re.S)]
    names = collections.Counter()
    per_name = collections.defaultdict(set)
    sigs = {}
    for s in sites:
        nm = re.search(r'kernel_name = "([^"]+)"', s)
        name = nm.group(1) if nm else "?"
        names[name] += 1
        # strip SSA value names so only the payload + shapes distinguish
        canon = re.sub(r"%\w+", "%", s)
        h = hash(canon)
        per_name[name].add(h)
        if h not in sigs:
            # shape signature: the op's result types (drop payload text)
            rt = re.search(r"->\s*(\([^)]*\)|[^ ]+)", s)
            sigs[h] = (name, rt.group(1)[:120] if rt else "?")
    print(f"scene={scene_name} res={W}x{H}")
    print(f"tpu_custom_call sites: {len(sites)}")
    print(f"distinct (name,payload,shape) kernels: "
          f"{sum(len(v) for v in per_name.values())}")
    for k in sorted(per_name, key=lambda k: -names[k]):
        print(f"  sites={names[k]:4d} distinct={len(per_name[k]):4d}  {k}")
    print("\ndistinct payload signatures:")
    for h, (name, sig) in sorted(sigs.items(), key=lambda kv: kv[1]):
        print(f"  {name:28s} -> {sig}")


if __name__ == "__main__":
    main()
