"""Per-pass compile-time + runtime attribution via cumulative variants.

Builds the pipeline on the CPU backend (eager scene/renderer construction
over the remote-TPU tunnel costs ~170 s in round-trips; CPU build is ~7 s),
then compiles + times each cumulative pass subset on the TPU. The deltas
between consecutive variants apportion both the XLA compile seconds and the
frame milliseconds to pass groups.

Usage: JAX_PLATFORMS=axon,cpu python tools/attrib_passes.py [WxH] [scene]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def build(scene_name, W, H, **kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    return bm._build(scene_name, W, H, **kw)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "shadows_test"
    W, H = (int(v) for v in res.split("x"))
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    variants = [
        ("gbuffer+deferred", dict(sh=False, ao=False, rf=False, gi=False,
                                  taa=False)),
        ("+shadows", dict(sh=True, ao=False, rf=False, gi=False, taa=False)),
        ("+ao", dict(sh=True, ao=True, rf=False, gi=False, taa=False)),
        ("+ddgi", dict(sh=True, ao=True, rf=False, gi=True, taa=False)),
        ("+reflections", dict(sh=True, ao=True, rf=True, gi=True,
                              taa=False)),
        ("+taa (full)", dict(sh=True, ao=True, rf=True, gi=True, taa=True)),
    ]
    rows = []
    prev_compile = prev_ms = 0.0
    for name, kw in variants:
        t0 = time.time()
        with jax.default_device(cpu):
            r, light, camkw = build(scene_name, W, H, **kw)
            state = r.create_state()
            cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        build_s = time.time() - t0
        state = jax.device_put(state, tpu)
        cam = jax.device_put(cam, tpu)
        light_d = jax.device_put(light, tpu)
        import jax.numpy as jnp

        def _sync(x):
            # block_until_ready is a NO-OP on the remote tunnel; drain the
            # pipeline through a 4-byte scalar fetch (see bench.py _sync)
            return float(np.asarray(jax.jit(jnp.sum)(x)))

        step = jax.jit(r.render_frame, donate_argnums=(0,))
        t0 = time.time()
        compiled = step.lower(state, cam, light_d).compile()
        compile_s = time.time() - t0
        outputs, state = compiled(state, cam, light_d)
        _sync(outputs["ldr"])
        t0 = time.time()
        for _ in range(10):
            outputs, state = compiled(state, cam, light_d)
        _sync(outputs["ldr"])
        ms = (time.time() - t0) / 10 * 1e3
        rows.append(dict(variant=name, build_s=round(build_s, 1),
                         compile_s=round(compile_s, 1),
                         ms=round(ms, 2),
                         d_compile_s=round(compile_s - prev_compile, 1),
                         d_ms=round(ms - prev_ms, 2)))
        prev_compile, prev_ms = compile_s, ms
        print(json.dumps(rows[-1]), flush=True)
        del r, compiled, state
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
