"""Sampler A/B: bn_r2 vs sobol_bn temporal convergence (VERDICT r3 #5).

The reference's sampler is Heitz-style sobol + scrambling/ranking
(src/shaders/bnd_sampler.glsl, blue_noise.cpp:5-19); our structural twin
(`HR_SAMPLER=sobol_bn`, ops/bluenoise.py) shipped opt-in in r3 pending an
on-device A/B. This runs it: for each sampler, render the hybrid pipeline
for 32 frames (the temporal history cap — what a user actually sees) and
for 256 frames (the pipeline's own converged fixed point), then report
per-effect RMSE(32f, 256f) on the raw effect planes. Lower = the temporal
accumulators converge faster under that sampler. Run via subprocesses
because HR_SAMPLER is bound at import.

Usage: python tools/sampler_ab.py [scene] [size]  (CPU ok at 256)
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CHILD = """
import json, os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
from hybrid_rendering_tpu.config import RendererConfig
from hybrid_rendering_tpu.models.renderer import HybridRenderer
from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
from hybrid_rendering_tpu.ops.sky import PreethamSky
from hybrid_rendering_tpu.scene.presets import apply_preset

size = %(size)d
base = RendererConfig(width=size, height=size, debug_outputs=True)
scene, light, camkw, cfg, _ = apply_preset(%(scene)r, base)
sky = PreethamSky.create(np.asarray(light.direction))
irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
cam = r.make_camera(camkw["eye"], camkw["target"], 0)
step = jax.jit(r.render_frame, donate_argnums=(0,))
state = r.create_state()
snap32 = None
for f in range(256):
    outputs, state = step(state, cam, light)
    if f == 31:
        snap32 = {k: np.asarray(v) for k, v in outputs.items()
                  if k in ("shadows", "ao", "reflections", "ddgi", "ldr")}
conv = {k: np.asarray(v) for k, v in outputs.items()
        if k in ("shadows", "ao", "reflections", "ddgi", "ldr")}
res = {}
for k in conv:
    a, b = snap32[k].astype(np.float64), conv[k].astype(np.float64)
    res[k] = float(np.sqrt(np.mean((a - b) ** 2)))
print("RESULT " + json.dumps(res))
"""


def run(sampler: str, scene: str, size: int) -> dict:
    env = dict(os.environ, HR_SAMPLER=sampler)
    code = _CHILD % {
        "repo": os.path.join(os.path.dirname(__file__), ".."),
        "scene": scene, "size": size,
    }
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"{sampler} failed:\n{out.stderr[-2000:]}")


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "gi_test"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rows = {}
    for sampler in ("bn_r2", "sobol_bn"):
        rows[sampler] = run(sampler, scene, size)
        print(f"{sampler}: " + " ".join(
            f"{k}={v:.5f}" for k, v in sorted(rows[sampler].items())),
            flush=True)
    wins = {k: ("sobol_bn" if rows["sobol_bn"][k] < rows["bn_r2"][k]
                else "bn_r2") for k in rows["bn_r2"]}
    print("winner per effect:", json.dumps(wins))


if __name__ == "__main__":
    main()
