"""Command-line renderer — the app shell (replaces src/main.cpp).

The reference's interactive window + ImGui panel becomes an offline CLI:
scene/preset selection, every per-pass toggle and visualization mode as
flags, demo-spline camera animation, frame dumps.

Examples:
  python render.py --scene gi_test --frames 16 --out out.png
  python render.py --scene shadows_test --mode gt --spp 64 --out gt.png
  python render.py --scene pica_pica --visualize shadows --out vis.png
  python render.py --scene sponza --animate --frames 48 --out-dir frames/
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


VIS_MODES = (
    "final", "gt", "shadows", "shadows_ray_trace", "ao", "ao_ray_trace",
    "reflections", "reflections_ray_trace", "ddgi", "deferred",
    "gbuffer_albedo", "gbuffer_normal", "gbuffer_depth", "taa",
    "ddgi_probes",
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--scene", default="shadows_test",
                   help="shadows_test|reflections_test|gi_test|pica_pica|"
                        "sponza|sponza_hi (191k-tri hero scene)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--frames", type=int, default=12,
                   help="frames to accumulate (hybrid) before the dump")
    p.add_argument("--mode", default="hybrid", choices=("hybrid", "gt"))
    p.add_argument("--spp", type=int, default=32, help="GT samples per pixel")
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--visualize", default="final", choices=VIS_MODES,
                   help="per-pass debug output (reference output_ds switching)")
    p.add_argument("--no-shadows", action="store_true")
    p.add_argument("--no-ao", action="store_true")
    p.add_argument("--no-reflections", action="store_true")
    p.add_argument("--no-ddgi", action="store_true")
    p.add_argument("--no-taa", action="store_true")
    p.add_argument("--sky", default="hosek", choices=("hosek", "preetham"),
                   help="procedural sky model (reference default is "
                        "Hosek-Wilkie, common.cpp:541-546; see "
                        "ops/hosek.py for the offline-fit caveat)")
    p.add_argument("--hosek-data", default=None, metavar="PATH",
                   help="path to the published ArHosekSkyModelData_RGB.h; "
                        "when given, --sky hosek cooks the exact reference "
                        "tables instead of the offline fit")
    p.add_argument("--env", default=None,
                   help="environment: procedural sky (default), a named HDR "
                        "(arches|basketball_court|environment|overcast), or "
                        "a path to an equirect .hdr file "
                        "(reference env combo, main.cpp:292-308)")
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--animate", action="store_true",
                   help="play the scene's demo camera spline")
    p.add_argument("--orbit-light", action="store_true")
    p.add_argument("--out", default="out.png")
    p.add_argument("--out-dir", default=None,
                   help="dump every frame here (with --animate)")
    p.add_argument("--checkpoint", default=None,
                   help="save/resume render state at this path")
    p.add_argument("--reference-parity", action="store_true",
                   help="upstream artistic GI constants (0.5*pi sample "
                        "scale, 0.85/0.95 energy haircuts, 1.7x bounce) "
                        "for side-by-sides with the reference renderer")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        # the image's sitecustomize pre-registers a remote TPU plugin;
        # retarget + drop its factory (same trick as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        try:
            from jax._src import xla_bridge

            xla_bridge._backend_factories.pop("axon", None)
        except Exception:
            pass
    import dataclasses

    from hybrid_rendering_tpu.config import RendererConfig, ToneMapConfig
    from hybrid_rendering_tpu.models import tonemap as tonemap_mod
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils import image as img_utils
    from hybrid_rendering_tpu.utils.animation import (
        DemoPlayer, animate_orbit_light,
    )
    from hybrid_rendering_tpu.utils.profiler import FrameTimer

    base = RendererConfig(width=args.width, height=args.height,
                          debug_outputs=True)
    scene, light, camkw, cfg, preset = apply_preset(args.scene, base)
    cfg = cfg.replace(
        shadows=dataclasses.replace(cfg.shadows, enabled=not args.no_shadows),
        ao=dataclasses.replace(cfg.ao, enabled=not args.no_ao),
        reflections=dataclasses.replace(
            cfg.reflections, enabled=not args.no_reflections),
        ddgi=dataclasses.replace(cfg.ddgi, enabled=not args.no_ddgi),
        taa=dataclasses.replace(cfg.taa, enabled=not args.no_taa),
        tonemap=ToneMapConfig(exposure=args.exposure),
    )
    if args.reference_parity:
        from hybrid_rendering_tpu.config import reference_parity

        cfg = reference_parity(cfg)

    if args.env:
        from hybrid_rendering_tpu.ops.sh import make_image_env_fallbacks
        from hybrid_rendering_tpu.scene.environments import load_environment

        env = load_environment(args.env)
        env_fn = env.radiance
        irr_fn, pref_fn = make_image_env_fallbacks(env)
    elif args.sky == "hosek":
        from hybrid_rendering_tpu.ops.hosek import HosekWilkieSky

        if args.hosek_data:
            sky = HosekWilkieSky.from_dataset(
                np.asarray(light.direction), args.hosek_data,
                exposure=0.02)  # physical-units tables -> lighting scale
        else:
            sky = HosekWilkieSky.create(np.asarray(light.direction))
        env_fn = sky.radiance
        irr_fn, pref_fn = make_env_fallbacks(env_fn)
    else:
        sky = PreethamSky.create(np.asarray(light.direction))
        env_fn = sky.radiance
        irr_fn, pref_fn = make_env_fallbacks(env_fn)
    r = HybridRenderer(scene, cfg, env_fn, irr_fn, pref_fn)
    print(f"scene={args.scene} {scene.num_triangles} tris, "
          f"{r.probe_grid.num_probes} probes, {jax.devices()[0].platform}",
          file=sys.stderr)

    if args.mode == "gt":
        from hybrid_rendering_tpu.utils.oracle import render_ground_truth

        cam = r.make_camera(camkw["eye"], camkw["target"], 0)
        t0 = time.time()
        gt = render_ground_truth(r, cam, light, args.spp, args.bounces)
        ldr = np.asarray(tonemap_mod.tonemap(gt, cfg.tonemap))
        print(f"GT {args.spp}spp in {time.time()-t0:.1f}s", file=sys.stderr)
        img_utils.write_png(args.out, ldr)
        print(args.out)
        return

    timer = FrameTimer()
    state = r.create_state()
    if args.checkpoint and os.path.exists(args.checkpoint):
        from hybrid_rendering_tpu.utils.checkpoint import load_state

        state = load_state(args.checkpoint, like=state)
        print(f"resumed state from {args.checkpoint}", file=sys.stderr)

    step = jax.jit(r.render_frame, donate_argnums=(0,))
    player = None
    if args.animate and preset.demo_keyframes:
        player = DemoPlayer(preset.demo_keyframes)
        player.play()

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    prev_vp = None
    outputs = None
    dt = 1.0 / 30.0
    for i in range(args.frames):
        if player is not None:
            eye, target = player.update(dt)
        else:
            eye, target = camkw["eye"], camkw["target"]
        lt = animate_orbit_light(light, i * dt) if args.orbit_light else light
        cam = r.make_camera(eye, target, i, prev_vp)
        prev_vp = np.asarray(cam.view_proj)
        with timer.time("frame"):
            outputs, state = step(state, cam, lt)
            jax.block_until_ready(outputs["ldr"])
        if args.out_dir:
            img_utils.write_png(
                os.path.join(args.out_dir, f"frame_{i:04d}.png"),
                np.asarray(outputs["ldr"]),
            )

    key = args.visualize if args.visualize != "final" else "ldr"
    img = np.asarray(outputs[key] if key in outputs else outputs["ldr"])
    if img.ndim == 2:  # single-channel views replicate (tone_map.frag:52-53)
        img = np.repeat(img[..., None], 3, axis=2)
        img = np.clip(img, 0.0, 1.0)
    elif key not in ("ldr",):
        img = img_utils.tonemap_for_display(img, exposure=args.exposure) \
            if key in ("deferred", "reflections", "ddgi", "taa") else np.clip(img, 0, 1)

    img_utils.write_png(args.out, img)
    if args.checkpoint:
        from hybrid_rendering_tpu.utils.checkpoint import save_state

        save_state(args.checkpoint, state)
    if args.profile:
        print(timer.report(), file=sys.stderr)
    print(args.out)


if __name__ == "__main__":
    main()
