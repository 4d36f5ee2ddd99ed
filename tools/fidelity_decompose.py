"""HDR-space fidelity decomposition: which lighting TERM carries the error?

VERDICT r4 #3: pooled RMSE plateaued at ~0.07 on preset tweaks; r5's
spatial analysis put 63% of the squared error on the floor band with a
uniform -0.02 bias. This tool attributes the residual to terms, not
pixels: it renders the converged hybrid with the deferred debug split
(direct / indirect_diffuse / indirect_specular, models/deferred.py:100)
and the GT path tracer at max_bounces=1 and 4 (HDR, cached), then
compares, globally and per image band:

  hybrid direct            vs GT(b=1) minus sky background
  hybrid indirect_diffuse  vs GT(b=4) - GT(b=1)   (diffuse-dominated
                              interreflection; specular GGX is small in
                              gi_test's diffuse box)

Usage: [JAX_PLATFORMS=cpu] python tools/fidelity_decompose.py [scene] [size]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "gi_test"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 96

    from hybrid_rendering_tpu.config import RendererConfig
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils.oracle import (
        render_ground_truth, render_hybrid_converged,
    )

    base = RendererConfig(width=size, height=size, debug_outputs=True)
    scene, light, camkw, cfg, _ = apply_preset(scene_name, base)
    sky = PreethamSky.create(np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)
    r = HybridRenderer(scene, cfg, sky.radiance, irr_fn, pref_fn)
    cam = r.make_camera(camkw["eye"], camkw["target"], 0)

    def gt_hdr(bounces):
        cache = f"/tmp/gt_hdr_{scene_name}_{size}_{spp}_b{bounces}.npz"
        if os.path.exists(cache):
            return np.load(cache)["hdr"]
        t0 = time.time()
        img = np.asarray(render_ground_truth(r, cam, light, spp,
                                             max_bounces=bounces))
        np.savez(cache, hdr=img)
        print(f"gt b={bounces} rendered {time.time() - t0:.0f}s", flush=True)
        return img

    out = render_hybrid_converged(r, cam, light, frames=32)
    h_direct = np.asarray(out["deferred_direct"])
    h_idiff = np.asarray(out["deferred_indirect_diffuse"])
    h_ispec = np.asarray(out["deferred_indirect_specular"])
    h_full = np.asarray(out["deferred"])
    geom = np.asarray(out["gbuffer_depth"]) > 0 if "gbuffer_depth" in out \
        else (h_direct + h_idiff).sum(-1) > -1
    print("hybrid planes done", flush=True)

    g1 = gt_hdr(1)
    g4 = gt_hdr(4)
    g_ind = g4 - g1

    def band_table(tag, h, g, mask=None):
        d = h - g
        if mask is not None:
            d = d * mask[..., None]
        print(f"--- {tag}: global h_mean={h.mean():.4f} g_mean={g.mean():.4f} "
              f"bias={d.mean():+.4f} rmse={np.sqrt((d**2).mean()):.4f}")
        H = h.shape[0]
        for b in range(8):
            r0, r1 = b * H // 8, (b + 1) * H // 8
            print(f"  rows {r0:3d}-{r1:3d}: h={h[r0:r1].mean():.4f} "
                  f"g={g[r0:r1].mean():.4f} bias={d[r0:r1].mean():+.4f}")

    # sky pixels: hybrid direct plane is zero there; GT b1 shows the sky.
    # Mask both to geometry for the direct comparison.
    m = geom.astype(np.float32)
    band_table("direct (geom only)", h_direct * m[..., None],
               g1 * m[..., None], None)
    band_table("indirect_diffuse vs GT(b4-b1)", h_idiff + h_ispec, g_ind)
    band_table("full HDR", h_full, g4)
    print("spec plane mean:", h_ispec.mean(), flush=True)


if __name__ == "__main__":
    main()
