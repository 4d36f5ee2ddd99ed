"""Interactive viewer — a browser front-end for the jitted frame loop.

The reference is an interactive dw::Application window with an ImGui
panel (src/main.cpp:259-687: WASD camera, light editing, per-pass
visualization, exposure). The TPU-era equivalent keeps the renderer on
the device and streams frames to a browser over HTTP (stdlib only):

  python viewer.py --scene shadows_test --width 640 --height 400
  -> open http://localhost:8008

Controls: WASD + QE move, arrow keys look, visualization dropdown
(per-pass debug outputs = the reference's output_ds switching), exposure
slider, light azimuth/elevation sliders, pass toggles (rebuild + re-jit,
matching the reference's wait_idle + pass reconstruction on scale
changes, main.cpp:542-545).
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>hybrid-rendering-tpu viewer</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:12px }
 #frame { border:1px solid #333; image-rendering:pixelated }
 .row { margin:6px 0 } label { margin-right: 12px }
</style></head>
<body>
<div class=row>
 <img id=frame src="/stream" tabindex=0>
</div>
<div class=row>
 vis:
 <select id=vis onchange="post({vis:this.value})">%OPTIONS%</select>
 exposure <input type=range id=exp min=-3 max=3 step=0.1 value=0
   oninput="post({exposure: Math.pow(2, +this.value)})">
 light az <input type=range id=laz min=0 max=628 value=100
   oninput="post({light_az: this.value/100})">
 el <input type=range id=lel min=10 max=155 value=110
   oninput="post({light_el: this.value/100})">
</div>
<div class=row id=toggles>
 %TOGGLES%
 <button onclick="post({profile:1})">profile passes</button>
</div>
<div class=row id=stats></div>
<div class=row id=prof style="white-space:pre"></div>
<script>
function post(o){fetch('/input',{method:'POST',body:JSON.stringify(o)})}
const keys = {};
window.addEventListener('keydown', e=>{keys[e.key.toLowerCase()]=1});
window.addEventListener('keyup',   e=>{keys[e.key.toLowerCase()]=0});
setInterval(()=>{
  const k = Object.keys(keys).filter(x=>keys[x]);
  if (k.length) post({keys:k});
}, 50);
setInterval(async ()=>{
  const r = await fetch('/stats');
  const [s, ...p] = (await r.text()).split('\n');
  document.getElementById('stats').innerText = s;
  document.getElementById('prof').innerText = p.join('\n');
}, 1000);
</script>
</body></html>
"""


class Shared:
    def __init__(self):
        self.lock = threading.Lock()
        self.frame_png = b""
        self.frame_id = 0
        self.inputs = []
        self.stats = ""
        self.profile = ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="shadows_test")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    import dataclasses

    import jax

    from hybrid_rendering_tpu.config import RendererConfig, ToneMapConfig
    from hybrid_rendering_tpu.models.renderer import HybridRenderer
    from hybrid_rendering_tpu.ops.sh import make_env_fallbacks
    from hybrid_rendering_tpu.ops.sky import PreethamSky
    from hybrid_rendering_tpu.scene.presets import apply_preset
    from hybrid_rendering_tpu.utils import image as img_utils
    from hybrid_rendering_tpu.types import Light

    vis_modes = ("final", "shadows", "ao", "reflections", "ddgi",
                 "gbuffer_albedo", "gbuffer_normal", "gbuffer_depth")
    toggles = ("shadows", "ao", "reflections", "ddgi", "taa")

    shared = Shared()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/":
                opts = "".join(f"<option>{v}</option>" for v in vis_modes)
                tg = "".join(
                    f"<label><input type=checkbox checked "
                    f"onchange=\"post({{toggle:'{t}',on:this.checked}})\">"
                    f"{t}</label>" for t in toggles)
                body = PAGE.replace("%OPTIONS%", opts).replace(
                    "%TOGGLES%", tg).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=FRAME")
                self.end_headers()
                last = -1
                try:
                    while True:
                        with shared.lock:
                            fid, png = shared.frame_id, shared.frame_png
                        if fid != last and png:
                            last = fid
                            self.wfile.write(
                                b"--FRAME\r\nContent-Type: image/png\r\n"
                                + f"Content-Length: {len(png)}\r\n\r\n"
                                .encode() + png + b"\r\n")
                        else:
                            time.sleep(0.01)
                except (BrokenPipeError, ConnectionResetError):
                    pass
            elif self.path == "/stats":
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(
                    (shared.stats + "\n" + shared.profile).encode())
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(n) or b"{}")
            with shared.lock:
                shared.inputs.append(data)
            self.send_response(200)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"viewer: http://127.0.0.1:{args.port}  (scene={args.scene})")

    # --- renderer state ---
    base = RendererConfig(width=args.width, height=args.height,
                          debug_outputs=True)
    scene, light, camkw, cfg, preset = apply_preset(args.scene, base)
    sky = PreethamSky.create(np.asarray(light.direction))
    irr_fn, pref_fn = make_env_fallbacks(sky.radiance)

    enabled = {t: True for t in toggles}
    vis = "final"
    exposure = 1.0
    light_az, light_el = None, None

    build_cache = {}

    def build(en=None):
        en = enabled if en is None else en
        key = (tuple(sorted(en.items())), exposure)
        if key in build_cache:
            return build_cache[key]
        c = cfg
        for t in toggles:
            sub = getattr(c, t)
            c = c.replace(**{t: dataclasses.replace(sub,
                                                    enabled=en[t])})
        c = c.replace(tonemap=ToneMapConfig(exposure=exposure))
        r = HybridRenderer(scene, c, sky.radiance, irr_fn, pref_fn)
        built = (r, jax.jit(r.render_frame, donate_argnums=(0,)))
        build_cache[key] = built
        return built

    def profile_passes(cam, lt):
        """Per-pass frame-time deltas via cumulative variants — the
        reference's nested profiler panel (main.cpp:681-682), adapted to
        one-jit frames where only whole-variant timing is observable.
        Compiled steps are cached, so re-profiling is fast."""
        stages = [
            ("gbuffer+deferred", dict(shadows=False, ao=False,
                                      reflections=False, ddgi=False,
                                      taa=False)),
            ("+shadows", dict(shadows=True, ao=False, reflections=False,
                              ddgi=False, taa=False)),
            ("+ao", dict(shadows=True, ao=True, reflections=False,
                         ddgi=False, taa=False)),
            ("+ddgi", dict(shadows=True, ao=True, reflections=False,
                           ddgi=True, taa=False)),
            ("+reflections+taa", dict(shadows=True, ao=True,
                                      reflections=True, ddgi=True,
                                      taa=True)),
        ]
        lines, prev = [], None
        for name, en in stages:
            rv, stepv = build(en)
            sv = rv.create_state()
            out, sv = stepv(sv, cam, lt)  # compile + warm
            out["ldr"].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(4):
                out, sv = stepv(sv, cam, lt)
            out["ldr"].block_until_ready()
            ms = (time.perf_counter() - t0) / 4 * 1e3
            delta = ms if prev is None else ms - prev
            prev = ms
            lines.append(f"{name:18s} {delta:+8.2f} ms   (cum {ms:7.2f})")
        return "\n".join(lines)

    r, step = build()
    state = r.create_state()
    eye = np.asarray(camkw["eye"], np.float64)
    target = np.asarray(camkw["target"], np.float64)
    prev_vp = None
    rebuild = False
    frame_times = []

    while True:
        with shared.lock:
            inputs, shared.inputs = shared.inputs, []
        for msg in inputs:
            if "vis" in msg:
                vis = msg["vis"]
            if "exposure" in msg:
                exposure = float(msg["exposure"])
                rebuild = True
            if "light_az" in msg:
                light_az = float(msg["light_az"])
            if "light_el" in msg:
                light_el = float(msg["light_el"])
            if "toggle" in msg:
                enabled[msg["toggle"]] = bool(msg["on"])
                rebuild = True
            if "profile" in msg:
                cam_p = r.make_camera(tuple(eye), tuple(target),
                                      int(state.frame_index), prev_vp)
                with shared.lock:
                    shared.profile = "profiling passes..."
                shared.profile = profile_passes(cam_p, light)
            for k in msg.get("keys", []):
                fwd = target - eye
                fwd /= np.linalg.norm(fwd)
                right = np.cross(fwd, [0.0, 1.0, 0.0])
                right /= max(np.linalg.norm(right), 1e-6)
                stp = 0.5
                if k == "w":
                    eye += fwd * stp; target += fwd * stp
                elif k == "s":
                    eye -= fwd * stp; target -= fwd * stp
                elif k == "a":
                    eye -= right * stp; target -= right * stp
                elif k == "d":
                    eye += right * stp; target += right * stp
                elif k == "q":
                    eye[1] -= stp; target[1] -= stp
                elif k == "e":
                    eye[1] += stp; target[1] += stp
                elif k == "arrowleft":
                    target = eye + _rot_y(target - eye, 0.06)
                elif k == "arrowright":
                    target = eye + _rot_y(target - eye, -0.06)
                elif k == "arrowup":
                    target[1] += 0.3
                elif k == "arrowdown":
                    target[1] -= 0.3
        if rebuild:
            r, step = build()
            state = r.create_state()  # pass reconstruction resets history
            prev_vp = None
            rebuild = False

        lt = light
        if light_az is not None or light_el is not None:
            az = light_az if light_az is not None else 1.0
            el = light_el if light_el is not None else 1.1
            d = np.asarray([np.cos(az) * np.sin(el), np.cos(el),
                            np.sin(az) * np.sin(el)])
            d = d if d[1] > 0 else d * np.asarray([1.0, -1.0, 1.0])
            lt = Light.directional(tuple(d), intensity=3.0, radius=0.05)

        cam = r.make_camera(tuple(eye), tuple(target),
                            int(state.frame_index), prev_vp)
        prev_vp = np.asarray(cam.view_proj)
        t0 = time.perf_counter()
        outputs, state = step(state, cam, lt)
        img = outputs.get(vis if vis != "final" else "ldr",
                          outputs["ldr"])
        img = np.asarray(img)
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        frame_times = frame_times[-30:]

        if img.ndim == 2:
            img = np.repeat(np.clip(img, 0, 1)[..., None], 3, axis=2)
        elif vis not in ("final",):
            img = img_utils.tonemap_for_display(img) \
                if img.dtype != np.uint8 and img.max() > 1.001 else np.clip(
                    img, 0, 1)
        buf = io.BytesIO()
        img_utils.write_png(buf, img)
        with shared.lock:
            shared.frame_png = buf.getvalue()
            shared.frame_id += 1
            shared.stats = (
                f"{1.0 / max(np.mean(frame_times), 1e-6):.1f} fps  "
                f"({np.mean(frame_times) * 1e3:.1f} ms)  "
                f"frame {int(state.frame_index)}  vis={vis}")


def _rot_y(v, a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([c * v[0] + s * v[2], v[1], -s * v[0] + c * v[2]])


if __name__ == "__main__":
    main()
