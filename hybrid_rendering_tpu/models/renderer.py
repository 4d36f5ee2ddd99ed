"""HybridRenderer — the full frame loop as one jittable pure function.

Replaces HybridRendering::update (src/main.cpp:49-129): the single Vulkan
command buffer becomes a single XLA program; pass ordering is dataflow;
tracked barriers (use_resource/flush_barriers) are unnecessary; ping-pong
image pairs become the RenderState pytree threaded through
``render_frame(state, camera, light) -> (outputs, state)`` with donated
buffers.

Frame order (main.cpp:79-108):
  g-buffer -> shadows -> ao -> [ddgi] -> [reflections] -> deferred ->
  [ground truth] -> taa -> tonemap
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import RendererConfig
from hybrid_rendering_tpu.models import (
    ao as ao_pass_mod,
    ddgi as ddgi_mod,
    deferred as deferred_mod,
    gbuffer as gbuffer_mod,
    reflections as reflections_mod,
    shadows as shadows_mod,
    taa as taa_mod,
    tonemap as tonemap_mod,
)
from hybrid_rendering_tpu.ops import bvh as bvh_mod
from hybrid_rendering_tpu.types import Camera, GBuffer, Light, SceneArrays
from hybrid_rendering_tpu.utils import camera as camera_utils

import os as _os

# HR_BATCH_TRACES=0 restores one-launch-per-pass (A/B knob for the
# merged shadow+AO wavefront)
_BATCH_TRACES = _os.environ.get("HR_BATCH_TRACES", "1") == "1"


@struct.dataclass
class RenderState:
    """All temporal state — the reference's ping-ponged images
    (SURVEY §2.10.5)."""

    prev_gbuffer: GBuffer
    shadows: shadows_mod.ShadowsState
    ao: ao_pass_mod.AOState
    reflections: reflections_mod.ReflectionsState
    ddgi: ddgi_mod.DDGIState
    taa: taa_mod.TAAState
    prev_cam_pos: jax.Array  # (3,) for camera_delta (main.cpp:1023-1080)
    frame_index: jax.Array  # () int32


def _scaled_dims(width, height, scale):
    s = 1 << int(scale)
    return width // s, height // s


class HybridRenderer:
    """Owns the scene-bound tracer closures + config; all methods are
    functional (state in, state out)."""

    def __init__(
        self,
        scene: SceneArrays,
        config: RendererConfig,
        sky_radiance_fn: Callable,
        env_irradiance_fn: Optional[Callable] = None,
        env_prefiltered_fn: Optional[Callable] = None,
        tracer_method: str = "auto",
        animator: Optional[Callable] = None,
        mesh=None,
    ):
        """animator: optional fn(frame_index) -> (I, 4, 4) per-instance
        rigid transforms (jnp ops, traced into the frame). When set, the
        soup + FlashTrace acceleration data are re-posed on device every
        frame — the TPU-native equivalent of the reference's per-frame
        TLAS rebuild (main.cpp:74; see scene/dynamic.py)."""
        self.scene = scene
        self.config = config
        self.sky_radiance_fn = sky_radiance_fn
        self.env_irradiance_fn = env_irradiance_fn
        self.env_prefiltered_fn = env_prefiltered_fn
        self.animator = animator
        self.tracer_method = tracer_method
        # multi-chip: shard every trace over the ray axis so each device
        # runs the production kernel on its local rays (parallel/trace.py)
        self.mesh = mesh
        self.closest_fn, self.visibility_fn = bvh_mod.make_tracers(
            scene, method=tracer_method
        )
        self.closest_surface_fn = bvh_mod.make_surface_tracer(
            scene, method=tracer_method
        )
        if mesh is not None:
            from hybrid_rendering_tpu.parallel.trace import (
                shard_renderer_tracers,
            )

            (self.closest_fn, self.visibility_fn,
             self.closest_surface_fn) = shard_renderer_tracers(
                mesh, self.closest_fn, self.visibility_fn,
                self.closest_surface_fn,
            )
        # probe grid geometry is static per scene (recreated on scene /
        # probe-distance change, like ddgi.cpp:93-95,115-118 -> re-jit)
        lo, hi = scene.aabb()
        import numpy as _np

        self.probe_grid = ddgi_mod.make_probe_grid(
            _np.asarray(lo), _np.asarray(hi), config.ddgi
        )
        self.gi_sampler = ddgi_mod.make_irradiance_sampler(
            self.probe_grid, config.ddgi
        )

    # ------------------------------------------------------------------
    def create_state(self) -> RenderState:
        cfg = self.config
        W, H = cfg.width, cfg.height
        sw, sh = _scaled_dims(W, H, cfg.shadows.scale)
        aw, ah = _scaled_dims(W, H, cfg.ao.scale)
        dummy_cam = camera_utils.make_camera(
            eye=(0.0, 1.0, 5.0), target=(0.0, 0.0, 0.0), width=W, height=H
        )
        gb0 = jax.eval_shape(
            lambda: gbuffer_mod.render_gbuffer(
                self.scene, self.closest_surface_fn, dummy_cam, W, H
            )
        )
        zero_gb = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), gb0
        )
        # mesh_id must start at -1 (no geometry -> disocclusion everywhere)
        zero_gb = zero_gb.replace(mesh_id=zero_gb.mesh_id - 1)
        rw, rh = _scaled_dims(W, H, cfg.reflections.scale)
        return RenderState(
            prev_gbuffer=zero_gb,
            shadows=shadows_mod.ShadowsState.create(sh, sw),
            ao=ao_pass_mod.AOState.create(ah, aw),
            reflections=reflections_mod.ReflectionsState.create(rh, rw),
            ddgi=ddgi_mod.DDGIState.create(self.probe_grid.num_probes, cfg.ddgi),
            taa=taa_mod.TAAState.create(H, W),
            prev_cam_pos=jnp.zeros(3, jnp.float32),
            frame_index=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def render_frame(
        self,
        state: RenderState,
        camera: Camera,
        light: Light,
    ):
        """One frame. Returns (outputs dict, new state). Jit this (donate
        the state arg)."""
        cfg = self.config
        W, H = cfg.width, cfg.height
        debug = cfg.debug_outputs
        outputs: Dict[str, jax.Array] = {}

        # --- dynamic scenes: re-pose soup + rebuild acceleration data on
        # device (the reference's per-frame build_tlas, main.cpp:74) ---
        scene = self.scene
        closest_surface_fn = self.closest_surface_fn
        visibility_fn = self.visibility_fn
        deltas = None
        if self.animator is not None:
            from hybrid_rendering_tpu.scene import dynamic as dyn

            with jax.named_scope("refit_scene"):
                m_cur = self.animator(state.frame_index)
                m_prev = self.animator(jnp.maximum(state.frame_index - 1, 0))
                scene = dyn.refit_scene(self.scene, m_cur)
                deltas = dyn.motion_deltas(m_cur, m_prev)
                _, visibility_fn = bvh_mod.make_tracers(
                    scene, method=self.tracer_method)
                closest_surface_fn = bvh_mod.make_surface_tracer(
                    scene, method=self.tracer_method)
                if self.mesh is not None:
                    from hybrid_rendering_tpu.parallel.trace import (
                        shard_ray_fn,
                    )

                    visibility_fn = shard_ray_fn(self.mesh, visibility_fn)
                    closest_surface_fn = shard_ray_fn(
                        self.mesh, closest_surface_fn)

        # --- G-buffer (main.cpp:79) ---
        with jax.named_scope("gbuffer"):
            gb = gbuffer_mod.render_gbuffer(
                scene, closest_surface_fn, camera, W, H,
                motion_deltas=deltas,
            )
        if debug:
            outputs["gbuffer_albedo"] = gb.albedo
            outputs["gbuffer_normal"] = gb.normal
            outputs["gbuffer_depth"] = gb.depth

        # shared mip chain: one downsample per scale, reused by every
        # half/quarter-res pass (AO + reflections + DDGI each re-slicing
        # the full-res planes cost ~54 ms/frame in gathers, r5 xplane);
        # each level cascades from the previous (g_buffer.cpp:236-244
        # builds the mip chain once per frame the same way)
        _gb_mips = {0: gb}
        _prev_mips = {0: state.prev_gbuffer}

        def gb_at(scale, _m=_gb_mips):
            s = int(scale)
            while s not in _m:
                lo = max(k for k in _m if k < s)
                _m[lo + 1] = gbuffer_mod.downsample_gbuffer(_m[lo], 1)
            return _m[s]

        def prev_gb_at(scale, _m=_prev_mips):
            s = int(scale)
            while s not in _m:
                lo = max(k for k in _m if k < s)
                _m[lo + 1] = gbuffer_mod.downsample_gbuffer(_m[lo], 1)
            return _m[s]

        # --- shadows + AO (main.cpp:80-81). Both wavefronts depend only
        # on the G-buffer, so their visibility rays ride ONE launch when
        # the tracer supports batching (VERDICT r4 #1a: the per-launch
        # prepass + dispatch fixed cost is paid once, not twice) ---
        shadow_raw = ao_raw = None
        vis_many = getattr(visibility_fn, "many", None)
        if (cfg.shadows.enabled and cfg.ao.enabled
                and vis_many is not None and _BATCH_TRACES):
            with jax.named_scope("shadow_ao_trace"):
                gb_s = gb_at(cfg.shadows.scale)
                gb_a = gb_at(cfg.ao.scale)
                s_rays = shadows_mod.make_rays(
                    gb_s, light, state.frame_index, cfg.shadows)
                a_rays = ao_pass_mod.make_rays(
                    gb_a, state.frame_index, cfg.ao)
                vis_s, vis_a = vis_many([s_rays[:3], a_rays])
                shadow_raw = shadows_mod.finish_rays(vis_s, gb_s, s_rays[3])
                ao_raw = ao_pass_mod.finish_rays(vis_a, gb_a)

        shadow_vis = None
        shadows_state = state.shadows
        if cfg.shadows.enabled:
            with jax.named_scope("shadows"):
                gb_s = gb_at(cfg.shadows.scale)
                prev_gb_s = prev_gb_at(cfg.shadows.scale)
                sh_out, shadows_state = shadows_mod.shadows_pass(
                    visibility_fn, gb_s, prev_gb_s, gb, light,
                    state.shadows, state.frame_index, cfg.shadows,
                    raw=shadow_raw,
                )
            shadow_vis = sh_out.final
            if debug:
                outputs["shadows_ray_trace"] = sh_out.ray_trace
                outputs["shadows_temporal"] = sh_out.temporal
                outputs["shadows_atrous"] = sh_out.atrous
                outputs["shadows"] = sh_out.final

        ao_plane = None
        ao_state = state.ao
        if cfg.ao.enabled:
            with jax.named_scope("ao"):
                gb_a = gb_at(cfg.ao.scale)
                prev_gb_a = prev_gb_at(cfg.ao.scale)
                ao_out, ao_state = ao_pass_mod.ao_pass(
                    visibility_fn, gb_a, prev_gb_a, gb,
                    state.ao, state.frame_index, cfg.ao,
                    raw=ao_raw,
                )
            ao_plane = ao_out.final
            if debug:
                outputs["ao_ray_trace"] = ao_out.ray_trace
                outputs["ao_temporal"] = ao_out.temporal
                outputs["ao_blur"] = ao_out.blur
                outputs["ao"] = ao_out.final

        # --- DDGI (main.cpp:82): ray trace reads the PREVIOUS frame's
        # atlases (ddgi.cpp:775-778), deferred/reflections read the updated
        # ones ---
        ddgi_state = state.ddgi
        gi_screen = None
        gi_sample_fn = None
        if cfg.ddgi.enabled:
            with jax.named_scope("ddgi_update"):
                ddgi_state = ddgi_mod.ddgi_update(
                    scene, closest_surface_fn, visibility_fn,
                    self.probe_grid, state.ddgi, light, self.sky_radiance_fn,
                    state.frame_index, cfg.ddgi, sampler=self.gi_sampler,
                )

            def gi_sample_fn(p, n, wo, valid=None, _st=ddgi_state):
                return self.gi_sampler(_st, p, n, wo, valid=valid)

            with jax.named_scope("ddgi_sample_screen"):
                gb_g = gb_at(cfg.ddgi.scale)
                gi_low = ddgi_mod.sample_probe_grid_screen(
                    self.probe_grid, ddgi_state, cfg.ddgi, gb_g,
                    camera.position, sampler=self.gi_sampler,
                )
                if cfg.ddgi.scale != 0:
                    from hybrid_rendering_tpu.ops import filters as _filters

                    gi_screen = _filters.upsample_edge_aware(
                        gi_low, gb_g.normal, gb_g.linear_z,
                        gb.normal, gb.linear_z, int(cfg.ddgi.scale),
                    )
                else:
                    gi_screen = gi_low
            if debug:
                outputs["ddgi"] = gi_screen

        # --- reflections (main.cpp:83) ---
        refl_plane = None
        refl_state = state.reflections
        if cfg.reflections.enabled:
            with jax.named_scope("reflections"):
                camera_delta = jnp.linalg.norm(
                    camera.position - state.prev_cam_pos
                )
                gb_r = gb_at(cfg.reflections.scale)
                prev_gb_r = prev_gb_at(cfg.reflections.scale)
                refl_out, refl_state = reflections_mod.reflections_pass(
                    scene, closest_surface_fn, visibility_fn,
                    gb_r, prev_gb_r, gb, camera, camera_delta, light,
                    self.sky_radiance_fn, state.reflections,
                    state.frame_index, cfg.reflections,
                    gi_sample_fn=gi_sample_fn,
                    env_prefiltered_fn=self.env_prefiltered_fn,
                )
            refl_plane = refl_out.final
            if debug:
                outputs["reflections_ray_trace"] = refl_out.ray_trace
                outputs["reflections_temporal"] = refl_out.temporal
                outputs["reflections_atrous"] = refl_out.atrous
                outputs["reflections"] = refl_out.final

        # --- deferred shading (main.cpp:84-88) ---
        with jax.named_scope("deferred"):
            hdr = deferred_mod.deferred_shading(
                gb, camera, light, self.sky_radiance_fn, W, H,
                shadow_visibility=shadow_vis,
                ao=ao_plane,
                reflections=refl_plane,
                gi_irradiance=gi_screen,
                env_irradiance_fn=self.env_irradiance_fn,
                env_prefiltered_fn=self.env_prefiltered_fn,
                cfg=cfg.deferred,
                components_out=(comps := {} if debug else None),
            )
        if debug:
            outputs["deferred"] = hdr
            for k, v in comps.items():
                outputs[f"deferred_{k}"] = v

        # --- TAA (main.cpp:90-97) ---
        taa_state = state.taa
        color = hdr
        if cfg.taa.enabled:
            with jax.named_scope("taa"):
                color, taa_state = taa_mod.taa_resolve(
                    hdr, gb, state.taa, cfg.taa
                )
        if debug:
            outputs["taa"] = color

        # --- tone map (main.cpp:98-108) ---
        with jax.named_scope("tonemap"):
            outputs["ldr"] = tonemap_mod.tonemap(color, cfg.tonemap)

        # probe visualization (deferred_shading.cpp:825-866) as a debug
        # output on the HDR frame — only built when debug views are on
        # (the reference draws probes only when its GUI toggle is set)
        if cfg.ddgi.enabled and debug:
            outputs["ddgi_probes"] = tonemap_mod.tonemap(
                ddgi_mod.visualize_probes(
                    self.probe_grid, ddgi_state, cfg.ddgi, camera, hdr,
                    gb.depth,
                ),
                cfg.tonemap,
            )

        new_state = RenderState(
            prev_gbuffer=gb,
            shadows=shadows_state,
            ao=ao_state,
            reflections=refl_state,
            ddgi=ddgi_state,
            taa=taa_state,
            prev_cam_pos=camera.position,
            frame_index=state.frame_index + 1,
        )
        return outputs, new_state

    # ------------------------------------------------------------------
    def make_camera(self, eye, target, frame_index: int = 0,
                    prev_view_proj=None, fov_y_deg: float = 60.0):
        """Per-frame camera with TAA Halton jitter (main.cpp:941-944)."""
        cfg = self.config
        jitter = (0.0, 0.0)
        if cfg.taa.enabled:
            jitter = taa_mod.halton_jitter(frame_index, cfg.width, cfg.height)
        return camera_utils.make_camera(
            eye=eye, target=target, fov_y_deg=fov_y_deg,
            width=cfg.width, height=cfg.height,
            jitter=jitter, prev_view_proj=prev_view_proj,
        )
