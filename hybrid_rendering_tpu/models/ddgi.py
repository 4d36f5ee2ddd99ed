"""DDGI — irradiance probe-grid global illumination.

Behavioural twin of src/ddgi.{h,cpp} + src/shaders/gi/* (SURVEY §2.7):
probe grid sized from the scene AABB (+2 probes/axis), per-frame
random-rotated spherical-Fibonacci rays, cosine-weighted irradiance atlas
(8x8 octahedral texels/probe) and Chebyshev depth atlas (16x16, mean +
mean^2) with 0.98 hysteresis, infinite bounces by sampling the previous
frame's atlases inside the ray shade, and the 8-probe trilinear
``sample_irradiance`` with wrap-shaded backface + Chebyshev visibility
weights and sqrt-space blending (gi_common.glsl:188-320).

TPU-first redesign:
  - The per-frame random rotation is shared by every probe
    (gi_ray_trace.rgen:90), so texel<->ray cosine weights are IDENTICAL
    across probes: the whole probe-update pass (gi_probe_update.glsl's
    shared-memory gather loop) collapses into ONE MXU matmul
    (texels x rays) @ (rays x probes*channels).
  - Atlases are stored borderless as (P, S, S, C); the reference's border
    texels + gi_border_update.glsl exist only so hardware bilinear wraps —
    here octahedral wrap is applied analytically in the 4-tap gather
    (_wrap_oct_coords), which is exactly the mirrored addressing the
    border copy bakes in.
"""
from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from hybrid_rendering_tpu.config import DDGIConfig
from hybrid_rendering_tpu.ops import brdf as brdf_ops, rng as rng_ops
from hybrid_rendering_tpu.ops.lighting import direct_lighting
from hybrid_rendering_tpu.ops.math3d import dot, normalize
from hybrid_rendering_tpu.ops.octahedral import (
    direction_to_octahedral, octahedral_to_direction,
)
from hybrid_rendering_tpu.types import GBuffer, Light, SceneArrays


class ProbeGrid(NamedTuple):
    """Static grid geometry (DDGIUniforms, ddgi.cpp:14-32). Python ints /
    numpy so shapes stay static under jit."""

    counts: tuple  # (Px, Py, Pz)
    start: np.ndarray  # (3,)
    step: np.ndarray  # (3,)
    max_distance: float

    @property
    def num_probes(self) -> int:
        px, py, pz = self.counts
        return px * py * pz


def make_probe_grid(scene_min, scene_max, cfg: DDGIConfig) -> ProbeGrid:
    """Probe-cage layout over the scene AABB.

    "padded" is the reference layout (ddgi.cpp:150-169): rows start ON
    the AABB min and 2 extra rows per axis run past the max, so closed
    scenes carry rows of probes embedded in / beyond their walls. Those
    probes get crushed by backface suppression + Chebyshev, and boundary
    surfaces then EXTRAPOLATE the last interior row — measured as a
    +20%-ish bright band at the gi_test ceiling (the cage pins the value
    one probe-spacing below the surface where irradiance is higher by
    the 1/d^2 falloff it can't see).

    "interior" (TPU default) insets the rows just inside the AABB: every
    boundary surface interpolates between a row a few cm away and the
    interior, no probe is wasted outside closed geometry, and the same
    interior density costs ~2.4x fewer probes than padding all axes.
    """
    lo = np.asarray(scene_min, np.float32)
    hi = np.asarray(scene_max, np.float32)
    extent = hi - lo
    if cfg.grid_layout == "interior":
        counts = tuple(
            max(2, int(np.ceil(extent[i] / cfg.probe_distance)) + 1)
            for i in range(3)
        )
        inset = np.minimum(0.1 * cfg.probe_distance, 0.25 * extent)
        start = lo + inset
        step = np.maximum(
            (extent - 2.0 * inset) / (np.asarray(counts, np.float32) - 1.0),
            1e-3,
        ).astype(np.float32)
        return ProbeGrid(
            counts=counts,
            start=start,
            step=step,
            max_distance=float(cfg.max_distance_factor * step.max()),
        )
    counts = tuple(
        int(np.ceil(extent[i] / cfg.probe_distance)) + cfg.probe_grid_padding
        for i in range(3)
    )
    return ProbeGrid(
        counts=counts,
        start=lo,
        step=np.full(3, cfg.probe_distance, np.float32),
        max_distance=cfg.max_distance_factor * cfg.probe_distance,
    )


def probe_positions(grid: ProbeGrid) -> jax.Array:
    """(P,3) world positions, x-major layout
    (gi_common.glsl grid_coord_to_probe_index)."""
    px, py, pz = grid.counts
    zz, yy, xx = np.meshgrid(
        np.arange(pz), np.arange(py), np.arange(px), indexing="ij"
    )
    coords = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)
    return jnp.asarray(grid.start + coords * grid.step)


@struct.dataclass
class DDGIState:
    """Ping-ponged probe atlases (ddgi.h:82-85) — donated buffers here."""

    irradiance: jax.Array  # (P, S, S, 3), S = irradiance_oct_size
    depth: jax.Array  # (P, D, D, 2) mean / mean^2
    first_frame: jax.Array  # () int32 — gates infinite bounce + hysteresis
    # frames accumulated since reset: drives the hysteresis warm-up ramp
    # min(h, n/(n+1)) — an exact running mean until the EMA rate takes
    # over (n >= h/(1-h)), with the reference's steady state unchanged.
    # Plain 0.98 EMA from a cold start reaches only 38% of steady state
    # after 24 frames, which read as "DDGI too dark" in fidelity runs.
    accum_frames: jax.Array = None  # () int32

    @staticmethod
    def create(num_probes: int, cfg: DDGIConfig):
        s = cfg.irradiance_oct_size
        d = cfg.depth_oct_size
        return DDGIState(
            irradiance=jnp.zeros((num_probes, s, s, 3), jnp.float32),
            depth=jnp.zeros((num_probes, d, d, 2), jnp.float32),
            first_frame=jnp.int32(1),
            accum_frames=jnp.int32(0),
        )


# ---------------------------------------------------------------------------
# Octahedral atlas addressing
# ---------------------------------------------------------------------------


def _texel_directions(side: int) -> jax.Array:
    """(side*side, 3) directions at texel centers (normalized_oct_coord,
    gi_common.glsl:143-160)."""
    idx = np.arange(side)
    xx, yy = np.meshgrid(idx, idx, indexing="xy")
    oct = np.stack(
        [(xx + 0.5) / side * 2.0 - 1.0, (yy + 0.5) / side * 2.0 - 1.0], -1
    ).reshape(-1, 2)
    return octahedral_to_direction(jnp.asarray(oct, jnp.float32))


def _wrap_oct_coords(x, y, side):
    """Octahedral wrap for out-of-range texel indices — the analytic form
    of the reference's mirrored border copy (gi_border_update.glsl)."""

    def wrap_once(x, y):
        xl = x < 0
        x = jnp.where(xl, -x - 1, x)
        y = jnp.where(xl, side - 1 - y, y)
        xh = x > side - 1
        x = jnp.where(xh, 2 * side - 1 - x, x)
        y = jnp.where(xh, side - 1 - y, y)
        yl = y < 0
        y = jnp.where(yl, -y - 1, y)
        x = jnp.where(yl, side - 1 - x, x)
        yh = y > side - 1
        y = jnp.where(yh, 2 * side - 1 - y, y)
        x = jnp.where(yh, side - 1 - x, x)
        return x, y

    x, y = wrap_once(x, y)
    x, y = wrap_once(x, y)  # corners need two passes
    return jnp.clip(x, 0, side - 1), jnp.clip(y, 0, side - 1)


def oct_bilinear_sample(atlas: jax.Array, probe_idx: jax.Array, dirs: jax.Array):
    """Bilinear sample of a borderless oct atlas (P,S,S,C) at directions
    dirs (...,3) for probes probe_idx (...,). Returns (...,C)."""
    P, S, _, C = atlas.shape
    oct = direction_to_octahedral(dirs)  # (...,2) in [-1,1]
    tx = (oct[..., 0] * 0.5 + 0.5) * S - 0.5
    ty = (oct[..., 1] * 0.5 + 0.5) * S - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = (tx - x0)[..., None]
    fy = (ty - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = atlas.reshape(P * S * S, C)

    from hybrid_rendering_tpu.ops.filters import take_rows

    def tap(xi, yi):
        xw, yw = _wrap_oct_coords(xi, yi, S)
        return take_rows(flat, probe_idx * (S * S) + yw * S + xw)

    v00 = tap(x0, y0)
    v10 = tap(x0 + 1, y0)
    v01 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


# ---------------------------------------------------------------------------
# sample_irradiance (gi_common.glsl:188-320)
# ---------------------------------------------------------------------------


def sample_irradiance(
    grid: ProbeGrid,
    state: DDGIState,
    cfg: DDGIConfig,
    p: jax.Array,  # (...,3) world position
    n: jax.Array,  # (...,3) normal
    wo: jax.Array,  # (...,3) toward viewer
):
    """8-probe trilinear cage with wrap-shaded backface + Chebyshev
    visibility weights; sqrt-space blending; returns 0.5*pi*E*energy."""
    counts = jnp.asarray(grid.counts, jnp.int32)
    start = jnp.asarray(grid.start)
    step = jnp.asarray(grid.step)
    stride = jnp.asarray(
        [1, grid.counts[0], grid.counts[0] * grid.counts[1]], jnp.int32
    )

    base = jnp.clip(
        jnp.floor((p - start) / step).astype(jnp.int32), 0, counts - 1
    )
    base_pos = start + base.astype(jnp.float32) * step
    alpha = jnp.clip((p - base_pos) / step, 0.0, 1.0)

    bias = (n + 3.0 * wo) * cfg.normal_bias

    sum_irr = 0.0
    sum_w = 0.0
    for i in range(8):
        offset = jnp.asarray([i & 1, (i >> 1) & 1, (i >> 2) & 1], jnp.int32)
        coord = jnp.clip(base + offset, 0, counts - 1)
        pidx = jnp.sum(coord * stride, axis=-1)
        probe_pos = start + coord.astype(jnp.float32) * step

        probe_to_point = p - probe_pos + bias
        dir_ = normalize(-probe_to_point)

        trilinear = jnp.where(
            offset.astype(bool), alpha, 1.0 - alpha
        )
        tri_w = trilinear[..., 0] * trilinear[..., 1] * trilinear[..., 2]

        # wrap-shaded backface (gi_common.glsl:252)
        true_dir = normalize(probe_pos - p)
        w = jnp.square(
            jnp.maximum(1e-4, (dot(true_dir, n) + 1.0) * 0.5)
        ) + 0.2

        if cfg.visibility_test:
            dist = jnp.sqrt(
                jnp.maximum(jnp.sum(probe_to_point * probe_to_point, -1), 1e-12)
            )
            temp = oct_bilinear_sample(state.depth, pidx, -dir_)
            mean = temp[..., 0]
            variance = jnp.abs(jnp.square(temp[..., 0]) - temp[..., 1])
            cheb = variance / (
                variance + jnp.square(jnp.maximum(dist - mean, 0.0)) + 1e-12
            )
            cheb = jnp.maximum(cheb * cheb * cheb, 0.0)
            w = w * jnp.where(dist <= mean, 1.0, cheb)

        w = jnp.maximum(1e-6, w)
        # crush tiny weights (gi_common.glsl:288-291)
        crush = 0.2
        w = jnp.where(w < crush, w * w * w / (crush * crush), w)
        w = w * tri_w

        probe_irr = oct_bilinear_sample(state.irradiance, pidx, n)
        probe_irr = jnp.sqrt(jnp.maximum(probe_irr, 0.0))  # LINEAR_BLENDING==0

        sum_irr = sum_irr + w[..., None] * probe_irr
        sum_w = sum_w + w

    net = sum_irr / jnp.maximum(sum_w, 1e-9)[..., None]
    net = jnp.square(net) * cfg.energy_preservation
    # Energy calibration: a cosine-weighted probe texel stores
    # (integral L cos dw) / (integral cos dw) = E/pi, and deferred shading
    # multiplies the sampled value straight by albedo (deferred.frag:162,
    # no pi divide) — the Lambertian-exact chain is albedo x texel. The
    # reference scales by an extra 0.5*pi here (gi_common.glsl:316),
    # overshooting its own path-traced GT by 4/3 x energy_preservation
    # (measured +28% mean brightness on converged gi_test); it never
    # compares against GT numerically, our fidelity gate does.
    return net


def visualize_probes(
    grid: ProbeGrid,
    state: DDGIState,
    cfg: DDGIConfig,
    camera,
    base_image: jax.Array,  # (H,W,3) to composite over
    gb_depth: jax.Array,  # (H,W) scene ndc depth for occlusion
    radius: float = 0.12,
):
    """Probe visualization — the reference draws instanced spheres colored
    by atlas irradiance (gi_probe_visualization.vert/.frag, drawn by
    deferred shading, deferred_shading.cpp:825-866). Here each probe
    splats a depth-tested disc colored by its mean atlas irradiance
    (P is small, so the P x pixels test is a cheap dense op)."""
    H, W = gb_depth.shape
    pos = probe_positions(grid)  # (P,3)
    P = pos.shape[0]
    color = jnp.mean(state.irradiance, axis=(1, 2))  # (P,3)

    ph = jnp.concatenate([pos, jnp.ones((P, 1))], axis=1)
    clip = ph @ camera.view_proj.T
    wsign = jnp.sign(clip[:, 3:4])
    ndc = clip[:, :3] / jnp.maximum(jnp.abs(clip[:, 3:4]), 1e-8) * wsign
    in_front = clip[:, 3] > 0.0
    sx = (ndc[:, 0] * 0.5 + 0.5) * W
    sy = (1.0 - ndc[:, 1]) * 0.5 * H
    depth = ndc[:, 2]
    # screen-space radius ~ radius / distance
    view = ph @ camera.view.T
    dist = jnp.maximum(-view[:, 2], 1e-3)
    pix_r = radius / dist * W * 0.5

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    out = base_image
    zbuf = gb_depth

    def body(i, carry):
        out, zbuf = carry
        dx = xx - sx[i]
        dy = yy - sy[i]
        inside = (dx * dx + dy * dy <= pix_r[i] * pix_r[i]) & in_front[i]
        visible = inside & (depth[i] <= zbuf)
        out = jnp.where(visible[..., None], color[i], out)
        zbuf = jnp.where(visible, depth[i], zbuf)
        return out, zbuf

    out, _ = jax.lax.fori_loop(0, P, body, (out, zbuf))
    return out


def make_irradiance_sampler(grid: ProbeGrid, cfg: DDGIConfig):
    """Returns sample(state, p, n, wo) -> (...,3). On TPU backends this is
    the tile-windowed Pallas kernel (ops/pallas/ddgi_sample.py: zero
    gathers); elsewhere the reference-faithful XLA version."""
    from hybrid_rendering_tpu.ops.bvh import _is_tpu_backend

    if _is_tpu_backend():
        from hybrid_rendering_tpu.ops.pallas.ddgi_sample import (
            make_fast_sampler,
        )

        return make_fast_sampler(grid, cfg, interpret=False)

    def sample(state, p, n, wo, valid=None):
        # per-point evaluation: validity only matters for the Pallas
        # kernel's shared tile windows
        return sample_irradiance(grid, state, cfg, p, n, wo)

    return sample


# ---------------------------------------------------------------------------
# Per-frame update
# ---------------------------------------------------------------------------


def _spherical_fibonacci(n: int) -> np.ndarray:
    """(n,3) spherical Fibonacci directions (gi_ray_trace.rgen:61-72)."""
    i = np.arange(n, dtype=np.float64)
    phi_g = np.sqrt(5.0) * 0.5 + 0.5
    frac = (i * (phi_g - 1.0)) % 1.0
    phi = 2.0 * np.pi * frac
    cos_theta = 1.0 - (2.0 * i + 1.0) / n
    sin_theta = np.sqrt(np.clip(1.0 - cos_theta**2, 0.0, 1.0))
    return np.stack(
        [np.cos(phi) * sin_theta, np.sin(phi) * sin_theta, cos_theta], -1
    ).astype(np.float32)


def _direction_sort_perm(dirs: jax.Array) -> jax.Array:
    """Permutation grouping unit directions into coherent cones: sort by
    a 4+4-bit Morton code of the octahedral map. Consecutive chunks of
    the permuted array then span ~1/32 of the sphere, which is what makes
    probe-ray packets culled well by the FlashTrace prepass (a packet's
    direction interval no longer straddles zero on every axis)."""
    a = jnp.sum(jnp.abs(dirs), axis=-1, keepdims=True)
    n = dirs / jnp.maximum(a, 1e-12)
    sx = jnp.where(n[:, 0] >= 0, 1.0, -1.0)
    sy = jnp.where(n[:, 1] >= 0, 1.0, -1.0)
    up = n[:, 2] >= 0
    u = jnp.where(up, n[:, 0], (1.0 - jnp.abs(n[:, 1])) * sx)
    v = jnp.where(up, n[:, 1], (1.0 - jnp.abs(n[:, 0])) * sy)
    qu = jnp.clip(((u * 0.5 + 0.5) * 16.0).astype(jnp.int32), 0, 15)
    qv = jnp.clip(((v * 0.5 + 0.5) * 16.0).astype(jnp.int32), 0, 15)
    key = jnp.zeros_like(qu)
    for b in range(4):
        key = key | (((qu >> b) & 1) << (2 * b)) | (((qv >> b) & 1) << (2 * b + 1))
    return jnp.argsort(key).astype(jnp.int32)


def _morton3_np(x, y, z):
    """Interleaved 3-D Morton code (numpy, 10 bits/axis)."""
    code = np.zeros_like(x, dtype=np.int64)
    for b in range(10):
        code |= ((x >> b) & 1) << (3 * b)
        code |= ((y >> b) & 1) << (3 * b + 1)
        code |= ((z >> b) & 1) << (3 * b + 2)
    return code


def _probe_tile_perm(counts, tile: int):
    """Static (numpy) probe permutation into spatially-compact tiles:
    Morton order over grid coords, padded to a multiple of `tile` by
    repeating the last probe. Returns (perm (P_pad,), inv_rows (P,)):
    perm[slot] = original x-major probe index; inv_rows[p] = first slot
    holding probe p."""
    px, py, pz = counts
    zz, yy, xx = np.meshgrid(
        np.arange(pz), np.arange(py), np.arange(px), indexing="ij"
    )
    xs = xx.reshape(-1)
    ys = yy.reshape(-1)
    zs = zz.reshape(-1)
    linear = xs + px * (ys + py * zs)  # x-major index of each meshgrid row
    order = np.argsort(_morton3_np(xs, ys, zs), kind="stable")
    perm = linear[order].astype(np.int32)
    P = perm.shape[0]
    p_pad = -(-P // tile) * tile
    perm = np.concatenate([perm, np.full(p_pad - P, perm[-1], np.int32)])
    inv = np.zeros(P, np.int64)
    for s in range(p_pad - 1, -1, -1):  # first occurrence wins
        inv[perm[s]] = s
    return perm, inv.astype(np.int32)


# packet geometry for the coherent probe-ray layout: PACKET rays per
# FlashTrace packet = (PACKET // DIR_CHUNK probes) x (DIR_CHUNK cone
# directions). Smaller DIR_CHUNK = tighter cones but wider probe tiles.
_PACKET = int(os.environ.get("FLASH_RAY_TILE", "256"))
DIR_CHUNK = int(os.environ.get("DDGI_DIR_CHUNK", "8"))
COHERENT_RAYS = os.environ.get("DDGI_COHERENT", "1") == "1"


def _random_rotation(frame_index) -> jax.Array:
    """Per-frame random rotation matrix (host mt19937 in the reference,
    ddgi.cpp:788; here a hash-seeded on-device quaternion)."""
    seed = jnp.asarray(frame_index, jnp.uint32)
    u = rng_ops.uint_to_unit_float(rng_ops.wang_hash(seed * 3 + 1))
    v = rng_ops.uint_to_unit_float(rng_ops.wang_hash(seed * 3 + 2))
    w = rng_ops.uint_to_unit_float(rng_ops.wang_hash(seed * 3 + 3))
    # Shoemake uniform random quaternion
    q = jnp.stack(
        [
            jnp.sqrt(1 - u) * jnp.sin(2 * jnp.pi * v),
            jnp.sqrt(1 - u) * jnp.cos(2 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2 * jnp.pi * w),
        ]
    )
    x, y, z, s = q[0], q[1], q[2], q[3]
    return jnp.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - s * z), 2 * (x * z + s * y)],
            [2 * (x * y + s * z), 1 - 2 * (x * x + z * z), 2 * (y * z - s * x)],
            [2 * (x * z - s * y), 2 * (y * z + s * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def ddgi_update(
    scene: SceneArrays,
    closest_surface_fn: Callable,
    visibility_fn: Callable,
    grid: ProbeGrid,
    state: DDGIState,
    light: Light,
    sky_radiance_fn: Callable,
    frame_index,
    cfg: DDGIConfig,
    sampler=None,  # make_irradiance_sampler product (fast path on TPU)
):
    """One DDGI frame: ray trace + irradiance/depth probe update
    (ddgi.cpp:89-104). Returns new DDGIState."""
    P = grid.num_probes
    R = cfg.rays_per_probe

    fib = jnp.asarray(_spherical_fibonacci(R))
    rot = _random_rotation(frame_index)
    ray_dirs = normalize(fib @ rot.T)  # (R,3) shared by all probes

    origins = probe_positions(grid)  # (P,3)

    # Coherent packetization (the probe update is otherwise the most
    # incoherent trace in the frame: one origin, full-sphere directions
    # per packet -> the sparse prepass can cull nothing). Reorder rays as
    # (probe tile x direction cone) packets: Morton-tiled probes supply a
    # compact origin box, Morton-octahedral-sorted directions a narrow
    # cone, so per-packet cluster lists become short. All per-ray math is
    # order-independent; the accumulation einsum gets the matching layout
    # via _unpack below, and ray_dirs itself is re-ordered once so texel
    # cos-weights line up with the permuted ray axis.
    coherent = COHERENT_RAYS and R % DIR_CHUNK == 0 and P * R >= _PACKET
    if coherent:
        DC = DIR_CHUNK
        PT = _PACKET // DC
        perm_d = _direction_sort_perm(ray_dirs)
        ray_dirs = ray_dirs[perm_d]
        perm_p, inv_rows = _probe_tile_perm(grid.counts, PT)
        p_pad = perm_p.shape[0]
        n_pt, n_dc = p_pad // PT, R // DC
        origins_t = origins[jnp.asarray(perm_p)]  # (p_pad, 3)
        o = jnp.broadcast_to(
            origins_t.reshape(n_pt, 1, PT, 1, 3),
            (n_pt, n_dc, PT, DC, 3)).reshape(-1, 3)
        d = jnp.broadcast_to(
            ray_dirs.reshape(1, n_dc, 1, DC, 3),
            (n_pt, n_dc, PT, DC, 3)).reshape(-1, 3)
        N = p_pad * R
        idx = jnp.arange(N, dtype=jnp.uint32)
        ray_slot = ((idx // (PT * DC)) % n_dc) * DC + idx % DC
        # rng streams keyed by the ORIGINAL Fibonacci index, so per-ray
        # randomness is identical in both layouts (determinism under the
        # DDGI_COHERENT toggle)
        ray_ids = perm_d.astype(jnp.uint32)[ray_slot]
        probe_slot = (idx // (n_dc * PT * DC)) * PT + (idx // DC) % PT
        probe_ids = jnp.asarray(perm_p).astype(jnp.uint32)[probe_slot]

        def _unpack(x):
            """Packet-ordered (N, C?) -> (P, R, C?) in original probe
            order; the ray axis stays in permuted-direction order,
            matching the re-ordered ray_dirs."""
            c = x.shape[1] if x.ndim == 2 else 1
            y = x.reshape(n_pt, n_dc, PT, DC, c)
            y = y.transpose(0, 2, 1, 3, 4).reshape(p_pad, R, c)
            y = y[jnp.asarray(inv_rows)]
            return y if x.ndim == 2 else y[..., 0]
    else:
        o = jnp.broadcast_to(origins[:, None, :], (P, R, 3)).reshape(-1, 3)
        d = jnp.broadcast_to(ray_dirs[None, :, :], (P, R, 3)).reshape(-1, 3)
        N = P * R
        idx = jnp.arange(N, dtype=jnp.uint32)
        ray_ids = idx % jnp.uint32(R)
        probe_ids = idx // jnp.uint32(R)

        def _unpack(x):
            return x.reshape((P, R) + x.shape[1:])

    hit, surf = closest_surface_fn(o, d, 1e4)

    # --- shade (gi_ray_trace.rchit:95-128) ---
    f0 = brdf_ops.f0_from_metallic(surf.albedo, surf.metallic)
    c_diff = surf.albedo * (1.0 - f0) * (1.0 - surf.metallic[:, None])
    rng = rng_ops.rng_init(ray_ids, probe_ids, frame_index)
    rng, rs = rng_ops.next_vec2(rng)
    rng, rsky = rng_ops.next_vec2(rng)
    radiance = direct_lighting(
        light, -d, surf.normal, surf.position, f0, c_diff, surf.roughness,
        visibility_fn=visibility_fn,
        rng_shadow=rs,
        rng_sky=rsky,
        sky_radiance_fn=sky_radiance_fn,
    ) + surf.emissive

    # infinite bounces from the previous frame's grid (rchit:123-124,
    # gated on first frame, ddgi.cpp:790)
    if cfg.infinite_bounces:
        if sampler is not None:
            bounce = sampler(state, surf.position, surf.normal, -d,
                             valid=hit.valid)
        else:
            bounce = sample_irradiance(
                grid, state, cfg, surf.position, surf.normal, -d
            )
        gate = (state.first_frame == 0).astype(jnp.float32)
        # kD x c_diffuse x irradiance — gi_ray_trace.rchit:82-88 weights
        # the bounce by (1 - fresnel_schlick_roughness)(1 - metallic) too
        kd = brdf_ops.kd_indirect(surf.normal, -d, f0, surf.roughness,
                                  surf.metallic)
        radiance = radiance + (
            kd * c_diff * bounce * cfg.infinite_bounce_intensity * gate
        )

    # Backface suppression (Majercik et al. 2019 §4.2; the reference's
    # gi_ray_trace.rgen has no equivalent and its GT is never compared
    # numerically). Probes in the AABB padding layers sit behind walls /
    # above ceilings; their rays strike geometric BACK faces which the
    # two-sided shader would light as if front-lit (e.g. the sunlit top
    # of a ceiling), and that energy leaked into every boundary cage —
    # measured 2.03x GT irradiance at the gi_test ceiling. Zero the
    # radiance and store a 0.2x-shortened visibility distance so the
    # Chebyshev test crushes these probes' sample weights.
    backface = hit.valid & jnp.logical_not(surf.frontface)
    radiance = jnp.where(backface[:, None], 0.0, radiance)

    env = sky_radiance_fn(d)
    radiance = jnp.where(hit.valid[:, None], radiance, env)
    # Match the GT oracle's per-sample clamp (RADIANCE_CLAMP_COLOR = 1,
    # ground_truth_path_trace.rgen:93-95): the GT image the fidelity gate
    # compares against clips every path's radiance at 1.0, so bright
    # sub-1%-area spots (sunlit patches at radiance ~5) must not pour
    # unclamped energy into the probes. See DDGIConfig.probe_radiance_clamp.
    if cfg.probe_radiance_clamp > 0.0:
        radiance = jnp.minimum(radiance, cfg.probe_radiance_clamp)
    hit_dist = jnp.where(
        hit.valid, jnp.where(backface, hit.t * 0.2, hit.t), -1.0
    )
    # back to (P, R, .) in original probe order for the accumulation
    radiance = _unpack(radiance)  # (P, R, 3)
    hit_dist = _unpack(hit_dist)  # (P, R)

    # --- probe update as shared-weight matmuls (gi_probe_update.glsl) ---
    # physically 1.0; the reference's 0.95 (gi_probe_update.glsl) stacks
    # with energy_preservation into a 19% indirect-light deficit vs GT
    energy_conservation = 1.0

    # hysteresis warm-up: exact running mean of the first frames, easing
    # into the reference's 0.98 EMA (see DDGIState.accum_frames)
    n_acc = (state.accum_frames if state.accum_frames is not None
             else jnp.int32(0)).astype(jnp.float32)
    h_eff = jnp.minimum(jnp.float32(cfg.hysteresis), n_acc / (n_acc + 1.0))

    def update_atlas(values, side, weights_pow, prev, hysteresis):
        texel_dirs = _texel_directions(side)  # (T,3)
        cosw = jnp.maximum(0.0, texel_dirs @ ray_dirs.T)  # (T,R)
        w = cosw if weights_pow is None else jnp.power(cosw, weights_pow)
        w = jnp.where(w >= 1e-8, w, 0.0)
        total = jnp.sum(w, axis=1)  # (T,) same for all probes
        C = values.shape[-1]
        vals = values  # (P, R, C)
        acc = jnp.einsum(
            "tr,prc->ptc", w, vals, preferred_element_type=jnp.float32
        )
        result = acc / jnp.maximum(total, 1e-8)[None, :, None]
        result = result.reshape(P, side, side, C)
        blended = result * (1.0 - h_eff) + prev * h_eff
        out = jnp.where(state.first_frame > 0, result, blended)
        return out

    irr = update_atlas(
        radiance * energy_conservation, cfg.irradiance_oct_size, None,
        state.irradiance, cfg.hysteresis,
    )

    depth_dist = jnp.where(
        hit_dist < 0.0, grid.max_distance,
        jnp.clip(hit_dist - 0.01, 0.0, grid.max_distance),
    )
    depth_vals = jnp.stack([depth_dist, depth_dist * depth_dist], -1)
    dep = update_atlas(
        depth_vals, cfg.depth_oct_size, cfg.depth_sharpness,
        state.depth, cfg.hysteresis,
    )

    n_prev = (state.accum_frames if state.accum_frames is not None
              else jnp.int32(0))
    return DDGIState(irradiance=irr, depth=dep, first_frame=jnp.int32(0),
                     accum_frames=n_prev + 1)


def sample_probe_grid_screen(
    grid: ProbeGrid,
    state: DDGIState,
    cfg: DDGIConfig,
    gb: GBuffer,
    camera_position: jax.Array,
    sampler=None,
):
    """Full-screen indirect-diffuse texture (gi_sample_probe_grid.comp:
    75-99) consumed by deferred shading."""
    wo = normalize(camera_position - gb.position)
    if sampler is not None:
        irr = sampler(state, gb.position, gb.normal, wo,
                      valid=gb.mesh_id >= 0)
    else:
        irr = sample_irradiance(grid, state, cfg, gb.position, gb.normal, wo)
    irr = irr * cfg.gi_intensity
    return jnp.where((gb.mesh_id >= 0)[..., None], irr, 0.0)
