"""Fused a-trous denoiser iterations — row-band Pallas stencils.

The XLA formulation of the SVGF a-trous filter (ops/filters.py
atrous_iteration) builds every tap as pad+slice, which materializes each
shifted plane through HBM (~40 shifted copies of (H, W) planes per
full-res iteration; the shadows denoise tail measured ~40 ms at 1080p).

Here each iteration is ONE pallas_call gridded over row bands: the band
plus its halo is DMA'd from the edge-padded HBM canvases into VMEM, all
9 taps are static slices (pure vector shifts), and only the band rows
are written back. A whole-image single-call variant was tried first and
stalled the Mosaic compiler at 1080p; banding keeps the vector types
small. The feedback iteration's output (the temporal history copy,
ray_traced_shadows.cpp:1177-1207) falls out of the per-iteration loop.

Signals: single-channel (shadows visibility, AO) or RGB (reflections);
weights follow edge_stopping.glsl + the variance-driven luma phi.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

_ATROUS_KERNEL = (1.0, 2.0 / 3.0, 1.0 / 6.0)  # matches ops/filters.py

# rows per grid step (plus 2M halo rows in the slab DMA). Mosaic compile
# time is strongly superlinear in the output-block AREA — measured r4 on
# the 4-step 1080p chain: (128, 1920) blocks = 82.7 s compile / 4.06 ms,
# (32, 1920) = 8.9 s / 3.19 ms (identical sums) — so the band is picked
# to keep blocks near _BLOCK_AREA f32 elements instead of a fixed height.
_BAND = int(os.environ.get("HR_STENCIL_BAND", "0"))  # 0 = auto
_BLOCK_AREA = 64 * 1024


def _pick_band(H: int, W: int) -> int:
    h8 = -(-H // 8) * 8
    if _BAND:
        return min(_BAND, h8)
    band = max(8, min(128, _BLOCK_AREA // max(W, 1)))
    band = 1 << (band.bit_length() - 1)  # floor to a power of two
    return min(band, h8)


def _make_step_kernel(H, W, WP, M, BAND, step, radius, phi_color,
                      phi_normal, sigma_depth, masked, C):
    n_in = C + 5  # color planes + var + nx + ny + nz + z (padded canvases)

    def kernel(*refs):
        in_refs = refs[:n_in]
        mask_ref = refs[n_in]
        out_refs = refs[n_in + 1:n_in + 1 + C + 1]  # C color + var
        sems = refs[n_in + 1 + C + 1]
        slabs = refs[n_in + 2 + C + 1:]  # one VMEM slab per padded input

        b = pl.program_id(0)
        row0 = b * BAND  # top of this band in PADDED coords - M offset

        # DMA the band + halo of every canvas into VMEM
        copies = [
            pltpu.make_async_copy(
                r.at[pl.ds(row0, BAND + 2 * M), :], s.at[...],
                sems.at[i],
            )
            for i, (r, s) in enumerate(zip(in_refs, slabs))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        sc_cs = slabs[0:C]
        sc_v = slabs[C]
        sn_x, sn_y, sn_z, sz = slabs[C + 1:C + 5]

        def tap(canvas, dy, dx):
            return canvas[M + dy:M + dy + BAND, M + dx:M + dx + W]

        lw = (0.299, 0.587, 0.114)

        def luma(dy, dx):
            if C == 1:
                return tap(sc_cs[0], dy, dx)
            return jnp.maximum(
                sum(w * tap(sc, dy, dx) for w, sc in zip(lw, sc_cs)),
                1e-4)

        n0x = tap(sn_x, 0, 0)
        n0y = tap(sn_y, 0, 0)
        n0z = tap(sn_z, 0, 0)
        z0 = tap(sz, 0, 0)
        l0 = luma(0, 0)

        vb = jnp.zeros((BAND, W), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                vb = vb + tap(sc_v, dy, dx)
        phi_l = phi_color * jnp.sqrt(jnp.maximum(vb / 9.0, 1e-10))

        sum_cs = [jnp.zeros((BAND, W), jnp.float32) for _ in range(C)]
        sum_v = jnp.zeros((BAND, W), jnp.float32)
        sum_w = jnp.zeros((BAND, W), jnp.float32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                k = _ATROUS_KERNEL[abs(dy)] * _ATROUS_KERNEL[abs(dx)]
                oy, ox = dy * step, dx * step
                ndot = jnp.clip(
                    n0x * tap(sn_x, oy, ox) + n0y * tap(sn_y, oy, ox)
                    + n0z * tap(sn_z, oy, ox), 0.0, 1.0)
                wn = ndot ** phi_normal
                dz = jnp.abs(z0 - tap(sz, oy, ox))
                wz = jnp.exp(-dz / (sigma_depth * abs(step) + 1e-4))
                wl = jnp.exp(-jnp.abs(l0 - luma(oy, ox))
                             / jnp.maximum(phi_l, 1e-6))
                w = k * wn * wz * wl
                for c in range(C):
                    sum_cs[c] = sum_cs[c] + tap(sc_cs[c], oy, ox) * w
                sum_v = sum_v + tap(sc_v, oy, ox) * w * w
                sum_w = sum_w + w
        inv_w = 1.0 / jnp.maximum(sum_w, 1e-8)
        new_cs = [s * inv_w for s in sum_cs]
        new_v = sum_v / jnp.maximum(sum_w * sum_w, 1e-8)
        if masked:
            mask = mask_ref[:] > 0.5
            new_cs = [jnp.where(mask, nc, tap(sc, 0, 0))
                      for nc, sc in zip(new_cs, sc_cs)]
            new_v = jnp.where(mask, new_v, tap(sc_v, 0, 0))
        for orf, nc in zip(out_refs[:C], new_cs):
            orf[:] = nc
        out_refs[C][:] = new_v

    return kernel


def _atrous_step(planes, var, guides, mask, *, step, radius, phi_color,
                 phi_normal, sigma_depth, masked, interpret):
    """One a-trous iteration. planes: list of C (H, W) color planes;
    guides: [nx, ny, nz, z] (H, W)."""
    C = len(planes)
    H, W = planes[0].shape
    M = -(-(step * radius) // 8) * 8
    BAND = _pick_band(H, W)
    HB = -(-H // BAND) * BAND
    WP = -(-(W + 2 * M) // 128) * 128

    def pad_c(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((M, HB - H + M), (M, WP - W - M)), mode="edge")

    ins = [pad_c(p) for p in planes] + [pad_c(var)] + [
        pad_c(g) for g in guides]
    n_in = len(ins)
    kernel = _make_step_kernel(H, W, WP, M, BAND, int(step), int(radius),
                               float(phi_color), float(phi_normal),
                               float(sigma_depth), bool(masked), C)
    outs = pl.pallas_call(
        kernel,
        grid=(HB // BAND,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in
        + [pl.BlockSpec((BAND, W), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((BAND, W), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)] * (C + 1),
        out_shape=[jax.ShapeDtypeStruct((HB, W), jnp.float32)] * (C + 1),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_in,))]
        + [pltpu.VMEM((BAND + 2 * M, WP), jnp.float32)] * n_in,
        # slab scratch + live tap vectors exceed the 16 MB default scoped
        # limit at full res; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins, jnp.pad(mask.astype(jnp.float32), ((0, HB - H), (0, 0))))
    new_planes = [o[:H] for o in outs[:C]]
    new_var = outs[C][:H]
    return new_planes, new_var


@functools.partial(
    jax.jit,
    static_argnames=("steps", "radius", "phi_color", "phi_normal",
                     "sigma_depth", "feedback_iteration", "masked",
                     "interpret"),
)
def atrous_chain(color, variance, normal, depth, mask, *, steps,
                 radius=1, phi_color=10.0, phi_normal=32.0,
                 sigma_depth=1.0, feedback_iteration=1, masked=True,
                 interpret=False):
    """Run the SVGF a-trous chain as banded Pallas stencils.

    color: (H, W) or (H, W, 3); variance/depth: (H, W); normal (H, W, 3);
    mask (H, W) bool. Returns (final_color, feedback_color, variance) —
    feedback is the output of `feedback_iteration`.
    """
    C = 1 if color.ndim == 2 else color.shape[-1]
    planes = ([color] if C == 1
              else [color[..., c] for c in range(C)])
    guides = [normal[..., 0], normal[..., 1], normal[..., 2], depth]

    var = variance
    # feedback_iteration out of range -> history keeps the pre-filter
    # input, matching the XLA chains in shadows.py/reflections.py
    # (advisor r2: the old `fb = final output` fallback made TPU and CPU
    # temporal history diverge for short chains)
    fb = planes
    for it, step in enumerate(steps):
        planes, var = _atrous_step(
            planes, var, guides, mask, step=step, radius=radius,
            phi_color=phi_color, phi_normal=phi_normal,
            sigma_depth=sigma_depth, masked=masked, interpret=interpret)
        if it == feedback_iteration:
            fb = planes

    def pack(ps):
        return ps[0] if C == 1 else jnp.stack(ps, axis=-1)

    return pack(planes), pack(fb), var


def _make_blur_kernel(W, WP, M, BAND, radius, sigma, depth_phi,
                      normal_power, masked):
    n_in = 5  # img + nx + ny + nz + z

    def kernel(*refs):
        in_refs = refs[:n_in]
        mask_ref = refs[n_in]
        out_ref = refs[n_in + 1]
        sems = refs[n_in + 2]
        slabs = refs[n_in + 3:]

        b = pl.program_id(0)
        copies = [
            pltpu.make_async_copy(
                r.at[pl.ds(b * BAND, BAND + 2 * M), :], s.at[...],
                sems.at[i])
            for i, (r, s) in enumerate(zip(in_refs, slabs))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        s_img, sn_x, sn_y, sn_z, sz = slabs

        gauss = [float(np.exp(-(o * o) / (2.0 * sigma * sigma)))
                 for o in range(-radius, radius + 1)]

        # vertical pass over the full slab width (keeps the horizontal
        # halo usable for the second pass)
        HS = BAND + 2 * M

        def v_tap(c, dy, y0, rows):
            return c[y0 + dy:y0 + dy + rows, :]

        y0 = radius  # vertical pass valid rows [radius, HS - radius)
        rows = HS - 2 * radius
        n0x = v_tap(sn_x, 0, y0, rows)
        n0y = v_tap(sn_y, 0, y0, rows)
        n0z = v_tap(sn_z, 0, y0, rows)
        z0 = v_tap(sz, 0, y0, rows)
        acc = jnp.zeros((rows, WP), jnp.float32)
        wsum = jnp.zeros((rows, WP), jnp.float32)
        for i, dy in enumerate(range(-radius, radius + 1)):
            ndot = jnp.clip(
                n0x * v_tap(sn_x, dy, y0, rows)
                + n0y * v_tap(sn_y, dy, y0, rows)
                + n0z * v_tap(sn_z, dy, y0, rows), 0.0, 1.0)
            wn = ndot ** normal_power
            wz = jnp.exp(-jnp.abs(z0 - v_tap(sz, dy, y0, rows)) / depth_phi)
            w = gauss[i] * wn * wz
            acc = acc + v_tap(s_img, dy, y0, rows) * w
            wsum = wsum + w
        vimg = acc / jnp.maximum(wsum, 1e-8)  # (rows, WP)

        # horizontal pass on the band rows only
        r0 = M - radius  # band top within vimg coords
        def h_tap(c, dx):
            return c[r0:r0 + BAND, M + dx:M + dx + W]

        def g_tap(c, dx):
            return c[M:M + BAND, M + dx:M + dx + W]

        n0x = g_tap(sn_x, 0)
        n0y = g_tap(sn_y, 0)
        n0z = g_tap(sn_z, 0)
        z0 = g_tap(sz, 0)
        acc = jnp.zeros((BAND, W), jnp.float32)
        wsum = jnp.zeros((BAND, W), jnp.float32)
        for i, dx in enumerate(range(-radius, radius + 1)):
            ndot = jnp.clip(
                n0x * g_tap(sn_x, dx) + n0y * g_tap(sn_y, dx)
                + n0z * g_tap(sn_z, dx), 0.0, 1.0)
            wn = ndot ** normal_power
            wz = jnp.exp(-jnp.abs(z0 - g_tap(sz, dx)) / depth_phi)
            w = gauss[i] * wn * wz
            acc = acc + h_tap(vimg, dx) * w
            wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)
        if masked:
            mask = mask_ref[:] > 0.5
            out = jnp.where(mask, out, g_tap(s_img, 0))
        out_ref[:] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("radius", "depth_phi", "normal_power", "masked",
                     "interpret"),
)
def bilateral_blur(img, normal, depth, mask, *, radius=4, depth_phi=1.0,
                   normal_power=32.0, masked=True, interpret=False):
    """Banded Pallas version of ops/filters.bilateral_blur_separable
    (ao_denoise_bilateral_blur.comp:75-110): vertical then horizontal
    Gaussian with depth/normal edge stops, fused into one call."""
    H, W = img.shape
    sigma = radius / 1.5
    M = -(-radius // 8) * 8
    BAND = _pick_band(H, W)
    HB = -(-H // BAND) * BAND
    WP = -(-(W + 2 * M) // 128) * 128

    def pad_c(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((M, HB - H + M), (M, WP - W - M)), mode="edge")

    ins = [pad_c(img), pad_c(normal[..., 0]), pad_c(normal[..., 1]),
           pad_c(normal[..., 2]), pad_c(depth)]
    kernel = _make_blur_kernel(W, WP, M, BAND, int(radius), float(sigma),
                               float(depth_phi), float(normal_power),
                               bool(masked))
    out = pl.pallas_call(
        kernel,
        grid=(HB // BAND,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5
        + [pl.BlockSpec((BAND, W), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BAND, W), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HB, W), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((5,))]
        + [pltpu.VMEM((BAND + 2 * M, WP), jnp.float32)] * 5,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins, jnp.pad(mask.astype(jnp.float32), ((0, HB - H), (0, 0))))
    return out[:H]
