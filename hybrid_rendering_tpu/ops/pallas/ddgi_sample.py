"""Pallas DDGI irradiance sampling — gather-free probe-cage evaluation.

``sample_irradiance`` (gi_common.glsl:188-320) needs, per shaded point, 8
cage probes x (4 bilinear irradiance taps + 1 depth tap) from the probe
atlases. As XLA gathers those run on the TPU scalar core (~7 cycles per
element — measured ~2.1 s/frame at 1080p-half with 1156 probes). This
kernel restructures the whole pass around tile locality:

  - points are processed in 256-point tiles; coherent tiles (16x16 pixel
    blocks, or per-probe ray batches) share a 3x3x3 probe WINDOW whose
    base coordinate is scalar-prefetched;
  - both atlases live fully in VMEM (1156 probes -> 0.9 MB + 2.4 MB);
    the 27 window probe rows are copied to scratch per tile;
  - per-point probe selection is a (256, 32) one-hot matmul on the MXU;
    octahedral texel selection is a weighted lane mask + a (lanes, C)
    channel-collector matmul — zero gathers anywhere.

Points whose cage exceeds the tile window clamp to the window edge (rare
in coherent tiles; equivalent to sampling a neighboring probe).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PTS = 256
W_PROBES = 144  # 3x3 (y,z) window rows x 16-probe aligned x-runs


def _sign_not_zero(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def _oct_encode_cols(dx, dy, dz):
    """Octahedral encode on separate component columns (...,)->(u, v)."""
    denom = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
    denom = jnp.maximum(denom, 1e-8)
    px = dx / denom
    py = dy / denom
    fold_x = (1.0 - jnp.abs(py)) * _sign_not_zero(px)
    fold_y = (1.0 - jnp.abs(px)) * _sign_not_zero(py)
    neg = dz < 0.0
    return jnp.where(neg, fold_x, px), jnp.where(neg, fold_y, py)


def _oct_texel_taps_cols(dx, dy, dz, side):
    """4 bilinear octahedral taps from component columns: returns list of
    (texel_index, weight)."""
    u, v = _oct_encode_cols(dx, dy, dz)
    tx = (u * 0.5 + 0.5) * side - 0.5
    ty = (v * 0.5 + 0.5) * side - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def wrap(x, y):
        def once(x, y):
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

        x, y = once(x, y)
        x, y = once(x, y)
        return jnp.clip(x, 0, side - 1), jnp.clip(y, 0, side - 1)

    taps = []
    for oy in range(2):
        for ox in range(2):
            w = (fx if ox else 1 - fx) * (fy if oy else 1 - fy)
            xi, yi = wrap(x0 + ox, y0 + oy)
            taps.append((yi * side + xi, w))
    return taps


def _make_kernel(grid_counts, grid_start, grid_step, cfg_vals,
                 irr_side, dep_side):
    Px, Py, Pz = (int(c) for c in grid_counts)
    Pxy = Px * Py
    s0, s1, s2 = (float(v) for v in grid_start)
    st0, st1, st2 = (float(v) for v in grid_step)
    (normal_bias, energy_preservation, visibility_test, gi_scale) = cfg_vals
    # lane widths padded to multiples of 128 (Mosaic DMA tiling); padded
    # lanes are never selected (texel masks cover lane//3 <= side^2-1)
    IRR_LANES = -(-(irr_side * irr_side * 3) // 128) * 128
    DEP_LANES = -(-(dep_side * dep_side * 2) // 128) * 128

    def kernel(bases_ref, pts_ref, irr_ref, dep_ref, icol_ref, dcol_ref,
               out_ref, sc_irr, sc_dep, sems):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        bx = bases_ref[t, 0]
        by = bases_ref[t, 1]
        bz = bases_ref[t, 2]

        # Double-buffered probe-window DMA: the window for tile t+1 is
        # prefetched while tile t computes (grid steps run sequentially on
        # the core, so per-tile DMA latency — 36 copies — would otherwise
        # dominate; measured 27 us/tile serial). Each (y,z) window row is a
        # 16-probe x-run from an 8-ALIGNED row (Mosaic requires provably
        # aligned dynamic offsets); the remainder folds into the per-pixel
        # window index. The atlas is padded by 16 rows so runs never
        # overrun.
        def window_copies(tile, slot):
            tbx = bases_ref[tile, 0]
            tby = bases_ref[tile, 1]
            tbz = bases_ref[tile, 2]
            copies = []
            idx = 0
            for z in range(3):
                for y in range(3):
                    row = tbx + (tby + y) * Px + (tbz + z) * Pxy
                    row_al = pl.multiple_of((row // 8) * 8, 8)
                    k = (z * 3 + y) * 16
                    copies.append(pltpu.make_async_copy(
                        irr_ref.at[pl.ds(row_al, 16), :],
                        sc_irr.at[slot, pl.ds(k, 16), :],
                        sems.at[slot, idx],
                    ))
                    idx += 1
                    copies.append(pltpu.make_async_copy(
                        dep_ref.at[pl.ds(row_al, 16), :],
                        sc_dep.at[slot, pl.ds(k, 16), :],
                        sems.at[slot, idx],
                    ))
                    idx += 1
            return copies

        cur = t % 2
        nxt = (t + 1) % 2

        @pl.when(t == 0)
        def _warmup():
            for c in window_copies(t, 0):
                c.start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            for c in window_copies(t + 1, nxt):
                c.start()

        for c in window_copies(t, cur):
            c.wait()
        sc_irr = sc_irr.at[cur]
        sc_dep = sc_dep.at[cur]

        pts = pts_ref[:]
        px_, py_, pz_ = pts[:, 0], pts[:, 1], pts[:, 2]
        nx, ny, nz = pts[:, 3], pts[:, 4], pts[:, 5]
        wox, woy, woz = pts[:, 6], pts[:, 7], pts[:, 8]

        def cage(pc, s, st, cnt):
            b = jnp.clip(jnp.floor((pc - s) / st).astype(jnp.int32), 0,
                         cnt - 1)
            a = jnp.clip((pc - (s + b.astype(jnp.float32) * st)) / st, 0.0, 1.0)
            return b, a

        bxp, ax = cage(px_, s0, st0, Px)
        byp, ay = cage(py_, s1, st1, Py)
        bzp, az = cage(pz_, s2, st2, Pz)

        biasx = (nx + 3.0 * wox) * normal_bias
        biasy = (ny + 3.0 * woy) * normal_bias
        biasz = (nz + 3.0 * woz) * normal_bias

        sum_w = jnp.zeros((TILE_PTS,), jnp.float32)
        multi_hot = jnp.zeros((TILE_PTS, W_PROBES), jnp.float32)

        lane_irr = jax.lax.broadcasted_iota(jnp.int32, (TILE_PTS, IRR_LANES), 1)
        lane_dep = jax.lax.broadcasted_iota(jnp.int32, (TILE_PTS, DEP_LANES), 1)
        probe_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_PTS, W_PROBES), 1
        )

        # shared irradiance taps (direction = n, same for all 8 corners)
        irr_taps = _oct_texel_taps_cols(nx, ny, nz, irr_side)
        mask_i = jnp.zeros((TILE_PTS, IRR_LANES), jnp.float32)
        for ti, tw in irr_taps:
            mask_i = mask_i + jnp.where(
                lane_irr // 3 == ti[:, None], tw[:, None], 0.0
            )

        for i in range(8):
            ox_, oy_, oz_ = i & 1, (i >> 1) & 1, (i >> 2) & 1
            cx = jnp.clip(bxp + ox_, 0, Px - 1)
            cy = jnp.clip(byp + oy_, 0, Py - 1)
            cz = jnp.clip(bzp + oz_, 0, Pz - 1)
            wcx = jnp.clip(cx - bx, 0, 2)
            wcy = jnp.clip(cy - by, 0, 2)
            wcz = jnp.clip(cz - bz, 0, 2)
            cx = bx + wcx
            cy = by + wcy
            cz = bz + wcz
            # window row (y,z) occupies 16 scratch rows starting at
            # (z*3+y)*16; the probe sits at wcx + (rowbase % 8) inside its
            # 8-aligned 16-row run
            rowbase = bx + (by + wcy) * Px + (bz + wcz) * Pxy
            widx = wcx + (rowbase % 8) + (wcy + wcz * 3) * 16

            ppx = s0 + cx.astype(jnp.float32) * st0
            ppy = s1 + cy.astype(jnp.float32) * st1
            ppz = s2 + cz.astype(jnp.float32) * st2

            ptpx = px_ - ppx + biasx
            ptpy = py_ - ppy + biasy
            ptpz = pz_ - ppz + biasz
            dist2 = ptpx * ptpx + ptpy * ptpy + ptpz * ptpz
            dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))

            tlx = ax if ox_ else 1.0 - ax
            tly = ay if oy_ else 1.0 - ay
            tlz = az if oz_ else 1.0 - az
            tri_w = tlx * tly * tlz

            tdx = ppx - px_
            tdy = ppy - py_
            tdz = ppz - pz_
            td_len = jnp.sqrt(jnp.maximum(tdx * tdx + tdy * tdy + tdz * tdz,
                                          1e-12))
            cosw = (tdx * nx + tdy * ny + tdz * nz) / td_len
            wgt = jnp.square(jnp.maximum(1e-4, (cosw + 1.0) * 0.5)) + 0.2

            oh = jnp.where(probe_iota == widx[:, None], 1.0, 0.0)  # (256,W)

            if visibility_test:
                dep_rows = jnp.dot(oh, sc_dep[:], preferred_element_type=jnp.float32)
                # bilinear depth taps toward the probe (dir = ptp normalized)
                taps_d = _oct_texel_taps_cols(
                    ptpx / dist, ptpy / dist, ptpz / dist, dep_side
                )
                mask_d = jnp.zeros((TILE_PTS, DEP_LANES), jnp.float32)
                for tt, ww in taps_d:
                    mask_d = mask_d + jnp.where(
                        lane_dep // 2 == tt[:, None], ww[:, None], 0.0
                    )
                dsel = jnp.dot(dep_rows * mask_d, dcol_ref[:],
                               preferred_element_type=jnp.float32)
                mean = dsel[:, 0]
                variance = jnp.abs(jnp.square(mean) - dsel[:, 1])
                cheb = variance / (
                    variance + jnp.square(jnp.maximum(dist - mean, 0.0)) + 1e-12
                )
                cheb = jnp.maximum(cheb * cheb * cheb, 0.0)
                wgt = wgt * jnp.where(dist <= mean, 1.0, cheb)

            wgt = jnp.maximum(1e-6, wgt)
            crush = 0.2
            wgt = jnp.where(wgt < crush, wgt * wgt * wgt / (crush * crush), wgt)
            wgt = wgt * tri_w

            # accumulate the corner's probe selection weighted by wgt —
            # the irradiance atlas is stored in sqrt space, so the 8
            # per-corner (one-hot @ atlas) dots collapse into ONE weighted
            # multi-hot dot after the loop (bilinear-of-sqrt == the
            # reference's perceptual sqrt blending, gi_common.glsl:299-316)
            multi_hot = multi_hot + oh * wgt[:, None]
            sum_w = sum_w + wgt

        rows_mix = jnp.dot(multi_hot, sc_irr[:],
                           preferred_element_type=jnp.float32)
        sum_irr = jnp.dot(rows_mix * mask_i, icol_ref[:],
                          preferred_element_type=jnp.float32)  # (256,8)
        net = sum_irr / jnp.maximum(sum_w, 1e-9)[:, None]
        out_ref[:, :] = jnp.square(jnp.maximum(net, 0.0)) * (
            energy_preservation * gi_scale
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("grid_counts", "grid_start", "grid_step",
                     "cfg_vals", "irr_side", "dep_side", "interpret"),
)
def _sample_tiles(bases, pts, irr_flat, dep_flat, icol, dcol, *, grid_counts,
                  grid_start, grid_step, cfg_vals, irr_side, dep_side,
                  interpret):
    ntiles = pts.shape[0] // TILE_PTS
    IRR_LANES = irr_flat.shape[1]
    DEP_LANES = dep_flat.shape[1]
    kernel = _make_kernel(grid_counts, grid_start, grid_step,
                          cfg_vals, irr_side, dep_side)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TILE_PTS, 16), lambda t, b: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # irr atlas (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.ANY),  # dep atlas (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # irr channel collector
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dep channel collector
        ],
        out_specs=pl.BlockSpec((TILE_PTS, 8), lambda t, b: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, W_PROBES, IRR_LANES), jnp.float32),
            pltpu.VMEM((2, W_PROBES, DEP_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 18)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pts.shape[0], 8), jnp.float32),
        interpret=interpret,
    )(bases, pts, irr_flat, dep_flat, icol, dcol)
    return out[:, :3]


def _collectors(irr_side, dep_side):
    IRR_LANES = -(-(irr_side * irr_side * 3) // 128) * 128
    DEP_LANES = -(-(dep_side * dep_side * 2) // 128) * 128
    icol = np.zeros((IRR_LANES, 8), np.float32)
    for l in range(irr_side * irr_side * 3):
        icol[l, l % 3] = 1.0
    dcol = np.zeros((DEP_LANES, 8), np.float32)
    for l in range(dep_side * dep_side * 2):
        dcol[l, l % 2] = 1.0
    return jnp.asarray(icol), jnp.asarray(dcol)


def make_fast_sampler(grid, cfg, interpret: bool):
    """Returns sample(state, p, n, wo) -> (...,3) using the Pallas kernel.
    p may be (N,3) or (H,W,3); tiles of 256 points share a probe window."""
    from hybrid_rendering_tpu.ops import bvh as bvh_mod

    counts = tuple(int(c) for c in grid.counts)
    start = tuple(float(v) for v in grid.start)
    step = tuple(float(v) for v in grid.step)
    cfg_vals = (
        float(cfg.normal_bias),
        float(cfg.energy_preservation),
        bool(cfg.visibility_test),
        0.5 * float(np.pi),
    )
    icol, dcol = _collectors(int(cfg.irradiance_oct_size),
                             min(int(cfg.depth_oct_size), 8))

    def sample(state, p, n, wo):
        shape = p.shape[:-1]
        b = bvh_mod._pick_block(*shape) if len(shape) == 2 else 1
        if b > 1:
            H, W = shape
            pf = bvh_mod._block_linearize(p, H, W, b)
            nf = bvh_mod._block_linearize(n, H, W, b)
            wof = bvh_mod._block_linearize(wo, H, W, b)
        else:
            pf = p.reshape(-1, 3)
            nf = n.reshape(-1, 3)
            wof = wo.reshape(-1, 3)
        N = pf.shape[0]
        n_pad = max(TILE_PTS, -(-N // TILE_PTS) * TILE_PTS)
        padw = ((0, n_pad - N), (0, 0))
        pf = jnp.pad(pf, padw)
        nf = jnp.pad(nf, padw)
        wof = jnp.pad(wof, padw)
        pts = jnp.concatenate(
            [pf, nf, wof, jnp.zeros((n_pad, 7), jnp.float32)], axis=1
        )

        startv = jnp.asarray(start, jnp.float32)
        stepv = jnp.asarray(step, jnp.float32)
        countsv = jnp.asarray(counts, jnp.int32)
        base_pt = jnp.clip(
            jnp.floor((pf - startv) / stepv).astype(jnp.int32),
            0, countsv - 1,
        )
        tiles = base_pt.reshape(-1, TILE_PTS, 3)
        bases = jnp.clip(tiles.min(axis=1), 0, jnp.maximum(countsv - 3, 0))

        P = state.irradiance.shape[0]
        # irradiance in sqrt space (lets the kernel collapse the 8 corner
        # dots into one); depth downsampled to 8x8 (halves the biggest dot)
        irr_flat = jnp.sqrt(jnp.maximum(state.irradiance, 0.0)).reshape(P, -1)
        dside = state.depth.shape[1]
        dep = state.depth
        if dside > 8:
            # Downsample (E[d], E[d^2]) texels by plain averaging. This
            # POOLS the distributions: avg(E[d^2]) - avg(E[d])^2 =
            # avg(Var_texel) + Var(texel means), so the Chebyshev variance
            # at 8x8 includes the inter-texel variance automatically — no
            # visibility information is dropped beyond the resolution
            # itself (bounded by tests/test_ddgi_fast_sampler.py full-frame
            # RMSE vs the 16x16 XLA path).
            f = dside // 8
            dep = dep.reshape(P, 8, f, 8, f, 2).mean(axis=(2, 4))
        dep_flat = dep.reshape(P, -1)
        irr_lanes = -(-irr_flat.shape[1] // 128) * 128
        dep_lanes = -(-dep_flat.shape[1] // 128) * 128
        irr_flat = jnp.pad(
            irr_flat, ((0, 16), (0, irr_lanes - irr_flat.shape[1]))
        )
        dep_flat = jnp.pad(
            dep_flat, ((0, 16), (0, dep_lanes - dep_flat.shape[1]))
        )
        out = _sample_tiles(
            bases, pts, irr_flat, dep_flat, icol, dcol,
            grid_counts=counts, grid_start=start, grid_step=step,
            cfg_vals=cfg_vals,
            irr_side=int(cfg.irradiance_oct_size),
            dep_side=min(int(cfg.depth_oct_size), 8),
            interpret=interpret,
        )
        out = out[:N]
        if b > 1:
            return bvh_mod._block_delinearize(out, shape[0], shape[1], b)
        return out.reshape(shape + (3,))

    return sample
