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
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PTS = 256
# depth atlas resolution cap in the kernel: 16 = full reference res (zero
# Chebyshev deviation); 8 = 2x-downsampled (pooled variance, ~4% rel RMSE
# on real frames — acceptable only if perf demands it)
DEPTH_SIDE_MAX = 16
# Window shape: 4x4 (y,z) cells x 16-probe aligned x-runs. 4x4 is free
# compute-wise over 3x3 (144 lanes already padded to 256) and the 16-run
# covers up to 7 cells of x beyond the base — coverage measured on real
# gi_test frames went 43% (3x3, x<=2) -> 93% (VERDICT r2 fidelity work).
W_WIN = 4
W_PROBES = W_WIN * W_WIN * 16


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


def _oct_texel_taps_clamped_cols(dx, dy, dz, side):
    """4 bilinear octahedral taps with edge CLAMP instead of the mirrored
    wrap — used for the kernel's depth taps: the wrap's ~28-select column
    math dominated the visibility cost, and clamped corners at the oct
    seam only perturb the depth direction by under half a texel (bounded
    by the full-frame RMSE gate)."""
    u, v = _oct_encode_cols(dx, dy, dz)
    tx = (u * 0.5 + 0.5) * side - 0.5
    ty = (v * 0.5 + 0.5) * side - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    taps = []
    for oy in range(2):
        for ox in range(2):
            w = (fx if ox else 1 - fx) * (fy if oy else 1 - fy)
            xi = jnp.clip(x0 + ox, 0, side - 1)
            yi = jnp.clip(y0 + oy, 0, side - 1)
            taps.append((yi * side + xi, w))
    return taps


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


# atlases at or below this padded size live wholly in VMEM and windows are
# direct dynamic-slice reads (no per-tile HBM DMA: the 4x4x16 window pair
# is ~3 MB/tile, 6 GB of HBM traffic per 518k-point call — measured 74 ms;
# VMEM-resident cut it to the matmul floor). Larger atlases (hero scenes)
# keep the double-buffered HBM window path.
VMEM_ATLAS_BYTES = int(_os.environ.get("DDGI_VMEM_ATLAS_BYTES",
                                       str(40 * 1024 * 1024)))
# perf experiment: nearest instead of bilinear depth taps in Chebyshev
DEPTH_NEAREST = _os.environ.get("DDGI_DEPTH_NEAREST", "0") == "1"
# stage-skip micro-bench knobs (WRONG OUTPUT — perf attribution only):
# 1 = replace the depth-row fetch dot / the bilinear mask with constants
_VIS_SKIP_DEPROWS = _os.environ.get("DDGI_VIS_SKIP_DEPROWS", "0") == "1"
_VIS_SKIP_MASK = _os.environ.get("DDGI_VIS_SKIP_MASK", "0") == "1"


def _make_kernel(grid_counts, grid_start, grid_step, cfg_vals,
                 irr_side, dep_side, tile, atlas_vmem=False,
                 w_win=W_WIN):
    Px, Py, Pz = (int(c) for c in grid_counts)
    Pxy = Px * Py
    TILE_PTS = tile  # shadows the module default (64 for small frames)
    # y/z window cells; shadows the module default — dense cages (small
    # probe spacing) need a wider window for the same world footprint
    W_WIN = w_win  # noqa: F841 — closure shadow, see make_fast_sampler
    W_PROBES = W_WIN * W_WIN * 16
    s0, s1, s2 = (float(v) for v in grid_start)
    st0, st1, st2 = (float(v) for v in grid_step)
    (normal_bias, energy_preservation, visibility_test, gi_scale) = cfg_vals
    # lane widths padded to multiples of 128 (Mosaic DMA tiling); padded
    # lanes are never selected (texel masks cover lane//3 <= side^2-1).
    # The depth atlas is PLANAR: [mean texels | mean^2 texels], each plane
    # padded to a 128-multiple, so the texel one-hot lives on a half-width
    # lane domain and selects both moments with two plane dots.
    IRR_LANES = -(-(irr_side * irr_side * 3) // 128) * 128
    DEP_PLANE = -(-(dep_side * dep_side) // 128) * 128
    DEP_LANES = 2 * DEP_PLANE

    def kernel(bases_ref, pts_ref, irr_ref, dep_ref, icol_ref, dcol_ref,
               out_ref, *scratch):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        # per-tile window base packed 10 bits/axis into one i32 — a flat
        # (ntiles,) scalar-prefetch operand stays small in SMEM (Mosaic
        # pads the minor dim of 2-D scalar operands to 128 lanes: a
        # (32400, 3) bases array cost 16.6 MB of the 1 MB SMEM)
        bw = bases_ref[t]
        bx = bw & 1023
        by = (bw >> 10) & 1023
        bz = (bw >> 20) & 1023
        x_al0 = pl.multiple_of((bx // 8) * 8, 8)

        if atlas_vmem:
            # whole atlases are VMEM blocks: the (4, 4, 16, lanes) window
            # is a direct dynamic-slice read, zero DMA
            irr_win = irr_ref[pl.ds(bz, W_WIN), pl.ds(by, W_WIN),
                              pl.ds(x_al0, 16), :].reshape(
                                  W_PROBES, IRR_LANES)
            dep_win = dep_ref[pl.ds(bz, W_WIN), pl.ds(by, W_WIN),
                              pl.ds(x_al0, 16), :].reshape(
                                  W_PROBES, DEP_LANES)
        else:
            sc_irr, sc_dep, sems = scratch

            # Double-buffered probe-window DMA. The atlases are laid out
            # 4-D (Pz, Py, Px_pad, lanes) so the whole 4x4x16 probe window
            # is ONE DMA per atlas (the earlier 36 small per-row copies
            # were DMA-issue-bound at ~27 us/tile). The x offset must be
            # 8-aligned (sublane tiling); the remainder folds into the
            # per-pixel window index. Px is padded by 16 so runs never
            # overrun.
            def window_copies(ti, slot):
                tbw = bases_ref[ti]
                tbx = tbw & 1023
                tby = (tbw >> 10) & 1023
                tbz = (tbw >> 20) & 1023
                x_al = pl.multiple_of((tbx // 8) * 8, 8)
                return [
                    pltpu.make_async_copy(
                        irr_ref.at[pl.ds(tbz, W_WIN), pl.ds(tby, W_WIN),
                                   pl.ds(x_al, 16), :],
                        sc_irr.at[slot],
                        sems.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        dep_ref.at[pl.ds(tbz, W_WIN), pl.ds(tby, W_WIN),
                                   pl.ds(x_al, 16), :],
                        sc_dep.at[slot],
                        sems.at[slot, 1],
                    ),
                ]

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

            irr_win = sc_irr.at[cur][...].reshape(W_PROBES, IRR_LANES)
            dep_win = sc_dep.at[cur][...].reshape(W_PROBES, DEP_LANES)

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

        # All 8 cage corners computed at once on a leading (8,) axis —
        # cheap (8,256) elementwise math, and every matmul below runs ONCE
        # over the folded (8*256, .) batch: 18 small latency-bound dots per
        # tile (8x one-hot row fetch + 8x channel collect + 2 final) become
        # 4 large ones. (No 1-D concatenates: Mosaic can't concat along a
        # flat vector dim, so everything stays (8, 256) until the matmul
        # reshape merges the leading axes.)
        B = 8 * TILE_PTS
        ci = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_PTS), 0)
        ox_ = ci & 1
        oy_ = (ci >> 1) & 1
        oz_ = (ci >> 2) & 1

        cx = jnp.clip(bxp[None, :] + ox_, 0, Px - 1)
        cy = jnp.clip(byp[None, :] + oy_, 0, Py - 1)
        cz = jnp.clip(bzp[None, :] + oz_, 0, Pz - 1)
        # x: probe sits at (bx % 8) + wcx inside the 8-aligned 16-probe
        # run, so up to 7 cells beyond the base are exact; y/z: 4-cell
        # window
        wcx = jnp.clip(cx - bx, 0, 7)
        wcy = jnp.clip(cy - by, 0, W_WIN - 1)
        wcz = jnp.clip(cz - bz, 0, W_WIN - 1)
        cx = bx + wcx
        cy = by + wcy
        cz = bz + wcz
        # window row (y,z) occupies 16 scratch rows starting at
        # (z*W_WIN+y)*16
        widx = wcx + (bx % 8) + (wcy + wcz * W_WIN) * 16  # (8, T)

        ppx = s0 + cx.astype(jnp.float32) * st0
        ppy = s1 + cy.astype(jnp.float32) * st1
        ppz = s2 + cz.astype(jnp.float32) * st2

        ptpx = px_[None, :] - ppx + biasx[None, :]
        ptpy = py_[None, :] - ppy + biasy[None, :]
        ptpz = pz_[None, :] - ppz + biasz[None, :]
        dist2 = ptpx * ptpx + ptpy * ptpy + ptpz * ptpz
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))

        fo = ox_.astype(jnp.float32)
        tlx = fo * ax[None, :] + (1.0 - fo) * (1.0 - ax[None, :])
        fo = oy_.astype(jnp.float32)
        tly = fo * ay[None, :] + (1.0 - fo) * (1.0 - ay[None, :])
        fo = oz_.astype(jnp.float32)
        tlz = fo * az[None, :] + (1.0 - fo) * (1.0 - az[None, :])
        tri_w = tlx * tly * tlz  # (8, T)

        tdx = ppx - px_[None, :]
        tdy = ppy - py_[None, :]
        tdz = ppz - pz_[None, :]
        td_len = jnp.sqrt(jnp.maximum(tdx * tdx + tdy * tdy + tdz * tdz,
                                      1e-12))
        cosw = (tdx * nx[None, :] + tdy * ny[None, :] + tdz * nz[None, :]
                ) / td_len
        wgt_all = jnp.square(jnp.maximum(1e-4, (cosw + 1.0) * 0.5)) + 0.2

        oh3 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, TILE_PTS, W_PROBES), 2)
            == widx[:, :, None], 1.0, 0.0)  # (8, T, W)
        oh2 = oh3.reshape(B, W_PROBES)

        if visibility_test:
            if _VIS_SKIP_DEPROWS:
                dep_rows = jnp.full((B, 2 * DEP_PLANE), 4.0, jnp.float32)
            else:
                dep_rows = jnp.dot(oh2.astype(jnp.bfloat16),
                                   dep_win.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
            # clamped-bilinear depth taps toward the probe (dir = ptp
            # normalized) on the full-res 16x16 atlas; the bilinear
            # weights build ONE texel-domain one-hot (half-width lanes)
            # applied to each moment plane
            if DEPTH_NEAREST:
                # single nearest tap: picks the largest-weight corner of
                # the bilinear quad (perf experiment knob)
                taps_d = _oct_texel_taps_clamped_cols(
                    ptpx / dist, ptpy / dist, ptpz / dist, dep_side,
                )
                best = None
                for tt, ww in taps_d:
                    cand = (tt, ww)
                    if best is None:
                        best = cand
                    else:
                        take = ww > best[1]
                        best = (jnp.where(take, tt, best[0]),
                                jnp.where(take, ww, best[1]))
                taps_d = [(best[0], jnp.ones_like(best[1]))]
                lane_t3 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, TILE_PTS, DEP_PLANE), 2)
                u_mask = jnp.zeros((8, TILE_PTS, DEP_PLANE), jnp.float32)
                for tt, ww in taps_d:
                    u_mask = u_mask + jnp.where(
                        lane_t3 == tt[:, :, None], ww[:, :, None], 0.0
                    )
            elif _VIS_SKIP_MASK:
                u_mask = jnp.full((8, TILE_PTS, DEP_PLANE),
                                  1.0 / DEP_PLANE, jnp.float32)
            else:
                # separable TENT over the texel domain — exactly the 4
                # clamped bilinear taps (center clamped to [0, side-1]
                # reproduces the per-tap edge clamp: out-of-range tap
                # mass collapses onto the edge texel either way). The
                # tents are built on dep_side (16) lanes and expanded to
                # the DEP_PLANE (256) lane domain by constant 0/1
                # matmuls on the MXU: the straight (8,T,256)
                # iota/mod/abs build was ~9 us of the ~29 us tile (r5
                # stage-skip bench, DDGI_VIS_SKIP_MASK).
                u, v = _oct_encode_cols(ptpx / dist, ptpy / dist,
                                        ptpz / dist)
                txc = jnp.clip((u * 0.5 + 0.5) * dep_side - 0.5,
                               0.0, dep_side - 1.0)
                tyc = jnp.clip((v * 0.5 + 0.5) * dep_side - 0.5,
                               0.0, dep_side - 1.0)
                lane16 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, TILE_PTS, dep_side), 2
                ).astype(jnp.float32)  # Mosaic: iota must be int
                wx16 = jnp.maximum(
                    0.0, 1.0 - jnp.abs(lane16 - txc[:, :, None]))
                wy16 = jnp.maximum(
                    0.0, 1.0 - jnp.abs(lane16 - tyc[:, :, None]))
                # 0/1 expanders built in-kernel ((16,256) iota work is
                # ~4 vregs — 512x smaller than the old per-point build;
                # pallas rejects captured host constants)
                lane_p = jax.lax.broadcasted_iota(
                    jnp.int32, (dep_side, DEP_PLANE), 1)
                row_p = jax.lax.broadcasted_iota(
                    jnp.int32, (dep_side, DEP_PLANE), 0)
                tx_expand = (lane_p % dep_side == row_p).astype(jnp.float32)
                ty_expand = (lane_p // dep_side == row_p).astype(jnp.float32)
                wxe = jnp.dot(wx16.reshape(B, dep_side), tx_expand,
                              preferred_element_type=jnp.float32)
                wye = jnp.dot(wy16.reshape(B, dep_side), ty_expand,
                              preferred_element_type=jnp.float32)
                u_mask = (wxe * wye).reshape(8, TILE_PTS, DEP_PLANE)
            u2 = u_mask.reshape(B, DEP_PLANE)
            e8 = jnp.ones((DEP_PLANE, 8), jnp.float32)
            m8 = jnp.dot(dep_rows[:, :DEP_PLANE] * u2, e8,
                         preferred_element_type=jnp.float32)
            v8 = jnp.dot(dep_rows[:, DEP_PLANE:] * u2, e8,
                         preferred_element_type=jnp.float32)
            mean = m8.reshape(8, TILE_PTS, 8)[:, :, 0]
            m2 = v8.reshape(8, TILE_PTS, 8)[:, :, 0]
            variance = jnp.abs(jnp.square(mean) - m2)
            cheb = variance / (
                variance + jnp.square(jnp.maximum(dist - mean, 0.0))
                + 1e-12
            )
            cheb = jnp.maximum(cheb * cheb * cheb, 0.0)
            wgt_all = wgt_all * jnp.where(dist <= mean, 1.0, cheb)

        wgt_all = jnp.maximum(1e-6, wgt_all)
        crush = 0.2
        wgt_all = jnp.where(
            wgt_all < crush, wgt_all ** 3 / (crush * crush), wgt_all)
        wgt_all = wgt_all * tri_w

        # the irradiance atlas is stored in sqrt space, so the 8 per-corner
        # (one-hot @ atlas) dots collapse into ONE weighted multi-hot dot
        # (bilinear-of-sqrt == the reference's perceptual sqrt blending,
        # gi_common.glsl:299-316)
        multi_hot = jnp.sum(oh3 * wgt_all[:, :, None], axis=0)
        # sum of corner weights = row sums of multi_hot (oh rows are
        # one-hot), via a tiny dot — Mosaic can't reduce (8,T) -> (T,) 1-D
        sum_w = jnp.dot(multi_hot, jnp.ones((W_PROBES, 8), jnp.float32),
                        preferred_element_type=jnp.float32)  # (256,8)

        rows_mix = jnp.dot(multi_hot, irr_win,
                           preferred_element_type=jnp.float32)
        sum_irr = jnp.dot(rows_mix * mask_i, icol_ref[:],
                          preferred_element_type=jnp.float32)  # (256,8)
        net = sum_irr / jnp.maximum(sum_w, 1e-9)
        out_ref[:, :] = jnp.square(jnp.maximum(net, 0.0)) * (
            energy_preservation * gi_scale
        )

    return kernel


# fixed tile-count quantum per pallas_call: every sampler dispatch in a
# frame is padded to a multiple of CHUNK_TILES tiles so all call sites
# (gi sample pass, reflections DDGI approx, probe-update bounce, each
# rescue pass) share ONE Mosaic payload. Measured r4 at 1080p: each
# distinct ntiles lowered its own payload at 52-80 s remote compile and
# the frame had 4+ distinct shapes — the DDGI path alone was ~375 s of
# the ~480 s frame compile (the bench watchdog fired before the headline
# landed). Padded tiles window at base 0 and their outputs are sliced off.
CHUNK_TILES = int(_os.environ.get("DDGI_CHUNK_TILES", "128"))


def _sample_tiles(bases, pts, irr_flat, dep_flat, icol, dcol, *, grid_counts,
                  grid_start, grid_step, cfg_vals, irr_side, dep_side,
                  interpret, tile=TILE_PTS, atlas_vmem=False, w_win=W_WIN):
    """Chunked dispatch wrapper around the single-payload pallas_call."""
    n_pts = pts.shape[0]
    assert n_pts >= tile and n_pts % tile == 0, (
        f"_sample_tiles needs tile-multiple n_pts (got {n_pts}, "
        f"tile {tile}); make_fast_sampler pads its inputs")
    ntiles = n_pts // tile
    # power-of-two pad quantum: worst case wastes ~2x kernel work just
    # above a power of two (ntiles=65 -> 128), a DELIBERATE trade — each
    # distinct chunk size is a distinct Mosaic payload at 52-80 s remote
    # compile (r4 measurement above), and padded tiles window at base 0
    # (pure VMEM re-reads, no extra HBM traffic), so compile count wins
    # over compute waste at every size we ship
    p2 = 1 << max(0, ntiles - 1).bit_length()
    chunk = max(1, min(CHUNK_TILES, p2))
    nt_pad = -(-ntiles // chunk) * chunk
    if nt_pad != ntiles:
        bases = jnp.pad(bases, (0, nt_pad - ntiles))
        pts = jnp.pad(pts, ((0, (nt_pad - ntiles) * tile), (0, 0)))
    kw = dict(grid_counts=grid_counts, grid_start=grid_start,
              grid_step=grid_step, cfg_vals=cfg_vals, irr_side=irr_side,
              dep_side=dep_side, interpret=interpret, tile=tile,
              atlas_vmem=atlas_vmem, w_win=w_win)
    outs = [
        _sample_tiles_call(bases[t0:t0 + chunk],
                           pts[t0 * tile:(t0 + chunk) * tile],
                           irr_flat, dep_flat, icol, dcol, **kw)
        for t0 in range(0, nt_pad, chunk)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out[:n_pts]


@functools.partial(
    jax.jit,
    static_argnames=("grid_counts", "grid_start", "grid_step",
                     "cfg_vals", "irr_side", "dep_side", "interpret",
                     "tile", "atlas_vmem", "w_win"),
)
def _sample_tiles_call(bases, pts, irr_flat, dep_flat, icol, dcol, *,
                       grid_counts, grid_start, grid_step, cfg_vals,
                       irr_side, dep_side, interpret, tile=TILE_PTS,
                       atlas_vmem=False, w_win=W_WIN):
    ntiles = pts.shape[0] // tile
    IRR_LANES = irr_flat.shape[-1]
    DEP_LANES = dep_flat.shape[-1]
    kernel = _make_kernel(grid_counts, grid_start, grid_step,
                          cfg_vals, irr_side, dep_side, tile,
                          atlas_vmem=atlas_vmem, w_win=w_win)
    atlas_space = pltpu.VMEM if atlas_vmem else pltpu.ANY
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda t, b: (t, 0),
                         memory_space=pltpu.VMEM),
            # atlases: whole-block VMEM residents (small scenes) or HBM
            # sources for the per-tile window DMA (hero scenes)
            pl.BlockSpec(memory_space=atlas_space),
            pl.BlockSpec(memory_space=atlas_space),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # irr channel collector
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dep channel collector
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda t, b: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[] if atlas_vmem else [
            pltpu.VMEM((2, w_win, w_win, 16, IRR_LANES), jnp.float32),
            pltpu.VMEM((2, w_win, w_win, 16, DEP_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pts.shape[0], 8), jnp.float32),
        # the folded (8*256, .) corner batch peaks ~24 MB of live vectors —
        # above the 16 MB default scoped-vmem limit, well under v5e's 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
    # y/z window size: a tile's points span a world footprint set by the
    # scene, so DENSER cages need more cells for the same coverage. At
    # spacing 1.0 on gi_test the 4-cell window left >25% of tiles
    # straddling (full-frame deviation 3.2% vs the XLA oracle); 6 cells
    # restores the sub-1% gate. Spacing >= 1.25 keeps the cheaper 4.
    w_win = W_WIN if min(step[1:]) >= 1.25 else 6
    cfg_vals = (
        float(cfg.normal_bias),
        float(cfg.energy_preservation),
        bool(cfg.visibility_test),
        1.0,  # energy-calibrated: texel = E/pi feeds albedo x texel
        #       directly (see models/ddgi.py sample_irradiance)
    )
    icol, dcol = _collectors(int(cfg.irradiance_oct_size),
                             min(int(cfg.depth_oct_size), DEPTH_SIDE_MAX))

    def sample(state, p, n, wo, valid=None):
        shape = p.shape[:-1]
        b = bvh_mod._pick_block(*shape) if len(shape) == 2 else 1
        # kernel tile size is independent of the pixel-block size (tiles
        # group consecutive linearized blocks): 256 normally; 64 for small
        # frames, where a 256-point tile would span too much world space
        # for the probe window (fit fraction at 160x128 gi_test: 256-pt
        # tiles 70% -> 64-pt tiles 93%). "Small" is judged by TOTAL point
        # count: the old width<512 test also caught quarter-scale 1080p
        # (480x270 = 130k points), quadrupling the tile count — 40 of the
        # 47 sampler dispatches and ~30 ms of the r5 xplane frame.
        npts = 1
        for s_ in shape:
            npts *= int(s_)
        small = len(shape) == 2 and npts <= 65536
        tile = 64 if small else TILE_PTS
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
        n_pad = max(tile, -(-N // tile) * tile)
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
        # Invalid points (sky: G-buffer position = 0, misses: far plane)
        # must not drag the tile's probe window away from the geometry —
        # their output is masked downstream, but the WINDOW base is shared
        # by the whole tile (VERDICT r2: 0.67 rel RMSE on gi_test frames
        # before this mask).
        win = jnp.asarray([3, w_win, w_win], jnp.int32)
        if valid is not None:
            v3 = valid[..., None].astype(jnp.float32)
            if b > 1:
                H, W = shape
                vf = bvh_mod._block_linearize(v3, H, W, b)[:, 0] > 0.5
            else:
                vf = v3.reshape(-1) > 0.5
            vf = jnp.pad(vf, (0, n_pad - N))
            vt = vf.reshape(-1, tile)
            bt = base_pt.reshape(-1, tile, 3)
            masked = jnp.where(vt[..., None], bt, jnp.int32(1 << 20))
            mn = masked.min(axis=1)
            # tiles with no valid points: fall back to the unmasked min
            mn = jnp.where(vt.any(axis=1)[:, None], mn, bt.min(axis=1))
            bases = jnp.clip(mn, 0, jnp.maximum(countsv - win, 0))
        else:
            tiles = base_pt.reshape(-1, tile, 3)
            bases = jnp.clip(tiles.min(axis=1), 0,
                             jnp.maximum(countsv - win, 0))

        P = state.irradiance.shape[0]
        # irradiance in sqrt space (lets the kernel collapse the 8 corner
        # dots into one); depth downsampled to 8x8 (halves the biggest dot)
        irr_flat = jnp.sqrt(jnp.maximum(state.irradiance, 0.0)).reshape(P, -1)
        dside = state.depth.shape[1]
        dep = state.depth
        if dside > DEPTH_SIDE_MAX:
            # Downsample (E[d], E[d^2]) texels by plain averaging. This
            # POOLS the distributions: avg(E[d^2]) - avg(E[d])^2 =
            # avg(Var_texel) + Var(texel means), so the Chebyshev variance
            # includes the inter-texel variance automatically.
            f = dside // DEPTH_SIDE_MAX
            dep = dep.reshape(
                P, DEPTH_SIDE_MAX, f, DEPTH_SIDE_MAX, f, 2).mean(axis=(2, 4))
        # planar depth: [mean plane | mean^2 plane], each 128-padded
        dside_k = dep.shape[1]
        dtex = dside_k * dside_k
        lp = -(-dtex // 128) * 128
        dep_flat = dep.transpose(0, 3, 1, 2).reshape(P, 2, dtex)
        dep_flat = jnp.pad(dep_flat, ((0, 0), (0, 0), (0, lp - dtex)))
        dep_flat = dep_flat.reshape(P, 2 * lp)
        irr_lanes = -(-irr_flat.shape[1] // 128) * 128
        dep_lanes = dep_flat.shape[1]
        Px, Py, Pz = counts
        pxp = -(-Px // 8) * 8 + 16
        pyp, pzp = max(Py, w_win), max(Pz, w_win)

        def to4d(flat, lanes):
            a = jnp.pad(flat, ((0, 0), (0, lanes - flat.shape[1])))
            a = a.reshape(Pz, Py, Px, lanes)
            return jnp.pad(
                a, ((0, pzp - Pz), (0, pyp - Py), (0, pxp - Px), (0, 0)))

        irr_flat = to4d(irr_flat, irr_lanes)
        dep_flat = to4d(dep_flat, dep_lanes)
        atlas_bytes = 4 * (irr_flat.size + dep_flat.size)
        kern_kw = dict(
            grid_counts=counts, grid_start=start, grid_step=step,
            cfg_vals=cfg_vals,
            irr_side=int(cfg.irradiance_oct_size),
            dep_side=min(int(cfg.depth_oct_size), DEPTH_SIDE_MAX),
            interpret=interpret,
            tile=tile,
            atlas_vmem=atlas_bytes <= VMEM_ATLAS_BYTES,
            w_win=w_win,
        )
        def pack(bs):
            return bs[:, 0] | (bs[:, 1] << 10) | (bs[:, 2] << 20)

        out = _sample_tiles(pack(bases), pts, irr_flat, dep_flat, icol,
                            dcol, **kern_kw)

        # Second-window rescue pass: tiles whose points straddle a depth
        # discontinuity span more probe cells than one window covers
        # (bimodal cell distribution). Re-run the worst quarter of tiles
        # with a window based at the UNCOVERED points' cells and merge
        # per-point. Brings full-frame deviation from the clamped cage
        # down to the sub-1% gate (tests/test_ddgi_fast_sampler.py).
        nt = n_pad // tile
        cover = jnp.asarray([7, w_win - 1, w_win - 1], jnp.int32)
        bt = base_pt.reshape(nt, tile, 3)
        fit1 = ((bt >= bases[:, None, :])
                & (bt + 1 <= bases[:, None, :] + cover)).all(-1)
        if valid is not None:
            bad = (~fit1) & vt
        else:
            bad = ~fit1
        K = max(1, nt // 4)
        order = jnp.argsort(-bad.sum(axis=1))[:K]
        pts2 = pts.reshape(nt, tile, 16)[order]
        bt2 = bt[order]
        bad2 = bad[order]
        mn2 = jnp.where(bad2[..., None], bt2, jnp.int32(1 << 20)).min(axis=1)
        mn2 = jnp.where(bad2.any(axis=1)[:, None], mn2, bases[order])
        bases2 = jnp.clip(mn2, 0, jnp.maximum(countsv - win, 0))
        out2 = _sample_tiles(pack(bases2), pts2.reshape(K * tile, 16),
                             irr_flat, dep_flat, icol, dcol, **kern_kw)
        fit2 = ((bt2 >= bases2[:, None, :])
                & (bt2 + 1 <= bases2[:, None, :] + cover)).all(-1)
        use2 = (bad2 & fit2)[..., None]
        out_t = out.reshape(nt, tile, 3)
        merged = jnp.where(use2, out2.reshape(K, tile, 3), out_t[order])
        out = out_t.at[order].set(merged).reshape(n_pad, 3)

        out = out[:N]
        if b > 1:
            return bvh_mod._block_delinearize(out, shape[0], shape[1], b)
        return out.reshape(shape + (3,))

    return sample
