"""FlashTrace — MXU-dense ray-triangle intersection (Pallas).

The TPU-native replacement for hardware ray tracing: instead of a divergent
BVH walk (gathers + data-dependent branches, which TPUs hate), ray-triangle
intersection is reformulated as ONE MATMUL streamed flash-attention-style:

Möller-Trumbore for a ray (o, d) against a triangle (v0, e1, e2) with
n = e1 x e2 reduces, via scalar-triple-product identities, to four scalars
that are all AFFINE in the 10-dim ray feature vector f = [o, d, o x d, 1]:

    det   = -d . n
    t_num =  o . n            - v0 . n
    u_num =  (o x d) . e2     - d . (e2 x v0)
    v_num = -(o x d) . e1     - d . (v0 x e1)

so a (RAYS x 10) @ (10 x 4T) matmul yields det/t/u/v numerators for every
(ray, triangle) pair on the MXU. The kernel streams triangle tiles through
VMEM, keeping a running closest-hit (or any-hit) per ray — the (R x 4T)
intermediate never touches HBM. No gathers, no divergence, 100% dense
MXU/VPU work.

Numerical note: |o x d| grows with |o|, costing relative precision, so both
rays and triangles are re-centered on the scene centroid before building
features (see make_flash_scene / _features).

This is the wavefront "trace" kernel of SURVEY §2.10. Two generations:

- v1 (dense): grid = (ray tiles, ALL tri tiles); per-step packet-vs-cluster
  AABB test skips compute but not the block DMA. Kept as the fallback and
  the oracle for the sparse path.
- v2 (sparse, the production path): an XLA prepass intersects every 256-ray
  packet against every cluster AABB with conservative interval arithmetic
  and emits a per-packet cluster list sorted by entry distance; the kernel
  grid is (packets, K) with scalar-prefetched list indices driving the
  triangle-block DMA, so a packet only ever fetches/tests the clusters it
  can geometrically hit — the hierarchical culling layer that makes the
  tracer scale past toy scenes (reference bar: Sponza ~262k tris,
  /root/reference/src/common.cpp:520-533). Padded list entries repeat the
  previous cluster id, which Pallas recognizes as the same block (no DMA)
  and `pl.when` skips the compute.

v2 also drops per-candidate divisions: Möller-Trumbore acceptance runs in
sign-adjusted numerator space (su = u_num*sign(det) etc.), the division
happens only for the per-tile winner, and the matmul uses a split-operand
bf16x3 scheme (hi/lo bf16 halves, 3 MXU passes) instead of 6-pass fp32.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hybrid_rendering_tpu.types import Hit

import os as _os

# rays per grid step (sublane-friendly multiples of (8,128) f32) and
# triangles per grid step / culling cluster size. Env-overridable for
# tuning sweeps (tools/bench_trace.py).
# 512 wins for pure visibility, but the closest-hit epilogue scales with
# packet width and loses more (frame A/B: 614 ms @512 vs 594 ms @256)
RAY_TILE = int(_os.environ.get("FLASH_RAY_TILE", "256"))
TRI_TILE = int(_os.environ.get("FLASH_TRI_TILE", "128"))

FEAT = 16  # 10 features padded to 16 lanes
RAY_PK = 8  # packed ray lanes fed to the loop tracer: [o-center, 0, d, 0]
BIG_T = 3.0e38


ATTR = 24  # per-tri attribute row: n0 n1 n2 (9) uv0..2 (6) mat mesh
#            geo_n (5) tangent.xyz + bitangent sign (4)


MAX_CLUSTERS = 64  # static cap on per-packet cluster-list length (v2)


class FlashScene(NamedTuple):
    """Per-scene constants for the flash tracer."""

    trimat: jax.Array  # (FEAT, NTT*4*TRI_TILE) column-blocked [det|t|u|v]
    cluster_box: jax.Array  # (NTT, 8) cluster AABB [min.xyz, max.xyz, pad]
    center: jax.Array  # (3,) recentering offset
    num_tris: int
    num_tri_tiles: int
    attrs: jax.Array = None  # (NTT*TRI_TILE, ATTR) per-tri attributes
    # True when every attr lane is bf16-exact (ids < 256): lets the
    # winner-selection dot run at bf16 rate (the one-hot is exact either
    # way; normals/uvs/tangents tolerate bf16 rounding)
    attrs_bf16_safe: bool = False
    trimat_hi: jax.Array = None  # bf16 high halves of trimat (split-operand)
    trimat_lo: jax.Array = None  # bf16 residual halves
    # K-folded split-operand matrix: rows [hi; hi; lo] (3*FEAT, N) so the
    # three bf16 passes become ONE K=48 matmul — the K=16 contraction left
    # the 128-deep MXU at ~12% utilization (measured 26.5 Mrays/s; the
    # tiling sweep moved nothing, this is the bound)
    trimat48: jax.Array = None
    # cluster-blocked layouts for the v3 in-kernel loop tracer (one DMA
    # block per cluster): (NTT, 3*FEAT, 4*TRI_TILE) and (NTT, ATTR,
    # TRI_TILE). attrs are TRANSPOSED vs the v2 BlockSpec layout: a
    # manual make_async_copy with a dynamic leading index cannot slice
    # an unaligned minor dim (Mosaic: "slice along dim 2 must be
    # aligned to tiling (128), but is 24"), so TRI_TILE=128 must be the
    # lane dim and ATTR=24 rides the 8-sublane tiling (24 % 8 == 0)
    trimat48_blk: jax.Array = None
    attrs_blk: jax.Array = None


def make_flash_scene(
    tri_pos: jax.Array,
    tri_normal=None,
    tri_uv=None,
    tri_mat=None,
    tri_mesh=None,
    tri_tangent=None,
) -> FlashScene:
    """Precompute the (10 x 4T) triangle matrix, tiled and column-grouped
    per TRI_TILE block: block j holds [det cols | t cols | u cols | v cols]
    for triangles [j*TT, (j+1)*TT). Padded triangles are degenerate
    (n = 0 -> det = 0 -> never hit)."""
    tri_pos = jnp.asarray(tri_pos, jnp.float32)
    T = tri_pos.shape[0]
    ntt = max(1, -(-T // TRI_TILE))
    t_pad = ntt * TRI_TILE

    center = (tri_pos.reshape(-1, 3).min(0) + tri_pos.reshape(-1, 3).max(0)) * 0.5
    v0 = tri_pos[:, 0] - center
    e1 = tri_pos[:, 1] - tri_pos[:, 0]
    e2 = tri_pos[:, 2] - tri_pos[:, 0]
    n = jnp.cross(e1, e2)

    def pad(x):
        return jnp.pad(x, ((0, t_pad - T), (0, 0)))

    v0, e1, e2, n = pad(v0), pad(e1), pad(e2), pad(n)

    zeros = jnp.zeros((t_pad, 3), jnp.float32)
    zcol = jnp.zeros((t_pad, 1), jnp.float32)
    # feature order: [o(3), d(3), oxd(3), 1] padded to FEAT
    det_col = jnp.concatenate([zeros, -n, zeros, zcol], axis=1)  # (t_pad, 10)
    t_col = jnp.concatenate(
        [n, zeros, zeros, -jnp.sum(v0 * n, 1, keepdims=True)], axis=1
    )
    u_col = jnp.concatenate([zeros, -jnp.cross(e2, v0), e2, zcol], axis=1)
    v_col = jnp.concatenate([zeros, -jnp.cross(v0, e1), -e1, zcol], axis=1)

    cols = jnp.stack([det_col, t_col, u_col, v_col], axis=0)  # (4, t_pad, 10)
    cols = jnp.pad(cols, ((0, 0), (0, 0), (0, FEAT - 10)))  # (4, t_pad, FEAT)
    # -> (ntt, 4, TRI_TILE, FEAT) -> (FEAT, ntt*4*TRI_TILE)
    cols = cols.reshape(4, ntt, TRI_TILE, FEAT).transpose(1, 0, 2, 3)
    trimat = cols.reshape(ntt * 4 * TRI_TILE, FEAT).T

    # per-tile (cluster) AABBs for packet culling — triangle tiles follow
    # the BVH/Morton leaf order (scene compile permutes tris), so tiles are
    # spatially tight. Recentered like the rays.
    verts = (tri_pos - center).reshape(T, 9)
    verts = jnp.pad(verts, ((0, t_pad - T), (0, 0)),
                    constant_values=jnp.nan)
    vt = verts.reshape(ntt, TRI_TILE, 3, 3)
    cmin = jnp.nan_to_num(jnp.nanmin(vt, axis=(1, 2)), nan=3e38)
    cmax = jnp.nan_to_num(jnp.nanmax(vt, axis=(1, 2)), nan=-3e38)
    cluster_box = jnp.concatenate(
        [cmin, cmax, jnp.zeros((ntt, 2), jnp.float32)], axis=1
    )

    attrs = None
    if tri_normal is not None:
        geo_n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12
        )
        tn = jnp.pad(jnp.asarray(tri_normal, jnp.float32).reshape(T, 9),
                     ((0, t_pad - T), (0, 0)))
        tu = jnp.pad(jnp.asarray(tri_uv, jnp.float32).reshape(T, 6),
                     ((0, t_pad - T), (0, 0)))
        tm_col = jnp.pad(jnp.asarray(tri_mat, jnp.float32)[:, None],
                         ((0, t_pad - T), (0, 0)))
        tmesh = jnp.pad(jnp.asarray(tri_mesh, jnp.float32)[:, None],
                        ((0, t_pad - T), (0, 0)))
        parts = [tn, tu, tm_col, tmesh, geo_n]
        if tri_tangent is not None:
            parts.append(jnp.pad(
                jnp.asarray(tri_tangent, jnp.float32),
                ((0, t_pad - T), (0, 0))))
        attrs = jnp.concatenate(parts, axis=1)
        attrs = jnp.pad(attrs, ((0, 0), (0, ATTR - attrs.shape[1])))
        try:  # concrete at scene-build time
            import numpy as _np

            attrs_bf16_safe = bool(
                _np.max(_np.asarray(tri_mat)) < 256
                and _np.max(_np.asarray(tri_mesh)) < 256)
        except Exception:
            attrs_bf16_safe = False

    trimat = jnp.asarray(trimat)
    trimat_hi = trimat.astype(jnp.bfloat16)
    trimat_lo = (trimat - trimat_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    trimat48 = jnp.concatenate([trimat_hi, trimat_hi, trimat_lo], axis=0)
    trimat48_blk = trimat48.reshape(
        3 * FEAT, ntt, 4 * TRI_TILE).transpose(1, 0, 2)
    return FlashScene(
        trimat=trimat, cluster_box=cluster_box,
        center=center, num_tris=T, num_tri_tiles=ntt, attrs=attrs,
        trimat_hi=trimat_hi, trimat_lo=trimat_lo, trimat48=trimat48,
        trimat48_blk=trimat48_blk,
        attrs_blk=(None if attrs is None
                   else attrs.reshape(ntt, TRI_TILE, ATTR)
                   .transpose(0, 2, 1)),
        attrs_bf16_safe=(attrs_bf16_safe if tri_normal is not None
                         else False),
    )


def _features(origin, direction, center):
    o = origin - center
    m = jnp.cross(o, direction)
    ones = jnp.ones_like(o[..., :1])
    f = jnp.concatenate([o, direction, m, ones], axis=-1)  # (..., 10)
    return jnp.pad(f, ((0, 0), (0, FEAT - 10)))


def _ray_box_any(feats, box_ref, j, best_t, t_min):
    """Does any ray in the tile enter cluster j's AABB closer than its
    current best? feats: (RT, FEAT) with o in cols 0:3 (recentered), d in
    3:6. box_ref is the full (NTT, 8) cluster table in SMEM."""
    tnear = jnp.full(best_t.shape, -BIG_T)
    tfar = jnp.full(best_t.shape, BIG_T)
    for axis in range(3):
        o = feats[:, axis]
        d = feats[:, 3 + axis]
        safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        inv = 1.0 / safe
        lo = (box_ref[j, axis] - o) * inv
        hi = (box_ref[j, 3 + axis] - o) * inv
        tnear = jnp.maximum(tnear, jnp.minimum(lo, hi))
        tfar = jnp.minimum(tfar, jnp.maximum(lo, hi))
    hit = (tnear <= tfar) & (tfar > t_min) & (tnear < best_t)
    # rays whose budget is exhausted (padded rays have t_max = 0) are dead
    hit = hit & (best_t > t_min)
    return jnp.max(hit.astype(jnp.int32)) > 0


def _closest_kernel(feats_ref, tmax_ref, trimat_ref, box_ref, best_ref,
                    id_ref, *, t_min, attr_ref=None, attr_out_ref=None):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:, 0:1] = tmax_ref[:]  # running best t starts at t_max
        best_ref[:, 1:3] = jnp.zeros_like(best_ref[:, 1:3])
        id_ref[:] = jnp.full_like(id_ref[:], -1)
        if attr_out_ref is not None:
            attr_out_ref[:] = jnp.zeros_like(attr_out_ref[:])

    # packet-level cluster culling: skip the whole (ray tile, tri tile)
    # step when no ray can hit this cluster closer than its current best
    feats = feats_ref[:]
    best_t0 = best_ref[:, 0]

    @pl.when(_ray_box_any(feats, box_ref, j, best_t0, t_min))
    def _work():
        prod = jnp.dot(
            feats, trimat_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (RAY_TILE, 4*TRI_TILE) grouped [det | t | u | v]
        det = prod[:, 0 * TRI_TILE : 1 * TRI_TILE]
        tn = prod[:, 1 * TRI_TILE : 2 * TRI_TILE]
        un = prod[:, 2 * TRI_TILE : 3 * TRI_TILE]
        vn = prod[:, 3 * TRI_TILE : 4 * TRI_TILE]

        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        t = tn * inv_det
        u = un * inv_det
        v = vn * inv_det
        best_t = best_ref[:, 0:1]
        ok = (
            (jnp.abs(det) > 1e-9)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < best_t)
        )
        t_masked = jnp.where(ok, t, BIG_T)
        tile_min = jnp.min(t_masked, axis=1, keepdims=True)  # (RT,1)
        improved = tile_min < best_t  # (RT,1)

        lane = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 1)
        is_min = t_masked == tile_min
        first = jnp.min(jnp.where(is_min, lane, TRI_TILE), axis=1, keepdims=True)
        sel = lane == first  # exactly one col per improved row
        u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

        best_ref[:, 0:1] = jnp.where(improved, tile_min, best_t)
        best_ref[:, 1:2] = jnp.where(improved, u_sel, best_ref[:, 1:2])
        best_ref[:, 2:3] = jnp.where(improved, v_sel, best_ref[:, 2:3])
        id_ref[:] = jnp.where(improved, j * TRI_TILE + first, id_ref[:])

        if attr_out_ref is not None:
            # fused surface fetch: select the winning triangle's attribute
            # row with a one-hot matmul on the MXU (replaces the per-pixel
            # XLA gathers of scene_descriptor_set-style tables, which run
            # on the TPU scalar core at ~7 cycles/element)
            sel_f = jnp.where(sel & improved, 1.0, 0.0)
            attr_sel = jnp.dot(
                sel_f, attr_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (RAY_TILE, ATTR)
            attr_out_ref[:] = jnp.where(improved, attr_sel, attr_out_ref[:])


def _anyhit_kernel(feats_ref, tmax_ref, trimat_ref, box_ref, vis_ref, *, t_min):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        # padded rays (t_max == 0) start dead so they can't keep tiles alive
        vis_ref[:] = (tmax_ref[:] > t_min).astype(jnp.int32)

    # skip when every live ray is already blocked OR no live unblocked ray
    # can reach this cluster within its t_max
    feats = feats_ref[:]
    live_budget = jnp.where(vis_ref[:, 0] > 0, tmax_ref[:, 0], 0.0)

    @pl.when(_ray_box_any(feats, box_ref, j, live_budget, t_min))
    def _work():
        prod = jnp.dot(
            feats, trimat_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        det = prod[:, 0 * TRI_TILE : 1 * TRI_TILE]
        tn = prod[:, 1 * TRI_TILE : 2 * TRI_TILE]
        un = prod[:, 2 * TRI_TILE : 3 * TRI_TILE]
        vn = prod[:, 3 * TRI_TILE : 4 * TRI_TILE]
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        t = tn * inv_det
        u = un * inv_det
        v = vn * inv_det
        ok = (
            (jnp.abs(det) > 1e-9)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < tmax_ref[:])
        )
        blocked = jnp.max(ok.astype(jnp.int32), axis=1, keepdims=True)
        vis_ref[:] = vis_ref[:] * (1 - blocked)


def _pad_rays(x, r_pad, fill=0.0):
    r = x.shape[0]
    if r == r_pad:
        return x
    pad_width = ((0, r_pad - r),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def _flash_closest_impl(fs: FlashScene, origin, direction, t_max, t_min,
                        interpret, with_attrs):
    R = origin.shape[0]
    r_pad = max(RAY_TILE, -(-R // RAY_TILE) * RAY_TILE)
    feats = _pad_rays(_features(origin, direction, fs.center), r_pad)
    tmax = _pad_rays(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))[:, None], r_pad
    )

    grid = (r_pad // RAY_TILE, fs.num_tri_tiles)
    in_specs = [
        pl.BlockSpec((RAY_TILE, FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (FEAT, 4 * TRI_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full cluster table
    ]
    out_specs = [
        pl.BlockSpec((RAY_TILE, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
    ]
    args = [feats, tmax, fs.trimat, fs.cluster_box]

    if with_attrs:
        in_specs.append(
            pl.BlockSpec((TRI_TILE, ATTR), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM)
        )
        out_specs.append(
            pl.BlockSpec((RAY_TILE, ATTR), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((r_pad, ATTR), jnp.float32))
        args.append(fs.attrs)

        def kernel(feats_r, tmax_r, trimat_r, box_r, attr_r, best_r, id_r,
                   attro_r):
            _closest_kernel(feats_r, tmax_r, trimat_r, box_r, best_r, id_r,
                            t_min=t_min, attr_ref=attr_r, attr_out_ref=attro_r)
    else:
        kernel = functools.partial(_closest_kernel, t_min=t_min)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    best, tid = outs[0], outs[1]

    t = best[:R, 0]
    tid = tid[:R, 0]
    # rays that never improved keep t == t_max -> miss
    missed = tid < 0
    hit = Hit(
        t=t,
        tri_id=jnp.where(missed, -1, jnp.minimum(tid, fs.num_tris - 1)),
        u=best[:R, 1],
        v=best[:R, 2],
    )
    if with_attrs:
        return hit, outs[2][:R]
    return hit


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def flash_closest_hit(
    fs: FlashScene, origin, direction, t_max, t_min=1e-3, interpret=False
) -> Hit:
    """Closest hit for a flat wavefront. origin/direction (R,3), t_max (R,)."""
    return _flash_closest_impl(fs, origin, direction, t_max, t_min,
                               interpret, with_attrs=False)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def flash_closest_hit_attrs(
    fs: FlashScene, origin, direction, t_max, t_min=1e-3, interpret=False
):
    """Closest hit + fused surface-attribute fetch. Returns
    (Hit, attrs (R, ATTR)) — attrs rows are the winning triangle's
    [n0 n1 n2 | uv0 uv1 uv2 | mat_id mesh_id | geo_n | pad]."""
    return _flash_closest_impl(fs, origin, direction, t_max, t_min,
                               interpret, with_attrs=True)


# ---------------------------------------------------------------------------
# v2: sparse per-packet cluster lists (scalar prefetch)
# ---------------------------------------------------------------------------


def packet_cluster_order(fs: FlashScene, origin, direction, t_max,
                         t_min=1e-3):
    """Conservative packet->cluster culling (XLA prepass): the full
    near-sorted candidate ranking. Returns (order (P, NTT) int32 cluster
    ids sorted by entry-distance lower bound, raw_counts (P,) int32 of
    geometrically-hittable clusters, entry_sorted (P, NTT) f32 the
    entry-distance lower bounds in rank order — the v4 in-kernel
    early-exit reads these to stop a packet's cluster loop as soon as no
    remaining cluster can beat the running best / reach a live ray).
    `_round_lists` slices rank windows [r*K, (r+1)*K) out of this for
    the exact multi-round tracer."""
    R = origin.shape[0]
    ntt = fs.num_tri_tiles
    P = R // RAY_TILE
    o = (origin - fs.center).reshape(P, RAY_TILE, 3)
    d = direction.reshape(P, RAY_TILE, 3)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmax_ub = tm.reshape(P, RAY_TILE).max(axis=1)  # (P,)

    olo = o.min(axis=1)[:, None, :]  # (P,1,3)
    ohi = o.max(axis=1)[:, None, :]
    dlo = d.min(axis=1)[:, None, :]
    dhi = d.max(axis=1)[:, None, :]
    blo = fs.cluster_box[None, :, 0:3]  # (1,NTT,3)
    bhi = fs.cluster_box[None, :, 3:6]

    # numerator intervals for the two slab planes
    a_lo, a_hi = blo - ohi, blo - olo
    b_lo, b_hi = bhi - ohi, bhi - olo
    straddle = (dlo <= 0.0) & (dhi >= 0.0)  # axis gives no cull

    def idiv(n_lo, n_hi):
        # interval division by [dlo, dhi] (strictly one-signed where used)
        q1, q2 = n_lo / dlo, n_lo / dhi
        q3, q4 = n_hi / dlo, n_hi / dhi
        lo = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
        hi = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
        return lo, hi

    t0_lo, t0_hi = idiv(a_lo, a_hi)
    t1_lo, t1_hi = idiv(b_lo, b_hi)
    entry_lb = jnp.where(straddle, -BIG_T, jnp.minimum(t0_lo, t1_lo))
    exit_ub = jnp.where(straddle, BIG_T, jnp.maximum(t0_hi, t1_hi))
    tnear_lb = jnp.max(entry_lb, axis=-1)  # (P, NTT)
    tfar_ub = jnp.min(exit_ub, axis=-1)
    # direction-free entry bound: distance(origin box, cluster box) <= t
    # for unit directions (every production ray is normalized). Tightens
    # both the cull and the near-first sort for straddling packets.
    gap = jnp.maximum(jnp.maximum(blo - ohi, olo - bhi), 0.0)  # (P,NTT,3)
    dist_lb = jnp.sqrt(jnp.sum(gap * gap, axis=-1))  # (P, NTT)
    entry_t_lb = jnp.maximum(jnp.maximum(tnear_lb, 0.0), dist_lb)
    hit = (
        (tnear_lb <= tfar_ub)
        & (tfar_ub > t_min)
        & (entry_t_lb < tmax_ub[:, None])
    )
    key = jnp.where(hit, entry_t_lb, BIG_T)
    # ONE sort carrying the cluster ids as values: jnp.argsort +
    # take_along_axis ran the sort AND a gather (the gather lowers badly
    # on TPU — the r5 stage decomposition measured the old
    # argsort+2x take_along_axis path at ~17 ms of a 30 ms trace call)
    iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    entry_sorted, order = jax.lax.sort_key_val(key, iota, dimension=1)
    raw_counts = jnp.sum(hit, axis=1).astype(jnp.int32)
    return order, raw_counts, entry_sorted


def _pad_ranking(order, entry_sorted, K):
    """Edge-pad the (P, NTT) ranking to a whole number of K-wide rank
    windows so _round_lists can slice instead of gather. Edge padding
    repeats the last column: a valid cluster id whose true entry bound
    IS the repeated entry value, so padded slots stay exact for both the
    conservative re-test and the early-exit bound."""
    NTT = order.shape[1]
    W = -(-NTT // K) * K
    if W == NTT:
        return order, entry_sorted
    pad = ((0, 0), (0, W - NTT))
    return (jnp.pad(order, pad, mode="edge"),
            jnp.pad(entry_sorted, pad, mode="edge"))


def _round_lists(order_p, entry_p, raw_counts, r, K):
    """Rank window [r*K, (r+1)*K) of the K-padded near-sorted ranking as
    a kernel-ready (ids (P*K,) int32, entries (P*K,) f32, counts (P,)
    int32) triple; r may be a traced scalar (the overflow-round loop).

    Pure SLICES — no gathers. Slots past a packet's live count hold the
    subsequent rank entries (conservatively-culled clusters): testing
    them is wasted-but-exact (closest/anyhit are idempotent in extra
    true geometry), and the loop tracer never reads past
    ceil(count/C)*C slots anyway. The old repeat-last-live gather
    (take_along_axis) cost 10.7 ms per 2M-ray call — more than the
    kernel itself."""
    counts = jnp.clip(raw_counts - r * K, 0, K)
    ids = jax.lax.dynamic_slice_in_dim(order_p, r * K, K, axis=1)
    entries = jax.lax.dynamic_slice_in_dim(entry_p, r * K, K, axis=1)
    # 1-D layouts: 2-D int arrays in SMEM are lane-padded to 128 wide,
    # blowing the ~1 MB SMEM budget at screen-scale packet counts
    return ids.reshape(-1), entries.reshape(-1), counts


def packet_cluster_lists(fs: FlashScene, origin, direction, t_max,
                         t_min=1e-3, k_cap=MAX_CLUSTERS, k_list=None):
    """Round-0 packet->cluster lists (see packet_cluster_order for the
    culling geometry). Returns (ids (P*K,) int32, counts (P,) int32
    clamped to K, raw_counts (P,) int32 unclamped). K = min(NTT, k_cap).
    Completeness: exact when raw_counts <= K everywhere; packets
    intersecting more than K clusters get the FARTHEST ones deferred to
    later rank windows (see _flash_sparse_impl's overflow rounds, which
    re-run the SAME kernel payload over ranks [r*K, (r+1)*K))."""
    ntt = fs.num_tri_tiles
    K = int(k_list) if k_list is not None else int(min(ntt, k_cap))
    order, raw_counts, entry_sorted = packet_cluster_order(
        fs, origin, direction, t_max, t_min=t_min)
    order, entry_sorted = _pad_ranking(order, entry_sorted, K)
    ids, _, counts = _round_lists(order, entry_sorted, raw_counts, 0, K)
    return ids, counts, raw_counts


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel_features(rays):
    """In-kernel twin of _features: the 16-lane Plücker feature rows
    from packed (rt, 8) rays [o-center (3), 0, d (3), 0]. Built on the
    VPU once per sub-packet (amortized over its cluster loop). The XLA
    version materialized a full (R, 16) f32 plane per trace call —
    measured 5.7 ms of concat/pad copies per 2M-ray call, and double
    the kernel-input DMA bytes."""
    rt = rays.shape[0]
    o = rays[:, 0:3]
    d = rays[:, 4:7]
    m0 = rays[:, 1:2] * rays[:, 6:7] - rays[:, 2:3] * rays[:, 5:6]
    m1 = rays[:, 2:3] * rays[:, 4:5] - rays[:, 0:1] * rays[:, 6:7]
    m2 = rays[:, 0:1] * rays[:, 5:6] - rays[:, 1:2] * rays[:, 4:5]
    ones = jnp.ones((rt, 1), rays.dtype)
    zeros = jnp.zeros((rt, FEAT - 10), rays.dtype)
    return jnp.concatenate([o, d, m0, m1, m2, ones, zeros], axis=1)


# relative slop on the numerator-space barycentric acceptance: bf16x3
# rounding can push an exact-edge hit a hair negative; being slightly
# inclusive instead re-tests shared edges on both triangles (harmless,
# closest-t wins) rather than opening cracks.
EDGE_SLOP = 1e-4
# visibility accept slop under single-pass bf16 (relative to |det|)
EDGE_SLOP_VIS = 8e-3
# measured: the visibility pass is accept-op-bound, not matmul-bound, so
# the single-pass bf16 variant bought nothing — default stays precise
VIS_BF16 = _os.environ.get("FLASH_VIS_BF16", "0") == "1"
# NOTE r5: a bf16 accept epilogue (comparisons at half vector width) was
# prototyped and measured — Mosaic on v5e rejects bf16 cmpf ("Target does
# not support this comparison"), so the accept must stay f32.
# closest-hit: order tile candidates with the fast ~12-bit reciprocal and
# refine only the winner with an exact divide (see _sparse_closest_kernel)
APPROX_DIV = _os.environ.get("FLASH_APPROX_DIV", "1") == "1"
DET_EPS = 1e-12


def _mt_numerator_space(prod, tt, t_min, best_or_tmax):
    """Sign-adjusted numerator-space Möller-Trumbore acceptance.
    prod: (RT, 4*tt) grouped [det|t|u|v]. Returns (valid, st, adet)."""
    det = prod[:, 0 * tt : 1 * tt]
    tn = prod[:, 1 * tt : 2 * tt]
    un = prod[:, 2 * tt : 3 * tt]
    vn = prod[:, 3 * tt : 4 * tt]
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = det * s
    su = un * s
    sv = vn * s
    st = tn * s
    slop = EDGE_SLOP * adet
    valid = (
        (adet > DET_EPS)
        & (su >= -slop)
        & (sv >= -slop)
        & (su + sv <= adet + slop)
        & (st > t_min * adet)
        & (st < best_or_tmax * adet)
    )
    return valid, st, adet, su, sv


def _hoisted_inv_dir(feats):
    """Per-axis safe reciprocal directions, hoisted out of the per-cluster
    box tests."""
    invs = []
    for axis in range(3):
        d = feats[:, 3 + axis]
        safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        invs.append(1.0 / safe)
    return invs


def _ray_box_any_multi(feats, inv_dir, box_ref, ids_ref, base, C, best_t,
                       t_min):
    """Union packet-vs-AABB test over this grid step's C clusters; one
    vector->scalar reduction total."""
    hit_any = None
    for j in range(C):
        c = ids_ref[base + j]
        tnear = jnp.full(best_t.shape, -BIG_T)
        tfar = jnp.full(best_t.shape, BIG_T)
        for axis in range(3):
            o = feats[:, axis]
            inv = inv_dir[axis]
            lo = (box_ref[c * 8 + axis] - o) * inv
            hi = (box_ref[c * 8 + 3 + axis] - o) * inv
            tnear = jnp.maximum(tnear, jnp.minimum(lo, hi))
            tfar = jnp.minimum(tfar, jnp.maximum(lo, hi))
        h = (tnear <= tfar) & (tfar > t_min) & (tnear < best_t)
        hit_any = h if hit_any is None else (hit_any | h)
    hit_any = hit_any & (best_t > t_min)
    return jnp.max(hit_any.astype(jnp.int32)) > 0


def _grouped_mt(f_hi, f_lo, m48s, tt):
    """One K=48 folded dot per cluster ([f_hi|f_lo|f_hi] @ [hi;hi;lo] =
    the bf16x3 split-operand product) -> per-kind (det|t|u|v) planes
    concatenated across the step's C clusters: each (RT, C*tt)."""
    f48 = jnp.concatenate([f_hi, f_lo, f_hi], axis=1)
    prods = [jnp.dot(f48, m[:], preferred_element_type=jnp.float32)
             for m in m48s]
    det = jnp.concatenate([pr[:, 0 * tt : 1 * tt] for pr in prods], axis=1)
    tn = jnp.concatenate([pr[:, 1 * tt : 2 * tt] for pr in prods], axis=1)
    un = jnp.concatenate([pr[:, 2 * tt : 3 * tt] for pr in prods], axis=1)
    vn = jnp.concatenate([pr[:, 3 * tt : 4 * tt] for pr in prods], axis=1)
    return det, tn, un, vn


def _numerator_accept(det, tn, un, vn, t_min, best_or_tmax,
                      slop=EDGE_SLOP):
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = det * s
    su = un * s
    sv = vn * s
    st = tn * s
    slop = slop * adet
    valid = (
        (adet > DET_EPS)
        & (su >= -slop)
        & (sv >= -slop)
        & (su + sv <= adet + slop)
        & (st > t_min * adet)
        & (st < best_or_tmax * adet)
    )
    return valid, st, adet, su, sv


def _sparse_closest_kernel(ids_ref, cnt_ref, feats_ref, tmax_ref, box_ref,
                           *rest, t_min, tt, kk, cps, with_attrs,
                           attrs_bf16=False, approx_div=False):
    C = cps
    m48s = rest[0:C]
    if with_attrs:
        attr_refs = rest[C : 2 * C]
        best_ref, id_ref, attr_out_ref = rest[2 * C :]
    else:
        attr_refs = None
        best_ref, id_ref = rest[C :]
        attr_out_ref = None

    k = pl.program_id(1)
    i = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        best_ref[:, 0:1] = tmax_ref[:]
        best_ref[:, 1:3] = jnp.zeros_like(best_ref[:, 1:3])
        id_ref[:] = jnp.full_like(id_ref[:], -1)
        if attr_out_ref is not None:
            attr_out_ref[:] = jnp.zeros_like(attr_out_ref[:])

    base = i * kk + k * C
    live = k * C < cnt_ref[i]

    def _work():
        feats = feats_ref[:]
        f_hi, f_lo = _split_bf16(feats)
        det, tn, un, vn = _grouped_mt(f_hi, f_lo, m48s, tt)
        if _os.environ.get("FLASH_NO_EPILOGUE") == "1":  # debug knob
            best_ref[:, 0:1] = jnp.min(
                det + tn + un + vn, axis=1, keepdims=True)
            return
        best_t = best_ref[:, 0:1]
        valid, st, adet, su, sv = _numerator_accept(
            det, tn, un, vn, t_min, best_t)
        safe_adet = jnp.maximum(adet, 1e-30)
        if approx_div:
            # candidate t only ORDERS the tile (winner refined exactly in
            # _update via pick(st)/pick(adet)); the ~12-bit approximate
            # reciprocal skips the Newton refinement XLA's divide pays on
            # every (ray, tri) candidate — the epilogue is VPU-bound
            t = jnp.where(valid, st * pl.reciprocal(safe_adet, approx=True),
                          BIG_T)
        else:
            t = jnp.where(valid, st / safe_adet, BIG_T)
        tile_min = jnp.min(t, axis=1, keepdims=True)
        improved = tile_min < best_t

        def _update():
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            sel = (t == tile_min) & improved
            first = jnp.min(jnp.where(sel, lane, C * tt),
                            axis=1, keepdims=True)
            sel = (lane == first) & improved

            def pick(x):
                return jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                               keepdims=True)

            inv = 1.0 / jnp.maximum(pick(adet), 1e-30)
            # approx-ordered tiles refine the winner's t exactly here:
            # one true division per packet instead of one per candidate
            win_t = pick(st) * inv if approx_div else tile_min
            # winner lane -> global tri id: cluster j = first // tt,
            # id = ids[base+j]*tt + (first - j*tt), computed with C
            # scalar-broadcast selects on the (RT,1) winner vector
            gid = first
            for j in range(C):
                c_j = ids_ref[base + j]
                in_j = (first >= j * tt) & (first < (j + 1) * tt)
                gid = jnp.where(in_j, first + (c_j - j) * tt, gid)
            best_ref[:, 0:1] = jnp.where(improved, win_t, best_t)
            best_ref[:, 1:2] = jnp.where(
                improved, pick(su) * inv, best_ref[:, 1:2])
            best_ref[:, 2:3] = jnp.where(
                improved, pick(sv) * inv, best_ref[:, 2:3])
            id_ref[:] = jnp.where(improved, gid, id_ref[:])
            if attr_out_ref is not None:
                attr_cat = jnp.concatenate(
                    [a[:] for a in attr_refs], axis=0)
                if attrs_bf16:
                    attr_sel = jnp.dot(
                        jnp.where(sel, 1.0, 0.0).astype(jnp.bfloat16),
                        attr_cat.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    attr_sel = jnp.dot(
                        jnp.where(sel, 1.0, 0.0), attr_cat,
                        preferred_element_type=jnp.float32,
                    )
                attr_out_ref[:] = jnp.where(
                    improved, attr_sel, attr_out_ref[:])

        if SYNC_FREE:
            _update()
        else:
            pl.when(jnp.any(improved))(_update)

    if SYNC_FREE:
        pl.when(live)(_work)
    else:
        def _gated():
            feats = feats_ref[:]
            inv_dir = _hoisted_inv_dir(feats)
            pl.when(_ray_box_any_multi(
                feats, inv_dir, box_ref, ids_ref, base, C,
                best_ref[:, 0], t_min))(_work)
        pl.when(live)(_gated)


def _sparse_anyhit_kernel(ids_ref, cnt_ref, feats_ref, tmax_ref, box_ref,
                          *rest, t_min, tt, kk, cps, vis_bf16=None):
    C = cps
    m48s = rest[0:C]
    (vis_ref,) = rest[C :]

    k = pl.program_id(1)
    i = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        vis_ref[:] = (tmax_ref[:] > t_min).astype(jnp.int32)

    base = i * kk + k * C
    live = k * C < cnt_ref[i]

    bf16 = VIS_BF16 if vis_bf16 is None else vis_bf16

    def _work():
        feats = feats_ref[:]
        if bf16:
            # single-pass bf16 (K=16): visibility is a binary accept, and
            # the wider EDGE_SLOP_VIS absorbs bf16 rounding of the
            # numerators (shadow/AO edges get re-tested inclusively, the
            # denoisers smooth the half-texel wobble)
            f16 = feats.astype(jnp.bfloat16)
            prods = [jnp.dot(f16, m[:FEAT, :],
                             preferred_element_type=jnp.float32)
                     for m in m48s]
            det = jnp.concatenate([p[:, 0*tt:1*tt] for p in prods], axis=1)
            tn = jnp.concatenate([p[:, 1*tt:2*tt] for p in prods], axis=1)
            un = jnp.concatenate([p[:, 2*tt:3*tt] for p in prods], axis=1)
            vn = jnp.concatenate([p[:, 3*tt:4*tt] for p in prods], axis=1)
            valid, _, _, _, _ = _numerator_accept(
                det, tn, un, vn, t_min, tmax_ref[:], slop=EDGE_SLOP_VIS)
        else:
            f_hi, f_lo = _split_bf16(feats)
            det, tn, un, vn = _grouped_mt(f_hi, f_lo, m48s, tt)
            valid, _, _, _, _ = _numerator_accept(
                det, tn, un, vn, t_min, tmax_ref[:])
        blocked = jnp.max(valid.astype(jnp.int32), axis=1, keepdims=True)
        vis_ref[:] = vis_ref[:] * (1 - blocked)

    if SYNC_FREE:
        pl.when(live)(_work)
    else:
        def _gated():
            feats = feats_ref[:]
            inv_dir = _hoisted_inv_dir(feats)
            live_budget = jnp.where(vis_ref[:, 0] > 0, tmax_ref[:, 0], 0.0)
            pl.when(_ray_box_any_multi(
                feats, inv_dir, box_ref, ids_ref, base, C, live_budget,
                t_min))(_work)
        pl.when(live)(_gated)


# ---------------------------------------------------------------------
# v3/v4: in-kernel cluster loop. v2's rectangular grid (P, K/C) pays a
# fixed ~1.4 us of Mosaic per grid STEP whether or not the step is live —
# at a measured 2.65 mean clusters/packet against K=20 (shadows_test
# primaries) ~75% of steps were dead, and the sweep showed anyhit
# (113 ms) ~ closest (127 ms) despite wildly different epilogues: the
# bound was step count, not compute. Here the grid is (P,) — ONE step
# per packet — and each packet runs ceil(count/C) iterations of an
# in-kernel loop. Dead work drops to zero, the running best lives in
# loop-carried registers, and packets with empty lists cost one branch.
#
# r5 (v4) additions on top of the r4 fori_loop design:
#  - RESIDENT mode: when the whole cluster-blocked scene fits in VMEM
#    (NTT * 61 KB <= ~8 MB, i.e. <= ~16k triangles — every bundled scene
#    except the hero), the trimat/attr blocks are passed as full-array
#    VMEM operands and the loop dynamic-indexes them directly: no DMA,
#    no semaphores, no double buffering, no per-step wait latency.
#  - EARLY EXIT: the loop is a while_loop gated on the prepass's
#    entry-distance lower bounds (entry_ref, rank-sorted). closest: stop
#    when the next cluster's entry bound >= the packet's max running
#    best t (front-to-back resolution — primaries typically resolve in
#    the first cluster); anyhit: stop when every ray is blocked or no
#    live ray's t_max reaches the next cluster. In DMA mode the one
#    prefetched-but-unconsumed step is drained after the loop so its
#    semaphore cannot leak into the next grid step.
# ---------------------------------------------------------------------


def _loop_closest_kernel(ids_ref, cnt_ref, entry_ref, rays_ref, tmax_ref,
                         mat_hbm, *rest, t_min, tt, kk, cps, grp,
                         with_attrs, attrs_bf16=False, approx_div=False,
                         resident=False, early_exit=True):
    C = cps
    if resident:
        if with_attrs:
            attr_hbm, best_ref, id_ref, attr_out_ref = rest
        else:
            best_ref, id_ref = rest
            attr_hbm = attr_out_ref = None
        mat_slab = sems = attr_slab = attr_sems = None
    elif with_attrs:
        attr_hbm, best_ref, id_ref, attr_out_ref = rest[:4]
        mat_slab, sems, attr_slab, attr_sems = rest[4:]
    else:
        best_ref, id_ref = rest[:2]
        mat_slab, sems = rest[2:]
        attr_hbm = attr_slab = attr_sems = attr_out_ref = None

    i = pl.program_id(0)
    rt = tmax_ref.shape[0] // grp  # rays per sub-packet (= RAY_TILE)

    # whole-block init (covers sub-packets whose lists are empty)
    best_ref[:, 0:1] = tmax_ref[:]
    best_ref[:, 1:3] = jnp.zeros_like(best_ref[:, 1:3])
    id_ref[:] = jnp.full_like(id_ref[:], -1)
    if with_attrs:
        attr_out_ref[:] = jnp.zeros_like(attr_out_ref[:])

    # feature build hoisted to ONE whole-block op chain per grid step:
    # the build is concat/relayout-heavy, and per-sub-packet copies of it
    # dominated the per-packet fixed cost (r5 fixed-vs-slope fit:
    # ~1.9 us/packet fixed at grp=8)
    f_hi, f_lo = _split_bf16(_kernel_features(rays_ref[:]))
    f48_all = jnp.concatenate([f_hi, f_lo, f_hi], axis=1)

    # grp sub-packets per grid step: amortizes the fixed per-grid-step
    # Mosaic cost (~3.1 us measured r5 from the shadows-vs-AO
    # clusters/packet regression) over grp independent cluster loops
    # while keeping culling granularity at RAY_TILE rays
    for g in range(grp):
        _one_closest_packet(
            g, rt, i * grp + g, ids_ref, cnt_ref, entry_ref, f48_all,
            tmax_ref, mat_hbm, attr_hbm, best_ref, id_ref, attr_out_ref,
            mat_slab, sems, attr_slab, attr_sems,
            t_min=t_min, tt=tt, kk=kk, C=C, with_attrs=with_attrs,
            attrs_bf16=attrs_bf16, approx_div=approx_div,
            resident=resident, early_exit=early_exit)


def _one_closest_packet(g, rt, p, ids_ref, cnt_ref, entry_ref, f48_all,
                        tmax_ref, mat_hbm, attr_hbm, best_ref, id_ref,
                        attr_out_ref, mat_slab, sems, attr_slab, attr_sems,
                        *, t_min, tt, kk, C, with_attrs, attrs_bf16,
                        approx_div, resident, early_exit):
    """One sub-packet's cluster loop (rows [g*rt, (g+1)*rt) of the grid
    step's block; scalar windows at packet index p)."""
    r0 = g * rt
    cnt = cnt_ref[p]
    nsteps = (cnt + C - 1) // C
    tmax_col = tmax_ref[r0:r0 + rt]

    def _mat_dma(s, slot, j):
        cid = ids_ref[p * kk + s * C + j]
        return pltpu.make_async_copy(
            mat_hbm.at[cid], mat_slab.at[slot, j], sems.at[slot, j])

    def _attr_dma(s, slot, j):
        cid = ids_ref[p * kk + s * C + j]
        return pltpu.make_async_copy(
            attr_hbm.at[cid], attr_slab.at[slot, j], attr_sems.at[slot, j])

    def start(s, slot):
        for j in range(C):
            _mat_dma(s, slot, j).start()
            if with_attrs:
                _attr_dma(s, slot, j).start()

    def wait(s, slot):
        for j in range(C):
            _mat_dma(s, slot, j).wait()
            if with_attrs:
                _attr_dma(s, slot, j).wait()

    @pl.when(nsteps > 0)
    def _trace():
        if not resident:
            start(0, 0)
        f48 = f48_all[r0:r0 + rt]

        def cond(carry):
            s = carry[0]
            go = s < nsteps
            if early_exit:
                # entry bounds are rank-sorted: once the next cluster's
                # entry lower bound can't beat the slowest ray's running
                # best, no later cluster can either
                nxt = p * kk + jnp.minimum(s, nsteps - 1) * C
                go = go & (entry_ref[nxt] < carry[4])
            return go

        def body(carry):
            s, best, gid, acc, _ = carry
            slot = jax.lax.rem(s, 2)
            if resident:
                mats = [mat_hbm[ids_ref[p * kk + s * C + j]]
                        for j in range(C)]
            else:
                @pl.when(s + 1 < nsteps)
                def _():
                    start(s + 1, jax.lax.rem(s + 1, 2))

                wait(s, slot)
                mats = [mat_slab[slot, j] for j in range(C)]
            prods = [jnp.dot(f48, m, preferred_element_type=jnp.float32)
                     for m in mats]
            if _LOOP_DEBUG == "dot":
                upd = prods[0][:, 0:1]
                for pr in prods[1:]:
                    upd = upd + pr[:, 0:1]
                nb = jnp.concatenate(
                    [best[:, 0:1] + upd * 1e-30, best[:, 1:3]], axis=1)
                return s + 1, nb, gid, acc, carry[4]
            det = jnp.concatenate(
                [pr[:, 0 * tt: 1 * tt] for pr in prods], axis=1)
            tn = jnp.concatenate(
                [pr[:, 1 * tt: 2 * tt] for pr in prods], axis=1)
            un = jnp.concatenate(
                [pr[:, 2 * tt: 3 * tt] for pr in prods], axis=1)
            vn = jnp.concatenate(
                [pr[:, 3 * tt: 4 * tt] for pr in prods], axis=1)
            best_t = best[:, 0:1]
            valid, st, adet, su, sv = _numerator_accept(
                det, tn, un, vn, t_min, best_t)
            safe_adet = jnp.maximum(adet, 1e-30)
            if approx_div:
                t = jnp.where(
                    valid, st * pl.reciprocal(safe_adet, approx=True),
                    BIG_T)
            else:
                t = jnp.where(valid, st / safe_adet, BIG_T)
            tile_min = jnp.min(t, axis=1, keepdims=True)
            improved = tile_min < best_t
            if _LOOP_DEBUG == "accept":
                nb = jnp.concatenate(
                    [jnp.where(improved, tile_min, best_t), best[:, 1:3]],
                    axis=1)
                bm = (jnp.max(nb[:, 0]) if early_exit
                      else jnp.float32(0.0))
                return s + 1, nb, gid, acc, bm

            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            sel = (t == tile_min) & improved
            first = jnp.min(jnp.where(sel, lane, C * tt),
                            axis=1, keepdims=True)
            sel = (lane == first) & improved

            def pick(x):
                return jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                               keepdims=True)

            inv = 1.0 / jnp.maximum(pick(adet), 1e-30)
            win_t = pick(st) * inv if approx_div else tile_min
            gcol = first
            for j in range(C):
                c_j = ids_ref[p * kk + s * C + j]
                in_j = (first >= j * tt) & (first < (j + 1) * tt)
                gcol = jnp.where(in_j, first + (c_j - j) * tt, gcol)
            new_best = jnp.concatenate([
                jnp.where(improved, win_t, best_t),
                jnp.where(improved, pick(su) * inv, best[:, 1:2]),
                jnp.where(improved, pick(sv) * inv, best[:, 2:3]),
            ], axis=1)
            new_gid = jnp.where(improved, gcol, gid)
            if with_attrs:
                # transposed layout: attr_cat is (ATTR, C*tt); contract
                # both operands on the tt axis (N-T matmul on the MXU)
                if resident:
                    attr_cat = jnp.concatenate(
                        [attr_hbm[ids_ref[p * kk + s * C + j]]
                         for j in range(C)], axis=1)
                else:
                    attr_cat = jnp.concatenate(
                        [attr_slab[slot, j] for j in range(C)], axis=1)
                sel_f = jnp.where(sel, 1.0, 0.0)
                if attrs_bf16:
                    attr_sel = jax.lax.dot_general(
                        sel_f.astype(jnp.bfloat16),
                        attr_cat.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    attr_sel = jax.lax.dot_general(
                        sel_f, attr_cat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc = jnp.where(improved, attr_sel, acc)
            best_max = (jnp.max(new_best[:, 0]) if early_exit
                        else jnp.float32(0.0))
            return s + 1, new_best, new_gid, acc, best_max

        init = (
            jnp.int32(0),
            jnp.concatenate(
                [tmax_col, jnp.zeros((rt, 2), jnp.float32)], axis=1),
            jnp.full((rt, 1), -1, jnp.int32),
            (jnp.zeros((rt, ATTR), jnp.float32)
             if with_attrs else jnp.zeros((1, 1), jnp.float32)),
            jnp.max(tmax_col) if early_exit else jnp.float32(0.0),
        )
        s_end, best, gid, acc, _ = jax.lax.while_loop(cond, body, init)
        if not resident and early_exit:
            # an early exit leaves step s_end prefetched but unconsumed;
            # drain it so the slot's semaphore can't leak into the next
            # sub-packet's wait
            @pl.when(s_end < nsteps)
            def _drain():
                wait(s_end, jax.lax.rem(s_end, 2))
        best_ref[r0:r0 + rt, 0:3] = best
        id_ref[r0:r0 + rt] = gid
        if with_attrs:
            attr_out_ref[r0:r0 + rt] = acc


def _loop_anyhit_kernel(ids_ref, cnt_ref, entry_ref, rays_ref, tmax_ref,
                        mat_hbm, vis_ref, *scratch, t_min, tt, kk, cps,
                        grp, vis_bf16=None, resident=False,
                        early_exit=True):
    C = cps
    if resident:
        mat_slab = sems = None
    else:
        mat_slab, sems = scratch
    i = pl.program_id(0)
    rt = tmax_ref.shape[0] // grp
    vis_ref[:] = (tmax_ref[:] > t_min).astype(jnp.int32)

    # hoisted whole-block feature build (see _loop_closest_kernel)
    feats_all = _kernel_features(rays_ref[:])
    bf16 = VIS_BF16 if vis_bf16 is None else vis_bf16
    if bf16:
        f48_all = feats_all.astype(jnp.bfloat16)
    else:
        f_hi, f_lo = _split_bf16(feats_all)
        f48_all = jnp.concatenate([f_hi, f_lo, f_hi], axis=1)

    for g in range(grp):
        _one_anyhit_packet(
            g, rt, i * grp + g, ids_ref, cnt_ref, entry_ref, f48_all,
            tmax_ref, mat_hbm, vis_ref, mat_slab, sems,
            t_min=t_min, tt=tt, kk=kk, C=C, vis_bf16=bf16,
            resident=resident, early_exit=early_exit)


def _one_anyhit_packet(g, rt, p, ids_ref, cnt_ref, entry_ref, f48_all,
                       tmax_ref, mat_hbm, vis_ref, mat_slab, sems, *,
                       t_min, tt, kk, C, vis_bf16, resident, early_exit):
    r0 = g * rt
    cnt = cnt_ref[p]
    nsteps = (cnt + C - 1) // C
    tmax_col = tmax_ref[r0:r0 + rt]

    def _mat_dma(s, slot, j):
        cid = ids_ref[p * kk + s * C + j]
        return pltpu.make_async_copy(
            mat_hbm.at[cid], mat_slab.at[slot, j], sems.at[slot, j])

    def start(s, slot):
        for j in range(C):
            _mat_dma(s, slot, j).start()

    bf16 = vis_bf16

    @pl.when(nsteps > 0)
    def _trace():
        if not resident:
            start(0, 0)
        f48 = f48_all[r0:r0 + rt]

        def cond(carry):
            s, _, maxrem = carry
            go = s < nsteps
            if early_exit:
                # stop when every ray is blocked (maxrem 0) or no live
                # ray's budget reaches the next cluster's entry bound
                nxt = p * kk + jnp.minimum(s, nsteps - 1) * C
                go = go & (maxrem > t_min) & (entry_ref[nxt] < maxrem)
            return go

        def body(carry):
            s, vis, _ = carry
            slot = jax.lax.rem(s, 2)
            if resident:
                mats = [mat_hbm[ids_ref[p * kk + s * C + j]]
                        for j in range(C)]
            else:
                @pl.when(s + 1 < nsteps)
                def _():
                    start(s + 1, jax.lax.rem(s + 1, 2))

                for j in range(C):
                    _mat_dma(s, slot, j).wait()
                mats = [mat_slab[slot, j] for j in range(C)]
            if bf16:
                prods = [jnp.dot(f48, m[:FEAT, :],
                                 preferred_element_type=jnp.float32)
                         for m in mats]
                slop = EDGE_SLOP_VIS
            else:
                prods = [jnp.dot(f48, m,
                                 preferred_element_type=jnp.float32)
                         for m in mats]
                slop = EDGE_SLOP
            if _LOOP_DEBUG == "dot":
                upd = prods[0][:, 0:1]
                for pr in prods[1:]:
                    upd = upd + pr[:, 0:1]
                blocked = (upd > BIG_T).astype(jnp.int32)
            else:
                det = jnp.concatenate(
                    [pr[:, 0 * tt: 1 * tt] for pr in prods], axis=1)
                tn = jnp.concatenate(
                    [pr[:, 1 * tt: 2 * tt] for pr in prods], axis=1)
                un = jnp.concatenate(
                    [pr[:, 2 * tt: 3 * tt] for pr in prods], axis=1)
                vn = jnp.concatenate(
                    [pr[:, 3 * tt: 4 * tt] for pr in prods], axis=1)
                valid, _, _, _, _ = _numerator_accept(
                    det, tn, un, vn, t_min, tmax_col, slop=slop)
                blocked = jnp.max(valid.astype(jnp.int32), axis=1,
                                  keepdims=True)
            vis = vis * (1 - blocked)
            if early_exit:
                maxrem = jnp.max(tmax_col * vis.astype(jnp.float32))
            else:
                maxrem = jnp.float32(0.0)
            return s + 1, vis, maxrem

        vis0 = (tmax_col > t_min).astype(jnp.int32)
        init = (
            jnp.int32(0), vis0,
            (jnp.max(tmax_col * vis0.astype(jnp.float32))
             if early_exit else jnp.float32(0.0)),
        )
        s_end, vis, _ = jax.lax.while_loop(cond, body, init)
        if not resident and early_exit:
            @pl.when(s_end < nsteps)
            def _drain():
                for j in range(C):
                    _mat_dma(s_end, jax.lax.rem(s_end, 2), j).wait()
        vis_ref[r0:r0 + rt] = vis


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "interpret", "with_attrs", "any_hit", "K",
                     "C", "vis_bf16", "attrs_bf16", "resident",
                     "early_exit", "grp"))
def _loop_call_jit(rays, tmax, ids, counts, entries, mat_blk, attr_blk,
                   *, t_min, interpret, with_attrs, any_hit, K, C,
                   vis_bf16, attrs_bf16, resident, early_exit, grp):
    """v3/v4 pallas_call: grid=(packet groups,), in-kernel cluster loops
    (see the kernel block comment: resident = whole scene as full-VMEM
    operands, else double-buffered DMA; early_exit = entry-bound-gated
    while_loop; GROUP sub-packets per grid step amortize the fixed
    per-grid-step cost). Rays arrive packed (R, 8) [o-center, 0, d, 0];
    the 16-lane feature matrix is built in-kernel (_kernel_features).
    Shares the one-traced-jaxpr payload-dedup property of
    _sparse_call_jit (same shapes at every site -> one Mosaic payload
    per variant)."""
    tt = TRI_TILE
    P = counts.shape[0]
    r_pad = rays.shape[0]

    common_in = [
        pl.BlockSpec((grp * RAY_TILE, RAY_PK),
                     lambda i, ids, cnt, ent: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((grp * RAY_TILE, 1), lambda i, ids, cnt, ent: (i, 0),
                     memory_space=pltpu.VMEM),
        # blocked trimat48: whole-array VMEM when resident, HBM + manual
        # DMA otherwise
        (pl.BlockSpec(memory_space=pltpu.VMEM) if resident
         else pl.BlockSpec(memory_space=pltpu.ANY)),
    ]
    mat_scratch = [] if resident else [
        pltpu.VMEM((2, C, 3 * FEAT, 4 * tt), mat_blk.dtype),
        pltpu.SemaphoreType.DMA((2, C)),
    ]

    if any_hit:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P // grp,),
            in_specs=common_in,
            out_specs=pl.BlockSpec((grp * RAY_TILE, 1),
                                   lambda i, ids, cnt, ent: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=mat_scratch,
        )
        return pl.pallas_call(
            functools.partial(_loop_anyhit_kernel, t_min=t_min, tt=tt,
                              kk=K, cps=C, grp=grp, vis_bf16=vis_bf16,
                              resident=resident, early_exit=early_exit),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ids, counts, entries, rays, tmax, mat_blk)

    args = [ids, counts, entries, rays, tmax, mat_blk]
    scratch = list(mat_scratch)
    out_specs = [
        pl.BlockSpec((grp * RAY_TILE, 4), lambda i, ids, cnt, ent: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((grp * RAY_TILE, 1), lambda i, ids, cnt, ent: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
    ]
    if with_attrs:
        common_in.append(
            pl.BlockSpec(memory_space=pltpu.VMEM) if resident
            else pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(attr_blk)
        out_specs.append(
            pl.BlockSpec((grp * RAY_TILE, ATTR),
                         lambda i, ids, cnt, ent: (i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((r_pad, ATTR), jnp.float32))
        if not resident:
            scratch += [
                pltpu.VMEM((2, C, ATTR, tt), jnp.float32),
                pltpu.SemaphoreType.DMA((2, C)),
            ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P // grp,),
        in_specs=common_in,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_loop_closest_kernel, t_min=t_min, tt=tt, kk=K,
                          cps=C, grp=grp, with_attrs=with_attrs,
                          attrs_bf16=attrs_bf16,
                          approx_div=APPROX_DIV and not interpret,
                          resident=resident, early_exit=early_exit),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # default scoped-VMEM budget is 16 MB; grp*RAY_TILE blocks beyond
        # 2048 rays tip the resident-scene + grouped-block sum over it
        # (r5 sweep: GROUP=16 OOM'd by 444 KB). v5e VMEM is 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# v3 loop tracer on by default; FLASH_LOOP=0 falls back to the v2
# rectangular grid (kept as the A/B + interpret-mode oracle)
USE_LOOP_TRACER = _os.environ.get("FLASH_LOOP", "1") == "1"


# per-call budget on scalar-prefetch entries (SMEM is ~1 MB); calls with
# more packets x K than this are split into packet chunks
_SMEM_ENTRY_BUDGET = 120_000

# clusters processed per grid step: amortizes per-step scalar/branch
# overhead while keeping culling granularity = TRI_TILE. Measured r4
# (shadows_test 1080p primaries/shadow/AO): v2 grid best at C=2; v3
# in-kernel loop best at C=1 (C=2 regressed 118->191 ms closest — the
# wider concat + dual DMA waits inside the fori_loop cost more than the
# halved step count saved).
_CPS_ENV = _os.environ.get("FLASH_CPS")
CLUSTERS_PER_STEP = (int(_CPS_ENV) if _CPS_ENV
                     else (1 if USE_LOOP_TRACER else 2))

# drop per-step vector->scalar syncs (in-kernel packet box test and
# improvement gating); the prepass lists already cull statically
SYNC_FREE = _os.environ.get("FLASH_SYNC_FREE", "1") == "1"

# v4 knobs: resident mode engages automatically when the cluster-blocked
# scene data fits this VMEM budget. Was 8 MB under the default 16 MB
# scoped-vmem limit; the kernels now carry a 100 MB limit (v5e VMEM is
# 128 MB), and 48 MB lets the attr-carrying traces (primary/reflections
# — the frame's costliest) go resident too: r5 sweep 321 -> 306.6 ms
# @1080p with GROUP=16. Early exit defaults on (it is exact — entry
# bounds are conservative lower bounds).
RESIDENT_LIMIT = int(float(_os.environ.get("FLASH_RESIDENT_MB", "48"))
                     * 2**20)
EARLY_EXIT = _os.environ.get("FLASH_EARLY_EXIT", "1") == "1"
# sub-packets per grid step: the r5 baseline regression (shadows 1.78
# clusters/pkt @ 3.9 us/pkt vs AO 4.98 @ 5.3) puts the fixed per-grid-
# step cost at ~3.1 us vs ~0.44 us per cluster step — grouping divides
# the fixed term by GROUP while keeping 256-ray culling granularity.
# r5 full-frame sweep (1080p shadows_test, 100 MB scoped-vmem limit):
# GROUP=8 337 ms / 16 321 ms (compile 160 s cold) / 32 no result in
# 900 s / 64 320.6 ms at 520 s compile — 16 is the knee.
GROUP = int(_os.environ.get("FLASH_GROUP", "16"))
_ATTR_FULL_GRP = _os.environ.get("FLASH_ATTR_FULL_GRP", "0") == "1"
# v3-loop stage bisection (WRONG OUTPUT — perf attribution only):
#   "dot"    = per-cluster dot + loop machinery, no slicing/accept
#   "accept" = + plane slicing + numerator accept + tile reduce,
#              no winner refine / attr fetch (closest only)
_LOOP_DEBUG = _os.environ.get("FLASH_LOOP_DEBUG", "")


def _resident_bytes(fs: FlashScene, with_attrs: bool) -> int:
    ntt, tt = fs.num_tri_tiles, TRI_TILE
    b = ntt * 3 * FEAT * 4 * tt * 2  # trimat48_blk bf16
    if with_attrs:
        b += ntt * ATTR * tt * 4  # attrs_blk f32
    return b


def _sparse_call(fs, rayf, tmax, ids, counts, entries, t_min, interpret,
                 with_attrs, any_hit, K, C, vis_bf16=None):
    """Shape-cached jit wrapper around the pallas_call: the serialized
    Mosaic payload embeds the tracing call stack's source locations, so
    tracing the kernel at N sites produced N byte-distinct payloads that
    the (remote) Mosaic compiler compiled separately. Routing every call
    through one inner jit reuses a single traced jaxpr — identical
    payload bytes at every site, compiled once (measured r4: anyhit
    5 distinct payloads -> 1 for identical shapes)."""
    if USE_LOOP_TRACER:
        import math

        resident = _resident_bytes(fs, with_attrs) <= RESIDENT_LIMIT
        # with_attrs carries 3 lane-padded whole-block outputs (best,
        # id, attrs = ~1 MB each at grp=8) on top of the hoisted
        # feature build; grp=8 put the resident variant 596 KB over the
        # then-16 MB scoped-VMEM limit, so it ran at half group. The
        # kernels now carry a 100 MB limit; FLASH_ATTR_FULL_GRP=1 keeps
        # attrs at full group (r5 sweep knob).
        grp = GROUP if (not with_attrs or _ATTR_FULL_GRP) else GROUP // 2
        return _loop_call_jit(
            rayf, tmax, ids, counts, entries, fs.trimat48_blk,
            fs.attrs_blk, t_min=t_min, interpret=interpret,
            with_attrs=with_attrs, any_hit=any_hit, K=K, C=C,
            vis_bf16=vis_bf16, attrs_bf16=bool(fs.attrs_bf16_safe),
            resident=resident, early_exit=EARLY_EXIT,
            grp=max(1, math.gcd(grp, counts.shape[0])))
    return _sparse_call_jit(
        rayf, tmax, ids, counts, fs.cluster_box, fs.trimat48, fs.attrs,
        t_min=t_min, interpret=interpret, with_attrs=with_attrs,
        any_hit=any_hit, K=K, C=C, vis_bf16=vis_bf16,
        attrs_bf16=bool(fs.attrs_bf16_safe))


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "interpret", "with_attrs", "any_hit", "K",
                     "C", "vis_bf16", "attrs_bf16"))
def _sparse_call_jit(feats, tmax, ids, counts, cluster_box, trimat48,
                     attrs, *, t_min, interpret, with_attrs, any_hit, K, C,
                     vis_bf16, attrs_bf16):
    tt = TRI_TILE
    P = counts.shape[0]
    r_pad = feats.shape[0]

    def mat_spec(j):
        return pl.BlockSpec(
            (3 * FEAT, 4 * tt),
            lambda i, k, ids, cnt, j=j: (0, ids[i * K + k * C + j]),
            memory_space=pltpu.VMEM)

    common_in = [
        pl.BlockSpec((RAY_TILE, FEAT), lambda i, k, ids, cnt: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i, k, ids, cnt: (i, 0),
                     memory_space=pltpu.VMEM),
        # cluster boxes FLAT (ntt*8,): SMEM pads the minor dim of 2-D
        # scalar arrays to 128 lanes (a (1494, 8) box table cost 765 KB
        # of the 1 MB SMEM at hero-scene cluster counts)
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    common_in += [mat_spec(j) for j in range(C)]
    args = ([feats, tmax, cluster_box.reshape(-1)]
            + [trimat48] * C)

    if any_hit:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(P, K // C),
            in_specs=common_in,
            out_specs=pl.BlockSpec(
                (RAY_TILE, 1), lambda i, k, ids, cnt: (i, 0),
                memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_sparse_anyhit_kernel, t_min=t_min, tt=tt,
                              kk=K, cps=C, vis_bf16=vis_bf16),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            interpret=interpret,
        )(ids, counts, *args)

    out_specs = [
        pl.BlockSpec((RAY_TILE, 4), lambda i, k, ids, cnt: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i, k, ids, cnt: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
    ]
    if with_attrs:
        for j in range(C):
            common_in.append(pl.BlockSpec(
                (tt, ATTR),
                lambda i, k, ids, cnt, j=j: (ids[i * K + k * C + j], 0),
                memory_space=pltpu.VMEM))
            args.append(attrs)
        out_specs.append(
            pl.BlockSpec((RAY_TILE, ATTR), lambda i, k, ids, cnt: (i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((r_pad, ATTR), jnp.float32))

    kernel = functools.partial(_sparse_closest_kernel, t_min=t_min,
                               tt=tt, kk=K, cps=C, with_attrs=with_attrs,
                               attrs_bf16=attrs_bf16,
                               approx_div=APPROX_DIV and not interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, K // C),
        in_specs=common_in,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, counts, *args)


# overflow handling: when a packet's raw candidate count exceeds the list
# capacity K, the remaining clusters are traced in extra ROUNDS over rank
# windows [r*K, (r+1)*K) of the same near-sorted order, re-running the
# SAME kernel payload inside a lax.while_loop (exact, early-exits when no
# packet has clusters left). Replaces the r3 lax.cond dense fallback,
# which lowered a second full Mosaic kernel at every trace site and blew
# the frame's compile budget (VERDICT r3 #1/#3). Rounds default ON; off
# only for perf experiments (silently drops the farthest clusters!).
OVERFLOW_ROUNDS = _os.environ.get("FLASH_OVERFLOW_ROUNDS", "1") == "1"

# fixed packet-chunk quantum: every sparse pallas_call in a frame is
# padded to a multiple of CHUNK_P packets so all calls of a variant share
# ONE Mosaic payload (compile once, cached). Mosaic compile is the frame's
# dominant cost over the remote-compile tunnel; padded packets carry
# count 0 / t_max 0 and skip both compute and unique-block DMA.
CHUNK_P = int(_os.environ.get("FLASH_CHUNK_P", "1024"))


_K_CAP_ENV = int(_os.environ.get("FLASH_K_CAP", "0"))  # sweep override


def _flash_sparse_impl(fs: FlashScene, origin, direction, t_max, t_min,
                       interpret, with_attrs, any_hit=False,
                       k_cap=MAX_CLUSTERS, vis_bf16=None):
    R = origin.shape[0]
    if _K_CAP_ENV:
        k_cap = _K_CAP_ENV
    C = max(1, CLUSTERS_PER_STEP)
    K = max(C, -(-min(fs.num_tri_tiles, k_cap) // C) * C)

    # chunk size: the shared quantum, bounded by the SMEM prefetch budget
    # (ids + entry bounds = 2 scalar arrays of P*K each) and (for
    # sub-quantum calls, e.g. tests) the call's own size
    P0 = max(1, -(-R // RAY_TILE))
    chunk_p = max(1, min(CHUNK_P, _SMEM_ENTRY_BUDGET // (2 * K),
                         1 << (P0 - 1).bit_length()))
    P = -(-P0 // chunk_p) * chunk_p
    r_pad = P * RAY_TILE

    origin_p = _pad_rays(origin, r_pad)
    direction_p = _pad_rays(
        direction, r_pad, fill=1.0) if r_pad != R else direction
    if USE_LOOP_TRACER:
        # packed (R, 8) [o-center, 0, d, 0]: the loop kernel builds the
        # 16-lane feature matrix itself (_kernel_features) — half the
        # input DMA and none of the XLA concat/pad copies of _features
        z1 = jnp.zeros_like(origin_p[:, :1])
        rayf = jnp.concatenate(
            [origin_p - fs.center, z1, direction_p, z1], axis=-1)
    else:
        rayf = _features(origin_p, direction_p, fs.center)
    # padded rays get t_max 0: raw_counts 0, live False in the kernel
    tmax = _pad_rays(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))[:, None],
        r_pad,
    )
    order, raw_counts, entry_sorted = packet_cluster_order(
        fs, origin_p, direction_p, tmax[:, 0], t_min=t_min)
    order, entry_sorted = _pad_ranking(order, entry_sorted, K)

    def run(ids, entries, counts, tmax_col):
        """One round of chunked kernel calls on the padded wavefront."""
        chunks = []
        for p0 in range(0, P, chunk_p):
            p1 = p0 + chunk_p
            sl = slice(p0 * RAY_TILE, p1 * RAY_TILE)
            chunks.append(_sparse_call(
                fs, rayf[sl], tmax_col[sl], ids[p0 * K : p1 * K],
                counts[p0:p1], entries[p0 * K : p1 * K], t_min, interpret,
                with_attrs, any_hit, K, C, vis_bf16=vis_bf16))
        if any_hit:
            vis = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
            return vis[:, 0].astype(jnp.float32)  # (r_pad,)
        if len(chunks) == 1:
            return list(chunks[0])
        return [jnp.concatenate(parts) for parts in zip(*chunks)]

    ids0, entries0, counts0 = _round_lists(
        order, entry_sorted, raw_counts, 0, K)
    out = run(ids0, entries0, counts0, tmax)

    n_rounds = -(-fs.num_tri_tiles // K)
    rounds = OVERFLOW_ROUNDS and K < fs.num_tri_tiles and n_rounds > 1

    if any_hit:
        vis = out
        if rounds:
            def cond(c):
                r, _ = c
                return (r < n_rounds) & jnp.any(raw_counts > r * K)

            def body(c):
                r, vis = c
                ids, entries, counts = _round_lists(
                    order, entry_sorted, raw_counts, r, K)
                # already-blocked rays get t_max 0 -> packet-level cull
                v = run(ids, entries, counts, tmax * vis[:, None])
                return r + 1, vis * v

            _, vis = jax.lax.while_loop(
                cond, body, (jnp.int32(1), vis))
        return vis[:R]

    best, tid = out[0], out[1]
    attrs = out[2] if with_attrs else None
    if rounds:
        def cond(c):
            return (c[0] < n_rounds) & jnp.any(raw_counts > c[0] * K)

        def body(c):
            r, best, tid = c[0], c[1], c[2]
            ids, entries, counts = _round_lists(
                order, entry_sorted, raw_counts, r, K)
            # t_max' = running best t: a round-r candidate is accepted
            # only if strictly closer, so merging is a plain select
            out_r = run(ids, entries, counts, best[:, 0:1])
            closer = out_r[1][:, 0:1] >= 0
            best = jnp.where(closer, out_r[0], best)
            tid = jnp.where(closer, out_r[1], tid)
            new = [r + 1, best, tid]
            if with_attrs:
                new.append(jnp.where(closer, out_r[2], c[3]))
            return tuple(new)

        carry = [jnp.int32(1), best, tid]
        if with_attrs:
            carry.append(attrs)
        final = jax.lax.while_loop(cond, body, tuple(carry))
        best, tid = final[1], final[2]
        if with_attrs:
            attrs = final[3]

    t = best[:R, 0]
    tid_r = tid[:R, 0]
    missed = tid_r < 0
    hit = Hit(
        t=t,
        tri_id=jnp.where(missed, -1, jnp.minimum(tid_r, fs.num_tris - 1)),
        u=best[:R, 1],
        v=best[:R, 2],
    )
    if with_attrs:
        return hit, attrs[:R]
    return hit


def flash_closest_hit_sparse(fs, origin, direction, t_max, t_min=1e-3,
                             interpret=False):
    """v2 closest hit (sparse cluster lists + bf16x3 + numerator-space)."""
    return _flash_sparse_impl(fs, origin, direction, t_max, t_min,
                              interpret, with_attrs=False)


def flash_closest_hit_attrs_sparse(fs, origin, direction, t_max, t_min=1e-3,
                                   interpret=False):
    """v2 closest hit + fused surface-attribute fetch."""
    return _flash_sparse_impl(fs, origin, direction, t_max, t_min,
                              interpret, with_attrs=True)


def flash_visibility_sparse(fs, origin, direction, t_max, t_min=1e-3,
                            interpret=False, vis_bf16=None):
    """v2 any-hit visibility (1.0 = unoccluded). vis_bf16: single-pass
    bf16 accept — opt-in (default OFF; env FLASH_VIS_BF16=1). Measured
    accept-op-bound, so the ~3x MXU saving bought nothing and the precise
    accept stays the default; when enabled, edge-adjacent rays may flip
    within EDGE_SLOP_VIS (denoisers smooth the sub-texel wobble)."""
    return _flash_sparse_impl(fs, origin, direction, t_max, t_min,
                              interpret, with_attrs=False, any_hit=True,
                              vis_bf16=vis_bf16)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def flash_visibility(
    fs: FlashScene, origin, direction, t_max, t_min=1e-3, interpret=False
):
    """Any-hit visibility: 1.0 = unoccluded (reference query_visibility,
    src/shaders/ray_query.glsl:6-29)."""
    R = origin.shape[0]
    r_pad = max(RAY_TILE, -(-R // RAY_TILE) * RAY_TILE)
    feats = _pad_rays(_features(origin, direction, fs.center), r_pad)
    # padded rays: t_max 0 -> nothing blocks them
    tmax = _pad_rays(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))[:, None], r_pad
    )

    grid = (r_pad // RAY_TILE, fs.num_tri_tiles)
    vis = pl.pallas_call(
        functools.partial(_anyhit_kernel, t_min=t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (FEAT, 4 * TRI_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full cluster table
        ],
        out_specs=pl.BlockSpec(
            (RAY_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        interpret=interpret,
    )(feats, tmax, fs.trimat, fs.cluster_box)
    return vis[:R, 0].astype(origin.dtype)
