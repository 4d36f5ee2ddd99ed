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

This is the wavefront "trace" kernel of SURVEY §2.10; a hierarchical
cluster-culled variant lands on top of it for large scenes.
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

RAY_TILE = 256  # rays per grid step (sublane-friendly: 2x(8,128) f32)
TRI_TILE = 512  # triangles per grid step; tune vs cluster-culling granularity

FEAT = 16  # 10 features padded to 16 lanes
BIG_T = 3.0e38


ATTR = 24  # per-tri attribute row: n0 n1 n2 (9) uv0..2 (6) mat mesh geo_n (5)


class FlashScene(NamedTuple):
    """Per-scene constants for the flash tracer."""

    trimat: jax.Array  # (FEAT, NTT*4*TRI_TILE) column-blocked [det|t|u|v]
    cluster_box: jax.Array  # (NTT, 8) cluster AABB [min.xyz, max.xyz, pad]
    center: jax.Array  # (3,) recentering offset
    num_tris: int
    num_tri_tiles: int
    attrs: jax.Array = None  # (NTT*TRI_TILE, ATTR) per-tri attributes


def make_flash_scene(
    tri_pos: jax.Array,
    tri_normal=None,
    tri_uv=None,
    tri_mat=None,
    tri_mesh=None,
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
        attrs = jnp.concatenate([tn, tu, tm_col, tmesh, geo_n], axis=1)
        attrs = jnp.pad(attrs, ((0, 0), (0, ATTR - attrs.shape[1])))

    return FlashScene(
        trimat=jnp.asarray(trimat), cluster_box=cluster_box,
        center=center, num_tris=T, num_tri_tiles=ntt, attrs=attrs,
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_closest_hit(
    fs: FlashScene, origin, direction, t_max, t_min=1e-3, interpret=False
) -> Hit:
    """Closest hit for a flat wavefront. origin/direction (R,3), t_max (R,)."""
    return _flash_closest_impl(fs, origin, direction, t_max, t_min,
                               interpret, with_attrs=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_closest_hit_attrs(
    fs: FlashScene, origin, direction, t_max, t_min=1e-3, interpret=False
):
    """Closest hit + fused surface-attribute fetch. Returns
    (Hit, attrs (R, ATTR)) — attrs rows are the winning triangle's
    [n0 n1 n2 | uv0 uv1 uv2 | mat_id mesh_id | geo_n | pad]."""
    return _flash_closest_impl(fs, origin, direction, t_max, t_min,
                               interpret, with_attrs=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
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
