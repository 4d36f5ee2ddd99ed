"""Procedural mesh primitives (numpy, host-side).

The reference loads binary meshes via Assimp (SURVEY §2.9 dw::Mesh) that are
NOT in the repo; the framework regenerates equivalent test geometry
procedurally (plane/box/sphere/cylinder/torus) so no external assets are
needed, mirroring how common.cpp:385-411 procedurally instances the pillar
grid.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Mesh:
    positions: np.ndarray  # (V, 3) float32
    normals: np.ndarray  # (V, 3)
    uvs: np.ndarray  # (V, 2)
    indices: np.ndarray  # (F, 3) int32

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


def _mesh(p, n, uv, idx) -> Mesh:
    return Mesh(
        positions=np.asarray(p, np.float32),
        normals=np.asarray(n, np.float32),
        uvs=np.asarray(uv, np.float32),
        indices=np.asarray(idx, np.int32),
    )


def plane(size_x: float = 1.0, size_z: float = 1.0) -> Mesh:
    """XZ ground plane centered at origin, +Y normal."""
    hx, hz = size_x / 2, size_z / 2
    p = [[-hx, 0, -hz], [hx, 0, -hz], [hx, 0, hz], [-hx, 0, hz]]
    n = [[0, 1, 0]] * 4
    uv = [[0, 0], [1, 0], [1, 1], [0, 1]]
    idx = [[0, 2, 1], [0, 3, 2]]
    return _mesh(p, n, uv, idx)


def box(sx: float = 1.0, sy: float = 1.0, sz: float = 1.0) -> Mesh:
    """Axis-aligned box centered at origin with flat-shaded faces."""
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    faces = [
        # normal, four corners (CCW viewed from outside)
        ((0, 0, 1), [(-hx, -hy, hz), (hx, -hy, hz), (hx, hy, hz), (-hx, hy, hz)]),
        ((0, 0, -1), [(hx, -hy, -hz), (-hx, -hy, -hz), (-hx, hy, -hz), (hx, hy, -hz)]),
        ((1, 0, 0), [(hx, -hy, hz), (hx, -hy, -hz), (hx, hy, -hz), (hx, hy, hz)]),
        ((-1, 0, 0), [(-hx, -hy, -hz), (-hx, -hy, hz), (-hx, hy, hz), (-hx, hy, -hz)]),
        ((0, 1, 0), [(-hx, hy, hz), (hx, hy, hz), (hx, hy, -hz), (-hx, hy, -hz)]),
        ((0, -1, 0), [(-hx, -hy, -hz), (hx, -hy, -hz), (hx, -hy, hz), (-hx, -hy, hz)]),
    ]
    p, n, uv, idx = [], [], [], []
    for fnormal, corners in faces:
        base = len(p)
        p.extend(corners)
        n.extend([fnormal] * 4)
        uv.extend([[0, 0], [1, 0], [1, 1], [0, 1]])
        idx.extend([[base, base + 1, base + 2], [base, base + 2, base + 3]])
    return _mesh(p, n, uv, idx)


def uv_sphere(radius: float = 0.5, stacks: int = 16, slices: int = 32) -> Mesh:
    p, n, uv, idx = [], [], [], []
    for i in range(stacks + 1):
        theta = np.pi * i / stacks
        for j in range(slices + 1):
            phi = 2 * np.pi * j / slices
            x = np.sin(theta) * np.cos(phi)
            y = np.cos(theta)
            z = np.sin(theta) * np.sin(phi)
            p.append([radius * x, radius * y, radius * z])
            n.append([x, y, z])
            uv.append([j / slices, i / stacks])
    for i in range(stacks):
        for j in range(slices):
            a = i * (slices + 1) + j
            b = a + slices + 1
            if i != 0:
                idx.append([a, a + 1, b])
            if i != stacks - 1:
                idx.append([a + 1, b + 1, b])
    return _mesh(p, n, uv, idx)


def cylinder(radius: float = 0.5, height: float = 1.0, slices: int = 24) -> Mesh:
    """Y-axis cylinder with caps, centered at origin."""
    p, n, uv, idx = [], [], [], []
    hy = height / 2
    # side
    for j in range(slices + 1):
        phi = 2 * np.pi * j / slices
        x, z = np.cos(phi), np.sin(phi)
        for y, v in ((-hy, 0.0), (hy, 1.0)):
            p.append([radius * x, y, radius * z])
            n.append([x, 0, z])
            uv.append([j / slices, v])
    for j in range(slices):
        a = 2 * j
        idx.extend([[a, a + 2, a + 1], [a + 1, a + 2, a + 3]])
    # caps
    for sign, ny in ((1, 1.0), (-1, -1.0)):
        center = len(p)
        p.append([0, sign * hy, 0])
        n.append([0, ny, 0])
        uv.append([0.5, 0.5])
        ring = len(p)
        for j in range(slices + 1):
            phi = 2 * np.pi * j / slices
            x, z = np.cos(phi), np.sin(phi)
            p.append([radius * x, sign * hy, radius * z])
            n.append([0, ny, 0])
            uv.append([0.5 + 0.5 * x, 0.5 + 0.5 * z])
        for j in range(slices):
            if sign > 0:
                idx.append([center, ring + j + 1, ring + j])
            else:
                idx.append([center, ring + j, ring + j + 1])
    return _mesh(p, n, uv, idx)


def torus_knot_stand_in(radius: float = 0.4, tube: float = 0.18,
                        segments: int = 48, sides: int = 16) -> Mesh:
    """A torus — stand-in 'hero' object for the missing bunny asset."""
    p, n, uv, idx = [], [], [], []
    for i in range(segments + 1):
        u = 2 * np.pi * i / segments
        cu, su = np.cos(u), np.sin(u)
        center = np.array([radius * cu, 0.0, radius * su])
        for j in range(sides + 1):
            v = 2 * np.pi * j / sides
            cv, sv = np.cos(v), np.sin(v)
            normal = np.array([cu * cv, sv, su * cv])
            p.append(center + tube * normal)
            n.append(normal)
            uv.append([i / segments, j / sides])
    for i in range(segments):
        for j in range(sides):
            a = i * (sides + 1) + j
            b = a + sides + 1
            idx.extend([[a, b, a + 1], [a + 1, b, b + 1]])
    return _mesh(p, n, uv, idx)


def grid_mesh(nx: int = 64, nz: int = 64, size_x: float = 1.0,
              size_z: float = 1.0) -> Mesh:
    """Subdivided XZ plane (nx x nz cells), +Y normals, full [0,1] UVs —
    the tessellation base for displaced hero geometry (the reference's
    hero scenes are ~262k-triangle meshes, common.cpp:520-533)."""
    xs = np.linspace(-size_x / 2, size_x / 2, nx + 1, dtype=np.float32)
    zs = np.linspace(-size_z / 2, size_z / 2, nz + 1, dtype=np.float32)
    zz, xx = np.meshgrid(zs, xs, indexing="ij")
    p = np.stack([xx, np.zeros_like(xx), zz], -1).reshape(-1, 3)
    n = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (len(p), 1))
    uv = np.stack([(xx / size_x + 0.5), (zz / size_z + 0.5)], -1).reshape(-1, 2)
    j, i = np.meshgrid(np.arange(nz), np.arange(nx), indexing="ij")
    a = (j * (nx + 1) + i).reshape(-1)
    b = a + 1
    c = a + nx + 1
    d = c + 1
    idx = np.concatenate(
        [np.stack([a, c, b], -1), np.stack([b, c, d], -1)], axis=0
    ).astype(np.int32)
    return _mesh(p, n, uv, idx)


def _value_noise2(u, v, seed: int = 0, octaves: int = 4):
    """Tileable-ish value noise on (u,v) grids — displacement source."""
    out = np.zeros_like(u)
    amp = 1.0
    freq = 4.0
    rs = np.random.RandomState(seed)
    for _ in range(octaves):
        gx = int(freq) + 1
        g = rs.uniform(-1.0, 1.0, size=(gx + 1, gx + 1))
        x = np.clip(u, 0, 1) * freq
        y = np.clip(v, 0, 1) * freq
        x0 = np.floor(x).astype(np.int32)
        y0 = np.floor(y).astype(np.int32)
        fx = x - x0
        fy = y - y0
        fx = fx * fx * (3 - 2 * fx)
        fy = fy * fy * (3 - 2 * fy)
        v00 = g[y0, x0]
        v10 = g[y0, x0 + 1]
        v01 = g[y0 + 1, x0]
        v11 = g[y0 + 1, x0 + 1]
        out = out + amp * (
            v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
            + v01 * (1 - fx) * fy + v11 * fx * fy
        )
        amp *= 0.5
        freq *= 2.0
    return out


def displace(mesh: Mesh, amplitude: float, seed: int = 0,
             octaves: int = 4) -> Mesh:
    """Displace vertices along their normals by UV-space value noise and
    recompute smooth vertex normals (area-weighted face-normal average)."""
    h = _value_noise2(mesh.uvs[:, 0], mesh.uvs[:, 1], seed, octaves)
    p = mesh.positions + mesh.normals * (h * amplitude)[:, None]
    idx = mesh.indices
    e1 = p[idx[:, 1]] - p[idx[:, 0]]
    e2 = p[idx[:, 2]] - p[idx[:, 0]]
    fn = np.cross(e1, e2)  # area-weighted
    n = np.zeros_like(p)
    for k in range(3):
        np.add.at(n, idx[:, k], fn)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 1e-12, n / np.maximum(ln, 1e-12), mesh.normals)
    return _mesh(p, n, mesh.uvs, idx)
