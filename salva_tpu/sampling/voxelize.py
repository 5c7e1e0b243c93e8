"""Triangle-mesh -> voxel signed-distance field (host-side, numpy).

Gives TriMesh shapes an on-device SDF (``shapes.VoxelSdf``) so they
support DynamicContactSampling coupling like every analytic shape — the
reference relies on parry's per-shape point projection for this
(`fluids_pipeline.rs:192-255`, `project_point` at `:213-217`).

Unsigned distance: exact point-triangle distance (Ericson, "Real-Time
Collision Detection" §5.1.5), vectorized over (grid-point, triangle)
blocks. Sign: +z ray-crossing parity per grid point (watertight meshes),
the same axis-ray classification the reference's volume sampler uses
(`ray_sampling.rs:91-164`).
"""

from __future__ import annotations

import functools

import numpy as np

from .. import shapes as shp


def _point_triangle_distance(p, a, b, c):
    """Min distance from points ``p [G, 3]`` to triangles ``a/b/c [T, 3]``
    -> [G, T]. Fully vectorized closest-point-on-triangle."""
    p = p[:, None, :]  # [G, 1, 3]
    a = a[None]  # [1, T, 3]
    ab = b[None] - a
    ac = c[None] - a
    ap = p - a

    d1 = np.sum(ab * ap, -1)
    d2 = np.sum(ac * ap, -1)
    d3 = np.sum(ab * (p - (a + ab)), -1)
    d4 = np.sum(ac * (p - (a + ab)), -1)
    d5 = np.sum(ab * (p - (a + ac)), -1)
    d6 = np.sum(ac * (p - (a + ac)), -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = va + vb + vc
    denom = np.where(np.abs(denom) < 1e-30, 1.0, denom)
    v = vb / denom
    w = vc / denom

    # Barycentric interior point, then clamp to the triangle's edges by
    # regioned selection.
    eps = 0.0
    v_ab = np.clip(np.where(d1 - d3 != 0, d1 / np.where(d1 - d3 == 0, 1.0, d1 - d3), 0.0), 0, 1)
    v_ac = np.clip(np.where(d2 - d6 != 0, d2 / np.where(d2 - d6 == 0, 1.0, d2 - d6), 0.0), 0, 1)
    t_bc = np.clip(
        np.where(
            (d4 - d3) + (d5 - d6) != 0,
            (d4 - d3) / np.where((d4 - d3) + (d5 - d6) == 0, 1.0,
                                 (d4 - d3) + (d5 - d6)),
            0.0,
        ),
        0,
        1,
    )

    in_a = (d1 <= eps) & (d2 <= eps)
    in_b = (d3 >= -eps) & (d4 <= d3)
    in_c = (d6 >= -eps) & (d5 <= d6)
    on_ab = (vc <= eps) & (d1 >= -eps) & (d3 <= eps)
    on_ac = (vb <= eps) & (d2 >= -eps) & (d6 <= eps)
    on_bc = (va <= eps) & ((d4 - d3) >= -eps) & ((d5 - d6) >= -eps)

    q_in = a + ab * v[..., None] + ac * w[..., None]
    q = q_in
    q = np.where(on_bc[..., None], a + ab + (ac - ab) * t_bc[..., None], q)
    q = np.where(on_ac[..., None], a + ac * v_ac[..., None], q)
    q = np.where(on_ab[..., None], a + ab * v_ab[..., None], q)
    q = np.where(in_c[..., None], a + ac, q)
    q = np.where(in_b[..., None], a + ab, q)
    q = np.where(in_a[..., None], a, q)
    return np.linalg.norm(p - q, axis=-1)


def _ray_parity_z(p, a, b, c):
    """Is each point inside (odd +z ray crossings)? ``p [G, 3]``,
    triangles [T, 3] -> [G] bool. Möller–Trumbore with dir (0, 0, 1)."""
    d = np.array([0.0, 0.0, 1.0])
    e1 = b - a  # [T, 3]
    e2 = c - a
    h = np.cross(d[None, :], e2)  # [T, 3]
    det = np.sum(e1 * h, -1)  # [T]
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    s = p[:, None, :] - a[None]  # [G, T, 3]
    u = np.sum(s * h[None], -1) * inv[None]
    q = np.cross(s, e1[None])
    v = np.sum(q * d[None, None, :], -1) * inv[None]
    t = np.sum(q * e2[None], -1) * inv[None]
    hit = ok[None] & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9)
    return (hit.sum(axis=1) % 2) == 1


@functools.lru_cache(maxsize=8)
def trimesh_sdf(mesh: "shp.TriMesh", resolution: int = 48,
                padding_cells: int = 2) -> "shp.VoxelSdf":
    """Voxelize a (watertight) TriMesh into a :class:`shapes.VoxelSdf`.

    ``resolution``: number of cells along the longest AABB axis. Cached
    per mesh (TriMesh is hashable), so coupling reuses one field.
    """
    verts = np.asarray(mesh.vertices, np.float64)
    tris = np.asarray(mesh.indices, np.int64)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]

    mins = verts.min(axis=0)
    maxs = verts.max(axis=0)
    spacing = float((maxs - mins).max()) / max(resolution, 2)
    origin = mins - padding_cells * spacing
    dims = np.ceil((maxs - origin) / spacing).astype(int) + 1 + padding_cells

    axes = [origin[k] + np.arange(dims[k]) * spacing for k in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    dist = np.empty(len(grid))
    inside = np.empty(len(grid), bool)
    chunk = max(1, 4_000_000 // max(len(tris), 1))
    # Jitter the parity-ray origins by an irrational sub-cell offset:
    # grid points are axis-aligned, so un-jittered +z rays pass exactly
    # through shared triangle edges (double-counted crossings -> sign
    # flips deep inside the mesh).
    jitter = np.array([0.5 ** 0.5, 3.0 ** 0.5 / 4.0, 0.0]) * (spacing * 1e-3)
    for s in range(0, len(grid), chunk):
        block = grid[s:s + chunk]
        dist[s:s + chunk] = _point_triangle_distance(block, a, b, c).min(axis=1)
        inside[s:s + chunk] = _ray_parity_z(block + jitter, a, b, c)

    sdf = np.where(inside, -dist, dist).astype(np.float32)
    return shp.VoxelSdf(
        values=tuple(float(v) for v in sdf),
        origin=tuple(float(v) for v in origin),
        spacing=spacing,
        shape=tuple(int(v) for v in dims),
    )
