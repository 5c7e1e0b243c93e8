"""Analytic shapes as signed distance fields.

The reference leans on parry's shape/ray-cast/point-projection machinery
for boundary sampling (``src/sampling/ray_sampling.rs``) and dynamic
contact sampling (``fluids_pipeline.rs:192-255``). On TPU, per-particle
point projection must be branch-free and vectorized, so shapes are
expressed as signed distance fields with analytic gradients: projection of
``p`` onto the surface is ``p - sdf(p) * normal(p)``, penetration is
``sdf(p) < 0``.

Shape geometry is static (hashable frozen dataclasses); poses (isometries)
are dynamic arrays so rigid bodies can move without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def _safe_norm(v):
    """|v| with a well-defined (zero) autodiff gradient at v = 0.

    ``jnp.linalg.norm`` has a NaN gradient at the zero vector, which
    ``sdf_normal`` would propagate for any point inside a box face or at a
    shape center; the double-where pattern keeps both value and gradient
    finite.
    """
    sq = jnp.sum(v * v, axis=-1)
    pos = sq > 0
    safe = jnp.where(pos, sq, 1.0)
    return jnp.where(pos, jnp.sqrt(safe), 0.0)


@dataclasses.dataclass(frozen=True)
class Ball:
    radius: float

    def sdf(self, p):
        return _safe_norm(p) - self.radius


@dataclasses.dataclass(frozen=True)
class Cuboid:
    """Box with the given half-extents (dim inferred from the tuple)."""

    half_extents: Tuple[float, ...]

    def sdf(self, p):
        b = jnp.asarray(self.half_extents, p.dtype)
        q = jnp.abs(p) - b
        outside = _safe_norm(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside


@dataclasses.dataclass(frozen=True)
class Capsule:
    """Capsule along the local y axis: segment [-half_height, half_height]
    with the given radius."""

    half_height: float
    radius: float

    def sdf(self, p):
        y = jnp.clip(p[..., 1], -self.half_height, self.half_height)
        d = p - jnp.zeros_like(p).at[..., 1].set(y)
        return _safe_norm(d) - self.radius


@dataclasses.dataclass(frozen=True)
class HalfSpace:
    """Half-space below the plane with local normal ``normal`` through the
    origin: sdf = dot(n, p)."""

    normal: Tuple[float, ...]

    def sdf(self, p):
        n = jnp.asarray(self.normal, p.dtype)
        n = n / jnp.linalg.norm(n)
        return jnp.sum(p * n, axis=-1)


@dataclasses.dataclass(frozen=True)
class Heightfield:
    """Heightfield over the local x (2D) or x/z (3D) axes.

    ``heights``: tuple (2D: [nx]; 3D: row-major [nx, nz] flattened) sampled
    uniformly over ``extent`` centered at the origin. The pseudo-SDF is the
    vertical distance ``p_y - h(p_xz)`` (exact for flat terrain, a standard
    approximation on slopes).
    """

    heights: Tuple[float, ...]
    extent: Tuple[float, ...]  # (size_x,) in 2D; (size_x, size_z) in 3D
    shape: Tuple[int, ...]  # (nx,) or (nx, nz)

    def _height_at(self, xz):
        hs = jnp.asarray(self.heights, jnp.float32).reshape(self.shape)
        if len(self.shape) == 1:
            nx = self.shape[0]
            fx = (xz[..., 0] / self.extent[0] + 0.5) * (nx - 1)
            i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
            t = jnp.clip(fx - i0, 0.0, 1.0)
            return hs[i0] * (1 - t) + hs[i0 + 1] * t
        nx, nz = self.shape
        fx = (xz[..., 0] / self.extent[0] + 0.5) * (nx - 1)
        fz = (xz[..., 1] / self.extent[1] + 0.5) * (nz - 1)
        i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
        k0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 2)
        tx = jnp.clip(fx - i0, 0.0, 1.0)
        tz = jnp.clip(fz - k0, 0.0, 1.0)
        h00 = hs[i0, k0]
        h10 = hs[i0 + 1, k0]
        h01 = hs[i0, k0 + 1]
        h11 = hs[i0 + 1, k0 + 1]
        return (
            h00 * (1 - tx) * (1 - tz)
            + h10 * tx * (1 - tz)
            + h01 * (1 - tx) * tz
            + h11 * tx * tz
        )

    def sdf(self, p):
        if len(self.shape) == 1:
            xz = p[..., 0:1]
        else:
            xz = jnp.stack([p[..., 0], p[..., 2]], axis=-1)
        return p[..., 1] - self._height_at(xz)


@dataclasses.dataclass(frozen=True)
class TriMesh:
    """Triangle mesh (host-side shape for boundary sampling).

    Sampled through the native ray-cast sampler (``salva_tpu.native``),
    covering the reference's parry TriMesh support in
    ``shape_surface_ray_sample`` (`ray_sampling.rs`). On-device SDF
    queries (DynamicContactSampling coupling, shape intersection tests)
    go through a cached voxelized signed-distance field
    (``sampling.voxelize.trimesh_sdf`` -> :class:`VoxelSdf`).
    ``vertices``/``indices`` are stored as nested tuples to stay hashable.
    """

    vertices: Tuple[Tuple[float, float, float], ...]
    indices: Tuple[Tuple[int, int, int], ...]

    @staticmethod
    def from_arrays(vertices, indices) -> "TriMesh":
        import numpy as np

        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        t = np.asarray(indices, np.int32).reshape(-1, 3)
        return TriMesh(
            tuple(tuple(float(x) for x in row) for row in v),
            tuple(tuple(int(x) for x in row) for row in t),
        )


@dataclasses.dataclass(frozen=True, eq=False)
class VoxelSdf:
    """Discretized signed-distance field on a regular grid (trilinear).

    The on-device stand-in for shapes with no analytic SDF — most
    importantly triangle meshes (``sampling.voxelize.trimesh_sdf``),
    giving TriMesh colliders the same DynamicContactSampling support the
    reference gets from parry's per-shape point projection
    (`fluids_pipeline.rs:192-255`). Outside the grid box the clamped
    border value plus the distance to the box is returned, so projection
    directions stay sane far away.

    ``values`` is held as a read-only ndarray and hashed once by digest:
    a ~resolution^3 Python tuple as a static jit argument would be
    re-hashed on every dynamic-coupling step.
    """

    values: object  # read-only float32 ndarray, flattened row-major
    origin: Tuple[float, float, float]
    spacing: float
    shape: Tuple[int, int, int]

    def __post_init__(self):
        import hashlib

        import numpy as np

        v = np.ascontiguousarray(
            np.asarray(self.values, np.float32).reshape(-1)
        )
        v.setflags(write=False)
        object.__setattr__(self, "values", v)
        key = (
            hashlib.sha1(v.tobytes()).digest(),
            tuple(self.origin),
            float(self.spacing),
            tuple(self.shape),
        )
        object.__setattr__(self, "_key", key)

    def __eq__(self, other):
        return isinstance(other, VoxelSdf) and self._key == other._key

    def __hash__(self):
        return hash(self._key)

    def sdf(self, p):
        vals = jnp.asarray(self.values, jnp.float32).reshape(self.shape)
        n = jnp.asarray(self.shape, jnp.int32)
        f = (p - jnp.asarray(self.origin, jnp.float32)) / self.spacing
        fc = jnp.clip(f, 0.0, jnp.asarray(self.shape, jnp.float32) - 1.0)
        i0 = jnp.clip(jnp.floor(fc).astype(jnp.int32), 0, n - 2)
        t = jnp.clip(fc - i0, 0.0, 1.0)
        ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
        tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]

        def v(dx, dy, dz):
            return vals[ix + dx, iy + dy, iz + dz]

        c00 = v(0, 0, 0) * (1 - tx) + v(1, 0, 0) * tx
        c10 = v(0, 1, 0) * (1 - tx) + v(1, 1, 0) * tx
        c01 = v(0, 0, 1) * (1 - tx) + v(1, 0, 1) * tx
        c11 = v(0, 1, 1) * (1 - tx) + v(1, 1, 1) * tx
        c0 = c00 * (1 - ty) + c10 * ty
        c1 = c01 * (1 - ty) + c11 * ty
        inner = c0 * (1 - tz) + c1 * tz
        # Outside the grid: add the distance to the grid box (the small
        # epsilon keeps the autodiff normal finite where f == fc).
        d2 = jnp.sum((f - fc) ** 2, axis=-1)
        outside = jnp.sqrt(d2 + 1.0e-12) * self.spacing
        return inner + outside


SHAPES = (Ball, Cuboid, Capsule, HalfSpace, Heightfield, TriMesh, VoxelSdf)


def sdf_normal(shape, p):
    """Unit outward normal = normalized SDF gradient (autodiff)."""
    g = jax.vmap(jax.grad(lambda q: jnp.sum(shape.sdf(q[None]))))(p)
    n = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g / jnp.where(n > 1e-9, n, 1.0)


def world_sdf(shape, p_world, rotation, translation):
    """SDF of a posed shape: transform points into the local frame."""
    local = jnp.einsum("de,...e->...d", rotation.T, p_world - translation)
    return shape.sdf(local)


def project_point(shape, p_world, rotation, translation):
    """Project world points onto the posed shape's surface.

    Returns (projection, sdf_value, world_normal).
    """
    local = jnp.einsum("de,...e->...d", rotation.T, p_world - translation)
    d = shape.sdf(local)
    n_local = sdf_normal(shape, local)
    n_world = jnp.einsum("de,...e->...d", rotation, n_local)
    proj = p_world - d[..., None] * n_world
    return proj, d, n_world
