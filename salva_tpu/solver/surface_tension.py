"""Surface tension models: Akinci 2013, He 2014 and WCSPH cohesion.

Vectorized re-designs of ``src/solver/surface_tension/``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..kernels import sph
from .common import StepContext, scatter_boundary_forces
from .nonpressure import per_particle, same_fluid_mask

_EPS = sph.EPSILON


def _unit_and_dist(dpos):
    """(direction, distance) with zero direction below f32 epsilon, like
    `Unit::try_new_and_get` in the reference."""
    dist = jnp.sqrt(jnp.sum(dpos * dpos, axis=-1))
    safe = jnp.where(dist > _EPS, dist, 1.0)
    dirv = jnp.where((dist > _EPS)[..., None], dpos / safe[..., None], 0.0)
    return dirv, dist


@dataclasses.dataclass(frozen=True)
class Akinci2013SurfaceTensionForce:
    """Cohesion + curvature minimization + boundary adhesion
    (`akinci2013_surface_tension.rs`)."""

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_adhesion_coefficients: Tuple[float, ...]
    kind: str = dataclasses.field(default="akinci2013_surface_tension", init=False)

    def apply(self, ctx: StepContext):
        fl = ctx.fluids
        h = ctx.h
        dim = ctx.dim
        coeff_i = per_particle(self.fluid_tension_coefficients, ctx)
        badh_i = per_particle(self.boundary_adhesion_coefficients, ctx)
        mask = same_fluid_mask(ctx).astype(jnp.float32)

        # Normals n_i = h * sum_j m_j / rho_j grad W (`:43-68`).
        m_j = fl.masses[ctx.ff.j]
        rho_j = ctx.densities[ctx.ff.j]
        normals = h * jnp.sum(
            ctx.ff.grad * (m_j / rho_j * mask)[..., None], axis=1
        )

        # Cohesion + curvature (`:137-165`).
        dpos = fl.positions[:, None, :] - fl.positions[ctx.ff.j]
        dirv, dist = _unit_and_dist(dpos)
        cohesion_vec = dirv * sph.cohesion_kernel(dist, h, dim)[..., None]
        cohesion_acc = cohesion_vec * (
            -coeff_i[:, None] * fl.volumes[ctx.ff.j] * fl.density0[:, None]
        )[..., None]
        curvature_acc = (normals[:, None, :] - normals[ctx.ff.j]) * (
            -coeff_i[:, None, None]
        )
        kij = 2.0 * fl.density0[:, None] / (
            ctx.densities[:, None] + ctx.densities[ctx.ff.j]
        )
        accel = jnp.sum(
            (curvature_acc + cohesion_acc) * (kij * mask)[..., None], axis=1
        )

        # Boundary adhesion (`:167-190`).
        dposb = fl.positions[:, None, :] - ctx.boundaries.positions[ctx.fb.j]
        dirb, distb = _unit_and_dist(dposb)
        adhesion_vec = dirb * sph.adhesion_kernel(distb, h, dim)[..., None]
        m_i = fl.masses
        m_bj = ctx.boundaries.volumes[ctx.fb.j] * fl.density0[:, None]
        adhesion_acc = adhesion_vec * (badh_i[:, None] * m_bj * ctx.fb.mask)[..., None]
        accel = accel - jnp.sum(adhesion_acc, axis=1)
        bforces = scatter_boundary_forces(
            jnp.zeros_like(ctx.boundaries.forces),
            ctx.fb,
            adhesion_acc * m_i[:, None, None],
        )
        return accel, bforces


@dataclasses.dataclass(frozen=True)
class He2014SurfaceTensionForce:
    """Color-field surface tension (`he2014_surface_tension.rs`)."""

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_tension_coefficients: Tuple[float, ...]
    kind: str = dataclasses.field(default="he2014_surface_tension", init=False)

    def apply(self, ctx: StepContext):
        fl = ctx.fluids
        coeff_i = per_particle(self.fluid_tension_coefficients, ctx)
        bcoeff_i = per_particle(self.boundary_tension_coefficients, ctx)
        mask = same_fluid_mask(ctx).astype(jnp.float32)

        m_j = fl.masses[ctx.ff.j]
        rho_j = ctx.densities[ctx.ff.j]
        rho_i = ctx.densities

        # Colors c_i = sum W m_j / rho_j + sum_b W V_b (`:40-75`).
        colors = jnp.sum(ctx.ff.w * m_j / rho_j * mask, axis=1) + jnp.sum(
            ctx.fb.w * ctx.boundaries.volumes[ctx.fb.j], axis=1
        )

        # gradc_i = |sum grad c_j m_j / rho_j / c_i|^2 (`:77-105`).
        safe_colors = jnp.where(jnp.abs(colors) > 0.0, colors, 1.0)
        gradc_vec = jnp.sum(
            ctx.ff.grad * (colors[ctx.ff.j] * m_j / rho_j * mask)[..., None],
            axis=1,
        ) / safe_colors[:, None]
        gradcs = jnp.sum(gradc_vec * gradc_vec, axis=-1)

        # Fluid force (`:138-158`).
        m_i = fl.masses
        gradsum = gradcs[:, None] + gradcs[ctx.ff.j]
        f = ctx.ff.grad * (
            (m_i[:, None] / rho_i[:, None]) * (m_j / rho_j) * gradsum * 0.5 * mask
        )[..., None]
        safe_m_i = jnp.where(m_i > 0.0, m_i, 1.0)
        accel = jnp.sum(f, axis=1) * (coeff_i / (2.0 * safe_m_i))[:, None]

        # Boundary force (`:160-178`).
        m_bj = ctx.boundaries.volumes[ctx.fb.j] * fl.density0[:, None]
        fb_f = ctx.fb.grad * (
            (m_i[:, None] / rho_i[:, None])
            * (m_bj / fl.density0[:, None])
            * gradcs[:, None]
            * bcoeff_i[:, None]
            * 0.25
            * ctx.fb.mask
        )[..., None]
        accel = accel + jnp.sum(fb_f, axis=1) / safe_m_i[:, None]
        bforces = scatter_boundary_forces(
            jnp.zeros_like(ctx.boundaries.forces), ctx.fb, -fb_f
        )
        return accel, bforces


@dataclasses.dataclass(frozen=True)
class WCSPHSurfaceTensionForce:
    """Position-difference cohesion (`wcsph_surface_tension.rs`).

    Deviation from the reference: its boundary loop iterates the
    *fluid-fluid* contact list while indexing boundary arrays
    (`wcsph_surface_tension.rs:68-69`), an upstream bug; we iterate the
    fluid-boundary contacts as clearly intended (SURVEY.md §2.1).
    """

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_tension_coefficients: Tuple[float, ...]
    kind: str = dataclasses.field(default="wcsph_surface_tension", init=False)

    def apply(self, ctx: StepContext):
        fl = ctx.fluids
        coeff_i = per_particle(self.fluid_tension_coefficients, ctx)
        bcoeff_i = per_particle(self.boundary_tension_coefficients, ctx)
        mask = same_fluid_mask(ctx).astype(jnp.float32)

        dpos = fl.positions[:, None, :] - fl.positions[ctx.ff.j]
        vol_i = fl.volumes
        safe_vol = jnp.where(vol_i > 0.0, vol_i, 1.0)
        scale = -coeff_i[:, None] * ctx.ff.w * fl.volumes[ctx.ff.j] / safe_vol[:, None]
        accel = jnp.sum(dpos * (scale * mask)[..., None], axis=1)

        dposb = fl.positions[:, None, :] - ctx.boundaries.positions[ctx.fb.j]
        m_i = vol_i * fl.density0
        safe_m_i = jnp.where(m_i > 0.0, m_i, 1.0)
        forceb = dposb * (
            bcoeff_i[:, None]
            * ctx.fb.w
            * ctx.boundaries.volumes[ctx.fb.j]
            * fl.density0[:, None]
            * ctx.fb.mask
        )[..., None]
        accel = accel - jnp.sum(forceb, axis=1) / safe_m_i[:, None]
        bforces = scatter_boundary_forces(
            jnp.zeros_like(ctx.boundaries.forces), ctx.fb, forceb
        )
        return accel, bforces
