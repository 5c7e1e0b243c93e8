"""Viscosity models: XSPH, artificial (Monaghan) and implicit DFSPH
viscosity.

Re-designs of ``src/solver/viscosity/`` as vectorized [N, K] contact
reductions. Physics, coefficients and iteration/termination rules follow
the reference; structural deviations are documented inline.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .common import StepContext, scatter_boundary_forces
from .nonpressure import per_particle, same_fluid_mask


# --------------------------------------------------------------------------
# XSPH viscosity (`xsph_viscosity.rs`)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class XSPHViscosityForce:
    """Velocity-smoothing XSPH viscosity (`xsph_viscosity.rs:30-97`)."""

    fluid_coefficients: Tuple[float, ...]
    boundary_coefficients: Tuple[float, ...]
    kind: str = dataclasses.field(default="xsph_viscosity", init=False)

    def apply(self, ctx: StepContext):
        coeff_i = per_particle(self.fluid_coefficients, ctx)
        bcoeff_i = per_particle(self.boundary_coefficients, ctx)
        fl = ctx.fluids
        vel = fl.velocities

        # Fluid part: dv_i = sum_j coeff * W * V_j * rho0 / rho_j * (v_j - v_i)
        # restricted to the same fluid (`xsph_viscosity.rs:55-71`).
        mask = same_fluid_mask(ctx).astype(jnp.float32)
        vol_j = fl.volumes[ctx.ff.j]
        rho_j = ctx.densities[ctx.ff.j]
        w = ctx.ff.w
        factor = coeff_i[:, None] * w * vol_j * fl.density0[:, None] / rho_j * mask
        dvel_f = jnp.sum(factor[..., None] * (vel[ctx.ff.j] - vel[:, None, :]), axis=1)

        # Boundary part (`xsph_viscosity.rs:73-91`): smooth towards boundary
        # velocities, push back on the boundary.
        bvol_j = ctx.boundaries.volumes[ctx.fb.j]
        rho_i = ctx.densities[:, None]
        bw = ctx.fb.w
        bfactor = bcoeff_i[:, None] * bw * bvol_j * fl.density0[:, None] / rho_i
        delta = bfactor[..., None] * (
            ctx.boundaries.velocities[ctx.fb.j] - vel[:, None, :]
        )
        dvel_b = jnp.sum(delta, axis=1)

        m_i = fl.masses
        bforce_contrib = delta * (-m_i[:, None, None] * ctx.inv_dt)
        bforces = scatter_boundary_forces(
            jnp.zeros_like(ctx.boundaries.forces), ctx.fb, bforce_contrib
        )

        accel = (dvel_f + dvel_b) * ctx.inv_dt
        return accel, bforces


# --------------------------------------------------------------------------
# Artificial (Monaghan) viscosity (`artificial_viscosity.rs`)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ArtificialViscosityForce:
    """Monaghan artificial viscosity (`artificial_viscosity.rs:40-125`).

    Defaults alpha=1, beta=0, speed_of_sound=10 (`:30-36`).

    Deviation from the reference: the boundary force feedback applies each
    contact's own contribution; the reference accumulates the running
    per-particle sum into every subsequent contact
    (`artificial_viscosity.rs:113-116`), an upstream bug we fix
    consciously (SURVEY.md §2.1).
    """

    fluid_coefficients: Tuple[float, ...]
    boundary_coefficients: Tuple[float, ...]
    alphas: Tuple[float, ...]
    betas: Tuple[float, ...]
    speeds_of_sound: Tuple[float, ...]
    kind: str = dataclasses.field(default="artificial_viscosity", init=False)

    def apply(self, ctx: StepContext):
        fl = ctx.fluids
        h = ctx.h
        coeff_i = per_particle(self.fluid_coefficients, ctx)[:, None]
        bcoeff_i = per_particle(self.boundary_coefficients, ctx)[:, None]
        alpha_i = per_particle(self.alphas, ctx)[:, None]
        beta_i = per_particle(self.betas, ctx)[:, None]
        sos_i = per_particle(self.speeds_of_sound, ctx)[:, None]
        eta2 = h * h * 0.01

        # Fluid-fluid, same fluid, approaching pairs only (v.r < 0).
        mask = same_fluid_mask(ctx).astype(jnp.float32)
        r_ij = fl.positions[:, None, :] - fl.positions[ctx.ff.j]
        v_ij = fl.velocities[:, None, :] - fl.velocities[ctx.ff.j]
        vr = jnp.sum(r_ij * v_ij, axis=-1)
        rho_avg = (ctx.densities[:, None] + ctx.densities[ctx.ff.j]) * 0.5
        mu = h * vr / (jnp.sum(r_ij * r_ij, axis=-1) + eta2)
        visc = sos_i * alpha_i * mu - beta_i * mu * mu
        scale = jnp.where(
            vr < 0.0,
            coeff_i * visc * fl.volumes[ctx.ff.j] * fl.density0[:, None] / rho_avg,
            0.0,
        ) * mask
        accel = jnp.sum(ctx.ff.grad * scale[..., None], axis=1)

        # Fluid-boundary (`artificial_viscosity.rs:95-119`).
        rb = fl.positions[:, None, :] - ctx.boundaries.positions[ctx.fb.j]
        vb = fl.velocities[:, None, :] - ctx.boundaries.velocities[ctx.fb.j]
        vrb = jnp.sum(rb * vb, axis=-1)
        mub = h * vrb / (jnp.sum(rb * rb, axis=-1) + eta2)
        viscb = sos_i * alpha_i * mub - beta_i * mub * mub
        scaleb = jnp.where(
            vrb < 0.0,
            bcoeff_i
            * viscb
            * ctx.boundaries.volumes[ctx.fb.j]
            * fl.density0[:, None]
            / ctx.densities[:, None],
            0.0,
        ) * ctx.fb.mask
        delta_b = ctx.fb.grad * scaleb[..., None]
        accel = accel + jnp.sum(delta_b, axis=1)

        m_i = fl.masses
        bforces = scatter_boundary_forces(
            jnp.zeros_like(ctx.boundaries.forces),
            ctx.fb,
            delta_b * (-m_i[:, None, None]),
        )
        return accel, bforces


# --------------------------------------------------------------------------
# DFSPH (implicit strain-rate) viscosity (`dfsph_viscosity.rs`)
# --------------------------------------------------------------------------


def _spatial_dim(dim: int) -> int:
    """Size of the symmetric strain/stress vector: 3 in 2D, 6 in 3D."""
    return 3 if dim == 2 else 6


def _strain_rate(grad, v_ji, dim: int):
    """Symmetric strain-rate vector (`dfsph_viscosity.rs:38-57`).

    grad: [..., dim]; v_ji: [..., dim]; returns [..., S].
    """
    if dim == 2:
        return jnp.stack(
            [
                2.0 * v_ji[..., 0] * grad[..., 0],
                2.0 * v_ji[..., 1] * grad[..., 1],
                v_ji[..., 0] * grad[..., 1] + v_ji[..., 1] * grad[..., 0],
            ],
            axis=-1,
        )
    return jnp.stack(
        [
            2.0 * v_ji[..., 0] * grad[..., 0],
            2.0 * v_ji[..., 1] * grad[..., 1],
            2.0 * v_ji[..., 2] * grad[..., 2],
            v_ji[..., 0] * grad[..., 1] + v_ji[..., 1] * grad[..., 0],
            v_ji[..., 0] * grad[..., 2] + v_ji[..., 2] * grad[..., 0],
            v_ji[..., 1] * grad[..., 2] + v_ji[..., 2] * grad[..., 1],
        ],
        axis=-1,
    )


def _gradient_matrix(grad, dim: int):
    """[S, dim] gradient matrix G (`dfsph_viscosity.rs:59-82`)."""
    z = jnp.zeros_like(grad[..., 0])
    gx, gy = grad[..., 0], grad[..., 1]
    if dim == 2:
        rows = [
            [2.0 * gx, z],
            [z, 2.0 * gy],
            [gy, gx],
        ]
    else:
        gz = grad[..., 2]
        rows = [
            [2.0 * gx, z, z],
            [z, 2.0 * gy, z],
            [z, z, 2.0 * gz],
            [gy, gx, z],
            [gz, z, gx],
            [z, gz, gy],
        ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


@dataclasses.dataclass(frozen=True)
class DFSPHViscosityForce:
    """Implicit strain-rate projection viscosity (`dfsph_viscosity.rs`).

    Per-fluid viscosity coefficients in [0, 1]; fluids with
    ``participating = 0`` are excluded from both the solve and the error
    mean (the reference runs one solver instance per fluid; we run one
    joint loop whose termination uses the max over participating fluids'
    mean errors — a conservative coupling of the per-fluid iteration
    counts).

    Fluid-internal only: no boundary term (`dfsph_viscosity.rs:82-86`).

    Stability note: the reference's iteration diverges at its own gain —
    measured ~20x error growth PER ITERATION even on an interior lattice
    (see ``test_dfsph_viscosity_operator_descends_and_upstream_gain_
    diverges``: the assembled operator is a valid descent direction at
    ~0.02x gain, so the divergence is upstream behavior, not a porting
    bug; the reference's own commented debug print reports "unstable",
    `dfsph_viscosity.rs:308-313`, and no reference example exercises the
    force). This is a faithful port including that behavior. Keep
    ``max_viscosity_iter`` small (1-2) for robust use.
    """

    viscosity_coefficients: Tuple[float, ...]
    participating: Tuple[int, ...]
    min_viscosity_iter: int = 1
    max_viscosity_iter: int = 50
    max_viscosity_error: float = 0.01
    kind: str = dataclasses.field(default="dfsph_viscosity", init=False)

    def apply(self, ctx: StepContext):
        dim = ctx.dim
        S = _spatial_dim(dim)
        fl = ctx.fluids
        n = fl.capacity
        rho = ctx.densities
        part_i = per_particle(self.participating, ctx)  # [N] float 0/1
        nu_i = per_particle(self.viscosity_coefficients, ctx)
        mask = same_fluid_mask(ctx).astype(jnp.float32) * part_i[:, None]

        m_j = fl.masses[ctx.ff.j]
        # Per-contact gradient matrices G_ij: [N, K, S, dim].
        G = _gradient_matrix(ctx.ff.grad, dim)

        # Betas (`dfsph_viscosity.rs:130-197`).
        grad_i = G * (m_j / (2.0 * rho[:, None]) * mask)[..., None, None]
        sq = jnp.einsum("nksd,nktd->nst", grad_i, grad_i) / rho[:, None, None]
        gsum = jnp.sum(grad_i, axis=1)  # [N, S, dim]
        denom = sq + jnp.einsum("nsd,ntd->nst", gsum, gsum) / rho[:, None, None]

        diag = jnp.diagonal(denom, axis1=-2, axis2=-1)
        inv_diag = jnp.where(jnp.abs(diag) < 1.0e-6, 1.0, 1.0 / jnp.where(diag == 0, 1.0, diag))
        # D' = diag(p) @ D  (`dfsph_viscosity.rs:171-175`).
        denom_p = denom * inv_diag[:, :, None]
        det = jnp.linalg.det(denom_p)
        singular = jnp.abs(det) < 1.0e-6
        safe = jnp.where(
            singular[:, None, None],
            jnp.eye(S, dtype=denom_p.dtype)[None],
            denom_p,
        )
        beta = jnp.where(singular[:, None, None], 0.0, jnp.linalg.inv(safe))
        # beta = beta @ diag(p)  (`dfsph_viscosity.rs:192-196`).
        beta = beta * inv_diag[:, None, :]

        def strain_rate(accel):
            v = fl.velocities + accel * ctx.dt
            v_ji = v[ctx.ff.j] - v[:, None, :]
            rate = _strain_rate(ctx.ff.grad, v_ji, dim)
            return jnp.sum(
                rate * (m_j / (2.0 * rho[:, None]) * mask)[..., None], axis=1
            )

        target = strain_rate(jnp.zeros_like(fl.positions)) * (1.0 - nu_i[:, None])

        counts = jax.ops.segment_sum(
            (fl.alive.astype(jnp.float32) * part_i), fl.fluid_id, ctx.num_fluids
        )

        def mean_err(err_vec):
            contrib = jnp.sum(jnp.abs(err_vec), axis=-1) / 6.0
            contrib = jnp.where(fl.alive, contrib * part_i, 0.0)
            sums = jax.ops.segment_sum(contrib, fl.fluid_id, ctx.num_fluids)
            means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
            return jnp.max(means, initial=0.0)

        def update(accel, err_vec):
            u = jnp.einsum("nst,nt->ns", beta, err_vec) / (rho * rho)[:, None]
            u_j = u[ctx.ff.j]
            coeff = (u[:, None, :] + u_j) * (
                fl.volumes[ctx.ff.j] * fl.density0[:, None] * 0.5 * mask
            )[..., None]
            # accel += G^T coeff * (V_i rho0_i / dt)
            contrib = jnp.einsum("nksd,nks->nd", G, coeff)
            return accel + contrib * (fl.volumes * fl.density0)[:, None] * ctx.inv_dt

        def body(carry):
            i, accel, _, _ = carry
            err_vec = strain_rate(accel) - target
            err = mean_err(err_vec)
            converged = (err <= self.max_viscosity_error) & (
                i >= self.min_viscosity_iter
            )
            accel = jax.lax.cond(
                converged, lambda a: a, lambda a: update(a, err_vec), accel
            )
            return i + 1, accel, err, converged

        def cond(carry):
            i, _, _, done = carry
            return (i < self.max_viscosity_iter) & jnp.logical_not(done)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros_like(fl.positions),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), bool),
        )
        _, accel, _, _ = jax.lax.while_loop(cond, body, init)
        return accel, jnp.zeros_like(ctx.boundaries.forces)
