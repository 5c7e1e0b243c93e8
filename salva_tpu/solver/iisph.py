"""Implicit Incompressible SPH pressure solver (Ihmsen et al.).

TPU re-design of ``src/solver/pressure/iisph_solver.rs``: relaxed-Jacobi
pressure iteration (omega = 0.5) as a ``lax.while_loop`` over masked
[N, K] contact reductions, with warm-started pressures persisting across
steps (halved at every step start, `iisph_solver.rs:673-677`).

Step order matches `iisph_solver.rs:643-711`: non-pressure forces ->
fold accelerations -> d_ii -> warm start -> rho* -> a_ii -> pressure loop
-> velocity changes -> integrate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import IISPHConfig
from .common import (
    SolverDiagnostics,
    StepContext,
    per_fluid_mean_max,
    scatter_boundary_forces,
)


def compute_dii(ctx: StepContext):
    """d_ii = -dt^2 / rho_i^2 * sum m_j grad (`iisph_solver.rs:144-186`)."""
    rho = ctx.densities
    factor = -(ctx.dt * ctx.dt) / (rho * rho)
    ff_sum = jnp.sum(ctx.ff.grad * ctx.ff_mass_j()[..., None], axis=1)
    fb_sum = jnp.sum(ctx.fb.grad * ctx.fb_mass_j()[..., None], axis=1)
    return (ff_sum + fb_sum) * factor[:, None]


def compute_aii(ctx: StepContext, dii):
    """a_ii = sum m_j (d_ii - d_ji) . grad (`iisph_solver.rs:188-233`),
    d_ji = grad * dt^2 m_i / rho_i^2."""
    rho = ctx.densities
    m_i = ctx.masses
    factor = (ctx.dt * ctx.dt) * m_i / (rho * rho)
    dji_ff = ctx.ff.grad * factor[:, None, None]
    term_ff = jnp.sum(
        ctx.ff_mass_j() * jnp.sum((dii[:, None, :] - dji_ff) * ctx.ff.grad, axis=-1),
        axis=1,
    )
    dji_fb = ctx.fb.grad * factor[:, None, None]
    term_fb = jnp.sum(
        ctx.fb_mass_j() * jnp.sum((dii[:, None, :] - dji_fb) * ctx.fb.grad, axis=-1),
        axis=1,
    )
    return term_ff + term_fb


def compute_predicted_densities(ctx: StepContext, velocity_changes):
    """rho* = rho + dt * sum m_j (v_i + dv_i - v_j - dv_j) . grad
    (`iisph_solver.rs:92-142`, no clamping here)."""
    v = ctx.fluids.velocities + velocity_changes
    dv_ff = v[:, None, :] - v[ctx.ff.j]
    ff_term = jnp.sum(ctx.ff_mass_j() * jnp.sum(dv_ff * ctx.ff.grad, axis=-1), axis=1)
    dv_fb = v[:, None, :] - ctx.boundaries.velocities[ctx.fb.j]
    fb_term = jnp.sum(ctx.fb_mass_j() * jnp.sum(dv_fb * ctx.fb.grad, axis=-1), axis=1)
    return ctx.densities + (ff_term + fb_term) * ctx.dt


def compute_dij_pjl(ctx: StepContext, pressures):
    """dt^2 * sum_ff grad * (-m_j p_j / rho_j^2) (`iisph_solver.rs:235-268`;
    fluid-fluid only)."""
    rho_j = ctx.densities[ctx.ff.j]
    p_j = pressures[ctx.ff.j]
    coeff = -ctx.ff_mass_j() * p_j / (rho_j * rho_j)
    return jnp.sum(ctx.ff.grad * coeff[..., None], axis=1) * (ctx.dt * ctx.dt)


def compute_next_pressures(cfg: IISPHConfig, ctx: StepContext, pressures,
                           dij_pjl, dii, aii, predicted_densities):
    """Relaxed Jacobi update + per-particle compressibility error
    (`iisph_solver.rs:270-353`)."""
    rho = ctx.densities
    m_i = ctx.masses
    dt2 = ctx.dt * ctx.dt
    factor_i = dt2 * m_i / (rho * rho)

    # Fluid-fluid sum.
    j = ctx.ff.j
    dji = ctx.ff.grad * factor_i[:, None, None]
    inner = (
        dij_pjl[:, None, :]
        - dii[j] * pressures[j][..., None]
        - (dij_pjl[j] - dji * pressures[:, None, None])
    )
    sum_ff = jnp.sum(ctx.ff_mass_j() * jnp.sum(inner * ctx.ff.grad, axis=-1), axis=1)
    # Fluid-boundary sum.
    sum_fb = jnp.sum(
        ctx.fb_mass_j() * jnp.sum(dij_pjl[:, None, :] * ctx.fb.grad, axis=-1),
        axis=1,
    )
    s = sum_ff + sum_fb

    rho0 = ctx.fluids.density0
    derr = rho0 - predicted_densities
    usable = jnp.abs(aii) > 1.0e-9
    safe_aii = jnp.where(usable, aii, 1.0)
    candidate = (1.0 - cfg.omega) * pressures + cfg.omega * (derr - s) / safe_aii
    positive = candidate > 0.0
    next_p = jnp.where(usable & positive, jnp.maximum(candidate, 0.0), 0.0)
    err_i = jnp.where(usable & positive, (-s - aii * next_p) / rho0, 0.0)
    err = per_fluid_mean_max(
        err_i, ctx.fluids.fluid_id, ctx.fluids.alive, ctx.num_fluids
    )
    return next_p, err


def pressure_solve(cfg: IISPHConfig, ctx: StepContext, pressures, dii, aii,
                   predicted_densities):
    """The Jacobi loop (`iisph_solver.rs:422-456`); the pressure swap
    happens before the convergence check, so the converged pressures are
    the freshly computed ones."""

    def body(carry):
        i, p, _, _ = carry
        dij_pjl = compute_dij_pjl(ctx, p)
        next_p, err = compute_next_pressures(
            cfg, ctx, p, dij_pjl, dii, aii, predicted_densities
        )
        converged = (err <= cfg.max_density_error) & (i >= cfg.min_pressure_iter)
        return i + 1, next_p, err, converged

    def cond(carry):
        i, _, _, done = carry
        return (i < cfg.max_pressure_iter) & jnp.logical_not(done)

    init = (
        jnp.zeros((), jnp.int32),
        pressures,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), bool),
    )
    iters, p, err, _ = jax.lax.while_loop(cond, body, init)
    return p, iters, err


def velocity_changes_from_pressures(ctx: StepContext, pressures, bforces):
    """dv_i -= dt * sum m_j (p_i/rho_i^2 + p_j/rho_j^2) grad, plus the
    boundary mirror-pressure term and force feedback
    (`iisph_solver.rs:355-404`)."""
    rho = ctx.densities
    p_over_rho2 = pressures / (rho * rho)
    coeff_ff = ctx.ff_mass_j() * (
        p_over_rho2[:, None] + p_over_rho2[ctx.ff.j]
    )
    dv = -jnp.sum(ctx.ff.grad * (coeff_ff * ctx.dt)[..., None], axis=1)

    acc_fb = ctx.fb.grad * (ctx.fb_mass_j() * p_over_rho2[:, None])[..., None]
    dv = dv - jnp.sum(acc_fb, axis=1) * ctx.dt

    m_i = ctx.masses
    bforces = scatter_boundary_forces(bforces, ctx.fb, acc_fb * m_i[:, None, None])
    return dv, bforces


def step(
    cfg: IISPHConfig,
    ctx: StepContext,
    pressures,
    gravity,
    apply_nonpressure_forces,
):
    """Full IISPH substep (`iisph_solver.rs:643-711`).

    Returns (fluids', boundary_forces, pressures', diagnostics).
    """
    fl = ctx.fluids
    bforces = jnp.zeros_like(ctx.boundaries.forces)

    # predict_advection (gravity + non-pressure forces), then fold the
    # accelerations into the velocity-change buffer.
    accel = jnp.where(fl.alive[:, None], jnp.broadcast_to(gravity, fl.positions.shape), 0.0)
    np_accel, np_bforces = apply_nonpressure_forces(ctx)
    accel = accel + np_accel
    bforces = bforces + np_bforces
    dv = jnp.where(fl.alive[:, None], accel * ctx.dt, 0.0)

    dii = compute_dii(ctx)
    pressures = pressures * 0.5  # warm start (`:673-677`)
    predicted = compute_predicted_densities(ctx, dv)
    aii = compute_aii(ctx, dii)

    pressures, iters, err = pressure_solve(cfg, ctx, pressures, dii, aii, predicted)

    dvp, bforces = velocity_changes_from_pressures(ctx, pressures, bforces)
    dv = dv + dvp

    velocities = fl.velocities + jnp.where(fl.alive[:, None], dv, 0.0)
    positions = fl.positions + jnp.where(fl.alive[:, None], velocities * ctx.dt, 0.0)
    fl = fl.replace(velocities=velocities, positions=positions)

    zero_i = jnp.zeros((), jnp.int32)
    zero_f = jnp.zeros((), jnp.float32)
    diag = SolverDiagnostics(
        pressure_iters=iters,
        pressure_error=err,
        divergence_iters=zero_i,
        divergence_error=zero_f,
    )
    return fl, bforces, pressures, diag
