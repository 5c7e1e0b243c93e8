"""Divergence-Free SPH pressure solver.

TPU re-design of ``src/solver/pressure/dfsph_solver.rs``: every
per-particle rayon loop becomes a masked [N, K] contact reduction, the
pressure / divergence iterations become ``lax.while_loop``s whose
termination reproduces the reference's rules exactly (per-fluid mean
error, max across fluids, min/max iteration counts), and the RwLock
boundary-force feedback becomes a deterministic scatter-add.

Stage order inside ``step`` matches `dfsph_solver.rs:667-708`:
alphas -> divergence solve -> commit velocity changes -> non-pressure
forces -> fold accelerations -> pressure solve -> integrate positions.
The ``velocity_changes`` buffer persists across steps exactly like the
reference's solver scratch (it feeds the next step's divergence solve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DFSPHConfig
from .common import (
    SolverDiagnostics,
    StepContext,
    per_fluid_mean_max,
    scatter_boundary_forces,
)


def compute_alphas(ctx: StepContext) -> jnp.ndarray:
    """alpha_i / rho_i = 1 / (sum |grad m|^2 + |sum grad m|^2)
    (`dfsph_solver.rs:165-216`), with the 1e-5 epsilon guard."""
    g_ff = ctx.ff.grad * ctx.ff_mass_j()[..., None]
    g_fb = ctx.fb.grad * ctx.fb_mass_j()[..., None]
    sq = jnp.sum(g_ff * g_ff, axis=(1, 2)) + jnp.sum(g_fb * g_fb, axis=(1, 2))
    gsum = jnp.sum(g_ff, axis=1) + jnp.sum(g_fb, axis=1)
    denom = sq + jnp.sum(gsum * gsum, axis=-1)
    return jnp.where(denom <= 1.0e-5, 0.0, 1.0 / jnp.where(denom == 0, 1.0, denom))


def _relative_velocity_divergence(ctx: StepContext, velocity_changes):
    """sum m_j (v_i + dv_i - v_j - dv_j) . grad  over ff contacts plus the
    boundary term (shared by predicted densities and divergences)."""
    v = ctx.fluids.velocities + velocity_changes
    dv_ff = v[:, None, :] - v[ctx.ff.j]
    ff_term = jnp.sum(
        ctx.ff_mass_j() * jnp.sum(dv_ff * ctx.ff.grad, axis=-1), axis=1
    )
    dv_fb = v[:, None, :] - ctx.boundaries.velocities[ctx.fb.j]
    fb_term = jnp.sum(
        ctx.fb_mass_j() * jnp.sum(dv_fb * ctx.fb.grad, axis=-1), axis=1
    )
    return ff_term + fb_term


def compute_predicted_densities(ctx: StepContext, velocity_changes):
    """rho*_i and the mean density error (`dfsph_solver.rs:98-162`).

    Error contribution is 0 when rho* < rho0 (under-pressure is clamped)
    else rho*/rho0 - 1; averaged per fluid, maxed across fluids.
    """
    delta = _relative_velocity_divergence(ctx, velocity_changes)
    predicted = ctx.densities + delta * ctx.dt
    rho0 = ctx.fluids.density0
    err_i = jnp.where(predicted < rho0, 0.0, predicted / rho0 - 1.0)
    err = per_fluid_mean_max(
        err_i, ctx.fluids.fluid_id, ctx.fluids.alive, ctx.num_fluids
    )
    return predicted, err


def compute_divergences(ctx: StepContext, velocity_changes, min_neighbors: int):
    """Velocity divergences and mean divergence error
    (`dfsph_solver.rs:279-356`): zero for particles with fewer than
    ``min_neighbors`` contacts, clamped >= 0."""
    div = _relative_velocity_divergence(ctx, velocity_changes)
    # The reference's boundary term ignores the boundary velocity (a noted
    # FIXME at `dfsph_solver.rs:330`); _relative_velocity_divergence uses
    # (v_i - v_bj). For static boundaries these coincide; for moving
    # boundaries we keep the physically-correct relative velocity.
    enough = (ctx.ff.count + ctx.fb.count) >= min_neighbors
    div = jnp.where(enough, jnp.maximum(div, 0.0), 0.0)
    err = per_fluid_mean_max(
        div / ctx.fluids.density0,
        ctx.fluids.fluid_id,
        ctx.fluids.alive,
        ctx.num_fluids,
    )
    return div, err


def pressure_velocity_changes(ctx: StepContext, velocity_changes,
                              predicted_densities, alphas):
    """One pressure iteration's velocity update (`dfsph_solver.rs:218-277`).

    Returns (velocity_changes', ki_plus) where ``ki_plus`` is this
    iteration's clamped stiffness — the boundary reaction force is linear
    in it (the contact gradients are frozen within a substep), so the
    caller accumulates sum(ki_plus) across iterations and performs ONE
    deterministic scatter after the loop instead of one per iteration.
    """
    rho0 = ctx.fluids.density0
    ki = (predicted_densities - rho0) * alphas
    ki_j = ki[ctx.ff.j]
    kij = jnp.maximum(ki, 0.0)[:, None] + jnp.maximum(ki_j, 0.0)
    coeff = jnp.where(kij > 0.0, kij * ctx.ff_mass_j(), 0.0)
    dv = -jnp.sum(ctx.ff.grad * (coeff * ctx.inv_dt)[..., None], axis=1)

    ki_plus = jnp.maximum(ki, 0.0)
    coeff_b = ki_plus[:, None] * ctx.fb_mass_j()
    dv = dv - jnp.sum(ctx.fb.grad * (coeff_b * ctx.inv_dt)[..., None], axis=1)

    return velocity_changes + dv, ki_plus


def divergence_velocity_changes(ctx: StepContext, velocity_changes,
                                divergences, alphas):
    """One divergence iteration's velocity update
    (`dfsph_solver.rs:358-409`). Returns (velocity_changes', ki); the
    boundary force scatter is deferred like in the pressure loop."""
    ki = divergences * alphas
    kj = ki[ctx.ff.j]
    coeff = -(ki[:, None] + kj) * ctx.ff_mass_j()
    dv = jnp.sum(ctx.ff.grad * coeff[..., None], axis=1)

    coeff_b = -ki[:, None] * ctx.fb_mass_j()
    dv = dv + jnp.sum(ctx.fb.grad * coeff_b[..., None], axis=1)

    return velocity_changes + dv, ki


def _scatter_ksum_forces(ctx: StepContext, bforces, ksum, extra_inv_dt: bool):
    """One deferred boundary-force scatter for an accumulated stiffness sum.

    The per-iteration boundary contributions (`dfsph_solver.rs:262-271`
    pressure: grad * ki+ * fb_mass * inv_dt^2 * m_i; `:393-400` divergence:
    grad * ki * fb_mass * inv_dt * m_i) are linear in the iteration's
    stiffness with frozen gradients, so summing stiffness per particle and
    scattering once is exact — and removes an [N*Kb] scatter-add from every
    solver iteration.
    """
    scale = ctx.masses * ctx.inv_dt
    if extra_inv_dt:
        scale = scale * ctx.inv_dt
    coeff = ksum[:, None] * ctx.fb_mass_j() * scale[:, None]
    contrib = ctx.fb.grad * coeff[..., None]
    return scatter_boundary_forces(bforces, ctx.fb, contrib)


def _apply_pressure_kappa(ctx: StepContext, velocity_changes, ki_plus):
    """Apply a GIVEN clamped pressure stiffness field (one pair pass) —
    the body of `pressure_velocity_changes` factored so the warm-start
    kick reuses the exact iteration algebra."""
    kij = ki_plus[:, None] + ki_plus[ctx.ff.j]
    coeff = jnp.where(kij > 0.0, kij * ctx.ff_mass_j(), 0.0)
    dv = -jnp.sum(ctx.ff.grad * (coeff * ctx.inv_dt)[..., None], axis=1)
    coeff_b = ki_plus[:, None] * ctx.fb_mass_j()
    dv = dv - jnp.sum(ctx.fb.grad * (coeff_b * ctx.inv_dt)[..., None], axis=1)
    return velocity_changes + dv


def _apply_divergence_kappa(ctx: StepContext, velocity_changes, ki):
    """Divergence twin of `_apply_pressure_kappa` (no inv_dt scaling)."""
    kj = ki[ctx.ff.j]
    coeff = -(ki[:, None] + kj) * ctx.ff_mass_j()
    dv = jnp.sum(ctx.ff.grad * coeff[..., None], axis=1)
    coeff_b = -ki[:, None] * ctx.fb_mass_j()
    dv = dv + jnp.sum(ctx.fb.grad * coeff_b[..., None], axis=1)
    return velocity_changes + dv


def pressure_solve(cfg: DFSPHConfig, ctx: StepContext, velocity_changes,
                   bforces, alphas, kp_warm=None):
    """The constant-density loop (`dfsph_solver.rs:432-464`), optionally
    warm-started from the previous step's stiffness sum (cfg.warm_start)."""

    ksum0 = jnp.zeros_like(alphas)
    warm = float(getattr(cfg, "warm_start", 0.0))
    if kp_warm is not None and warm > 0.0:
        k0 = jnp.maximum(kp_warm * jnp.float32(warm), 0.0)
        k0 = jnp.where(ctx.fluids.alive, k0, 0.0)
        velocity_changes = _apply_pressure_kappa(ctx, velocity_changes, k0)
        ksum0 = k0

    def body(carry):
        i, dv, ksum, _, _ = carry
        predicted, err = compute_predicted_densities(ctx, dv)
        converged = (err <= cfg.max_density_error) & (i >= cfg.min_pressure_iter)

        def do_update(args):
            dv, ksum = args
            dv, ki = pressure_velocity_changes(ctx, dv, predicted, alphas)
            return dv, ksum + ki

        dv, ksum = jax.lax.cond(converged, lambda a: a, do_update, (dv, ksum))
        return i + 1, dv, ksum, err, converged

    def cond(carry):
        i, _, _, _, done = carry
        return (i < cfg.max_pressure_iter) & jnp.logical_not(done)

    init = (
        jnp.zeros((), jnp.int32),
        velocity_changes,
        ksum0,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), bool),
    )
    iters, dv, ksum, err, _ = jax.lax.while_loop(cond, body, init)
    bforces = _scatter_ksum_forces(ctx, bforces, ksum, extra_inv_dt=True)
    return dv, bforces, iters, err, ksum


def divergence_solve(cfg: DFSPHConfig, ctx: StepContext, velocity_changes,
                     bforces, alphas, min_neighbors: int, kd_warm=None):
    """The divergence-free loop (`dfsph_solver.rs:466-503`); note the
    tolerance scaling ``max_divergence_error * inv_dt * 0.01``. Optionally
    warm-started (cfg.warm_start)."""
    max_err = cfg.max_divergence_error * ctx.inv_dt * 0.01

    ksum0 = jnp.zeros_like(alphas)
    warm = float(getattr(cfg, "warm_start", 0.0))
    if kd_warm is not None and warm > 0.0:
        k0 = jnp.maximum(kd_warm * jnp.float32(warm), 0.0)
        k0 = jnp.where(ctx.fluids.alive, k0, 0.0)
        velocity_changes = _apply_divergence_kappa(ctx, velocity_changes, k0)
        ksum0 = k0

    def body(carry):
        i, dv, ksum, _, _ = carry
        div, err = compute_divergences(ctx, dv, min_neighbors)
        converged = (err <= max_err) & (i >= cfg.min_divergence_iter)

        def do_update(args):
            dv, ksum = args
            dv, ki = divergence_velocity_changes(ctx, dv, div, alphas)
            return dv, ksum + ki

        dv, ksum = jax.lax.cond(converged, lambda a: a, do_update, (dv, ksum))
        return i + 1, dv, ksum, err, converged

    def cond(carry):
        i, _, _, _, done = carry
        return (i < cfg.max_divergence_iter) & jnp.logical_not(done)

    init = (
        jnp.zeros((), jnp.int32),
        velocity_changes,
        ksum0,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), bool),
    )
    iters, dv, ksum, err, _ = jax.lax.while_loop(cond, body, init)
    bforces = _scatter_ksum_forces(ctx, bforces, ksum, extra_inv_dt=False)
    return dv, bforces, iters, err, ksum


def step(
    cfg: DFSPHConfig,
    ctx: StepContext,
    solver_state,
    gravity,
    apply_nonpressure_forces,
):
    """Full DFSPH substep (`dfsph_solver.rs:667-708`).

    ``apply_nonpressure_forces(ctx) -> (accelerations, boundary_forces)``
    is injected by the world (it closes over the force set and any force
    state).

    ``solver_state``: [capacity, dim+2] — velocity changes plus the
    previous step's divergence / pressure stiffness sums (warm start;
    see `step.init_solver_state`).

    Returns (fluids', boundary_forces, solver_state', diagnostics).
    """
    fl = ctx.fluids
    dim = ctx.dim
    velocity_changes = solver_state[:, :dim]
    kd_warm = solver_state[:, dim]
    kp_warm = solver_state[:, dim + 1]
    min_nb = cfg.min_neighbors(ctx.dim)
    bforces = jnp.zeros_like(ctx.boundaries.forces)

    alphas = compute_alphas(ctx)

    dv, bforces, div_iters, div_err, ksum_d = divergence_solve(
        cfg, ctx, velocity_changes, bforces, alphas, min_nb, kd_warm
    )

    # Commit the divergence-corrected velocities (`:688-691`).
    velocities = fl.velocities + jnp.where(fl.alive[:, None], dv, 0.0)
    fl = fl.replace(velocities=velocities)
    ctx = ctx.replace(fluids=fl)
    dv = jnp.zeros_like(dv)

    # predict_advection: gravity + non-pressure forces (`:565-604`).
    accel = jnp.where(fl.alive[:, None], jnp.broadcast_to(gravity, fl.positions.shape), 0.0)
    np_accel, np_bforces = apply_nonpressure_forces(ctx)
    accel = accel + np_accel
    bforces = bforces + np_bforces

    # integrate_and_clear_accelerations (`:505-518`).
    dv = dv + jnp.where(fl.alive[:, None], accel * ctx.dt, 0.0)

    dv, bforces, p_iters, p_err, ksum_p = pressure_solve(
        cfg, ctx, dv, bforces, alphas, kp_warm
    )

    # update_positions (`:411-420`): x += (v + dv) * dt. Note dv is NOT
    # folded into v here — it carries into the next step's divergence solve.
    positions = fl.positions + jnp.where(
        fl.alive[:, None], (fl.velocities + dv) * ctx.dt, 0.0
    )
    fl = fl.replace(positions=positions)

    diag = SolverDiagnostics(
        pressure_iters=p_iters,
        pressure_error=p_err,
        divergence_iters=div_iters,
        divergence_error=div_err,
    )
    new_state = jnp.concatenate(
        [dv, ksum_d[:, None], ksum_p[:, None]], axis=1
    )
    return fl, bforces, new_state, diag
