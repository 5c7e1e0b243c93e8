"""IISPH on the dense binned cell grid.

Same physics and termination as ``iisph.py`` /
``src/solver/pressure/iisph_solver.rs:643-711``, reformulated gather-free
(see ``dfsph_dense.py`` for the layout). Hoisting derivation:

- ``d_ii = -dt^2 / rho_i^2 (Gf_i + Gb_i)`` — iteration-invariant
  (`iisph_solver.rs:144-186`);
- ``a_ii = d_ii . (Gf + Gb) - factor_i * s2_m`` with
  ``factor_i = dt^2 m_i / rho_i^2`` and ``s2_m = sum m_j |grad|^2``
  (`:188-233`);
- per Jacobi iteration (`:235-353`): two pair passes —
  ``D_i = dij_pjl = -dt^2 K(p_j / rho_j^2)`` (a ``k_pass``), then
  ``sum_ff = D_i . Gf_i - T(q) + p_i factor_i s2_ff`` with the per-slot
  vector ``q_j = d_jj p_j + D_j`` (a ``t_pass``); the boundary part is
  ``D_i . Gb_i``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import IISPHConfig, SimConfig
from ..geometry import dense_grid as dg
from ..object.state import BoundariesState, FluidsState
from .common import SolverDiagnostics
from .dense_common import DenseCtx, per_fluid_mean_max_grid


def build_dense_substep(sim: SimConfig, cfg: IISPHConfig, num_fluids: int,
                        spec_f: dg.DenseGridSpec, spec_b: dg.DenseGridSpec,
                        dense_forces=(), halo_builder=None):
    dim = sim.dim

    def substep(fluids: FluidsState, boundaries: BoundariesState,
                pressures, es, dt, gravity, a_pw=None):
        # ``a_pw``: optional precomputed particle-wise force accel (the
        # sharded-binning path evaluates elasticity on home-sharded rows
        # before migration; see dfsph_dense.py / parallel/domain.py).
        dt = jnp.asarray(dt, jnp.float32)
        inv_dt = jnp.where(dt > 0, 1.0 / dt, 0.0)
        dt2 = dt * dt
        boundaries = boundaries.clear_forces()

        halo = halo_builder() if halo_builder is not None else None
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries, halo=halo)
        maskf, live, R0 = ctx.maskf, ctx.live, ctx.R0
        P_grid = ctx.to_f(pressures)

        # predict_advection: gravity + non-pressure forces.
        A = jnp.asarray(gravity, jnp.float32).reshape(dim, 1, 1) * maskf[None]
        np_Fb = jnp.zeros_like(ctx.Pb)
        if dense_forces:
            from .forces_dense import DenseFields, ParticleWiseForce

            # Lazily built: particle-wise forces never read the views
            # (see dfsph_dense.py — keeps elasticity scenes on the
            # spill-structured fast path).
            if any(not isinstance(f, ParticleWiseForce)
                   for f in dense_forces):
                jfb_v, jbf_v, Pb_v, Vbvel_v, Volb_v, maskb_v = (
                    ctx.force_field_views()
                )
                fields = DenseFields(
                    jff=ctx.jff, jfb=jfb_v, jbf=jbf_v,
                    n_offsets=len(ctx.offsets), P=ctx.P, V=ctx.V, M=ctx.M,
                    VOL=ctx.vol_grid(fluids), R0=R0, RHO=ctx.rho,
                    FID=ctx.FID, maskf=maskf, Pb=Pb_v, Vbvel=Vbvel_v,
                    Volb=Volb_v, maskb=maskb_v, h=sim.h, dim=dim,
                    dt=dt, inv_dt=inv_dt,
                    kernel_density=sim.kernel_density,
                    kernel_gradient=sim.kernel_gradient,
                    halo=halo, interior=ctx.interior,
                )
                np_Fb_force = jnp.zeros_like(Pb_v)
            else:
                fields = None
                np_Fb_force = None
            any_fb = False
            for force in dense_forces:
                if isinstance(force, ParticleWiseForce):
                    if a_pw is None:
                        a_p = force.force.apply_particles(fluids, es, dim)
                        A = A + ctx.to_f(a_p) * maskf[None]
                    continue
                a_d, fb_d = force.apply(fields)
                A = A + a_d * maskf[None]
                if fb_d is not None:
                    np_Fb_force = np_Fb_force + fb_d
                    any_fb = True
            if any_fb:
                np_Fb = np_Fb + ctx.np_fb_to_native(np_Fb_force)
        if a_pw is not None:
            A = A + ctx.to_f(a_pw) * maskf[None]
        DV = A * dt
        if halo is not None:
            # Force passes are valid on owned cells only; the predicted
            # densities read (V + DV) at j.
            DV = halo.exchange(DV)

        rho_safe = jnp.maximum(ctx.rho, 1e-12)
        inv_rho2 = 1.0 / (rho_safe * rho_safe)

        # d_ii and a_ii (`iisph_solver.rs:144-233`).
        dii = -(dt2 * inv_rho2)[None] * ctx.Gsum
        factor_i = dt2 * ctx.M * inv_rho2
        aii = jnp.sum(dii * ctx.Gsum, axis=0) - factor_i * ctx.s2_m

        # Warm start (`:673-677`) and predicted densities (`:92-142`).
        P_grid = P_grid * 0.5
        predicted = ctx.rho + ctx.delta_density(ctx.V + DV) * dt

        derr = R0 - predicted
        usable = jnp.abs(aii) > 1.0e-9
        safe_aii = jnp.where(usable, aii, 1.0)

        def body(carry):
            i, p, _, _ = carry
            if halo is not None:
                # Ghost pressures are one iteration stale (the Jacobi
                # update is computed on owned cells only); pass 1 reads
                # p at j, so refresh first.
                p = halo.exchange(p)
            # Pass 1: D = dij_pjl (`:235-268`).
            D = -dt2 * ctx.k_pass(p * inv_rho2)
            # Pass 2: q_j = d_jj p_j + D_j reduction (`:270-353`).
            q = dii * p[None] + D
            if halo is not None:
                # dii/D are hoisted/computed from ghost-incomplete sums;
                # t_pass reads q at j.
                q = halo.exchange(q)
            t_q = ctx.t_pass(q)
            sum_all = (
                jnp.sum(D * ctx.Gsum, axis=0)  # D_i . (Gf + Gb)
                - t_q
                + p * factor_i * ctx.s2_ff
            )
            candidate = (1.0 - cfg.omega) * p + cfg.omega * (derr - sum_all) / safe_aii
            positive = candidate > 0.0
            next_p = jnp.where(usable & positive & live,
                               jnp.maximum(candidate, 0.0), 0.0)
            err_i = jnp.where(
                usable & positive, (-sum_all - aii * next_p) / R0, 0.0
            )
            err = per_fluid_mean_max_grid(
                err_i, ctx.FID, maskf, num_fluids,
                halo=halo, interior=ctx.interior,
            )
            converged = (err <= cfg.max_density_error) & (i >= cfg.min_pressure_iter)
            return i + 1, next_p, err, converged

        def cond(carry):
            i, _, _, done = carry
            return (i < cfg.max_pressure_iter) & jnp.logical_not(done)

        iters, P_grid, err, _ = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), P_grid, jnp.zeros((), jnp.float32),
             jnp.zeros((), bool)),
        )

        # Velocity changes from final pressures (`:355-404`).
        if halo is not None:
            # Final k_pass / boundary pass read p at j.
            P_grid = halo.exchange(P_grid)
        p_over_rho2 = P_grid * inv_rho2
        K = ctx.k_pass(p_over_rho2)
        DV = DV - dt * (p_over_rho2[None] * ctx.Gf + K)
        DV = DV - dt * p_over_rho2[None] * ctx.Gb

        # Boundary feedback: per-contact force = grad * fbm * p/rho_i^2 *
        # m_i (`:393-400`).
        coef = R0 * ctx.M * p_over_rho2
        Fb = ctx.boundary_forces(coef) + np_Fb

        # Semi-implicit integration (`:406-420`).
        V2 = ctx.V + DV * maskf[None]
        P2 = ctx.P + V2 * (dt * maskf[None])

        new_pos, new_vel, new_pressures = ctx.unbin_f_multi([
            (P2, fluids.positions),
            (V2, fluids.velocities),
            (P_grid, pressures),
        ])
        fluids = fluids.replace(positions=new_pos, velocities=new_vel)
        b_forces, b_volumes = ctx.unbin_b_multi([
            (Fb, boundaries.forces * 0.0),
            (ctx.Volb, boundaries.volumes),
        ])
        boundaries = boundaries.replace(
            forces=b_forces, volumes=b_volumes
        )

        from ..step import StepDiagnostics

        zero_i = jnp.zeros((), jnp.int32)
        zero_f = jnp.zeros((), jnp.float32)
        own = live if halo is None else live & ctx.interior
        ncontacts_ff = jnp.sum(jnp.where(own, ctx.cnt_ff, 0))
        ncontacts_fb = jnp.sum(jnp.where(own, ctx.cnt_fb, 0))
        neighbor_overflow = ctx.bin_overflow
        candidate_overflow = ctx.binf.clamped + ctx.binb.clamped
        max_rho = jnp.max(jnp.where(own, ctx.rho / R0, 0.0), initial=0.0)
        if halo is not None:
            ncontacts_ff = halo.psum(ncontacts_ff)
            ncontacts_fb = halo.psum(ncontacts_fb)
            neighbor_overflow = halo.psum(neighbor_overflow)
            candidate_overflow = halo.psum(candidate_overflow)
            max_rho = halo.pmax(max_rho)
        diag = StepDiagnostics(
            solver=SolverDiagnostics(
                pressure_iters=iters,
                pressure_error=err,
                divergence_iters=zero_i,
                divergence_error=zero_f,
            ),
            ncontacts_ff=ncontacts_ff,
            ncontacts_fb=ncontacts_fb,
            neighbor_overflow=neighbor_overflow,
            candidate_overflow=candidate_overflow,
            max_density_ratio=max_rho,
            spill_overflow=jnp.asarray(ctx.spill_overflow, jnp.int32),
            spill_k_overflow=jnp.asarray(ctx.spill_k_overflow, jnp.int32),
        )
        return fluids, boundaries, new_pressures, diag

    return substep
