"""DFSPH on the dense binned cell grid (the gather-free TPU path).

Same physics, stage order, and termination rules as ``dfsph.py`` /
``src/solver/pressure/dfsph_solver.rs:667-708``, reformulated so that no
solver iteration performs a gather or scatter:

- particles are binned once per substep (``geometry/dense_grid.py``);
- all neighbor sums are dense ``[cap_i, cap_j, C]`` pair reductions over
  the 3^dim shifted cell views;
- the iteration-invariant parts of every sum are hoisted: with contact
  gradients frozen during a substep,
  ``sum_j m_j (v_i' - v_j') . grad_ij = v_i' . Gf_i - T_i`` where
  ``Gf_i = sum_j m_j grad_ij`` is per-substep and only
  ``T_i = sum_j m_j v_j' . grad_ij`` changes per iteration — one pair pass
  per half-iteration instead of the reference's full contact loop;
- boundary-force feedback accumulates stiffness per particle and runs ONE
  boundary-owner pair pass at the end (`dfsph_solver.rs:262-271,393-400`
  are linear in the iteration stiffness).

Shared machinery lives in ``dense_common.DenseCtx``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DFSPHConfig, SimConfig
from ..geometry import dense_grid as dg
from ..object.state import BoundariesState, FluidsState
from .common import SolverDiagnostics
from .dense_common import DenseCtx, per_fluid_mean_max_grid


def build_dense_substep(sim: SimConfig, cfg: DFSPHConfig, num_fluids: int,
                        spec_f: dg.DenseGridSpec, spec_b: dg.DenseGridSpec,
                        dense_forces=(), halo_builder=None):
    """Build the dense-layout DFSPH substep.

    ``dense_forces``: tuple of dense-layout non-pressure force objects
    (``forces_dense.py``), each ``apply(fields) -> (accel, bforces|None)``.

    ``halo_builder``: optional factory returning a ``parallel.domain.Halo``
    when tracing inside ``shard_map`` — the substep then runs on this
    device's grid slab, exchanging per-iteration ghost layers (stiffness
    ``ki`` before each k_pass, velocity changes after each update) and
    psum-reducing the convergence errors.
    """
    dim = sim.dim
    min_nb = cfg.min_neighbors(dim)

    warm = float(getattr(cfg, "warm_start", 0.0))

    def substep(fluids: FluidsState, boundaries: BoundariesState,
                solver_state, es, dt, gravity, a_pw=None):
        # ``a_pw``: optional externally-computed particle-wise force
        # acceleration [N, dim] (sharded-binning path: elasticity is
        # evaluated on the HOME-sharded rows before migration — the rest
        # topology is static in row space — and routed here with the
        # particle arrays; see parallel/domain.py).
        dt = jnp.asarray(dt, jnp.float32)
        inv_dt = jnp.where(dt > 0, 1.0 / dt, 0.0)
        boundaries = boundaries.clear_forces()

        halo = halo_builder() if halo_builder is not None else None
        ctx = DenseCtx(
            sim, spec_f, spec_b, fluids, boundaries, halo=halo,
            need_s2=False,  # s2_ff / s2_m are IISPH-only sums
        )
        maskf, live, R0 = ctx.maskf, ctx.live, ctx.R0
        # solver_state: [:, :dim] velocity changes, [:, dim] / [:, dim+1]
        # the previous step's divergence / pressure stiffness sums (the
        # warm start; see step.init_solver_state). One packed row gather
        # when the layout carries grid_src.
        if getattr(ctx.binf, "grid_src", None) is not None:
            (SG,) = dg.to_grid_multi(ctx.sf, ctx.binf, [(solver_state, 0.0)])
        else:
            SG = ctx.to_f(solver_state)  # [dim+2, cap, C]
        DV = SG[:dim]
        kd_prev, kp_prev = SG[dim], SG[dim + 1]

        # alpha_i (`dfsph_solver.rs:165-216`): 1 / (sum|m grad|^2 +
        # |sum m grad|^2), eps-guarded.
        denom = ctx.sq_mm + jnp.sum(ctx.Gsum * ctx.Gsum, axis=0)
        alpha = jnp.where(denom <= 1.0e-5, 0.0,
                          1.0 / jnp.where(denom == 0, 1.0, denom))

        # --- divergence solve (`dfsph_solver.rs:466-503`)
        max_div_err = cfg.max_divergence_error * inv_dt * 0.01

        # Warm start: apply a damped version of the previous step's
        # accumulated divergence stiffness before iterating (one extra
        # k_pass; saves iterations worth two passes each). The kick is
        # part of ksum so the boundary-force feedback stays exact.
        ksum0_d = jnp.zeros_like(maskf)
        if warm > 0.0:
            k0 = jnp.maximum(kd_prev * jnp.float32(warm), 0.0) * maskf
            if halo is not None:
                k0 = halo.exchange(k0)
            DV = DV - (k0[None] * ctx.Gsum + ctx.k_pass(k0))
            if halo is not None:
                DV = halo.exchange(DV)
            ksum0_d = k0

        def div_body(carry):
            i, dv, ksum, _, _ = carry
            delta = ctx.delta_density(ctx.V + dv)
            enough = ctx.count >= min_nb
            div = jnp.where(enough & live, jnp.maximum(delta, 0.0), 0.0)
            err = per_fluid_mean_max_grid(
                div / R0, ctx.FID, maskf, num_fluids,
                halo=halo, interior=ctx.interior,
            )
            converged = (err <= max_div_err) & (i >= cfg.min_divergence_iter)

            def update(args):
                dv, ksum = args
                ki = div * alpha
                if halo is not None:
                    # ki is only valid on owned cells (delta at a ghost
                    # cell sees half its neighborhood); k_pass reads
                    # neighbor ki, so refresh the ghost layers first.
                    ki = halo.exchange(ki)
                kf = ctx.k_pass(ki)
                dv = dv - (ki[None] * ctx.Gsum + kf)
                if halo is not None:
                    dv = halo.exchange(dv)
                return dv, ksum + ki

            dv, ksum = jax.lax.cond(converged, lambda a: a, update, (dv, ksum))
            return i + 1, dv, ksum, err, converged

        def div_cond(carry):
            i, _, _, _, done = carry
            return (i < cfg.max_divergence_iter) & jnp.logical_not(done)

        div_iters, DV, ksum_d, div_err, _ = jax.lax.while_loop(
            div_cond, div_body,
            (jnp.zeros((), jnp.int32), DV, ksum0_d,
             jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
        )

        # Commit velocities; reset velocity changes (`:688-691`).
        V2 = ctx.V + DV * maskf[None]
        DV = jnp.zeros_like(DV)

        # predict_advection: gravity + non-pressure forces (`:565-604`).
        A = jnp.asarray(gravity, jnp.float32).reshape(dim, 1, 1) * maskf[None]
        np_Fb = jnp.zeros_like(ctx.Pb)
        if dense_forces:
            from .forces_dense import DenseFields, ParticleWiseForce

            # Particle-wise forces (elasticity) never read the dense
            # field views; building them lazily keeps such scenes on the
            # spill-structured fast path (whose extended arrays the
            # generic force passes can't consume).
            if any(not isinstance(f, ParticleWiseForce)
                   for f in dense_forces):
                jfb_v, jbf_v, Pb_v, Vbvel_v, Volb_v, maskb_v = (
                    ctx.force_field_views()
                )
                VOLg = ctx.vol_grid(fluids)
                fields = DenseFields(
                    jff=ctx.jff, jfb=jfb_v, jbf=jbf_v,
                    n_offsets=len(ctx.offsets), P=ctx.P, V=V2, M=ctx.M,
                    VOL=VOLg, R0=R0, RHO=ctx.rho, FID=ctx.FID, maskf=maskf,
                    Pb=Pb_v, Vbvel=Vbvel_v, Volb=Volb_v, maskb=maskb_v,
                    h=sim.h, dim=dim, dt=dt, inv_dt=inv_dt,
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
                    # Static-topology force (elasticity): particle layout,
                    # one scatter into the grid. Skipped when the caller
                    # supplied the precomputed accel (a_pw below).
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
        DV = DV + A * dt
        if halo is not None:
            # Single-roll force passes are valid on owned cells only.
            DV = halo.exchange(DV)

        # --- pressure solve (`dfsph_solver.rs:432-464`)
        # Warm start (same structure as the divergence kick; the pressure
        # update scales by inv_dt).
        ksum0_p = jnp.zeros_like(maskf)
        if warm > 0.0:
            kp0 = jnp.maximum(kp_prev * jnp.float32(warm), 0.0) * maskf
            if halo is not None:
                kp0 = halo.exchange(kp0)
            DV = DV - (kp0[None] * ctx.Gsum + ctx.k_pass(kp0)) * inv_dt
            if halo is not None:
                DV = halo.exchange(DV)
            ksum0_p = kp0

        def p_body(carry):
            i, dv, ksum, _, _ = carry
            predicted = ctx.rho + ctx.delta_density(V2 + dv) * dt
            err_i = jnp.where(predicted < R0, 0.0, predicted / R0 - 1.0)
            err = per_fluid_mean_max_grid(
                err_i, ctx.FID, maskf, num_fluids,
                halo=halo, interior=ctx.interior,
            )
            converged = (err <= cfg.max_density_error) & (i >= cfg.min_pressure_iter)

            def update(args):
                dv, ksum = args
                ki = (predicted - R0) * alpha
                ki_p = jnp.maximum(ki, 0.0)
                if halo is not None:
                    ki_p = halo.exchange(ki_p)
                kf = ctx.k_pass(ki_p)
                dv = dv - (ki_p[None] * ctx.Gsum + kf) * inv_dt
                if halo is not None:
                    dv = halo.exchange(dv)
                return dv, ksum + ki_p

            dv, ksum = jax.lax.cond(converged, lambda a: a, update, (dv, ksum))
            return i + 1, dv, ksum, err, converged

        def p_cond(carry):
            i, _, _, _, done = carry
            return (i < cfg.max_pressure_iter) & jnp.logical_not(done)

        p_iters, DV, ksum_p, p_err, _ = jax.lax.while_loop(
            p_cond, p_body,
            (jnp.zeros((), jnp.int32), DV, ksum0_p,
             jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
        )

        # --- positions (`:411-420`)
        P2 = ctx.P + (V2 + DV) * (dt * maskf[None])

        # --- boundary force feedback: one boundary-owner pair pass.
        # Per-contact force = grad_ij * Volb_j * rho0_i * m_i * inv_dt *
        # (ksum_div + inv_dt * ksum_p).
        coef = R0 * ctx.M * inv_dt * (ksum_d + inv_dt * ksum_p)
        Fb = ctx.boundary_forces(coef) + np_Fb

        # --- unbin back to particle arrays (one packed row gather)
        new_pos, new_vel, new_dv, new_kd, new_kp = ctx.unbin_f_multi([
            (P2, fluids.positions),
            (V2, fluids.velocities),
            (DV, solver_state[:, :dim]),
            (ksum_d, solver_state[:, dim]),
            (ksum_p, solver_state[:, dim + 1]),
        ])
        new_state = jnp.concatenate(
            [new_dv, new_kd[:, None], new_kp[:, None]], axis=1
        )
        fluids = fluids.replace(positions=new_pos, velocities=new_vel)
        b_forces, b_volumes = ctx.unbin_b_multi([
            (Fb, boundaries.forces * 0.0),
            (ctx.Volb, boundaries.volumes),
        ])
        boundaries = boundaries.replace(
            forces=b_forces, volumes=b_volumes
        )

        from ..step import StepDiagnostics  # local import avoids a cycle

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
                pressure_iters=p_iters,
                pressure_error=p_err,
                divergence_iters=div_iters,
                divergence_error=div_err,
            ),
            ncontacts_ff=ncontacts_ff,
            ncontacts_fb=ncontacts_fb,
            neighbor_overflow=neighbor_overflow,
            candidate_overflow=candidate_overflow,
            max_density_ratio=max_rho,
            spill_overflow=jnp.asarray(ctx.spill_overflow, jnp.int32),
            spill_k_overflow=jnp.asarray(ctx.spill_k_overflow, jnp.int32),
        )
        return fluids, boundaries, new_state, diag

    return substep
