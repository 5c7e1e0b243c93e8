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
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import DFSPHConfig, SimConfig
from ..geometry import dense_grid as dg
from ..kernels import get_kernel
from ..object.state import BoundariesState, FluidsState
from .common import SolverDiagnostics

EPSILON = float(jnp.finfo(jnp.float32).eps)


def _pair_fold(spec_j: dg.DenseGridSpec, dim: int, h, pos_i, mask_i,
               pos_j, mask_j, j_arrays: Dict, body, init):
    """Fold ``body`` over all 3^dim shifted pair blocks.

    - ``pos_i`` [D, cap_i, C] / ``mask_i`` [cap_i, C]: the owner side;
    - ``pos_j`` [D, cap_j, C] / ``mask_j`` [cap_j, C]: the neighbor side,
      shifted by each offset (both sides may be the same set);
    - ``j_arrays``: extra neighbor-side grids (dict of [..., cap_j, C]);
    - ``body(acc, dpos, r2, within, j) -> acc`` with
      dpos: list of D arrays [cap_i, cap_j, C]; within: bool mask.
    """
    acc = init
    h2 = h * h
    for off in dg.neighbor_offsets(dim):
        pj = dg.shift_j(spec_j, pos_j, off)
        mj = dg.shift_j(spec_j, mask_j, off)
        j = {k: dg.shift_j(spec_j, v, off) for k, v in j_arrays.items()}
        dpos = [
            pos_i[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
        ]
        r2 = dpos[0] * dpos[0]
        for d in range(1, dim):
            r2 = r2 + dpos[d] * dpos[d]
        within = (
            (r2 <= h2)
            & (mask_i[:, None, :] > 0)
            & (mj[None, :, :] > 0)
        )
        acc = body(acc, dpos, r2, within, j)
    return acc


def _w_dwr(r2, h, dim, w_fn, dw_fn):
    """(W, dW/dr / r) with the r ~ 0 gradient cutoff (`kernel.rs:19-26`)."""
    r = jnp.sqrt(r2)
    w = w_fn(r, h, dim)
    safe_r = jnp.where(r > EPSILON, r, 1.0)
    dwr = jnp.where(r > EPSILON, dw_fn(r, h, dim) / safe_r, 0.0)
    return w, dwr


def per_fluid_mean_max_grid(values, fid, mask, num_fluids: int):
    """`per_fluid_mean_max` on grid layout (static loop over fluids)."""
    err = jnp.zeros((), jnp.float32)
    live = mask > 0
    for f in range(num_fluids):
        sel = live & (fid == f)
        s = jnp.sum(jnp.where(sel, values, 0.0))
        cnt = jnp.sum(sel.astype(jnp.float32))
        err = jnp.maximum(err, jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0))
    return err


def build_dense_substep(sim: SimConfig, cfg: DFSPHConfig, num_fluids: int,
                        spec_f: dg.DenseGridSpec, spec_b: dg.DenseGridSpec,
                        dense_forces=()):
    """Build the dense-layout DFSPH substep.

    ``dense_forces``: tuple of dense-layout non-pressure force objects with
    ``apply(fields) -> accel [D, capf, C]`` (see ``forces_dense.py``).
    """
    h = sim.h
    dim = sim.dim
    kd_w, kd_dw = get_kernel(sim.kernel_density)
    kg_w, kg_dw = get_kernel(sim.kernel_gradient)
    min_nb = cfg.min_neighbors(dim)

    def substep(fluids: FluidsState, boundaries: BoundariesState,
                velocity_changes, es, dt, gravity):
        del es  # elasticity is gather-path only for now
        dt = jnp.asarray(dt, jnp.float32)
        inv_dt = jnp.where(dt > 0, 1.0 / dt, 0.0)
        boundaries = boundaries.clear_forces()

        binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive)
        binb = dg.bin_particles(spec_b, boundaries.positions, boundaries.alive)

        P = dg.to_grid(spec_f, binf, fluids.positions)
        V = dg.to_grid(spec_f, binf, fluids.velocities)
        M = dg.to_grid(spec_f, binf, fluids.masses)
        R0 = dg.to_grid(spec_f, binf, fluids.density0, fill=1.0)
        FID = dg.to_grid(spec_f, binf, fluids.fluid_id, fill=-1)
        DV = dg.to_grid(spec_f, binf, velocity_changes)
        maskf = binf.mask

        Pb = dg.to_grid(spec_b, binb, boundaries.positions)
        Vb = dg.to_grid(spec_b, binb, boundaries.velocities)
        maskb = binb.mask

        # --- boundary volumes: V_b = 1 / sum W_bb (`dfsph_solver.rs:72-96`)
        def bb_body(acc, dpos, r2, within, j):
            w, _ = _w_dwr(r2, h, dim, kd_w, kd_dw)
            return acc + jnp.sum(jnp.where(within, w, 0.0), axis=1)

        wsum_b = _pair_fold(
            spec_b, dim, h, Pb, maskb, Pb, maskb, {}, bb_body,
            jnp.zeros_like(maskb),
        )
        Volb = jnp.where((wsum_b > 0) & (maskb > 0), 1.0 / jnp.where(wsum_b > 0, wsum_b, 1.0), 0.0)

        # --- hoisted ff pass: density, grad-sum, grad-norm, count
        def ff_hoist(acc, dpos, r2, within, j):
            rho, gf, sq, cnt = acc
            w, dwr = _w_dwr(r2, h, dim, kg_w, kg_dw)
            wd, _ = _w_dwr(r2, h, dim, kd_w, kd_dw)
            mj = jnp.where(within, j["m"][None, :, :], 0.0)
            rho = rho + jnp.sum(mj * wd, axis=1)
            gsq = jnp.zeros_like(r2)
            gf_new = []
            for d in range(dim):
                g_d = dpos[d] * dwr * mj  # m_j * grad_d
                gf_new.append(gf[d] + jnp.sum(g_d, axis=1))
                gsq = gsq + g_d * g_d
            sq = sq + jnp.sum(gsq, axis=1)
            cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
            return rho, jnp.stack(gf_new), sq, cnt

        rho_ff, Gf, sq_ff, cnt_ff = _pair_fold(
            spec_f, dim, h, P, maskf, P, maskf, {"m": M}, ff_hoist,
            (
                jnp.zeros_like(maskf),
                jnp.zeros_like(P),
                jnp.zeros_like(maskf),
                jnp.zeros_like(maskf, dtype=jnp.int32),
            ),
        )

        # --- hoisted fb pass (j = boundary): raw sums carrying Volb_j;
        # the i-side rho0 factor of fb_mass = Volb_j * rho0_i multiplies in
        # afterwards (`common.py fb_mass_j`).
        def fb_hoist(acc, dpos, r2, within, j):
            rho, gb, sq, sb, cnt = acc
            w, dwr = _w_dwr(r2, h, dim, kg_w, kg_dw)
            wd, _ = _w_dwr(r2, h, dim, kd_w, kd_dw)
            vj = jnp.where(within, j["vol"][None, :, :], 0.0)
            rho = rho + jnp.sum(vj * wd, axis=1)
            gsq = jnp.zeros_like(r2)
            vdotg = jnp.zeros_like(r2)
            gb_new = []
            for d in range(dim):
                g_d = dpos[d] * dwr * vj  # Volb_j * grad_d
                gb_new.append(gb[d] + jnp.sum(g_d, axis=1))
                gsq = gsq + g_d * g_d
                vdotg = vdotg + j["vb"][d][None, :, :] * g_d
            sq = sq + jnp.sum(gsq, axis=1)
            sb = sb + jnp.sum(vdotg, axis=1)
            cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
            return rho, jnp.stack(gb_new), sq, sb, cnt

        rho_fb_raw, Gb_raw, sq_fb_raw, Sb_raw, cnt_fb = _pair_fold(
            spec_f, dim, h, P, maskf, Pb, maskb, {"vol": Volb, "vb": Vb},
            fb_hoist,
            (
                jnp.zeros_like(maskf),
                jnp.zeros((dim,) + maskf.shape, jnp.float32),
                jnp.zeros_like(maskf),
                jnp.zeros_like(maskf),
                jnp.zeros_like(maskf, dtype=jnp.int32),
            ),
        )

        live = maskf > 0
        rho = jnp.where(live, rho_ff + R0 * rho_fb_raw, R0)
        Gb = R0[None] * Gb_raw
        Sb = R0 * Sb_raw
        Gsum = Gf + Gb
        denom = sq_ff + R0 * R0 * sq_fb_raw + jnp.sum(Gsum * Gsum, axis=0)
        alpha = jnp.where(denom <= 1.0e-5, 0.0,
                          1.0 / jnp.where(denom == 0, 1.0, denom))
        count = cnt_ff + cnt_fb

        # --- per-iteration pair pass: T_i = sum_j m_j v_j' . grad_ij
        def t_pass(Vj):
            def body(acc, dpos, r2, within, j):
                _, dwr = _w_dwr(r2, h, dim, kg_w, kg_dw)
                mj = jnp.where(within, j["m"][None, :, :], 0.0)
                t = jnp.zeros_like(r2)
                for d in range(dim):
                    t = t + j["v"][d][None, :, :] * dpos[d]
                return acc + jnp.sum(t * dwr * mj, axis=1)

            return _pair_fold(
                spec_f, dim, h, P, maskf, P, maskf, {"m": M, "v": Vj},
                body, jnp.zeros_like(maskf),
            )

        # --- per-iteration pair pass: K_i = sum_j k_j m_j grad_ij
        def k_pass(Kj):
            def body(acc, dpos, r2, within, j):
                _, dwr = _w_dwr(r2, h, dim, kg_w, kg_dw)
                coeff = jnp.where(within, j["k"][None, :, :] * j["m"][None, :, :], 0.0)
                return jnp.stack(
                    [acc[d] + jnp.sum(dpos[d] * dwr * coeff, axis=1)
                     for d in range(dim)]
                )

            return _pair_fold(
                spec_f, dim, h, P, maskf, P, maskf, {"m": M, "k": Kj},
                body, jnp.zeros_like(P),
            )

        def delta_density_with(vbase, dv_grid):
            """sum m_j (v_i'-v_j').grad + boundary term via hoisted sums."""
            vp = vbase + dv_grid
            t = t_pass(vp)
            return jnp.sum(vp * Gsum, axis=0) - t - Sb

        # --- divergence solve (`dfsph_solver.rs:466-503`)
        max_div_err = cfg.max_divergence_error * inv_dt * 0.01

        def div_body(carry):
            i, dv, ksum, _, _ = carry
            delta = delta_density_with(V, dv)
            enough = count >= min_nb
            div = jnp.where(enough & live, jnp.maximum(delta, 0.0), 0.0)
            err = per_fluid_mean_max_grid(div / R0, FID, maskf, num_fluids)
            converged = (err <= max_div_err) & (i >= cfg.min_divergence_iter)

            def update(args):
                dv, ksum = args
                ki = div * alpha
                kf = k_pass(ki)
                dv = dv - (ki[None] * Gsum + kf)
                return dv, ksum + ki

            dv, ksum = jax.lax.cond(converged, lambda a: a, update, (dv, ksum))
            return i + 1, dv, ksum, err, converged

        def div_cond(carry):
            i, _, _, _, done = carry
            return (i < cfg.max_divergence_iter) & jnp.logical_not(done)

        div_iters, DV, ksum_d, div_err, _ = jax.lax.while_loop(
            div_cond, div_body,
            (jnp.zeros((), jnp.int32), DV, jnp.zeros_like(maskf),
             jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
        )

        # Commit velocities; reset velocity changes (`:688-691`).
        V2 = V + DV * maskf[None]
        DV = jnp.zeros_like(DV)

        # predict_advection: gravity + non-pressure forces (`:565-604`).
        A = jnp.asarray(gravity, jnp.float32).reshape(dim, 1, 1) * maskf[None]
        np_Fb = jnp.zeros_like(Pb)
        if dense_forces:
            from .forces_dense import DenseFields

            VOLg = dg.to_grid(spec_f, binf, fluids.volumes)
            fields = DenseFields(
                spec_f=spec_f, spec_b=spec_b, P=P, V=V2, M=M, VOL=VOLg,
                R0=R0, RHO=rho, FID=FID, maskf=maskf, Pb=Pb, Vbvel=Vb,
                Volb=Volb, maskb=maskb, h=h, dim=dim, inv_dt=inv_dt,
                kernel_density=sim.kernel_density,
                kernel_gradient=sim.kernel_gradient,
            )
            for force in dense_forces:
                a_d, fb_d = force.apply(fields)
                A = A + a_d * maskf[None]
                if fb_d is not None:
                    np_Fb = np_Fb + fb_d
        DV = DV + A * dt

        # --- pressure solve (`dfsph_solver.rs:432-464`)
        def p_body(carry):
            i, dv, ksum, _, _ = carry
            vp_delta = delta_density_with(V2, dv)
            predicted = rho + vp_delta * dt
            err_i = jnp.where(predicted < R0, 0.0, predicted / R0 - 1.0)
            err = per_fluid_mean_max_grid(err_i, FID, maskf, num_fluids)
            converged = (err <= cfg.max_density_error) & (i >= cfg.min_pressure_iter)

            def update(args):
                dv, ksum = args
                ki = (predicted - R0) * alpha
                ki_p = jnp.maximum(ki, 0.0)
                kf = k_pass(ki_p)
                dv = dv - (ki_p[None] * Gsum + kf) * inv_dt
                return dv, ksum + ki_p

            dv, ksum = jax.lax.cond(converged, lambda a: a, update, (dv, ksum))
            return i + 1, dv, ksum, err, converged

        def p_cond(carry):
            i, _, _, _, done = carry
            return (i < cfg.max_pressure_iter) & jnp.logical_not(done)

        p_iters, DV, ksum_p, p_err, _ = jax.lax.while_loop(
            p_cond, p_body,
            (jnp.zeros((), jnp.int32), DV, jnp.zeros_like(maskf),
             jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
        )

        # --- positions (`:411-420`)
        P2 = P + (V2 + DV) * (dt * maskf[None])

        # --- boundary force feedback: one boundary-owner pair pass.
        # Per-contact force = grad_ij * Volb_j * rho0_i * m_i * inv_dt *
        # (ksum_div + inv_dt * ksum_p); grad w.r.t. the fluid point i.
        coef = R0 * M * inv_dt * (ksum_d + inv_dt * ksum_p)

        def bf_body(acc, dpos, r2, within, j):
            _, dwr = _w_dwr(r2, h, dim, kg_w, kg_dw)
            c = jnp.where(within, j["coef"][None, :, :], 0.0)
            # dpos = p_b - p_i here; grad_ij = -dir(dpos)*dw.
            return jnp.stack(
                [acc[d] - jnp.sum(dpos[d] * dwr * c, axis=1)
                 for d in range(dim)]
            )

        Fb = _pair_fold(
            spec_b, dim, h, Pb, maskb, P, maskf, {"coef": coef}, bf_body,
            jnp.zeros_like(Pb),
        )
        Fb = Volb[None] * Fb + np_Fb

        # --- unbin back to particle arrays
        def unbin_vec(grid, fallback):
            out = dg.from_grid(spec_f, binf, grid, 0.0)
            return jnp.where(binf.in_grid[:, None], out, fallback)

        new_pos = unbin_vec(P2, fluids.positions)
        new_vel = unbin_vec(V2, fluids.velocities)
        new_dv = unbin_vec(DV, velocity_changes)
        fluids = fluids.replace(positions=new_pos, velocities=new_vel)

        bforce = dg.from_grid(spec_b, binb, Fb, 0.0)
        bforce = jnp.where(binb.in_grid[:, None], bforce, 0.0)
        boundaries = boundaries.replace(forces=bforce)

        from ..step import StepDiagnostics  # local import to avoid cycle

        diag = StepDiagnostics(
            solver=SolverDiagnostics(
                pressure_iters=p_iters,
                pressure_error=p_err,
                divergence_iters=div_iters,
                divergence_error=div_err,
            ),
            ncontacts_ff=jnp.sum(jnp.where(live, cnt_ff, 0)),
            ncontacts_fb=jnp.sum(jnp.where(live, cnt_fb, 0)),
            neighbor_overflow=binf.overflow + binb.overflow,
            candidate_overflow=binf.clamped + binb.clamped,
            max_density_ratio=jnp.max(
                jnp.where(live, rho / R0, 0.0), initial=0.0
            ),
        )
        return fluids, boundaries, new_dv, diag

    return substep
