"""Round-4 ladder breakdown of the dense step's FIXED cost on the
CURRENT full-grid path (dense_compact=False, sparse boundary remat,
uniform particles, gather-based binning) at the bench state.

profile_stages measured iters-0/0 at 64.7 ms/step at 97k — 60% of the
step — while Pallas-vs-XLA parity proved the pair passes are NOT the
cold bottleneck. Each rung below adds one stage of DenseCtx
construction + the substep tail, attributing that fixed cost.

Usage: [env as bench] python tools/exp_fixed4.py [N]
"""

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import build_world, run_to_impact  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    from salva_tpu.geometry import dense_grid as dg
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.step import _dense_config

    world = build_world(n_target)
    run_to_impact(world)
    sim = world._boundary_volume_mode(world._effective_sim(), None)
    sim = sim.replace(recompute_boundary_volumes=False)
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    ss = world._solver_state
    n = int(np.asarray(fl.alive).sum())
    nb_alive = int(np.asarray(bd.alive).sum())
    print(f"N={n} Nb={nb_alive} fitted={sim.fitted_dims} "
          f"caps=({spec_f.cap},{spec_b.cap}) "
          f"C={int(np.prod(sim.fitted_dims or spec_f.dims))}", flush=True)

    def fitted_origin(fluids):
        h = sim.h
        big = jnp.float32(1.0e30)
        lo = jnp.min(jnp.where(fluids.alive[:, None], fluids.positions, big),
                     axis=0)
        anchor = jnp.asarray(spec_f.origin, jnp.float32)
        mins = np.asarray(sim.domain[0], np.float64)
        maxs = np.asarray(sim.domain[1], np.float64)
        o0 = mins - 2 * h
        full_dims = np.maximum(np.ceil((maxs - o0) / h).astype(int) + 2, 3)
        max_shift = np.maximum(
            full_dims - np.asarray(spec_f.dims), 0).astype(np.float32)
        shift = jnp.clip(jnp.floor((lo - 2.0 * h - anchor) / h), 0.0,
                         jnp.asarray(max_shift))
        return anchor + shift * jnp.float32(h)

    a_b = max(64, min(spec_b.num_cells,
                      int(bd.capacity * sim.dense_active_ratio_boundary)))

    @jax.jit
    def f_binf(fluids, boundaries, ss):
        origin = fitted_origin(fluids)
        binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive,
                                origin=origin)
        return jnp.sum(binf.mask) + jnp.sum(binf.grid_src)

    @jax.jit
    def f_bins(fluids, boundaries, ss):
        origin = fitted_origin(fluids)
        binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive,
                                origin=origin)
        binb = dg.bin_particles_active(
            spec_b, a_b, boundaries.positions, boundaries.alive,
            cap=spec_b.cap, drop_clamped=True, origin=origin)
        return (jnp.sum(binf.mask) + jnp.sum(binf.grid_src)
                + jnp.sum(binb.mask) + jnp.sum(binb.grid_src))

    @jax.jit
    def f_grids(fluids, boundaries, ss):
        origin = fitted_origin(fluids)
        binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive,
                                origin=origin)
        binb = dg.bin_particles_active(
            spec_b, a_b, boundaries.positions, boundaries.alive,
            cap=spec_b.cap, drop_clamped=True, origin=origin)
        P, V = dg.to_grid_multi(spec_f, binf, [
            (fluids.positions, dg.POS_SENTINEL), (fluids.velocities, 0.0)])
        sb = dg.ActiveSpec(a_b + 1, spec_b.cap)
        Pb, Vb = dg.to_grid_multi(sb, binb, [
            (boundaries.positions, dg.POS_SENTINEL),
            (boundaries.velocities, 0.0)])
        return (jnp.sum(P) + jnp.sum(V) + jnp.sum(Pb) + jnp.sum(Vb)
                + jnp.sum(binf.mask))

    @jax.jit
    def f_grids_sg(fluids, boundaries, ss):
        origin = fitted_origin(fluids)
        binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive,
                                origin=origin)
        binb = dg.bin_particles_active(
            spec_b, a_b, boundaries.positions, boundaries.alive,
            cap=spec_b.cap, drop_clamped=True, origin=origin)
        P, V = dg.to_grid_multi(spec_f, binf, [
            (fluids.positions, dg.POS_SENTINEL), (fluids.velocities, 0.0)])
        sb = dg.ActiveSpec(a_b + 1, spec_b.cap)
        Pb, Vb = dg.to_grid_multi(sb, binb, [
            (boundaries.positions, dg.POS_SENTINEL),
            (boundaries.velocities, 0.0)])
        (SG,) = dg.to_grid_multi(spec_f, binf, [(ss, 0.0)])
        return (jnp.sum(P) + jnp.sum(V) + jnp.sum(Pb) + jnp.sum(Vb)
                + jnp.sum(SG))

    @jax.jit
    def f_ctx(fluids, boundaries, ss):
        # Full DenseCtx: bins + grids + Volb read + sparse-b remat +
        # ff/fb hoists.
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(ctx.sq_mm)
                + jnp.sum(ctx.Sb) + jnp.sum(ctx.count))

    @jax.jit
    def f_ctx_sg(fluids, boundaries, ss):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        (SG,) = dg.to_grid_multi(ctx.sf, ctx.binf, [(ss, 0.0)])
        return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(ctx.sq_mm)
                + jnp.sum(ctx.Sb) + jnp.sum(SG))

    @jax.jit
    def f_ctx_tail(fluids, boundaries, ss):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        (SG,) = dg.to_grid_multi(ctx.sf, ctx.binf, [(ss, 0.0)])
        coef = ctx.R0 * ctx.M
        Fb = ctx.boundary_forces(coef)
        pos, vel, dv, kd, kp = ctx.unbin_f_multi([
            (ctx.P, fluids.positions), (ctx.V, fluids.velocities),
            (SG[:3], ss[:, :3]), (SG[3], ss[:, 3]), (SG[4], ss[:, 4])])
        bf, bv = ctx.unbin_b_multi([
            (Fb, boundaries.forces * 0.0), (ctx.Volb, boundaries.volumes)])
        return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(pos)
                + jnp.sum(vel) + jnp.sum(dv) + jnp.sum(kd) + jnp.sum(kp)
                + jnp.sum(bf) + jnp.sum(bv))

    from salva_tpu.config import DFSPHConfig
    from salva_tpu.step import get_jitted_step_fn

    step0_fn = get_jitted_step_fn(
        sim, DFSPHConfig(max_pressure_iter=0, max_divergence_iter=0,
                         min_pressure_iter=0, min_divergence_iter=0),
        world._force_set, 1)
    dtf = jnp.float32(1.0 / 200.0)
    grav = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)

    def f_step0(fluids, boundaries, ss):
        out = step0_fn(fluids, boundaries, ss, None, dtf, grav)
        return jnp.sum(out[0].positions)

    progs = [
        ("bin fluids (sort+ranks+grid_src)", f_binf),
        ("+ bin boundaries (compact)", f_bins),
        ("+ to_grid P/V/Pb/Vb", f_grids),
        ("+ SG solver-state grid", f_grids_sg),
        ("full DenseCtx (+Volb+remat+hoists)", f_ctx),
        ("DenseCtx + SG", f_ctx_sg),
        ("DenseCtx + bforces + unbin (tail)", f_ctx_tail),
        ("step fn iters 0/0", f_step0),
    ]
    for _, fn in progs:
        jax.block_until_ready(fn(fl, bd, ss))
    best = {name: float("inf") for name, _ in progs}
    reps = 10
    for _round in range(5):
        for name, fn in progs:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(fl, bd, ss)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / reps * 1e3
            best[name] = min(best[name], dt)
    for name, _ in progs:
        print(f"{name:38s} {best[name]:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
