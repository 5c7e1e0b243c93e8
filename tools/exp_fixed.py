"""Ladder breakdown of the dense step's FIXED cost (everything outside
the solver iterations) at the bench state: each rung is its own jitted
program adding one stage, timed in-process with value-fetch fencing.
Deltas between rungs attribute the iters-0 time (profile_stages.py) to
bin / neighbor-table / to_grid / hoist / tail stages.

Usage: [env as bench] python tools/exp_fixed.py [N]
"""

import os
import sys
import time

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
    n = int(np.asarray(fl.alive).sum())
    print(f"N={n} fitted={sim.fitted_dims} caps=({spec_f.cap},{spec_b.cap})",
          flush=True)

    a_f = max(256, min(spec_f.num_cells,
                       int(fl.capacity * sim.dense_active_ratio)))
    a_b = max(256, min(spec_b.num_cells,
                       int(bd.capacity * sim.dense_active_ratio_boundary)))

    def fitted_origin(fluids):
        h = sim.h
        big = jnp.float32(1.0e30)
        lo = jnp.min(jnp.where(fluids.alive[:, None], fluids.positions, big),
                     axis=0)
        anchor = jnp.asarray(spec_f.origin, jnp.float32)
        import numpy as _np
        mins = _np.asarray(sim.domain[0], _np.float64)
        maxs = _np.asarray(sim.domain[1], _np.float64)
        o0 = mins - 2 * h
        full_dims = _np.maximum(_np.ceil((maxs - o0) / h).astype(int) + 2, 3)
        max_shift = _np.maximum(
            full_dims - _np.asarray(spec_f.dims), 0).astype(_np.float32)
        shift = jnp.clip(jnp.floor((lo - 2.0 * h - anchor) / h), 0.0,
                         jnp.asarray(max_shift))
        return anchor + shift * jnp.float32(h)

    def bins(fluids, boundaries):
        origin = fitted_origin(fluids)
        binf = dg.bin_particles_active(
            spec_f, a_f, fluids.positions, fluids.alive, cap=spec_f.cap,
            origin=origin)
        binb = dg.bin_particles_active(
            spec_b, a_b, boundaries.positions, boundaries.alive,
            cap=spec_b.cap, drop_clamped=True, origin=origin)
        return binf, binb

    @jax.jit
    def f_bins(fluids, boundaries):
        binf, binb = bins(fluids, boundaries)
        return (jnp.sum(binf.mask) + jnp.sum(binb.mask)
                + jnp.sum(binf.grid_src) + jnp.sum(binb.grid_src))

    @jax.jit
    def f_tables(fluids, boundaries):
        binf, binb = bins(fluids, boundaries)
        nff = dg.neighbor_table(spec_f, binf.active_cells, binf.cell_to_active)
        nfb = dg.neighbor_table(spec_f, binf.active_cells, binb.cell_to_active)
        nbf = dg.neighbor_table(spec_f, binb.active_cells, binf.cell_to_active)
        nbb = dg.neighbor_table(spec_f, binb.active_cells, binb.cell_to_active)
        return (jnp.sum(binf.mask) + jnp.sum(binb.mask) + jnp.sum(nff)
                + jnp.sum(nfb) + jnp.sum(nbf) + jnp.sum(nbb))

    @jax.jit
    def f_grids(fluids, boundaries):
        binf, binb = bins(fluids, boundaries)
        sf = dg.ActiveSpec(a_f + 1, spec_f.cap)
        sb = dg.ActiveSpec(a_b + 1, spec_b.cap)
        P, V = dg.to_grid_multi(sf, binf, [
            (fluids.positions, dg.POS_SENTINEL), (fluids.velocities, 0.0)])
        Pb, Vb = dg.to_grid_multi(sb, binb, [
            (boundaries.positions, dg.POS_SENTINEL),
            (boundaries.velocities, 0.0)])
        Volb = dg.to_grid(sb, binb, boundaries.volumes)
        nff = dg.neighbor_table(spec_f, binf.active_cells, binf.cell_to_active)
        return (jnp.sum(P) + jnp.sum(V) + jnp.sum(Pb) + jnp.sum(Vb)
                + jnp.sum(Volb) + jnp.sum(nff))

    @jax.jit
    def f_ctx(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries, need_s2=False)
        return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(ctx.sq_mm)
                + jnp.sum(ctx.Sb) + jnp.sum(ctx.count))

    @jax.jit
    def f_ctx_t(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries, need_s2=False)
        t = ctx.t_pass(ctx.V)
        return jnp.sum(t) + jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum)

    @jax.jit
    def f_ctx_tail(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries, need_s2=False)
        coef = ctx.R0 * ctx.M
        Fb = ctx.boundary_forces(coef)
        pos, vel = ctx.unbin_f_multi([
            (ctx.P, fluids.positions), (ctx.V, fluids.velocities)])
        bf, bv = ctx.unbin_b_multi([
            (Fb, boundaries.forces * 0.0), (ctx.Volb, boundaries.volumes)])
        return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(pos)
                + jnp.sum(vel) + jnp.sum(bf) + jnp.sum(bv))

    from salva_tpu.step import get_jitted_step_fn
    from salva_tpu.config import DFSPHConfig

    step0_fn = get_jitted_step_fn(
        sim, DFSPHConfig(max_pressure_iter=0, max_divergence_iter=0,
                         min_pressure_iter=0, min_divergence_iter=0),
        world._force_set, 1)
    dtf = jnp.float32(1.0 / 200.0)
    grav = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)

    def f_step0(fluids, boundaries):
        out = step0_fn(fluids, boundaries, world._solver_state, None,
                       dtf, grav)
        return jnp.sum(out[0].positions)

    progs = [
        ("bins (sort+ranks+grid_src) x2", f_bins),
        ("bins + 4 neighbor tables", f_tables),
        ("bins + tables + to_grid", f_grids),
        ("full DenseCtx (+hoists)", f_ctx),
        ("DenseCtx + t_pass", f_ctx_t),
        ("DenseCtx + bforces + unbin", f_ctx_tail),
        ("step fn iters 0/0", f_step0),
    ]
    # Warm every program first, then ROUND-ROBIN timing rounds and keep
    # the per-program minimum — the tunnel's run-to-run noise (several
    # ms) otherwise swamps rung deltas.
    for _, fn in progs:
        jax.block_until_ready(fn(fl, bd))
    best = {name: float("inf") for name, _ in progs}
    reps = 10
    for _round in range(5):
        for name, fn in progs:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(fl, bd)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / reps * 1e3
            best[name] = min(best[name], dt)
    for name, _ in progs:
        print(f"{name:34s} {best[name]:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
