"""A/B the occupancy-skipping Pallas pair kernels vs the XLA roll folds
at the real bench state (97k dam break at impact, fitted window).

In-process jitted variants at a frozen state, min-of-rounds timing with
value-fetch fencing (the only trustworthy comparison through the
tunnel). Reports t_pass / k_pass / ff hoist / fb hoist and the full
iters-0 step + a 6-iteration step for both paths.

Usage: [bench env] python tools/exp_pallas_ab.py [N] [tile]
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
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from salva_tpu.ops import (
        hoist_fb_pallas,
        hoist_ff_pallas,
        k_pass_pallas,
        t_pass_pallas,
    )
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.step import _dense_config

    world = build_world(n_target)
    run_to_impact(world)
    sim = world._boundary_volume_mode(world._effective_sim(), None)
    # Pin the XLA dispatch (the auto threshold would flip ctx passes to
    # the Pallas kernels at large windows).
    sim = sim.replace(recompute_boundary_volumes=False, use_pallas=False)
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    n = int(np.asarray(fl.alive).sum())

    # Build the ctx once outside jit to read occupancy stats.
    ctx0 = DenseCtx(sim, spec_f, spec_b, fl, bd, need_s2=False)
    from salva_tpu.ops.pallas_pair import _halo, _occupancy

    c = ctx0.M.shape[-1]
    cp = -(-c // tile) * tile
    occ = _occupancy(ctx0.M, c, cp, tile)
    print(f"N={n} cells={c} tile={tile} occupied_tiles="
          f"{int(occ.sum())}/{len(occ)} halo={_halo(spec_f)}", flush=True)

    def variants():
        def xla_t(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            return jnp.sum(ctx.t_pass(ctx.V))

        def pal_t(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            return jnp.sum(t_pass_pallas(
                spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P, ctx.M,
                ctx.V, tile=tile))

        def xla_k(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            return jnp.sum(ctx.k_pass(ctx.rho * 1e-6))

        def pal_k(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            return jnp.sum(k_pass_pallas(
                spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P, ctx.M,
                ctx.rho * 1e-6, tile=tile))

        def pal_hoist_ff(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            outs = hoist_ff_pallas(
                spec_f, sim.h, sim.dim, sim.kernel_density,
                sim.kernel_gradient, ctx.P, ctx.M, need_s2=False,
                tile=tile)
            return sum(jnp.sum(o) for o in outs[:3])

        def pal_hoist_fb(fluids, boundaries):
            ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                           need_s2=False)
            pb = ctx._Pb_full if ctx.sparse_b else ctx.Pb
            volb = ctx._Volb_full if ctx.sparse_b else ctx.Volb
            vb = ctx._Vbvel_full if ctx.sparse_b else ctx.Vbvel
            outs = hoist_fb_pallas(
                spec_f, pb.shape[-2], sim.h, sim.dim, sim.kernel_density,
                sim.kernel_gradient, ctx.P, ctx.M, pb, volb, vb,
                need_s2=False, tile=tile)
            return sum(jnp.sum(o) for o in outs[:3])

        return [
            ("XLA t_pass (ctx shared)", xla_t),
            ("PAL t_pass", pal_t),
            ("XLA k_pass", xla_k),
            ("PAL k_pass", pal_k),
            ("PAL hoist_ff", pal_hoist_ff),
            ("PAL hoist_fb", pal_hoist_fb),
        ]

    progs = [(name, jax.jit(fn)) for name, fn in variants()]

    # Correctness spot check (compiled, not interpret): pallas vs XLA.
    ctx = ctx0
    ref_t = np.asarray(ctx.t_pass(ctx.V))
    out_t = np.asarray(t_pass_pallas(
        spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P, ctx.M, ctx.V,
        tile=tile))
    dt_max = np.abs(ref_t - out_t).max()
    ref_k = np.asarray(ctx.k_pass(ctx.rho * 1e-6))
    out_k = np.asarray(k_pass_pallas(
        spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P, ctx.M,
        ctx.rho * 1e-6, tile=tile))
    dk_max = np.abs(ref_k - out_k).max()
    print(f"compiled parity: |t|max_diff={dt_max:.3e} "
          f"|k|max_diff={dk_max:.3e}", flush=True)

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
        print(f"{name:28s} {best[name]:8.2f} ms", flush=True)

    # Full-step A/B: default vs use_pallas at matched iteration counts.
    from profile_stages import timed_step

    world.sim = world.sim.replace(use_pallas=False)
    base = timed_step("step XLA (default)", world)
    world.sim = world.sim.replace(use_pallas=True)
    t = timed_step("step PALLAS", world)
    print(f"step: XLA {base:.1f} ms vs PALLAS {t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
