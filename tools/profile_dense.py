"""Per-component timing of the dense path on the current backend.

Times (a) DenseCtx construction (bin + grids + boundary volumes + hoists),
(b) one t_pass, (c) one k_pass, (d) bin+to_grid only, (e) full substep —
each as its own jitted function, fetched to force completion.

Usage: python tools/profile_dense.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 27000

    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.geometry import dense_grid as dgrid
    from salva_tpu.step import build_step_fn, get_jitted_step_fn
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    n_side = max(2, round(n_target ** (1.0 / 3.0)))
    radius = 0.05
    half = n_side * radius
    wall = 2.0 * half + 0.5
    domain = ((-wall - 0.3, -0.4, -wall - 0.3),
              (wall + 0.3, 2.0 * half + 1.0, wall + 0.3))
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        domain=domain, layout="dense", dense_cap_boundary=16,
    )
    pos = cube_fluid((n_side,) * 3, radius)
    pos[:, 1] += half + radius
    world.add_fluid(Fluid(pos, density0=1000.0))
    box = shapes.Cuboid((wall, 0.1, wall))
    samples = shape_surface_sample(box, radius, 3)
    samples[:, 1] -= 0.1
    world.add_boundary(Boundary(samples))
    world._prepare()

    sim = world._effective_sim()
    from salva_tpu.step import _dense_config

    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    print(f"N={int(np.asarray(fl.alive).sum())} capacity={fl.capacity} "
          f"cells={spec_f.num_cells} capf={spec_f.cap} capb={spec_b.cap}")

    def timed(name, fn, *args, reps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt * 1e3:8.2f} ms")
        return out

    @jax.jit
    def make_ctx_sums(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries)
        return (jnp.sum(ctx.rho), ctx.Gsum, ctx.P, ctx.M, ctx.maskf,
                ctx.Sb, ctx.sq_mm)

    @jax.jit
    def bin_only(fluids):
        binf = dgrid.bin_particles(spec_f, fluids.positions, fluids.alive)
        P = dgrid.to_grid(spec_f, binf, fluids.positions,
                          fill=dgrid.POS_SENTINEL)
        V = dgrid.to_grid(spec_f, binf, fluids.velocities)
        M = dgrid.to_grid(spec_f, binf, fluids.masses)
        return jnp.sum(P) + jnp.sum(V) + jnp.sum(M)

    timed("bin + to_grid (fluids)", bin_only, fl)
    out = timed("DenseCtx (all hoists)", make_ctx_sums, fl, bd)

    # Reconstruct a ctx host-side once to grab grids for the pass timings.
    ctx = DenseCtx(sim, spec_f, spec_b, fl, bd)
    V = ctx.V
    K = ctx.rho * 1e-6

    t_fn = jax.jit(lambda v: DenseCtx.t_pass(ctx, v))
    k_fn = jax.jit(lambda k: DenseCtx.k_pass(ctx, k))
    timed("t_pass (1 iteration half)", t_fn, V)
    timed("k_pass (1 iteration half)", k_fn, K)

    bf_fn = jax.jit(lambda c: DenseCtx.boundary_forces(ctx, c))
    timed("boundary_forces pass", bf_fn, K)

    step_fn = get_jitted_step_fn(sim, world.solver_config, world._force_set,
                                 1)
    dt = jnp.float32(1.0 / 200.0)
    g = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)

    def full(fluids, boundaries, ss):
        return step_fn(fluids, boundaries, ss, None, dt, g)

    timed("full substep", full, fl, bd, world._solver_state, reps=5)


if __name__ == "__main__":
    main()
