"""Sharded-binning scaling probe at >=100k particles on the 8-device CPU
mesh (VERDICT r2 #7): equivalence vs single-device + measured per-device
work (replicated-binning vs migration-binning wall clock at a frozen
state — on the host mesh every device is a CPU thread, so less
per-device work shows up directly as less wall clock).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/exp_sharded_100k.py [n_side]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 47
    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.parallel import make_mesh
    from salva_tpu.parallel.domain import (
        get_jitted_sharded_step_fn,
        shard_interleave,
    )
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.step import get_jitted_step_fn
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    radius = 0.05
    half = n_side * radius
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        neighbors=NeighborConfig(max_neighbors=48, max_candidates=192,
                                 query_chunk=16384),
        domain=((-half - 0.4, -0.5, -half - 0.4),
                (half + 0.4, 2.0 * half + 0.8, half + 0.4)),
        layout="dense", fit_grid=False,
    )
    pos = cube_fluid((n_side,) * 3, radius)
    pos[:, 1] += 0.45
    world.add_fluid(Fluid(pos, density0=1000.0))
    box = shapes.Cuboid((half + 0.2, 0.1, half + 0.2))
    world.add_boundary(Boundary(shape_surface_sample(box, radius, 3)))
    world._prepare()
    n = int(np.asarray(world.fluids_state.alive).sum())
    print(f"N={n} capacity={world.fluids_state.capacity}", flush=True)

    world.fluids_state = shard_interleave(world.fluids_state, 8)
    world.boundaries_state = shard_interleave(world.boundaries_state, 8)
    world._solver_state = shard_interleave(world._solver_state, 8)

    mesh = make_mesh(8, axis_name="x")
    t0 = time.perf_counter()
    mig = get_jitted_sharded_step_fn(
        world.sim, world.solver_config, world._force_set, 1, mesh,
        sharded_binning=True)
    repl = get_jitted_sharded_step_fn(
        world.sim, world.solver_config, world._force_set, 1, mesh)
    single = get_jitted_step_fn(
        world.sim, world.solver_config, world._force_set, 1)
    print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)

    dt = jnp.float32(1.0 / 200.0)
    grav = jnp.asarray([0.0, -9.81, 0.0], jnp.float32)

    def run(fn, tag):
        fl, bd, ss = (world.fluids_state, world.boundaries_state,
                      world._solver_state)
        t0 = time.perf_counter()
        for i in range(2):
            fl, bd, ss, diag = fn(fl, bd, ss, None, dt, grav)
            jax.block_until_ready(fl.positions)
            if i == 0:
                print(f"{tag}: first step (compile) "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                t1 = time.perf_counter()
        print(f"{tag}: warm step {time.perf_counter() - t1:.2f}s", flush=True)
        return fl, bd, diag

    fm, bm, dm = run(mig, "migration")
    fr, br, dr = run(repl, "replicated")
    f1, b1, d1 = run(single, "single")

    np.testing.assert_allclose(np.asarray(fm.positions),
                               np.asarray(f1.positions), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fm.positions),
                               np.asarray(fr.positions), atol=1e-6)
    assert int(dm.solver.pressure_iters) == int(d1.solver.pressure_iters)
    assert int(dm.ncontacts_ff) == int(d1.ncontacts_ff)
    print("equivalence ok", flush=True)


if __name__ == "__main__":
    main()
