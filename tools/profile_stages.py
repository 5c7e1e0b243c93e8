"""In-context stage breakdown of the dense DFSPH step on the current
backend: times full jitted step variants that disable stages, so each
delta is measured inside the real fused program (micro-benchmarks of
isolated passes over the tunnel are unreliable).

Variants: full | iters forced to ~1 | iters 0 (fixed cost only) |
cap sweep | compact indexing | frozen pairs.

Usage: python tools/profile_stages.py [N]
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


def build_world(n_target, cap=None, fit=True, **sim_over):
    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    n_side = max(2, round(n_target ** (1.0 / 3.0)))
    radius = 0.05
    half = n_side * radius
    wall = max(1.5 * half, half + 0.5)
    domain = ((-wall - 0.3, -0.4, -wall - 0.3),
              (wall + 0.3, 2.0 * half + 1.0, wall + 0.3))
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=224,
                                 query_chunk=65536),
        domain=domain, layout="dense", dense_cap=cap,
        dense_cap_boundary=None, fit_grid=fit,
    )
    if sim_over:
        world.sim = world.sim.replace(**sim_over)
    pos = cube_fluid((n_side,) * 3, radius)
    pos[:, 1] += half + radius
    vel = np.zeros_like(pos)
    vel[:, 1] = -2.0
    world.add_fluid(Fluid(pos, density0=1000.0, velocities=vel))
    box = shapes.Cuboid((wall, 0.1, wall))
    samples = shape_surface_sample(box, radius, 3)
    samples[:, 1] -= 0.1
    world.add_boundary(Boundary(samples))
    world._prepare()
    return world


def run_to_impact(world, steps=10):
    dt = 1.0 / 200.0
    for _ in range(steps):
        world.step(dt, (0.0, -9.81, 0.0))
    float(jnp.sum(world.fluids_state.positions))


def timed_step(label, world, solver_cfg=None, reps=10):
    from salva_tpu.step import get_jitted_step_fn

    sim = world._boundary_volume_mode(world._effective_sim(), None)
    # Post-warmup the boundary volumes are cached like bench.py measures.
    sim = sim.replace(recompute_boundary_volumes=False)
    cfg = solver_cfg if solver_cfg is not None else world.solver_config
    fn = get_jitted_step_fn(sim, cfg, world._force_set, 1)
    args = lambda: (world.fluids_state, world.boundaries_state,  # noqa: E731
                    world._solver_state, None, jnp.float32(1.0 / 200.0),
                    jnp.asarray([0.0, -9.81, 0.0], jnp.float32))
    out = fn(*args())
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args())
    float(jnp.sum(out[0].positions))  # fence with a value fetch
    dt_ms = (time.perf_counter() - t0) / reps * 1e3
    d = out[3]
    print(f"{label:38s} {dt_ms:8.2f} ms/step  "
          f"(p_iters={int(d.solver.pressure_iters)} "
          f"d_iters={int(d.solver.divergence_iters)} "
          f"overflow={int(d.neighbor_overflow)})", flush=True)
    return dt_ms


def main():
    """Variants are selected by the VARIANTS env (comma list) so a run
    through the slow remote-compile path only builds what it needs:
    full,iters,caps,compact,frozen,nofit (default: full,iters)."""
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    variants = set(
        os.environ.get("VARIANTS", "full,iters").split(",")
    )
    from salva_tpu.config import DFSPHConfig

    world = build_world(n_target)
    n = int(np.asarray(world.fluids_state.alive).sum())
    print(f"N={n} fitted={world._effective_sim().fitted_dims} "
          f"caps=({world._effective_sim().dense_cap},"
          f"{world._effective_sim().dense_cap_boundary})", flush=True)
    run_to_impact(world)

    full = timed_step("full", world)
    if "iters" in variants:
        timed_step("iters 1/1 (fixed + 2 passes)", world, DFSPHConfig(
            max_pressure_iter=1, max_divergence_iter=1,
            min_pressure_iter=1, min_divergence_iter=1))
        timed_step("iters 0/0 (fixed cost only)", world, DFSPHConfig(
            max_pressure_iter=0, max_divergence_iter=0,
            min_pressure_iter=0, min_divergence_iter=0))

    if "nofit" in variants:
        w = build_world(n_target, fit=False)
        run_to_impact(w, 3)
        timed_step("full unfitted grid", w)

    if "caps" in variants:
        for cap in (10, 12):
            w = build_world(n_target, cap=cap)
            run_to_impact(w, 3)
            timed_step(f"full cap={cap}", w)

    if "compact" in variants:
        w = build_world(n_target, dense_compact=True)
        run_to_impact(w, 3)
        timed_step("full compact", w)

    if "frozen" in variants:
        w = build_world(n_target, dense_frozen_pairs=True)
        run_to_impact(w, 3)
        timed_step("full frozen f32", w)

        w = build_world(n_target, dense_frozen_pairs=True,
                        dense_pair_dtype="bfloat16")
        run_to_impact(w, 3)
        timed_step("full frozen bf16", w)

    print(f"baseline full: {full:.1f} ms/step -> "
          f"{n / full * 1000:.0f} particle-steps/s", flush=True)


if __name__ == "__main__":
    main()
