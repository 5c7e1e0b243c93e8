"""Decompose the faucet3 per-step device cost (VERDICT r4 #6 follow-up):
full step vs forces-off vs iters-0, on the scene's exact world state
after warmup. Identifies whether the remaining floor is the XLA force
folds over the vacuum grid, the solver iterations, or the fixed
binning/elementwise cost.

Usage: [bench env] python tools/exp_faucet_stages.py [steps_warmup]
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

from salva_tpu import scenes  # noqa: E402
from salva_tpu.config import DFSPHConfig  # noqa: E402
from salva_tpu.step import get_jitted_step_fn  # noqa: E402


def timed(label, world, solver_cfg=None, force_set="keep", reps=10,
          use_pallas=None):
    sim = world._boundary_volume_mode(world._effective_sim(), None)
    sim = sim.replace(recompute_boundary_volumes=False)
    if use_pallas is not None:
        sim = sim.replace(use_pallas=use_pallas)
    cfg = solver_cfg if solver_cfg is not None else world.solver_config
    fs = world._force_set if force_set == "keep" else force_set
    fn = get_jitted_step_fn(sim, cfg, fs, max(world.num_fluids, 1))
    args = lambda: (world.fluids_state, world.boundaries_state,  # noqa: E731
                    world._solver_state, None, jnp.float32(1.0 / 200.0),
                    jnp.asarray([0.0, -9.81, 0.0], jnp.float32))
    out = fn(*args())
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args())
    float(jnp.sum(out[0].positions))
    dt_ms = (time.perf_counter() - t0) / reps * 1e3
    d = out[3]
    print(f"{label:40s} {dt_ms:8.2f} ms/step  "
          f"(p={int(d.solver.pressure_iters)} "
          f"d={int(d.solver.divergence_iters)})", flush=True)
    return dt_ms


def main():
    warm = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    sc = scenes.faucet3()
    scenes.run(sc, warm)
    world = sc.world
    n = int(np.asarray(world.fluids_state.alive).sum())
    sim = world._effective_sim()
    print(f"alive={n} cap={sim.dense_cap} use_pallas={sim.use_pallas} "
          f"fb_cols={sim.dense_fb_columns}", flush=True)

    timed("full (auto-pallas)", world)
    timed("full (pallas off)", world, use_pallas=False)
    timed("forces off", world, force_set=())
    timed("forces off + iters 0/0", world, force_set=(), solver_cfg=DFSPHConfig(
        max_pressure_iter=0, max_divergence_iter=0,
        min_pressure_iter=0, min_divergence_iter=0))
    timed("iters 0/0 (forces on)", world, solver_cfg=DFSPHConfig(
        max_pressure_iter=0, max_divergence_iter=0,
        min_pressure_iter=0, min_divergence_iter=0))


if __name__ == "__main__":
    main()
