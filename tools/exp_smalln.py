"""Profile the small-N per-step floor (VERDICT r4 #6): faucet3 runs
~580 ms/step for ~300 particles; the reference runs it sub-ms on CPU.

Decomposes the per-step wall time into host dispatch vs device compute
(Counters), prints the effective grid/cap the scene resolves to, and
times the component host calls of the faucet callback (delete_where /
emit_particles) separately.

Usage: [bench env] python tools/exp_smalln.py [scene] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from salva_tpu import scenes  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "faucet3"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sc = getattr(scenes, name)()
    world = sc.world
    world.counters.enable()

    t0 = time.perf_counter()
    scenes.run(sc, 30)
    print(f"warmup 30 steps: {(time.perf_counter() - t0) / 30 * 1e3:.1f} "
          f"ms/step (includes compiles)", flush=True)

    sim = world._effective_sim()
    cells = None
    if sim.fitted_dims is not None:
        cells = int(np.prod(sim.fitted_dims))
    alive = int(np.asarray(world.fluids_state.alive).sum())
    print(f"scene={name} alive={alive} layout={sim.layout} "
          f"cap={sim.dense_cap} fitted={sim.fitted_dims} cells={cells} "
          f"capacity={world.fluids_state.capacity}", flush=True)

    for phase in range(3):
        world.counters.reset()
        # counters.reset() zeroes per-step timers each step; accumulate
        # manually across the window instead.
        tot = {"wall": 0.0, "dispatch": 0.0, "fetch": 0.0, "cb": 0.0,
               "bupd": 0.0, "ctrans": 0.0}
        for i in range(steps):
            t0 = time.perf_counter()
            if sc.callback is not None:
                tcb = time.perf_counter()
                sc.callback(sc, i, i * sc.dt)
                tot["cb"] += time.perf_counter() - tcb
            world.counters.reset()
            sc.step()
            tot["wall"] += time.perf_counter() - t0
            tot["dispatch"] += world.counters.dispatch_time.time
            tot["fetch"] += world.counters.fetch_time.time
            tot["bupd"] += world.counters.cd.boundary_update_time.time
            tot["ctrans"] += world.counters.coupling_transmit_time.time
        k = 1e3 / steps
        print(
            f"phase {phase}: wall {tot['wall'] * k:.1f} ms/step | "
            f"callback {tot['cb'] * k:.1f} | dispatch "
            f"{tot['dispatch'] * k:.1f} | boundary_upd "
            f"{tot['bupd'] * k:.1f} | transmit {tot['ctrans'] * k:.1f} | "
            f"fetch(sync) {tot['fetch'] * k:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
