"""Measure grid occupancy structure at the bench's dam-break impact
window: how much of the pair-pass work is empty-cell padding, and what a
fluid-extent-fitted grid box would save.

Usage: python tools/exp_occupancy.py [N] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from profile_stages import build_world, run_to_impact  # noqa: E402


def report(world, label):
    pos = np.asarray(world.fluids_state.positions)
    alive = np.asarray(world.fluids_state.alive)
    pos = pos[alive]
    h = world.h
    mins = np.asarray(world.sim.domain[0])
    maxs = np.asarray(world.sim.domain[1])
    origin = mins - 2 * h
    dims = np.ceil((maxs - origin) / h).astype(int) + 2
    c = np.floor((pos - origin) / h).astype(np.int64)
    key = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    uniq, counts = np.unique(key, return_counts=True)
    C = int(np.prod(dims))
    occ = len(uniq)
    lo = pos.min(axis=0)
    hi = pos.max(axis=0)
    fit_dims = np.ceil((hi - lo) / h).astype(int) + 4  # + ghost/margin
    fit_C = int(np.prod(fit_dims))
    print(
        f"[{label}] N={len(pos)} C={C} dims={tuple(dims)} "
        f"occupied={occ} ({occ / C:.1%}) "
        f"mean_occ={len(pos) / occ:.2f} max_occ={counts.max()} "
        f"p99_occ={np.percentile(counts, 99):.0f}\n"
        f"      fluid bbox {np.round(lo, 2)}..{np.round(hi, 2)} -> "
        f"fitted dims={tuple(fit_dims)} C_fit={fit_C} "
        f"(C_fit/C = {fit_C / C:.2f}; occupied/C_fit = {occ / fit_C:.1%})",
        flush=True,
    )


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    world = build_world(n_target)
    report(world, "initial")
    run_to_impact(world, steps)
    report(world, f"after {steps} steps")
    run_to_impact(world, 30)
    report(world, f"after {steps + 30} steps")


if __name__ == "__main__":
    main()
