"""Spill-structure sizing probe: occupancy DISTRIBUTION over a dam break.

The dense+spill pair structure (DESIGN.md round-5 plan) keeps the main
grid at a small cap and routes particles beyond that rank through a
compact spill table. Its cost model needs, over the whole trajectory:

- ``cells>cap1``: columns that would appear in the spill table (A2);
- ``spill``: particles with rank >= cap1 (spill slot occupancy);
- ``adj>cap1``: cells within one cell of a spill cell (the G-mirror
  gathered-pass table size, fb-sparse style);
- worst per-cell occupancy (cap1 + cap2 safety).

Usage: python tools/exp_spill.py [N] [steps] [sample_every]
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

from exp_maxocc import build_world_wide  # noqa: E402

CAPS = (8, 10, 12)


def cell_stats(world):
    pos = np.asarray(world.fluids_state.positions)
    alive = np.asarray(world.fluids_state.alive)
    pos = pos[alive]
    h = world.h
    c = np.floor(pos / h).astype(np.int64)
    c -= c.min(axis=0)
    dims = c.max(axis=0) + 1
    key = c[:, 0]
    for axis in range(1, world.dim):
        key = key * dims[axis] + c[:, axis]
    uniq, counts = np.unique(key, return_counts=True)
    out = {"occ_max": int(counts.max()), "cells": len(uniq)}
    # cell coordinates of each unique occupied cell, for adjacency
    cc = np.stack(np.unravel_index(uniq, dims), axis=-1)
    for cap1 in CAPS:
        over = counts > cap1
        n_over = int(over.sum())
        out[f"cells>{cap1}"] = n_over
        out[f"spill{cap1}"] = int(np.maximum(counts - cap1, 0).sum())
        if n_over:
            # dilate the over-set by one cell each axis; count occupied
            # cells in the dilated set (the gathered G-mirror table)
            over_set = set(map(tuple, cc[over]))
            adj = set()
            for cell in cc[over]:
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            adj.add((cell[0] + dx, cell[1] + dy,
                                     cell[2] + dz))
            occ_set = set(map(tuple, cc))
            out[f"adj>{cap1}"] = len(adj & occ_set)
            del over_set
        else:
            out[f"adj>{cap1}"] = 0
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    world = build_world_wide(n_target)
    # Pin the plain 16 tier: the probe MEASURES the occupancy
    # distribution to size the spill structure — running it through the
    # auto 12+spill tier would trigger growth recompiles mid-probe.
    world._dense_cap_request = 16
    dt = 1.0 / 200.0
    worst = {}
    for s in range(steps):
        world.step(dt, (0.0, -9.81, 0.0))
        if (s + 1) % every == 0:
            st = cell_stats(world)
            for k, v in st.items():
                worst[k] = max(worst.get(k, 0), v)
            print(f"step {s+1:4d} " + " ".join(
                f"{k}={v}" for k, v in st.items()), flush=True)
    print("WORST over trajectory:", worst)


if __name__ == "__main__":
    main()
