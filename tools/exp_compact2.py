"""Step-level A/B: full-grid rolls (current default) vs compact active
cells with a RIGHT-SIZED table (max_active ~ occupied cells), post
gather-binning (grid_src). Also prints measured occupied-cell counts at
the bench state, which set the right table size.

Usage: [bench env] python tools/exp_compact2.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import build_world, run_to_impact, timed_step  # noqa: E402


def occupied_cells(world):
    from salva_tpu.geometry import dense_grid as dg
    from salva_tpu.step import _dense_config

    sim = world._effective_sim()
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state

    @jax.jit
    def count(fluids, boundaries):
        outs = []
        for spec, st in ((spec_f, fluids), (spec_b, boundaries)):
            cell, _ = dg.cell_of(spec, st.positions)
            key = jnp.where(st.alive, cell, jnp.int32(spec.num_cells))
            sk = jnp.sort(key)
            is_first = jnp.concatenate(
                [jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & (
                sk < spec.num_cells)
            outs.append(jnp.sum(is_first.astype(jnp.int32)))
        return outs

    cf, cb = count(fl, bd)
    return int(cf), int(cb), spec_f, spec_b, fl, bd


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000

    world = build_world(n_target)
    run_to_impact(world)
    cf, cb, spec_f, spec_b, fl, bd = occupied_cells(world)
    print(f"N={int(np.asarray(fl.alive).sum())} cells={spec_f.num_cells} "
          f"occupied_f={cf} occupied_b={cb} "
          f"caps=({spec_f.cap},{spec_b.cap})", flush=True)

    base = timed_step("full-grid rolls (default)", world)

    # Right-sized ratios: occupied * 1.3 slack over the particle capacity.
    rf = min(1.0, cf * 1.3 / fl.capacity)
    rb = min(1.0, cb * 1.3 / max(bd.capacity, 1))
    w2 = build_world(n_target, dense_compact=True,
                     dense_active_ratio=rf, dense_active_ratio_boundary=rb)
    run_to_impact(w2, 10)
    timed_step(f"compact right-sized (A_f~{int(fl.capacity*rf)})", w2)

    # Compact at the CURRENT oversized default, for reference.
    w3 = build_world(n_target, dense_compact=True)
    run_to_impact(w3, 10)
    timed_step("compact ratio=0.25 (oversized)", w3)

    print(f"baseline: {base:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
