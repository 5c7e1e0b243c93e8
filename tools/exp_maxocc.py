"""Max cell occupancy over a LONG dam-break run (cap-tier safety).

The dense cap tier sets every pair block's [cap_i, cap_j] slot cost;
the 1M cap sweep measured cap 10 at 1.42x faster than cap 16 — but the
tier is only safe if the worst transient cell occupancy over the whole
trajectory (impact compression + splash) stays within it (overflow
drops particles; the world then auto-bumps + recompiles). This runs the
bench scene well past impact, sampling the host-side max-occupancy
probe every few steps.

Usage: python tools/exp_maxocc.py [N] [steps] [sample_every]
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

from profile_stages import build_world  # noqa: E402


def build_world_wide(n_target):
    """bench geometry but with a floor + domain wide/tall enough that a
    full collapse never clamps (clamped border-ring pile-up reads as
    fake occupancy: the first probe run measured occ up to 344 from
    escapees, drowning the physical signal)."""
    import jax.numpy as jnp
    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    n_side = max(2, round(n_target ** (1.0 / 3.0)))
    radius = 0.05
    half = n_side * radius
    wall = 4.0 * half  # wide enough for a full collapse
    domain = ((-wall - 0.3, -0.4, -wall - 0.3),
              (wall + 0.3, 3.0 * half + 1.0, wall + 0.3))
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=224,
                                 query_chunk=65536),
        domain=domain, layout="dense",
    )
    import numpy as np
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
    del jnp
    return world


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    wide = os.environ.get("MAXOCC_WIDE", "1") == "1"
    world = build_world_wide(n_target) if wide else build_world(n_target)
    dt = 1.0 / 200.0
    worst = 0
    hist = {}
    for s in range(steps):
        world.step(dt, (0.0, -9.81, 0.0))
        if (s + 1) % every == 0:
            occ = world._max_cell_occupancy(
                world.fluids_state.positions, world.fluids_state.alive
            )
            worst = max(worst, occ)
            hist[occ] = hist.get(occ, 0) + 1
            d = world.last_diagnostics
            print(f"step {s+1:4d} max_occ={occ:3d} worst={worst:3d} "
                  f"overflow={int(d.neighbor_overflow)} "
                  f"refits={world.grid_refit_count}", flush=True)
    print(f"WORST max cell occupancy over {steps} steps: {worst}")
    print(f"histogram (sampled): {dict(sorted(hist.items()))}")


if __name__ == "__main__":
    main()
