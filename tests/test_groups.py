"""Interaction groups: bitmask semantics (`interaction_groups.rs:64-69`)
and their effect on the simulation (layers2-style isolation)."""

import numpy as np

from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.object.interaction_groups import ALL, NONE, InteractionGroups, group
from salva_tpu.world import Fluid, LiquidWorld

from util import cube_positions


def test_group_truth_table():
    g1 = InteractionGroups(group(1), group(1))
    g2 = InteractionGroups(group(2), group(2))
    both = InteractionGroups(group(1) | group(2), ALL)
    nothing = InteractionGroups(NONE, NONE)
    assert g1.test(g1)
    assert not g1.test(g2)
    assert both.test(g1) and both.test(g2)
    assert not nothing.test(g1)
    # Default: member of group 1, filter ALL.
    assert InteractionGroups().test(InteractionGroups())


def test_groups_isolate_fluids():
    """Two overlapping-support fluids in disjoint groups don't interact:
    the isolated fluid free-falls as if alone."""
    nb = NeighborConfig(max_neighbors=40, max_candidates=128, query_chunk=4096)

    def world_with(groups_a, groups_b):
        w = LiquidWorld(solver=DFSPHConfig(), particle_radius=0.05, dim=2,
                        neighbors=nb)
        pa = cube_positions(4, 0.05, 2, origin=(0.0, 0.0))
        pb = cube_positions(4, 0.05, 2, origin=(0.05, 0.05))  # interleaved
        fa = w.add_fluid(Fluid(pa, interaction_groups=groups_a))
        fb = w.add_fluid(Fluid(pb, interaction_groups=groups_b))
        for _ in range(5):
            w.step(1.0 / 200.0, (0.0, -9.81))
        return w, fa, fb

    g1 = InteractionGroups(group(1), group(1))
    g2 = InteractionGroups(group(2), group(2))
    w_iso, fa, fb = world_with(g1, g2)

    # Reference: fluid A alone falls freely.
    w_alone = LiquidWorld(solver=DFSPHConfig(), particle_radius=0.05, dim=2,
                          neighbors=nb)
    fa2 = w_alone.add_fluid(
        Fluid(cube_positions(4, 0.05, 2, origin=(0.0, 0.0)),
              interaction_groups=g1)
    )
    for _ in range(5):
        w_alone.step(1.0 / 200.0, (0.0, -9.81))

    np.testing.assert_allclose(
        w_iso.fluid_positions(fa), w_alone.fluid_positions(fa2), atol=1e-6
    )

    # Same groups -> they do interact (trajectories differ).
    w_mix, fa3, _ = world_with(g1, g1)
    assert not np.allclose(
        w_mix.fluid_positions(fa3), w_alone.fluid_positions(fa2), atol=1e-6
    )
