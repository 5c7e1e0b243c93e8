"""Bitwise reproducibility (SURVEY.md §5.2): the reference guards
determinism with a fixed-seed hasher (`hgrid.rs:10-18`); here the whole
step is a pure function with sorted/segmented reductions, so two runs from
identical state must agree bit-for-bit."""

import numpy as np

from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05


def _world(layout):
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
        neighbors=NeighborConfig(max_neighbors=48, max_candidates=128,
                                 query_chunk=4096),
        domain=((-1.5, -0.5), (1.5, 2.0)),
        layout=layout,
    )
    pos = cube_positions(7, RADIUS, 2, origin=(-0.6, 0.02))
    fl = world.add_fluid(Fluid(pos, density0=1000.0))
    xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    world.add_boundary(Boundary(floor))
    return world, fl


def test_bitwise_deterministic_gather():
    _check("gather")


def test_bitwise_deterministic_dense():
    _check("dense")


def _check(layout):
    w1, f1 = _world(layout)
    w2, f2 = _world(layout)
    for _ in range(15):
        w1.step(1.0 / 200.0, (0.0, -9.81))
        w2.step(1.0 / 200.0, (0.0, -9.81))
    np.testing.assert_array_equal(
        w1.fluid_positions(f1), w2.fluid_positions(f2)
    )
    np.testing.assert_array_equal(
        w1.fluid_velocities(f1), w2.fluid_velocities(f2)
    )
