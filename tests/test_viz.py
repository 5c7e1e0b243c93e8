"""Headless renderer smoke test (the testbed-plugin slot)."""

import os

import numpy as np

from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.viz import RenderOptions, profiling_string, render_frame
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions


def test_render_frame(tmp_path):
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=2,
        neighbors=NeighborConfig(max_neighbors=32, max_candidates=96,
                                 query_chunk=4096),
    )
    world.add_fluid(Fluid(cube_positions(5, 0.05, 2)))
    world.add_boundary(
        Boundary(np.array([[0.0, -0.2], [0.1, -0.2]], np.float32))
    )
    world.step(1.0 / 200.0, (0.0, -9.81))

    for mode in ("static", "velocity", "arrows"):
        path = str(tmp_path / f"frame_{mode}.png")
        render_frame(
            world, path,
            RenderOptions(mode=mode, render_boundary_particles=True),
        )
        assert os.path.getsize(path) > 1000

    assert profiling_string(world).startswith("Fluids:")
