"""Robustness: auto-layout selection, failure detection, long emitter
runs with capacity growth."""

import numpy as np
import pytest

from salva_tpu import scenes as scn
from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

NB = NeighborConfig(max_neighbors=40, max_candidates=128, query_chunk=4096)


def test_auto_layout_picks_gather_for_sparse_domain():
    """Tiny particle set in a huge domain -> gather (dense would be
    mostly vacuum)."""
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=3, neighbors=NB,
        domain=((-50.0, -50.0, -50.0), (50.0, 50.0, 50.0)),
    )
    world.add_fluid(Fluid(cube_positions(3, 0.05, 3)))
    assert world._effective_sim().layout == "gather"


def test_auto_layout_picks_dense_for_matched_domain():
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=2, neighbors=NB,
        domain=((-1.0, -0.5), (1.0, 1.5)),
    )
    world.add_fluid(Fluid(cube_positions(8, 0.05, 2)))
    sim = world._effective_sim()
    assert sim.layout == "auto"  # stays auto -> dense path resolves


def test_debug_checks_raise_on_nan():
    """Debug mode surfaces non-finite state as an error instead of
    silent NaN propagation (SURVEY.md §5.3)."""
    import jax.numpy as jnp

    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=2, neighbors=NB,
    )
    world.add_fluid(Fluid(cube_positions(5, 0.05, 2)))
    world.fluids_state = world.fluids_state.replace(
        positions=world.fluids_state.positions.at[0, 0].set(jnp.nan)
    )
    world.debug_checks = True
    with pytest.raises(FloatingPointError):
        world.step(1.0 / 200.0, (0.0, -9.81))


def test_elasticity_survives_capacity_growth():
    """Regression: adding an elastic fluid larger than the initial slot
    capacity used to clear the rest-state rebuild flag during growth,
    leaving the elasticity state unset (None) at step time."""
    from salva_tpu import forces

    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=2, neighbors=NB,
    )
    pos = cube_positions(10, 0.05, 2, origin=(0.0, 1.0))  # 100 > 64 slots
    fl = world.add_fluid(
        Fluid(pos, density0=1000.0, nonpressure_forces=[
            forces.Becker2009Elasticity(50_000.0, 0.3, True)])
    )
    world.step(1.0 / 200.0, (0.0, -9.81))
    assert world._elasticity_state is not None
    assert np.isfinite(world.fluid_positions(fl)).all()


def test_faucet_long_run_grows_capacity():
    """Emitter across capacity growth boundaries stays finite and the
    deletion rule holds (faucet3, 30 steps)."""
    scene = scn.faucet3()
    scn.run(scene, 30)
    world = scene.world
    pos = world.fluid_positions(scene.fluid_handles[0])
    assert len(pos) > 200  # several emissions
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -2.3  # deleted below the cutoff
