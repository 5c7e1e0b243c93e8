"""End-to-end DFSPH tests on small scenes (SURVEY.md §7 step 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from salva_tpu.config import DFSPHConfig, NeighborConfig, SimConfig
from salva_tpu.solver.nonpressure import ForceSet
from salva_tpu.step import get_jitted_step_fn, init_solver_state

from util import cube_positions, make_boundaries, make_fluids

RADIUS = 0.1
SIM2D = SimConfig(
    dim=2,
    particle_radius=RADIUS,
    smoothing_factor=2.0,
    neighbors=NeighborConfig(max_neighbors=32, max_candidates=96, query_chunk=4096),
)


def _setup(n=8, dim=2, gravity_y=0.0):
    pos = cube_positions(n, RADIUS, dim)
    fluids = make_fluids(pos, RADIUS, dim)
    boundaries = make_boundaries(None, dim)
    cfg = DFSPHConfig()
    sim = SIM2D if dim == 2 else SIM2D.replace(dim=3)
    step = get_jitted_step_fn(sim, cfg, ForceSet(), 1)
    state = init_solver_state(cfg, fluids.capacity, dim)
    gravity = jnp.zeros((dim,), jnp.float32).at[1].set(gravity_y)
    return step, fluids, boundaries, state, gravity


def test_rest_block_stays_at_rest():
    """A grid-aligned block with no gravity generates (almost) no motion:
    the 0.8 volume factor keeps rho below rho0, and DFSPH clamps
    under-pressure (`dfsph_solver.rs:155-160`)."""
    step, fluids, boundaries, state, gravity = _setup(gravity_y=0.0)
    for _ in range(3):
        fluids, boundaries, state, diag = step(
            fluids, boundaries, state, None, 1.0 / 200.0, gravity
        )
    vmax = float(jnp.max(jnp.abs(fluids.velocities)))
    assert vmax < 1e-3, f"rest block moved: vmax={vmax}"
    assert int(diag.neighbor_overflow) == 0
    assert int(diag.candidate_overflow) == 0


def test_free_fall_matches_gravity():
    """Without boundaries and with uniform gravity the block free-falls:
    mean velocity after k steps is ~ k g dt."""
    step, fluids, boundaries, state, gravity = _setup(gravity_y=-9.81)
    dt = 1.0 / 200.0
    nsteps = 5
    for _ in range(nsteps):
        fluids, boundaries, state, diag = step(
            fluids, boundaries, state, None, dt, gravity
        )
    alive = np.asarray(fluids.alive)
    # DFSPH holds the last substep's velocity change in its persistent
    # scratch until the next step commits it (`dfsph_solver.rs:688`), so the
    # full velocity is v + dv.
    vy = (np.asarray(fluids.velocities) + np.asarray(state))[alive, 1]
    expected = -9.81 * dt * nsteps
    np.testing.assert_allclose(vy.mean(), expected, rtol=0.05)
    assert np.all(np.isfinite(np.asarray(fluids.positions)))


def test_density_error_within_tolerance():
    """Pressure solve keeps the mean density error below the configured 5%
    tolerance (the reference's fidelity baseline, BASELINE.md)."""
    step, fluids, boundaries, state, gravity = _setup(n=8, gravity_y=-9.81)
    dt = 1.0 / 200.0
    for _ in range(10):
        fluids, boundaries, state, diag = step(
            fluids, boundaries, state, None, dt, gravity
        )
    assert float(diag.solver.pressure_error) <= 0.05 + 1e-6
    assert int(diag.solver.pressure_iters) <= 50


def test_momentum_conservation_no_gravity():
    """Fluid-fluid pressure forces are antisymmetric: with no gravity and
    no boundaries, total momentum stays ~0."""
    step, fluids, boundaries, state, gravity = _setup(n=8, gravity_y=0.0)
    # Squeeze the block slightly so pressure actually acts.
    fluids = fluids.replace(positions=fluids.positions * 0.95)
    m = np.asarray(fluids.masses)
    for _ in range(5):
        fluids, boundaries, state, diag = step(
            fluids, boundaries, state, None, 1.0 / 200.0, gravity
        )
    alive = np.asarray(fluids.alive)
    p = (m[:, None] * np.asarray(fluids.velocities))[alive].sum(axis=0)
    pmag = np.abs(p).max()
    # Scale: typical particle momentum.
    scale = np.abs(m[alive][:, None] * np.asarray(fluids.velocities)[alive]).max()
    assert pmag < 1e-3 * max(scale, 1e-12) * alive.sum() + 1e-8, (p, scale)


def test_dead_particles_do_not_move():
    step, fluids, boundaries, state, gravity = _setup(n=8, gravity_y=-9.81)
    # Kill half the particles.
    alive = np.asarray(fluids.alive).copy()
    idx = np.where(alive)[0][::2]
    alive[idx] = False
    fluids = fluids.replace(alive=jnp.asarray(alive))
    pos0 = np.asarray(fluids.positions)
    for _ in range(3):
        fluids, boundaries, state, _ = step(
            fluids, boundaries, state, None, 1.0 / 200.0, gravity
        )
    pos1 = np.asarray(fluids.positions)
    np.testing.assert_array_equal(pos0[~alive], pos1[~alive])
    assert np.all(pos1[alive][:, 1] < pos0[alive][:, 1])  # falling
