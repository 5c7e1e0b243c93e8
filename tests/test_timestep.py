"""TimestepManager unit tests (`src/timestep_manager.rs` semantics)."""

import jax.numpy as jnp
import numpy as np

from salva_tpu.timestep import TimestepManager


def test_default_single_substep():
    """Faithful mode mirrors the reference's short-circuit
    (`timestep_manager.rs:87-94`): one substep of the full dt."""
    tm = TimestepManager(particle_radius=0.05)
    tm.reset(1.0 / 200.0)
    assert not tm.is_done()
    dt = tm.advance(max_velocity=100.0)  # velocity ignored
    assert dt == 1.0 / 200.0
    assert tm.is_done()


def test_adaptive_cfl_substeps():
    """CFL formula 2r/v * coeff with min/max substep clamps (`:25-46`)."""
    tm = TimestepManager(particle_radius=0.05, adaptive=True,
                         max_num_substeps=10)
    total = 1.0 / 60.0
    tm.reset(total)
    # Fast flow: CFL = 2*0.05/10*0.4 = 0.004 > total/10 -> CFL wins.
    dt = tm.advance(max_velocity=10.0)
    np.testing.assert_allclose(dt, 0.004)
    # Extremely fast flow clamps at total / max_num_substeps.
    tm.reset(total)
    dt = tm.advance(max_velocity=1e6)
    np.testing.assert_allclose(dt, total / 10.0)
    # Slow flow clamps at the full step.
    tm.reset(total)
    dt = tm.advance(max_velocity=1e-9)
    np.testing.assert_allclose(dt, total)
    assert tm.is_done()


def test_cfl_vmax_uses_actual_acceleration():
    """`timestep_manager.rs:36-46`: max ||v + a * t_rem|| with the
    particle's ACTUAL acceleration — recovered from the previous
    substep's velocity delta; gravity only as first-substep fallback."""
    from salva_tpu.world import _cfl_vmax

    vel = jnp.asarray([[3.0, 0.0], [0.0, 1.0]], jnp.float32)
    prev = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    alive = jnp.asarray([True, True])
    gravity = jnp.asarray([0.0, -9.81], jnp.float32)
    # inv_prev_dt = 100 -> a0 = (2,0)*100 = (200,0); t_rem = 0.01
    # -> v_pred0 = (3+2, 0) = (5,0); particle 1 unaccelerated -> 1.
    out = float(_cfl_vmax(vel, prev, alive, gravity,
                          jnp.float32(100.0), jnp.float32(0.01)))
    np.testing.assert_allclose(out, 5.0, rtol=1e-6)
    # First substep (inv_prev_dt == 0): gravity fallback.
    out = float(_cfl_vmax(vel, prev, alive, gravity,
                          jnp.float32(0.0), jnp.float32(0.1)))
    np.testing.assert_allclose(
        out, np.linalg.norm([3.0, -0.981]), rtol=1e-6
    )
    # Dead slots are excluded from the max.
    alive = jnp.asarray([False, True])
    out = float(_cfl_vmax(vel, prev, alive, gravity,
                          jnp.float32(100.0), jnp.float32(0.01)))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_adaptive_step_counts_substeps():
    """A moving adaptive-world step takes multiple CFL substeps and
    consumes exactly dt."""
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.world import Fluid, LiquidWorld

    from util import cube_positions

    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=0.05, dim=2,
        neighbors=NeighborConfig(max_neighbors=40, max_candidates=128,
                                 query_chunk=4096),
        adaptive_timestep=True,
    )
    pos = cube_positions(4, 0.05, 2, origin=(0.0, 0.0))
    vel = np.tile(np.array([4.0, 0.0], np.float32), (len(pos), 1))
    world.add_fluid(Fluid(pos, density0=1000.0, velocities=vel))
    world.counters.enable()
    world.step(1.0 / 60.0, (0.0, -9.81))
    # CFL at |v|~4: 2*0.05/4*0.4 = 0.01 < 1/60 -> >=2 substeps.
    assert world.counters.nsubsteps >= 2


def test_adaptive_consumes_whole_step():
    tm = TimestepManager(particle_radius=0.05, adaptive=True)
    total = 1.0 / 60.0
    tm.reset(total)
    consumed, n = 0.0, 0
    while not tm.is_done() and n < 20:
        consumed += tm.advance(max_velocity=10.0)
        n += 1
    np.testing.assert_allclose(consumed, total, rtol=1e-5)
    assert 2 <= n <= 10
