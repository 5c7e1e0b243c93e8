"""TimestepManager unit tests (`src/timestep_manager.rs` semantics)."""

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
