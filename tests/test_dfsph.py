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
    # state columns [:dim] are the velocity changes (the trailing two are
    # the warm-start stiffness sums).
    vy = (np.asarray(fluids.velocities) + np.asarray(state)[:, :2])[alive, 1]
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


def test_warm_start_cuts_iterations_within_tolerance():
    """The warm start (cfg.warm_start, SPlisHSPlasH-style) must (a) keep
    the converged errors inside the same tolerances and (b) not need
    more solver iterations than a cold start on a sustained-compression
    run — its whole point is fewer iterations at equal tolerance."""
    from salva_tpu.config import DFSPHConfig

    def run(warm):
        cfg = DFSPHConfig(warm_start=warm)
        pos = cube_positions(8, RADIUS, 2)
        fluids = make_fluids(pos, RADIUS, 2)
        # Compress so the solves have real work every step.
        fluids = fluids.replace(positions=fluids.positions * 0.93)
        boundaries = make_boundaries(None, 2)
        step = get_jitted_step_fn(SIM2D, cfg, ForceSet(), 1)
        state = init_solver_state(cfg, fluids.capacity, 2)
        gravity = jnp.zeros((2,), jnp.float32)
        iters = 0
        for _ in range(8):
            fluids, boundaries, state, diag = step(
                fluids, boundaries, state, None, 1.0 / 200.0, gravity
            )
            iters += int(diag.solver.pressure_iters) + int(
                diag.solver.divergence_iters
            )
            assert float(diag.solver.pressure_error) <= 0.05 + 1e-6
        return iters, np.asarray(fluids.positions)

    cold_iters, cold_pos = run(0.0)
    warm_iters, warm_pos = run(0.5)
    assert warm_iters <= cold_iters, (warm_iters, cold_iters)
    # Same physics to solver tolerance (not bitwise: different
    # trajectories through the same fixed point).
    np.testing.assert_allclose(warm_pos, cold_pos, atol=5e-3)


def test_dfsph_viscosity_operator_descends_and_upstream_gain_diverges():
    """Regression for the implicit viscosity's projection operator
    (`dfsph_viscosity.rs:252-325`).

    Two verified properties:
    1. the assembled update operator is a valid descent direction — at
       reduced gain, iterating it drives the mean strain error well below
       its initial value (this pins the port's beta/strain/force
       assembly);
    2. at the reference's own gain (scale 1) the iteration DIVERGES
       geometrically (~20x/iteration) even on an interior lattice — the
       reference acknowledges this ("unstable" in its commented debug
       print, `dfsph_viscosity.rs:308-313`), and no reference example
       exercises the force. This documents that the divergence is
       upstream behavior, faithfully reproduced, not a porting bug.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from salva_tpu.geometry import build_grid, evaluate_contacts, find_neighbors
    from salva_tpu.object.state import BoundariesState, FluidsState
    from salva_tpu.solver.common import StepContext, compute_densities
    from salva_tpu.solver.viscosity import _gradient_matrix, _strain_rate

    dim, h = 2, 0.2
    xs = (np.arange(8) * 0.1).astype(np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    n = len(pos)
    rng = np.random.default_rng(3)
    vel = rng.normal(size=pos.shape).astype(np.float32) * 0.05
    fl = FluidsState.empty(n, dim).replace(
        positions=jnp.asarray(pos), velocities=jnp.asarray(vel),
        volumes=jnp.full((n,), 4.0 * 0.8 * 0.05**2),
        density0=jnp.full((n,), 1000.0), alive=jnp.ones((n,), bool),
    )
    bd = BoundariesState.empty(8, dim)
    gi = fl.groups()
    grid = build_grid(fl.positions, fl.alive, h, dim)
    nl = find_neighbors(fl.positions, fl.alive, gi, grid, fl.positions,
                        fl.alive, gi, h, dim, 64, 160, True, query_chunk=4096)
    ff = evaluate_contacts(fl.positions, fl.positions, nl, h, dim)
    dt = jnp.float32(1.0 / 200.0)
    ctx = StepContext(
        fluids=fl, boundaries=bd, ff=ff, fb=ff,
        densities=jnp.zeros((n,), jnp.float32), dt=dt,
        inv_dt=jnp.float32(200.0), dim=dim, h=h, num_fluids=1,
    )
    rho = compute_densities(ctx.replace(fb=evaluate_contacts(
        fl.positions, bd.positions,
        find_neighbors(fl.positions, fl.alive, gi,
                       build_grid(bd.positions, bd.alive, h, dim),
                       bd.positions, bd.alive, bd.groups(), h, dim, 8, 16,
                       False, query_chunk=4096),
        h, dim)))

    nu = 0.9
    mask = ff.valid.astype(jnp.float32)
    m_j = fl.masses[ff.j] * mask
    G = _gradient_matrix(ff.grad, dim)

    # Betas exactly as the force builds them (`dfsph_viscosity.rs:130-197`).
    grad_i = G * (m_j / (2.0 * rho[:, None]))[..., None, None]
    sq = jnp.einsum("nksd,nktd->nst", grad_i, grad_i) / rho[:, None, None]
    gsum = jnp.sum(grad_i, axis=1)
    denom = sq + jnp.einsum("nsd,ntd->nst", gsum, gsum) / rho[:, None, None]
    diag = jnp.diagonal(denom, axis1=-2, axis2=-1)
    inv_diag = jnp.where(jnp.abs(diag) < 1e-6, 1.0,
                         1.0 / jnp.where(diag == 0, 1.0, diag))
    denom_p = denom * inv_diag[:, :, None]
    sing = jnp.abs(jnp.linalg.det(denom_p)) < 1e-6
    safe = jnp.where(sing[:, None, None], jnp.eye(3)[None], denom_p)
    beta = jnp.where(sing[:, None, None], 0.0, jnp.linalg.inv(safe))
    beta = beta * inv_diag[:, None, :]

    def rate(accel):
        v = fl.velocities + accel * dt
        v_ji = v[ff.j] - v[:, None, :]
        return jnp.sum(
            _strain_rate(ff.grad, v_ji, dim)
            * (m_j / (2.0 * rho[:, None]))[..., None], axis=1,
        )

    target = rate(0.0 * fl.positions) * (1.0 - nu)

    def err_of(a):
        return float(jnp.mean(jnp.sum(jnp.abs(rate(a) - target), -1) / 6.0))

    def update(accel, scale):
        errv = rate(accel) - target
        u = jnp.einsum("nst,nt->ns", beta, errv) / (rho * rho)[:, None]
        coeff = (u[:, None, :] + u[ff.j]) * (
            fl.volumes[ff.j] * fl.density0[:, None] * 0.5 * mask)[..., None]
        contrib = jnp.einsum("nksd,nks->nd", G, coeff)
        return accel + scale * contrib * (
            fl.volumes * fl.density0)[:, None] * ctx.inv_dt

    err0 = err_of(0.0 * fl.positions)

    # 1. descent at reduced gain: converges well below the start.
    a = 0.0 * fl.positions
    for _ in range(6):
        a = update(a, 0.02)
    assert err_of(a) < 0.5 * err0, (err_of(a), err0)

    # 2. upstream gain diverges geometrically.
    a = 0.0 * fl.positions
    e_prev = err0
    for _ in range(3):
        a = update(a, 1.0)
        e = err_of(a)
        assert e > 5.0 * e_prev, (e, e_prev)
        e_prev = e
