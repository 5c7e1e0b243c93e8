"""World-level integration tests: dam break in a box with boundaries
(the headless analog of `examples2d/basic2.rs` / `examples3d/basic3.rs`).
"""

import numpy as np
import pytest

from salva_tpu.config import DFSPHConfig, IISPHConfig, NeighborConfig
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05
NEIGHBORS = NeighborConfig(max_neighbors=40, max_candidates=128, query_chunk=4096)


def _box_walls_2d(radius, half_width=1.0, height=1.0):
    """Single-layer boundary particles: floor + two walls, spaced 2r."""
    spacing = 2.0 * radius
    xs = np.arange(-half_width, half_width + spacing / 2, spacing)
    floor = np.stack([xs, np.full_like(xs, -spacing)], axis=-1)
    ys = np.arange(-spacing, height, spacing)
    left = np.stack([np.full_like(ys, -half_width), ys], axis=-1)
    right = np.stack([np.full_like(ys, half_width), ys], axis=-1)
    # Second floor layer to prevent tunneling.
    floor2 = floor - np.array([0.0, spacing])
    return np.concatenate([floor, floor2, left, right]).astype(np.float32)


def _dam_break_world(solver):
    world = LiquidWorld(
        solver=solver,
        particle_radius=RADIUS,
        smoothing_factor=2.0,
        dim=2,
        neighbors=NEIGHBORS,
    )
    pos = cube_positions(8, RADIUS, 2, origin=(-0.9, 0.02))
    fluid = world.add_fluid(Fluid(pos, density0=1000.0))
    bnd = world.add_boundary(Boundary(_box_walls_2d(RADIUS)))
    return world, fluid, bnd


@pytest.mark.parametrize("solver", [DFSPHConfig(), IISPHConfig()])
def test_dam_break_stays_in_box(solver):
    world, fluid, bnd = _dam_break_world(solver)
    for _ in range(60):
        world.step(1.0 / 200.0, (0.0, -9.81))
    pos = world.fluid_positions(fluid)
    assert np.all(np.isfinite(pos))
    # Nothing fell through the floor or left through the walls.
    assert pos[:, 1].min() > -0.15, pos[:, 1].min()
    assert np.abs(pos[:, 0]).max() < 1.1
    # Fluid settled near the floor under gravity.
    assert pos[:, 1].mean() < 0.5
    d = world.last_diagnostics
    assert float(d.solver.pressure_error) <= solver.max_density_error + 1e-6
    assert int(d.neighbor_overflow) == 0


def test_boundary_receives_downward_force():
    """Two-way feedback: the floor must receive the fluid's weight
    (negative y force), `boundary.rs:62-67`."""
    world, fluid, bnd = _dam_break_world(DFSPHConfig())
    for _ in range(40):
        world.step(1.0 / 200.0, (0.0, -9.81))
    f = world.boundary_forces(bnd)
    assert f.shape[1] == 2
    assert f[:, 1].sum() < 0.0  # net downward push on the boundary


def test_queries():
    world, fluid, bnd = _dam_break_world(DFSPHConfig())
    hits = world.particles_intersecting_aabb((-2.0, -1.0), (2.0, 2.0))
    kinds = {k for k, _, _ in hits}
    assert kinds == {"fluid", "boundary"}
    n_fluid = sum(1 for k, _, _ in hits if k == "fluid")
    assert n_fluid == 64


def test_query_indices_multi_fluid_with_dead_slots():
    """The (kind, handle, index) triples must index into the handle's
    *live* particles even with interleaved fluids and freed slots (the
    rank-based `_slot_ids` path)."""
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS,
        smoothing_factor=2.0, dim=2, neighbors=NEIGHBORS,
    )
    pos_a = cube_positions(4, RADIUS, 2, origin=(-0.5, 0.0))
    pos_b = cube_positions(4, RADIUS, 2, origin=(0.3, 0.0))
    fa = world.add_fluid(Fluid(pos_a, density0=1000.0))
    fb = world.add_fluid(Fluid(pos_b, density0=1000.0))
    # Free some of fluid A's slots so live slots are non-contiguous.
    world.delete_particles(fa, [0, 3, 7])
    hits = world.particles_intersecting_aabb((-2.0, -1.0), (2.0, 2.0))
    per = {fa: 0, fb: 0}
    for kind, handle, index in hits:
        assert kind == "fluid"
        p = world.fluid_positions(handle)[index]
        assert -2.0 <= p[0] <= 2.0 and -1.0 <= p[1] <= 2.0
        per[handle] += 1
    assert per == {fa: 13, fb: 16}
    # A half-plane AABB catching only fluid B's column.
    right = world.particles_intersecting_aabb((0.25, -1.0), (2.0, 2.0))
    assert {h for _, h, _ in right} == {fb}
    idxs = sorted(i for _, _, i in right)
    assert idxs == list(range(16))


def test_z_sort_preserves_physics():
    world, fluid, bnd = _dam_break_world(DFSPHConfig())
    world2, fluid2, bnd2 = _dam_break_world(DFSPHConfig())
    for _ in range(5):
        world.step(1.0 / 200.0, (0.0, -9.81))
        world2.step(1.0 / 200.0, (0.0, -9.81))
    world2.z_sort()
    for _ in range(5):
        world.step(1.0 / 200.0, (0.0, -9.81))
        world2.step(1.0 / 200.0, (0.0, -9.81))
    a = world.fluid_positions(fluid)
    b = world2.fluid_positions(fluid2)
    # Same particle set up to ordering and float reassociation.
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_boundary_volume_caching():
    """Steps without boundary changes reuse cached volumes; the cached
    values equal a fresh recomputation."""
    world, fluid, bnd = _dam_break_world(DFSPHConfig())
    world.step(1.0 / 200.0, (0.0, -9.81))  # dirty step: computes volumes
    assert world._boundary_dirty is False
    vols1 = np.asarray(world.boundaries_state.volumes).copy()
    assert vols1.max() > 0.0
    world.step(1.0 / 200.0, (0.0, -9.81))  # clean step: reuses them
    vols2 = np.asarray(world.boundaries_state.volumes)
    np.testing.assert_array_equal(vols1, vols2)

    # Touching the boundary re-marks dirty.
    world.set_boundary_particles(
        bnd, world.boundary_positions(bnd) + 0.01
    )
    assert world._boundary_dirty is True
    world.step(1.0 / 200.0, (0.0, -9.81))
    assert np.isfinite(np.asarray(world.boundaries_state.volumes)).all()


def test_emitter_and_deletion():
    world, fluid, bnd = _dam_break_world(DFSPHConfig())
    n0 = len(world.fluid_positions(fluid))
    world.add_particles(fluid, cube_positions(3, RADIUS, 2, origin=(0.5, 0.5)))
    assert len(world.fluid_positions(fluid)) == n0 + 9
    world.step(1.0 / 200.0, (0.0, -9.81))
    world.delete_particles(fluid, np.arange(5))
    assert len(world.fluid_positions(fluid)) == n0 + 9 - 5
    world.step(1.0 / 200.0, (0.0, -9.81))
    assert np.all(np.isfinite(world.fluid_positions(fluid)))


def test_per_fluid_particle_radius_drives_volume():
    """`Fluid::particle_radius` drives particle volume (`fluid.rs:110-120`:
    V = 4*0.8*r^2 in 2D), independently per fluid."""
    world = LiquidWorld(particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS)
    fa = world.add_fluid(Fluid([[0.0, 0.0]], density0=1000.0))
    fb = world.add_fluid(
        Fluid([[0.5, 0.0]], density0=1000.0, particle_radius=2.0 * RADIUS)
    )
    vols = np.asarray(world.fluids_state.volumes)
    va = vols[world.fluid_slots(fa)][0]
    vb = vols[world.fluid_slots(fb)][0]
    assert va == pytest.approx(4.0 * 0.8 * RADIUS**2, rel=1e-6)
    assert vb == pytest.approx(4.0 * 0.8 * (2 * RADIUS) ** 2, rel=1e-6)


def test_transform_by():
    """`Fluid::transform_by` / `Boundary::transform_by`
    (`fluid.rs:166-168`, `boundary.rs:55-57`)."""
    world = LiquidWorld(particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS)
    fh = world.add_fluid(Fluid([[1.0, 0.0], [0.0, 1.0]]))
    bh = world.add_boundary(Boundary([[2.0, 0.0]]))
    rot90 = np.array([[0.0, -1.0], [1.0, 0.0]], np.float32)
    world.transform_fluid_by(fh, rotation=rot90, translation=(0.0, 0.5))
    world.transform_boundary_by(bh, translation=(0.0, -1.0))
    np.testing.assert_allclose(
        world.fluid_positions(fh),
        [[0.0, 1.5], [-1.0, 0.5]],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        world.boundary_positions(bh), [[2.0, -1.0]], atol=1e-6
    )
    assert world._boundary_dirty


def test_deferred_particle_deletion():
    """`delete_particle_at_next_timestep` keeps the particle visible until
    the next step start (`fluid.rs:71-98`, `liquid_world.rs:79-81`)."""
    world, fluid, _ = _dam_break_world(DFSPHConfig())
    n0 = len(world.fluid_positions(fluid))
    world.delete_particle_at_next_timestep(fluid, 0)
    world.delete_particle_at_next_timestep(fluid, 0)  # idempotent
    world.delete_particle_at_next_timestep(fluid, 1)
    assert world.num_deleted_particles(fluid) == 2
    # Still present between the flag and the next step.
    assert len(world.fluid_positions(fluid)) == n0
    world.step(1.0 / 200.0, (0.0, -9.81))
    assert len(world.fluid_positions(fluid)) == n0 - 2
    assert world.num_deleted_particles(fluid) == 0


def test_overflow_warns_by_default():
    """An undersized neighbor capacity is loud on the first step even
    without debug_checks."""
    import warnings

    world = LiquidWorld(
        particle_radius=RADIUS,
        dim=2,
        neighbors=NeighborConfig(max_neighbors=2, max_candidates=16,
                                 query_chunk=4096),
    )
    world.add_fluid(Fluid(cube_positions(6, RADIUS, 2), density0=1000.0))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        world.step(1.0 / 200.0, (0.0, -9.81))
    assert any("overflow" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]


def test_adaptive_cfl_uses_speed_norm():
    """Adaptive CFL follows `timestep_manager.rs:36-46`:
    dt = 2r*cfl / max||v + a*t_remaining||, clamped to 1..10 substeps."""
    world = LiquidWorld(
        particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
        adaptive_timestep=True,
    )
    v = (3.0, 4.0)  # speed 5: per-component max would give 4
    world.add_fluid(Fluid([[0.0, 0.0]], velocities=[v]))
    dt = 1.0 / 200.0
    world.step(dt, (0.0, 0.0))  # zero gravity: a-term drops out
    tm = world.timestep_manager
    expected = 2.0 * RADIUS / 5.0 * tm.cfl_coeff
    expected = min(max(expected, dt / tm.max_num_substeps), dt)
    assert tm.dt == pytest.approx(expected, rel=1e-5)


def test_dense_forces_survive_remove_fluid():
    """After remove_fluid(0), the surviving fluid's non-pressure force
    coefficients must still resolve on the dense path: per-fluid
    coefficient tuples are indexed by record handle (including removed
    records), so the uniform-channel FID must carry the survivor's
    handle, not 0."""
    from salva_tpu import forces

    def build(with_force):
        world = LiquidWorld(
            particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
            domain=((-1.2, -0.2), (1.2, 1.5)), layout="dense",
        )
        f0 = world.add_fluid(
            Fluid(cube_positions(3, RADIUS, 2, origin=(0.6, 0.1)),
                  density0=1000.0)
        )
        np_forces = (
            [forces.XSPHViscosity(0.9, 0.0)] if with_force else []
        )
        f1 = world.add_fluid(
            Fluid(cube_positions(6, RADIUS, 2, origin=(-0.9, 0.02)),
                  density0=1000.0, nonpressure_forces=np_forces)
        )
        world.add_boundary(Boundary(_box_walls_2d(RADIUS)))
        world.remove_fluid(f0)
        return world, f1

    wa, fa = build(True)
    assert wa._uniform_particles()[0] == fa
    wb, fb = build(False)
    for _ in range(3):
        wa.step(1.0 / 200.0, (0.0, -9.81))
        wb.step(1.0 / 200.0, (0.0, -9.81))
    pa = wa.fluid_positions(fa)
    pb = wb.fluid_positions(fb)
    assert not np.allclose(pa, pb), (
        "viscosity on the surviving fluid had no effect: dense-path "
        "coefficients resolved to the removed fluid's entries"
    )


def test_auto_dense_cap_resolution():
    """dense_cap=None auto-sizes the slot tiers from measured occupancy.
    Default tiers are {8, 16} (boundary cap = next multiple of 8) with an
    8 -> 16 overflow bump; opting in via dense_spill_auto enables the
    12+spill tier (measured slower on the TPU dam break, so not default)."""
    world = LiquidWorld(
        particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
        domain=((-1.2, -0.2), (1.2, 1.5)), layout="dense",
    )
    # Sparse fluid: h = 4r cells, particles 8r apart -> occupancy 1.
    xs = np.arange(-0.9, 0.9, 8 * RADIUS, dtype=np.float32)
    pos = np.stack([xs, np.full_like(xs, 0.5)], axis=-1)
    world.add_fluid(Fluid(pos, density0=1000.0))
    world.add_boundary(Boundary(_box_walls_2d(RADIUS)))

    sim = world._effective_sim()
    assert sim.dense_cap == 8
    assert sim.dense_spill_columns is None
    assert sim.dense_cap_boundary % 8 == 0
    # Overflow bump with spill off (default): straight to 16, then keeps
    # healing in +8 granules (VERDICT r4 #5) up to the 48 pathology cap.
    assert world._bump_auto_dense_cap()
    sim = world._effective_sim()
    assert sim.dense_cap == 16
    assert sim.dense_spill_columns is None
    assert world._bump_auto_dense_cap()
    assert world._effective_sim().dense_cap == 24
    for expected in (32, 40, 48):
        assert world._bump_auto_dense_cap()
        assert world._effective_sim().dense_cap == expected
    assert not world._bump_auto_dense_cap()

    # Opt-in spill: the cheap tier self-heals to 12 + spill, then 16.
    world_sp = LiquidWorld(
        particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
        domain=((-1.2, -0.2), (1.2, 1.5)), layout="dense",
    )
    world_sp.sim = world_sp.sim.replace(dense_spill_auto=True)
    world_sp.add_fluid(Fluid(pos, density0=1000.0))
    world_sp.add_boundary(Boundary(_box_walls_2d(RADIUS)))
    assert world_sp._effective_sim().dense_cap == 8
    assert world_sp._bump_auto_dense_cap()
    sim_sp = world_sp._effective_sim()
    assert sim_sp.dense_cap == 12
    assert sim_sp.dense_spill_columns >= 512
    assert world_sp._bump_auto_dense_cap()
    assert world_sp._effective_sim().dense_cap == 16

    # Dense packing (2r spacing in h = 4r cells -> 4 per cell in 2D,
    # but 3D-style stacks of 8 happen at impact; threshold is <= 5):
    # resolves straight to the 12 + spill tier when opted in.
    world2 = LiquidWorld(
        particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
        domain=((-1.2, -0.2), (1.2, 1.5)), layout="dense",
    )
    world2.sim = world2.sim.replace(dense_spill_auto=True)
    dense_pos = cube_positions(10, RADIUS / 2, 2, origin=(-0.2, 0.3))
    world2.add_fluid(Fluid(dense_pos, density0=1000.0))
    world2.add_boundary(Boundary(_box_walls_2d(RADIUS)))
    sim2 = world2._effective_sim()
    assert sim2.dense_cap == 12
    assert sim2.dense_spill_columns >= 512

    # Explicit requests are honored unchanged.
    world3 = LiquidWorld(
        particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS,
        domain=((-1.2, -0.2), (1.2, 1.5)), layout="dense",
        dense_cap=12, dense_cap_boundary=24,
    )
    world3.add_fluid(Fluid(pos, density0=1000.0))
    assert world3._effective_sim().dense_cap == 12
    assert world3._effective_sim().dense_cap_boundary == 24
    assert not world3._bump_auto_dense_cap()


def test_counters_report_dispatch_boundaries():
    """Every surviving Counters timer reports non-zero after an enabled
    step (`counters/mod.rs:16-83` role; per-XLA-stage timers are
    documented as impossible and absent)."""
    world, fluid, _ = _dam_break_world(DFSPHConfig())
    world.counters.enable()
    world.step(1.0 / 200.0, (0.0, -9.81))
    c = world.counters
    assert c.step_time.time > 0.0
    assert c.dispatch_time.time > 0.0
    assert c.fetch_time.time >= 0.0
    assert c.nsubsteps == 1
    assert c.cd.ncontacts > 0
    s = str(c)
    assert "dispatch" in s and "ncontacts" in s


def test_device_emit_and_delete_where():
    """Device-side emitter ops (`fluid.rs:71-150` roles): emit_particles
    fills free slots without host allocation; delete_where kills by
    predicate via the alive mask; host mirrors resync lazily and match
    the device state."""
    world = LiquidWorld(particle_radius=RADIUS, dim=2, neighbors=NEIGHBORS)
    fl = world.add_fluid(
        Fluid(cube_positions(4, RADIUS, 2, origin=(-0.3, 0.1)),
              density0=1000.0)
    )
    world.add_boundary(Boundary(_box_walls_2d(RADIUS)))
    world.reserve_fluid_capacity(64)
    n0 = len(world.fluid_positions(fl))

    template = np.array([[0.5, 1.0], [0.6, 1.0], [0.7, 1.0]], np.float32)
    world.emit_particles(fl, template)
    pos = world.fluid_positions(fl)
    assert len(pos) == n0 + 3
    # Emitted rows carry the record's volume/density (non-zero mass).
    vols = np.asarray(world.fluids_state.volumes)[
        np.asarray(world.fluids_state.alive)
    ]
    assert (vols > 0).all()

    # Predicate deletion: everything right of x = 0.4 (the emitted rows).
    def _right(p, v):
        return p[:, 0] > 0.4

    world.delete_where(fl, _right)
    assert len(world.fluid_positions(fl)) == n0

    # The world still steps after device-side slot churn.
    world.step(1.0 / 200.0, (0.0, -9.81))
    assert np.isfinite(world.fluid_positions(fl)).all()

    # Emission beyond free capacity drops instead of corrupting.
    big = np.zeros((world.fluids_state.capacity + 8, 2), np.float32)
    world.emit_particles(fl, big)
    assert int(np.asarray(world.fluids_state.alive).sum()) == (
        world.fluids_state.capacity
    )
