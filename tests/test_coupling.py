"""Coupling tests: boundary resampling from body poses, dynamic contact
sampling (depenetration) and force transmission
(`src/integrations/rapier/fluids_pipeline.rs:137-288` semantics)."""

import numpy as np
import pytest

from salva_tpu import shapes
from salva_tpu.config import NeighborConfig
from salva_tpu.coupling import ColliderSampling, FluidsPipeline
from salva_tpu.sampling import shape_surface_sample
from salva_tpu.scenes import cube_fluid
from salva_tpu.world import Boundary, Fluid

RADIUS = 0.05
NB = NeighborConfig(max_neighbors=40, max_candidates=128, query_chunk=4096)


def _pipeline(dim=2):
    return FluidsPipeline(RADIUS, 2.0, dim=dim, neighbors=NB)


def test_static_sampling_tracks_body():
    """Boundary particles follow the collider pose and carry the body's
    point velocities (`fluids_pipeline.rs:180-191`)."""
    pip = _pipeline()
    body = pip.bodies.add_body("dynamic", translation=(0.0, 1.0))
    shape = shapes.Ball(0.2)
    co = pip.bodies.add_collider(body, shape)
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    samples = shape_surface_sample(shape, RADIUS, 2)
    pip.coupling.register_coupling(bo, co, ColliderSampling.static_sampling(samples))
    pip.bodies.bodies[body].linvel = np.array([1.0, 0.0], np.float32)

    pip.step((0.0, 0.0), 0.1)
    pts = pip.liquid_world.boundary_positions(bo)
    assert len(pts) == len(samples)
    # Body moved 1.0 * 0.1 in x before resampling.
    assert abs(pts[:, 0].mean() - 0.1) < 1e-5
    assert abs(pts[:, 1].mean() - 1.0) < 1e-5


def test_dynamic_sampling_depenetrates_and_emits():
    """A fluid particle inside the collider is pushed to the surface with
    its inward velocity cancelled, and boundary particles are emitted at
    projections (`fluids_pipeline.rs:192-255`)."""
    pip = _pipeline()
    # One particle inside a unit box, moving further in.
    fl = pip.liquid_world.add_fluid(
        Fluid(np.array([[0.0, 0.45]], np.float32),
              velocities=np.array([[0.0, -1.0]], np.float32))
    )
    body = pip.bodies.add_body("fixed")
    co = pip.bodies.add_collider(body, shapes.Cuboid((2.0, 0.5)))
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.dynamic_contact_sampling()
    )

    pip.step((0.0, 0.0), 1.0 / 200.0)
    pos = pip.liquid_world.fluid_positions(fl)
    # Depenetrated out of the box (top surface at y = 0.5).
    assert pos[0, 1] >= 0.5 - 1e-5
    assert len(pip.liquid_world.boundary_positions(bo)) > 0


def test_transmit_forces_pushes_dynamic_body():
    """A buoyant dynamic ball submerged in a fluid column receives a net
    upward impulse from pressure feedback (`fluids_pipeline.rs:263-287`).

    The fluid lattice is excavated around the ball so its boundary
    samples don't START inside fluid particles — overlapping spawns make
    the first pressure solve impulsive and the trajectory chaotic (the
    pre-fix version launched the ball at hundreds of m/s in a
    direction that depended on solver rounding).

    Ball density 400 (not lighter): explicit two-way coupling has a
    per-step feedback gain ~ (fluid pressure response) / (body mass) —
    at density 100 this configuration sits at the stability margin and
    a host FP-instruction change (observed when this box's CPU type
    changed: the settle oscillation grew +0.2 -> -0.4 -> +3.3 -> -8.9
    -> +207 m/s) tips it into divergence. The reference's explicit
    coupling (`fluids_pipeline.rs:263-287`) is conditionally stable the
    same way; 400 keeps the buoyancy claim (< 1000) with 4x the
    inertia, comfortably inside the stable region on any host."""
    pip = _pipeline()
    pos = cube_positions_block()
    center = np.array([0.0, 0.3], np.float32)
    keep = np.linalg.norm(pos - center, axis=1) > 0.1 + 2 * RADIUS
    pip.liquid_world.add_fluid(Fluid(pos[keep], density0=1000.0))

    floor = np.stack(
        [np.arange(-0.6, 0.6, 2 * RADIUS),
         np.full(12, -2 * RADIUS)[: len(np.arange(-0.6, 0.6, 2 * RADIUS))]],
        axis=-1,
    ).astype(np.float32)
    pip.liquid_world.add_boundary(Boundary(floor))

    body = pip.bodies.add_body("dynamic", translation=tuple(center))
    shape = shapes.Ball(0.1)
    co = pip.bodies.add_collider(body, shape, density=400.0)
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    samples = shape_surface_sample(shape, RADIUS, 2)
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.static_sampling(samples)
    )

    b = pip.bodies.bodies[body]
    pip.step((0.0, -9.81), 1.0 / 200.0)
    # One step in, the claim is deterministic: the net pressure feedback
    # on the buoyant ball points UP and holds it above free fall.
    f = np.asarray(pip.liquid_world.boundary_forces(bo))
    assert f.sum(axis=0)[1] > 0.0, f.sum(axis=0)
    assert b.linvel[1] > -9.81 / 200.0, b.linvel
    # A few more steps through the column's settling transient: the
    # body must stay bounded and finite (a freshly spawned SPH column
    # oscillates, so the trajectory itself is not asserted).
    for _ in range(4):
        pip.step((0.0, -9.81), 1.0 / 200.0)
    assert abs(b.linvel[1]) < 5.0, b.linvel
    f = pip.liquid_world.boundary_forces(bo)
    assert np.isfinite(f).all()


def cube_positions_block():
    xs = np.arange(-0.5, 0.5, 2 * RADIUS)
    ys = np.arange(0.0, 0.6, 2 * RADIUS)
    g = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    return g.astype(np.float32)


def test_unregister_coupling():
    pip = _pipeline()
    body = pip.bodies.add_body("fixed")
    co = pip.bodies.add_collider(body, shapes.Ball(0.2))
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.static_sampling(np.zeros((4, 2), np.float32))
    )
    assert pip.coupling.unregister_coupling(co) == bo
    assert pip.coupling.unregister_coupling(co) is None


def test_rigid_bodies_rest_on_static_floor():
    """With fluid absent, dropped dynamic bodies come to rest ON a fixed
    floor instead of falling through (the role rapier plays in
    `examples3d/basic3.rs:43-116`)."""
    from salva_tpu.coupling.rigid_body import RigidBodyWorld

    world = RigidBodyWorld(dim=3)
    ground = world.add_body("fixed", translation=(0.0, -0.1, 0.0))
    world.add_collider(ground, shapes.Cuboid((2.0, 0.1, 2.0)))
    rad = 0.2
    cube = world.add_body("dynamic", translation=(0.0, 1.0, 0.0))
    world.add_collider(cube, shapes.Cuboid((rad, rad, rad)), density=800.0)
    ball = world.add_body("dynamic", translation=(1.0, 1.5, 0.0))
    world.add_collider(ball, shapes.Ball(rad), density=800.0)

    dt = 1.0 / 100.0
    for _ in range(250):
        world.step(dt, (0.0, -9.81, 0.0))

    for handle in (cube, ball):
        b = world.bodies[handle]
        # Resting on the floor top (y=0) within sampling tolerance, not
        # fallen through, and essentially motionless.
        assert b.translation[1] > 0.5 * rad, b.translation
        assert b.translation[1] < 2.0 * rad, b.translation
        assert float(np.linalg.norm(b.linvel)) < 0.1, b.linvel


def test_rigid_body_friction_stops_slide():
    """A box sliding on the floor is slowed by Coulomb friction."""
    from salva_tpu.coupling.rigid_body import RigidBodyWorld

    world = RigidBodyWorld(dim=2)
    ground = world.add_body("fixed", translation=(0.0, -0.1))
    world.add_collider(ground, shapes.Cuboid((10.0, 0.1)))
    box = world.add_body("dynamic", translation=(0.0, 0.2))
    world.add_collider(box, shapes.Cuboid((0.2, 0.2)), density=800.0)
    world.bodies[box].linvel = np.array([2.0, 0.0], np.float32)

    dt = 1.0 / 100.0
    for _ in range(300):
        world.step(dt, (0.0, -9.81))
    b = world.bodies[box]
    assert abs(b.linvel[0]) < 0.05, b.linvel
    assert b.translation[1] > 0.05, b.translation


def test_dynamic_bodies_stack():
    """Two dropped boxes stack on each other instead of interpenetrating
    (dynamic-dynamic contacts, rapier's role in
    `examples2d/basic2.rs:105-131`)."""
    from salva_tpu.coupling.rigid_body import RigidBodyWorld

    world = RigidBodyWorld(dim=3)
    ground = world.add_body("fixed", translation=(0.0, -0.1, 0.0))
    world.add_collider(ground, shapes.Cuboid((2.0, 0.1, 2.0)))
    rad = 0.2
    lower = world.add_body("dynamic", translation=(0.0, 0.35, 0.0))
    world.add_collider(lower, shapes.Cuboid((rad, rad, rad)), density=800.0)
    upper = world.add_body("dynamic", translation=(0.02, 1.0, 0.0))
    world.add_collider(upper, shapes.Cuboid((rad, rad, rad)), density=800.0)

    dt = 1.0 / 100.0
    for _ in range(300):
        world.step(dt, (0.0, -9.81, 0.0))

    lo, up = world.bodies[lower], world.bodies[upper]
    # Lower box rests on the floor; upper box rests ON the lower box
    # (about one box height above it), not inside/through it.
    assert 0.5 * rad < lo.translation[1] < 2.0 * rad, lo.translation
    gap = up.translation[1] - lo.translation[1]
    assert gap > 1.5 * rad, (lo.translation, up.translation)
    assert float(np.linalg.norm(up.linvel)) < 0.2, up.linvel


def test_dynamic_pair_momentum_conserved():
    """A moving box hitting a resting box transfers momentum through
    equal/opposite impulses (no gravity, no statics)."""
    from salva_tpu.coupling.rigid_body import RigidBodyWorld

    world = RigidBodyWorld(dim=2)
    world.friction = 0.0
    a = world.add_body("dynamic", translation=(-0.5, 0.0))
    world.add_collider(a, shapes.Cuboid((0.2, 0.2)), density=1000.0)
    b = world.add_body("dynamic", translation=(0.5, 0.0))
    world.add_collider(b, shapes.Cuboid((0.2, 0.2)), density=1000.0)
    world.bodies[a].linvel = np.array([2.0, 0.0], np.float32)

    dt = 1.0 / 200.0
    p0 = world.bodies[a].mass * world.bodies[a].linvel[0]
    for _ in range(120):
        world.step(dt, (0.0, 0.0))
    ba, bb = world.bodies[a], world.bodies[b]
    p1 = ba.mass * ba.linvel[0] + bb.mass * bb.linvel[0]
    assert abs(p1 - p0) < 0.05 * abs(p0), (p0, p1)
    # The hit body actually moved.
    assert bb.translation[0] > 0.5, bb.translation


# -- device-resident coupling (coupling/device_pipeline.py) ----------------


def _device_pipeline(dim=2):
    return FluidsPipeline(RADIUS, 2.0, dim=dim, neighbors=NB,
                          device_coupling=True)


def test_device_static_sampling_tracks_body():
    """Device path: boundary particles follow the (device-integrated)
    collider pose with body point velocities — no host round trips."""
    pip = _device_pipeline()
    body = pip.bodies.add_body("dynamic", translation=(0.0, 1.0))
    shape = shapes.Ball(0.2)
    co = pip.bodies.add_collider(body, shape)
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    samples = shape_surface_sample(shape, RADIUS, 2)
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.static_sampling(samples)
    )
    pip.bodies.bodies[body].linvel = np.array([1.0, 0.0], np.float32)

    pip.step((0.0, 0.0), 0.1)
    pts = pip.liquid_world.boundary_positions(bo)
    assert len(pts) == len(samples)
    assert abs(pts[:, 0].mean() - 0.1) < 1e-5
    assert abs(pts[:, 1].mean() - 1.0) < 1e-5
    # sync_to_host reflects the device pose on the host objects.
    pip.sync_bodies()
    assert abs(pip.bodies.bodies[body].translation[0] - 0.1) < 1e-5


def test_device_dynamic_sampling_depenetrates_and_emits():
    """Device path: depenetration + on-device emission compaction into
    the reserved boundary slot block."""
    pip = _device_pipeline()
    fl = pip.liquid_world.add_fluid(
        Fluid(np.array([[0.0, 0.45]], np.float32),
              velocities=np.array([[0.0, -1.0]], np.float32))
    )
    body = pip.bodies.add_body("fixed")
    co = pip.bodies.add_collider(body, shapes.Cuboid((2.0, 0.5)))
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.dynamic_contact_sampling(max_samples=16)
    )

    pip.step((0.0, 0.0), 1.0 / 200.0)
    pos = pip.liquid_world.fluid_positions(fl)
    assert pos[0, 1] >= 0.5 - 1e-5
    alive = np.asarray(pip.liquid_world.boundaries_state.alive)
    slots = np.where(
        pip.liquid_world._boundary_slot_owner == bo
    )[0]
    assert alive[slots].sum() == 1  # exactly the one emitted projection


def test_device_transmit_forces_pushes_dynamic_body():
    """Device path: pressure feedback becomes body impulses on device.

    Same well-posed scenario as the host-path twin: fluid excavated
    around the ball, single-step directional claim, bounded settle."""
    pip = _device_pipeline()
    pos = cube_positions_block()
    center = np.array([0.0, 0.3], np.float32)
    keep = np.linalg.norm(pos - center, axis=1) > 0.1 + 2 * RADIUS
    pip.liquid_world.add_fluid(Fluid(pos[keep], density0=1000.0))
    floor = np.stack(
        [np.arange(-0.6, 0.6, 2 * RADIUS),
         np.full(12, -2 * RADIUS)[: len(np.arange(-0.6, 0.6, 2 * RADIUS))]],
        axis=-1,
    ).astype(np.float32)
    pip.liquid_world.add_boundary(Boundary(floor))

    body = pip.bodies.add_body("dynamic", translation=tuple(center))
    shape = shapes.Ball(0.1)
    co = pip.bodies.add_collider(body, shape, density=400.0)
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 2))))
    samples = shape_surface_sample(shape, RADIUS, 2)
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.static_sampling(samples)
    )

    pip.step((0.0, -9.81), 1.0 / 200.0)
    b = pip.sync_bodies().bodies[body]
    assert b.linvel[1] > -9.81 / 200.0, b.linvel
    for _ in range(4):
        pip.step((0.0, -9.81), 1.0 / 200.0)
    b = pip.sync_bodies().bodies[body]
    assert abs(b.linvel[1]) < 5.0, b.linvel
    assert np.isfinite(pip.liquid_world.boundary_forces(bo)).all()


def test_device_bodies_rest_and_stack():
    """Device contact solver: a dropped box rests on a fixed floor and a
    second box stacks on it (incl. dynamic-dynamic contacts on device)."""
    pip = _device_pipeline(dim=3)
    ground = pip.bodies.add_body("fixed", translation=(0.0, -0.1, 0.0))
    pip.bodies.add_collider(ground, shapes.Cuboid((2.0, 0.1, 2.0)))
    rad = 0.2
    lower = pip.bodies.add_body("dynamic", translation=(0.0, 0.35, 0.0))
    pip.bodies.add_collider(lower, shapes.Cuboid((rad, rad, rad)),
                            density=800.0)
    upper = pip.bodies.add_body("dynamic", translation=(0.02, 1.0, 0.0))
    pip.bodies.add_collider(upper, shapes.Cuboid((rad, rad, rad)),
                            density=800.0)

    dt = 1.0 / 100.0
    for _ in range(250):
        pip.step((0.0, -9.81, 0.0), dt)
    bodies = pip.sync_bodies()
    lo, up = bodies.bodies[lower], bodies.bodies[upper]
    assert 0.5 * rad < lo.translation[1] < 2.0 * rad, lo.translation
    gap = up.translation[1] - lo.translation[1]
    assert gap > 1.5 * rad, (lo.translation, up.translation)
    assert float(np.linalg.norm(up.linvel)) < 0.3, up.linvel
