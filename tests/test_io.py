"""Checkpoint/resume round-trip (SURVEY.md §5.4)."""

import numpy as np

from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.io import load_world, save_world
from salva_tpu import forces
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05
NB = NeighborConfig(max_neighbors=40, max_candidates=128, query_chunk=4096)


def _world():
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2, neighbors=NB
    )
    pos = cube_positions(6, RADIUS, 2, origin=(-0.3, 0.02))
    fl = world.add_fluid(
        Fluid(pos, density0=1000.0,
              nonpressure_forces=[forces.XSPHViscosity(0.5, 0.0)])
    )
    xs = np.arange(-1.0, 1.0, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    world.add_boundary(Boundary(floor))
    return world, fl


def test_save_load_roundtrip(tmp_path):
    world, fl = _world()
    for _ in range(5):
        world.step(1.0 / 200.0, (0.0, -9.81))
    path = str(tmp_path / "ckpt.npz")
    save_world(world, path)

    restored = load_world(path)
    np.testing.assert_array_equal(
        world.fluid_positions(fl), restored.fluid_positions(fl)
    )

    # Resumed trajectory == uninterrupted trajectory (bitwise determinism:
    # same shapes, same program, same inputs).
    for w in (world, restored):
        for _ in range(5):
            w.step(1.0 / 200.0, (0.0, -9.81))
    np.testing.assert_array_equal(
        world.fluid_positions(fl), restored.fluid_positions(fl)
    )


def test_load_preserves_config(tmp_path):
    world, _ = _world()
    path = str(tmp_path / "ckpt.npz")
    save_world(world, path)
    restored = load_world(path)
    assert restored.solver_config == world.solver_config
    assert restored.sim == world.sim
    assert restored.num_fluids == world.num_fluids
    rec = restored._fluid_records[0]
    assert isinstance(rec.nonpressure_forces[0], forces.XSPHViscosity)


def test_load_roundtrips_particle_radius(tmp_path):
    """Per-fluid particle_radius must survive save/load: it drives the
    dense path's uniform mass channel and add_particles volumes
    (`fluid.rs:22,110-120`). Regression: restored records once defaulted
    to radius 0.0 -> zero masses after load."""
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2, neighbors=NB,
        domain=((-1.0, -0.2), (1.0, 1.5)), layout="dense",
    )
    pos = cube_positions(6, RADIUS, 2, origin=(-0.3, 0.1))
    fl = world.add_fluid(
        Fluid(pos, density0=1000.0, particle_radius=2.0 * RADIUS)
    )
    xs = np.arange(-1.0, 1.0, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    world.add_boundary(Boundary(floor))
    world.step(1.0 / 200.0, (0.0, -9.81))
    path = str(tmp_path / "ckpt.npz")
    save_world(world, path)

    restored = load_world(path)
    rec = restored._fluid_records[fl]
    assert rec.particle_radius == 2.0 * RADIUS

    # (a) the dense uniform channel after load carries the real mass
    uni = restored._uniform_particles()
    assert uni is not None and uni[1] > 0.0
    assert uni == world._uniform_particles()

    # stepping after load == stepping before save (same program/inputs)
    world.step(1.0 / 200.0, (0.0, -9.81))
    restored.step(1.0 / 200.0, (0.0, -9.81))
    np.testing.assert_array_equal(
        world.fluid_positions(fl), restored.fluid_positions(fl)
    )

    # (b) add_particles after load writes non-zero volumes
    restored.add_particles(fl, [[0.6, 0.5]])
    vols = np.asarray(restored.fluids_state.volumes)
    alive = np.asarray(restored.fluids_state.alive)
    assert (vols[alive] > 0.0).all()


def test_legacy_snapshot_falls_back_to_world_radius(tmp_path):
    """Snapshots written before per-fluid radii restore with the world
    radius instead of zero."""
    import json

    world, fl = _world()
    path = str(tmp_path / "ckpt.npz")
    save_world(world, path)
    data = dict(np.load(path))
    meta = json.loads(bytes(data["meta"]).decode())
    for r in meta["fluid_records"]:
        del r["particle_radius"]
    data["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path, **data)

    restored = load_world(path)
    assert restored._fluid_records[fl].particle_radius == RADIUS
