"""Golden-run smoke tests of the reference example scenes (SURVEY.md §4):
each scene steps headless with basic physical invariants — finite state,
bounded density error, expected particle counts."""

import numpy as np
import pytest

from salva_tpu import scenes as scn


def _run_and_check(scene, steps=2):
    scn.run(scene, steps)
    total = 0
    for h in scene.fluid_handles:
        pos = scene.world.fluid_positions(h)
        assert np.isfinite(pos).all()
        total += len(pos)
    d = scene.world.last_diagnostics
    assert np.isfinite(float(d.solver.pressure_error))
    return total


@pytest.mark.parametrize(
    "name",
    [
        "surface_tension2",
        "custom_forces2",
        "custom_forces3",
        "faucet3",
        "layers2",
        "elasticity2",
    ],
)
def test_scene_smoke(name):
    scene = scn.SCENES[name]()
    _run_and_check(scene, steps=2)


def test_basic3_small():
    """basic3 at reduced size: the fluid must stay inside the box walls."""
    scene = scn.basic3(nparticles=6)
    _run_and_check(scene, steps=5)
    pos = scene.world.fluid_positions(scene.fluid_handles[0])
    assert np.abs(pos[:, [0, 2]]).max() < 2.6


def test_faucet3_emits_and_deletes():
    scene = scn.faucet3()
    scn.run(scene, 2)
    n1 = len(scene.world.fluid_positions(scene.fluid_handles[0]))
    assert n1 > 0  # emitter ran


def test_custom_force_attracts():
    """custom_forces3: with zero gravity, the attractors at x=+-1 pull the
    centered cube outward along x (`custom_forces3.rs:30-42`)."""
    scene = scn.custom_forces3()
    scn.run(scene, 10)
    pos = scene.world.fluid_positions(scene.fluid_handles[0])
    v = scene.world.fluid_velocities(scene.fluid_handles[0])
    assert np.isfinite(pos).all()
    # Particles nearer +x attractor get pulled +x, and vice versa.
    assert v[pos[:, 0] > 0.05, 0].mean() > 0.0
    assert v[pos[:, 0] < -0.05, 0].mean() < 0.0


def test_scene_registry_complete():
    """All 11 reference scenes + the harness are available."""
    expected = {
        "basic2", "basic3", "layers2", "surface_tension2",
        "surface_tension3", "elasticity2", "elasticity3",
        "custom_forces2", "custom_forces3", "faucet3", "heightfield3",
        "harness_basic3",
    }
    assert expected.issubset(set(scn.SCENES))
