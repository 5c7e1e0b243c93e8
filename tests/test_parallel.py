"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4, §2.3):
the sharded step must compile, execute collectives, and agree with the
single-device result."""

import jax
import numpy as np
import pytest

from salva_tpu.parallel import make_mesh, shard_states, state_shardings


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    import __graft_entry__ as g

    step_fn, args = g._dam_break(6)
    fluids, boundaries, solver_state, es, dt, gravity = args

    ref = jax.jit(step_fn)(fluids, boundaries, solver_state, es, dt, gravity)
    ref_pos = np.asarray(ref[0].positions)

    mesh = make_mesh(8)
    sf, sb, ss = shard_states(mesh, fluids, boundaries, solver_state)
    out = jax.jit(step_fn)(sf, sb, ss, es, dt, gravity)
    out_pos = np.asarray(out[0].positions)

    # Sharded execution reassociates reductions; tolerance is float32-level.
    np.testing.assert_allclose(ref_pos, out_pos, atol=1e-5, rtol=1e-5)
    # Output stays sharded across the mesh.
    assert len(out[0].positions.sharding.device_set) == 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
