"""Sparse fluid-boundary hoist (config.dense_fb_columns) vs the
full-grid roll fb hoist.

The sparse path computes the fb pair sums only over the fluid columns
adjacent to occupied boundary cells and scatters the results back into
the full grid; every other column's fb sums are exactly zero. Per-slot
contents of the compact boundary columns equal the rematerialized
full-grid columns, so the sums must match bitwise up to summation order
(counts bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.config import DFSPHConfig, SimConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.object.state import BoundariesState, FluidsState
from salva_tpu.solver.dense_common import DenseCtx


def _states(dim, n=400, nb=160):
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, dim), jnp.float32, 0.0, 1.2)
    fl = FluidsState.empty(n, dim).replace(
        positions=pos,
        velocities=jax.random.normal(jax.random.PRNGKey(1), (n, dim)),
        volumes=jnp.full((n,), 1e-3)
        * (1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(7), (n,))),
        density0=jnp.full((n,), 1000.0),
        alive=jnp.arange(n) % 7 != 0,
        fluid_id=jnp.zeros((n,), jnp.int32),
    )
    # Boundary: a floor plane near y=0 plus some dead slots, so the
    # adjacency set is a thin slab of the window.
    bpos = jax.random.uniform(jax.random.PRNGKey(3), (nb, dim), jnp.float32,
                              0.0, 1.2)
    bpos = bpos.at[:, 1].set(bpos[:, 1] * 0.08)
    bd = BoundariesState.empty(nb, dim).replace(
        positions=bpos,
        velocities=0.1 * jax.random.normal(jax.random.PRNGKey(4), (nb, dim)),
        volumes=jnp.full((nb,), 2e-3),
        alive=jnp.arange(nb) % 11 != 0,
    )
    return fl, bd


def _ctx(dim, fl, bd, fb_columns, **sim_kw):
    h = 0.2
    spec_f = dg.spec_for_aabb((0.0,) * dim, (1.2,) * dim, h, cap=16)
    spec_b = spec_f.replace(cap=8)
    sim_kw.setdefault("dense_compact", False)
    sim = SimConfig(
        dim=dim, particle_radius=0.05,
        domain=((0.0,) * dim, (1.2,) * dim),
        dense_fb_columns=fb_columns, **sim_kw,
    )
    return DenseCtx(sim, spec_f, spec_b, fl, bd)


@pytest.mark.parametrize("dim", [2, 3])
def test_fb_hoist_matches_full(dim):
    fl, bd = _states(dim)
    full = _ctx(dim, fl, bd, None)
    assert full._fb_cols() == 0
    sparse = _ctx(dim, fl, bd, 32 if dim == 2 else 256)
    assert sparse._fb_cols() > 0
    assert int(sparse._fb_adj_overflow) == 0

    for name in ("rho", "Gsum", "Sb", "sq_mm", "s2_m"):
        np.testing.assert_allclose(
            np.asarray(getattr(full, name)),
            np.asarray(getattr(sparse, name)),
            rtol=1e-5, atol=1e-7, err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(full.cnt_fb), np.asarray(sparse.cnt_fb)
    )
    np.testing.assert_array_equal(
        np.asarray(full.count), np.asarray(sparse.count)
    )


def test_fb_adjacency_overflow_counted():
    dim = 3
    fl, bd = _states(dim)
    # Table far too small: overflow must surface, not silently truncate
    # into wrong sums without a trace.
    tiny = _ctx(dim, fl, bd, 16)
    assert int(tiny._fb_adj_overflow) > 0
    assert int(tiny.bin_overflow) >= int(tiny._fb_adj_overflow)


def test_fb_sparse_gate():
    dim = 3
    fl, bd = _states(dim)
    # Near-dense adjacency tables fall back to the roll path.
    c = _ctx(dim, fl, bd, 10 ** 9)
    assert c._fb_cols() == 0
    # Compact layout: already occupancy-scaled, flag ignored.
    c2 = _ctx(dim, fl, bd, 512, dense_compact=True)
    assert c2._fb_cols() == 0


def test_world_step_matches_with_fb_sparse():
    """End-to-end: a coupled-free dam-break step with the world's
    auto-resolved dense_fb_columns equals a forced full-roll run."""
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu import shapes
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    def run(force_full):
        radius = 0.05
        world = LiquidWorld(
            solver=DFSPHConfig(), particle_radius=radius, dim=3,
            domain=((-1.0, -0.4, -1.0), (1.0, 1.6, 1.0)),
            layout="dense",
        )
        pos = cube_fluid((6, 6, 6), radius)
        pos[:, 1] += 0.35
        world.add_fluid(Fluid(pos, density0=1000.0))
        box = shapes.Cuboid((0.8, 0.1, 0.8))
        samples = shape_surface_sample(box, radius, 3)
        samples[:, 1] -= 0.1
        world.add_boundary(Boundary(samples))
        if force_full:
            # Disable through the sizing hook (None = full-roll path).
            world._resolved_fb_columns = lambda sim: None
        for _ in range(3):
            world.step(1.0 / 200.0, (0.0, -9.81, 0.0))
        assert int(world.last_diagnostics.neighbor_overflow) == 0
        return np.asarray(world.fluids_state.positions), np.asarray(
            world.fluids_state.velocities
        )

    p_full, v_full = run(True)
    p_sp, v_sp = run(False)
    np.testing.assert_allclose(p_full, p_sp, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(v_full, v_sp, rtol=1e-5, atol=1e-6)
