"""Dense+spill pair structure (config.dense_spill_columns).

The spill structure routes over-cap ranks through compact spill columns
appended to the column axis; these tests force engagement with tiny caps
so the gathered spill blocks carry real pairs, and compare against the
gather path (itself property-tested against O(N^2) search).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from salva_tpu.config import DFSPHConfig, NeighborConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05
DOMAIN_2D = ((-1.5, -0.5), (1.5, 2.0))
DT = 1.0 / 200.0
G2 = (0.0, -9.81)


def test_spill_bin_roundtrip():
    # 20 particles in one cell, cap 4 (spill rows = min(8, cap) = 4):
    # ranks 0..7 held, 12 dropped and counted.
    spec = dg.spec_for_aabb((0.0, 0.0), (1.0, 1.0), 10.0, cap=4)
    pos = jnp.zeros((20, 2), jnp.float32)
    binned = dg.bin_particles(
        spec, pos, jnp.ones((20,), bool), spill_cols=8
    )
    C = spec.num_cells
    assert binned.mask.shape == (4, C + 8 + 1)
    assert int(binned.mask[:, :C].sum()) == 4
    assert int(binned.mask[:, C:].sum()) == 4
    assert int(binned.overflow) == 12
    assert int(binned.spill_col_overflow) == 0
    assert int((binned.spill_cells < C).sum()) == 1
    vals = jnp.arange(20, dtype=jnp.float32)
    grid = dg.to_grid(dg.ActiveSpec(C + 9, 4), binned, vals, fill=-1.0)
    back = dg.from_grid(dg.ActiveSpec(C + 9, 4), binned, grid, default=-7.0)
    kept = np.asarray(binned.in_grid)
    np.testing.assert_array_equal(
        np.asarray(back)[kept], np.asarray(vals)[kept]
    )
    assert kept.sum() == 8


def test_spill_col_overflow_counted():
    # Two over-cap cells but a 1-column spill table: one cell's over-rank
    # particles are dropped AND the dropped column is counted.
    spec = dg.spec_for_aabb((0.0, 0.0), (4.0, 4.0), 1.0, cap=2)
    pos = np.zeros((12, 2), np.float32)
    pos[6:, 0] = 2.5  # second cell
    binned = dg.bin_particles(
        spec, jnp.asarray(pos), jnp.ones((12,), bool), spill_cols=1
    )
    assert int(binned.spill_col_overflow) == 1
    # cell 1: 2 main + 2 spill kept, 2 beyond spill rows; cell 2: 2 main
    # kept, its spill column dropped -> 4 lost.
    assert int(binned.overflow) == 6
    # exactly one spill column used
    assert int((binned.spill_cells < spec.num_cells).sum()) == 1


def _dam_world_2d(layout, cap=None, spill=None, k=None):
    """8x8 block at 1.5r spacing (compressed past rest density, ~7 per
    h-cell, worst-case alignment 9): with cap 5 every occupied cell
    spills ranks at t=0 and the block relaxes outward over the run —
    spill-heavy early steps, spill->main migration later, representable
    occupancy 10 covers the worst alignment so nothing is dropped."""
    world = LiquidWorld(
        solver=DFSPHConfig(),
        particle_radius=RADIUS,
        dim=2,
        neighbors=NeighborConfig(max_neighbors=96, max_candidates=256,
                                 query_chunk=4096),
        domain=DOMAIN_2D,
        layout=layout,
        dense_cap=cap,
        dense_cap_boundary=16 if cap is not None else None,
        fit_grid=False,
    )
    if spill:
        world.sim = world.sim.replace(dense_spill_columns=spill)
    if k:
        world.sim = world.sim.replace(dense_spill_k=k)
    xs = (np.arange(8) * 1.5 * RADIUS).astype(np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    pos += np.asarray([-0.9, 0.02], np.float32)
    fl = world.add_fluid(Fluid(pos, density0=1000.0))
    xsf = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xsf, np.full_like(xsf, -2 * RADIUS)], axis=-1)
    bd = world.add_boundary(Boundary(floor))
    return world, fl, bd


def test_spill_matches_gather_2d():
    """cap 5 on a ~7-per-cell compressed 2D lattice: every occupied cell
    spills, so all four pair-block classes (main/spill x main/spill)
    carry real pairs; trajectories and contact counts must match the
    gather path. K=9 (all offsets) because spill cells are everywhere
    here."""
    wg, flg, bdg = _dam_world_2d("gather")
    wd, fld, bdd = _dam_world_2d("dense", cap=5, spill=128, k=9)
    for _ in range(10):
        wg.step(DT, G2)
        wd.step(DT, G2)
        assert int(wd.last_diagnostics.neighbor_overflow) == 0
    np.testing.assert_allclose(
        wg.fluid_positions(flg), wd.fluid_positions(fld), atol=5e-4
    )
    np.testing.assert_allclose(
        wg.fluid_velocities(flg), wd.fluid_velocities(fld), atol=5e-3
    )
    np.testing.assert_allclose(
        wg.boundary_forces(bdg).sum(axis=0),
        wd.boundary_forces(bdd).sum(axis=0), rtol=2e-2, atol=1.0,
    )
    dg_, dd = wg.last_diagnostics, wd.last_diagnostics
    assert int(dd.ncontacts_ff) == int(dg_.ncontacts_ff)
    assert int(dd.ncontacts_fb) == int(dg_.ncontacts_fb)
    assert int(dd.spill_overflow) == 0
    # the spill structure was actually engaged: at t=0 the compressed
    # lattice holds ~7 per cell > cap 5 (the block relaxes below the
    # cap as it spreads, so check the initial state).
    sim_eff = wd._effective_sim()
    from salva_tpu.step import _dense_config

    spec_f, _, _ = _dense_config(sim_eff, wd.solver_config, wd._force_set)
    xs = (np.arange(8) * 1.5 * RADIUS).astype(np.float32)
    pos0 = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    pos0 += np.asarray([-0.9, 0.02], np.float32)
    b = dg.bin_particles(
        spec_f, jnp.asarray(pos0), jnp.ones((len(pos0),), bool),
        spill_cols=128,
    )
    assert int((b.spill_cells < spec_f.num_cells).sum()) > 0


def test_spill_matches_plain_dense_2d():
    """cap 5 + spill vs the plain cap-16 dense path: same physics, only
    summation order differs."""
    wp, flp, _ = _dam_world_2d("dense", cap=16)
    ws, fls, _ = _dam_world_2d("dense", cap=5, spill=128, k=9)
    for _ in range(10):
        wp.step(DT, G2)
        ws.step(DT, G2)
    np.testing.assert_allclose(
        wp.fluid_positions(flp), ws.fluid_positions(fls), atol=5e-4
    )
    assert int(ws.last_diagnostics.neighbor_overflow) == 0


def test_spill_deterministic():
    runs = []
    for _ in range(2):
        w, fl, _ = _dam_world_2d("dense", cap=5, spill=128, k=9)
        for _ in range(5):
            w.step(DT, G2)
        runs.append(np.asarray(w.fluid_positions(fl)))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_spill_fb_fallback_matches_gather(monkeypatch):
    """With the sparse fb hoist disabled (dense_fb_columns=None), the
    roll fb hoist runs on the main slice plus the gathered spill-i
    boundary block — trajectories must still match."""
    wg, flg, bdg = _dam_world_2d("gather")
    wd, fld, bdd = _dam_world_2d("dense", cap=5, spill=128, k=9)
    monkeypatch.setattr(
        type(wd), "_resolved_fb_columns", lambda self, sim: None
    )
    for _ in range(10):
        wg.step(DT, G2)
        wd.step(DT, G2)
    np.testing.assert_allclose(
        wg.fluid_positions(flg), wd.fluid_positions(fld), atol=5e-4
    )
    assert int(wd.last_diagnostics.ncontacts_fb) == int(
        wg.last_diagnostics.ncontacts_fb
    )


def test_spill_matches_gather_3d():
    """3D block at cap 6 (8-per-cell lattice: every cell spills 2;
    representable occupancy 12 covers settling compression)."""
    domain = ((-0.6, -0.3, -0.6), (0.6, 1.0, 0.6))

    def build(layout, cap=None, spill=None):
        w = LiquidWorld(
            solver=DFSPHConfig(), particle_radius=RADIUS, dim=3,
            neighbors=NeighborConfig(max_neighbors=64, max_candidates=224,
                                     query_chunk=4096),
            domain=domain, layout=layout, dense_cap=cap,
            dense_cap_boundary=32 if cap is not None else None,
            fit_grid=False,
        )
        if spill:
            w.sim = w.sim.replace(dense_spill_columns=spill,
                                  dense_spill_k=27)
        pos = cube_positions(5, RADIUS, 3, origin=(-0.2, 0.1, -0.2))
        fl = w.add_fluid(Fluid(pos, density0=1000.0))
        xs = np.arange(-0.5, 0.5, 2 * RADIUS, dtype=np.float32)
        gx, gz = np.meshgrid(xs, xs, indexing="ij")
        floor = np.stack(
            [gx.ravel(), np.full(gx.size, -2 * RADIUS, np.float32),
             gz.ravel()], axis=-1,
        )
        bd = w.add_boundary(Boundary(floor))
        return w, fl, bd

    wg, flg, _ = build("gather")
    wd, fld, _ = build("dense", cap=6, spill=256)
    for _ in range(8):
        wg.step(DT, (0.0, -9.81, 0.0))
        wd.step(DT, (0.0, -9.81, 0.0))
        assert int(wd.last_diagnostics.neighbor_overflow) == 0
    np.testing.assert_allclose(
        wg.fluid_positions(flg), wd.fluid_positions(fld), atol=5e-4
    )
    dd = wd.last_diagnostics
    assert int(dd.ncontacts_ff) == int(wg.last_diagnostics.ncontacts_ff)
    assert int(dd.spill_overflow) == 0


def test_auto_tier_picks_spill():
    """A 3D lattice (occupancy 8 > 5) resolves to the plain 16 tier by
    default, and to the 12 tier with an auto-sized spill table when the
    spill structure is opted in (dense_spill_auto; measured slower than
    the 16 tier on the TPU dam break, so not default)."""
    domain = ((-0.6, -0.3, -0.6), (0.6, 1.0, 0.6))
    pos = cube_positions(5, RADIUS, 3, origin=(-0.2, 0.1, -0.2))

    w = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=3,
        domain=domain, layout="dense", fit_grid=False,
    )
    w.add_fluid(Fluid(pos, density0=1000.0))
    sim_eff = w._effective_sim()
    assert sim_eff.dense_cap == 16
    assert sim_eff.dense_spill_columns is None

    w2 = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=3,
        domain=domain, layout="dense", fit_grid=False,
    )
    w2.sim = w2.sim.replace(dense_spill_auto=True)
    w2.add_fluid(Fluid(pos, density0=1000.0))
    sim_eff2 = w2._effective_sim()
    assert sim_eff2.dense_cap == 12
    assert sim_eff2.dense_spill_columns == 512
