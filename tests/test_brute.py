"""Brute all-pairs tier (layout="brute", geometry.dense_grid.brute_spec).

The brute tier replaces spatial binning with one exact masked
capacity^2 pair block, formulated as a 1D cyclic grid so the whole
dense roll machinery is reused (offset k pairs cell c with cell
c+k mod C — every unordered cell pair exactly once). These tests pin
the binding round-trip and compare full trajectories against the
gather path (itself property-tested against O(N^2) search), covering
boundaries, dense pair forces, 2D, IISPH and on-device emit/delete —
the small-scene configurations the tier auto-serves on accelerators
(faucet3 / basic3 / surface_tension3; `examples3d/faucet3.rs:69-105`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from salva_tpu import forces, shapes
from salva_tpu.config import DFSPHConfig, IISPHConfig, NeighborConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.sampling import shape_surface_sample
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05
DT = 1.0 / 200.0
G3 = (0.0, -9.81, 0.0)
NB = NeighborConfig(max_neighbors=64, max_candidates=224, query_chunk=65536)


def test_brute_bin_roundtrip():
    spec = dg.brute_spec(100, cells=8)
    assert spec.brute and spec.dims == (8,) and spec.cap == 13
    alive = jnp.arange(100) % 3 != 0
    binned = dg.bin_particles_brute(spec, alive)
    assert int(binned.overflow) == 0 and int(binned.clamped) == 0
    assert int(binned.mask.sum()) == int(alive.sum())
    vals = jnp.arange(100, dtype=jnp.float32)
    grid = dg.to_grid(spec, binned, vals, fill=-1.0)
    back = dg.from_grid(spec, binned, grid, default=-7.0)
    kept = np.asarray(binned.in_grid)
    np.testing.assert_array_equal(
        np.asarray(back)[kept], np.asarray(vals)[kept]
    )
    np.testing.assert_array_equal(kept, np.asarray(alive))
    # Mis-sized spec (cap below capacity / cells) surfaces as overflow.
    tiny = dg.DenseGridSpec(
        origin=(0.0,), dims=(8,), cap=2, cell_width=1.0, brute=True
    )
    over = dg.bin_particles_brute(tiny, jnp.ones((100,), bool))
    assert int(over.overflow) == 100 - 16


def _dam_world(layout, solver=None, np_forces=(), dim=3, n=5):
    solver = solver or DFSPHConfig()
    if dim == 3:
        domain = ((-1.0, -0.4, -1.0), (1.0, 2.0, 1.0))
    else:
        domain = ((-1.0, -0.4), (1.0, 2.0))
    w = LiquidWorld(
        solver=solver, particle_radius=RADIUS, dim=dim, neighbors=NB,
        domain=domain, layout=layout, fit_grid=False,
    )
    pos = cube_positions(n, RADIUS, dim)
    pos[:, 1] += 0.4
    vel = np.zeros_like(pos)
    vel[:, 1] = -2.0
    w.add_fluid(
        Fluid(pos, density0=1000.0, velocities=vel,
              nonpressure_forces=list(np_forces))
    )
    if dim == 3:
        box = shapes.Cuboid((0.8, 0.1, 0.8))
    else:
        box = shapes.Cuboid((0.8, 0.1))
    s = shape_surface_sample(box, RADIUS, dim)
    s[:, 1] -= 0.1
    w.add_boundary(Boundary(s))
    return w


def _run_pair(layout_a, layout_b, steps=10, **kw):
    wa, wb = _dam_world(layout_a, **kw), _dam_world(layout_b, **kw)
    g = G3 if kw.get("dim", 3) == 3 else G3[:2]
    for i in range(steps):
        wa.step(DT, g)
        wb.step(DT, g)
        da, db = wa.last_diagnostics, wb.last_diagnostics
        if i == 0:
            # First step runs both paths on BITWISE-identical inputs:
            # contact counts must match exactly (both gate on
            # r2 <= h^2 with the same summation order).
            assert int(da.ncontacts_ff) == int(db.ncontacts_ff)
            assert int(da.ncontacts_fb) == int(db.ncontacts_fb)
    pa = np.asarray(wa.fluids_state.positions)
    pb = np.asarray(wb.fluids_state.positions)
    alive = np.asarray(wa.fluids_state.alive)
    np.testing.assert_allclose(pa[alive], pb[alive], atol=2e-6)
    assert int(da.solver.pressure_iters) == int(db.solver.pressure_iters)
    assert int(da.solver.divergence_iters) == int(db.solver.divergence_iters)
    assert int(db.neighbor_overflow) == 0
    # Late-step counts: the lattice ICs keep pairs EXACTLY at r = h
    # (W(h) = 0, so they carry no force), and the two trajectories
    # diverge in low-order bits — tie pairs round in/out of the
    # r2 <= h^2 gate differently per path. Tolerate only that.
    for ka, kb in ((da.ncontacts_ff, db.ncontacts_ff),
                   (da.ncontacts_fb, db.ncontacts_fb)):
        ca, cb = int(ka), int(kb)
        assert abs(ca - cb) <= max(16, 0.03 * max(ca, cb)), (ca, cb)
    return wa, wb


def test_brute_matches_gather_dfsph_3d():
    _run_pair("gather", "brute")


def test_brute_matches_gather_2d():
    _run_pair("gather", "brute", dim=2, n=8)


def test_brute_matches_gather_iisph():
    _run_pair("gather", "brute", solver=IISPHConfig())


def test_brute_matches_gather_pair_forces():
    # XSPH + Akinci tension: the dense force folds on the cyclic views
    # (the faucet3 / surface_tension3 configuration).
    _run_pair(
        "gather", "brute",
        np_forces=(forces.XSPHViscosity(0.5, 0.0),
                   forces.Akinci2013SurfaceTension(1.0, 10.0)),
    )


def test_brute_emit_delete():
    # Emitter + deletion through the alive mask (`faucet3.rs:69-105`):
    # the identity binding must track mask flips exactly.
    w = _dam_world("brute")
    wg = _dam_world("gather")
    fl = 0
    tpl = cube_positions(2, RADIUS, 3) + np.asarray([0.3, 1.0, 0.3])
    for i in range(6):
        if i == 2:
            w.emit_particles(fl, tpl)
            wg.emit_particles(fl, tpl)
        if i == 4:
            w.delete_where(fl, lambda p, v: p[:, 1] > 0.9)
            wg.delete_where(fl, lambda p, v: p[:, 1] > 0.9)
        w.step(DT, G3)
        wg.step(DT, G3)
    a_b = np.asarray(w.fluids_state.alive)
    a_g = np.asarray(wg.fluids_state.alive)
    np.testing.assert_array_equal(a_b, a_g)
    np.testing.assert_allclose(
        np.asarray(w.fluids_state.positions)[a_b],
        np.asarray(wg.fluids_state.positions)[a_g],
        atol=2e-6,
    )


def test_brute_determinism():
    # Bitwise reproducibility (SURVEY §5.2): identical inputs, identical
    # bits — the identity binding has no sort or scatter races.
    runs = []
    for _ in range(2):
        w = _dam_world("brute")
        for _ in range(5):
            w.step(DT, G3)
        runs.append(np.asarray(w.fluids_state.positions))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_brute_auto_resolution():
    # Auto stays off on CPU (the N^2 flops only pay on accelerators);
    # explicit layout="brute" engages anywhere. The resolved sim carries
    # capacity-derived cyclic caps and no grid machinery.
    w = _dam_world("brute")
    sim = w._effective_sim()
    assert sim.layout == "brute"
    cells = sim.brute_cells
    assert sim.dense_cap * cells >= w.fluids_state.capacity
    assert sim.dense_cap_boundary * cells >= w.boundaries_state.capacity
    assert sim.fitted_dims is None and sim.use_pallas is False
    w2 = _dam_world("auto")
    assert w2._effective_sim().layout != "brute"  # CPU backend
