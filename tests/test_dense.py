"""Dense binned layout: binning round-trip + physics equivalence with the
gather path (same reference semantics, two executions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.config import DFSPHConfig, IISPHConfig, NeighborConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.world import Boundary, Fluid, LiquidWorld

from util import cube_positions

RADIUS = 0.05
H = RADIUS * 2.0 * 2.0
DOMAIN_2D = ((-1.5, -0.5), (1.5, 2.0))


def test_bin_roundtrip():
    spec = dg.spec_for_aabb((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 0.2, cap=8)
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (200, 3), jnp.float32, 0.0, 1.0)
    alive = jnp.arange(200) % 5 != 0
    binned = dg.bin_particles(spec, pos, alive)
    assert int(binned.overflow) == 0
    assert int(binned.clamped) == 0
    vals = jnp.arange(200, dtype=jnp.float32)
    grid = dg.to_grid(spec, binned, vals, fill=-1.0)
    back = dg.from_grid(spec, binned, grid, default=-7.0)
    np.testing.assert_array_equal(
        np.asarray(back)[np.asarray(alive)], np.asarray(vals)[np.asarray(alive)]
    )
    np.testing.assert_array_equal(
        np.asarray(back)[~np.asarray(alive)], -7.0
    )
    # occupancy mask counts exactly the alive particles
    assert int(binned.mask.sum()) == int(alive.sum())
    # vector round-trip
    grid3 = dg.to_grid(spec, binned, pos)
    back3 = dg.from_grid(spec, binned, grid3, default=0.0)
    np.testing.assert_allclose(
        np.asarray(back3)[np.asarray(alive)],
        np.asarray(pos)[np.asarray(alive)],
        rtol=0, atol=0,
    )


def test_bin_overflow_counted():
    spec = dg.spec_for_aabb((0.0, 0.0), (1.0, 1.0), 10.0, cap=4)
    pos = jnp.zeros((10, 2), jnp.float32)  # all in one cell, cap 4
    binned = dg.bin_particles(spec, pos, jnp.ones((10,), bool))
    assert int(binned.overflow) == 6
    assert int(binned.mask.sum()) == 4


def _dam_worlds():
    """Identical 2D dam-break scenes on the two layouts."""
    def build(layout):
        world = LiquidWorld(
            solver=DFSPHConfig(),
            particle_radius=RADIUS,
            dim=2,
            neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                     query_chunk=4096),
            domain=DOMAIN_2D,
            layout=layout,
            # Equivalence tests isolate the layout algebra; the fitted
            # window only perturbs float rounding (own test) so pin off.
            fit_grid=False,
        )
        pos = cube_positions(8, RADIUS, 2, origin=(-0.9, 0.02))
        fl = world.add_fluid(Fluid(pos, density0=1000.0))
        xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
        floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
        ys = np.arange(0.0, 1.0, 2 * RADIUS, dtype=np.float32)
        left = np.stack([np.full_like(ys, -1.2), ys], axis=-1)
        right = np.stack([np.full_like(ys, 1.2), ys], axis=-1)
        bd = world.add_boundary(
            Boundary(np.concatenate([floor, left, right]))
        )
        return world, fl, bd

    return build("gather"), build("dense")


def test_dense_matches_gather():
    (wg, flg, bdg), (wd, fld, bdd) = _dam_worlds()
    for _ in range(20):
        wg.step(1.0 / 200.0, (0.0, -9.81))
        wd.step(1.0 / 200.0, (0.0, -9.81))
    pg = wg.fluid_positions(flg)
    pd = wd.fluid_positions(fld)
    np.testing.assert_allclose(pg, pd, atol=5e-4)
    vg = wg.fluid_velocities(flg)
    vd = wd.fluid_velocities(fld)
    np.testing.assert_allclose(vg, vd, atol=5e-3)
    # Boundary force feedback agrees.
    fg = wg.boundary_forces(bdg)
    fd = wd.boundary_forces(bdd)
    np.testing.assert_allclose(fg.sum(axis=0), fd.sum(axis=0), rtol=2e-2,
                               atol=1.0)
    dg_ = wg.last_diagnostics
    dd = wd.last_diagnostics
    assert int(dd.neighbor_overflow) == 0
    assert int(dd.ncontacts_ff) == int(dg_.ncontacts_ff)


def test_dense_dfsph_viscosity_matches_gather_single_apply():
    """The implicit (strain-projection) viscosity: dense vs gather on one
    application with identical inputs. The reference's iteration is
    unstable on free blobs (upstream-acknowledged), so trajectories can't
    be compared — the pair math can.
    """
    import jax
    import jax.numpy as jnp

    from salva_tpu.config import SimConfig
    from salva_tpu.geometry import (
        build_grid, evaluate_contacts, find_neighbors, dense_grid as dgrid,
    )
    from salva_tpu.object.state import BoundariesState, FluidsState
    from salva_tpu.solver.common import StepContext
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.solver.forces_dense import DenseFields, DFSPHViscosityDense
    from salva_tpu.solver.viscosity import DFSPHViscosityForce

    dim, h, n = 2, 0.2, 36
    xs = (np.arange(6) * 0.1).astype(np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    fl = FluidsState.empty(n, dim).replace(
        positions=jnp.asarray(pos),
        velocities=jax.random.normal(jax.random.PRNGKey(1), (n, dim)) * 0.1,
        volumes=jnp.full((n,), 0.008),
        density0=jnp.full((n,), 1000.0),
        alive=jnp.ones((n,), bool),
    )
    bd = BoundariesState.empty(8, dim)
    sim = SimConfig(dim=dim, particle_radius=0.05,
                    domain=((-0.5, -0.5), (1.0, 1.0)))
    spec_f = dgrid.spec_for_aabb((-0.5, -0.5), (1.0, 1.0), h, cap=12)
    ctx = DenseCtx(sim, spec_f, spec_f.replace(cap=4), fl, bd)
    dt = jnp.float32(1.0 / 200.0)
    fields = DenseFields(
        jff=ctx.jff, jfb=ctx.jfb, jbf=ctx.jbf, n_offsets=len(ctx.offsets),
        P=ctx.P, V=ctx.V, M=ctx.M, VOL=ctx.to_f(fl.volumes), R0=ctx.R0,
        RHO=ctx.rho, FID=ctx.FID, maskf=ctx.maskf, Pb=ctx.Pb,
        Vbvel=ctx.Vbvel, Volb=ctx.Volb, maskb=ctx.maskb, h=h, dim=dim,
        dt=dt, inv_dt=jnp.float32(200.0),
        kernel_density="cubic", kernel_gradient="cubic",
    )
    a_dense, _ = DFSPHViscosityDense(
        (0.5,), (1,), max_viscosity_iter=1
    ).apply(fields)
    a_dense = np.asarray(ctx.unbin_f(a_dense, jnp.zeros_like(fl.positions)))

    gi = fl.groups()
    grid = build_grid(fl.positions, fl.alive, h, dim)
    nl = find_neighbors(fl.positions, fl.alive, gi, grid, fl.positions,
                        fl.alive, gi, h, dim, 64, 160, True,
                        query_chunk=4096)
    ff = evaluate_contacts(fl.positions, fl.positions, nl, h, dim)
    nlb = find_neighbors(fl.positions, fl.alive, gi,
                         build_grid(bd.positions, bd.alive, h, dim),
                         bd.positions, bd.alive, bd.groups(), h, dim, 8, 16,
                         False, query_chunk=4096)
    fb = evaluate_contacts(fl.positions, bd.positions, nlb, h, dim)
    sctx = StepContext(
        fluids=fl, boundaries=bd, ff=ff, fb=fb,
        densities=ctx.unbin_f(ctx.rho, fl.density0),
        dt=dt, inv_dt=jnp.float32(200.0), dim=dim, h=h, num_fluids=1,
    )
    a_gather, _ = DFSPHViscosityForce(
        (0.5,), (1,), max_viscosity_iter=1
    ).apply(sctx)
    a_gather = np.asarray(a_gather)

    assert np.isfinite(a_dense).all() and np.isfinite(a_gather).all()
    assert np.abs(a_gather).max() > 1.0  # non-trivial output
    np.testing.assert_allclose(a_dense, a_gather, rtol=2e-3, atol=1e-2)


def test_dense_iisph_matches_gather():
    def build(layout):
        world = LiquidWorld(
            solver=IISPHConfig(),
            particle_radius=RADIUS,
            dim=2,
            neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                     query_chunk=4096),
            domain=DOMAIN_2D,
            layout=layout,
            # Equivalence tests isolate the layout algebra; the fitted
            # window only perturbs float rounding (own test) so pin off.
            fit_grid=False,
        )
        pos = cube_positions(7, RADIUS, 2, origin=(-0.5, 0.02))
        fl = world.add_fluid(Fluid(pos, density0=1000.0))
        xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
        floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
        bd = world.add_boundary(Boundary(floor))
        return world, fl, bd

    wg, flg, bdg = build("gather")
    wd, fld, bdd = build("dense")
    for _ in range(15):
        wg.step(1.0 / 200.0, (0.0, -9.81))
        wd.step(1.0 / 200.0, (0.0, -9.81))
    pg = wg.fluid_positions(flg)
    pd = wd.fluid_positions(fld)
    assert np.isfinite(pd).all()
    np.testing.assert_allclose(pg, pd, atol=1e-3)
    fg = wg.boundary_forces(bdg).sum(axis=0)
    fd = wd.boundary_forces(bdd).sum(axis=0)
    np.testing.assert_allclose(fg, fd, rtol=5e-2, atol=1.0)


def test_dense_grid_mode_matches_compact():
    """The two dense indexings (full grid vs compact active cells) agree."""
    def build(compact):
        world = LiquidWorld(
            solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
            domain=DOMAIN_2D, layout="dense",
        )
        world.sim = world.sim.replace(dense_compact=compact)
        pos = cube_positions(7, RADIUS, 2, origin=(-0.6, 0.02))
        fl = world.add_fluid(Fluid(pos, density0=1000.0))
        xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
        floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
        world.add_boundary(Boundary(floor))
        return world, fl

    wg, fg = build(False)
    wc, fc = build(True)
    for _ in range(10):
        wg.step(1.0 / 200.0, (0.0, -9.81))
        wc.step(1.0 / 200.0, (0.0, -9.81))
    np.testing.assert_allclose(
        wg.fluid_positions(fg), wc.fluid_positions(fc), atol=2e-5
    )
    assert int(wc.last_diagnostics.neighbor_overflow) == 0


def test_dense_layout_requires_domain():
    with pytest.raises(ValueError):
        world = LiquidWorld(
            solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
            layout="dense",
        )
        world.add_fluid(Fluid(cube_positions(3, RADIUS, 2)))
        world.step(1.0 / 200.0, (0.0, -9.81))


def _force_world(layout, np_forces):
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                 query_chunk=4096),
        domain=DOMAIN_2D, layout=layout, fit_grid=False,
    )
    pos = cube_positions(6, RADIUS, 2, origin=(-0.3, 0.02))
    fl = world.add_fluid(
        Fluid(pos, density0=1000.0, nonpressure_forces=list(np_forces))
    )
    xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    bd = world.add_boundary(Boundary(floor))
    return world, fl, bd


def _forces_cases():
    from salva_tpu import forces as fz

    return [
        pytest.param([fz.XSPHViscosity(0.5, 0.5)], id="xsph"),
        pytest.param([fz.ArtificialViscosity(0.5, 0.3)], id="artificial"),
        pytest.param([fz.Akinci2013SurfaceTension(1.0, 1.0)], id="akinci"),
        pytest.param([fz.WCSPHSurfaceTension(1.0, 0.5)], id="wcsph"),
        pytest.param([fz.He2014SurfaceTension(1.0, 0.5)], id="he2014"),
        # Elasticity runs inside the dense substep via its static rest
        # topology (forces_dense.ParticleWiseForce).
        pytest.param([fz.Becker2009Elasticity(50_000.0, 0.3, True)],
                     id="elasticity"),
    ]


@pytest.mark.parametrize("np_forces", _forces_cases())
def test_dense_forces_match_gather(np_forces):
    wg, flg, bdg = _force_world("gather", np_forces)
    wd, fld, bdd = _force_world("dense", np_forces)
    for _ in range(10):
        wg.step(1.0 / 200.0, (0.0, -9.81))
        wd.step(1.0 / 200.0, (0.0, -9.81))
    pg = wg.fluid_positions(flg)
    pd = wd.fluid_positions(fld)
    assert np.isfinite(pd).all()
    np.testing.assert_allclose(pg, pd, atol=1e-3)
    fg = wg.boundary_forces(bdg).sum(axis=0)
    fd = wd.boundary_forces(bdd).sum(axis=0)
    np.testing.assert_allclose(fg, fd, rtol=5e-2, atol=2.0)


def test_dense_with_artificial_viscosity():
    from salva_tpu import forces

    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
        domain=DOMAIN_2D, layout="dense",
    )
    pos = cube_positions(6, RADIUS, 2, origin=(-0.5, 0.02))
    fl = world.add_fluid(
        Fluid(pos, density0=1000.0,
              nonpressure_forces=[forces.ArtificialViscosity(0.5, 0.0)])
    )
    xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    world.add_boundary(Boundary(floor))
    for _ in range(10):
        world.step(1.0 / 200.0, (0.0, -9.81))
    p = world.fluid_positions(fl)
    assert np.isfinite(p).all()
    assert p[:, 1].min() > -0.2


def _frozen_world(frozen, dtype="float32"):
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                 query_chunk=4096),
        domain=DOMAIN_2D, layout="dense",
    )
    world.sim = world.sim.replace(
        dense_frozen_pairs=frozen, dense_pair_dtype=dtype
    )
    pos = cube_positions(8, RADIUS, 2, origin=(-0.9, 0.02))
    fl = world.add_fluid(Fluid(pos, density0=1000.0))
    xs = np.arange(-1.2, 1.2, 2 * RADIUS, dtype=np.float32)
    floor = np.stack([xs, np.full_like(xs, -2 * RADIUS)], axis=-1)
    bd = world.add_boundary(Boundary(floor))
    return world, fl, bd


def test_frozen_pairs_matches_recompute():
    """The frozen pair-coefficient iteration path (s_ij = dwr * m_j
    materialized once per substep) is mathematically identical to the
    recompute path; f32 storage must agree to rounding, bf16 storage to
    its ~0.4% coefficient rounding."""
    wr, flr, _ = _frozen_world(False)
    wf, flf, _ = _frozen_world(True, "float32")
    wb, flb, _ = _frozen_world(True, "bfloat16")
    for _ in range(15):
        for w in (wr, wf, wb):
            w.step(1.0 / 200.0, (0.0, -9.81))
    pr = wr.fluid_positions(flr)
    pf = wf.fluid_positions(flf)
    pb = wb.fluid_positions(flb)
    np.testing.assert_allclose(pr, pf, atol=2e-5)
    np.testing.assert_allclose(pr, pb, atol=5e-3)
    dr, df = wr.last_diagnostics, wf.last_diagnostics
    assert int(dr.solver.pressure_iters) == int(df.solver.pressure_iters)


def test_fitted_grid_matches_full_domain():
    """The fluid-extent-fitted grid (config.fitted_dims) is a pure
    layout optimization: physics must match the full-domain grid through
    refit checkpoints, including walls that extend far outside the
    fitted box (dropped from binning: they are > h from any fluid)."""
    import numpy as np

    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    def build(fit):
        w = LiquidWorld(
            particle_radius=RADIUS, dim=2,
            neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                     query_chunk=4096),
            domain=((-4.0, -0.3), (4.0, 6.0)), layout="dense",
            fit_grid=fit,
        )
        xs = np.arange(-0.45, 0.45, 2 * RADIUS, dtype=np.float32)
        ys = np.arange(0.3, 1.2, 2 * RADIUS, dtype=np.float32)
        pos = np.stack(
            np.meshgrid(xs, ys, indexing="ij"), axis=-1
        ).reshape(-1, 2).astype(np.float32)
        fl = w.add_fluid(Fluid(pos, density0=1000.0))
        # Floor spanning the WHOLE domain: most of it sits outside the
        # fitted box and must not change anything.
        fx = np.arange(-4.0, 4.0, 2 * RADIUS, dtype=np.float32)
        floor = np.stack([fx, np.full_like(fx, -2 * RADIUS)], axis=-1)
        floor2 = floor - np.array([0.0, 2 * RADIUS], np.float32)
        w.add_boundary(Boundary(np.concatenate([floor, floor2])))
        return w, fl

    wa, fa = build(True)
    wb, fb = build(False)
    assert wa._effective_sim().fitted_dims is not None
    assert wb._effective_sim().fitted_dims is None
    for _ in range(20):  # crosses the step-16 refit checkpoint
        wa.step(1.0 / 200.0, (0.0, -9.81))
        wb.step(1.0 / 200.0, (0.0, -9.81))
    pa = wa.fluid_positions(fa)
    pb = wb.fluid_positions(fb)
    np.testing.assert_allclose(pa, pb, atol=2e-5)
    # No particle was clamped against the fitted box.
    assert int(wa.last_diagnostics.candidate_overflow) == 0


def _fit_world():
    return LiquidWorld(
        particle_radius=RADIUS, dim=2,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=160,
                                 query_chunk=4096),
        domain=((-4.0, -0.3), (4.0, 30.0)), layout="dense",
    )


def test_refit_growth_overshoots_geometrically():
    """Window growth overshoots (x1.3/axis) so a steadily spreading
    fluid recompiles O(log extent) times, not once per 4-cell crossing
    (every resize is a full XLA recompile)."""
    w = _fit_world()
    w._fitted_dims = (16, 16)
    # Extent needing 17 cells: one past the current room.
    w._refit_dims(np.array([0.0, 0.0]), np.array([17 * w.sim.h] * 2), 0.0)
    assert w.grid_refit_count == 1
    # Quantized need would be 28; the x1.3 overshoot floor is
    # ceil(16*1.3/4)*4 = 24 — dominated here, but dims must be >= both.
    assert all(d >= 24 for d in w._fitted_dims)
    big = w._fitted_dims
    # Growing by one more cell must NOT resize again (overshoot slack).
    w._refit_dims(np.array([0.0, 0.0]),
                  np.array([18 * w.sim.h] * 2), 0.0)
    assert w._fitted_dims == big and w.grid_refit_count == 1


def test_refit_overshoot_is_per_axis():
    """Only the axis that ran out of room overshoots; an axis whose
    extent collapsed (dam-break y) shrinks to its need-based size in the
    same (already-paid-for) recompile instead of being dragged up x1.3
    with the growing axis (measured 250k vs ~188k columns at 1M)."""
    w = _fit_world()
    w._fitted_dims = (16, 40)
    # x: extent 17 cells -> out of room (16 < 18 + 4); y: tiny extent.
    w._refit_dims(np.array([0.0, 0.0]),
                  np.array([17 * w.sim.h, 2 * w.sim.h]), 0.0)
    assert w.grid_refit_count == 1
    dx, dy = w._fitted_dims
    assert dx >= 24  # ceil(16 * 1.3 / 4) * 4
    assert dy <= 16  # shrunk toward need, NOT >= ceil(40 * 1.3)


def test_first_step_refits_stale_dt_window():
    """An explicit _prepare() before the first step sizes the window's
    velocity slack with the default dt (1/60); the first real step must
    redo the fit with the true dt (nothing is compiled yet) instead of
    carrying ~30% extra columns for the whole run."""
    import jax.numpy as jnp
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu import shapes
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.world import Boundary, Fluid

    def make():
        w = LiquidWorld(
            solver=DFSPHConfig(), particle_radius=RADIUS, dim=2,
            neighbors=NeighborConfig(max_neighbors=32, max_candidates=96,
                                     query_chunk=4096),
            domain=((-4.0, -0.3), (4.0, 30.0)), layout="dense",
        )
        pos = cube_fluid((8, 8), RADIUS)
        pos[:, 1] += 1.0
        vel = np.zeros_like(pos)
        vel[:, 1] = -2.0
        w.add_fluid(Fluid(pos, density0=1000.0, velocities=vel))
        box = shapes.Cuboid((2.0, 0.1))
        w.add_boundary(Boundary(shape_surface_sample(box, RADIUS, 2)))
        return w

    w = make()
    w._prepare()
    w._effective_sim()  # triggers the fit at the default dt
    stale = w._fitted_dims
    assert stale is not None
    w.step(1.0 / 200.0, (0.0, -9.81))
    fresh = w._fitted_dims
    assert fresh is not None

    w2 = make()
    w2.step(1.0 / 200.0, (0.0, -9.81))  # fit directly at the true dt
    assert fresh == w2._fitted_dims
    # and never larger than the stale-dt fit
    assert all(a <= b for a, b in zip(fresh, stale))


def test_reserve_grid_window_sets_floor():
    """reserve_grid_window pre-sizes the window to the declared corridor
    and hysteresis never shrinks below it (the reserve exists so mid-run
    growth recompiles cannot happen)."""
    w = _fit_world()
    w.reserve_grid_window((-1.0, -0.3), (1.0, 10.0))
    floor = w._fit_floor_dims
    assert floor is not None and floor[1] >= 10.0 / w.sim.h
    # A tiny live extent still yields dims >= the floor, and repeated
    # refits at that extent never resize (no shrink-below-floor churn).
    w._refit_dims(np.array([0.0, 0.0]), np.array([0.4, 0.4]), 0.0)
    c0 = w.grid_refit_count
    dims0 = w._fitted_dims
    assert dims0 is not None and all(
        d >= f for d, f in zip(dims0, floor))
    for _ in range(3):
        w._refit_dims(np.array([0.0, 0.0]), np.array([0.4, 0.4]), 0.0)
    assert w._fitted_dims == dims0 and w.grid_refit_count == c0
