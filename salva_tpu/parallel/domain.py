"""Multi-device spatial domain decomposition with halo exchange.

This is the engineered counterpart of the reference's per-occupied-cell
shared-memory parallelism (``contacts.rs:222-249``), scaled out over a
device mesh (SURVEY.md §2.3 / §5.8): the dense grid's x-axis is split
into one slab per device via ``jax.shard_map``; each device computes the
O(C · cap² · 3^dim) pair passes for its slab only, and the per-iteration
solver state crosses slab borders through explicit one-cell-wide ghost
("halo") layers moved by ``jax.lax.ppermute`` over ICI. Convergence
scalars are ``psum``-reduced so every device sees the reference's global
mean-error termination rule (``dfsph_solver.rs:150-160``).

Communication per DFSPH substep (vs the round-1 GSPMD particle-axis
sharding, which all-gathered the full particle state around every pair
pass):

- per solver iteration: 2 ppermutes of the ghost stiffness layer
  ``[cap, nyz]`` + 2 of the ghost velocity-change layers
  ``[dim, cap, nyz]`` = ``2 * (1 + dim) * cap * nyz * 4`` bytes;
- once per substep: psums of the unbinned particle outputs
  (``O(N)``, the state itself).

Division of labor: particle-layout work (binning keys, scatters of the
per-particle arrays, elasticity) is replicated — each device bins all
particles but *keeps* only those in its extended slab, which doubles as
the halo fill for all substep-invariant grid arrays. The O(N log N)
binning is a few percent of the pair-pass work it parallelizes; sharded
binning with position resharding is the next scaling step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


class Halo:
    """Ghost-layer exchange for one device's extended x-slab.

    Local grid arrays are ``[..., cap, C_local]`` with
    ``C_local = (nxl + 2) * nyz``; layer 0 and layer ``nxl + 1`` are the
    ghost layers mirroring the neighbors' border cells.
    """

    def __init__(self, axis_name: str, n_dev: int, nxl: int, nyz: int):
        self.axis_name = axis_name
        self.n_dev = n_dev
        self.nxl = nxl
        self.nyz = nyz

    @property
    def x0(self):
        """First owned global x-layer of this device (traced)."""
        return jax.lax.axis_index(self.axis_name) * self.nxl

    def exchange(self, arr):
        """Refresh both ghost layers of ``[..., cap, C_local]`` from the
        neighboring devices' border (first/last interior) layers."""
        if self.n_dev == 1:
            return arr
        shape = arr.shape
        a = arr.reshape(shape[:-1] + (self.nxl + 2, self.nyz))
        # Right-going: my LAST interior layer becomes my right neighbor's
        # left ghost (layer 0). Unpaired receivers get zeros, which is
        # correct: the domain's own ghost ring is empty.
        right = jax.lax.ppermute(
            a[..., self.nxl, :],
            self.axis_name,
            [(i, i + 1) for i in range(self.n_dev - 1)],
        )
        left = jax.lax.ppermute(
            a[..., 1, :],
            self.axis_name,
            [(i, i - 1) for i in range(1, self.n_dev)],
        )
        a = a.at[..., 0, :].set(right).at[..., self.nxl + 1, :].set(left)
        return a.reshape(shape)

    def psum(self, x):
        return jax.lax.psum(x, self.axis_name)

    def pmax(self, x):
        return jax.lax.pmax(x, self.axis_name)

    def merge_particles(self, values, covered, fallback):
        """Combine per-device unbinned particle arrays: each particle is
        interior on exactly one device; the rest contribute zeros."""
        total = self.psum(values)
        cov = self.psum(covered.astype(jnp.float32)) > 0
        if values.ndim == 2:
            cov = cov[:, None]
        return jnp.where(cov, total, fallback)


def pad_spec_for_devices(spec, n_dev: int):
    """Pad the grid's x-extent to a multiple of ``n_dev`` (pad cells sit
    beyond the domain and stay empty like the ghost ring)."""
    nx = spec.dims[0]
    pad = (-nx) % n_dev
    if pad:
        # clamp_nx keeps escaped particles clamping to the ORIGINAL
        # border ring (pad layers stay permanently empty) so sharded and
        # single-device binning agree once a particle leaves +x.
        spec = spec.replace(dims=(nx + pad,) + spec.dims[1:], clamp_nx=nx)
    return spec


def build_sharded_step_fn(sim, solver_cfg, forces, num_fluids: int,
                          mesh: Mesh):
    """The dense solver step (DFSPH or IISPH) sharded over ``mesh``'s
    first axis.

    Same signature/outputs as ``step.build_step_fn``. Requires the dense
    grid layout (static ``sim.domain``), grid (not compact) indexing,
    and halo-compatible forces.
    """
    from ..step import _dense_config

    if getattr(sim, "dense_compact", False):
        raise ValueError("domain decomposition requires dense_compact=False")
    if getattr(sim, "fitted_dims", None) is not None:
        # Slab decomposition owns the full static domain; fluid-extent
        # fitting is a single-device optimization.
        sim = sim.replace(fitted_dims=None)
    if solver_cfg.kind == "dfsph":
        from ..solver.dfsph_dense import build_dense_substep
    elif solver_cfg.kind == "iisph":
        from ..solver.iisph_dense import build_dense_substep
    else:
        raise ValueError(
            f"domain decomposition: unsupported solver {solver_cfg.kind!r}"
        )
    dense = _dense_config(sim, solver_cfg, forces)
    if dense is None:
        raise ValueError(
            "domain decomposition requires the dense layout "
            "(set a static sim.domain)"
        )
    spec_f, spec_b, dense_forces = dense
    from ..solver.forces_dense import (
        Akinci2013SurfaceTensionDense,
        ArtificialViscosityDense,
        He2014SurfaceTensionDense,
        ParticleWiseForce,
        WCSPHSurfaceTensionDense,
        XSPHViscosityDense,
    )

    halo_ok = (
        XSPHViscosityDense,  # single pass; reads rho_j (exchanged in ctx)
        ArtificialViscosityDense,  # single pass; reads rho_j
        WCSPHSurfaceTensionDense,  # single pass over positions/masses
        Akinci2013SurfaceTensionDense,  # exchanges its normals mid-force
        He2014SurfaceTensionDense,  # exchanges color + |grad c|^2
        ParticleWiseForce,  # particle layout (replicated), no grid pass
    )
    for f in dense_forces:
        if not isinstance(f, halo_ok):
            raise ValueError(
                f"{type(f).__name__} is not halo-aware yet (multi-stage "
                "neighbor reads); use the single-device path"
            )

    axis_name = mesh.axis_names[0]
    n_dev = mesh.devices.size
    spec_f = pad_spec_for_devices(spec_f, n_dev)
    spec_b = spec_b.replace(dims=spec_f.dims, clamp_nx=spec_f.clamp_nx)
    nxl = spec_f.dims[0] // n_dev
    nyz = int(np.prod(spec_f.dims[1:]))

    def halo_builder():
        return Halo(axis_name, n_dev, nxl, nyz)

    substep = build_dense_substep(
        sim, solver_cfg, num_fluids, spec_f, spec_b, dense_forces,
        halo_builder=halo_builder,
    )

    n_sub = sim.n_substeps

    def step(fluids, boundaries, solver_state, es, dt, gravity):
        sub_dt = dt / n_sub
        diag = None
        for _ in range(n_sub):
            fluids, boundaries, solver_state, diag = substep(
                fluids, boundaries, solver_state, es, sub_dt, gravity
            )
        return fluids, boundaries, solver_state, diag

    return jax.shard_map(
        step, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )


@functools.lru_cache(maxsize=16)
def get_jitted_sharded_step_fn(sim, solver_cfg, forces, num_fluids: int,
                               mesh: Mesh):
    return jax.jit(
        build_sharded_step_fn(sim, solver_cfg, forces, num_fluids, mesh)
    )


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded dense step on an ``n_devices`` mesh
    and check it against the single-device step (driver validation)."""
    from .sharding import make_mesh
    from ..config import DFSPHConfig, NeighborConfig
    from ..scenes import cube_fluid
    from ..sampling import shape_surface_sample
    from ..step import get_jitted_step_fn
    from ..world import Boundary, Fluid, LiquidWorld
    from .. import shapes

    radius = 0.05
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        neighbors=NeighborConfig(max_neighbors=48, max_candidates=192,
                                 query_chunk=16384),
        domain=((-1.2, -0.5, -1.2), (1.2, 1.6, 1.2)),
        layout="dense",
    )
    pos = cube_fluid((6, 6, 6), radius)
    pos[:, 1] += 0.5
    world.add_fluid(Fluid(pos, density0=1000.0))
    box = shapes.Cuboid((1.0, 0.1, 1.0))
    world.add_boundary(Boundary(shape_surface_sample(box, radius, 3)))
    world._prepare()

    mesh = make_mesh(n_devices, axis_name="x")
    sharded = get_jitted_sharded_step_fn(
        world.sim, world.solver_config, world._force_set, 1, mesh
    )
    single = get_jitted_step_fn(
        world.sim, world.solver_config, world._force_set, 1
    )
    args = (
        world.fluids_state, world.boundaries_state, world._solver_state,
        None, jnp.float32(1.0 / 200.0),
        jnp.asarray([0.0, -9.81, 0.0], jnp.float32),
    )
    out_s = sharded(*args)
    out_1 = single(*args)
    jax.block_until_ready((out_s, out_1))
    ps = np.asarray(out_s[0].positions)
    p1 = np.asarray(out_1[0].positions)
    assert np.isfinite(ps).all()
    np.testing.assert_allclose(ps, p1, atol=1e-5)
    assert int(out_s[3].solver.pressure_iters) == int(
        out_1[3].solver.pressure_iters
    )
