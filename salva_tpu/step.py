"""The jitted simulation step: neighbor search -> kernels -> densities ->
pressure solver -> integration, as one pure function.

This is the TPU re-design of the substep loop in
``src/liquid_world.rs:84-148``: grid rebuild, contact detection, kernel
evaluation, boundary volumes, densities, solver step. Everything is a
pure function of ``(FluidsState, BoundariesState, solver_state, dt,
gravity)`` so the whole substep compiles to a single XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .config import DFSPHConfig, IISPHConfig, SimConfig
from .geometry import build_grid, evaluate_contacts, find_neighbors, weighted_sum_over_neighbors
from .kernels import get_kernel
from .object.state import BoundariesState, FluidsState
from .solver import dfsph, iisph
from .solver.common import SolverDiagnostics, StepContext, boundary_volumes, compute_densities
from .solver.elasticity import Becker2009ElasticityForce, ElasticityState
from .solver.nonpressure import ForceSet


@struct.dataclass
class StepDiagnostics:
    """Per-step observability, returned on-device (SURVEY.md §5.1/§5.5)."""

    solver: SolverDiagnostics
    ncontacts_ff: jnp.ndarray
    ncontacts_fb: jnp.ndarray
    neighbor_overflow: jnp.ndarray
    candidate_overflow: jnp.ndarray
    max_density_ratio: jnp.ndarray
    # Live fluid extent + speed, computed on-device each step (drives the
    # fitted-grid refit policy without per-step host fetches of state).
    fluid_min: jnp.ndarray = None
    fluid_max: jnp.ndarray = None
    max_speed: jnp.ndarray = None
    # Dense+spill table overflows (subset of neighbor_overflow): drives
    # the world's table-growth policy (grow tables vs raise the cap tier).
    spill_overflow: jnp.ndarray = None
    # Condensed-K-table component of spill_overflow, surfaced separately
    # (ADVICE r4): doubling the spill table E cannot heal it — the world
    # widens dense_spill_k instead.
    spill_k_overflow: jnp.ndarray = None

    @classmethod
    def zeros(cls):
        z = jnp.zeros((), jnp.int32)
        return cls(
            solver=SolverDiagnostics.zeros(),
            ncontacts_ff=z,
            ncontacts_fb=z,
            neighbor_overflow=z,
            candidate_overflow=z,
            max_density_ratio=jnp.zeros((), jnp.float32),
        )


def init_solver_state(solver_cfg, capacity: int, dim: int):
    """Persistent solver scratch: DFSPH carries velocity_changes plus the
    warm-start stiffness sums across steps (`dfsph_solver.rs:44,688-691`
    for the velocity changes; columns [dim] / [dim+1] hold the previous
    divergence / pressure stiffness for the warm start, packed into one
    array so z-sort / capacity growth / checkpointing stay shape-generic);
    IISPH carries warm-started pressures (`iisph_solver.rs:35,673-677`)."""
    if solver_cfg.kind == "dfsph":
        return jnp.zeros((capacity, dim + 2), jnp.float32)
    if solver_cfg.kind == "iisph":
        return jnp.zeros((capacity,), jnp.float32)
    raise ValueError(f"unknown solver kind {solver_cfg.kind!r}")


def _dense_config(sim: SimConfig, solver_cfg, forces: ForceSet):
    """Resolve the dense-layout configuration, or None for gather layout.

    The dense binned path (``solver/dfsph_dense.py``) requires a static
    ``sim.domain`` box, the DFSPH solver, and dense implementations of
    every attached force; ``layout="auto"`` falls back to the general
    gather path otherwise, ``layout="dense"`` raises.
    """
    from .solver.forces_dense import to_dense_forces

    if sim.layout == "gather":
        return None
    reasons = []
    if sim.domain is None:
        reasons.append("sim.domain is not set")
    if solver_cfg.kind not in ("dfsph", "iisph"):
        reasons.append(f"solver {solver_cfg.kind!r} has no dense path")
    dense_forces = to_dense_forces(forces)
    if dense_forces is None:
        reasons.append("a non-pressure force has no dense implementation")
    if reasons:
        if sim.layout in ("dense", "brute"):
            raise ValueError(
                f"layout={sim.layout!r} not possible: " + "; ".join(reasons)
            )
        return None

    from .geometry.dense_grid import brute_spec, spec_for_aabb

    if sim.layout == "brute":
        # All-pairs tier: dense_cap / dense_cap_boundary carry the
        # PER-CYCLIC-CELL slot counts (= ceil(capacity / brute_cells),
        # resolved by the world); mis-sized explicit caps surface as
        # bin overflow in the diagnostics, never as silent drops.
        cells = int(sim.brute_cells)
        spec_f = brute_spec(sim.dense_cap * cells, cells)
        spec_b = brute_spec(sim.dense_cap_boundary * cells, cells)
        return spec_f, spec_b, dense_forces

    mins, maxs = sim.domain
    spec_f = spec_for_aabb(mins, maxs, sim.h, sim.dense_cap)
    if sim.fitted_dims is not None:
        # Fluid-tracking window: static dims, on-device dynamic origin
        # (see config.fitted_dims). The spec keeps the domain origin as
        # the lattice anchor; DenseCtx supplies the traced origin.
        spec_f = spec_f.replace(
            dims=tuple(int(v) for v in sim.fitted_dims)
        )
    spec_b = spec_f.replace(cap=sim.dense_cap_boundary)
    return spec_f, spec_b, dense_forces


def build_substep_fn(
    sim: SimConfig,
    solver_cfg,
    forces: ForceSet,
    num_fluids: int,
):
    """Build the pure substep function for a fixed static configuration."""
    dense = _dense_config(sim, solver_cfg, forces)
    if dense is not None:
        if solver_cfg.kind == "dfsph":
            from .solver.dfsph_dense import build_dense_substep
        else:
            from .solver.iisph_dense import build_dense_substep

        spec_f, spec_b, dense_forces = dense
        return build_dense_substep(
            sim, solver_cfg, num_fluids, spec_f, spec_b, dense_forces
        )
    h = sim.h
    dim = sim.dim
    nb = sim.neighbors
    kd_w, _ = get_kernel(sim.kernel_density)
    kg_w, kg_dw = get_kernel(sim.kernel_gradient)

    def apply_forces_factory(es: Optional[ElasticityState]):
        def apply_nonpressure_forces(ctx: StepContext):
            accel = jnp.zeros_like(ctx.fluids.positions)
            bforces = jnp.zeros_like(ctx.boundaries.forces)
            for force in forces:
                if isinstance(force, Becker2009ElasticityForce):
                    a, b = force.apply(ctx, es)
                else:
                    a, b = force.apply(ctx)
                accel = accel + a
                bforces = bforces + b
            return accel, bforces

        return apply_nonpressure_forces

    def substep(
        fluids: FluidsState,
        boundaries: BoundariesState,
        solver_state,
        es: Optional[ElasticityState],
        dt,
        gravity,
    ):
        boundaries = boundaries.clear_forces()

        # Grid rebuild (`liquid_world.rs:90-106`).
        fgrid = build_grid(fluids.positions, fluids.alive, h, dim)
        bgrid = build_grid(boundaries.positions, boundaries.alive, h, dim)
        fgroups = fluids.groups()
        bgroups = boundaries.groups()

        # Contact detection (`contacts.rs:154-400`), three classes.
        ff_nl = find_neighbors(
            fluids.positions, fluids.alive, fgroups,
            fgrid, fluids.positions, fluids.alive, fgroups,
            h, dim, nb.max_neighbors, nb.max_candidates,
            same_model_always=True, query_chunk=nb.query_chunk,
        )
        fb_nl = find_neighbors(
            fluids.positions, fluids.alive, fgroups,
            bgrid, boundaries.positions, boundaries.alive, bgroups,
            h, dim, nb.max_neighbors, nb.max_candidates,
            same_model_always=False, query_chunk=nb.query_chunk,
        )

        # Kernel evaluation (`helper.rs:9-65`).
        ff = evaluate_contacts(
            fluids.positions, fluids.positions, ff_nl, h, dim, w_fn=kd_w, dw_fn=kg_dw
        )
        fb = evaluate_contacts(
            fluids.positions, boundaries.positions, fb_nl, h, dim, w_fn=kd_w, dw_fn=kg_dw
        )

        # Boundary volumes from boundary-boundary neighbors — only the
        # scalar sum of W is needed, so the table is never materialized
        # (`dfsph_solver.rs:72-96`). Skipped when the world marks the
        # boundaries unchanged (volumes depend only on their positions).
        if sim.recompute_boundary_volumes:
            bb_wsum, bb_overflow = weighted_sum_over_neighbors(
                boundaries.positions, boundaries.alive, bgroups,
                bgrid, boundaries.positions, boundaries.alive, bgroups,
                h, dim, nb.max_candidates,
                same_model_always=True, w_fn=kd_w, query_chunk=nb.query_chunk,
            )
            boundaries = boundaries.replace(
                volumes=boundary_volumes(bb_wsum, boundaries.alive)
            )
        else:
            bb_overflow = jnp.zeros((), jnp.int32)

        ctx = StepContext(
            fluids=fluids,
            boundaries=boundaries,
            ff=ff,
            fb=fb,
            densities=jnp.zeros((fluids.capacity,), jnp.float32),
            dt=jnp.asarray(dt, jnp.float32),
            inv_dt=jnp.where(dt > 0, 1.0 / jnp.asarray(dt, jnp.float32), 0.0),
            dim=dim,
            h=h,
            num_fluids=num_fluids,
        )
        densities = compute_densities(ctx)
        ctx = ctx.replace(densities=densities)

        apply_np = apply_forces_factory(es)
        if solver_cfg.kind == "dfsph":
            new_fluids, bforces, solver_state, sdiag = dfsph.step(
                solver_cfg, ctx, solver_state, gravity, apply_np
            )
        else:
            new_fluids, bforces, solver_state, sdiag = iisph.step(
                solver_cfg, ctx, solver_state, gravity, apply_np
            )

        boundaries = boundaries.replace(forces=bforces)

        diag = StepDiagnostics(
            solver=sdiag,
            ncontacts_ff=jnp.sum(ff_nl.count),
            ncontacts_fb=jnp.sum(fb_nl.count),
            neighbor_overflow=ff_nl.overflow + fb_nl.overflow,
            candidate_overflow=ff_nl.cand_overflow
            + fb_nl.cand_overflow
            + bb_overflow,
            max_density_ratio=jnp.max(
                jnp.where(fluids.alive, densities / fluids.density0, 0.0),
                initial=0.0,
            ),
        )
        return new_fluids, boundaries, solver_state, diag

    return substep


def build_step_fn(
    sim: SimConfig,
    solver_cfg,
    forces: ForceSet,
    num_fluids: int,
):
    """Full step = ``n_substeps`` substeps (the reference's
    TimestepManager always runs one substep of the full dt,
    `timestep_manager.rs:87-94`; ``n_substeps > 1`` subdivides dt evenly)."""
    substep = build_substep_fn(sim, solver_cfg, forces, num_fluids)
    n_sub = sim.n_substeps

    def step(fluids, boundaries, solver_state, es, dt, gravity):
        sub_dt = dt / n_sub
        diag = None
        for _ in range(n_sub):
            fluids, boundaries, solver_state, diag = substep(
                fluids, boundaries, solver_state, es, sub_dt, gravity
            )
        # Fluid extent + peak speed for the fitted-grid refit policy
        # (one masked reduce; free next to the solver work).
        alive = fluids.alive[:, None]
        big = jnp.float32(1.0e30)
        diag = diag.replace(
            fluid_min=jnp.min(
                jnp.where(alive, fluids.positions, big), axis=0
            ),
            fluid_max=jnp.max(
                jnp.where(alive, fluids.positions, -big), axis=0
            ),
            max_speed=jnp.sqrt(
                jnp.max(
                    jnp.where(
                        fluids.alive,
                        jnp.sum(fluids.velocities**2, axis=-1),
                        0.0,
                    ),
                    initial=0.0,
                )
            ),
        )
        return fluids, boundaries, solver_state, diag

    return step


@functools.lru_cache(maxsize=64)
def get_jitted_step_fn(sim: SimConfig, solver_cfg, forces: ForceSet,
                       num_fluids: int):
    """Cached jitted step function.

    All configuration objects are hashable frozen dataclasses, so worlds
    (and tests) sharing a configuration share one compiled executable per
    array-shape signature.
    """
    return jax.jit(build_step_fn(sim, solver_cfg, forces, num_fluids))
