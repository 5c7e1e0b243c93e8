"""`LiquidWorld`: the top-level stateful wrapper around the pure step.

API parity with the reference's ``LiquidWorld``
(``src/liquid_world.rs:31-281``): add/remove fluids and boundaries,
step with optional coupling, particle queries, counters, ``h`` and
``particle_radius`` accessors — re-architected so that all per-step
compute is one jitted pure function over merged capacity-N arrays
(see ``step.py``), and the host side only manages slots and metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import forces as force_specs
from .config import DFSPHConfig, IISPHConfig, NeighborConfig, SimConfig, particle_volume
from .counters import Counters
from .geometry import GroupInfo, build_grid, evaluate_contacts, find_neighbors
from .kernels import get_kernel
from .object.interaction_groups import InteractionGroups
from .object.state import BoundariesState, FluidsState
from .solver.nonpressure import CustomForce, MaskedCustomForce
from .solver import (
    Akinci2013SurfaceTensionForce,
    ArtificialViscosityForce,
    Becker2009ElasticityForce,
    DFSPHViscosityForce,
    ForceSet,
    He2014SurfaceTensionForce,
    WCSPHSurfaceTensionForce,
    XSPHViscosityForce,
    build_elasticity_state,
    elasticity_coefficients,
)
from .step import StepDiagnostics, get_jitted_step_fn, init_solver_state
from .timestep import TimestepManager


class Fluid:
    """Host-side fluid description (`src/object/fluid.rs`)."""

    def __init__(
        self,
        positions,
        particle_radius: Optional[float] = None,
        density0: float = 1000.0,
        velocities=None,
        nonpressure_forces: Optional[List] = None,
        interaction_groups: InteractionGroups = InteractionGroups(),
    ):
        self.positions = np.asarray(positions, np.float32).reshape(
            -1, np.asarray(positions).shape[-1] if len(positions) else 2
        )
        self.velocities = (
            np.asarray(velocities, np.float32) if velocities is not None else None
        )
        self.particle_radius = particle_radius
        self.density0 = float(density0)
        self.nonpressure_forces = list(nonpressure_forces or [])
        self.interaction_groups = interaction_groups

    @property
    def num_particles(self) -> int:
        return len(self.positions)


class Boundary:
    """Host-side boundary description (`src/object/boundary.rs`)."""

    def __init__(
        self,
        positions,
        velocities=None,
        interaction_groups: InteractionGroups = InteractionGroups(),
    ):
        arr = np.asarray(positions, np.float32)
        self.positions = arr.reshape(-1, arr.shape[-1]) if arr.size else arr.reshape(0, 0)
        self.velocities = (
            np.asarray(velocities, np.float32) if velocities is not None else None
        )
        self.interaction_groups = interaction_groups


@dataclasses.dataclass
class _FluidRecord:
    density0: float
    groups: InteractionGroups
    nonpressure_forces: List
    # Per-fluid particle radius drives the particle volume/mass
    # (`fluid.rs:22,110-120`); the kernel radius h stays world-level.
    particle_radius: float = 0.0
    removed: bool = False


@dataclasses.dataclass
class _BoundaryRecord:
    groups: InteractionGroups
    removed: bool = False


@jax.jit
def _emit_kernel(st, pos, vel, vol, density0, handle, memberships, filt):
    """Write an emission template into the first free slots (device-side
    `Fluid::add_particles`, `fluid.rs:126-150`): rank free slots by
    cumsum, invert the ranking into per-row target slots, scatter. Rows
    beyond the free-slot count drop (surfaced by capacity warnings)."""
    e = pos.shape[0]
    n = st.alive.shape[0]
    free = jnp.logical_not(st.alive)
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    iota = jnp.arange(n, dtype=jnp.int32)
    tgt = (
        jnp.full((e + 1,), n, jnp.int32)
        .at[jnp.where(free & (rank < e), rank, e)]
        .set(iota, mode="drop")[:e]
    )
    full_vol = jnp.full((e,), vol, jnp.float32)
    full_rho = jnp.full((e,), density0, jnp.float32)
    return st.replace(
        positions=st.positions.at[tgt].set(pos, mode="drop"),
        velocities=st.velocities.at[tgt].set(vel, mode="drop"),
        volumes=st.volumes.at[tgt].set(full_vol, mode="drop"),
        density0=st.density0.at[tgt].set(full_rho, mode="drop"),
        alive=st.alive.at[tgt].set(True, mode="drop"),
        fluid_id=st.fluid_id.at[tgt].set(
            jnp.full((e,), handle, jnp.int32), mode="drop"
        ),
        memberships=st.memberships.at[tgt].set(
            jnp.full((e,), memberships, jnp.uint32), mode="drop"
        ),
        filter=st.filter.at[tgt].set(
            jnp.full((e,), filt, jnp.uint32), mode="drop"
        ),
    )


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _delete_where_jit(predicate):
    @jax.jit
    def run(st, handle):
        kill = (
            jnp.asarray(predicate(st.positions, st.velocities), bool)
            & st.alive
            & (st.fluid_id == handle)
        )
        return st.replace(alive=st.alive & jnp.logical_not(kill))

    return run


def _delete_where_kernel(st, predicate, handle):
    return _delete_where_jit(predicate)(st, handle)


def _next_capacity(needed: int, minimum: int = 64) -> int:
    cap = minimum
    while cap < needed:
        cap *= 2
    return cap


class LiquidWorld:
    """The physics world for simulating fluids with boundaries.

    ``h = particle_radius * smoothing_factor * 2.0`` exactly like
    `liquid_world.rs:47`.
    """

    def __init__(
        self,
        solver=None,
        particle_radius: float = 0.05,
        smoothing_factor: float = 2.0,
        dim: int = 3,
        neighbors: Optional[NeighborConfig] = None,
        n_substeps: int = 1,
        adaptive_timestep: bool = False,
        domain=None,
        layout: str = "auto",
        dense_cap: Optional[int] = None,
        dense_cap_boundary: Optional[int] = None,
        fit_grid: bool = True,
    ):
        self.solver_config = solver if solver is not None else DFSPHConfig()
        # ``dense_cap(_boundary)=None`` auto-sizes the per-cell slot
        # capacities from measured occupancy at first step (resolved in
        # ``_effective_sim``; only {8, 16} are efficient fluid tiers on
        # TPU — sublane padding makes 9..15 cost like 16). Explicit ints
        # are honored unchanged.
        self._dense_cap_request = dense_cap
        self._dense_cap_boundary_request = dense_cap_boundary
        self._auto_caps: Optional[tuple] = None
        self._auto_caps_capacity = None
        # Auto-sized spill table (config.dense_spill_columns): set when
        # the auto cap tier picks 12 + spill; grown by the overflow path.
        self._auto_spill: Optional[int] = None
        # Auto-widened condensed-K table (config.dense_spill_k): grown by
        # the overflow path on K overflow, which doubling E cannot heal
        # (ADVICE r4). None = config default.
        self._auto_spill_k: Optional[int] = None
        # Fluid-tracking grid window (config.fitted_dims): static dims
        # chosen here with quantization + hysteresis (resizes recompile),
        # origin tracked ON DEVICE by the substep (translation is free).
        # Sizes refresh on the overflow check cadence from on-device
        # extent diagnostics.
        self._fit_grid = bool(fit_grid)
        self._fitted_dims: Optional[tuple] = None
        self._fit_floor_dims: Optional[np.ndarray] = None
        self._initial_fit_done = False
        # Number of window resizes so far (each one recompiles the step
        # program — benchmarks read this to detect a compile landing
        # inside a timed section).
        self.grid_refit_count = 0
        self._full_bvol_stale = True
        # Sparse fb-hoist adjacency table size (config.dense_fb_columns):
        # measured from the boundary's occupied-cell count, cached until
        # the boundary set changes (capacity key); kinematic movement
        # within a capacity is covered by the x1.5 sizing headroom + the
        # overflow diagnostics.
        self._fb_cols_cache: Optional[tuple] = None
        self._last_dt = 1.0 / 60.0
        self.sim = SimConfig(
            dim=dim,
            particle_radius=particle_radius,
            smoothing_factor=smoothing_factor,
            neighbors=neighbors or NeighborConfig(),
            n_substeps=n_substeps,
            layout=layout,
            domain=(
                tuple(tuple(float(v) for v in side) for side in domain)
                if domain is not None
                else None
            ),
            dense_cap=dense_cap if dense_cap is not None else 12,
            dense_cap_boundary=(
                dense_cap_boundary if dense_cap_boundary is not None else 24
            ),
        )
        self.counters = Counters()
        self.timestep_manager = TimestepManager(
            particle_radius, adaptive=adaptive_timestep
        )

        self.fluids_state = FluidsState.empty(64, dim)
        self.boundaries_state = BoundariesState.empty(64, dim)
        self._fluid_alive = np.zeros(64, bool)
        self._fluid_slot_owner = np.full(64, -1, np.int64)
        self._boundary_alive = np.zeros(64, bool)
        self._boundary_slot_owner = np.full(64, -1, np.int64)

        self._fluid_records: List[_FluidRecord] = []
        self._boundary_records: List[_BoundaryRecord] = []

        # Failure-detection mode (SURVEY.md §5.3): after each step, verify
        # state finiteness and surface overflow diagnostics as errors
        # instead of silent degradation.
        self.debug_checks = False
        # Boundary volumes must be recomputed after any boundary change.
        self._boundary_dirty = True

        self._force_set: Optional[ForceSet] = None
        self._elasticity_state = None
        self._elasticity_dirty = False
        self._solver_state = None
        self.last_diagnostics: Optional[StepDiagnostics] = None
        # Deferred particle removal (`fluid.rs:71-98`): global slot ids
        # flagged between steps, released at the next step start.
        self._pending_deletions: set = set()
        # Capacity-overflow warnings are on by default (undersized
        # dense_cap / max_neighbors must be loud); checked on the first
        # step and every ``overflow_check_interval`` steps after to keep
        # the host-device sync off the hot dispatch path.
        self.warn_overflow = True
        self.overflow_check_interval = 16
        self._steps_taken = 0

    # -- basic accessors ---------------------------------------------------

    @property
    def h(self) -> float:
        return self.sim.h

    @property
    def particle_radius(self) -> float:
        return self.sim.particle_radius

    @property
    def dim(self) -> int:
        return self.sim.dim

    @property
    def num_fluids(self) -> int:
        return len(self._fluid_records)

    @property
    def num_boundaries(self) -> int:
        return len(self._boundary_records)

    # -- capacity management ----------------------------------------------

    def _grow_fluids(self, needed: int):
        cap = self.fluids_state.capacity
        if needed <= cap:
            return
        new_cap = _next_capacity(needed)
        old = self.fluids_state
        new = FluidsState.empty(new_cap, self.dim)
        idx = jnp.arange(cap)
        self.fluids_state = new.replace(
            positions=new.positions.at[idx].set(old.positions),
            velocities=new.velocities.at[idx].set(old.velocities),
            volumes=new.volumes.at[idx].set(old.volumes),
            density0=new.density0.at[idx].set(old.density0),
            alive=new.alive.at[idx].set(old.alive),
            fluid_id=new.fluid_id.at[idx].set(old.fluid_id),
            memberships=new.memberships.at[idx].set(old.memberships),
            filter=new.filter.at[idx].set(old.filter),
        )
        self._fluid_alive = np.concatenate(
            [self._fluid_alive, np.zeros(new_cap - cap, bool)]
        )
        self._fluid_slot_owner = np.concatenate(
            [self._fluid_slot_owner, np.full(new_cap - cap, -1, np.int64)]
        )
        if self._solver_state is not None:
            self._solver_state = _grow_solver_state(
                self._solver_state, new_cap, self.dim
            )
        # Rest-state slot indices are invalidated by the capacity change;
        # never CLEAR an already-pending dirty flag (growth happens inside
        # add_fluid, before the first rebuild).
        if self._elasticity_state is not None:
            self._elasticity_dirty = True

    def _grow_boundaries(self, needed: int):
        cap = self.boundaries_state.capacity
        if needed <= cap:
            return
        new_cap = _next_capacity(needed)
        old = self.boundaries_state
        new = BoundariesState.empty(new_cap, self.dim)
        idx = jnp.arange(cap)
        self.boundaries_state = new.replace(
            positions=new.positions.at[idx].set(old.positions),
            velocities=new.velocities.at[idx].set(old.velocities),
            volumes=new.volumes.at[idx].set(old.volumes),
            forces=new.forces.at[idx].set(old.forces),
            alive=new.alive.at[idx].set(old.alive),
            boundary_id=new.boundary_id.at[idx].set(old.boundary_id),
            memberships=new.memberships.at[idx].set(old.memberships),
            filter=new.filter.at[idx].set(old.filter),
        )
        self._boundary_alive = np.concatenate(
            [self._boundary_alive, np.zeros(new_cap - cap, bool)]
        )
        self._boundary_slot_owner = np.concatenate(
            [self._boundary_slot_owner, np.full(new_cap - cap, -1, np.int64)]
        )

    def _alloc_fluid_slots(self, n: int) -> np.ndarray:
        self._sync_fluid_mirrors()
        free = np.where(self._fluid_slot_owner < 0)[0]
        if len(free) < n:
            used = int((self._fluid_slot_owner >= 0).sum())
            self._grow_fluids(used + n)
            free = np.where(self._fluid_slot_owner < 0)[0]
        return free[:n]

    def _alloc_boundary_slots(self, n: int) -> np.ndarray:
        free = np.where(self._boundary_slot_owner < 0)[0]
        if len(free) < n:
            used = int((self._boundary_slot_owner >= 0).sum())
            self._grow_boundaries(used + n)
            free = np.where(self._boundary_slot_owner < 0)[0]
        return free[:n]

    # -- object management -------------------------------------------------

    def add_fluid(self, fluid: Fluid) -> int:
        handle = len(self._fluid_records)
        self._fluid_records.append(
            _FluidRecord(
                density0=fluid.density0,
                groups=fluid.interaction_groups,
                nonpressure_forces=fluid.nonpressure_forces,
                particle_radius=(
                    float(fluid.particle_radius)
                    if fluid.particle_radius is not None
                    else self.particle_radius
                ),
            )
        )
        self._force_set = None
        if fluid.num_particles:
            self._write_fluid_particles(
                handle, fluid.positions, fluid.velocities
            )
        if any(
            isinstance(f, force_specs.Becker2009Elasticity)
            for f in fluid.nonpressure_forces
        ):
            self._elasticity_dirty = True
        return handle

    def add_boundary(self, boundary: Boundary) -> int:
        self._full_bvol_stale = True
        handle = len(self._boundary_records)
        self._boundary_records.append(
            _BoundaryRecord(groups=boundary.interaction_groups)
        )
        if boundary.positions.size:
            self._write_boundary_particles(
                handle, boundary.positions, boundary.velocities
            )
        return handle

    def remove_fluid(self, handle: int):
        self._sync_fluid_mirrors()
        slots = np.where(self._fluid_slot_owner == handle)[0]
        self._release_fluid_slots(slots)
        self._fluid_records[handle].removed = True
        self._force_set = None

    def remove_boundary(self, handle: int):
        self._full_bvol_stale = True
        slots = np.where(self._boundary_slot_owner == handle)[0]
        if len(slots):
            self.boundaries_state = self.boundaries_state.replace(
                alive=self.boundaries_state.alive.at[jnp.asarray(slots)].set(False)
            )
        self._boundary_alive[slots] = False
        self._boundary_slot_owner[slots] = -1
        self._boundary_records[handle].removed = True
        self._boundary_dirty = True

    def _release_fluid_slots(self, slots: np.ndarray):
        if len(slots):
            self.fluids_state = self.fluids_state.replace(
                alive=self.fluids_state.alive.at[jnp.asarray(slots)].set(False)
            )
        self._fluid_alive[slots] = False
        self._fluid_slot_owner[slots] = -1

    def _write_fluid_particles(self, handle: int, positions, velocities=None):
        rec = self._fluid_records[handle]
        n = len(positions)
        slots = self._alloc_fluid_slots(n)
        idx = jnp.asarray(slots)
        vol = particle_volume(rec.particle_radius, self.dim)
        st = self.fluids_state
        pos = jnp.asarray(positions, jnp.float32)
        vel = (
            jnp.asarray(velocities, jnp.float32)
            if velocities is not None
            else jnp.zeros_like(pos)
        )
        self.fluids_state = st.replace(
            positions=st.positions.at[idx].set(pos),
            velocities=st.velocities.at[idx].set(vel),
            volumes=st.volumes.at[idx].set(vol),
            density0=st.density0.at[idx].set(rec.density0),
            alive=st.alive.at[idx].set(True),
            fluid_id=st.fluid_id.at[idx].set(handle),
            memberships=st.memberships.at[idx].set(
                jnp.uint32(rec.groups.memberships)
            ),
            filter=st.filter.at[idx].set(jnp.uint32(rec.groups.filter)),
        )
        self._fluid_alive[slots] = True
        self._fluid_slot_owner[slots] = handle
        return slots

    def _write_boundary_particles(self, handle: int, positions, velocities=None):
        rec = self._boundary_records[handle]
        n = len(positions)
        slots = self._alloc_boundary_slots(n)
        idx = jnp.asarray(slots)
        st = self.boundaries_state
        pos = jnp.asarray(positions, jnp.float32)
        vel = (
            jnp.asarray(velocities, jnp.float32)
            if velocities is not None
            else jnp.zeros_like(pos)
        )
        self.boundaries_state = st.replace(
            positions=st.positions.at[idx].set(pos),
            velocities=st.velocities.at[idx].set(vel),
            alive=st.alive.at[idx].set(True),
            boundary_id=st.boundary_id.at[idx].set(handle),
            memberships=st.memberships.at[idx].set(
                jnp.uint32(rec.groups.memberships)
            ),
            filter=st.filter.at[idx].set(jnp.uint32(rec.groups.filter)),
        )
        self._boundary_alive[slots] = True
        self._boundary_slot_owner[slots] = handle
        self._boundary_dirty = True
        return slots

    # -- particle-level API (emitters / deletion, `fluid.rs:71-150`) -------

    def fluid_slots(self, handle: int) -> np.ndarray:
        self._sync_fluid_mirrors()
        return np.where(
            (self._fluid_slot_owner == handle) & self._fluid_alive
        )[0]

    def boundary_slots(self, handle: int) -> np.ndarray:
        return np.where(
            (self._boundary_slot_owner == handle) & self._boundary_alive
        )[0]

    def reserve_fluid_capacity(self, n: int):
        """Pre-grow the fluid arrays to hold at least ``n`` particles.

        Capacity growth changes array shapes and therefore recompiles
        the step; emitter scenes (`faucet3.rs`) reserve their steady-state
        head count up front so no growth (and no recompile) happens
        mid-run."""
        self._grow_fluids(int(n))

    def add_particles(self, handle: int, positions, velocities=None):
        """`Fluid::add_particles` (`fluid.rs:126-150`)."""
        self._sync_fluid_mirrors()
        slots = self._write_fluid_particles(handle, positions, velocities)
        if self._has_elasticity(handle):
            self._elasticity_dirty = True
        return slots

    # -- device-side emission / deletion ------------------------------------

    def _sync_fluid_mirrors(self):
        """Refresh the host slot mirrors after device-side emission or
        deletion mutated the alive mask (one fetch, only when a host-side
        slot operation actually needs the free list)."""
        if not getattr(self, "_fluid_mirror_stale", False):
            return
        alive = np.asarray(self.fluids_state.alive)
        fid = np.asarray(self.fluids_state.fluid_id)
        self._fluid_alive = alive.copy()
        self._fluid_slot_owner = np.where(alive, fid, -1).astype(np.int64)
        self._fluid_mirror_stale = False

    def emit_particles(self, handle: int, positions, velocities=None):
        """Device-side `add_particles`: write a fixed emission template
        into free slots WITHOUT any host round trip (the emitter pattern
        of `examples3d/faucet3.rs:69-105`). Capacity must be reserved up
        front (``reserve_fluid_capacity``); emissions beyond the free
        slot count are dropped and surfaced by the overflow warning
        machinery. Host slot mirrors are refreshed lazily."""
        rec = self._fluid_records[handle]
        pos = jnp.asarray(positions, jnp.float32)
        vel = (
            jnp.asarray(velocities, jnp.float32)
            if velocities is not None
            else jnp.zeros_like(pos)
        )
        vol = particle_volume(rec.particle_radius, self.dim)
        self.fluids_state = _emit_kernel(
            self.fluids_state, pos, vel, jnp.float32(vol),
            jnp.float32(rec.density0), jnp.int32(handle),
            jnp.uint32(rec.groups.memberships),
            jnp.uint32(rec.groups.filter),
        )
        self._fluid_mirror_stale = True
        if self._has_elasticity(handle):
            self._elasticity_dirty = True

    def delete_where(self, handle: int, predicate):
        """Device-side predicate deletion: kill this fluid's particles
        where ``predicate(positions, velocities) -> bool mask`` holds —
        executed inside one dispatch via the alive mask (the deletion
        half of the faucet emitter pattern). ``predicate`` must be a
        stable jittable function (define it once, not per call, or every
        call recompiles)."""
        self.fluids_state = _delete_where_kernel(
            self.fluids_state, predicate, jnp.int32(handle)
        )
        self._fluid_mirror_stale = True

    def delete_particles(self, handle: int, indices):
        """Delete particles by index within the fluid, immediately (the
        eager variant; see :meth:`delete_particle_at_next_timestep` for
        the reference's deferred semantics)."""
        slots = self.fluid_slots(handle)[np.asarray(indices)]
        self._release_fluid_slots(slots)

    def delete_particle_at_next_timestep(self, handle: int, index: int):
        """Mark a particle for removal at the start of the next step
        (`Fluid::delete_particle_at_next_timestep`, `fluid.rs:71-77`;
        applied by the step like `apply_particles_removal`,
        `liquid_world.rs:79-81`). Callbacks reading state between the flag
        and the next step still see the particle, like the reference."""
        slot = int(self.fluid_slots(handle)[int(index)])
        self._pending_deletions.add(slot)

    def num_deleted_particles(self, handle: int) -> int:
        """Particles of ``handle`` marked for deferred removal
        (`fluid.rs:79-82`)."""
        owner = self._fluid_slot_owner
        return sum(1 for s in self._pending_deletions if owner[s] == handle)

    def _apply_particles_removal(self):
        """Apply deferred deletions (`fluid.rs:88-98`)."""
        if self._pending_deletions:
            self._release_fluid_slots(
                np.fromiter(self._pending_deletions, np.int64)
            )
            self._pending_deletions.clear()

    def transform_fluid_by(self, handle: int, rotation=None, translation=None):
        """Apply an isometry to all particles of a fluid
        (`Fluid::transform_by`, `fluid.rs:166-168`). ``rotation`` is a
        ``[dim, dim]`` matrix (None = identity)."""
        self._transform_slots(
            self.fluids_state, "fluids_state", self.fluid_slots(handle),
            rotation, translation,
        )

    def transform_boundary_by(self, handle: int, rotation=None,
                              translation=None):
        """Apply an isometry to all particles of a boundary
        (`Boundary::transform_by`, `boundary.rs:55-57`)."""
        self._transform_slots(
            self.boundaries_state, "boundaries_state",
            self.boundary_slots(handle), rotation, translation,
        )
        self._boundary_dirty = True

    def _transform_slots(self, state, attr, slots, rotation, translation):
        if not len(slots):
            return
        idx = jnp.asarray(slots)
        pos = state.positions[idx]
        if rotation is not None:
            pos = pos @ jnp.asarray(rotation, jnp.float32).T
        if translation is not None:
            pos = pos + jnp.asarray(translation, jnp.float32)
        setattr(
            self, attr, state.replace(positions=state.positions.at[idx].set(pos))
        )

    def fluid_positions(self, handle: int) -> np.ndarray:
        return np.asarray(self.fluids_state.positions)[self.fluid_slots(handle)]

    def fluid_velocities(self, handle: int) -> np.ndarray:
        return np.asarray(self.fluids_state.velocities)[self.fluid_slots(handle)]

    def boundary_positions(self, handle: int) -> np.ndarray:
        return np.asarray(self.boundaries_state.positions)[
            self.boundary_slots(handle)
        ]

    def boundary_forces(self, handle: int) -> np.ndarray:
        """Accumulated force feedback of a boundary (`boundary.rs:62-67`)."""
        return np.asarray(self.boundaries_state.forces)[
            self.boundary_slots(handle)
        ]

    def set_boundary_particles(self, handle: int, positions, velocities=None):
        """Replace all particles of a boundary (used by coupling to
        re-sample moving colliders each step)."""
        self._boundary_dirty = True
        slots = np.where(self._boundary_slot_owner == handle)[0]
        n_new = len(positions)
        if len(slots) == n_new:
            # Fast path: in-place update.
            idx = jnp.asarray(slots)
            st = self.boundaries_state
            pos = jnp.asarray(positions, jnp.float32)
            vel = (
                jnp.asarray(velocities, jnp.float32)
                if velocities is not None
                else jnp.zeros_like(pos)
            )
            self.boundaries_state = st.replace(
                positions=st.positions.at[idx].set(pos),
                velocities=st.velocities.at[idx].set(vel),
                alive=st.alive.at[idx].set(True),
            )
            self._boundary_alive[slots] = True
        else:
            if len(slots):
                self.boundaries_state = self.boundaries_state.replace(
                    alive=self.boundaries_state.alive.at[jnp.asarray(slots)].set(
                        False
                    )
                )
                self._boundary_alive[slots] = False
                self._boundary_slot_owner[slots] = -1
            if n_new:
                self._write_boundary_particles(handle, positions, velocities)

    def set_boundaries_bulk(self, updates):
        """Replace the particles of several boundaries in ONE device
        update (used by coupling: per-step dispatch count stays constant
        in the collider count). ``updates``: {handle: (positions,
        velocities|None)}. Handles whose particle count changed fall back
        to :meth:`set_boundary_particles`."""
        idx_parts, pos_parts, vel_parts = [], [], []
        leftovers = {}
        for handle, (pts, vels) in updates.items():
            pts = np.asarray(pts, np.float32)
            slots = np.where(self._boundary_slot_owner == handle)[0]
            if len(slots) == len(pts):
                idx_parts.append(slots)
                pos_parts.append(pts)
                vel_parts.append(
                    np.asarray(vels, np.float32)
                    if vels is not None else np.zeros_like(pts)
                )
            else:
                leftovers[handle] = (pts, vels)
        if idx_parts:
            idx_np = np.concatenate(idx_parts)
            idx = jnp.asarray(idx_np)
            st = self.boundaries_state
            self.boundaries_state = st.replace(
                positions=st.positions.at[idx].set(
                    jnp.asarray(np.concatenate(pos_parts))
                ),
                velocities=st.velocities.at[idx].set(
                    jnp.asarray(np.concatenate(vel_parts))
                ),
                alive=st.alive.at[idx].set(True),
            )
            self._boundary_alive[idx_np] = True
            self._boundary_dirty = True
        for handle, (pts, vels) in leftovers.items():
            self.set_boundary_particles(handle, pts, vels)

    # -- force-set / elasticity assembly ----------------------------------

    def _has_elasticity(self, handle: int) -> bool:
        return any(
            isinstance(f, force_specs.Becker2009Elasticity)
            for f in self._fluid_records[handle].nonpressure_forces
        )

    def _build_force_set(self) -> ForceSet:
        nf = self.num_fluids
        by_type: Dict[type, Dict[int, object]] = {}
        custom: List = []
        for fid, rec in enumerate(self._fluid_records):
            if rec.removed:
                continue
            for inst in rec.nonpressure_forces:
                if isinstance(inst, CustomForce):
                    flags = tuple(1 if i == fid else 0 for i in range(nf))
                    custom.append(MaskedCustomForce(inst, flags))
                else:
                    by_type.setdefault(type(inst), {})[fid] = inst

        merged: List = list(custom)
        for ftype, inst in by_type.items():
            def col(attr, default=0.0):
                return tuple(
                    float(getattr(inst[i], attr)) if i in inst else float(default)
                    for i in range(nf)
                )

            if ftype is force_specs.XSPHViscosity:
                merged.append(
                    XSPHViscosityForce(
                        col("fluid_viscosity_coefficient"),
                        col("boundary_viscosity_coefficient"),
                    )
                )
            elif ftype is force_specs.ArtificialViscosity:
                merged.append(
                    ArtificialViscosityForce(
                        col("fluid_viscosity_coefficient"),
                        col("boundary_viscosity_coefficient"),
                        col("alpha", 1.0),
                        col("beta", 0.0),
                        col("speed_of_sound", 10.0),
                    )
                )
            elif ftype is force_specs.DFSPHViscosity:
                any_inst = next(iter(inst.values()))
                merged.append(
                    DFSPHViscosityForce(
                        col("viscosity_coefficient"),
                        tuple(1 if i in inst else 0 for i in range(nf)),
                        min_viscosity_iter=any_inst.min_viscosity_iter,
                        max_viscosity_iter=any_inst.max_viscosity_iter,
                        max_viscosity_error=any_inst.max_viscosity_error,
                    )
                )
            elif ftype is force_specs.Akinci2013SurfaceTension:
                merged.append(
                    Akinci2013SurfaceTensionForce(
                        col("fluid_tension_coefficient"),
                        col("boundary_adhesion_coefficient"),
                    )
                )
            elif ftype is force_specs.He2014SurfaceTension:
                merged.append(
                    He2014SurfaceTensionForce(
                        col("fluid_tension_coefficient"),
                        col("boundary_tension_coefficient"),
                    )
                )
            elif ftype is force_specs.WCSPHSurfaceTension:
                merged.append(
                    WCSPHSurfaceTensionForce(
                        col("fluid_tension_coefficient"),
                        col("boundary_tension_coefficient"),
                    )
                )
            elif ftype is force_specs.Becker2009Elasticity:
                d0, d1, d2 = [], [], []
                for i in range(nf):
                    if i in inst:
                        a, b, c = elasticity_coefficients(
                            inst[i].young_modulus, inst[i].poisson_ratio
                        )
                    else:
                        a = b = c = 0.0
                    d0.append(a)
                    d1.append(b)
                    d2.append(c)
                merged.append(
                    Becker2009ElasticityForce(
                        tuple(d0),
                        tuple(d1),
                        tuple(d2),
                        tuple(
                            1 if i in inst and inst[i].nonlinear_strain else 0
                            for i in range(nf)
                        ),
                        tuple(1 if i in inst else 0 for i in range(nf)),
                    )
                )
            else:
                raise TypeError(f"unknown non-pressure force {ftype.__name__}")
        return ForceSet(tuple(merged))

    def _rebuild_elasticity_state(self):
        """Capture rest state for all elasticity-carrying fluids
        (`becker2009_elasticity.rs:84-113`)."""
        elastic_fids = [
            fid
            for fid in range(self.num_fluids)
            if not self._fluid_records[fid].removed and self._has_elasticity(fid)
        ]
        if not elastic_fids:
            self._elasticity_state = None
            self._elasticity_dirty = False
            return
        fl = self.fluids_state
        is_elastic = jnp.isin(
            fl.fluid_id, jnp.asarray(elastic_fids, jnp.int32)
        ) & fl.alive
        h, dim = self.h, self.dim
        nbcfg = self.sim.neighbors
        # Same-fluid-only rest contacts: zero group masks fail the group
        # test, so only the same_model_always path admits pairs.
        zero_groups = GroupInfo(
            jnp.zeros_like(fl.memberships),
            jnp.zeros_like(fl.filter),
            fl.fluid_id,
        )
        grid = build_grid(fl.positions, is_elastic, h, dim)
        nl = find_neighbors(
            fl.positions, is_elastic, zero_groups,
            grid, fl.positions, is_elastic, zero_groups,
            h, dim, nbcfg.max_neighbors, nbcfg.max_candidates,
            same_model_always=True, query_chunk=nbcfg.query_chunk,
        )
        kd_w, _ = get_kernel(self.sim.kernel_density)
        _, kg_dw = get_kernel(self.sim.kernel_gradient)
        contacts = evaluate_contacts(
            fl.positions, fl.positions, nl, h, dim, w_fn=kd_w, dw_fn=kg_dw
        )
        self._elasticity_state = build_elasticity_state(fl, contacts, is_elastic)
        self._elasticity_dirty = False

    # -- stepping ----------------------------------------------------------

    def _prepare(self):
        if self._force_set is None:
            self._force_set = self._build_force_set()
        if self._elasticity_dirty:
            self._rebuild_elasticity_state()
        expected = init_solver_state(
            self.solver_config, self.fluids_state.capacity, self.dim
        )
        st = self._solver_state
        if st is None:
            self._solver_state = expected
        elif st.shape != expected.shape:
            if (
                st.ndim == 2
                and expected.ndim == 2
                and st.shape[0] == expected.shape[0]
                and st.shape[1] < expected.shape[1]
            ):
                # Legacy DFSPH state (velocity_changes only): keep it and
                # zero-init the added warm-start stiffness columns.
                self._solver_state = expected.at[:, : st.shape[1]].set(st)
            else:
                self._solver_state = expected

    def step(self, dt: float, gravity):
        """Advance the simulation by dt seconds (`liquid_world.rs:62-64`)."""
        self.step_with_coupling(dt, gravity, None)

    def _effective_sim(self) -> SimConfig:
        """Layout auto-tuning: with ``layout="auto"``, fall back to the
        gather path when the dense grid would be mostly vacuum (slot count
        far beyond the particle capacity) — dense wins on dense fluids,
        loses on tiny particle sets in large domains."""
        sim = self.sim
        if sim.domain is not None and self._brute_active():
            # Brute all-pairs tier (geometry.dense_grid.brute_spec): exact
            # small-N pair math with no spatial binning — no caps to
            # overflow, no window to fit, no per-column fixed costs. The
            # per-cyclic-cell slot counts derive from the capacities.
            uniform = self._uniform_particles()
            if sim.uniform_particles != uniform:
                sim = sim.replace(uniform_particles=uniform)
            cells = int(sim.brute_cells)
            return sim.replace(
                layout="brute",
                dense_cap=-(-self.fluids_state.capacity // cells),
                dense_cap_boundary=max(
                    1, -(-self.boundaries_state.capacity // cells)
                ),
                use_pallas=False,
                fitted_dims=None,
                dense_spill_columns=None,
                dense_fb_columns=None,
            )
        if sim.domain is not None:
            uniform = self._uniform_particles()
            if sim.uniform_particles != uniform:
                sim = sim.replace(uniform_particles=uniform)
            caps = self._resolved_dense_caps()
            if (sim.dense_cap, sim.dense_cap_boundary) != caps:
                sim = sim.replace(
                    dense_cap=caps[0], dense_cap_boundary=caps[1]
                )
            if self._dense_cap_request is None:
                # Spill table managed with the auto cap tier (explicit
                # cap requests leave dense_spill_columns user-controlled).
                # Re-checked against support here: a sim mutated after
                # resolution (e.g. half-stencil turned off) must not
                # reach DenseCtx with a stale spill setting — and a tier
                # RESOLVED for spill (cap 12) must not keep running
                # without its spill table (it would shed more contacts
                # than the 16 tier the resolver would otherwise pick), so
                # the whole tier re-resolves on disagreement (ADVICE r4).
                if self._auto_spill is not None and not self._spill_supported():
                    self._auto_caps = None
                    self._auto_spill = None
                caps = self._resolved_dense_caps()
                if (sim.dense_cap, sim.dense_cap_boundary) != caps:
                    sim = sim.replace(
                        dense_cap=caps[0], dense_cap_boundary=caps[1]
                    )
                spill = (
                    self._auto_spill if self._spill_supported() else None
                )
                if sim.dense_spill_columns != spill:
                    sim = sim.replace(dense_spill_columns=spill)
                k = self._auto_spill_k
                if spill is not None and k and sim.dense_spill_k != k:
                    sim = sim.replace(dense_spill_k=k)
            if self._fit_grid and not self._initial_fit_done:
                self._initial_fit()
            if sim.fitted_dims != self._fitted_dims:
                sim = sim.replace(fitted_dims=self._fitted_dims)
            fbc = self._resolved_fb_columns(sim)
            if sim.dense_fb_columns != fbc:
                sim = sim.replace(dense_fb_columns=fbc)
            if sim.use_pallas is None:
                sim = sim.replace(use_pallas=self._auto_use_pallas(sim))
        if sim.layout != "auto" or sim.domain is None:
            return sim
        mins, maxs = sim.domain
        cells = 1
        for lo, hi in zip(mins, maxs):
            cells *= max(int(np.ceil((hi - lo) / sim.h)) + 4, 3)
        # On accelerators the dense layout beats the gather path by ~2
        # orders of magnitude even at high grid vacancy (measured: a 3.4k
        # particle scene at 36k cells ran 8.4 s/step on gather vs tens of
        # ms dense), so only truly enormous grids fall back there; on CPU
        # the tradeoff is much closer and small worlds keep the cheaper
        # compile of the gather path.
        if jax.default_backend() == "cpu":
            slot_limit = 64 * self.fluids_state.capacity
        else:
            slot_limit = max(64 * self.fluids_state.capacity, 30_000_000)
        if cells * sim.dense_cap > slot_limit:
            return sim.replace(layout="gather")
        return sim

    def _auto_use_pallas(self, sim) -> bool:
        """Resolve ``use_pallas=None`` (auto): enable the v3 slot-group
        Pallas kernels on accelerators once the grid window is large
        enough for their per-call overhead to pay off. Measured on v5e
        (exp_pallas_ab.py): the full 1M dam-break step runs 1.68x
        faster at 216k window cells; the 97k step (32k cells) loses ~9%
        — the threshold sits conservatively between. Large mostly-air
        grids (emitter/heightfield scenes) qualify too: work there
        scales with occupied chunks instead of the vacuum. Guards
        mirror ``DenseCtx._use_pallas`` (spill / compact / CPU off)."""
        if jax.default_backend() == "cpu":
            return False
        if sim.dense_spill_columns or getattr(sim, "dense_compact", False):
            return False
        if sim.fitted_dims is not None:
            cells = int(np.prod(sim.fitted_dims))
        else:
            mins, maxs = sim.domain
            cells = 1
            for lo, hi in zip(mins, maxs):
                cells *= max(int(np.ceil((hi - lo) / sim.h)) + 4, 3)
        threshold = int(getattr(sim, "pallas_auto_cells", 0) or 0)
        return threshold > 0 and cells >= threshold

    # -- fluid-tracking grid window (config.fitted_dims) --------------------

    def _full_grid_dims(self) -> np.ndarray:
        """The full-domain grid dims (same formula as spec_for_aabb)."""
        h = self.sim.h
        mins = np.asarray(self.sim.domain[0], np.float64)
        maxs = np.asarray(self.sim.domain[1], np.float64)
        origin = mins - 2 * h
        return np.maximum(np.ceil((maxs - origin) / h).astype(int) + 2, 3)

    def _initial_fit(self):
        """First window sizing from the host-visible state (pre-step)."""
        self._initial_fit_done = True
        pos = np.asarray(self.fluids_state.positions)
        alive = np.asarray(self.fluids_state.alive)
        pos = pos[alive]
        if len(pos) == 0:
            return
        vel = np.asarray(self.fluids_state.velocities)[alive]
        vmax = float(np.sqrt((vel * vel).sum(axis=-1).max())) if len(vel) else 0.0
        self._refit_dims(pos.min(axis=0), pos.max(axis=0), vmax)

    def _maybe_refit_grid(self):
        """Resize the window from the on-device extent diagnostics (runs
        on the overflow-check cadence: no per-step host fetch — the
        per-substep origin tracking is on device)."""
        if not self._fit_grid or self.sim.domain is None:
            return
        if self._brute_active():
            return  # no grid window on the all-pairs tier
        d = self.last_diagnostics
        if d is None or d.fluid_min is None:
            return
        lo = np.asarray(d.fluid_min, np.float64)
        hi = np.asarray(d.fluid_max, np.float64)
        if not np.isfinite(lo).all() or (hi < lo).any():
            return  # no live fluid
        vmax = float(d.max_speed) if d.max_speed is not None else 0.0
        self._refit_dims(lo, hi, vmax)

    def _refit_dims(self, lo, hi, vmax):
        """Quantized, hysteretic window-size update.

        The window must hold the fluid extent plus: 2 low-side cells (the
        on-device origin places the fluid 2 cells in), a high-side slack
        covering extent growth until the next check (vmax-scaled), and
        rounding. Dims quantize to 4-cell steps so small extent changes
        do not recompile; on growth the new dims overshoot the old ones
        geometrically (x1.3 per axis) so a steadily spreading fluid
        triggers O(log extent) recompiles, not one per 4-cell crossing —
        each resize is a fresh XLA compile, which costs far more than the
        overshot vacuum cells. ``reserve_grid_window`` sets a floor that
        growth never dips below (and hysteresis never shrinks under)."""
        h = self.sim.h
        full = self._full_grid_dims()
        extent = np.ceil((np.asarray(hi) - np.asarray(lo)) / h).astype(int)
        # 2x the ballistic travel until the next check, +1 cell for
        # velocity gained between checks (gravity + pressure kicks —
        # vmax is stale by up to a full interval; measured escape-clamps
        # at dam-break splash with the bare 2x slack).
        grow = 1 + int(
            np.ceil(2.0 * vmax * self.overflow_check_interval
                    * self._last_dt / h)
        )
        need = extent + 1  # fluid cells
        dims = need + 4 + min(grow, 16)  # low margin + high slack
        dims = (np.ceil(dims / 4.0) * 4).astype(int)
        dims = np.minimum(np.maximum(dims, 8), full)
        if self._fit_floor_dims is not None:
            dims = np.minimum(np.maximum(dims, self._fit_floor_dims), full)

        cur = self._fitted_dims
        growing = False
        if cur is not None:
            cur = np.asarray(cur)
            ok = (cur >= need + 4).all()  # still room for margins
            not_bloated = float(np.prod(cur)) <= 1.7 * float(np.prod(dims))
            if ok and not_bloated:
                return
            growing = not ok
        if growing:
            # Geometric overshoot PER AXIS: only axes that actually ran
            # out of room overshoot (x1.3); the others keep their current
            # size — or shrink to the need-based size when that is a
            # meaningful (>= 1.3x) reduction, since this recompile is
            # already paid for. A dam break grows in x/z while its y
            # extent collapses; whole-window overshoot inflated every
            # axis (measured 64x61x64 = 250k columns at the 1M bench vs
            # ~188k needed — every column-scaled cost pays it).
            grow_axis = cur < need + 4
            target = np.where(
                grow_axis,
                np.ceil(cur * 1.3 / 4.0) * 4,
                np.where(dims * 1.3 <= cur, dims, cur),
            ).astype(int)
            dims = np.minimum(np.maximum(dims, target), full)
        if float(np.prod(dims)) >= 0.85 * float(np.prod(full)):
            new = None  # window ~= domain: not worth it
        else:
            new = tuple(int(v) for v in dims)
        if new != self._fitted_dims:
            self._fitted_dims = new
            self.grid_refit_count += 1

    def reserve_grid_window(self, mins, maxs):
        """Declare the extent the fluid is expected to reach, sizing the
        fitted grid window (``config.fitted_dims``) to cover it up front.
        A scene that knows its fluid's travel corridor (an emitter
        stream, a launched block) calls this once at setup so window
        growth never recompiles the step mid-run — the analog of
        ``reserve_fluid_capacity`` for the spatial axis."""
        if not self._fit_grid or self.sim.domain is None:
            return
        h = self.sim.h
        extent = np.ceil(
            (np.asarray(maxs, np.float64) - np.asarray(mins, np.float64)) / h
        ).astype(int)
        dims = extent + 1 + 4 + 4
        dims = (np.ceil(dims / 4.0) * 4).astype(int)
        self._fit_floor_dims = np.minimum(
            np.maximum(dims, 8), self._full_grid_dims()
        )
        if self._initial_fit_done:
            # Re-run sizing so an already-fitted window widens now (one
            # recompile here, none later).
            self._refit_dims(mins, maxs, 0.0)

    def _refresh_full_boundary_volumes(self):
        """One-time full-extent boundary-boundary volume pass so wall
        particles OUTSIDE the fitted box carry correct cached volumes
        (in-box recomputes never touch them again: they unbin through the
        previous-value fallback). Uses the grid-free gather machinery —
        runs once per boundary-set change, not per step."""
        bd = self.boundaries_state
        if not bool(np.asarray(bd.alive).any()):
            return
        from .solver.common import boundary_volumes as _bvol

        kd_w, _ = get_kernel(self.sim.kernel_density)
        bgroups = bd.groups()
        bgrid = build_grid(bd.positions, bd.alive, self.h, self.dim)
        from .geometry import weighted_sum_over_neighbors as _wsum

        wsum, _over = _wsum(
            bd.positions, bd.alive, bgroups, bgrid, bd.positions,
            bd.alive, bgroups, self.h, self.dim,
            self.sim.neighbors.max_candidates, same_model_always=True,
            w_fn=kd_w, query_chunk=self.sim.neighbors.query_chunk,
        )
        self.boundaries_state = bd.replace(volumes=_bvol(wsum, bd.alive))

    def _cell_counts(self, positions, alive):
        """Per-occupied-cell particle counts at the CURRENT state
        (host-side; only run when auto cap/spill sizing is (re)computed,
        never on the per-step path). None when no live particles."""
        pos = np.asarray(positions)[np.asarray(alive)]
        if len(pos) == 0:
            return None
        h = self.sim.h
        mins = np.asarray(self.sim.domain[0], np.float64)
        # Same origin rule as geometry.dense_grid.spec_for_aabb.
        origin = mins - 2 * h
        c = np.floor((pos - origin) / h).astype(np.int64)
        c -= c.min(axis=0)
        dims = c.max(axis=0) + 1
        key = c[:, 0]
        for axis in range(1, self.dim):
            key = key * dims[axis] + c[:, axis]
        _, counts = np.unique(key, return_counts=True)
        return counts

    def _max_cell_occupancy(self, positions, alive) -> int:
        counts = self._cell_counts(positions, alive)
        return 0 if counts is None else int(counts.max())

    def _resolved_dense_caps(self):
        """(dense_cap, dense_cap_boundary) with ``None`` requests
        auto-sized from measured occupancy (SURVEY §2: HGrid sizing is
        adaptive in the reference; here the static slot capacity is the
        analog). Fluid tier is 8 when occupancy leaves headroom, else 16
        (the only efficient TPU sublane tiers); boundary cap is the next
        multiple of 8 above measured occupancy. Cached until the array
        capacity changes or an overflow bump (``_warn_on_overflow``)."""
        req_f = self._dense_cap_request
        req_b = self._dense_cap_boundary_request
        if req_f is not None and req_b is not None:
            return (req_f, req_b)
        cap_key = (self.fluids_state.capacity, self.boundaries_state.capacity)
        if self._auto_caps is None or self._auto_caps_capacity != cap_key:
            occ_f = self._max_cell_occupancy(
                self.fluids_state.positions, self.fluids_state.alive
            )
            occ_b = self._max_cell_occupancy(
                self.boundaries_state.positions, self.boundaries_state.alive
            )
            # Fluids compress transiently (dam-break impact): require
            # headroom before picking the cheap tier. A 12 tier was
            # measured 1.40x faster at the 1M dam break PRE-impact
            # (495 vs 694 ms/step, tools/profile_stages VARIANTS=caps)
            # but rejected: the impact front compresses cells to
            # occupancy 14-16 (tools/exp_maxocc.py, 97k: occ 12 pre-
            # impact, 14-16 through steps 30-70 with a transient 39-entry
            # overflow even at cap 16), so 12 would shed contacts right
            # at the most dynamic moment and bump-recompile mid-run.
            # Harvesting that 1.4x needs a dense+spill structure (small
            # compacted overflow list beside a cap-8/12 grid), not a
            # tier change.
            # Round 4: the dense+spill structure harvests that 1.4x
            # SAFELY — the main grid runs the cheap 12 tier and the few
            # over-cap cells (measured 97k deep splash: <= ~350 of ~13k
            # occupied) route ranks 12..19 through compact spill columns
            # (see config.dense_spill_columns), so transient compression
            # sheds nothing. Tier 16 remains the fallback for
            # configurations the spill structure doesn't cover.
            if occ_f <= 5:
                cap_f = 8
                self._auto_spill = None
            elif self._spill_supported():
                cap_f = 12
                self._auto_spill = self._sized_spill_columns(cap_f)
            else:
                cap_f = 16
                self._auto_spill = None
            cap_b = max(8, -(-(occ_b + 2) // 8) * 8)
            self._auto_caps = (cap_f, cap_b)
            self._auto_caps_capacity = cap_key
        auto_f, auto_b = self._auto_caps
        return (
            req_f if req_f is not None else auto_f,
            req_b if req_b is not None else auto_b,
        )

    def _brute_active(self) -> bool:
        """Whether steps run the brute all-pairs tier (layout="brute",
        or "auto" on accelerators with capacities under the brute
        ceilings — where one masked capacity^2 pair block beats the
        grid's fixed per-column costs; see config.brute_max_particles).
        Requires the dense machinery (solver + force support): without
        it the auto fallback stays the gather path."""
        sim = self.sim
        if sim.domain is None:
            return False
        if sim.layout not in ("auto", "brute"):
            return False
        if sim.layout == "auto":
            if jax.default_backend() == "cpu":
                return False
            if (
                self.fluids_state.capacity > sim.brute_max_particles
                or self.boundaries_state.capacity > sim.brute_max_boundary
            ):
                return False
        if self.solver_config.kind not in ("dfsph", "iisph"):
            return False
        from .solver.forces_dense import to_dense_forces

        if self._force_set is None:
            self._force_set = self._build_force_set()
        return to_dense_forces(self._force_set) is not None

    def _spill_supported(self) -> bool:
        """The spill structure runs only on the single-device full-grid
        half-stencil dense path with sparse boundary binning, and the
        generic dense pair forces don't know the extended layout
        (particle-wise forces like elasticity are fine). Gated on
        ``dense_spill_auto`` (default off: measured 2.29x slower than the
        plain 16 tier on the TPU dam break — see config.py)."""
        sim = self.sim
        if not sim.dense_spill_auto:
            return False
        if sim.dense_compact or not sim.dense_sparse_boundary:
            return False
        if not sim.dense_half_stencil or sim.use_pallas:
            return False
        if sim.dense_frozen_pairs:
            return False
        from .solver.forces_dense import ParticleWiseForce, to_dense_forces

        if self._force_set is None:
            self._force_set = self._build_force_set()
        dense = to_dense_forces(self._force_set)
        if dense is None:
            return False  # gather layout anyway
        return all(isinstance(f, ParticleWiseForce) for f in dense)

    def _sized_spill_columns(self, cap_f: int) -> int:
        """Spill table size: 4x the measured over-cap cell count at the
        current state (usually ~0 on a fresh lattice — transient
        compression appears later), floored generously and quantized so
        occupancy drift doesn't recompile; the overflow path doubles it
        when the table fills."""
        counts = self._cell_counts(
            self.fluids_state.positions, self.fluids_state.alive
        )
        measured = int((counts > cap_f).sum()) if counts is not None else 0
        occupied = 0 if counts is None else len(counts)
        # Fresh lattices measure ~0 over-cap cells; transient splash
        # compression scales with the impact-front area, so the floor
        # scales with the occupied cell count (97k trajectory probe:
        # <= ~350 over-cap cells of ~13k occupied at tier 12).
        floor = max(512, -(-occupied // 64 // 512) * 512)
        return max(floor, -(-4 * measured // 512) * 512)

    def _resolved_fb_columns(self, sim: SimConfig) -> Optional[int]:
        """Static boundary-adjacency table size for the sparse fb hoist
        (config.dense_fb_columns): 1.5x the measured dilated
        boundary-occupied cell count, quantized to 512 columns so
        boundary drift doesn't recompile. None disables (no boundaries,
        or the compact layout which is already occupancy-scaled)."""
        if sim.dense_compact or not sim.dense_sparse_boundary:
            return None
        bd = self.boundaries_state
        cap_key = bd.capacity
        if self._fb_cols_cache is not None and (
            self._fb_cols_cache[0] == cap_key
        ):
            return self._fb_cols_cache[1]
        alive = np.asarray(bd.alive)
        if not alive.any():
            self._fb_cols_cache = (cap_key, None)
            return None
        pos = np.asarray(bd.positions)[alive]
        h = sim.h
        origin = np.asarray(sim.domain[0], np.float64) - 2 * h
        c = np.floor((pos - origin) / h).astype(np.int64)
        cells = np.unique(c, axis=0)
        offs = np.array(
            np.meshgrid(*([[-1, 0, 1]] * self.dim), indexing="ij")
        ).reshape(self.dim, -1).T
        dilated = (cells[:, None, :] + offs[None, :, :]).reshape(-1, self.dim)
        n = len(np.unique(dilated, axis=0))
        cols = int(-(-(n * 3) // (2 * 512)) * 512)
        self._fb_cols_cache = (cap_key, cols)
        return cols

    def _uniform_particles(self):
        """(handle, mass, density0) when all live particles provably share
        them — one non-removed fluid record (particle volume/mass/density0
        are record-derived constants) — else None. Enables the dense path's
        scatter-free constant channels (config.uniform_particles). The
        handle is carried so FID resolves to the *surviving* record: force
        coefficient tuples are indexed by record index including removed
        records."""
        live = [
            (h, r)
            for h, r in enumerate(self._fluid_records)
            if not r.removed
        ]
        if len(live) != 1:
            return None
        handle, rec = live[0]
        m0 = particle_volume(rec.particle_radius, self.dim) * rec.density0
        return (int(handle), float(m0), float(rec.density0))

    def _boundary_volume_mode(self, sim: SimConfig, coupling) -> SimConfig:
        """Skip the boundary-volume pair pass on steps where no boundary
        changed (volumes depend only on boundary positions).

        Only applied on the dense path: there the bb pass is the most
        expensive fixed cost (capb^2), while on the gather path the
        saving is negligible and would double the compiled variants.
        """
        if sim.domain is None or sim.layout == "gather":
            return sim
        recompute = self._boundary_dirty or coupling is not None
        if sim.recompute_boundary_volumes != recompute:
            sim = sim.replace(recompute_boundary_volumes=recompute)
        return sim

    def step_with_coupling(self, dt: float, gravity, coupling):
        """Advance with two-way rigid-body coupling
        (`liquid_world.rs:67-158`). ``coupling`` follows the
        `CouplingManager` protocol (`coupling/base.py`) or is None."""
        self.counters.reset()
        self.counters.step_time.start()
        self._last_dt = float(dt)
        if (
            self._fit_grid
            and self._initial_fit_done
            and self._steps_taken == 0
            and self._fitted_dims is not None
        ):
            # A pre-step fit (explicit `_prepare()` before the first
            # step) sized the window's velocity slack with the DEFAULT
            # dt (1/60); with the real dt now known, redo the fit from
            # scratch — nothing is compiled yet, so adopting the tight
            # window is free. Measured: the stale-dt window carried
            # 36x34x36 columns at 97k vs the 32^3 a dt=1/200 fit needs.
            self._fitted_dims = None
            self._initial_fit()
        self._apply_particles_removal()
        self._prepare()
        gravity = jnp.asarray(gravity, jnp.float32)
        num_fluids = max(self.num_fluids, 1)
        sim_eff = self._boundary_volume_mode(self._effective_sim(), coupling)
        if sim_eff.fitted_dims is not None and self._full_bvol_stale:
            self._refresh_full_boundary_volumes()
            self._full_bvol_stale = False
        step_fn = get_jitted_step_fn(
            sim_eff, self.solver_config, self._force_set, num_fluids
        )
        self._maybe_warn_gather_on_accelerator(sim_eff)

        tm = self.timestep_manager
        tm.reset(dt)
        # Reference CFL (`timestep_manager.rs:36-46`) uses the particles'
        # actual accelerations. They are folded inside the jitted substep
        # here, so recover a_i = (v - v_prev) / dt from the previous
        # substep's velocity delta (all forces, incl. pressure); on the
        # first substep of a step (no delta yet) fall back to gravity.
        # Slots never permute inside the substep loop, so the delta is
        # slot-aligned. One scalar device->host fetch per substep, only
        # when adaptive=True.
        prev_vel = self.fluids_state.velocities
        inv_prev_dt = 0.0
        while not tm.is_done():
            if tm.adaptive:
                vmax = float(_cfl_vmax(
                    self.fluids_state.velocities, prev_vel,
                    self.fluids_state.alive, gravity,
                    jnp.float32(inv_prev_dt), jnp.float32(tm.remaining_time),
                ))
            else:
                vmax = 0.0
            if tm.adaptive:
                prev_vel = self.fluids_state.velocities
            sub_dt = tm.advance(vmax)
            inv_prev_dt = 1.0 / sub_dt if sub_dt > 0.0 else 0.0
            if coupling is not None:
                self.counters.cd.boundary_update_time.resume()
                coupling.update_boundaries(self, sub_dt)
                self.counters.cd.boundary_update_time.pause()
            self.counters.dispatch_time.resume()
            (
                self.fluids_state,
                self.boundaries_state,
                self._solver_state,
                self.last_diagnostics,
            ) = step_fn(
                self.fluids_state,
                self.boundaries_state,
                self._solver_state,
                self._elasticity_state,
                sub_dt,
                gravity,
            )
            self.counters.dispatch_time.pause()
            if coupling is not None:
                self.counters.coupling_transmit_time.resume()
                coupling.transmit_forces(self, sub_dt)
                self.counters.coupling_transmit_time.pause()
            self.counters.nsubsteps += 1

        if self.counters.enabled:
            self.counters.fetch_time.resume()
            jax.block_until_ready(self.fluids_state.positions)
            self.counters.fetch_time.pause()
            if self.last_diagnostics is not None:
                self.counters.cd.ncontacts = int(
                    self.last_diagnostics.ncontacts_ff
                    + self.last_diagnostics.ncontacts_fb
                )
        self.counters.step_time.pause()
        if coupling is None:
            self._boundary_dirty = False
        self._steps_taken += 1
        if self.debug_checks:
            self._run_debug_checks()
            self._maybe_refit_grid()
        elif self.warn_overflow and (
            self._steps_taken == 1
            or self._steps_taken % max(self.overflow_check_interval, 1) == 0
            or getattr(self, "_overflow_alert", 0) > 0
        ):
            self._overflow_alert = max(
                getattr(self, "_overflow_alert", 0) - 1, 0
            )
            refits_before = self.grid_refit_count
            self._warn_on_overflow()
            self._maybe_refit_grid()
            # Window-escape latency (measured: impact-splash velocity
            # spikes outrun the vmax-sized slack between interval
            # checks, clamping ~1% of particles into the border ring
            # until the next check): when a check sees clamped particles
            # AND the refit just resized (i.e. a bigger window actually
            # helps), keep checking EVERY step until the window stops
            # moving. Clamps the window cannot fix — particles escaped
            # the DOMAIN box, or the window already covers the extent —
            # must NOT alert: each check forces a device sync, and a
            # permanent-clamp scene would pay it on every step forever.
            d = self.last_diagnostics
            if (
                self.grid_refit_count != refits_before
                and d is not None
                and int(d.candidate_overflow) > 0
            ):
                self._overflow_alert = max(self.overflow_check_interval, 1)

    def _warn_on_overflow(self):
        """Default failure surfacing: capacity overflow silently drops
        contacts, so it must be loud even without ``debug_checks``."""
        import warnings

        d = self.last_diagnostics
        if d is None:
            return
        n_over = int(d.neighbor_overflow)
        c_over = int(d.candidate_overflow)
        if n_over > 0 and self._bump_auto_dense_cap():
            warnings.warn(
                f"neighbor capacity overflow: {n_over} entries dropped — "
                "auto-grew the dense cap/spill sizing for subsequent steps "
                "(transient compression exceeded the measured tier)"
            )
        elif n_over > 0:
            warnings.warn(
                f"neighbor capacity overflow: {n_over} entries dropped — "
                "physics degraded; raise max_neighbors / dense_cap"
            )
        if c_over > 0:
            warnings.warn(
                f"candidate window / domain overflow: {c_over} (particles "
                "clamped or candidates truncated); enlarge the domain or "
                "max_candidates"
            )

    def _bump_auto_dense_cap(self) -> bool:
        """Self-healing for auto cap/spill sizing. In order:

        - spill TABLE overflow (cells/adjacency beyond the static
          tables): double the spill table — contacts were dropped by
          sizing, not by the cap tier;
        - rank overflow on a spill tier (occupancy beyond
          cap + spill rows): raise the cap tier (12 -> 16, spill kept:
          representable occupancy 20 -> 24);
        - rank overflow on a plain tier: raise to the next efficient
          tier (8 -> 12+spill when supported, else 16).

        Returns True when a change was applied (each one recompiles)."""
        if self._dense_cap_request is not None:
            return False
        if self.sim.domain is None or self._auto_caps is None:
            return False
        cap_f, cap_b = self._auto_caps
        d = self.last_diagnostics
        sp_over = 0
        sp_k_over = 0
        if d is not None and d.spill_overflow is not None:
            sp_over = int(d.spill_overflow)
        if d is not None and getattr(d, "spill_k_overflow", None) is not None:
            sp_k_over = int(d.spill_k_overflow)
        if self._auto_spill and sp_k_over > 0:
            # Condensed-K overflow is insensitive to the spill table size
            # E (ADVICE r4): widen K toward the stencil size — at 3^dim
            # entries a column's K table can hold its whole neighborhood,
            # so overflow becomes impossible — instead of doubling E
            # forever. If K is somehow already saturated, fall back to
            # the plain 16 tier rather than loop.
            n_off = 3 ** self.dim
            cur_k = self._auto_spill_k or self.sim.dense_spill_k
            if cur_k < n_off:
                self._auto_spill_k = min(2 * cur_k, n_off)
            else:
                self._auto_caps = (16, cap_b)
                self._auto_spill = None
            self.grid_refit_count += 1
            return True
        if self._auto_spill and sp_over > 0:
            grown = min(2 * self._auto_spill, 1 << 20)
            if grown == self._auto_spill:
                # Saturated: doubling changed nothing, so report
                # unhealed instead of warning "auto-grew" forever
                # (ADVICE r4).
                return False
            self._auto_spill = grown
            # Every cap/spill change recompiles the step; count it like
            # a window refit so benchmark timed windows rerun cleanly.
            self.grid_refit_count += 1
            return True
        if cap_f >= 48:
            # Occupancy beyond 48 in an h-wide cell (rest packing is ~8)
            # means a pathological pile-up (domain-clamp escapees), not a
            # fluid state a bigger cap would fix.
            return False
        if cap_f < 12 and self._spill_supported():
            self._auto_caps = (12, cap_b)
            self._auto_spill = self._sized_spill_columns(12)
        elif cap_f < 16:
            self._auto_caps = (16, cap_b)
        else:
            # Keep healing past 16 in sublane-granule steps (VERDICT r4
            # #5: basic3's impact compression exceeded 16 and shed 8.8%
            # of its contacts with no self-heal): shedding contacts is a
            # physics failure, a bigger pair block is only a perf cost.
            self._auto_caps = (cap_f + 8, cap_b)
        self.grid_refit_count += 1
        return True

    def _maybe_warn_gather_on_accelerator(self, sim_eff: SimConfig):
        """The `[N, K]` gather layout is measured ~2 orders of magnitude
        off the dense path on TPU (random gathers/scatters run far off
        HBM bandwidth); at non-toy sizes that is almost never what the
        user wants — tell them once how to get the fast path."""
        if getattr(self, "_warned_gather", False):
            return
        from .step import _dense_config

        on_accel = jax.default_backend() != "cpu"
        big = int((self._fluid_slot_owner >= 0).sum()) > 20_000
        if not (on_accel and big):
            return
        if _dense_config(sim_eff, self.solver_config, self._force_set) is None:
            import warnings

            warnings.warn(
                "running the gather layout on an accelerator at "
                ">20k particles — this path is ~100x off the dense layout "
                "on TPU; set a static `domain` box (and avoid forces "
                "without dense implementations) to enable the dense path"
            )
            self._warned_gather = True

    def _run_debug_checks(self):
        """Failure detection (SURVEY.md §5.3): raise on non-finite state,
        warn on capacity overflow — the structured equivalent of the
        reference's asserts/clamps (`dfsph_solver.rs:92,662`)."""
        import warnings

        d = self.last_diagnostics
        if d is not None:
            if int(d.neighbor_overflow) > 0:
                bumped = self._bump_auto_dense_cap()
                warnings.warn(
                    f"neighbor capacity overflow: {int(d.neighbor_overflow)}"
                    " entries dropped — "
                    + ("auto-grew the dense cap/spill sizing for subsequent steps"
                       if bumped else
                       "physics degraded; raise max_neighbors / dense_cap")
                )
            if int(d.candidate_overflow) > 0:
                warnings.warn(
                    "candidate window / domain overflow: "
                    f"{int(d.candidate_overflow)} (particles clamped or "
                    "candidates truncated)"
                )
        pos = np.asarray(self.fluids_state.positions)
        alive = np.asarray(self.fluids_state.alive)
        if not np.isfinite(pos[alive]).all():
            raise FloatingPointError(
                "non-finite fluid positions after step (instability: reduce "
                "dt or check force coefficients)"
            )

    # -- ordering / queries ------------------------------------------------

    def z_sort(self):
        """Reorder fluid particles in Morton order for gather locality
        (`Fluid::z_sort`, `fluid.rs:153-163`; dead slots sort last)."""
        from .geometry.grid import DEAD_KEY, cell_coords, morton_key

        self._sync_fluid_mirrors()

        fl = self.fluids_state
        keys = morton_key(cell_coords(fl.positions, self.h), self.dim)
        keys = jnp.where(fl.alive, keys, DEAD_KEY)
        perm = jnp.argsort(keys)
        perm_np = np.asarray(perm)
        inv = np.empty_like(perm_np)
        inv[perm_np] = np.arange(len(perm_np))
        inv_j = jnp.asarray(inv, jnp.int32)

        def permute(a):
            return a[perm]

        self.fluids_state = jax.tree_util.tree_map(permute, fl)
        self._fluid_alive = self._fluid_alive[perm_np]
        self._fluid_slot_owner = self._fluid_slot_owner[perm_np]
        if self._solver_state is not None:
            self._solver_state = self._solver_state[perm]
        if self._elasticity_state is not None:
            es = self._elasticity_state
            self._elasticity_state = es.replace(
                positions0=es.positions0[perm],
                volumes0=es.volumes0[perm],
                rest_j=inv_j[es.rest_j[perm]],
                rest_valid=es.rest_valid[perm],
                rest_w=es.rest_w[perm],
                rest_grad=es.rest_grad[perm],
            )

    def particles_intersecting_aabb(self, mins, maxs):
        """Particle ids near an AABB (loosened by the particle radius),
        `liquid_world.rs:211-246`. Returns (kind, handle, index) tuples."""
        self._sync_fluid_mirrors()
        mins = np.asarray(mins)
        maxs = np.asarray(maxs)
        out = []
        for kind, state, alive, owner in (
            ("fluid", self.fluids_state, self._fluid_alive, self._fluid_slot_owner),
            (
                "boundary",
                self.boundaries_state,
                self._boundary_alive,
                self._boundary_slot_owner,
            ),
        ):
            pos = np.asarray(state.positions)
            clamped = np.clip(pos, mins, maxs)
            d = np.linalg.norm(pos - clamped, axis=-1)
            hits = np.where(alive & (d < self.particle_radius))[0]
            out.extend(_slot_ids(kind, owner, alive, hits))
        return out

    def particles_intersecting_shape(self, shape, rotation, translation):
        """Particle ids near a posed SDF shape (`liquid_world.rs:248-280`)."""
        from .shapes import TriMesh, world_sdf

        self._sync_fluid_mirrors()

        if isinstance(shape, TriMesh):
            from .sampling.voxelize import trimesh_sdf

            shape = trimesh_sdf(shape)

        rotation = jnp.asarray(rotation, jnp.float32)
        translation = jnp.asarray(translation, jnp.float32)
        out = []
        for kind, state, alive, owner in (
            ("fluid", self.fluids_state, self._fluid_alive, self._fluid_slot_owner),
            (
                "boundary",
                self.boundaries_state,
                self._boundary_alive,
                self._boundary_slot_owner,
            ),
        ):
            d = np.asarray(world_sdf(shape, state.positions, rotation, translation))
            hits = np.where(alive & (d <= self.particle_radius))[0]
            out.extend(_slot_ids(kind, owner, alive, hits))
        return out


@jax.jit
def _cfl_vmax(vel, prev_vel, alive, gravity, inv_prev_dt, t_rem):
    """``max_i ||v_i + a_i * t_remaining||`` (`timestep_manager.rs:36-46`)
    with ``a_i`` recovered from the previous substep's velocity delta;
    gravity on the first substep of a step (``inv_prev_dt == 0``)."""
    accel = jnp.where(
        inv_prev_dt > 0.0,
        (vel - prev_vel) * inv_prev_dt,
        gravity[None, :],
    )
    v_pred = vel + accel * t_rem
    speed = jnp.sqrt(jnp.sum(v_pred * v_pred, axis=-1))
    return jnp.max(jnp.where(alive, speed, 0.0))


def _slot_ids(kind, owner, alive, hits):
    """(kind, handle, index-within-handle) tuples for hit slots.

    One O(N log N) rank pass instead of an O(N) scan per hit (the old
    form was quadratic for region queries at 1M)."""
    live = np.flatnonzero(alive & (owner >= 0))
    ow = owner[live]
    order = np.argsort(ow, kind="stable")
    so = ow[order]
    n = len(so)
    is_first = np.ones(n, bool)
    if n > 1:
        is_first[1:] = so[1:] != so[:-1]
    first = np.maximum.accumulate(np.where(is_first, np.arange(n), 0))
    ranks = np.empty(n, np.int64)
    ranks[order] = np.arange(n) - first
    idx_of_slot = np.full(len(owner), -1, np.int64)
    idx_of_slot[live] = ranks
    return [
        (kind, int(owner[s]), int(idx_of_slot[s]))
        for s in hits
        if idx_of_slot[s] >= 0
    ]


def _solver_state_capacity(state) -> int:
    return state.shape[0]


def _grow_solver_state(state, new_cap: int, dim: int):
    if state.ndim == 2:
        new = jnp.zeros((new_cap, state.shape[1]), state.dtype)
    else:
        new = jnp.zeros((new_cap,), state.dtype)
    return new.at[: state.shape[0]].set(state)
