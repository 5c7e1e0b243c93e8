"""Device-side particle state pytrees.

The reference stores each fluid/boundary as its own SoA object
(``src/object/fluid.rs:12-34``, ``src/object/boundary.rs:11-24``) and
iterates over objects in Python^W Rust loops. TPU-first design merges all
fluids into ONE capacity-``N`` array set (and all boundaries into one
capacity-``M`` set):

- object membership becomes a per-particle ``fluid_id`` / ``boundary_id``
  array, so per-object quantities (rest density, force coefficients) are
  plain gathers and multiphase is free;
- the deferred-deletion mask (``fluid.rs:71-98``) becomes a persistent
  ``alive`` mask + free-list: deleting flips a bit, emitting writes into
  dead slots — shapes never change, nothing recompiles;
- the RwLock'd boundary force accumulator (``boundary.rs:21,62-67``)
  becomes a dense ``forces[M, dim]`` array written with deterministic
  scatter-adds.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..config import particle_volume
from ..geometry.neighbors import GroupInfo


@struct.dataclass
class FluidsState:
    """All fluid particles of a world, merged (capacity N)."""

    positions: jnp.ndarray  # [N, dim] f32
    velocities: jnp.ndarray  # [N, dim] f32
    volumes: jnp.ndarray  # [N] f32
    density0: jnp.ndarray  # [N] f32 rest density (per particle -> multiphase)
    alive: jnp.ndarray  # [N] bool
    fluid_id: jnp.ndarray  # [N] i32
    memberships: jnp.ndarray  # [N] u32
    filter: jnp.ndarray  # [N] u32

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    @property
    def dim(self) -> int:
        return self.positions.shape[1]

    @property
    def masses(self) -> jnp.ndarray:
        """Per-particle mass = volume * rest density (`fluid.rs:183-187`)."""
        return self.volumes * self.density0

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def groups(self) -> GroupInfo:
        return GroupInfo(self.memberships, self.filter, self.fluid_id)

    @classmethod
    def empty(cls, capacity: int, dim: int) -> "FluidsState":
        return cls(
            positions=jnp.zeros((capacity, dim), jnp.float32),
            velocities=jnp.zeros((capacity, dim), jnp.float32),
            volumes=jnp.zeros((capacity,), jnp.float32),
            density0=jnp.ones((capacity,), jnp.float32),
            alive=jnp.zeros((capacity,), bool),
            fluid_id=jnp.zeros((capacity,), jnp.int32),
            memberships=jnp.zeros((capacity,), jnp.uint32),
            filter=jnp.zeros((capacity,), jnp.uint32),
        )


@struct.dataclass
class BoundariesState:
    """All boundary particles of a world, merged (capacity M)."""

    positions: jnp.ndarray  # [M, dim] f32
    velocities: jnp.ndarray  # [M, dim] f32
    volumes: jnp.ndarray  # [M] f32 (computed each substep: 1 / sum W)
    forces: jnp.ndarray  # [M, dim] f32 force feedback accumulator
    alive: jnp.ndarray  # [M] bool
    boundary_id: jnp.ndarray  # [M] i32
    memberships: jnp.ndarray  # [M] u32
    filter: jnp.ndarray  # [M] u32

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    @property
    def dim(self) -> int:
        return self.positions.shape[1]

    def groups(self) -> GroupInfo:
        return GroupInfo(self.memberships, self.filter, self.boundary_id)

    def clear_forces(self) -> "BoundariesState":
        """`Boundary::clear_forces` (`boundary.rs:70-82`)."""
        return self.replace(forces=jnp.zeros_like(self.forces))

    @classmethod
    def empty(cls, capacity: int, dim: int) -> "BoundariesState":
        return cls(
            positions=jnp.zeros((capacity, dim), jnp.float32),
            velocities=jnp.zeros((capacity, dim), jnp.float32),
            volumes=jnp.zeros((capacity,), jnp.float32),
            forces=jnp.zeros((capacity, dim), jnp.float32),
            alive=jnp.zeros((capacity,), bool),
            boundary_id=jnp.zeros((capacity,), jnp.int32),
            memberships=jnp.zeros((capacity,), jnp.uint32),
            filter=jnp.zeros((capacity,), jnp.uint32),
        )


def fill_particles(
    state,
    start: int,
    positions,
    object_id: int,
    memberships: int,
    group_filter: int,
    velocities=None,
    volume: Optional[float] = None,
    density0: Optional[float] = None,
):
    """Write a contiguous block of particles into a state (host-side setup).

    Returns the updated state. Used by the world builder to pack fluid /
    boundary objects into the merged arrays.
    """
    n = positions.shape[0]
    idx = jnp.arange(start, start + n)
    positions = jnp.asarray(positions, jnp.float32)
    if velocities is None:
        velocities = jnp.zeros_like(positions)
    else:
        velocities = jnp.asarray(velocities, jnp.float32)
    upd = dict(
        positions=state.positions.at[idx].set(positions),
        velocities=state.velocities.at[idx].set(velocities),
        alive=state.alive.at[idx].set(True),
        memberships=state.memberships.at[idx].set(jnp.uint32(memberships)),
        filter=state.filter.at[idx].set(jnp.uint32(group_filter)),
    )
    if isinstance(state, FluidsState):
        upd["fluid_id"] = state.fluid_id.at[idx].set(object_id)
        upd["volumes"] = state.volumes.at[idx].set(volume)
        upd["density0"] = state.density0.at[idx].set(density0)
    else:
        upd["boundary_id"] = state.boundary_id.at[idx].set(object_id)
        if volume is not None:
            upd["volumes"] = state.volumes.at[idx].set(volume)
    return state.replace(**upd)


def default_particle_volume(particle_radius: float, dim: int) -> float:
    return particle_volume(particle_radius, dim)
