"""Shared helpers for building small test scenes directly on the state
pytrees (the World wrapper has its own tests)."""

import jax.numpy as jnp
import numpy as np

from salva_tpu.config import particle_volume
from salva_tpu.object.state import BoundariesState, FluidsState


def cube_positions(n, radius, dim, origin=None):
    """Grid of n^dim particles spaced 2*radius (the examples' helper
    `cube_fluid` layout)."""
    axes = [np.arange(n) * 2.0 * radius for _ in range(dim)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, dim)
    if origin is not None:
        grid = grid + np.asarray(origin)
    return grid.astype(np.float32)


def make_fluids(positions, radius, dim, capacity=None, density0=1000.0,
                velocities=None):
    n = positions.shape[0]
    capacity = capacity or n
    vol = particle_volume(radius, dim)
    fl = FluidsState.empty(capacity, dim)
    idx = jnp.arange(n)
    fl = fl.replace(
        positions=fl.positions.at[idx].set(jnp.asarray(positions)),
        velocities=(
            fl.velocities.at[idx].set(jnp.asarray(velocities))
            if velocities is not None
            else fl.velocities
        ),
        volumes=fl.volumes.at[idx].set(vol),
        density0=fl.density0.at[idx].set(density0),
        alive=fl.alive.at[idx].set(True),
        memberships=fl.memberships.at[idx].set(jnp.uint32(1)),
        filter=fl.filter.at[idx].set(jnp.uint32(0xFFFFFFFF)),
    )
    return fl


def make_boundaries(positions, dim, capacity=None):
    n = positions.shape[0] if positions is not None else 0
    capacity = capacity or max(n, 8)
    bd = BoundariesState.empty(capacity, dim)
    if n:
        idx = jnp.arange(n)
        bd = bd.replace(
            positions=bd.positions.at[idx].set(jnp.asarray(positions)),
            alive=bd.alive.at[idx].set(True),
            memberships=bd.memberships.at[idx].set(jnp.uint32(1)),
            filter=bd.filter.at[idx].set(jnp.uint32(0xFFFFFFFF)),
        )
    return bd
