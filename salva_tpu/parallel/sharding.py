"""Mesh construction and particle-axis sharding placement.

Design (SURVEY.md §2.3, §5.8): all particle state lives in capacity-N SoA
arrays with the particle axis leading, so a single ``NamedSharding(mesh,
P("p"))`` on that axis shards every stage — grid build, neighbor search,
contact reductions, solver iterations — and XLA's SPMD partitioner inserts
the ICI collectives. The convergence scalars (mean density error etc.) are
psum-reduced to replicated scalars automatically, reproducing the
reference's global terminate-on-mean-error rule (`dfsph_solver.rs:150-160`)
across devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "p") -> Mesh:
    """A 1D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_sharding(mesh: Mesh, axis_name: str, leaf) -> NamedSharding:
    if getattr(leaf, "ndim", 0) >= 1:
        return NamedSharding(mesh, P(axis_name, *([None] * (leaf.ndim - 1))))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, tree, axis_name: str = "p"):
    """Pytree of NamedShardings: leading (particle) axis sharded."""
    return jax.tree_util.tree_map(
        lambda leaf: _leaf_sharding(mesh, axis_name, leaf), tree
    )


def shard_states(mesh: Mesh, *trees, axis_name: str = "p"):
    """``device_put`` each pytree with its particle axis sharded on the
    mesh. Returns the placed trees (singular tree if one argument)."""
    placed = tuple(
        jax.device_put(t, state_shardings(mesh, t, axis_name)) for t in trees
    )
    return placed[0] if len(placed) == 1 else placed
