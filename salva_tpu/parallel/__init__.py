"""Multi-device execution: particle-axis sharding over a device mesh.

The reference's only parallelism is rayon shared-memory loops
(SURVEY.md §2.3); its TPU-native counterpart is SPMD over a
``jax.sharding.Mesh``. This package provides:

- ``make_mesh``: a 1D device mesh over the ``"p"`` (particles) axis;
- ``shard_states`` / ``state_shardings``: place the capacity-N particle
  pytrees on the mesh, sharded along the particle axis;
- ``sharded_step_fn``: the world step jitted with sharding constraints so
  XLA's SPMD partitioner distributes the neighbor search and solver loops
  and inserts the collectives (all-gathers for neighbor gathers, psums for
  the convergence reductions) over ICI.
"""

from .sharding import make_mesh, replicated, shard_states, state_shardings

__all__ = ["make_mesh", "shard_states", "state_shardings", "replicated"]
