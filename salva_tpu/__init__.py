"""salva_tpu — a TPU-native SPH fluid simulation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dimforge/salva (2D & 3D particle-based fluids with DFSPH/IISPH pressure
solvers, non-pressure forces, boundary handling and two-way rigid-body
coupling), architected for TPU hardware: fixed-shape SoA state, sort-based
Morton neighbor lists, `lax.while_loop` solver iterations and
`shard_map`-based multi-device domain decomposition: the dense grid's
cell axis is split into per-device slabs with `ppermute` ghost-layer
(halo) exchange each solver iteration and psum'd convergence errors
(`parallel/domain.py`).
"""

from .config import DFSPHConfig, IISPHConfig, NeighborConfig, SimConfig, particle_volume
from .object import (
    ALL,
    NONE,
    BoundariesState,
    FluidsState,
    InteractionGroups,
    group,
)
from .version import __version__

__all__ = [
    "__version__",
    "SimConfig",
    "NeighborConfig",
    "DFSPHConfig",
    "IISPHConfig",
    "particle_volume",
    "FluidsState",
    "BoundariesState",
    "InteractionGroups",
    "group",
    "ALL",
    "NONE",
    "LiquidWorld",
    "Fluid",
    "Boundary",
    "FluidsPipeline",
    "CustomForce",
]


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules at
    package import time)."""
    if name in ("LiquidWorld", "Fluid", "Boundary"):
        from . import world

        return getattr(world, name)
    if name == "FluidsPipeline":
        from .coupling import FluidsPipeline

        return FluidsPipeline
    if name == "CustomForce":
        from .solver.nonpressure import CustomForce

        return CustomForce
    raise AttributeError(f"module 'salva_tpu' has no attribute {name!r}")
