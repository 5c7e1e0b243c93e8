"""`FluidsPipeline`: the coupled simulation entry point.

Mirrors the reference (``src/integrations/rapier/fluids_pipeline.rs:26-61``):
a ``LiquidWorld`` (DFSPH by default, ``:34-41``) plus a
``ColliderCouplingSet``. One ``step`` advances rigid bodies and fluids with
two-way coupling, exactly like the testbed/harness plugins drive it each
frame (``harness_plugin.rs:59-70``).
"""

from __future__ import annotations

from typing import Optional

from ..config import DFSPHConfig, NeighborConfig
from ..world import LiquidWorld
from .collider_coupling import ColliderCouplingSet
from .rigid_body import RigidBodyWorld


class FluidsPipeline:
    def __init__(
        self,
        particle_radius: float,
        smoothing_factor: float = 2.0,
        dim: int = 3,
        solver=None,
        neighbors: Optional[NeighborConfig] = None,
        domain=None,
        layout: str = "auto",
    ):
        self.liquid_world = LiquidWorld(
            solver=solver if solver is not None else DFSPHConfig(),
            particle_radius=particle_radius,
            smoothing_factor=smoothing_factor,
            dim=dim,
            neighbors=neighbors,
            domain=domain,
            layout=layout,
        )
        self.bodies = RigidBodyWorld(dim)
        self.coupling = ColliderCouplingSet(self.bodies)

    def step(self, gravity, dt: float):
        """Advance bodies then fluids-with-coupling
        (`fluids_pipeline.rs:48-61`; body integration is rapier's job in the
        reference, done by the testbed around the fluid step)."""
        self.bodies.step(dt, gravity)
        self.liquid_world.step_with_coupling(dt, gravity, self.coupling)
