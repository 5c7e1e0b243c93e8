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
        device_coupling: Optional[bool] = None,
        fit_grid: bool = True,
    ):
        self.liquid_world = LiquidWorld(
            solver=solver if solver is not None else DFSPHConfig(),
            particle_radius=particle_radius,
            smoothing_factor=smoothing_factor,
            dim=dim,
            neighbors=neighbors,
            domain=domain,
            layout=layout,
            fit_grid=fit_grid,
        )
        self.bodies = RigidBodyWorld(dim)
        self.coupling = ColliderCouplingSet(self.bodies)
        # ``device_coupling``: None = auto (device-resident rigid bodies +
        # coupling on accelerators — zero host round trips per substep,
        # the measured fix for tunnel-latency-bound coupled scenes);
        # True/False force either path.
        self._device_request = device_coupling
        self._device = None

    def _maybe_device(self):
        if self._device is not None:
            return self._device
        use = self._device_request
        if use is None:
            import jax

            use = jax.default_backend() != "cpu"
        if use:
            from .device_pipeline import DeviceColliderCoupling

            self._device = DeviceColliderCoupling(
                self.coupling, self.liquid_world
            )
        else:
            self._device = False
        return self._device

    def step(self, gravity, dt: float):
        """Advance bodies then fluids-with-coupling
        (`fluids_pipeline.rs:48-61`; body integration is rapier's job in the
        reference, done by the testbed around the fluid step)."""
        dev = self._maybe_device()
        if dev:
            # Body integration happens inside the device coupling's
            # pre-step (one fused dispatch, no host round trips).
            dev.set_gravity(gravity)
            self.liquid_world.step_with_coupling(dt, gravity, dev)
        else:
            self.bodies.step(dt, gravity)
            self.liquid_world.step_with_coupling(dt, gravity, self.coupling)

    def sync_bodies(self):
        """Bring host RigidBody poses up to date with the device state
        (no-op on the host path)."""
        if self._device:
            self._device.sync_to_host()
        return self.bodies
