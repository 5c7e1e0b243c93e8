"""Two-way coupling between the fluid world and rigid-body dynamics.

The reference couples salva to the external rapier engine through the
``CouplingManager`` trait (``src/coupling/coupling_manager.rs``) and ships a
rapier implementation (``src/integrations/rapier/fluids_pipeline.rs``). This
package provides the same layering:

- ``base``: the coupling protocol the ``LiquidWorld`` step calls;
- ``rigid_body``: a minimal rigid-body engine playing rapier's role
  (bodies + SDF colliders + symplectic integration + impulses);
- ``collider_coupling``: ``ColliderSampling`` / ``ColliderCouplingSet`` —
  boundary resampling from collider poses and force transmission;
- ``pipeline``: ``FluidsPipeline`` — the one-call-per-frame entry point.
"""

from .base import CouplingManager, NoOpCoupling
from .collider_coupling import ColliderCouplingSet, ColliderSampling
from .pipeline import FluidsPipeline
from .rigid_body import RigidBody, RigidBodyWorld

__all__ = [
    "CouplingManager",
    "NoOpCoupling",
    "ColliderSampling",
    "ColliderCouplingSet",
    "FluidsPipeline",
    "RigidBody",
    "RigidBodyWorld",
]
