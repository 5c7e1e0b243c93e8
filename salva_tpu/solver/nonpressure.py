"""Non-pressure force framework.

The reference's ``NonPressureForce`` trait
(``src/solver/nonpressure_force.rs``) attaches boxed force objects to each
fluid and calls them sequentially inside ``predict_advection``. Here each
force *type* is applied once, vectorized across ALL fluids: per-fluid
coefficients are stored in static tuples (one slot per fluid, 0 for fluids
that don't carry the force) and gathered per-particle through ``fluid_id``.
For every built-in force a zero coefficient is exactly a no-op, matching
the reference's explicit zero-checks (e.g. ``xsph_viscosity.rs:55,72``).

A force is a pure function ``(config, ctx) -> (accel_delta [N, dim],
boundary_force_delta [M, dim])``. Iterative forces (DFSPH viscosity) and
stateful ones (Becker elasticity) follow the same signature with extra
carried state.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from .common import StepContext


def per_particle(values: Sequence[float], ctx: StepContext):
    """Gather a per-fluid tuple of coefficients to per-particle values."""
    arr = jnp.asarray(values, jnp.float32)
    return arr[ctx.fluids.fluid_id]


def same_fluid_mask(ctx: StepContext):
    """[N, K] mask: contact endpoints belong to the same fluid.

    Most non-pressure forces only act within one fluid (the reference's
    ``c.i_model == c.j_model`` checks).
    """
    fid = ctx.fluids.fluid_id
    return (fid[:, None] == fid[ctx.ff.j]) & ctx.ff.valid


def merge_per_fluid(instances, num_fluids: int, attr: str, default=0.0):
    """Build the per-fluid coefficient tuple for one force type.

    ``instances``: dict fluid_index -> force instance.
    """
    return tuple(
        float(getattr(instances[i], attr)) if i in instances else float(default)
        for i in range(num_fluids)
    )


class CustomForce:
    """User-extensible non-pressure force — the TPU counterpart of
    implementing the reference's ``NonPressureForce`` trait
    (``nonpressure_force.rs:10-30``, used by
    ``examples3d/custom_forces3.rs:67-90``).

    Subclass and implement ``apply(ctx) -> accel [N, dim]`` (or
    ``(accel [N, dim], boundary_forces [M, dim])``) as a pure, traceable
    function of the :class:`StepContext`. The world masks the result to the
    particles of the fluid(s) the instance is attached to.
    """

    def apply(self, ctx: StepContext):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True, eq=False)
class MaskedCustomForce:
    """World-internal wrapper restricting a CustomForce to its fluids.

    ``eq=False`` keeps identity hashing so the jit cache keys on the
    instance (custom forces may close over arbitrary parameters).
    """

    force: CustomForce
    fluid_flags: Tuple[int, ...]

    def apply(self, ctx: StepContext):
        out = self.force.apply(ctx)
        if isinstance(out, tuple):
            accel, bforces = out
        else:
            accel = out
            bforces = jnp.zeros_like(ctx.boundaries.forces)
        flags = jnp.asarray(self.fluid_flags, jnp.float32)[ctx.fluids.fluid_id]
        mask = flags * ctx.fluids.alive.astype(jnp.float32)
        return accel * mask[:, None], bforces


@dataclasses.dataclass(frozen=True)
class ForceSet:
    """Static, hashable bundle of all merged force configurations of a
    world. Built by the world from the per-fluid force lists."""

    forces: Tuple = ()

    def __iter__(self):
        return iter(self.forces)

    def __bool__(self):
        return bool(self.forces)
