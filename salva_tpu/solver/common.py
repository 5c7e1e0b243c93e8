"""Shared solver machinery: densities, boundary volumes, per-fluid error
reductions and the substep context passed to every solver stage.

All functions are pure maps over the merged particle state (see
``object/state.py``) and the evaluated contact tables
(``geometry/contacts.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..geometry.contacts import Contacts
from ..object.state import BoundariesState, FluidsState


@struct.dataclass
class StepContext:
    """Everything a solver stage needs for one substep.

    - ``ff``: fluid-fluid contacts [N, K];
    - ``fb``: fluid-boundary contacts [N, Kb];
    - ``densities``: [N] f32, rho_i = sum m_j W + sum V_b rho0_i W
      (`dfsph_solver.rs:628-665`);
    - ``dt`` / ``inv_dt``: substep length (dynamic scalars).
    """

    fluids: FluidsState
    boundaries: BoundariesState
    ff: Contacts
    fb: Contacts
    densities: jnp.ndarray
    dt: jnp.ndarray
    inv_dt: jnp.ndarray

    # Static metadata.
    dim: int = struct.field(pytree_node=False, default=3)
    h: float = struct.field(pytree_node=False, default=0.2)
    num_fluids: int = struct.field(pytree_node=False, default=1)

    @property
    def masses(self):
        return self.fluids.masses

    def ff_mass_j(self):
        """Mass of the j-side particle of each fluid-fluid contact."""
        return self.masses[self.ff.j]

    def fb_mass_j(self):
        """Effective boundary 'mass' of each fluid-boundary contact:
        ``V_bj * rho0_i`` (the reference's convention everywhere, e.g.
        `dfsph_solver.rs:140-145`)."""
        return self.boundaries.volumes[self.fb.j] * self.fluids.density0[:, None]


def compute_densities(ctx: StepContext) -> jnp.ndarray:
    """rho_i = sum_ff m_j W_ij + sum_fb V_bj rho0_i W_ij
    (`dfsph_solver.rs:628-665`). Dead particles get rho = rho0 so nothing
    downstream divides by zero."""
    rho = jnp.sum(ctx.ff_mass_j() * ctx.ff.w, axis=1) + jnp.sum(
        ctx.fb_mass_j() * ctx.fb.w, axis=1
    )
    return jnp.where(ctx.fluids.alive, rho, ctx.fluids.density0)


def boundary_volumes(wsum, alive) -> jnp.ndarray:
    """V_b = 1 / sum_k W_bk over boundary-boundary neighbors
    (`dfsph_solver.rs:72-96`; the self-contact guarantees wsum > 0 for any
    alive particle)."""
    safe = jnp.where(wsum > 0.0, wsum, 1.0)
    return jnp.where(alive & (wsum > 0.0), 1.0 / safe, 0.0)


def per_fluid_mean_max(values, fluid_id, alive, num_fluids: int):
    """max over fluids of (mean over that fluid's alive particles).

    This is the reference's error-aggregation rule
    (`dfsph_solver.rs:150-160`): per-fluid mean, then max across fluids.
    """
    values = jnp.where(alive, values, 0.0)
    sums = jax.ops.segment_sum(values, fluid_id, num_segments=num_fluids)
    counts = jax.ops.segment_sum(
        alive.astype(values.dtype), fluid_id, num_segments=num_fluids
    )
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    return jnp.max(means, initial=0.0)


def scatter_boundary_forces(forces, fb: Contacts, contrib):
    """Accumulate per-contact force contributions onto boundary particles.

    The deterministic replacement of the reference's RwLock accumulation
    (`boundary.rs:62-67`): an XLA scatter-add over the [N, Kb] contact
    table (TPU scatters are deterministic).
    ``contrib``: [N, Kb, dim] already masked for invalid slots.
    """
    flat_j = fb.j.reshape(-1)
    flat_c = contrib.reshape(-1, contrib.shape[-1])
    return forces.at[flat_j].add(flat_c)


class SolverDiagnostics(NamedTuple):
    """First-class solver observability (SURVEY.md §5.5): iteration counts
    and final errors are returned from every step instead of being
    commented-out printlns."""

    pressure_iters: jnp.ndarray
    pressure_error: jnp.ndarray
    divergence_iters: jnp.ndarray
    divergence_error: jnp.ndarray

    @classmethod
    def zeros(cls):
        z = jnp.zeros((), jnp.int32)
        f = jnp.zeros((), jnp.float32)
        return cls(z, f, z, f)
