"""Kernel evaluation over neighbor tables.

The analog of the reference's ``Contact {weight, gradient}`` caching pass
(``src/solver/helper.rs:9-65``): once per substep, W and the kernel
gradient are evaluated for every (particle, neighbor-slot) pair and reused
across all solver iterations — positions are frozen during a substep's
pressure/divergence loops, so these arrays stay valid.

Layout is ``[N, K]`` / ``[N, K, dim]`` SoA, which XLA maps onto dense
vector ops; invalid slots carry ``w = 0`` and ``grad = 0`` so that most
reductions need no extra masking. Terms not proportional to W or grad
(e.g. the Akinci cohesion kernel) must use ``mask`` explicitly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..kernels import sph
from .neighbors import NeighborLists


class Contacts(NamedTuple):
    """Evaluated contacts of one query set against one source set.

    - ``j``: [N, K] int32 neighbor indices (safe to gather with);
    - ``valid``: [N, K] bool;
    - ``mask``: [N, K] f32 (1.0 where valid);
    - ``w``: [N, K] f32 kernel weights (0 on invalid slots);
    - ``grad``: [N, K, dim] f32 kernel gradients w.r.t. the query point
      (``Contact::gradient``, zero at r ~ 0 like `kernel.rs:19-26`);
    - ``count``: [N] int32 valid-neighbor count (pre-truncation).
    """

    j: jnp.ndarray
    valid: jnp.ndarray
    mask: jnp.ndarray
    w: jnp.ndarray
    grad: jnp.ndarray
    count: jnp.ndarray

    def gather(self, src_arr):
        """Gather a per-source-particle array over the neighbor table."""
        return src_arr[self.j]


def evaluate_contacts(
    query_pos,
    src_pos,
    neighbors: NeighborLists,
    h,
    dim: int,
    w_fn=sph.cubic_w,
    dw_fn=sph.cubic_dw,
) -> Contacts:
    """Fill W / grad for a neighbor table (`helper.rs:9-65`)."""
    j = neighbors.idx
    dpos = query_pos[:, None, :] - src_pos[j]
    r, grad = sph.grad_from_dpos(dpos, h, dim, dw_fn=dw_fn)
    w = w_fn(r, h, dim)
    mask = neighbors.valid.astype(query_pos.dtype)
    return Contacts(
        j=j,
        valid=neighbors.valid,
        mask=mask,
        w=w * mask,
        grad=grad * mask[..., None],
        count=neighbors.count,
    )
