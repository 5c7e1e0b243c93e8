"""Fixed-capacity neighbor lists from sorted cell ranges.

TPU-native replacement of the reference's neighbor search
(``src/geometry/contacts.rs:154-400``). The reference builds unbounded
per-particle contact vectors behind RwLocks; here each query particle
gathers up to ``K`` neighbor indices into a static ``[N, K]`` table:

1. for each query point, compute the Morton keys of its 3^dim neighbor
   cells and binary-search their ranges in the sorted grid;
2. enumerate up to ``C = max_candidates`` candidate slots across those
   ranges (a flattened "ragged gather" driven by a per-row cumulative sum);
3. filter by the exact distance test ``|p_i - p_j|^2 <= h^2``
   (``contacts.rs:285,322,366``), aliveness and interaction groups
   (``interaction_groups.rs:64-69``);
4. stably compact the survivors to the front and truncate to ``K``.

Determinism: candidates are enumerated in (cell offset, sorted position)
order and the compaction is stable, so the neighbor table is a pure
function of the particle state — the TPU analog of the reference's
deterministic FNV-seeded hashing (``hgrid.rs:10-18``).

Overflow of either capacity is *counted* and surfaced in diagnostics
instead of silently corrupting physics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grid import SpatialGrid, cell_coords, morton_key, neighbor_cell_offsets


class GroupInfo(NamedTuple):
    """Interaction-group data of a particle set.

    ``memberships``/``filter``: u32 bitmasks (`interaction_groups.rs:9-60`);
    ``model``: i32 object id (which fluid / boundary a particle belongs to).
    """

    memberships: jnp.ndarray
    filter: jnp.ndarray
    model: jnp.ndarray


class NeighborLists(NamedTuple):
    """Compacted neighbor table.

    - ``idx``: [Nq, K] int32 — source-set particle index per slot (clipped to
      a valid index even for invalid slots, so gathers are always safe);
    - ``valid``: [Nq, K] bool;
    - ``count``: [Nq] int32 — number of valid neighbors *before* truncation
      (used for the DFSPH min-neighbor test, `dfsph_solver.rs:296-310`);
    - ``overflow``: [] int32 — total neighbors dropped by the K truncation;
    - ``cand_overflow``: [] int32 — queries whose candidate window C was
      exhausted (ranges truncated before filtering).
    """

    idx: jnp.ndarray
    valid: jnp.ndarray
    count: jnp.ndarray
    overflow: jnp.ndarray
    cand_overflow: jnp.ndarray


def _groups_allowed(q_groups: GroupInfo, s_groups: GroupInfo, j, qi_block,
                    same_model_always: bool):
    """Vectorized `InteractionGroups::test` (`interaction_groups.rs:64-69`).

    When ``same_model_always`` is set, particles of the same model always
    interact regardless of groups (fluid-fluid and boundary-boundary
    semantics, `contacts.rs:276-281,355-362`).
    """
    mem_i = q_groups.memberships[qi_block][:, None]
    flt_i = q_groups.filter[qi_block][:, None]
    mem_j = s_groups.memberships[j]
    flt_j = s_groups.filter[j]
    ok = ((mem_i & flt_j) != 0) & ((mem_j & flt_i) != 0)
    if same_model_always:
        ok = ok | (q_groups.model[qi_block][:, None] == s_groups.model[j])
    return ok


def _candidate_block(q_pos_block, grid: SpatialGrid, src_pos, h, dim,
                     max_candidates: int):
    """Enumerate up to C candidate source indices per query row.

    Returns (j [B, C] int32, cand_valid [B, C] bool, truncated [B] bool).
    """
    n_src = src_pos.shape[0]
    offsets = jnp.asarray(neighbor_cell_offsets(dim), dtype=jnp.int32)  # [S, dim]
    qcells = cell_coords(q_pos_block, h)  # [B, dim]
    ncells = qcells[:, None, :] + offsets[None, :, :]  # [B, S, dim]
    nkeys = morton_key(ncells, dim)  # [B, S]

    starts = jnp.searchsorted(grid.sorted_keys, nkeys, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(grid.sorted_keys, nkeys, side="right").astype(jnp.int32)
    lens = ends - starts  # [B, S]
    cum = jnp.cumsum(lens, axis=1)  # [B, S]
    total = cum[:, -1]  # [B]

    ks = jnp.arange(max_candidates, dtype=jnp.int32)  # [C]
    # Which neighbor cell does candidate slot k fall into?
    cell_idx = jax.vmap(
        lambda row: jnp.searchsorted(row, ks, side="right")
    )(cum).astype(jnp.int32)  # [B, C]
    cell_idx_c = jnp.minimum(cell_idx, lens.shape[1] - 1)
    prev_cum = jnp.where(
        cell_idx_c > 0,
        jnp.take_along_axis(cum, jnp.maximum(cell_idx_c - 1, 0), axis=1),
        0,
    )
    start_k = jnp.take_along_axis(starts, cell_idx_c, axis=1)
    sorted_pos = start_k + (ks[None, :] - prev_cum)
    cand_valid = ks[None, :] < jnp.minimum(total, max_candidates)[:, None]
    sorted_pos = jnp.clip(sorted_pos, 0, max(n_src - 1, 0))
    j = grid.order[sorted_pos]
    truncated = total > max_candidates
    return j, cand_valid, truncated


def _pad_rows(arr, block: int):
    n = arr.shape[0]
    rem = (-n) % block
    if rem == 0:
        return arr, n
    pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width), n


def find_neighbors(
    query_pos,
    query_alive,
    q_groups: GroupInfo,
    grid: SpatialGrid,
    src_pos,
    src_alive,
    s_groups: GroupInfo,
    h,
    dim: int,
    max_neighbors: int,
    max_candidates: int,
    same_model_always: bool,
    query_chunk: int = 65536,
) -> NeighborLists:
    """Build the [Nq, K] neighbor table of ``query`` points against ``src``.

    Evaluated in row blocks of ``query_chunk`` via ``lax.map`` to bound the
    [B, C] transient memory.
    """
    nq = query_pos.shape[0]
    k_cap = max_neighbors

    def block_fn(args):
        q_pos_block, q_alive_block, qi_block = args
        j, cand_valid, truncated = _candidate_block(
            q_pos_block, grid, src_pos, h, dim, max_candidates
        )
        dpos = q_pos_block[:, None, :] - src_pos[j]
        dist2 = jnp.sum(dpos * dpos, axis=-1)
        valid = (
            cand_valid
            & (dist2 <= h * h)
            & src_alive[j]
            & q_alive_block[:, None]
            & _groups_allowed(q_groups, s_groups, j, qi_block, same_model_always)
        )
        count = jnp.sum(valid, axis=1).astype(jnp.int32)
        # Stable compaction: valid slots first, original order preserved.
        perm = jnp.argsort(jnp.logical_not(valid), axis=1, stable=True)
        perm_k = perm[:, :k_cap]
        idx_k = jnp.take_along_axis(j, perm_k, axis=1)
        valid_k = jnp.take_along_axis(valid, perm_k, axis=1)
        overflow = jnp.sum(jnp.maximum(count - k_cap, 0))
        cand_overflow = jnp.sum(truncated.astype(jnp.int32))
        # Invalid slots gather from the query particle itself when possible
        # (self index is always in range for ff), else clipped src index.
        idx_k = jnp.where(valid_k, idx_k, jnp.clip(idx_k, 0, max(src_pos.shape[0] - 1, 0)))
        return idx_k, valid_k, count, overflow, cand_overflow

    qp, _ = _pad_rows(query_pos, query_chunk)
    qa, _ = _pad_rows(query_alive, query_chunk)
    qi = jnp.arange(qp.shape[0], dtype=jnp.int32) % max(nq, 1)

    nblocks = qp.shape[0] // query_chunk
    if nblocks <= 1:
        idx_k, valid_k, count, overflow, cand_overflow = block_fn((qp, qa, qi))
    else:
        shaped = (
            qp.reshape(nblocks, query_chunk, -1),
            qa.reshape(nblocks, query_chunk),
            qi.reshape(nblocks, query_chunk),
        )
        idx_k, valid_k, count, overflow, cand_overflow = jax.lax.map(
            block_fn, shaped
        )
        idx_k = idx_k.reshape(-1, k_cap)
        valid_k = valid_k.reshape(-1, k_cap)
        count = count.reshape(-1)
        overflow = jnp.sum(overflow)
        cand_overflow = jnp.sum(cand_overflow)

    return NeighborLists(
        idx=idx_k[:nq],
        valid=valid_k[:nq],
        count=count[:nq],
        overflow=overflow,
        cand_overflow=cand_overflow,
    )


def weighted_sum_over_neighbors(
    query_pos,
    query_alive,
    q_groups: GroupInfo,
    grid: SpatialGrid,
    src_pos,
    src_alive,
    s_groups: GroupInfo,
    h,
    dim: int,
    max_candidates: int,
    same_model_always: bool,
    w_fn,
    query_chunk: int = 65536,
):
    """Sum ``W(|p_i - p_j|, h)`` over all neighbors without materializing a
    neighbor table.

    Used for boundary volumes ``V_b = 1 / sum_k W_bk``
    (`dfsph_solver.rs:72-96`): only the scalar sum is needed, so the
    compaction step is skipped entirely.
    """
    nq = query_pos.shape[0]

    def block_fn(args):
        q_pos_block, q_alive_block, qi_block = args
        j, cand_valid, truncated = _candidate_block(
            q_pos_block, grid, src_pos, h, dim, max_candidates
        )
        dpos = q_pos_block[:, None, :] - src_pos[j]
        dist2 = jnp.sum(dpos * dpos, axis=-1)
        valid = (
            cand_valid
            & (dist2 <= h * h)
            & src_alive[j]
            & q_alive_block[:, None]
            & _groups_allowed(q_groups, s_groups, j, qi_block, same_model_always)
        )
        w = w_fn(jnp.sqrt(dist2), h, dim)
        wsum = jnp.sum(jnp.where(valid, w, 0.0), axis=1)
        return wsum, jnp.sum(truncated.astype(jnp.int32))

    qp, _ = _pad_rows(query_pos, query_chunk)
    qa, _ = _pad_rows(query_alive, query_chunk)
    qi = jnp.arange(qp.shape[0], dtype=jnp.int32) % max(nq, 1)

    nblocks = qp.shape[0] // query_chunk
    if nblocks <= 1:
        wsum, cand_overflow = block_fn((qp, qa, qi))
    else:
        shaped = (
            qp.reshape(nblocks, query_chunk, -1),
            qa.reshape(nblocks, query_chunk),
            qi.reshape(nblocks, query_chunk),
        )
        wsum, cand_overflow = jax.lax.map(block_fn, shaped)
        wsum = wsum.reshape(-1)
        cand_overflow = jnp.sum(cand_overflow)

    return wsum[:nq], cand_overflow
