"""Dense binned cell grid: the gather-free TPU compute layout.

Motivation (measured on TPU): the ``[N, K]`` neighbor-table path costs
~2.4 s per neighbor search and ~5 ms per solver iteration at 27k
particles — XLA TPU random gathers/scatters run ~70x off HBM bandwidth.
This module rebins particles into a dense ``[cap, C]`` cell layout once
per substep; every solver stage then reads neighbor data by *shifting the
cell axis* (27 static offsets in 3D, 9 in 2D) — one ``jnp.roll`` on the
minor axis, no gathers — and computes dense ``[cap_i, cap_j, C]`` pair
interactions on the VPU with the large cell axis on the 128-wide lanes.

This is the TPU-native re-architecture of the reference's
per-occupied-cell rayon parallelism (``contacts.rs:154-252``): the same
cell decomposition (cell width = kernel radius h, ``contacts.rs:165``),
but cells form a static box grid so "the 27 neighbor cells" is an index
shift instead of a hash lookup.

Correctness of the flat shift: cells are flattened row-major and every
particle is clamped into the *interior* (a one-cell ghost ring at each
face stays empty). A flat roll by ``(dx*ny + dy)*nz + dz`` equals the true
(dx, dy, dz) cell shift for every interior cell; rolls that carry across
an axis source ghost cells only, whose shifted occupancy mask is zero —
so wrong-cell reads are always masked out.

Determinism: ranks within a cell follow the stable sort order of
(cell, particle index) — the dense-layout analog of the reference's
deterministic FNV hashing (``hgrid.rs:10-18``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DenseGridSpec:
    """Static geometry of the binned grid (hashable; jit-static)."""

    origin: Tuple[float, ...]
    dims: Tuple[int, ...]  # number of cells per axis (incl. ghost ring)
    cap: int  # max particles per cell
    cell_width: float
    # Unpadded x-extent for interior clamping: when the x-axis is padded
    # up to a device-count multiple (parallel.domain.pad_spec_for_devices),
    # escaped particles must still clamp to the ORIGINAL border ring or
    # sharded and single-device runs bin them into different cells.
    clamp_nx: int = None
    # All-pairs brute tier (see :func:`brute_spec`): ``dims`` is a 1D
    # CYCLIC group of cells with no spatial meaning — ``shift_j``'s roll
    # wraparound enumerates every unordered cell pair exactly once over
    # offsets 0..C-1, so every particle pairs with every other. Position
    # binning is bypassed (``bin_particles_brute``).
    brute: bool = False

    def __post_init__(self):
        if any(d < 3 for d in self.dims):
            raise ValueError("grid dims must be >= 3 (ghost ring)")

    @property
    def dim(self) -> int:
        return len(self.dims)

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.dims))

    def flat_shift(self, offset) -> int:
        """Flat-index delta of a cell offset (row-major)."""
        s = 0
        for d, off in zip(self.dims, offset):
            s = s * d + off
        return s

    def replace(self, **kw) -> "DenseGridSpec":
        return dataclasses.replace(self, **kw)


def spec_for_aabb(mins, maxs, h: float, cap: int, margin_cells: int = 2
                  ) -> DenseGridSpec:
    """Spec covering [mins, maxs] with >= ``margin_cells`` ghost/margin
    cells on every face (at least one must stay empty; clamping keeps it
    so)."""
    mins = np.asarray(mins, np.float64)
    maxs = np.asarray(maxs, np.float64)
    margin = max(margin_cells, 1)
    origin = mins - margin * h
    dims = np.ceil((maxs - origin) / h).astype(int) + margin
    dims = np.maximum(dims, 3)
    return DenseGridSpec(
        origin=tuple(float(v) for v in origin),
        dims=tuple(int(v) for v in dims),
        cap=cap,
        cell_width=float(h),
    )


# Position fill for empty slots: far outside any domain, so every pair
# term involving an empty slot vanishes through the kernel's compact
# support (dW = W = 0 beyond h) — hot pair passes then need no occupancy
# masks at all (empty slots also carry zero mass/volume factors).
POS_SENTINEL = 1.0e6


class Binned(NamedTuple):
    """A particle set bound to grid slots.

    - ``slot_of``: [N] int32 flat slot (cell * cap + rank); non-fitting
      particles (dead / cell overflow) point at the out-of-bounds slot
      ``C * cap`` which scatters drop;
    - ``in_grid``: [N] bool;
    - ``mask``: [cap, C] f32 slot occupancy;
    - ``overflow``: [] int32 particles dropped by full cells;
    - ``clamped``: [] int32 particles clamped into the interior box;
    - ``grid_src``: [cap, C] int32 particle index feeding each slot
      (N = empty) — lets ``to_grid_multi`` bin every channel with ONE
      packed row gather instead of per-channel scatters.

    With ``spill_cols = E > 0`` (the dense+spill pair structure,
    ``config.dense_spill_columns``) the column axis is EXTENDED to
    ``C + E + 1``: columns ``[C, C+E)`` are *spill columns* — one per
    cell whose occupancy exceeds ``cap``, holding ranks
    ``cap..cap+spill_rows-1`` in their rows ``0..spill_rows-1`` — and
    column ``C+E`` is a void column (sentinel positions, zero masks)
    absorbing all "no spill neighbor" gathers. ``mask`` / ``grid_src`` /
    ``slot_of`` then cover the extended axis, so every layout shuffle
    (``to_grid`` / ``from_grid`` / the packed multi variants) works
    unchanged; only the pair passes need to know the structure
    (``dense_common.DenseCtx``). Extra fields:

    - ``spill_cells``: [E] int32 flat cell id per spill column (unused
      slots hold ``C``), in ascending cell order (deterministic);
    - ``cell_to_spill``: [C] int32 inverse map (no spill -> E);
    - ``spill_col_overflow``: [] int32 over-cap cells beyond E (their
      over-rank particles are dropped and counted in ``overflow``).
    """

    slot_of: jnp.ndarray
    in_grid: jnp.ndarray
    mask: jnp.ndarray
    overflow: jnp.ndarray
    clamped: jnp.ndarray
    grid_src: jnp.ndarray = None
    spill_cells: jnp.ndarray = None
    cell_to_spill: jnp.ndarray = None
    spill_col_overflow: jnp.ndarray = None


def cell_of(spec: DenseGridSpec, positions, origin=None):
    """Flat interior-clamped cell id of each position + clamp mask.

    ``origin`` overrides the spec's static origin with a (possibly
    traced) array — the fluid-tracking window path (config.fitted_dims)
    recomputes it from the live fluid extent every substep."""
    if origin is None:
        origin = jnp.asarray(spec.origin, positions.dtype)
    dims = jnp.asarray(spec.dims, jnp.int32)
    c = jnp.floor((positions - origin) / spec.cell_width).astype(jnp.int32)
    clamped_mask = jnp.any((c < 1) | (c >= dims - 1), axis=-1)
    c = jnp.clip(c, 1, dims - 2)
    flat = c[..., 0]
    for axis in range(1, spec.dim):
        flat = flat * spec.dims[axis] + c[..., axis]
    return flat, clamped_mask


def _sorted_ranks(key):
    """(order, rank_sorted): stable sort order of ``key`` plus each
    element's rank within its run of equal keys.

    One ``lax.sort`` of (key, iota) + a run-boundary cummax — measured
    ~4x cheaper than the searchsorted(sk, sk) formulation on TPU.
    """
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sk, order = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    first = jax.lax.cummax(jnp.where(is_first, iota, 0))
    return order, iota - first, sk, is_first


def bin_particles(spec: DenseGridSpec, positions, alive,
                  drop_clamped: bool = False, origin=None,
                  spill_cols: int = 0, spill_rows: int = 8) -> Binned:
    """Assign each alive particle a (cell, rank) slot (deterministic).

    ``drop_clamped=True`` excludes out-of-box particles from the grid
    instead of clamping them to the border ring — used for boundary
    particles under a fluid-fitted grid window (they are > h away from
    any fluid by the fitting margin, so dropping them is exact).

    ``spill_cols = E > 0`` enables the dense+spill structure (see
    :class:`Binned`): ranks ``cap..cap+spill_rows-1`` of over-cap cells
    land in compact spill columns instead of being dropped."""
    n = positions.shape[0]
    C = spec.num_cells
    cap = spec.cap
    cell, clamped_mask = cell_of(spec, positions, origin=origin)
    if drop_clamped:
        alive = alive & jnp.logical_not(clamped_mask)
        clamped_mask = jnp.zeros_like(clamped_mask)
    key = jnp.where(alive, cell, jnp.int32(C))
    order, rank_sorted, sk, is_first = _sorted_ranks(key)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    # Per-cell sorted-run starts/ends (two index scatters; empty cells
    # stay 0/0 -> count 0). Slot (c, r) is then fed by sorted position
    # starts[c] + r, so EVERY channel bins through one packed row gather
    # (``to_grid_multi``) instead of a per-channel scatter — the same
    # formulation that replaced scatters in the compact layout, measured
    # per-row (payload-insensitive) on TPU.
    iota = jnp.arange(n, dtype=jnp.int32)
    live_sorted = sk < C
    first_live = is_first & live_sorted
    is_last = live_sorted & jnp.concatenate(
        [sk[1:] != sk[:-1], jnp.ones((1,), bool)]
    )
    starts = (
        jnp.zeros((C + 1,), jnp.int32)
        .at[jnp.where(first_live, sk, C + 1)]
        .set(iota, mode="drop")[:C]
    )
    ends = (
        jnp.zeros((C + 1,), jnp.int32)
        .at[jnp.where(is_last, sk, C + 1)]
        .set(iota + 1, mode="drop")[:C]
    )
    counts = ends - starts
    r = jnp.arange(cap, dtype=jnp.int32)
    valid = r[None, :] < jnp.minimum(counts, cap)[:, None]  # [C, cap]
    src_sorted = jnp.where(valid, starts[:, None] + r[None, :], n)
    order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    grid_src = order_ext[src_sorted].T  # [cap, C]
    mask = valid.T.astype(jnp.float32)

    fits = alive & (rank < cap)
    clamped = jnp.sum((alive & clamped_mask).astype(jnp.int32))

    if spill_cols:
        E = int(spill_cols)
        cap2 = min(int(spill_rows), cap)
        # Spill columns in ascending cell order: cumsum of the over-cap
        # occupancy mask (deterministic; one O(C) scan per substep).
        iota_c = jnp.arange(C, dtype=jnp.int32)
        over_cell = counts > cap
        sidx = jnp.cumsum(over_cell.astype(jnp.int32)) - 1  # [C]
        in_table = over_cell & (sidx < E)
        tgt = jnp.where(in_table, sidx, E)
        spill_cells = (
            jnp.full((E,), C, jnp.int32).at[tgt].set(iota_c, mode="drop")
        )
        cell_to_spill = jnp.where(in_table, sidx, E)  # [C]
        spill_col_overflow = jnp.sum(
            (over_cell & (sidx >= E)).astype(jnp.int32)
        )

        # Spill slot feeds (same packed-row-gather formulation as the
        # main grid): spill slot (e, r) <- sorted position
        # starts[cell_e] + cap + r.
        used = spill_cells < C
        sc_g = jnp.minimum(spill_cells, C - 1)
        s_counts = jnp.where(
            used, jnp.minimum(counts[sc_g] - cap, cap2), 0
        )
        r2_ = jnp.arange(cap2, dtype=jnp.int32)
        valid_s = r2_[None, :] < s_counts[:, None]  # [E, cap2]
        src_sorted_s = jnp.where(
            valid_s, starts[sc_g][:, None] + cap + r2_[None, :], n
        )
        grid_src_s = order_ext[jnp.minimum(src_sorted_s, n)].T  # [cap2, E]
        mask_s = valid_s.T.astype(jnp.float32)
        if cap2 < cap:
            pad = ((0, cap - cap2), (0, 0))
            grid_src_s = jnp.pad(grid_src_s, pad, constant_values=n)
            mask_s = jnp.pad(mask_s, pad)

        grid_src = jnp.concatenate(
            [grid_src, grid_src_s, jnp.full((cap, 1), n, jnp.int32)],
            axis=1,
        )
        mask = jnp.concatenate(
            [mask, mask_s, jnp.zeros((cap, 1), jnp.float32)], axis=1
        )

        # Extended slot ids (flat layout col * cap + row over C + E + 1
        # columns, matching to_grid/from_grid's reshape).
        sidx_p = cell_to_spill[jnp.minimum(cell, C - 1)]
        in_spill = (
            alive & (rank >= cap) & (rank < cap + cap2) & (sidx_p < E)
        )
        oob = (C + E + 1) * cap
        slot = jnp.where(
            fits, cell * cap + rank,
            jnp.where(in_spill, (C + sidx_p) * cap + (rank - cap), oob),
        )
        fits = fits | in_spill
        overflow = jnp.sum((alive & jnp.logical_not(fits)).astype(jnp.int32))
        return Binned(
            slot_of=slot,
            in_grid=fits,
            mask=mask,
            overflow=overflow,
            clamped=clamped,
            grid_src=grid_src,
            spill_cells=spill_cells,
            cell_to_spill=cell_to_spill,
            spill_col_overflow=spill_col_overflow,
        )

    oob = C * cap
    slot = jnp.where(fits, cell * cap + rank, oob)
    overflow = jnp.sum((alive & (rank >= cap)).astype(jnp.int32))
    return Binned(
        slot_of=slot,
        in_grid=fits,
        mask=mask,
        overflow=overflow,
        clamped=clamped,
        grid_src=grid_src,
    )


def brute_spec(capacity: int, cells: int = 32) -> DenseGridSpec:
    """All-pairs 'grid' for the brute small-N tier: ``cells`` cyclic
    cells x ``ceil(capacity / cells)`` slots.

    TPU rationale: below a few thousand particles the spatial grid's
    candidate filtering saves less than its fixed per-column costs
    (binning shuffles, channel grids, vacuum columns), and the cell-cap
    slots it introduces can overflow (dropped contacts, the reference
    never drops any — `contacts.rs:83-130`). One masked all-pairs block
    is exact, shuffle-free and overflow-free; formulated as a 1D CYCLIC
    grid (offset k pairs cell c with cell c+k mod C) it reuses the whole
    dense roll machinery with total pair work exactly capacity^2 slots
    and the cell axis on the vector lanes. ``cells`` trades lane
    occupancy (wants >= ~32) against per-pass roll count."""
    cells = int(max(3, min(cells, capacity)))
    cap = -(-int(capacity) // cells)
    return DenseGridSpec(
        origin=(0.0,), dims=(cells,), cap=cap, cell_width=1.0, brute=True
    )


def bin_particles_brute(spec: DenseGridSpec, alive) -> Binned:
    """Identity binding for the brute tier: particle ``i`` feeds slot
    ``(cell i % C, rank i // C)`` — no sort, no scatter, position-free.
    Particles beyond ``C * cap`` (an explicitly mis-sized spec; the
    world sizes ``cap`` from the capacity) surface as ``overflow``."""
    C, cap = spec.dims[0], spec.cap
    n = alive.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    cell = idx % C
    rank = idx // C
    fits = alive & (rank < cap)
    slot = jnp.where(fits, cell * cap + rank, jnp.int32(C * cap))
    # grid_src[r, c] = particle c + r*C (n = empty slot), masked by alive.
    src = (
        jnp.arange(cap, dtype=jnp.int32)[:, None] * C
        + jnp.arange(C, dtype=jnp.int32)[None, :]
    )
    alive_ext = jnp.concatenate([alive, jnp.zeros((1,), bool)])
    src = jnp.minimum(src, n)
    src = jnp.where(alive_ext[src], src, n)
    return Binned(
        slot_of=slot,
        in_grid=fits,
        mask=(src < n).astype(jnp.float32),
        overflow=jnp.sum((alive & (rank >= cap)).astype(jnp.int32)),
        clamped=jnp.zeros((), jnp.int32),
        grid_src=src,
    )


def to_grid(spec: DenseGridSpec, binned: Binned, values, fill=0.0):
    """Bring per-particle values into grid layout.

    [N] -> [cap, C]; [N, D] -> [D, cap, C] (component-major so all
    elementwise math runs with the big cell axis on the lanes).

    When ``binned`` carries ``grid_src`` (the compact path) this is a row
    GATHER of the slot table from the particle array — bitwise-equal to
    the scatter formulation but per-row-bound instead of per-index-bound
    on TPU. Other layouts fall back to scatters.
    """
    src = getattr(binned, "grid_src", None)
    if src is not None:
        if values.ndim == 1:
            ext = jnp.concatenate(
                [values, jnp.full((1,), fill, values.dtype)]
            )
            return ext[src]
        return jnp.stack([to_grid(spec, binned, values[:, d], fill)
                          for d in range(values.shape[1])])
    if values.ndim == 1:
        flat = jnp.full((spec.num_cells * spec.cap,), fill, values.dtype)
        flat = flat.at[binned.slot_of].set(values, mode="drop")
        return flat.reshape(spec.num_cells, spec.cap).T
    return jnp.stack(
        [to_grid(spec, binned, values[:, d], fill) for d in range(values.shape[1])]
    )


def to_grid_multi(spec, binned, items):
    """Bring SEVERAL per-particle arrays into grid layout with ONE packed
    row gather (compact layouts with ``grid_src`` only).

    ``items``: list of ``(values, fill)`` with values [N] or [N, D],
    all float32. Returns a list of [cap, A+1] / [D, cap, A+1] grids.
    Rationale as :func:`from_grid_multi`: XLA row gathers are per-ROW
    and payload-insensitive, so binning ch channels costs ~one gather
    instead of ch scatters (tools/exp_shuffle3.py).
    """
    src = binned.grid_src
    chans = []
    layout = []
    for vals, _fill in items:
        if vals.ndim == 1:
            chans.append(vals)
            layout.append(1)
        else:
            for d in range(vals.shape[1]):
                chans.append(vals[:, d])
            layout.append(vals.shape[1])
    packed = jnp.stack(chans, axis=-1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, len(chans)), packed.dtype)], axis=0
    )
    g = packed[src]  # [cap, A+1, ch]
    empty = src >= packed.shape[0] - 1  # [cap, A+1]
    out = []
    col = 0
    for (vals, fill), d in zip(items, layout):
        if d == 1:
            arr = g[..., col]
            if fill != 0.0:
                arr = jnp.where(empty, jnp.asarray(fill, arr.dtype), arr)
            out.append(arr)
        else:
            comps = []
            for k in range(d):
                arr = g[..., col + k]
                if fill != 0.0:
                    arr = jnp.where(empty, jnp.asarray(fill, arr.dtype), arr)
                comps.append(arr)
            out.append(jnp.stack(comps))
        col += d
    return out


def from_grid_multi(spec, binned, grids):
    """Gather SEVERAL grid arrays back to particle layout with ONE packed
    row gather.

    ``grids``: list of [cap, C] or [D, cap, C] arrays. Returns a list of
    [N] / [N, D] arrays (invalid rows = 0; callers apply fallbacks).

    Measured on TPU at 1M: XLA gathers are per-ROW (payload-insensitive)
    — one [N, ch] row gather costs about one single-channel gather, so
    packing the substep's outputs cuts the unbin cost ~3x vs per-channel
    gathers (tools/exp_shuffle3.py).
    """
    chans = []
    layout = []  # (ndim, D)
    for g in grids:
        if g.ndim == 2:
            chans.append(g)
            layout.append(1)
        else:
            for d in range(g.shape[0]):
                chans.append(g[d])
            layout.append(g.shape[0])
    ch = len(chans)
    num_slots = chans[0].shape[0] * chans[0].shape[1]
    rows = jnp.stack([g.T.reshape(-1) for g in chans], axis=-1)
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, ch), rows.dtype)], axis=0
    )
    idx = jnp.minimum(binned.slot_of, num_slots)
    picked = rows[idx]  # [N, ch]
    out = []
    col = 0
    for d in layout:
        if d == 1:
            out.append(picked[:, col])
        else:
            out.append(picked[:, col:col + d])
        col += d
    return out


def from_grid(spec: DenseGridSpec, binned: Binned, grid_values, default=0.0):
    """Gather per-particle values back: [cap, C] -> [N];
    [D, cap, C] -> [N, D]. The only gather in the dense path (one per
    array per substep)."""
    if grid_values.ndim == 2:
        flat = grid_values.T.reshape(-1)
        out = flat[jnp.minimum(binned.slot_of, flat.shape[0] - 1)]
        return jnp.where(binned.in_grid, out, default)
    return jnp.stack(
        [from_grid(spec, binned, grid_values[d], default)
         for d in range(grid_values.shape[0])],
        axis=-1,
    )


class SlabBinned(NamedTuple):
    """A particle set bound to slots of one device's x-slab (+ ghost
    layers) of the grid — the multi-device domain-decomposition binning
    (``parallel/domain.py``).

    The device owning x-layers ``[x0, x0 + nxl)`` bins every particle
    whose (global, interior-clamped) cell lies in the *extended* slab
    ``[x0 - 1, x0 + nxl + 1)``; the two extra layers are the ghost/halo
    layers whose content mirrors the neighboring devices' border cells.
    Ranks within a cell follow global particle order, so per-cell pair
    sums are bitwise equal to the single-device :func:`bin_particles`.

    - ``slot_of`` / ``in_grid`` / ``mask``: as in :class:`Binned`, over
      the local ``C_local = (nxl + 2) * prod(dims[1:])`` cells;
    - ``in_interior``: [N] bool — binned into a layer this device OWNS
      (each alive in-grid particle is interior on exactly one device);
    - ``overflow`` / ``clamped``: counted over interior cells only, so
      psum over devices equals the global counts.
    """

    slot_of: jnp.ndarray
    in_grid: jnp.ndarray
    in_interior: jnp.ndarray
    mask: jnp.ndarray
    overflow: jnp.ndarray
    clamped: jnp.ndarray


def bin_particles_slab(spec: DenseGridSpec, nxl: int, x0, positions, alive
                       ) -> SlabBinned:
    """Bin particles into one device's extended x-slab (see
    :class:`SlabBinned`). ``nxl`` is static; ``x0 = rank * nxl`` may be a
    traced int32."""
    n = positions.shape[0]
    origin = jnp.asarray(spec.origin, positions.dtype)
    hi = np.asarray(spec.dims, np.int32) - 2
    if spec.clamp_nx is not None:
        hi[0] = spec.clamp_nx - 2
    hi = jnp.asarray(hi, jnp.int32)
    c = jnp.floor((positions - origin) / spec.cell_width).astype(jnp.int32)
    clamped_mask = jnp.any((c < 1) | (c > hi), axis=-1)
    c = jnp.clip(c, 1, hi)
    rest = c[..., 1]
    for axis in range(2, spec.dim):
        rest = rest * spec.dims[axis] + c[..., axis]
    nyz = int(np.prod(spec.dims[1:]))
    lx = c[..., 0] - (jnp.asarray(x0, jnp.int32) - 1)
    in_slab = alive & (lx >= 0) & (lx < nxl + 2)
    interior = in_slab & (lx >= 1) & (lx < nxl + 1)
    c_local = (nxl + 2) * nyz
    cell = jnp.where(in_slab, lx * nyz + rest, jnp.int32(c_local))

    order, rank_sorted, _, _ = _sorted_ranks(cell)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    fits = in_slab & (rank < spec.cap)
    oob = c_local * spec.cap
    slot = jnp.where(fits, cell * spec.cap + rank, oob)
    mask = (
        jnp.zeros((c_local * spec.cap,), jnp.float32)
        .at[slot]
        .set(1.0, mode="drop")
        .reshape(c_local, spec.cap)
        .T
    )
    overflow = jnp.sum((interior & (rank >= spec.cap)).astype(jnp.int32))
    clamped = jnp.sum((interior & clamped_mask).astype(jnp.int32))
    return SlabBinned(
        slot_of=slot,
        in_grid=fits,
        in_interior=interior & (rank < spec.cap),
        mask=mask,
        overflow=overflow,
        clamped=clamped,
    )


class ActiveBinned(NamedTuple):
    """A particle set bound to slots of the *occupied-cells-only* table.

    The compact variant of :class:`Binned`: instead of one column per
    grid cell, the table has ``A + 1`` columns — one per *active*
    (occupied) cell plus a trailing void column (sentinel positions, zero
    masses) that absorbs all inactive-neighbor lookups. Pair compute then
    scales with occupancy instead of domain volume.

    - ``slot_of`` / ``in_grid`` / ``mask`` / ``overflow`` / ``clamped``:
      as in :class:`Binned` (mask is [cap, A+1]);
    - ``active_cells``: [A+1] int32 flat cell id per active slot (void and
      unused slots hold ``num_cells``);
    - ``cell_to_active``: [C+1] int32 inverse map (inactive -> A);
    - ``active_overflow``: [] int32 occupied cells beyond A (dropped);
    - ``grid_src``: [cap, A+1] int32 particle index feeding each slot
      (empty slot -> N): particle->slot binning then runs as row
      *gathers* (per-row, payload-insensitive on TPU) instead of
      per-index-bound scatters — see :func:`to_grid_multi`.
    """

    slot_of: jnp.ndarray
    in_grid: jnp.ndarray
    mask: jnp.ndarray
    active_cells: jnp.ndarray
    cell_to_active: jnp.ndarray
    overflow: jnp.ndarray
    clamped: jnp.ndarray
    active_overflow: jnp.ndarray
    grid_src: jnp.ndarray = None


class ActiveSpec(NamedTuple):
    """Shape shim so :func:`to_grid` / :func:`from_grid` work on the
    compact [cap, A+1] layout."""

    num_cells: int  # = A + 1 (including the void column)
    cap: int


def bin_particles_active(spec: DenseGridSpec, max_active: int, positions,
                         alive, cap: int = None,
                         drop_clamped: bool = False, origin=None):
    """Compact binning: assign (active cell, rank) slots over occupied
    cells only. Deterministic like :func:`bin_particles`."""
    cap = spec.cap if cap is None else cap
    n = positions.shape[0]
    C = spec.num_cells
    A = max_active
    cell, clamped_mask = cell_of(spec, positions, origin=origin)
    if drop_clamped:
        alive = alive & jnp.logical_not(clamped_mask)
        clamped_mask = jnp.zeros_like(clamped_mask)
    key = jnp.where(alive, cell, jnp.int32(C))
    order, rank_sorted, sk, is_first = _sorted_ranks(key)
    live_sorted = sk < C
    is_first = is_first & live_sorted
    act_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # active index
    n_live = jnp.sum(live_sorted.astype(jnp.int32))
    iota = jnp.arange(n, dtype=jnp.int32)

    # Active-cell table [A+1], void/unused = C.
    tgt = jnp.where(is_first & (act_sorted < A), act_sorted, A + 1)
    active_cells = (
        jnp.full((A + 1,), C, jnp.int32).at[tgt].set(sk, mode="drop")
    )
    cell_to_active = (
        jnp.full((C + 1,), A, jnp.int32)
        .at[active_cells[:A]]
        .set(jnp.arange(A, dtype=jnp.int32), mode="drop")
    )
    cell_to_active = cell_to_active.at[C].set(A)

    # Per-active-cell run starts in SORTED order: slot (a, r) is fed by
    # sorted position starts[a] + r, so the particle->slot shuffle runs
    # as row GATHERS (per-row, payload-insensitive on TPU) instead of
    # per-index-bound scatters (tools/exp_shuffle3.py). starts[A] caps
    # the last kept cell's run — it is the start of the first dropped
    # cell under active overflow (act_sorted == A occurs once), else
    # n_live — so counts never bleed across dropped cells.
    tgt_s = jnp.where(is_first & (act_sorted <= A), act_sorted, A + 1)
    starts = (
        jnp.full((A + 1,), n_live, jnp.int32).at[tgt_s].set(iota, mode="drop")
    )
    counts = jnp.concatenate(
        [starts[1:] - starts[:-1], jnp.zeros((1,), jnp.int32)]
    )  # [A+1]; void column = 0
    r = jnp.arange(cap, dtype=jnp.int32)
    col_start = jnp.concatenate([starts[:A], jnp.zeros((1,), jnp.int32)])
    valid = r[None, :] < jnp.minimum(counts, cap)[:, None]  # [A+1, cap]
    src_sorted = jnp.where(valid, col_start[:, None] + r[None, :], n)
    order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    grid_src = order_ext[jnp.minimum(src_sorted, n)].T  # [cap, A+1]
    mask = valid.T.astype(jnp.float32)

    fits_sorted = live_sorted & (rank_sorted < cap) & (act_sorted >= 0) & (
        act_sorted < A
    )
    oob = (A + 1) * cap
    slot_sorted = jnp.where(fits_sorted, act_sorted * cap + rank_sorted, oob)
    # The one remaining N-sized scatter: the inverse permutation.
    slot = jnp.full((n,), oob, jnp.int32).at[order].set(slot_sorted)
    fits = slot < oob
    overflow = jnp.sum(alive.astype(jnp.int32)) - jnp.sum(
        fits_sorted.astype(jnp.int32)
    )
    clamped = jnp.sum((alive & clamped_mask).astype(jnp.int32))
    active_overflow = jnp.sum((is_first & (act_sorted >= A)).astype(jnp.int32))
    return ActiveBinned(
        slot_of=slot,
        in_grid=fits,
        mask=mask,
        active_cells=active_cells,
        cell_to_active=cell_to_active,
        overflow=overflow,
        clamped=clamped,
        active_overflow=active_overflow,
        grid_src=grid_src,
    )


def neighbor_table(spec: DenseGridSpec, owner_cells, cell_to_active_target):
    """[Ao+1, S] active indices of each owner cell's 3^dim neighbors in
    the target set (void / inactive -> the target's void column)."""
    shifts = jnp.asarray(
        [spec.flat_shift(off) for off in neighbor_offsets(spec.dim)],
        jnp.int32,
    )
    nc = owner_cells[:, None] + shifts[None, :]
    # Real owner cells are interior (all neighbors in range); the void
    # row (= C) clips back into [0, C] and is masked by its sentinel
    # positions anyway.
    nc = jnp.clip(nc, 0, spec.num_cells)
    return cell_to_active_target[nc]


def shift_j(spec: DenseGridSpec, arr, offset):
    """View of a [..., C] grid array where cell c sees cell c + offset."""
    s = spec.flat_shift(offset)
    if s == 0:
        return arr
    return jnp.roll(arr, -s, axis=-1)


def neighbor_offsets(dim: int):
    if dim == 2:
        return [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    return [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
