"""Sort-based spatial hashing on Morton keys.

TPU-native replacement for the reference's hash grid
(``src/geometry/hgrid.rs``): instead of a ``HashMap<Point<i64>, Vec<T>>``
with a deterministic FNV hasher, particles are assigned a Morton (Z-order)
key of their (wrapped) integer cell coordinates and sorted by it. A cell's
particle list is then a contiguous range of the sorted order, found by
binary search — O(N log N), fully vectorized, deterministic, and the sort
order doubles as the cache-friendly Z-order traversal the reference
implements separately in ``src/z_order.rs``.

Cell width equals the kernel radius ``h`` (asserted by the reference at
``contacts.rs:165``), so all neighbors of a particle live in the 3^dim
adjacent cells.

Wrapping: cell coordinates are masked to 10 bits per axis in 3D (15 bits
in 2D), so the key space aliases with a period of 1024 (resp. 32768) cells.
Aliased cells only add false *candidates* which the exact distance test
filters out — correctness never depends on the hash being collision-free,
exactly like a hash grid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Bits per axis for the Morton keys.
MORTON_BITS = {2: 15, 3: 10}

# Key assigned to dead (masked-out) particles: sorts after every real key
# (real keys use at most 30 bits).
DEAD_KEY = jnp.uint32(0xFFFFFFFF)


def _expand_bits_3(v):
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _expand_bits_2(v):
    """Spread the low 16 bits of v so they occupy every 2nd bit."""
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton_key(cells, dim: int):
    """Morton key of integer cell coordinates ``cells[..., dim]`` (int32).

    Coordinates are wrapped to the key space (see module docstring).
    """
    bits = MORTON_BITS[dim]
    mask = (1 << bits) - 1
    c = cells.astype(jnp.uint32) & jnp.uint32(mask)
    if dim == 2:
        return _expand_bits_2(c[..., 0]) | (_expand_bits_2(c[..., 1]) << 1)
    return (
        _expand_bits_3(c[..., 0])
        | (_expand_bits_3(c[..., 1]) << 1)
        | (_expand_bits_3(c[..., 2]) << 2)
    )


def cell_coords(positions, h):
    """Integer cell coordinates ``floor(p / h)`` (`hgrid.rs:41-51`)."""
    return jnp.floor(positions / h).astype(jnp.int32)


class SpatialGrid(NamedTuple):
    """Sorted Morton-key index over a point set.

    - ``order``: [N] int32, particle indices sorted by key (dead last);
    - ``sorted_keys``: [N] uint32, keys in sorted order;
    - ``cells``: [N, dim] int32, unsorted cell coords of every particle.
    """

    order: jnp.ndarray
    sorted_keys: jnp.ndarray
    cells: jnp.ndarray


def build_grid(positions, alive, h, dim: int) -> SpatialGrid:
    """Build the sorted cell index for a point set.

    The TPU equivalent of ``HGrid::insert`` over all particles
    (``contacts.rs:133-151``): one key computation + one sort.
    """
    cells = cell_coords(positions, h)
    keys = morton_key(cells, dim)
    keys = jnp.where(alive, keys, DEAD_KEY)
    order = jnp.argsort(keys).astype(jnp.int32)
    sorted_keys = keys[order]
    return SpatialGrid(order=order, sorted_keys=sorted_keys, cells=cells)


def neighbor_cell_offsets(dim: int):
    """Static list of the 3^dim neighbor-cell offsets (full stencil).

    The reference walks a *half* stencil over cell pairs and mirrors each
    contact (``contacts.rs:202-220``); on TPU every particle gathers its own
    neighbors independently, so the full stencil yields the identical
    contact set without any scatter.
    """
    if dim == 2:
        return [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    return [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
