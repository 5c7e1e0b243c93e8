from .contacts import Contacts, evaluate_contacts
from .grid import SpatialGrid, build_grid, cell_coords, morton_key, neighbor_cell_offsets
from .neighbors import (
    GroupInfo,
    NeighborLists,
    find_neighbors,
    weighted_sum_over_neighbors,
)

__all__ = [
    "Contacts",
    "evaluate_contacts",
    "SpatialGrid",
    "build_grid",
    "cell_coords",
    "morton_key",
    "neighbor_cell_offsets",
    "GroupInfo",
    "NeighborLists",
    "find_neighbors",
    "weighted_sum_over_neighbors",
]
