from .interaction_groups import ALL, NONE, InteractionGroups, group
from .state import BoundariesState, FluidsState, default_particle_volume, fill_particles

__all__ = [
    "ALL",
    "NONE",
    "InteractionGroups",
    "group",
    "BoundariesState",
    "FluidsState",
    "fill_particles",
    "default_particle_volume",
]
