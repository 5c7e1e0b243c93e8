"""Checkpoint / resume.

The reference has no checkpointing; its state is fully exposed as public
SoA vectors so a host can snapshot trivially (SURVEY.md §5.4 —
``fluid.rs:12-34``, ``boundary.rs:11-24``). Here that becomes explicit:
the full ``LiquidWorld`` state (merged particle arrays + object records +
solver scratch + configs) round-trips through one ``.npz`` file.

Non-pressure force *descriptors* (``salva_tpu.forces`` dataclasses) are
serialized by class name + field dict; ``CustomForce`` instances are code
and must be re-attached by the caller after ``load_world`` (a warning
lists the fluids that carried them).
"""

from __future__ import annotations

import dataclasses
import json
import warnings
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from . import forces as force_specs
from .config import DFSPHConfig, IISPHConfig, NeighborConfig
from .object.interaction_groups import InteractionGroups
from .solver.nonpressure import CustomForce


def _force_to_json(f) -> Optional[dict]:
    if isinstance(f, CustomForce):
        return None
    return {
        "type": type(f).__name__,
        "fields": dataclasses.asdict(f),
    }


def _force_from_json(d: dict):
    cls = getattr(force_specs, d["type"])
    return cls(**d["fields"])


def save_world(world, path: str):
    """Snapshot a LiquidWorld to ``path`` (.npz)."""
    meta = {
        "dim": world.dim,
        "particle_radius": world.particle_radius,
        "smoothing_factor": world.sim.smoothing_factor,
        "n_substeps": world.sim.n_substeps,
        "kernel_density": world.sim.kernel_density,
        "kernel_gradient": world.sim.kernel_gradient,
        "layout": world.sim.layout,
        "domain": world.sim.domain,
        # Serialize the user's REQUEST (None = auto-size) rather than the
        # resolved sim value so auto-capped worlds stay auto after load.
        "dense_cap": world._dense_cap_request,
        "dense_cap_boundary": world._dense_cap_boundary_request,
        "neighbors": dataclasses.asdict(world.sim.neighbors),
        "solver_kind": world.solver_config.kind,
        "solver": {
            k: v
            for k, v in dataclasses.asdict(world.solver_config).items()
            if k != "kind"
        },
        "fluid_records": [],
        "boundary_records": [],
    }
    dropped_custom = []
    for i, rec in enumerate(world._fluid_records):
        fs = []
        for f in rec.nonpressure_forces:
            j = _force_to_json(f)
            if j is None:
                dropped_custom.append(i)
            else:
                fs.append(j)
        meta["fluid_records"].append(
            {
                "density0": rec.density0,
                # Per-fluid radius drives particle volume/mass on the
                # uniform dense path and in add_particles
                # (`fluid.rs:22,110-120`) — must round-trip.
                "particle_radius": rec.particle_radius,
                "memberships": rec.groups.memberships,
                "filter": rec.groups.filter,
                "removed": rec.removed,
                "forces": fs,
            }
        )
    for rec in world._boundary_records:
        meta["boundary_records"].append(
            {
                "memberships": rec.groups.memberships,
                "filter": rec.groups.filter,
                "removed": rec.removed,
            }
        )
    if dropped_custom:
        warnings.warn(
            "CustomForce instances on fluids "
            f"{sorted(set(dropped_custom))} are not serialized; re-attach "
            "them after load_world."
        )

    arrays = {"meta": np.frombuffer(json.dumps(meta).encode(), np.uint8)}
    for prefix, state in (("f", world.fluids_state), ("b", world.boundaries_state)):
        for name, val in vars(state).items():
            arrays[f"{prefix}_{name}"] = np.asarray(val)
    arrays["fluid_slot_owner"] = world._fluid_slot_owner
    arrays["boundary_slot_owner"] = world._boundary_slot_owner
    if world._solver_state is not None:
        arrays["solver_state"] = np.asarray(world._solver_state)
    np.savez(path, **arrays)


def load_world(path: str):
    """Restore a LiquidWorld snapshot saved by :func:`save_world`."""
    from .world import LiquidWorld, _BoundaryRecord, _FluidRecord

    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())

    if meta["solver_kind"] == "dfsph":
        solver = DFSPHConfig(**meta["solver"])
    else:
        solver = IISPHConfig(**meta["solver"])
    world = LiquidWorld(
        solver=solver,
        particle_radius=meta["particle_radius"],
        smoothing_factor=meta["smoothing_factor"],
        dim=meta["dim"],
        neighbors=NeighborConfig(**meta["neighbors"]),
        n_substeps=meta["n_substeps"],
        layout=meta.get("layout", "auto"),
        domain=meta.get("domain"),
        dense_cap=meta.get("dense_cap"),
        dense_cap_boundary=meta.get("dense_cap_boundary"),
    )
    world.sim = world.sim.replace(
        kernel_density=meta["kernel_density"],
        kernel_gradient=meta["kernel_gradient"],
    )

    world._fluid_records = [
        _FluidRecord(
            density0=r["density0"],
            groups=InteractionGroups(r["memberships"], r["filter"]),
            nonpressure_forces=[_force_from_json(f) for f in r["forces"]],
            # Older snapshots predate per-fluid radii: fall back to the
            # world radius rather than a zero-volume 0.0 default.
            particle_radius=r.get(
                "particle_radius", meta["particle_radius"]
            ),
            removed=r["removed"],
        )
        for r in meta["fluid_records"]
    ]
    world._boundary_records = [
        _BoundaryRecord(
            groups=InteractionGroups(r["memberships"], r["filter"]),
            removed=r["removed"],
        )
        for r in meta["boundary_records"]
    ]

    fl = world.fluids_state
    fl_kwargs = {
        name: jnp.asarray(data[f"f_{name}"]) for name in vars(fl)
    }
    world.fluids_state = type(fl)(**fl_kwargs)
    bd = world.boundaries_state
    bd_kwargs = {
        name: jnp.asarray(data[f"b_{name}"]) for name in vars(bd)
    }
    world.boundaries_state = type(bd)(**bd_kwargs)

    world._fluid_slot_owner = data["fluid_slot_owner"]
    world._fluid_alive = np.asarray(world.fluids_state.alive).copy()
    world._boundary_slot_owner = data["boundary_slot_owner"]
    world._boundary_alive = np.asarray(world.boundaries_state.alive).copy()
    if "solver_state" in data:
        world._solver_state = jnp.asarray(data["solver_state"])
    if any(
        any(isinstance(f, force_specs.Becker2009Elasticity)
            for f in rec.nonpressure_forces)
        for rec in world._fluid_records
        if not rec.removed
    ):
        world._elasticity_dirty = True
    return world
