"""Performance counters.

Mirrors the structure of ``src/counters/``: a `Counters` aggregate with
stage counters (collision detection vs solver), CD counters (grid, search)
and solver counters, all backed by wall-clock `Timer`s that are inert
unless enabled (`counters/mod.rs:55-62`, `timer.rs:13-19`).

On TPU the *device-side* stage breakdown additionally comes from
`jax.profiler` traces and the on-device `StepDiagnostics`; these
host-side timers measure dispatch-to-completion wall time (the world
block-waits on results when counters are enabled so the numbers are
meaningful).
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.enabled = False
        self._start = None
        self.time = 0.0

    def start(self):
        if self.enabled:
            self.time = 0.0
            self._start = time.perf_counter()

    def resume(self):
        if self.enabled:
            self._start = time.perf_counter()

    def pause(self):
        if self.enabled and self._start is not None:
            self.time += time.perf_counter() - self._start
            self._start = None

    def __str__(self):
        return f"{self.time * 1000.0:.2f}ms"


class StagesCounters:
    def __init__(self):
        self.collision_detection_time = Timer()
        self.solver_time = Timer()


class CollisionDetectionCounters:
    def __init__(self):
        self.ncontacts = 0
        self.grid_insertion_time = Timer()
        self.boundary_update_time = Timer()
        self.neighborhood_search_time = Timer()


class SolverCounters:
    def __init__(self):
        self.pressure_resolution_time = Timer()
        self.non_pressure_resolution_time = Timer()


class Counters:
    """Aggregate of all counters (`counters/mod.rs:16-30`)."""

    def __init__(self):
        self.enabled = False
        self.nsubsteps = 0
        self.step_time = Timer()
        self.custom = Timer()
        self.stages = StagesCounters()
        self.cd = CollisionDetectionCounters()
        self.solver = SolverCounters()

    def _timers(self):
        return [
            self.step_time,
            self.custom,
            self.stages.collision_detection_time,
            self.stages.solver_time,
            self.cd.grid_insertion_time,
            self.cd.boundary_update_time,
            self.cd.neighborhood_search_time,
            self.solver.pressure_resolution_time,
            self.solver.non_pressure_resolution_time,
        ]

    def enable(self):
        self.enabled = True
        for t in self._timers():
            t.enabled = True

    def disable(self):
        self.enabled = False
        for t in self._timers():
            t.enabled = False

    def reset(self):
        self.nsubsteps = 0
        for t in self._timers():
            t.time = 0.0

    def __str__(self):
        return (
            f"Total timestep time: {self.step_time}\n"
            f"|_ collision detection: {self.stages.collision_detection_time}\n"
            f"|_ solver: {self.stages.solver_time}\n"
            f"   |_ pressure resolution: {self.solver.pressure_resolution_time}\n"
            f"ncontacts: {self.cd.ncontacts}\n"
            f"nsubsteps: {self.nsubsteps}"
        )
