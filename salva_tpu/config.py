"""Global configuration dataclasses for the TPU-native SPH engine.

The reference engine (dimforge/salva) configures itself through cargo features
(``dim2``/``dim3``), constructor parameters (``LiquidWorld::new(solver,
particle_radius, smoothing_factor)``, reference ``src/liquid_world.rs:39-57``)
and public solver fields (``src/solver/pressure/dfsph_solver.rs:21-38``).

Here all of that becomes explicit, hashable dataclasses so they can be used as
static arguments of jitted step functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class NeighborConfig:
    """Static configuration of the neighbor-search pipeline.

    The reference uses an unbounded hash-grid (``src/geometry/hgrid.rs``) with
    per-particle growable contact lists. On TPU everything must be fixed
    shape, so we use sort-based Morton cell lists with fixed-capacity
    neighbor tables:

    - ``max_candidates``: number of candidate slots considered per particle
      when scanning the 27 (3D) / 9 (2D) neighboring cells.
    - ``max_neighbors``: capacity K of the compacted neighbor list
      (candidates that pass the distance/group/alive filters).

    Overflows are reported in the step diagnostics instead of silently
    corrupting the simulation.
    """

    max_neighbors: int = 64
    max_candidates: int = 288
    # Neighbor queries are evaluated in chunks of this many query particles to
    # bound the [chunk, max_candidates] transient memory.
    query_chunk: int = 65536

    def replace(self, **kw) -> "NeighborConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DFSPHConfig:
    """Divergence-Free SPH solver parameters.

    Defaults mirror the reference (``dfsph_solver.rs:54-70``): 1..50
    pressure iterations with 5% density tolerance, 1..50 divergence
    iterations with 0.1 tolerance, and a minimum neighbor count of 6 (2D) /
    20 (3D) for the divergence solve.
    """

    min_pressure_iter: int = 1
    max_pressure_iter: int = 50
    max_density_error: float = 0.05
    min_divergence_iter: int = 1
    max_divergence_iter: int = 50
    max_divergence_error: float = 0.1
    # ``None`` means the dim-dependent reference default (6 in 2D, 20 in 3D).
    min_neighbors_for_divergence_solve: Optional[int] = None
    # Warm-start factor: each solve's initial stiffness guess is
    # ``warm_start x`` the previous step's accumulated stiffness (the
    # SPlisHSPlasH DFSPH warm start; the reference solver is cold-started
    # every step, `dfsph_solver.rs:432-503`). 0.0 (default) disables —
    # the exact reference trajectory. Measured on an IDLE v5e at 97k
    # (round-4 A/B, host_dispatch_us < 1.7 ms both rows): warm 0.5 saves
    # ~1 divergence iteration/step but costs 168.8 ms/step vs 82.1 cold
    # — the two extra k_pass kicks + the extra solver-state channels
    # through bin/unbin lose far more than the iteration saves, so the
    # default is cold start (round 3 shipped 0.5 on a contention-polluted
    # A/B; reverted per VERDICT r3 #4).
    warm_start: float = 0.0

    kind: str = dataclasses.field(default="dfsph", init=False)

    def min_neighbors(self, dim: int) -> int:
        if self.min_neighbors_for_divergence_solve is not None:
            return self.min_neighbors_for_divergence_solve
        return 6 if dim == 2 else 20

    def replace(self, **kw) -> "DFSPHConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class IISPHConfig:
    """Implicit Incompressible SPH solver parameters.

    Defaults mirror the reference (``iisph_solver.rs:48-64``): relaxed
    Jacobi with omega = 0.5, 1..50 iterations, 5% density tolerance.
    """

    min_pressure_iter: int = 1
    max_pressure_iter: int = 50
    max_density_error: float = 0.05
    omega: float = 0.5

    kind: str = dataclasses.field(default="iisph", init=False)

    def replace(self, **kw) -> "IISPHConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Top-level static simulation configuration.

    ``h`` (the SPH kernel radius / grid cell width) is derived exactly like
    the reference: ``particle_radius * smoothing_factor * 2.0``
    (``liquid_world.rs:47``).
    """

    dim: int = 3
    particle_radius: float = 0.05
    smoothing_factor: float = 2.0
    neighbors: NeighborConfig = NeighborConfig()
    # Compute layout. "gather": [N, K] neighbor tables (general; any
    # domain). "dense": binned cell grid with shifted dense pair math —
    # the fast TPU path; requires a static ``domain`` box. "brute":
    # exact all-pairs blocks with no spatial binning (the small-N tier:
    # one masked capacity^2 pair block is cheaper than the grid's fixed
    # per-column costs below a few thousand particles, and can never
    # overflow; see geometry.dense_grid.brute_spec). "auto": dense
    # whenever a domain is set and the configuration supports it, with
    # the brute tier replacing it on accelerators when the capacities
    # sit under ``brute_max_particles`` / ``brute_max_boundary``.
    layout: str = "auto"
    # Brute tier sizing: cyclic cell count (lane occupancy vs per-pass
    # roll count; 32 matches the 3D stencil's program size) and the
    # auto-tier capacity ceilings. capacity^2 pair slots per pass stays
    # under ~17M at 4096 — comfortably one VPU pass; the boundary
    # ceiling bounds the one-time boundary-volume pass at capb^2.
    brute_cells: int = 32
    brute_max_particles: int = 4096
    brute_max_boundary: int = 32768
    # Static simulation domain ((mins...), (maxs...)) enabling the dense
    # layout. Particles leaving the box are clamped to its border cells.
    domain: Optional[tuple] = None
    # Fluid-tracking grid WINDOW (cells per axis), set automatically by
    # the world (LiquidWorld.fit_grid): the dense grid covers a window of
    # these STATIC dims whose ORIGIN is computed on-device each substep
    # from the live fluid bounding box (quantized to the domain cell
    # lattice, clamped inside the domain). Every per-cell cost
    # (pair-pass folds, hoists, iteration passes) scales with the grid
    # cell count, and a dam-break domain is mostly air — measured 23%
    # occupancy at 97k vs 59-70% inside a fluid-fitted box
    # (tools/exp_occupancy.py). A translating fluid (falling dam break)
    # costs NOTHING: the traced origin follows it without recompiling;
    # only window GROWTH (extent approaching the static dims) triggers a
    # resize through the world's refit cadence. Boundary particles
    # outside the window are dropped from binning (> h from any fluid by
    # the margin). This is the TPU analog of the reference's adaptive
    # HGrid extent (`hgrid.rs`: hash maps only store occupied cells).
    # None = grid covers the full domain with a static origin.
    fitted_dims: Optional[tuple] = None
    # Dense layout capacities: max particles per cell (cell width = h).
    dense_cap: int = 12
    dense_cap_boundary: int = 24
    # Compact dense indexing: compute only over occupied cells (plus a
    # void column) instead of the whole domain grid — pair work scales
    # with occupancy. The active-cell table sizes are
    # ``capacity * ratio`` (clamped to the domain cell count); overflow
    # is counted in the diagnostics. Measured on v5e at dam-break
    # occupancy (C/A ~ 4): the neighbor-table gathers break XLA's
    # roll+compute fusion and compact runs ~20% SLOWER than the full
    # grid, so this defaults OFF; enable it for very sparse domains
    # (occupied fraction well under ~10%).
    dense_compact: bool = False
    dense_active_ratio: float = 0.25
    dense_active_ratio_boundary: float = 0.5
    # Freeze the per-pair coefficient s_ij = (dW/dr / r) * m_j into a
    # materialized [3^dim][cap, cap, C] tensor once per substep (it is
    # iteration-invariant: contact gradients are frozen during a substep,
    # `helper.rs:9-44`), so every solver-iteration pair pass becomes a
    # multiply-reduce over the stored coefficients instead of recomputing
    # dpos + the kernel polynomial per pair. Costs one extra pass + the
    # tensor's HBM (27 * cap^2 * C * itemsize); wins when iterations
    # dominate. ``dense_pair_dtype`` selects the storage precision
    # ("float32" exact, "bfloat16" halves HBM/traffic at ~0.4% relative
    # coefficient rounding — well inside the solver's 5% tolerance).
    dense_frozen_pairs: bool = False
    dense_pair_dtype: str = "float32"
    # Boundary particles usually occupy a tiny fraction of the domain's
    # cells (walls/floors), so the boundary-OWNER pair passes (the bb
    # volume pass — every step in coupled scenes — and the boundary-force
    # pass) run over a compact table of *occupied boundary cells only*
    # (plus a void column): their work scales with the boundary's
    # occupancy, not the domain volume. Fluid-owner passes (the fb hoist,
    # force passes) keep full-grid rolls over boundary arrays
    # rematerialized once per substep — a fully-flipped sparse fb hoist
    # was measured SLOWER (+17 ms/step at 97k: per-offset column gathers
    # + 7-channel scatters cost more than the vacuum they skip).
    # Disabled automatically under the halo (multi-device) path.
    dense_sparse_boundary: bool = True
    # Sparse fluid-boundary hoist (full-grid layout with
    # dense_sparse_boundary): the fb hoist — measured the single most
    # expensive pair pass at the bench state (~22 ms of a 76 ms step at
    # 97k: a full 3^dim-stencil over ALL window columns although
    # boundaries occupy ~2% of them) — runs only over the fluid columns
    # within one cell of an occupied boundary cell. The dilated boundary
    # occupancy mask is compacted on device (top_k) into a static table
    # of this many columns each substep; results scatter back into the
    # full grid once (all other columns' fb sums are exactly zero).
    # Overflowing adjacency columns are dropped and counted in the
    # diagnostics. Set automatically by the world from the measured
    # boundary cell count (x1.5 headroom, quantized); None = full-grid
    # roll fb hoist.
    dense_fb_columns: Optional[int] = None
    # Dense+spill pair structure (full-grid layout, half stencil,
    # sparse boundary; single device): the main grid keeps a SMALL cap
    # (pair-block cost scales with cap_i x roundup(cap_j, 8), so e.g.
    # tier 12 runs the 1M dam break 1.40x faster than 16) and particles
    # beyond that rank — only a handful of cells exceed the tier even in
    # deep splash (measured 97k dam break: <= 109 cells > 12 of ~13k
    # occupied) — land in compact SPILL columns appended to the column
    # axis instead of being dropped. Spill interactions run as small
    # gathered pair blocks (spill-i x 3^dim neighbors; adjacent-main-i x
    # condensed spill-j) added to every pass. This removes the
    # contact-shedding hazard that forced the conservative 16 tier.
    # ``dense_spill_columns`` = spill table size E (None = off);
    # ``dense_spill_adj_columns`` = adjacency table size for the
    # main-i <- spill-j block (None = min(8 * E, cells));
    # ``dense_spill_k`` = max spill cells adjacent to one main column
    # (the condensed j-table width). All overflows are counted in the
    # step diagnostics and auto-grown by the world.
    #
    # ``dense_spill_auto`` gates whether the AUTO cap tier may resolve to
    # 12 + spill. Default OFF: on the real chip the 12+spill program was
    # measured 2.29x SLOWER than plain cap 16 at the 97k dam break
    # (146.7 vs 64.0 ms/step, identical iterations) — the gathered spill
    # pair blocks cost ~4x per column vs rolls and the statically-sized
    # adjacency table (8*E columns) charges every solver iteration for a
    # worst case (~350 spilling cells) that the floors inflate ~10x.
    # Explicit ``dense_spill_columns`` requests are always honored.
    dense_spill_columns: Optional[int] = None
    dense_spill_adj_columns: Optional[int] = None
    dense_spill_k: int = 8
    dense_spill_auto: bool = False
    # Uniform-particle fast path: when the world holds exactly one fluid
    # whose particles share one (mass, rest density) — the common case —
    # the per-particle M/R0/FID/VOL channels are pure functions of the
    # occupancy mask, so their grid scatters (a large share of the
    # per-substep layout-shuffle cost; XLA TPU scatters are
    # per-index-bound at ~8M indices/s) are skipped entirely. Set
    # automatically by the world; None = general multi-fluid path.
    uniform_particles: Optional[tuple] = None  # (fluid_handle, mass, density0)
    # Recompute boundary volumes (V_b = 1/sum W_bb) this step. The world
    # flips this to False for steps where no boundary changed (static
    # boundaries, no coupling): volumes are then read from the state,
    # skipping the most expensive fixed pair pass (capb^2 work).
    recompute_boundary_volumes: bool = True
    # Half-stencil symmetry for the fluid-fluid roll passes (full-grid
    # layout only): each +/- offset pair shares ONE [cap_i, cap_j, C]
    # pair block — the i-side sum reduces over the j cap axis as before,
    # and the mirrored j-side contribution reduces over the i cap axis
    # and rolls back by the offset's flat shift. 3^dim offsets become
    # 1 + (3^dim - 1)/2 blocks (27 -> 14 in 3D), halving the
    # transcendental-heavy pair math (dpos, r2, sqrt/rsqrt, kernel
    # polynomials) at the cost of one extra [cap, C] reduction + roll
    # per block. This mirrors the reference's half-stencil cell visit
    # (`contacts.rs:202-220` visits each unordered cell pair once and
    # pushes the flipped contact). Summation order differs from the full
    # stencil in the last ulp; runs remain bitwise deterministic.
    # Applies to t_pass / k_pass / the ff hoist on the single-device
    # full-grid path (compact tables and the halo slab path keep the
    # full stencil — rolled-back accumulation would cross slab ghosts).
    dense_half_stencil: bool = True
    # Use the hand-fused Pallas TPU kernels for the hot per-iteration pair
    # passes (ops/pallas_pair.py, ops/pallas_pair2.py). Measured on v5e:
    # the round-5 "v3" lo/hi slot-group split runs the 1M k_pass 3.20x
    # faster than the XLA rolls and the full 1M step 1.68x
    # (tools/exp_truepairs.py, exp_pallas_ab.py) — work scales with live
    # slot groups instead of cap padding and air columns — but LOSES ~9%
    # at the 97k window (32k cells), where per-call overheads beat the
    # smaller savings. ``None`` (default) = auto: the world enables the
    # kernels on TPU when the grid window reaches
    # ``pallas_auto_cells`` (and the spill/compact/halo guards pass);
    # True/False force the choice. ``pallas_variant`` picks the
    # formulation ("v3" default, "v1" = plain windowed kernels with
    # tile-level air skip only).
    use_pallas: bool = None
    pallas_variant: str = "v3"
    pallas_auto_cells: int = 100_000
    # Number of solver substeps per `step` call. The reference's
    # TimestepManager currently always runs exactly one substep per step
    # (``timestep_manager.rs:87-94``), so 1 is the faithful default.
    n_substeps: int = 1
    # Names of the SPH kernels used for density / gradient evaluation.
    # The reference defaults both to the cubic spline kernel.
    kernel_density: str = "cubic"
    kernel_gradient: str = "cubic"

    def __post_init__(self):
        if self.dim not in (2, 3):
            raise ValueError(f"dim must be 2 or 3, got {self.dim}")

    @property
    def h(self) -> float:
        return self.particle_radius * self.smoothing_factor * 2.0

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


def particle_volume(particle_radius: float, dim: int) -> float:
    """Default particle volume.

    Volume of a cuboid of half-width ``particle_radius`` scaled by 0.8 so a
    grid-aligned block is pressure-free (SplishSplash-inspired; reference
    ``src/object/fluid.rs:110-120``).
    """
    if dim == 2:
        return particle_radius * particle_radius * 4.0 * 0.8
    return particle_radius * particle_radius * particle_radius * 8.0 * 0.8
