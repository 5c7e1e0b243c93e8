"""Benchmark table over the BASELINE.md config list.

Runs each named benchmark configuration (the scene set BASELINE.json
names: basic2, layers2, basic3, faucet3, surface_tension3, elasticity3,
heightfield3, plus the harness dam break at 27k/97k/1M) and emits one
markdown table + one JSON line per row to ``BENCH_TABLE.jsonl`` — the
fidelity half (density error, iteration counts, `dfsph_solver.rs:54-70`)
next to the throughput half, so regressions are visible round-over-round.

Usage: python tools/bench_table.py [--quick] [--out FILE]
  --quick: fewer steps + skip the 1M row (CI-sized smoke).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _fence(world):
    return float(jnp.sum(world.fluids_state.positions))


def _timed(world, advance, steps):
    """Time ``advance(steps)``, rerunning (<=2x) if a fitted-window
    resize recompiled the step inside the window — a resize costs a full
    XLA compile (minutes over the tunnel), which is setup cost, not
    throughput; the rerun measures the now-compiled steady state. The
    refit count is reported either way so a still-growing window is
    visible in the row."""
    for attempt in range(3):
        r0 = world.grid_refit_count
        _fence(world)
        t0 = time.perf_counter()
        advance(steps)
        _fence(world)
        elapsed = time.perf_counter() - t0
        refits = world.grid_refit_count - r0
        if refits == 0 or attempt == 2:
            return elapsed, refits


def _gate_overflow(row):
    """Fidelity gate (VERDICT r4 #5): a row that sheds >= 0.1% of its
    particles' contacts is not a valid throughput row — the dropped
    pairs flatter ms/step while degrading the physics (the reference
    never drops contacts: `contacts.rs:83-130` lists are unbounded).
    The row records the violation loudly instead of posing as green."""
    n = row["n_particles"]
    if row["neighbor_overflow"] >= max(1, n // 1000):
        row["overflow_exceeds_gate"] = True
    return row


def run_scene_row(name, warmup, steps):
    from salva_tpu import scenes

    scene = scenes.SCENES[name]()
    world = scene.world
    scenes.run(scene, warmup)
    elapsed, refits = _timed(world, lambda s: scenes.run(scene, s), steps)
    n = int(np.asarray(world.fluids_state.alive).sum())
    d = world.last_diagnostics
    return _gate_overflow({
        "config": name,
        "n_particles": n,
        "ms_per_step": elapsed / steps * 1e3,
        "particle_steps_per_sec": n * steps / elapsed,
        "density_error": float(d.solver.pressure_error),
        "pressure_iters": int(d.solver.pressure_iters),
        "divergence_iters": int(d.solver.divergence_iters),
        "neighbor_overflow": int(d.neighbor_overflow),
        "grid_refits": refits,
        "warm_start": float(getattr(world.solver_config, "warm_start", 0.0)),
    })


def run_dam_row(n_target, warmup, steps):
    """The harness_basic3-at-scale config (bench.py geometry)."""
    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    n_side = max(2, round(n_target ** (1.0 / 3.0)))
    radius = 0.05
    half = n_side * radius
    wall = max(1.5 * half, half + 0.5)
    domain = ((-wall - 0.3, -0.4, -wall - 0.3),
              (wall + 0.3, 2.0 * half + 1.0, wall + 0.3))
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        neighbors=NeighborConfig(max_neighbors=64, max_candidates=224,
                                 query_chunk=65536),
        domain=domain, layout="dense", dense_cap=None,
        dense_cap_boundary=None,
    )
    # TABLE_PALLAS=1/0 forces the Pallas pair kernels on/off for the dam
    # rows (unset = the auto threshold), mirroring bench.py's BENCH_PALLAS:
    # the A/B that sizes `pallas_auto_cells` must run the EXACT table
    # config, healed cap tier included.
    if os.environ.get("TABLE_PALLAS"):
        world.sim = world.sim.replace(
            use_pallas=os.environ["TABLE_PALLAS"] != "0"
        )
    pos = cube_fluid((n_side,) * 3, radius)
    pos[:, 1] += half + radius
    vel = np.zeros_like(pos)
    vel[:, 1] = -2.0
    world.add_fluid(Fluid(pos, density0=1000.0, velocities=vel))
    box = shapes.Cuboid((wall, 0.1, wall))
    samples = shape_surface_sample(box, radius, 3)
    samples[:, 1] -= 0.1
    world.add_boundary(Boundary(samples))

    # Reserve the (warmup + steps)-horizon corridor up front so the
    # fitted window never grows MID-RUN: a growth refit is a full XLA
    # recompile, and _timed's rerun-on-refit policy would slide the
    # timed window into the deep-splash regime (round-4 diagnosis:
    # steps 41-70 measured 168 ms/step at 27k vs 31 ms at the bench's
    # steps 11-30 — 2x iterations + a grown window + escape churn),
    # making rows incomparable round-over-round. reserve() adds 4 cells
    # of slack per side — enough for the ~0.2 s of spread simulated.
    world.reserve_grid_window(pos.min(axis=0), pos.max(axis=0))

    dt, g = 1.0 / 200.0, (0.0, -9.81, 0.0)
    for _ in range(warmup):
        world.step(dt, g)

    def advance(s):
        for _ in range(s):
            world.step(dt, g)

    elapsed, refits = _timed(world, advance, steps)
    n = int(np.asarray(world.fluids_state.alive).sum())
    d = world.last_diagnostics
    return _gate_overflow({
        "config": f"dam_break_{n}",
        "n_particles": n,
        "ms_per_step": elapsed / steps * 1e3,
        "particle_steps_per_sec": n * steps / elapsed,
        "density_error": float(d.solver.pressure_error),
        "pressure_iters": int(d.solver.pressure_iters),
        "divergence_iters": int(d.solver.divergence_iters),
        "neighbor_overflow": int(d.neighbor_overflow),
        "grid_refits": refits,
        "warm_start": float(getattr(world.solver_config, "warm_start", 0.0)),
    })


SCENE_CONFIGS = [
    "basic2", "layers2", "basic3", "faucet3",
    "surface_tension3", "elasticity3", "heightfield3",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma-separated config subset (scene names and/or "
                         "dam_break_N); others are skipped")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_TABLE.jsonl"))
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}

    warmup, steps = (3, 5) if args.quick else (10, 30)
    dam_sizes_all = (
        [27_000, 97_000] if args.quick else [27_000, 97_000, 1_000_000]
    )
    if only:
        # Validate the subset against the active config list: a typo (or
        # dam_break_1000000 under --quick) would otherwise silently yield
        # an empty run (ADVICE r3).
        valid = set(SCENE_CONFIGS) | {f"dam_break_{n}" for n in dam_sizes_all}
        unknown = only - valid
        if unknown:
            ap.error(
                f"--only names match nothing: {sorted(unknown)}; "
                f"valid: {sorted(valid)}"
            )
    rows = []
    for name in SCENE_CONFIGS:
        if only and name not in only:
            continue
        try:
            rows.append(run_scene_row(name, warmup, steps))
        except Exception as e:  # noqa: BLE001
            rows.append({"config": name, "error": str(e)[:200]})
        print(f"... {name} done", file=sys.stderr, flush=True)
    for n in dam_sizes_all:
        if only and f"dam_break_{n}" not in only:
            continue
        try:
            rows.append(run_dam_row(n, warmup, steps))
        except Exception as e:  # noqa: BLE001
            rows.append({"config": f"dam_break_{n}", "error": str(e)[:200]})
        print(f"... dam {n} done", file=sys.stderr, flush=True)

    # A --only subset merges into the existing table instead of
    # truncating it to the subset rows (ADVICE r3): keep every previously
    # recorded config that this run did not re-measure.
    merged = rows
    if only and os.path.exists(args.out):
        ran = {r["config"] for r in rows}
        with open(args.out) as f:
            prior = [json.loads(line) for line in f if line.strip()]
        merged = [r for r in prior if r.get("config") not in ran] + rows

    hdr = ("| config | N | ms/step | particle-steps/s | density err "
           "| p_iters | d_iters | overflow | refits |")
    print(hdr)
    print("|" + "---|" * 9)
    with open(args.out, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
    for r in merged:
        if "error" in r:
            print(f"| {r['config']} | ERROR: {r['error'][:60]} |" +
                  " |" * 7)
        else:
            over = str(r["neighbor_overflow"])
            if r.get("overflow_exceeds_gate"):
                over += " **>=0.1% GATE**"
            print(
                f"| {r['config']} | {r['n_particles']} "
                f"| {r['ms_per_step']:.1f} "
                f"| {r['particle_steps_per_sec']:.3g} "
                f"| {r['density_error']:.4f} | {r['pressure_iters']} "
                f"| {r['divergence_iters']} | {over} "
                f"| {r.get('grid_refits', 0)} |"
            )
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
