"""Benchmark: particle-steps/sec on the 3D DFSPH dam break.

The reference publishes no numbers (BASELINE.md); the recorded target is
the BASELINE.json north star: 1e8 particle-steps/sec at a 1M-particle 3D
DFSPH dam break on one TPU chip. This runs the headless harness scene
(`examples3d/harness_basic3.rs` analog) at ``BENCH_N`` particles — plus a
1M-particle row (the north-star scale, VERDICT r3 #9) — and prints ONE
JSON line whose primary metric is the BENCH_N run; the 1M measurement is
the ``rows`` entry. ``vs_baseline`` is value / 1e8.

The script budgets itself (VERDICT r4 #2): the driver runs it under a
fixed wall-clock timeout, so the 1M row is skipped (with a
``skipped_1m`` marker in the JSON) whenever the elapsed time plus a
conservative estimate of the 1M cost — dominated by XLA compiles, which
the primary row just measured for a same-shaped program — would exceed
``BENCH_BUDGET`` seconds. rc=124 with no JSON must be impossible by
construction.

Env overrides: BENCH_N (default 100_000), BENCH_STEPS (default 20),
BENCH_SKIP_1M=1 (drop the 1M row), BENCH_BUDGET (seconds, default 540),
BENCH_WARM / BENCH_PALLAS / BENCH_LAYOUT / BENCH_CAP / BENCH_FROZEN /
BENCH_SPILL (A/B knobs; BENCH_SPILL=1 opts into the 12+spill auto tier,
default off — measured 2.29x slower than plain cap 16 at 97k).
"""

import json
import os
import time

import numpy as np

_T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _measure_dispatch_us(reps: int = 30) -> float:
    """Host-contention sentinel (VERDICT r3 #6): the tunnel client's
    dispatch loop is host-CPU-sensitive (this box has 1 CPU), so a loaded
    host inflates ms/step without touching device time. Measure the
    round-trip latency of a trivial jitted dispatch and record it; runs
    with an inflated sentinel are not comparable and get flagged."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    x = tiny(jnp.zeros((8,), jnp.float32))  # compile outside the reps
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = tiny(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps * 1e6


def run_config(target_n: int, steps: int):
    """Build + run one dam-break config; returns the result row dict."""
    import jax.numpy as jnp

    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig, NeighborConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    layout = os.environ.get("BENCH_LAYOUT", "auto")
    # Default: auto-sized cap tier from measured occupancy ({8,16}).
    cap_env = os.environ.get("BENCH_CAP", "")
    dense_cap = int(cap_env) if cap_env else None
    n_side = max(2, round(target_n ** (1.0 / 3.0)))

    radius = 0.05
    nb = NeighborConfig(max_neighbors=64, max_candidates=224, query_chunk=65536)
    half = n_side * radius
    # Box sized to the measured window: the block spreads < 1.5x its
    # half-width during the ~0.15 s simulated; domain-clamp counts in the
    # diagnostics would flag an undersized box.
    wall = max(1.5 * half, half + 0.5)
    domain = (
        (-wall - 0.3, -0.4, -wall - 0.3),
        (wall + 0.3, 2.0 * half + 1.0, wall + 0.3),
    )
    # BENCH_WARM overrides the warm-start factor (default 0 = cold start,
    # the reference's exact trajectory; the round-4 idle-host A/B
    # measured warm 0.5 at 2x the step cost).
    warm_env = os.environ.get("BENCH_WARM", "")
    solver_cfg = (
        DFSPHConfig(warm_start=float(warm_env)) if warm_env else DFSPHConfig()
    )
    world = LiquidWorld(
        solver=solver_cfg,
        particle_radius=radius,
        smoothing_factor=2.0,
        dim=3,
        neighbors=nb,
        domain=domain,
        layout=layout,
        # Caps auto-size from measured occupancy unless BENCH_CAP is set
        # (overflow is surfaced in diag and asserted below).
        dense_cap=dense_cap,
        dense_cap_boundary=None,
    )
    if os.environ.get("BENCH_FROZEN"):
        world.sim = world.sim.replace(
            dense_frozen_pairs=True,
            dense_pair_dtype=os.environ.get("BENCH_PAIR_DTYPE", "float32"),
        )
    if os.environ.get("BENCH_SPILL"):
        # Opt into the 12+spill auto tier (off by default: judge-measured
        # 2.29x slower than plain cap 16 at the 97k dam break).
        world.sim = world.sim.replace(dense_spill_auto=True)
    if os.environ.get("BENCH_PALLAS"):
        # Force the Pallas pair kernels on ("1") or off ("0"); unset =
        # the auto threshold (config.pallas_auto_cells — ON at the 1M
        # window, OFF at 97k, both the measured winners).
        world.sim = world.sim.replace(
            use_pallas=os.environ["BENCH_PALLAS"] != "0"
        )
    pos = cube_fluid((n_side, n_side, n_side), radius)
    # Dam break with impact inside the measured window: the block starts
    # one radius above the floor moving down at 2 m/s, so the timed steps
    # capture sustained splash/compression (a resting lattice is
    # pressure-free by construction — `fluid.rs:110-120` — and converges
    # in ~2 iterations, which would flatter the benchmark).
    pos[:, 1] += half + radius
    vel = np.zeros_like(pos)
    vel[:, 1] = -2.0
    world.add_fluid(Fluid(pos, density0=1000.0, velocities=vel))

    # Box floor + walls sized to the fluid block (static boundary).
    box = shapes.Cuboid((wall, 0.1, wall))
    samples = shape_surface_sample(box, radius, 3)
    samples[:, 1] -= 0.1
    world.add_boundary(Boundary(samples))

    n_particles = int(np.asarray(world.fluids_state.alive).sum())
    dt = 1.0 / 200.0
    gravity = (0.0, -9.81, 0.0)

    host_dispatch_us = _measure_dispatch_us()
    # Empirically ~200-600 us/dispatch through the tunnel on an idle
    # host; >3000 us means another CPU hog is starving the client loop.
    contended = host_dispatch_us > 3000.0

    # Warmup through the real world.step path: compiles both program
    # variants (boundary-volumes dirty + cached) and reaches the impact
    # (splash starts within a few steps at 2 m/s from one radius up).
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))

    def fence():
        # Force completion with a value fetch: block_until_ready through
        # the tunneled backend can acknowledge before execution finishes.
        return float(jnp.sum(world.fluids_state.positions))

    for _ in range(warmup):
        world.step(dt, gravity)
    fence()

    # Keep per-step diagnostics as device arrays during timing (no host
    # sync); fetched after the window so the JSON can report iteration
    # counts — the step cost is ~linear in them, and round-over-round
    # comparability requires matching them (VERDICT r2 #4).
    # If a fitted-window resize (one full XLA recompile) lands inside
    # the timed window, rerun once: the compile is setup cost, not
    # throughput. The refit count is reported in the JSON either way.
    for _attempt in range(2):
        refits0 = world.grid_refit_count
        iters_log = []
        t0 = time.perf_counter()
        for _ in range(steps):
            world.step(dt, gravity)
            d = world.last_diagnostics
            iters_log.append((d.solver.pressure_iters,
                              d.solver.divergence_iters))
        fence()
        elapsed = time.perf_counter() - t0
        refits = world.grid_refit_count - refits0
        if refits == 0:
            break
    diag = world.last_diagnostics
    p_iters = [int(p) for p, _ in iters_log]
    d_iters = [int(dv) for _, dv in iters_log]

    if os.environ.get("BENCH_DEBUG"):
        import sys

        print(
            f"[debug] N={n_particles} {elapsed / steps * 1e3:.1f} ms/step; "
            f"last step: "
            f"pressure_iters={int(diag.solver.pressure_iters)} "
            f"div_iters={int(diag.solver.divergence_iters)} "
            f"p_err={float(diag.solver.pressure_error):.4f} "
            f"overflow={int(diag.neighbor_overflow)} "
            f"max_rho_ratio={float(diag.max_density_ratio):.3f}",
            file=sys.stderr,
        )

    # Capacity overflow must stay negligible (silently dropped contacts
    # would flatter the benchmark): allow < 0.1% of N in deep splash.
    overflow = int(diag.neighbor_overflow)
    assert overflow < max(1, n_particles // 1000), (
        f"neighbor overflow {overflow} at N={n_particles}; raise dense_cap"
    )

    pps = n_particles * steps / elapsed
    return {
        "metric": f"particle-steps/sec, {n_particles}-particle 3D DFSPH dam break",
        "value": pps,
        "unit": "particle-steps/s",
        "vs_baseline": pps / 1.0e8,
        "ms_per_step": elapsed / steps * 1e3,
        "pressure_iters": sum(p_iters),
        "divergence_iters": sum(d_iters),
        "grid_refits_in_window": refits,
        "host_dispatch_us": round(host_dispatch_us, 1),
        "host_contended": contended,
        "iters_per_step": [[p, dv] for p, dv in zip(p_iters, d_iters)],
    }


def main():
    import jax

    # Compilation over the tunneled TPU backend takes minutes; cache it.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    target_n = int(os.environ.get("BENCH_N", "100000"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    budget = float(os.environ.get("BENCH_BUDGET", "540"))

    primary = run_config(target_n, steps)
    rows = [primary]
    primary_elapsed = _elapsed()
    # North-star row (1M particles): recorded alongside the primary
    # metric in every driver run (VERDICT r3 #9). Fewer steps — at
    # ~500-900 ms/step the row still spends its time in steady state.
    # Time-boxed (VERDICT r4 #2): the 1M cost is dominated by XLA
    # compiles of a same-shaped program the primary row just paid for
    # (cached: seconds; cold tunnel compile: ~10 min), so the primary
    # row's own wall-clock is the estimate. Skip rather than time out.
    skipped_1m = None
    if target_n < 1_000_000 and not os.environ.get("BENCH_SKIP_1M"):
        est_1m = 1.2 * primary_elapsed + 30.0
        if _elapsed() + est_1m <= budget:
            rows.append(run_config(1_000_000, min(steps, 10)))
        else:
            skipped_1m = (
                f"elapsed {_elapsed():.0f}s + est {est_1m:.0f}s exceeds "
                f"budget {budget:.0f}s (cold compile?); run once to seed "
                ".jax_cache, then rerun"
            )

    out = dict(primary)
    if skipped_1m:
        out["skipped_1m"] = skipped_1m
    out["bench_elapsed_s"] = round(_elapsed(), 1)
    out["rows"] = [
        {k: r[k] for k in (
            "metric", "value", "ms_per_step", "pressure_iters",
            "divergence_iters", "grid_refits_in_window",
            "host_dispatch_us", "host_contended",
        )}
        for r in rows
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
