"""A/B the fluid binning formulation at scale (round 4, VERDICT #5).

The 1M ladder (tools/exp_fixed4.py) measured `bin_particles` at 38.6 ms
— 11% of the iters-0 step. The current formulation uses one stable sort
plus THREE index scatters (rank inverse-permutation, run starts, run
ends). TPU scatters are per-index-bound, so this candidate replaces
them with sort/gather primitives:

- run starts/ends: ONE `searchsorted(sk, arange(C + 1))` (binary-search
  gathers, lane-parallel) instead of two N-index scatters;
- rank: inverse permutation by a SECOND `lax.sort` keyed on `order`
  (bitonic, bandwidth-bound) + a [N] gather of run starts, instead of an
  N-index scatter.

Outputs are asserted equal (same sort => same determinism contract).

MEASURED (v5e, 1M, C=216k, 2026-08-19): current 44.8 ms, v2 72.3 ms —
REJECTED. The second bitonic sort (inverse permutation) costs more
than all three scatters it replaces; XLA TPU index scatters run well
above the round-2 8M-idx/s estimate at these sizes. The scatter
formulation stays.

Usage: python tools/exp_bin2.py [N]
"""

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

from profile_stages import build_world, run_to_impact  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    from salva_tpu.geometry import dense_grid as dg
    from salva_tpu.step import _dense_config

    world = build_world(n_target)
    run_to_impact(world, 5)
    sim = world._effective_sim()
    spec_f, _spec_b, _ = _dense_config(sim, world.solver_config,
                                       world._force_set)
    fl = world.fluids_state
    C = spec_f.num_cells
    cap = spec_f.cap
    print(f"N={int(np.asarray(fl.alive).sum())} C={C} cap={cap}",
          flush=True)

    @jax.jit
    def f_cur(positions, alive):
        b = dg.bin_particles(spec_f, positions, alive)
        return b.slot_of, b.in_grid, b.mask, b.grid_src, b.overflow

    @jax.jit
    def f_v2(positions, alive):
        n = positions.shape[0]
        cell, _clamped = dg.cell_of(spec_f, positions)
        key = jnp.where(alive, cell, jnp.int32(C))
        iota = jnp.arange(n, dtype=jnp.int32)
        sk, order = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        # ONE searchsorted gives starts AND ends (ends[c] = starts[c+1]).
        s = jnp.searchsorted(sk, jnp.arange(C + 1, dtype=sk.dtype),
                             side="left")
        starts, ends = s[:C], s[1:]
        counts = ends - starts
        r = jnp.arange(cap, dtype=jnp.int32)
        valid = r[None, :] < jnp.minimum(counts, cap)[:, None]
        src_sorted = jnp.where(valid, starts[:, None] + r[None, :], n)
        order_ext = jnp.concatenate(
            [order, jnp.full((1,), n, jnp.int32)])
        grid_src = order_ext[src_sorted].T
        mask = valid.T.astype(jnp.float32)
        # Inverse permutation by sort (scatter-free).
        _, inv = jax.lax.sort((order, iota), num_keys=1, is_stable=True)
        rank = inv - starts[jnp.minimum(key, C - 1)]
        rank = jnp.where(alive, rank, cap)
        fits = alive & (rank < cap)
        slot = jnp.where(fits, cell * cap + rank, C * cap)
        overflow = jnp.sum((alive & (rank >= cap)).astype(jnp.int32))
        return slot, fits, mask, grid_src, overflow

    args = (fl.positions, fl.alive)
    o1 = jax.block_until_ready(f_cur(*args))
    o2 = jax.block_until_ready(f_v2(*args))
    for a, b, name in zip(o1, o2, ("slot", "fits", "mask", "src", "over")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    print("equivalence ok", flush=True)

    for name, f in (("current (3 scatters)", f_cur),
                    ("v2 (sort+searchsorted)", f_v2)):
        f(*args)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:28s} {(time.perf_counter() - t0) / 20 * 1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
