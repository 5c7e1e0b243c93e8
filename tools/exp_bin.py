"""Experiments: binning/scatter cost on the current backend.

The dense substep re-bins every substep: argsort(capacity) + ~10 channel
scatters + ~8 channel unbin gathers. This measures each piece and
alternatives (combined-payload scatter, non-stable unique-key sort,
int64 combined key) at bench-like sizes.

Usage: python tools/exp_bin.py [N]
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


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])  # value fetch fence
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    C = int(os.environ.get("CELLS", "60000"))
    cap = 12
    rng = np.random.default_rng(0)
    cell = jnp.asarray(rng.integers(0, C, n), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    print(f"n={n} C={C} cap={cap}", flush=True)

    timed("argsort int32 (stable)", jax.jit(
        lambda c: jnp.argsort(c, stable=True)), cell)
    timed("argsort int32 (unstable)", jax.jit(
        lambda c: jnp.argsort(c, stable=False)), cell)

    def combined64(c):
        key = c.astype(jnp.int64) * n + jnp.arange(n, dtype=jnp.int64)
        return jnp.argsort(key, stable=False)

    timed("argsort combined int64 (unique)", jax.jit(combined64), cell)

    def sort_pair(c):
        idx = jnp.arange(n, dtype=jnp.int32)
        sk, si = jax.lax.sort((c, idx), num_keys=1, is_stable=True)
        return sk, si

    timed("lax.sort (key, idx) stable", jax.jit(sort_pair), cell)

    def full_bin(c):
        order = jnp.argsort(c, stable=True)
        sk = c[order]
        idx = jnp.arange(n, dtype=jnp.int32)
        first = jnp.searchsorted(sk, sk, side="left").astype(jnp.int32)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(idx - first)
        fits = rank < cap
        slot = jnp.where(fits, c * cap + rank, C * cap)
        return slot

    slot = timed("full bin (sort+searchsorted+rank)", jax.jit(full_bin), cell)

    def first_via_boundaries(c):
        order = jnp.argsort(c, stable=True)
        sk = c[order]
        idx = jnp.arange(n, dtype=jnp.int32)
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        first = jax.lax.cummax(jnp.where(is_first, idx, 0))
        rank = jnp.zeros((n,), jnp.int32).at[order].set(idx - first)
        return rank

    timed("bin rank via run-boundary cummax", jax.jit(first_via_boundaries),
          cell)

    def scatter_separate(s, v):
        outs = []
        for k in range(v.shape[1]):
            flat = jnp.zeros((C * cap,), jnp.float32)
            outs.append(flat.at[s].set(v[:, k], mode="drop"))
        return outs

    def scatter_combined(s, v):
        flat = jnp.zeros((C * cap, v.shape[1]), jnp.float32)
        return flat.at[s].set(v, mode="drop")

    timed("scatter 8ch separate", jax.jit(scatter_separate), slot, vals)
    timed("scatter 8ch combined payload", jax.jit(scatter_combined), slot, vals)

    grid = jnp.asarray(rng.normal(size=(C * cap + 1, 8)).astype(np.float32))

    def gather_combined(s, g):
        return g[jnp.minimum(s, C * cap)]

    timed("gather 8ch combined", jax.jit(gather_combined), slot, grid)


if __name__ == "__main__":
    main()
