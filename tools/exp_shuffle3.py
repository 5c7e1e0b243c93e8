"""Round-3 shuffle measurements: what does each layout-permutation
building block actually cost on TPU at bench scale?

The dense step's fixed cost is dominated by the particle<->slot layout
shuffle (bin ~117 + to_grid scatters ~200 + unbin gathers ~150 ms at
1M).  Round-2 established XLA scatter/gather are per-INDEX-bound for
single channels; the open questions for the round-3 kernel design:

1. Is a PACKED row gather ``vals[order]`` with vals [N, ch] per-index
   (one index per row => ~ch x cheaper than ch separate gathers) or
   per-element?
2. Same question for a packed row scatter into slots.
3. What do sort / searchsorted(block starts) cost at 1M?
4. Calibration: the current per-channel to_grid/from_grid cost.

Usage: python tools/exp_shuffle3.py [N]
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


def timed(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])  # fence (tunnel acks early)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    # Cell count ~ the 1M bench grid; occupancy ~5 particles/occupied cell
    C = int(os.environ.get("CELLS", str(max(4096, n // 2))))
    cap = 12
    ch = 8
    rng = np.random.default_rng(0)
    base = np.sort(rng.integers(0, C, n))
    cell = jnp.asarray(np.clip(base + rng.integers(-2, 3, n), 0, C - 1),
                       jnp.int32)
    vals = jnp.asarray(rng.normal(size=(n, ch)).astype(np.float32))
    vals1 = vals[:, 0]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    print(f"N={n} C={C} cap={cap} ch={ch} backend={jax.default_backend()}",
          flush=True)

    # -- 1. sorts ------------------------------------------------------------
    @jax.jit
    def sort2(c):
        iota = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((c, iota), num_keys=1, is_stable=True)

    timed("sort (key, iota)", sort2, cell)

    @jax.jit
    def sort3(c, v):
        iota = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((c, iota, v), num_keys=1, is_stable=True)

    timed("sort (key, iota, 1 f32 payload)", sort3, cell, vals1)

    # -- 2. gathers ----------------------------------------------------------
    @jax.jit
    def gather1(v, p):
        return v[p]

    timed("gather 1ch [N]", gather1, vals1, perm)

    @jax.jit
    def gather_packed(v, p):
        return v[p]

    timed(f"gather packed rows [N,{ch}]", gather_packed, vals, perm)

    @jax.jit
    def gather_sep(v, p):
        return jnp.stack([v[:, i][p] for i in range(ch)], axis=-1)

    timed(f"gather {ch} x separate [N]", gather_sep, vals, perm)

    @jax.jit
    def take_packed(v, p):
        return jnp.take(v, p, axis=0, unique_indices=True,
                        indices_are_sorted=False)

    timed(f"take packed rows unique [N,{ch}]", take_packed, vals, perm)

    # -- 3. scatters ---------------------------------------------------------
    S = C * cap

    @jax.jit
    def scatter1(v, slot):
        return jnp.zeros((S + 1,), jnp.float32).at[slot].set(v, mode="drop")

    @jax.jit
    def scatter_packed(v, slot):
        return (jnp.zeros((S + 1, ch), jnp.float32)
                .at[slot].set(v, mode="drop"))

    iota = jnp.arange(n, dtype=jnp.int32)
    sk, order = jax.lax.sort((cell, iota), num_keys=1, is_stable=True)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = jax.lax.cummax(jnp.where(is_first, iota, 0))
    rank_sorted = iota - first
    slot_sorted = jnp.where(rank_sorted < cap, sk * cap + rank_sorted, S)
    slot_orig = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)

    timed("scatter 1ch [N]->[C*cap]", scatter1, vals1, slot_orig)
    timed(f"scatter packed [N,{ch}]->[C*cap,{ch}]", scatter_packed, vals,
          slot_orig)

    @jax.jit
    def scatter_sorted1(v, slot):
        return (jnp.zeros((S + 1,), jnp.float32)
                .at[slot].set(v, mode="drop"))

    timed("scatter 1ch SORTED slots", scatter_sorted1, vals1[order],
          slot_sorted)

    # -- 4. block starts for the pallas kernel -------------------------------
    bc = 64
    nblocks = -(-C // bc)

    @jax.jit
    def block_starts(sorted_keys):
        q = jnp.arange(nblocks + 1, dtype=jnp.int32) * bc
        return jnp.searchsorted(sorted_keys, q, side="left").astype(jnp.int32)

    timed(f"searchsorted {nblocks + 1} block starts", block_starts, sk)

    @jax.jit
    def cell_starts_scatter(sorted_keys, isf):
        # start[c] for ALL cells via scatter of first-row indices + cummax
        io = jnp.arange(n, dtype=jnp.int32)
        st = (jnp.full((C + 1,), n, jnp.int32)
              .at[jnp.where(isf, sorted_keys, C)]
              .min(io, mode="drop"))
        return st

    timed("cell starts via scatter-min [C+1]", cell_starts_scatter, sk,
          is_first)

    # -- 4b. layout transposes (packed-row designs need them) ----------------
    grid_rows = jnp.zeros((C * cap, ch), jnp.float32) + 1.0

    @jax.jit
    def rows_to_grid(gr):
        # [C*cap, ch] -> ch x [cap, C] (the dense-path layout)
        g = gr.reshape(C, cap, ch)
        return [g[:, :, i].T for i in range(ch)]

    timed("transpose rows->grid [C*cap,ch]->ch x [cap,C]", rows_to_grid,
          grid_rows)

    grids = [jnp.zeros((cap, C), jnp.float32) + 1.0 for _ in range(ch)]

    @jax.jit
    def grid_to_rows(gs):
        # ch x [cap, C] -> [C*cap, ch]
        return jnp.stack([g.T.reshape(-1) for g in gs], axis=-1)

    timed("transpose grid->rows ch x [cap,C]->[C*cap,ch]", grid_to_rows,
          grids)

    cols = [vals[:, i] for i in range(ch)]

    @jax.jit
    def pack_cols(cs):
        return jnp.stack(cs, axis=-1)

    timed(f"pack {ch} x [N] -> [N,{ch}]", pack_cols, cols)

    # -- 4c. end-to-end packed to_grid / from_grid candidates ----------------
    @jax.jit
    def to_grid_packed(cs, slot):
        packed = jnp.stack(cs, axis=-1)
        rows = (jnp.zeros((C * cap + 1, ch), jnp.float32)
                .at[slot].set(packed, mode="drop"))[:-1]
        g = rows.reshape(C, cap, ch)
        return [g[:, :, i].T for i in range(ch)]

    timed("END2END packed to_grid (pack+scatter+transp)", to_grid_packed,
          cols, slot_orig)

    @jax.jit
    def from_grid_packed(gs, slot, ingrid):
        rows = jnp.stack([g.T.reshape(-1) for g in gs], axis=-1)
        rows = jnp.concatenate(
            [rows, jnp.zeros((1, ch), jnp.float32)], axis=0
        )
        out = rows[jnp.minimum(slot, C * cap)]
        out = jnp.where(ingrid[:, None], out, 0.0)
        return [out[:, i] for i in range(ch)]

    timed("END2END packed from_grid (transp+gather)", from_grid_packed,
          grids, slot_orig, slot_orig < S)

    # -- 5. calibration: current to_grid / from_grid -------------------------
    from salva_tpu.geometry import dense_grid as dg

    spec = dg.DenseGridSpec(origin=(0.0,), dims=(C,), cap=cap,
                            cell_width=1.0)

    class FakeBinned:
        pass

    binned = dg.Binned(
        slot_of=slot_orig, in_grid=slot_orig < S,
        mask=jnp.zeros((cap, C)), overflow=jnp.zeros((), jnp.int32),
        clamped=jnp.zeros((), jnp.int32),
    )

    @jax.jit
    def to_grid6(v):
        return [dg.to_grid(spec, binned, v[:, i]) for i in range(6)]

    timed("to_grid x 6 channels (current path)", to_grid6, vals)

    grid = jnp.zeros((cap, C)) + 1.0

    @jax.jit
    def from_grid7(g):
        return [dg.from_grid(spec, binned, g) for _ in range(7)]

    timed("from_grid x 7 channels (current path)", from_grid7, grid)


if __name__ == "__main__":
    main()
