"""Prototype: Pallas sorted->slot expansion kernel vs XLA scatters.

to_grid currently scatters each channel [N] -> [C*cap] through XLA
scatter, which is per-index-bound (~8M idx/s on TPU). This kernel
exploits the structure instead: after the cell sort, each cell's
particles are CONTIGUOUS in the sorted arrays, so a block of BC cells
reads one contiguous input window (async DMA at a dynamic offset) and
expands it into padded slots with an exact one-hot matmul
(Precision.HIGHEST: the 3-way f32 split sums exactly, and one-hot rows
select single values) — sequential HBM on both sides, the MXU does the
irregular part. Per-output-row source indices/validity are precomputed
outside as cheap elementwise ops (repeat of the per-cell start table).

Usage: python tools/exp_pallas_expand.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_expand(cap: int, ch: int, bc: int, slack: int = 128):
    block = bc * cap
    span = block + slack + 128  # +128 for the aligned-offset adjustment

    def kernel(vs_hbm, meta_ref, fill_ref, out_ref, scratch, sem):
        # meta_ref [block, 2]: (global src index, valid) per output row.
        # vs_hbm is channel-major [ch, Npad]; the DMA offset must be
        # 128-aligned on the lane axis, so round down and shift locally.
        in_lo = meta_ref[0, 0]
        in_lo_al = (in_lo // 128) * 128
        dma = pltpu.make_async_copy(
            vs_hbm.at[:, pl.ds(in_lo_al, span)], scratch, sem
        )
        dma.start()
        src = meta_ref[:, 0] - in_lo_al
        valid = (meta_ref[:, 1] > 0) & (src < span) & (src >= 0)
        srcc = jnp.where(valid, src, span - 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (block, span), 1)
        oh = (srcc[:, None] == col) & valid[:, None]
        ohf = oh.astype(jnp.float32)
        dma.wait()
        sel = jax.lax.dot_general(
            ohf, scratch[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [block, ch]
        out_ref[:, :] = sel + jnp.where(
            valid[:, None], 0.0, fill_ref[0, :][None, :]
        )

    def expand(vs_cm, start, fill_row, c_cells):
        """vs_cm [ch, N] channel-major sorted values; start [C+1]
        first-sorted-index per cell (monotone); -> [cpad*cap, ch]."""
        cpad = -(-c_cells // bc) * bc
        n = vs_cm.shape[1]
        vs_p = jnp.concatenate(
            [vs_cm, jnp.zeros((ch, span), vs_cm.dtype)], axis=1
        )
        if start.shape[0] < cpad + 1:
            start = jnp.concatenate(
                [start,
                 jnp.full((cpad + 1 - start.shape[0],), n, jnp.int32)]
            )
        lo = jnp.repeat(start[:cpad], cap)  # [cpad*cap]
        hi = jnp.repeat(start[1:cpad + 1], cap)
        k = jnp.tile(jnp.arange(cap, dtype=jnp.int32), cpad)
        src = lo + k
        valid = (k < (hi - lo)).astype(jnp.int32)
        meta = jnp.stack([src, valid], axis=-1)  # [cpad*cap, 2]
        return pl.pallas_call(
            kernel,
            grid=(cpad // bc,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((block, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ch), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, ch), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((cpad * cap, ch), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((ch, span), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(vs_p, meta, fill_row.reshape(1, ch))

    return expand


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    C = int(os.environ.get("CELLS", "410164"))
    cap, ch = 12, 16  # ch padded to the sublane tile (values use 12)
    rng = np.random.default_rng(0)
    base = np.sort(rng.integers(0, C, n))
    cell = jnp.asarray(np.clip(base + rng.integers(-2, 3, n), 0, C - 1),
                       jnp.int32)
    vals = jnp.asarray(rng.normal(size=(n, ch)).astype(np.float32))

    def timed(name, fn, *args, reps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
              flush=True)
        return out

    def prep(c, v):
        iota = jnp.arange(n, dtype=jnp.int32)
        # Sort with ALL channels as payload: the sort network applies the
        # permutation at bandwidth (no scatter/gather).
        cols = (c, iota) + tuple(v[:, i] for i in range(v.shape[1]))
        sorted_all = jax.lax.sort(cols, num_keys=1, is_stable=True)
        sk, order = sorted_all[0], sorted_all[1]
        vs_cm = jnp.stack(sorted_all[2:], axis=0)  # [ch, N]
        start = jnp.searchsorted(
            sk, jnp.arange(C + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return sk, order, vs_cm, start

    sk, order, vs_cm, start = jax.jit(prep)(cell, vals)
    timed("prep (payload sort + searchsorted starts)", prep, cell, vals)

    expand = build_expand(cap, ch, bc=64)
    fill = jnp.zeros((ch,), jnp.float32)
    run = jax.jit(lambda v, s: expand(v, s, fill, C))
    grid_rows = timed("pallas expand 12ch", run, vs_cm, start)

    @jax.jit
    def scatter_ref(c, v):
        iota = jnp.arange(n, dtype=jnp.int32)
        sk, order = jax.lax.sort((c, iota), num_keys=1, is_stable=True)
        is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        first = jax.lax.cummax(jnp.where(is_first, iota, 0))
        rank_sorted = iota - first
        fits = rank_sorted < cap
        slot_sorted = jnp.where(fits, sk * cap + rank_sorted, C * cap)
        vsrt = v[order]
        out = jnp.zeros((C * cap + 1, ch), jnp.float32)
        return out.at[slot_sorted].set(vsrt, mode="drop")[:-1]

    ref = timed("scatter reference 12ch", scatter_ref, cell, vals)
    got = np.asarray(grid_rows)[: C * cap]
    exp = np.asarray(ref)
    bad = np.abs(got - exp).max()
    print(f"max abs diff vs scatter: {bad:.3e}", flush=True)


if __name__ == "__main__":
    main()
