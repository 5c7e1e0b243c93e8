"""A/B the slot-group-gated ("true pairs") v2 Pallas k_pass vs the XLA
roll fold and the v1 Pallas kernel at a realistic dam-break state.

VERDICT r4 #4's done-bar: one iteration pass running on chip at 1M with
a measured >= 3x over the roll pass. Min-of-rounds timing with
value-fetch fencing, plus occupancy statistics (live slot-group pair
fraction) so the measured win is attributable.

Usage: [bench env] python tools/exp_truepairs.py [N] [tile]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import build_world, run_to_impact  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from salva_tpu.ops import k_pass_pallas
    from salva_tpu.ops.pallas_pair import _halo, _pad_cap, _pad_last
    from salva_tpu.ops.pallas_pair2 import (
        _group_flags,
        k_pass_pallas2,
        k_pass_pallas3,
    )
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.step import _dense_config

    world = build_world(n_target)
    run_to_impact(world)
    sim = world._boundary_volume_mode(world._effective_sim(), None)
    # Pin the DenseCtx dispatch to the XLA folds: the auto threshold
    # (config.pallas_auto_cells) would otherwise flip ctx.k_pass to the
    # very kernels this tool A/Bs against.
    sim = sim.replace(recompute_boundary_volumes=False, use_pallas=False)
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    n = int(np.asarray(fl.alive).sum())

    ctx0 = DenseCtx(sim, spec_f, spec_b, fl, bd, need_s2=False)
    c = ctx0.M.shape[-1]
    capp = _pad_cap(spec_f.cap)
    G = capp // 8
    w = -(-_halo(spec_f) // 128) * 128
    Mp, cp = _pad_last(ctx0.M, w, tile, 0.0)
    flags = np.asarray(_group_flags(Mp, capp, w))
    nfc_win = flags.shape[1] - 1
    # Work estimate: pair blocks = sum over (chunk, shift, gi, gj) of
    # own_flag[gi, chunk] & j_flag[gj, chunk+shift-cover]; report vs the
    # all-ones roll equivalent.
    shifts = [spec_f.flat_shift(o)
              for o in __import__("salva_tpu.geometry.dense_grid",
                                  fromlist=["neighbor_offsets"]
                                  ).neighbor_offsets(spec_f.dim)]
    live_blocks = 0
    for s in shifts:
        off = s // 128
        jf = flags[:, :nfc_win].copy()
        jf0 = np.roll(flags[:, :nfc_win], -off, axis=1)
        jf = jf0
        if s % 128 != 0:
            jf = jf0 | np.roll(flags[:, :nfc_win], -(off + 1), axis=1)
        for gi in range(G):
            for gj in range(G):
                live_blocks += int(
                    (flags[gi, :nfc_win] & jf[gj]).sum()
                )
    total_blocks = len(shifts) * G * G * nfc_win
    # XLA half-stencil equivalent block count (14 blocks x G^2, all
    # chunks, mirror math ~1.33x ops/block).
    half_blocks = (len(shifts) // 2 + 1) * G * G * nfc_win
    print(
        f"N={n} cells={c} cap={spec_f.cap} G={G} w={w} chunks={nfc_win}\n"
        f"live slot-group blocks: {live_blocks}/{total_blocks} "
        f"({100.0 * live_blocks / total_blocks:.1f}%)  "
        f"vs XLA half-stencil blocks {half_blocks} -> ideal "
        f"{half_blocks * 1.33 / live_blocks:.2f}x",
        flush=True,
    )

    # Each variant runs the pass REPS_IN times on distinct inputs (so
    # XLA cannot CSE them) on one shared ctx build; a ctx-only variant
    # is subtracted to isolate per-pass cost.
    REPS_IN = 4
    MULTS = tuple(1e-6 * (i + 1) for i in range(REPS_IN))

    def ctx_only(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return jnp.sum(ctx.rho) + jnp.sum(ctx.M)

    def xla_k(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return sum(jnp.sum(ctx.k_pass(ctx.rho * m)) for m in MULTS)

    def pal1_k(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return sum(
            jnp.sum(k_pass_pallas(
                spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P,
                ctx.M, ctx.rho * m, tile=tile))
            for m in MULTS
        )

    def pal2_k(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return sum(
            jnp.sum(k_pass_pallas2(
                spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P,
                ctx.M, ctx.rho * m, tile=tile))
            for m in MULTS
        )

    def pal3_k(fluids, boundaries):
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        return sum(
            jnp.sum(k_pass_pallas3(
                spec_f, sim.h, sim.dim, sim.kernel_gradient, ctx.P,
                ctx.M, ctx.rho * m, tile=tile))
            for m in MULTS
        )

    def pal3a_k(fluids, boundaries):
        # A (lo x lo) component alone: v1 kernel on the cap-8 slice.
        ctx = DenseCtx(sim, spec_f, spec_b, fluids, boundaries,
                       need_s2=False)
        lo = 8
        return sum(
            jnp.sum(k_pass_pallas(
                spec_f.replace(cap=lo), sim.h, sim.dim,
                sim.kernel_gradient, ctx.P[:, :lo], ctx.M[:lo],
                (ctx.rho * m)[:lo], tile=tile))
            for m in MULTS
        )

    progs = [("ctx only", jax.jit(ctx_only)),
             ("XLA k_pass (half-stencil rolls)", jax.jit(xla_k)),
             ("PAL v1 k_pass (tile air skip)", jax.jit(pal1_k)),
             ("PAL v2 k_pass (slot-group gating)", jax.jit(pal2_k)),
             ("PAL v3 k_pass (lo/hi split)", jax.jit(pal3_k)),
             ("PAL v3-A lo component only", jax.jit(pal3a_k))]

    from salva_tpu.ops.pallas_pair2 import _fired_flags
    fired = np.asarray(_fired_flags(
        spec_f, _group_flags(Mp, capp, w)))
    hi_frac = float((flags[1:, :-1].any(axis=0)).mean())
    print(f"hi chunks: {100 * hi_frac:.1f}%  fired chunks: "
          f"{100 * float(fired[:-1].mean()):.1f}%", flush=True)

    # Compiled parity first (also the warmup).
    outs = {}
    for name, fn in progs:
        t0 = time.perf_counter()
        outs[name] = float(jax.block_until_ready(fn(fl, bd)))
        print(f"compile+run {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    ref = outs[progs[1][0]]
    for name, _ in progs[2:]:
        rel = abs(outs[name] - ref) / max(abs(ref), 1e-30)
        print(f"parity {name}: sum rel diff {rel:.2e}", flush=True)

    best = {name: float("inf") for name, _ in progs}
    reps = 10
    for _round in range(5):
        for name, fn in progs:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(fl, bd)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / reps * 1e3
            best[name] = min(best[name], dt)
    t_ctx = best[progs[0][0]]
    for name, _ in progs:
        per_pass = (best[name] - t_ctx) / REPS_IN
        extra = "" if name == progs[0][0] else f"  ({per_pass:.2f} ms/pass)"
        print(f"{name:36s} {best[name]:8.2f} ms{extra}", flush=True)
    xla_pp = (best[progs[1][0]] - t_ctx) / REPS_IN
    v2_pp = (best[progs[3][0]] - t_ctx) / REPS_IN
    v3_pp = (best[progs[4][0]] - t_ctx) / REPS_IN
    print(f"v2 vs XLA per-pass: {xla_pp / v2_pp:.2f}x", flush=True)
    print(f"v3 vs XLA per-pass: {xla_pp / v3_pp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
