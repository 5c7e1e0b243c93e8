"""Round-4 isolation of the hoist's components at the bench state:
ff hoist (half-stencil) vs fb hoist (full stencil over remat'd boundary
grids) vs the boundary remat scatters vs Volb read.

The exp_fixed4 ladder showed the hoist (full DenseCtx minus grids) costs
~26 ms of the 45 ms fixed step cost at 97k. This splits it.

Usage: [env as bench] python tools/exp_hoist4.py [N]
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
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000
    from salva_tpu.solver.dense_common import DenseCtx
    from salva_tpu.step import _dense_config

    world = build_world(n_target)
    run_to_impact(world)
    sim = world._boundary_volume_mode(world._effective_sim(), None)
    sim = sim.replace(recompute_boundary_volumes=False)
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    n = int(np.asarray(fl.alive).sum())
    print(f"N={n} fitted={sim.fitted_dims} caps=({spec_f.cap},{spec_b.cap})",
          flush=True)

    class Probe(DenseCtx):
        """DenseCtx whose _hoist is replaced per experiment."""

        MODE = "full"

        def _hoist(self):
            if self.MODE == "none":
                z = jnp.zeros_like(self.maskf)
                zi = jnp.zeros_like(self.maskf, dtype=jnp.int32)
                self.rho = self.R0
                self.Gf = jnp.zeros_like(self.P)
                self.Gb = jnp.zeros_like(self.P)
                self.Gsum = self.Gf
                self.Sb = z
                self.sq_mm = z
                self.s2_ff = z
                self.s2_m = z
                self.count = zi
                self.cnt_ff = zi
                self.cnt_fb = zi
                return
            if self.MODE == "ff_only":
                rho_ff, Gf, sq_ff, s2_ff, cnt_ff = self._hoist_ff_half()
                self.rho = jnp.where(self.live, rho_ff, self.R0)
                self.Gf = Gf
                self.Gb = jnp.zeros_like(self.P)
                self.Gsum = Gf
                self.Sb = jnp.zeros_like(self.maskf)
                self.sq_mm = sq_ff
                self.s2_ff = s2_ff
                self.s2_m = s2_ff
                self.count = cnt_ff
                self.cnt_ff = cnt_ff
                self.cnt_fb = jnp.zeros_like(cnt_ff)
                return
            super()._hoist()

    def make(mode, sparse_b=True):
        s = sim if sparse_b else sim.replace(dense_sparse_boundary=False)

        @jax.jit
        def f(fluids, boundaries):
            Probe.MODE = mode
            ctx = Probe(s, spec_f, spec_b, fluids, boundaries, need_s2=False)
            return (jnp.sum(ctx.rho) + jnp.sum(ctx.Gsum) + jnp.sum(ctx.sq_mm)
                    + jnp.sum(ctx.Sb) + jnp.sum(ctx.count)
                    + jnp.sum(ctx.Volb))
        # Trace immediately while MODE is set (jit defers; force lower).
        return f.lower(fl, bd).compile()

    progs = [
        ("ctx no hoist (bins+grids+remat+Volb)", make("none")),
        ("ctx ff hoist only (half-stencil)", make("ff_only")),
        ("ctx full hoist (ff + fb)", make("full")),
    ]
    for _, fn in progs:
        jax.block_until_ready(fn(fl, bd))
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
    for name, _ in progs:
        print(f"{name:42s} {best[name]:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
