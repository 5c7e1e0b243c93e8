"""Experiments: per-iteration pair-pass formulations on the current backend.

Compares, at a bench-like dam-break configuration:
  1. current t_pass / k_pass (recompute dpos + kernel per offset);
  2. frozen-pair-coefficient passes: S_o = dwr * m_j materialized per
     substep, iteration passes = multiply-reduce over j (f32 and bf16);
  3. batched dot_general variant of (2);
  4. scatter-based vs gather-based to_grid.

Usage: python tools/exp_pair.py [N]
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
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # Fetch a value: the tunneled backend can ack block_until_ready early.
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf)) if leaf.dtype != jnp.int32 else int(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 97000

    from salva_tpu import shapes
    from salva_tpu.config import DFSPHConfig
    from salva_tpu.sampling import shape_surface_sample
    from salva_tpu.scenes import cube_fluid
    from salva_tpu.solver.dense_common import DenseCtx, w_dwr
    from salva_tpu.geometry import dense_grid as dgrid
    from salva_tpu.step import _dense_config
    from salva_tpu.world import Boundary, Fluid, LiquidWorld

    n_side = max(2, round(n_target ** (1.0 / 3.0)))
    radius = 0.05
    half = n_side * radius
    wall = max(1.5 * half, half + 0.5)
    domain = ((-wall - 0.3, -0.4, -wall - 0.3),
              (wall + 0.3, 2.0 * half + 1.0, wall + 0.3))
    world = LiquidWorld(
        solver=DFSPHConfig(), particle_radius=radius, dim=3,
        domain=domain, layout="dense", dense_cap_boundary=16,
    )
    pos = cube_fluid((n_side,) * 3, radius)
    pos[:, 1] += half + radius
    world.add_fluid(Fluid(pos, density0=1000.0))
    box = shapes.Cuboid((wall, 0.1, wall))
    samples = shape_surface_sample(box, radius, 3)
    samples[:, 1] -= 0.1
    world.add_boundary(Boundary(samples))
    world._prepare()

    sim = world._effective_sim()
    spec_f, spec_b, _ = _dense_config(sim, world.solver_config,
                                      world._force_set)
    fl, bd = world.fluids_state, world.boundaries_state
    C = spec_f.num_cells
    cap = spec_f.cap
    n_off = 27
    print(f"N={int(np.asarray(fl.alive).sum())} capacity={fl.capacity} "
          f"C={C} cap={cap}  S_f32={27*cap*cap*C*4/1e9:.2f} GB", flush=True)

    ctx = DenseCtx(sim, spec_f, spec_b, fl, bd)
    V = ctx.V
    K = ctx.rho * 1e-6

    t_fn = jax.jit(lambda v: DenseCtx.t_pass(ctx, v))
    k_fn = jax.jit(lambda k: DenseCtx.k_pass(ctx, k))
    timed("t_pass current", t_fn, V)
    timed("k_pass current", k_fn, K)

    # k_pass without per-offset stack: accumulate a component list.
    def k_pass_v2(Kv):
        dim = ctx.dim
        acc = [jnp.zeros_like(ctx.maskf) for _ in range(dim)]
        for dpos, dwr, o in ctx._hot_blocks():
            mj = ctx.jff(ctx.M, o)
            kj = ctx.jff(Kv, o)
            coeff = kj[None, :, :] * mj[None, :, :] * dwr
            for d in range(dim):
                acc[d] = acc[d] + jnp.sum(dpos[d] * coeff, axis=1)
        return jnp.stack(acc)

    timed("k_pass no-stack", jax.jit(k_pass_v2), K)

    # --- frozen pair coefficients -----------------------------------------
    from salva_tpu.kernels import get_kernel
    kg_w, kg_dw = get_kernel(sim.kernel_gradient)
    h, dim = sim.h, sim.dim

    def build_S(P, M, dtype):
        Ss = []
        for o in range(n_off):
            pj = ctx.jff(P, o)
            dpos0 = P[0][:, None, :] - pj[0][None, :, :]
            r2 = dpos0 * dpos0
            for d in range(1, dim):
                dd = P[d][:, None, :] - pj[d][None, :, :]
                r2 = r2 + dd * dd
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            mj = ctx.jff(ctx.M, o)
            Ss.append((dwr * mj[None, :, :]).astype(dtype))
        return jnp.stack(Ss)  # [27, cap_i, cap_j, C]

    build_f32 = jax.jit(lambda: build_S(ctx.P, ctx.M, jnp.float32))
    S32 = timed("build S f32", build_f32)
    build_b16 = jax.jit(lambda: build_S(ctx.P, ctx.M, jnp.bfloat16))
    S16 = timed("build S bf16", build_b16)

    def sp_multi(S, X):
        """X: [m, cap, C] channels -> [m, cap, C], elementwise j-reduce."""
        m = X.shape[0]
        acc = jnp.zeros((m,) + tuple(ctx.maskf.shape), jnp.float32)
        for o in range(n_off):
            xj = ctx.jff(X, o)  # [m, cap_j, C]
            prod = S[o][None].astype(jnp.float32) * xj[:, None].astype(
                jnp.float32)
            acc = acc + jnp.sum(prod, axis=2)
        return acc

    def t_pass_S(S, Q):
        ch = jnp.concatenate(
            [Q, jnp.sum(Q * ctx.P, axis=0, keepdims=True)], axis=0
        )  # [4, cap, C]
        out = sp_multi(S, ch)
        return jnp.sum(ctx.P * out[:dim], axis=0) - out[dim]

    def k_pass_S(S, Kv):
        ch = jnp.concatenate([Kv[None], Kv[None] * ctx.P], axis=0)
        out = sp_multi(S, ch)
        return ctx.P * out[0][None] - out[1:]

    timed("t_pass S f32", jax.jit(t_pass_S), S32, V)
    timed("k_pass S f32", jax.jit(k_pass_S), S32, K)
    timed("t_pass S bf16-in", jax.jit(t_pass_S), S16, V)
    timed("k_pass S bf16-in", jax.jit(k_pass_S), S16, K)

    # Batched dot_general: [C, cap_i, cap_j] @ [C, cap_j, m].
    def sp_dot(S, X, prec):
        m = X.shape[0]
        acc = jnp.zeros((ctx.maskf.shape[1], cap, m), jnp.float32)
        for o in range(n_off):
            xj = ctx.jff(X, o)  # [m, cap_j, C]
            sb = jnp.transpose(S[o], (2, 0, 1))  # [C, ci, cj]
            xb = jnp.transpose(xj, (2, 1, 0))  # [C, cj, m]
            acc = acc + jax.lax.dot_general(
                sb, xb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return jnp.transpose(acc, (2, 1, 0))  # [m, cap, C]

    def t_pass_dot(S, Q, prec="default"):
        ch = jnp.concatenate(
            [Q, jnp.sum(Q * ctx.P, axis=0, keepdims=True)], axis=0
        )
        out = sp_dot(S, ch, prec)
        return jnp.sum(ctx.P * out[:dim], axis=0) - out[dim]

    timed("t_pass dot f32", jax.jit(lambda s, q: t_pass_dot(s, q)), S32, V)
    timed("t_pass dot bf16", jax.jit(
        lambda s, q: t_pass_dot(s, q.astype(jnp.bfloat16))), S16, V)

    # Accuracy of the S paths vs current.
    ref = np.asarray(t_fn(V))
    for name, fn, s in (("S f32", t_pass_S, S32), ("S bf16", t_pass_S, S16)):
        got = np.asarray(jax.jit(fn)(s, V))
        denom = np.abs(ref).max() + 1e-9
        print(f"  t_pass {name}: max_abs_err/scale = "
              f"{np.abs(got - ref).max() / denom:.2e}", flush=True)

    # --- binning: scatter to_grid vs gather to_grid ------------------------
    binf = ctx.binf

    def to_grid_scatter(x):
        return dgrid.to_grid(spec_f, binf, x)

    # Gather formulation: slot -> particle index table built once.
    def build_gidx(positions, alive):
        b = dgrid.bin_particles(spec_f, positions, alive)
        src = jnp.full((C * cap,), fl.capacity, jnp.int32)
        src = src.at[b.slot_of].set(
            jnp.arange(fl.capacity, dtype=jnp.int32), mode="drop")
        return b, src

    b2, gidx = jax.jit(build_gidx)(fl.positions, fl.alive)

    def to_grid_gather(x):
        padded = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        return padded[jnp.minimum(gidx, fl.capacity)].reshape(C, cap).T

    timed("to_grid scatter x7",
          jax.jit(lambda p, v, m: (to_grid_scatter(p[:, 0]),
                                   to_grid_scatter(p[:, 1]),
                                   to_grid_scatter(p[:, 2]),
                                   to_grid_scatter(v[:, 0]),
                                   to_grid_scatter(v[:, 1]),
                                   to_grid_scatter(v[:, 2]),
                                   to_grid_scatter(m))),
          fl.positions, fl.velocities, fl.masses)
    timed("to_grid gather x7",
          jax.jit(lambda p, v, m: (to_grid_gather(p[:, 0]),
                                   to_grid_gather(p[:, 1]),
                                   to_grid_gather(p[:, 2]),
                                   to_grid_gather(v[:, 0]),
                                   to_grid_gather(v[:, 1]),
                                   to_grid_gather(v[:, 2]),
                                   to_grid_gather(m))),
          fl.positions, fl.velocities, fl.masses)
    timed("bin_particles only",
          jax.jit(lambda p, a: dgrid.bin_particles(spec_f, p, a)),
          fl.positions, fl.alive)
    timed("build_gidx (bin + slot->idx)",
          jax.jit(build_gidx), fl.positions, fl.alive)


if __name__ == "__main__":
    main()
