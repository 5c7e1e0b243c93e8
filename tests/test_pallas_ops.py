"""Pallas pair-pass kernels vs the XLA reference implementation
(interpret mode on CPU; compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.config import DFSPHConfig, SimConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.ops import PALLAS_OK, k_pass_pallas, t_pass_pallas
from salva_tpu.solver.dense_common import DenseCtx
from salva_tpu.object.state import BoundariesState, FluidsState

pytestmark = pytest.mark.skipif(not PALLAS_OK, reason="pallas unavailable")


def _ctx(dim, with_boundary=False):
    h = 0.2
    n = 400
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, dim), jnp.float32, 0.0, 1.2)
    alive = jnp.arange(n) % 7 != 0
    fl = FluidsState.empty(n, dim).replace(
        positions=pos,
        velocities=jax.random.normal(jax.random.PRNGKey(1), (n, dim)),
        volumes=jnp.full((n,), 1e-3),
        density0=jnp.full((n,), 1000.0),
        alive=alive,
    )
    if with_boundary:
        nb = 60
        bpos = jax.random.uniform(
            jax.random.PRNGKey(4), (nb, dim), jnp.float32, 0.0, 0.7
        )
        bd = BoundariesState.empty(nb, dim).replace(
            positions=bpos,
            velocities=jax.random.normal(
                jax.random.PRNGKey(5), (nb, dim)
            ) * 0.1,
            volumes=jnp.full((nb,), 2e-3),
            alive=jnp.arange(nb) % 5 != 0,
        )
    else:
        bd = BoundariesState.empty(8, dim)
    sim = SimConfig(dim=dim, particle_radius=0.05, use_pallas=False,
                    dense_compact=False,
                    domain=((0.0,) * dim, (1.2,) * dim))
    spec_f = dg.spec_for_aabb((0.0,) * dim, (1.2,) * dim, h, cap=16)
    spec_b = spec_f.replace(cap=4)
    return sim, DenseCtx(sim, spec_f, spec_b, fl, bd)


@pytest.mark.parametrize("dim", [2, 3])
def test_t_pass_matches(dim):
    sim, ctx = _ctx(dim)
    Q = ctx.V
    ref = ctx.t_pass(Q)
    out = t_pass_pallas(
        ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M, Q,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_hoist_ff_matches(dim):
    from salva_tpu.ops import hoist_ff_pallas
    from salva_tpu.solver.dense_common import fold_pairs, w_dwr

    sim, ctx = _ctx(dim)
    # Reference: the XLA ff fold (same body as DenseCtx._hoist).
    kd_w, kd_dw = ctx.kd
    kg_w, kg_dw = ctx.kg
    h = ctx.h

    def ff_body(acc, dpos, r2, within, j):
        rho, gf, sq, s2, cnt = acc
        _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
        wd, _ = w_dwr(r2, h, dim, kd_w, kd_dw)
        mj = jnp.where(within, j["m"][None, :, :], 0.0)
        rho = rho + jnp.sum(mj * wd, axis=1)
        gsq = jnp.zeros_like(r2)
        gf_new = []
        for d in range(dim):
            g_d = dpos[d] * dwr
            gf_new.append(gf[d] + jnp.sum(g_d * mj, axis=1))
            gsq = gsq + g_d * g_d
        sq = sq + jnp.sum(gsq * mj * mj, axis=1)
        s2 = s2 + jnp.sum(gsq * mj, axis=1)
        cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
        return rho, jnp.stack(gf_new), sq, s2, cnt

    z = jnp.zeros_like(ctx.maskf)
    ref = fold_pairs(
        ctx.offsets, h, dim, ctx.P, ctx.maskf, ctx.P, ctx.maskf,
        ctx.jff, {"m": ctx.M}, ff_body,
        (z, jnp.zeros_like(ctx.P), z, z,
         jnp.zeros_like(ctx.maskf, dtype=jnp.int32)),
    )
    out = hoist_ff_pallas(
        ctx.spec_f, h, dim, sim.kernel_density, sim.kernel_gradient,
        ctx.P, ctx.M, need_s2=True, tile=256, interpret=True,
    )
    # Float outputs: f32 accumulation-order rounding only (Gf sees
    # near-cancellation between symmetric neighbors — atol-dominated);
    # the contact count must be exact.
    for r, o in zip(ref[:4], out[:4]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ref[4]), np.asarray(out[4]))


@pytest.mark.parametrize("dim", [2, 3])
def test_hoist_fb_matches(dim):
    from salva_tpu.ops import hoist_fb_pallas
    from salva_tpu.solver.dense_common import fold_pairs, w_dwr

    sim, ctx = _ctx(dim, with_boundary=True)
    kd_w, kd_dw = ctx.kd
    kg_w, kg_dw = ctx.kg
    h = ctx.h

    if ctx.sparse_b:
        pb, maskb = ctx._Pb_full, ctx._maskb_full
        volb, vbvel = ctx._Volb_full, ctx._Vbvel_full
    else:
        pb, maskb, volb, vbvel = ctx.Pb, ctx.maskb, ctx.Volb, ctx.Vbvel

    def fb_body(acc, dpos, r2, within, j):
        rho, gb, sq, s2, sb, cnt = acc
        _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
        wd, _ = w_dwr(r2, h, dim, kd_w, kd_dw)
        vj = jnp.where(within, j["vol"][None, :, :], 0.0)
        rho = rho + jnp.sum(vj * wd, axis=1)
        gsq = jnp.zeros_like(r2)
        vdotg = jnp.zeros_like(r2)
        gb_new = []
        for d in range(dim):
            g_d = dpos[d] * dwr
            gb_new.append(gb[d] + jnp.sum(g_d * vj, axis=1))
            gsq = gsq + g_d * g_d
            vdotg = vdotg + j["vb"][d][None, :, :] * g_d * vj
        sq = sq + jnp.sum(gsq * vj * vj, axis=1)
        s2 = s2 + jnp.sum(gsq * vj, axis=1)
        sb = sb + jnp.sum(vdotg, axis=1)
        cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
        return rho, jnp.stack(gb_new), sq, s2, sb, cnt

    z = jnp.zeros_like(ctx.maskf)
    ref = fold_pairs(
        ctx.offsets, h, dim, ctx.P, ctx.maskf, pb, maskb,
        ctx.jfb, {"vol": volb, "vb": vbvel}, fb_body,
        (z, jnp.zeros_like(ctx.P), z, z, z,
         jnp.zeros_like(ctx.maskf, dtype=jnp.int32)),
    )
    assert int(np.asarray(ref[5]).sum()) > 0  # fb contacts actually exist
    out = hoist_fb_pallas(
        ctx.spec_f, pb.shape[-2], h, dim, sim.kernel_density,
        sim.kernel_gradient, ctx.P, ctx.M, pb, volb, vbvel,
        need_s2=True, tile=256, interpret=True,
    )
    for r, o in zip(ref[:5], out[:5]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ref[5]), np.asarray(out[5]))


def test_occupancy_skip_matches_on_sparse_state():
    """A small cluster in a large domain leaves most tiles empty — the
    per-tile occupancy skip must produce exact zeros there and identical
    values on occupied tiles."""
    dim = 3
    h = 0.2
    n = 200
    key = jax.random.PRNGKey(2)
    # Cluster confined to a corner ~1/64 of the domain volume.
    pos = jax.random.uniform(key, (n, dim), jnp.float32, 0.0, 0.6)
    fl = FluidsState.empty(n, dim).replace(
        positions=pos,
        velocities=jax.random.normal(jax.random.PRNGKey(3), (n, dim)),
        volumes=jnp.full((n,), 1e-3),
        density0=jnp.full((n,), 1000.0),
        alive=jnp.ones((n,), bool),
    )
    bd = BoundariesState.empty(8, dim)
    sim = SimConfig(dim=dim, particle_radius=0.05, use_pallas=False,
                    dense_compact=False,
                    domain=((0.0,) * dim, (2.4,) * dim))
    spec_f = dg.spec_for_aabb((0.0,) * dim, (2.4,) * dim, h, cap=16)
    ctx = DenseCtx(sim, spec_f, spec_f.replace(cap=4), fl, bd)
    from salva_tpu.ops.pallas_pair import _occupancy

    occ = _occupancy(ctx.M, ctx.M.shape[-1],
                     -(-ctx.M.shape[-1] // 256) * 256, 256)
    assert int(occ.sum()) < len(occ)  # the skip branch actually runs

    ref_t = ctx.t_pass(ctx.V)
    out_t = t_pass_pallas(
        ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M, ctx.V,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref_t), np.asarray(out_t),
                               rtol=1e-4, atol=1e-5)
    K = ctx.rho * 1e-6
    ref_k = ctx.k_pass(K)
    out_k = k_pass_pallas(
        ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M, K,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref_k), np.asarray(out_k),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_k_pass_matches(dim):
    sim, ctx = _ctx(dim)
    K = ctx.rho * 1e-6
    ref = ctx.k_pass(K)
    out = k_pass_pallas(
        ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M, K,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("dim", [2, 3])
def test_k_pass_v2_matches(dim):
    """Slot-group-gated v2 kernel == XLA k_pass (gating is pure work
    elision; skipped blocks contribute exactly zero)."""
    from salva_tpu.ops.pallas_pair2 import k_pass_pallas2

    sim, ctx = _ctx(dim)
    K = ctx.rho * 1e-6
    ref = ctx.k_pass(K)
    out = k_pass_pallas2(
        ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M, K,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("dim", [2, 3])
def test_v3_passes_match(dim):
    """v3 lo/hi-split kernels == XLA k/t passes and the ff hoist fold
    (interpret mode; the random _ctx state has cells above occupancy 8,
    so the hi-complement kernel contributes real blocks)."""
    from salva_tpu.ops.pallas_pair2 import (
        hoist_ff_pallas3,
        k_pass_pallas3,
        t_pass_pallas3,
    )
    from salva_tpu.ops._pallas_hi import _group_flags, _pad_last
    from salva_tpu.ops.pallas_pair import _halo, _pad_cap

    sim, ctx = _ctx(dim)
    # Precondition: hi groups actually live (else the complement kernel
    # is untested).
    w = -(-_halo(ctx.spec_f) // 128) * 128
    Mp, _ = _pad_last(ctx.M, w, 256, 0.0)
    flags = _group_flags(Mp, _pad_cap(ctx.spec_f.cap), w)
    assert bool(np.asarray(flags[1:, :-1]).any())

    K = ctx.rho * 1e-6
    np.testing.assert_allclose(
        np.asarray(ctx.k_pass(K)),
        np.asarray(k_pass_pallas3(
            ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M,
            K, tile=256, interpret=True)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctx.t_pass(ctx.V)),
        np.asarray(t_pass_pallas3(
            ctx.spec_f, ctx.h, dim, sim.kernel_gradient, ctx.P, ctx.M,
            ctx.V, tile=256, interpret=True)),
        rtol=1e-4, atol=1e-3,
    )
    rho, gf, sq, s2, cnt = hoist_ff_pallas3(
        ctx.spec_f, ctx.h, dim, sim.kernel_density, sim.kernel_gradient,
        ctx.P, ctx.M, need_s2=True, tile=256, interpret=True,
    )
    from salva_tpu.ops import hoist_ff_pallas

    ref = hoist_ff_pallas(
        ctx.spec_f, ctx.h, dim, sim.kernel_density, sim.kernel_gradient,
        ctx.P, ctx.M, need_s2=True, tile=256, interpret=True,
    )
    for r, o in zip(ref[:4], (rho, gf, sq, s2)):
        r, o = np.asarray(r), np.asarray(o)
        scale = max(float(np.abs(r).max()), 1.0)
        np.testing.assert_allclose(o / scale, r / scale, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(ref[4]), np.asarray(cnt))
