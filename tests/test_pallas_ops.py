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


def _ctx(dim):
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
