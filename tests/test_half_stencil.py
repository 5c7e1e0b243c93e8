"""Half-stencil roll passes vs the full 3^dim stencil.

The half-stencil path (config.dense_half_stencil) computes each
unordered +/- offset pair's [cap_i, cap_j, C] block once and reduces it
along both cap axes — the dense-roll analog of the reference's
half-stencil cell visit + contact flip (`contacts.rs:202-220,300-305`).
It must reproduce the full stencil exactly up to summation order (pair
counts are integers and must match bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.config import SimConfig
from salva_tpu.geometry import dense_grid as dg
from salva_tpu.object.state import BoundariesState, FluidsState
from salva_tpu.solver.dense_common import DenseCtx


def _pair(dim):
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
        # Non-uniform masses so the asymmetric m_i / m_j weighting of the
        # mirrored contributions is actually exercised.
        fluid_id=jnp.zeros((n,), jnp.int32),
    )
    fl = fl.replace(
        volumes=jnp.full((n,), 1e-3)
        * (1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(7), (n,)))
    )
    bd = BoundariesState.empty(8, dim)
    spec_f = dg.spec_for_aabb((0.0,) * dim, (1.2,) * dim, h, cap=16)
    spec_b = spec_f.replace(cap=4)

    def ctx(half: bool):
        sim = SimConfig(
            dim=dim, particle_radius=0.05, dense_compact=False,
            dense_half_stencil=half,
            domain=((0.0,) * dim, (1.2,) * dim),
        )
        return DenseCtx(sim, spec_f, spec_b, fl, bd)

    return ctx(False), ctx(True)


@pytest.mark.parametrize("dim", [2, 3])
def test_hoist_matches(dim):
    full, half = _pair(dim)
    assert not full.half and half.half
    np.testing.assert_allclose(
        np.asarray(full.rho), np.asarray(half.rho), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(full.Gf), np.asarray(half.Gf), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(full.sq_mm), np.asarray(half.sq_mm), rtol=1e-4,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(full.s2_m), np.asarray(half.s2_m), rtol=1e-4, atol=1e-8
    )
    # Pair counts are integers: bitwise equal.
    np.testing.assert_array_equal(
        np.asarray(full.count), np.asarray(half.count)
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_t_and_k_pass_match(dim):
    full, half = _pair(dim)
    Q = full.V
    np.testing.assert_allclose(
        np.asarray(full.t_pass(Q)), np.asarray(half.t_pass(Q)),
        rtol=1e-4, atol=1e-4,
    )
    K = jnp.where(full.live, full.rho / 1000.0, 0.0)
    np.testing.assert_allclose(
        np.asarray(full.k_pass(K)), np.asarray(half.k_pass(K)),
        rtol=1e-4, atol=1e-4,
    )


def test_half_disabled_on_compact_and_halo():
    # Compact indexing has no roll-back; the flag must not engage there.
    dim = 3
    h = 0.2
    n = 64
    fl = FluidsState.empty(n, dim).replace(
        positions=jax.random.uniform(
            jax.random.PRNGKey(2), (n, dim), jnp.float32, 0.0, 1.0
        ),
        volumes=jnp.full((n,), 1e-3),
        density0=jnp.full((n,), 1000.0),
        alive=jnp.ones((n,), bool),
    )
    bd = BoundariesState.empty(8, dim)
    spec_f = dg.spec_for_aabb((0.0,) * dim, (1.0,) * dim, h, cap=8)
    sim = SimConfig(dim=dim, particle_radius=0.05, dense_compact=True,
                    dense_half_stencil=True,
                    domain=((0.0,) * dim, (1.0,) * dim))
    ctx = DenseCtx(sim, spec_f, spec_f.replace(cap=4), fl, bd)
    assert not ctx.half
