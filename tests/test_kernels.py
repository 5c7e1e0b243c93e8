"""Unit tests of the SPH kernels.

Strategy per SURVEY.md §4: verify normalization (integral of W over its
support is 1) by quadrature, and the radial derivative against JAX
autodiff — things the reference never tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salva_tpu.kernels import sph


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("name", ["cubic", "poly6", "spiky"])
def test_kernel_normalization(name, dim):
    """Integral of W over R^dim should be 1 (quadrature over the support)."""
    w_fn, _ = sph.get_kernel(name)
    h = 0.37
    n = 2000
    r = (jnp.arange(n, dtype=jnp.float32) + 0.5) * (h / n)
    w = w_fn(r, h, dim)
    if dim == 2:
        integral = jnp.sum(w * 2.0 * np.pi * r) * (h / n)
    else:
        integral = jnp.sum(w * 4.0 * np.pi * r * r) * (h / n)
    assert abs(float(integral) - 1.0) < 2e-3, f"{name} {dim}D: {float(integral)}"


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("name", ["cubic", "poly6", "spiky", "viscosity"])
def test_kernel_derivative_matches_autodiff(name, dim):
    w_fn, dw_fn = sph.get_kernel(name)
    h = 0.2
    # Stay away from the kernels' branch points and r=0 singular guards.
    rs = jnp.asarray([0.013, 0.04, 0.07, 0.11, 0.15, 0.19], jnp.float32)
    auto = jax.vmap(jax.grad(lambda r: w_fn(r, h, dim)))(rs)
    manual = dw_fn(rs, h, dim)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual), rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("dim", [2, 3])
def test_kernel_support_and_positivity(dim):
    h = 0.5
    for name in ["cubic", "poly6", "spiky"]:
        w_fn, dw_fn = sph.get_kernel(name)
        assert float(w_fn(jnp.float32(h * 1.01), h, dim)) == 0.0
        assert float(dw_fn(jnp.float32(h * 1.01), h, dim)) == 0.0
        assert float(w_fn(jnp.float32(0.0), h, dim)) > 0.0


def test_cubic_matches_reference_values():
    """Spot values computed from the reference formulas
    (`cubic_spline_kernel.rs:12-52`)."""
    h = 1.0
    # 3D normalizer 8/pi; W(0) = 8/pi; W(0.5h) = 8/pi * (1 + 6*(0.125-0.25))
    w0 = float(sph.cubic_w(jnp.float32(0.0), h, 3))
    np.testing.assert_allclose(w0, 8.0 / np.pi, rtol=1e-6)
    w_half = float(sph.cubic_w(jnp.float32(0.5), h, 3))
    np.testing.assert_allclose(w_half, 8.0 / np.pi * 0.25, rtol=1e-6)
    # 2D normalizer 40/(7 pi)
    w0_2d = float(sph.cubic_w(jnp.float32(0.0), h, 2))
    np.testing.assert_allclose(w0_2d, 40.0 / (7.0 * np.pi), rtol=1e-6)


def test_grad_from_dpos_zero_at_origin():
    dpos = jnp.zeros((4, 3), jnp.float32)
    r, grad = sph.grad_from_dpos(dpos, 1.0, 3)
    assert np.all(np.asarray(grad) == 0.0)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_grad_from_dpos_direction():
    dpos = jnp.asarray([[0.3, 0.0, 0.0]], jnp.float32)
    _, grad = sph.grad_from_dpos(dpos, 1.0, 3)
    g = np.asarray(grad)[0]
    # Gradient points along dpos with the (negative, attractive) cubic slope.
    assert g[0] < 0.0
    assert g[1] == 0.0 and g[2] == 0.0


def test_cohesion_adhesion_finite():
    h = 0.1
    r = jnp.linspace(0.0, h * 1.2, 100, dtype=jnp.float32)
    c = sph.cohesion_kernel(r, h, 3)
    a = sph.adhesion_kernel(r, h, 3)
    assert np.all(np.isfinite(np.asarray(c)))
    assert np.all(np.isfinite(np.asarray(a)))
    assert float(jnp.max(jnp.abs(a))) > 0.0
    # Adhesion kernel is zero outside (h/2, h].
    assert float(sph.adhesion_kernel(jnp.float32(0.4 * h), h, 3)) == 0.0
    assert float(sph.adhesion_kernel(jnp.float32(1.1 * h), h, 3)) == 0.0
