"""SPH smoothing kernels.

TPU-native re-implementation of the reference kernel set
(``src/kernel/``): cubic spline (the default for every solver), Poly6,
Spiky and Müller viscosity kernels, plus the Akinci cohesion/adhesion
kernels used by surface tension (``akinci2013_surface_tension.rs:71-111``).

Every function is a pure, branch-free (``jnp.where``) elementwise map that
vectorizes over arbitrary batch shapes — these are evaluated over the
``[N, K]`` neighbor tables and fuse into the surrounding gather-reduce ops
under XLA.

All kernels take ``r`` (non-negative distances), the support radius ``h``
and the static spatial dimension ``dim``; each returns W(r, h) or the
radial derivative dW/dr(r, h). Gradients with respect to the offset vector
are assembled by :func:`grad_from_dpos`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Matches `Real::default_epsilon()` (f32::EPSILON) used by the reference to
# guard direction normalization (`src/kernel/kernel.rs:20-26`).
EPSILON = float(jnp.finfo(jnp.float32).eps)

# Derivative cutoff of the cubic spline (`cubic_spline_kernel.rs:71`).
_CUBIC_DIFF_EPS = 1.0e-5


def _cubic_normalizer(h, dim: int):
    # 2D: 40 / (7 pi h^2); 3D: 8 / (pi h^3)  (`cubic_spline_kernel.rs:15-18`).
    if dim == 2:
        return (40.0 / 7.0) / (math.pi * h * h)
    return 8.0 / (math.pi * h * h * h)


def cubic_w(r, h, dim: int):
    """Cubic spline kernel W(r, h) (`cubic_spline_kernel.rs:12-52`)."""
    normalizer = _cubic_normalizer(h, dim)
    q = r / h
    q2 = q * q
    near = 1.0 + (q2 * q - q2) * 6.0
    one_q = 1.0 - q
    far = one_q * one_q * one_q * 2.0
    rhs = jnp.where(q <= 0.5, near, jnp.where(q <= 1.0, far, 0.0))
    return normalizer * rhs


def cubic_dw(r, h, dim: int):
    """Cubic spline radial derivative (`cubic_spline_kernel.rs:55-101`)."""
    normalizer = _cubic_normalizer(h, dim)
    q = r / h
    near = (q * 3.0 - 2.0) * q * 6.0
    one_q = 1.0 - q
    far = -one_q * one_q * 6.0
    rhs = jnp.where(
        (q > 1.0) | (q <= _CUBIC_DIFF_EPS),
        0.0,
        jnp.where(q <= 0.5, near, far),
    )
    return normalizer * rhs / h


def poly6_w(r, h, dim: int):
    """Poly6 kernel (`poly6_kernel.rs:12-25`)."""
    if dim == 2:
        normalizer = 4.0 / (math.pi * h**8)
    else:
        normalizer = (315.0 / 64.0) / (math.pi * h**9)
    hh_rr = h * h - r * r
    return jnp.where(r <= h, normalizer * hh_rr * hh_rr * hh_rr, 0.0)


def poly6_dw(r, h, dim: int):
    """Poly6 radial derivative (`poly6_kernel.rs:27-40`)."""
    if dim == 2:
        normalizer = 4.0 / (math.pi * h**8)
    else:
        normalizer = (315.0 / 64.0) / (math.pi * h**9)
    hh_rr = h * h - r * r
    return jnp.where(r <= h, normalizer * hh_rr * hh_rr * r * -6.0, 0.0)


def spiky_w(r, h, dim: int):
    """Spiky kernel (`spiky_kernel.rs:12-25`)."""
    if dim == 2:
        normalizer = 10.0 / (math.pi * h**5)
    else:
        normalizer = 15.0 / (math.pi * h**6)
    h_r = h - r
    return jnp.where(r <= h, normalizer * h_r * h_r * h_r, 0.0)


def spiky_dw(r, h, dim: int):
    """Spiky radial derivative (`spiky_kernel.rs:27-40`)."""
    if dim == 2:
        normalizer = 10.0 / (math.pi * h**5)
    else:
        normalizer = 15.0 / (math.pi * h**6)
    h_r = h - r
    return jnp.where(r <= h, -normalizer * h_r * h_r * 3.0, 0.0)


def viscosity_w(r, h, dim: int):
    """Müller viscosity kernel (`viscosity_kernel.rs:12-30`)."""
    if dim == 2:
        normalizer = 10.0 / (3.0 * math.pi * h * h)
    else:
        normalizer = 15.0 / (2.0 * math.pi * h**3)
    r_safe = jnp.where(r > 0.0, r, 1.0)
    rr_hh = r * r / (h * h)
    val = normalizer * (
        rr_hh * (1.0 - r / (2.0 * h)) + h / (2.0 * r_safe) - 1.0
    )
    return jnp.where((r > 0.0) & (r <= h), val, 0.0)


def viscosity_dw(r, h, dim: int):
    """Müller viscosity radial derivative (`viscosity_kernel.rs:32-51`)."""
    if dim == 2:
        normalizer = 10.0 / (3.0 * math.pi * h * h)
    else:
        normalizer = 15.0 / (2.0 * math.pi * h**3)
    rr = r * r
    hh = h * h
    hhh = hh * h
    rr_safe = jnp.where(rr > 0.0, rr, 1.0)
    val = normalizer * (-3.0 * rr / (2.0 * hhh) + 2.0 * r / hh - h / (2.0 * rr_safe))
    return jnp.where((r > 0.0) & (r <= h), val, 0.0)


KERNELS = {
    "cubic": (cubic_w, cubic_dw),
    "poly6": (poly6_w, poly6_dw),
    "spiky": (spiky_w, spiky_dw),
    "viscosity": (viscosity_w, viscosity_dw),
}


def get_kernel(name: str):
    """Return the (W, dW/dr) pair for a kernel name."""
    try:
        return KERNELS[name]
    except KeyError:
        raise KeyError(
            f"unknown SPH kernel {name!r}; available: {sorted(KERNELS)}"
        ) from None


def grad_from_dpos(dpos, h, dim: int, dw_fn=cubic_dw):
    """Kernel gradient with respect to the first point of ``dpos = p_i - p_j``.

    Mirrors ``Kernel::apply_diff`` (`kernel.rs:19-26`): the gradient is
    ``dir(dpos) * dW/dr(|dpos|)`` with a zero gradient when ``|dpos|`` is
    below f32 epsilon (in particular for the self-contact r = 0).

    dpos: [..., dim]; returns ([...], [..., dim]) = (r, gradient).
    """
    r2 = jnp.sum(dpos * dpos, axis=-1)
    r = jnp.sqrt(r2)
    safe_r = jnp.where(r > EPSILON, r, 1.0)
    dw = dw_fn(r, h, dim)
    grad = dpos * (jnp.where(r > EPSILON, dw / safe_r, 0.0))[..., None]
    return r, grad


# --- Akinci 2013 surface-tension kernels -----------------------------------


def cohesion_kernel(r, h, dim: int):
    """Akinci 2013 cohesion kernel C(r)
    (`akinci2013_surface_tension.rs:71-88`, including the reference's 2D
    normalizer choice)."""
    if dim == 2:
        normalizer = 32.0 / (math.pi * h**8)
    else:
        normalizer = 32.0 / (math.pi * h**9)
    h_r = h - r
    hr3 = h_r * h_r * h_r
    r3 = r * r * r
    near = 2.0 * hr3 * r3 - (h**6) / 64.0
    far = hr3 * r3
    coeff = jnp.where(r <= h * 0.5, near, jnp.where(r <= h, far, 0.0))
    return normalizer * coeff


def adhesion_kernel(r, h, dim: int):
    """Akinci 2013 boundary adhesion kernel A(r)
    (`akinci2013_surface_tension.rs:90-111`)."""
    if dim == 2:
        normalizer = 0.007 / h**2.25
    else:
        normalizer = 0.007 / h**3.25
    inner = jnp.maximum(-4.0 * r * r / h + 6.0 * r - 2.0 * h, 0.0)
    coeff = inner**0.25
    return jnp.where((r > h * 0.5) & (r <= h), normalizer * coeff, 0.0)
