"""Becker 2009 corotated SPH elasticity.

Re-design of ``src/solver/elasticity/becker2009_elasticity.rs``: rest-state
capture (rest positions, rest contact table, rest volumes) happens once at
world build; each solve extracts per-particle rotations by batched polar
decomposition, forms corotated (linear or Green) strain -> stress in the
symmetric ``SpatialVector`` layout, and accumulates the symmetrized pair
forces over the *rest* contact table.

Rotation extraction: the reference warm-starts nalgebra's iterative
``Rotation::from_matrix_eps`` (20 iters, `:115-137`); here we use a
batched SVD polar decomposition (exact, no warm start needed) with a
reflection fix and an identity fallback for degenerate APQ matrices.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .common import StepContext


@struct.dataclass
class ElasticityState:
    """Persistent rest-state data over the merged particle array.

    ``rest_j/rest_valid/rest_w/rest_grad``: the rest-configuration contact
    table (the analog of ``compute_self_contacts`` + kernel fill,
    `becker2009_elasticity.rs:95-106`); rows of particles without
    elasticity are empty.
    """

    positions0: jnp.ndarray  # [N, dim]
    volumes0: jnp.ndarray  # [N]
    rest_j: jnp.ndarray  # [N, Ke] int32
    rest_valid: jnp.ndarray  # [N, Ke] bool
    rest_w: jnp.ndarray  # [N, Ke]
    rest_grad: jnp.ndarray  # [N, Ke, dim]

    @property
    def rest_mask(self):
        return self.rest_valid.astype(self.rest_w.dtype)


def build_elasticity_state(
    fluids, rest_contacts, active_mask
) -> ElasticityState:
    """Capture the rest state (`becker2009_elasticity.rs:84-113`).

    ``rest_contacts``: a `Contacts` table evaluated on the rest positions
    restricted to same-fluid pairs of elasticity-carrying fluids.

    Rest volumes replicate the reference's accumulation, where every
    unordered pair is visited twice (once per stored direction) and the
    self-contact's two add-lines double it as well — so
    ``V0_i = m_i / (2 * sum_j m_j W0_ij)``.
    """
    w = rest_contacts.w
    m_j = fluids.masses[rest_contacts.j]
    denom = 2.0 * jnp.sum(m_j * w, axis=1)
    m_i = fluids.masses
    safe = jnp.where(denom > 0.0, denom, 1.0)
    volumes0 = jnp.where(active_mask & (denom > 0.0), m_i / safe, 0.0)
    return ElasticityState(
        positions0=fluids.positions,
        volumes0=volumes0,
        rest_j=rest_contacts.j,
        rest_valid=rest_contacts.valid,
        rest_w=rest_contacts.w,
        rest_grad=rest_contacts.grad,
    )


def _polar_rotation(a, dim: int):
    """Batched rotation factor of [N, dim, dim] matrices via SVD.

    R = U diag(1,..,det(U V^T)) V^T; identity for near-zero matrices.
    """
    norm = jnp.sum(a * a, axis=(-2, -1))
    eye = jnp.eye(dim, dtype=a.dtype)
    safe_a = jnp.where((norm > 1e-12)[:, None, None], a, eye[None])
    u, _, vt = jnp.linalg.svd(safe_a, full_matrices=False)
    det = jnp.linalg.det(jnp.einsum("nij,njk->nik", u, vt))
    fix = jnp.ones((a.shape[0], dim), a.dtype).at[:, -1].set(det)
    r = jnp.einsum("nij,nj,njk->nik", u, fix, vt)
    return jnp.where((norm > 1e-12)[:, None, None], r, eye[None])


def _sym_mat_mul_vec(s, v, dim: int):
    """SpatialVector (symmetric matrix) times vector
    (`becker2009_elasticity.rs:27-38`).

    2D layout: [xx, yy, xy]; 3D layout: [xx, yy, zz, xy, xz, yz].
    """
    if dim == 2:
        return jnp.stack(
            [
                s[..., 0] * v[..., 0] + s[..., 2] * v[..., 1],
                s[..., 2] * v[..., 0] + s[..., 1] * v[..., 1],
            ],
            axis=-1,
        )
    return jnp.stack(
        [
            s[..., 0] * v[..., 0] + s[..., 3] * v[..., 1] + s[..., 4] * v[..., 2],
            s[..., 3] * v[..., 0] + s[..., 1] * v[..., 1] + s[..., 5] * v[..., 2],
            s[..., 4] * v[..., 0] + s[..., 5] * v[..., 1] + s[..., 2] * v[..., 2],
        ],
        axis=-1,
    )


def elasticity_coefficients(young_modulus: float, poisson_ratio: float):
    """(d0, d1, d2) Lamé-like coefficients (`becker2009_elasticity.rs:15-25`)."""
    e, nu = young_modulus, poisson_ratio
    d0 = (e * (1.0 - nu)) / ((1.0 + nu) * (1.0 - 2.0 * nu))
    d1 = (e * nu) / ((1.0 + nu) * (1.0 - 2.0 * nu))
    d2 = (e * (1.0 - 2.0 * nu)) / (2.0 * (1.0 + nu) * (1.0 - 2.0 * nu))
    return d0, d1, d2


# The reference's shear-strain factor: nominally 0.5 but literally 0.564 in
# `compute_stresses` (`becker2009_elasticity.rs:142`). Replicated for parity.
_SHEAR_HALF = 0.564


@dataclasses.dataclass(frozen=True)
class Becker2009ElasticityForce:
    """Corotated linear-FEM-style SPH elasticity.

    ``d0/d1/d2``: per-fluid coefficient tuples from
    :func:`elasticity_coefficients`; ``nonlinear``: per-fluid 0/1 flags for
    Green strain; ``active``: per-fluid 0/1 participation flags.
    """

    d0: Tuple[float, ...]
    d1: Tuple[float, ...]
    d2: Tuple[float, ...]
    nonlinear: Tuple[int, ...]
    active: Tuple[int, ...]
    kind: str = dataclasses.field(default="becker2009_elasticity", init=False)

    def apply(self, ctx: StepContext, es: ElasticityState):
        accel = self.apply_particles(ctx.fluids, es, ctx.dim)
        return accel, jnp.zeros_like(ctx.boundaries.forces)

    def apply_particles(self, fl, es: ElasticityState, dim: int):
        """Particle-layout core: accel [N, dim] from positions + the rest
        contact table only. The rest topology is static (no spatial
        search), so this also runs inside the dense substep, which
        scatters the result into the grid once
        (`becker2009_elasticity.rs:268-334`)."""
        pos = fl.positions
        j = es.rest_j
        mask = es.rest_mask

        def per_fluid(values):
            return jnp.asarray(values, jnp.float32)[fl.fluid_id]

        active_i = per_fluid(self.active)
        d0_i = per_fluid(self.d0)
        d1_i = per_fluid(self.d1)
        d2_i = per_fluid(self.d2)
        nonlin_i = per_fluid(self.nonlinear)

        p_ji = pos[j] - pos[:, None, :]  # [N, Ke, dim]
        p0_ji = es.positions0[j] - es.positions0[:, None, :]

        # Rotations from the APQ shape-matching matrix (`:115-137`).
        coeff = es.rest_w * fl.masses[j] * mask
        a_pq = jnp.einsum("nk,nkd,nke->nde", coeff, p_ji, p0_ji)
        rot = _polar_rotation(a_pq, dim)  # [N, dim, dim]

        # Deformation gradient transpose (`:139-195`):
        # u_ji = R_i^-1 p_ji - p0_ji; grad_tr = sum (grad0 V0_j) u_ji^T.
        u_ji = jnp.einsum("ned,nke->nkd", rot, p_ji) - p0_ji  # R^T p - p0
        gv = es.rest_grad * (es.volumes0[j] * mask)[..., None]
        grad_tr = jnp.einsum("nkd,nke->nde", gv, u_ji)  # [N, dim, dim]

        # Strain -> stress in SpatialVector layout (`:196-262`).
        eye = jnp.eye(dim, dtype=pos.dtype)
        jmat = grad_tr + eye[None]
        jjt = jnp.einsum("nde,nfe->ndf", jmat, jmat)

        def top_left(v_diag):
            # C_top_left @ diag-strain with C = [[d0, d1, ...], ...].
            s = jnp.sum(v_diag, axis=-1, keepdims=True)
            return v_diag * (d0_i - d1_i)[:, None] + s * d1_i[:, None]

        if dim == 2:
            lin_diag = jnp.stack([grad_tr[:, 0, 0], grad_tr[:, 1, 1]], axis=-1)
            lin_shear = (grad_tr[:, 1, 0] + grad_tr[:, 0, 1]) * _SHEAR_HALF * d2_i
            nl_diag = jnp.stack([jjt[:, 0, 0] - 1.0, jjt[:, 1, 1] - 1.0], axis=-1) * _SHEAR_HALF
            nl_shear = jjt[:, 1, 0] * _SHEAR_HALF * d2_i
            diag = jnp.where(nonlin_i[:, None] > 0, top_left(nl_diag), top_left(lin_diag))
            shear = jnp.where(nonlin_i > 0, nl_shear, lin_shear)
            stress = jnp.concatenate([diag, shear[:, None]], axis=-1)  # [N, 3]
        else:
            lin_diag = jnp.stack(
                [grad_tr[:, 0, 0], grad_tr[:, 1, 1], grad_tr[:, 2, 2]], axis=-1
            )
            lin_shear = jnp.stack(
                [
                    grad_tr[:, 1, 0] + grad_tr[:, 0, 1],
                    grad_tr[:, 2, 0] + grad_tr[:, 0, 2],
                    grad_tr[:, 1, 2] + grad_tr[:, 2, 1],
                ],
                axis=-1,
            ) * (_SHEAR_HALF * d2_i[:, None])
            nl_diag = jnp.stack(
                [jjt[:, 0, 0] - 1.0, jjt[:, 1, 1] - 1.0, jjt[:, 2, 2] - 1.0],
                axis=-1,
            ) * _SHEAR_HALF
            nl_shear = jnp.stack(
                [jjt[:, 1, 0], jjt[:, 2, 0], jjt[:, 2, 1]], axis=-1
            ) * (_SHEAR_HALF * d2_i[:, None])
            diag = jnp.where(nonlin_i[:, None] > 0, top_left(nl_diag), top_left(lin_diag))
            shear = jnp.where(nonlin_i[:, None] > 0, nl_shear, lin_shear)
            stress = jnp.concatenate([diag, shear], axis=-1)  # [N, 6]

        # Pair forces over rest contacts (`:268-334`).
        v0_i = es.volumes0
        v0_j = v0_i[j]
        d_ij = es.rest_grad * v0_j[..., None]  # [N, Ke, dim]
        sigma_d_ij = _sym_mat_mul_vec(stress[:, None, :], d_ij, dim)
        extra_i = jnp.einsum("nde,nke->nkd", grad_tr, sigma_d_ij)
        f_ji_lin = sigma_d_ij * (-v0_i[:, None, None])
        f_ji_nl = (sigma_d_ij + extra_i) * (-v0_i[:, None, None])
        f_ji = jnp.where((nonlin_i > 0)[:, None, None], f_ji_nl, f_ji_lin)

        d_ji = es.rest_grad * (-v0_i[:, None, None])
        stress_j = stress[j]
        sigma_d_ji = _sym_mat_mul_vec(stress_j, d_ji, dim)
        grad_tr_j = grad_tr[j]  # [N, Ke, dim, dim]
        extra_j = jnp.einsum("nkde,nke->nkd", grad_tr_j, sigma_d_ji)
        f_ij_lin = sigma_d_ji * (-v0_j[..., None])
        f_ij_nl = (sigma_d_ji + extra_j) * (-v0_j[..., None])
        nonlin_j = nonlin_i[j]
        f_ij = jnp.where((nonlin_j > 0)[..., None], f_ij_nl, f_ij_lin)

        rot_j = rot[j]
        force = (
            jnp.einsum("nkde,nke->nkd", rot_j, f_ij)
            - jnp.einsum("nde,nke->nkd", rot, f_ji)
        ) * 0.5
        m_i = fl.volumes * fl.density0
        safe_m = jnp.where(m_i > 0.0, m_i, 1.0)
        accel = jnp.sum(force * mask[..., None], axis=1) / safe_m[:, None]
        return accel * active_i[:, None]
