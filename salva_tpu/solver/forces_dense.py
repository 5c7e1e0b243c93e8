"""Dense-layout non-pressure forces.

Gather-free counterparts of the ``[N, K]`` force implementations in
``viscosity.py`` — same physics (XSPH `xsph_viscosity.rs:30-97`, Monaghan
artificial viscosity `artificial_viscosity.rs:40-125`), computed as one
dense pair pass over the shifted cell views. Each force runs once per
substep inside ``dfsph_dense.build_dense_substep``.

Interface: ``apply(f: DenseFields) -> (accel [D, capf, C],
boundary_forces [D, capb, C] | None)``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..geometry import dense_grid as dg
from ..kernels import get_kernel

EPSILON = float(jnp.finfo(jnp.float32).eps)


class DenseFields(NamedTuple):
    """Everything a dense force can read (positions frozen, velocities =
    post-divergence committed velocities, exactly like the gather path's
    StepContext at predict_advection time)."""

    spec_f: dg.DenseGridSpec
    spec_b: dg.DenseGridSpec
    P: jnp.ndarray  # [D, capf, C]
    V: jnp.ndarray  # [D, capf, C]
    M: jnp.ndarray  # [capf, C]
    VOL: jnp.ndarray  # [capf, C] particle volumes
    R0: jnp.ndarray  # [capf, C]
    RHO: jnp.ndarray  # [capf, C] densities
    FID: jnp.ndarray  # [capf, C] int32
    maskf: jnp.ndarray  # [capf, C]
    Pb: jnp.ndarray  # [D, capb, C]
    Vbvel: jnp.ndarray  # [D, capb, C]
    Volb: jnp.ndarray  # [capb, C]
    maskb: jnp.ndarray  # [capb, C]
    h: float
    dim: int
    inv_dt: jnp.ndarray
    kernel_density: str
    kernel_gradient: str


def per_slot(values: Tuple[float, ...], FID):
    """Per-fluid coefficient tuple -> per-slot grid (static unrolled)."""
    out = jnp.zeros_like(FID, dtype=jnp.float32)
    for fid, v in enumerate(values):
        if v != 0.0:
            out = jnp.where(FID == fid, jnp.float32(v), out)
    return out


def _pairs(spec, dim, h, pos_i, mask_i, pos_j, mask_j, j_arrays):
    """Yield (dpos, r2, within, shifted_j) for each neighbor offset."""
    h2 = h * h
    for off in dg.neighbor_offsets(dim):
        pj = dg.shift_j(spec, pos_j, off)
        mj = dg.shift_j(spec, mask_j, off)
        j = {k: dg.shift_j(spec, v, off) for k, v in j_arrays.items()}
        dpos = [pos_i[d][:, None, :] - pj[d][None, :, :] for d in range(dim)]
        r2 = dpos[0] * dpos[0]
        for d in range(1, dim):
            r2 = r2 + dpos[d] * dpos[d]
        within = (r2 <= h2) & (mask_i[:, None, :] > 0) & (mj[None, :, :] > 0)
        yield dpos, r2, within, j


@dataclasses.dataclass(frozen=True)
class XSPHViscosityDense:
    """Dense XSPH velocity smoothing (`xsph_viscosity.rs:30-97`)."""

    fluid_coefficients: Tuple[float, ...]
    boundary_coefficients: Tuple[float, ...]

    def apply(self, f: DenseFields):
        kd_w, _ = get_kernel(f.kernel_density)
        coeff = per_slot(self.fluid_coefficients, f.FID)
        bcoeff = per_slot(self.boundary_coefficients, f.FID)
        dvel = jnp.zeros_like(f.P)

        # Fluid part: same-fluid smoothing toward neighbor velocities.
        for dpos, r2, within, j in _pairs(
            f.spec_f, f.dim, f.h, f.P, f.maskf, f.P, f.maskf,
            {"v": f.V, "vol": f.VOL, "rho": f.RHO, "fid": f.FID},
        ):
            w = kd_w(jnp.sqrt(r2), f.h, f.dim)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            factor = jnp.where(
                ok,
                coeff[:, None, :] * w * j["vol"][None, :, :]
                * f.R0[:, None, :] / jnp.maximum(j["rho"][None, :, :], EPSILON),
                0.0,
            )
            dvel = dvel + jnp.stack(
                [
                    jnp.sum(factor * (j["v"][d][None, :, :] - f.V[d][:, None, :]),
                            axis=1)
                    for d in range(f.dim)
                ]
            )

        # Boundary part: smooth toward boundary velocities.
        any_b = any(v != 0.0 for v in self.boundary_coefficients)
        if any_b:
            for dpos, r2, within, j in _pairs(
                f.spec_f, f.dim, f.h, f.P, f.maskf, f.Pb, f.maskb,
                {"vb": f.Vbvel, "vol": f.Volb},
            ):
                w = kd_w(jnp.sqrt(r2), f.h, f.dim)
                factor = jnp.where(
                    within,
                    bcoeff[:, None, :] * w * j["vol"][None, :, :]
                    * f.R0[:, None, :] / jnp.maximum(f.RHO[:, None, :], EPSILON),
                    0.0,
                )
                dvel = dvel + jnp.stack(
                    [
                        jnp.sum(factor * (j["vb"][d][None, :, :]
                                          - f.V[d][:, None, :]), axis=1)
                        for d in range(f.dim)
                    ]
                )
            # Equal-and-opposite boundary feedback (owner = boundary).
            ci = bcoeff * f.R0 / jnp.maximum(f.RHO, EPSILON) * f.M * f.inv_dt
            Fb = jnp.zeros_like(f.Pb)
            for dpos, r2, within, j in _pairs(
                f.spec_b, f.dim, f.h, f.Pb, f.maskb, f.P, f.maskf,
                {"ci": ci, "v": f.V},
            ):
                w = kd_w(jnp.sqrt(r2), f.h, f.dim)
                factor = jnp.where(within, w * j["ci"][None, :, :], 0.0)
                Fb = Fb - jnp.stack(
                    [
                        jnp.sum(factor * f.Volb[:, None, :]
                                * (f.Vbvel[d][:, None, :]
                                   - j["v"][d][None, :, :]), axis=1)
                        for d in range(f.dim)
                    ]
                )
        else:
            Fb = None

        return dvel * f.inv_dt, Fb


@dataclasses.dataclass(frozen=True)
class ArtificialViscosityDense:
    """Dense Monaghan artificial viscosity
    (`artificial_viscosity.rs:40-125`; approaching pairs only)."""

    fluid_coefficients: Tuple[float, ...]
    boundary_coefficients: Tuple[float, ...]
    alphas: Tuple[float, ...]
    betas: Tuple[float, ...]
    speeds_of_sound: Tuple[float, ...]

    def apply(self, f: DenseFields):
        kg_w, kg_dw = get_kernel(f.kernel_gradient)
        coeff = per_slot(self.fluid_coefficients, f.FID)
        bcoeff = per_slot(self.boundary_coefficients, f.FID)
        alpha = per_slot(self.alphas, f.FID)
        beta = per_slot(self.betas, f.FID)
        sos = per_slot(self.speeds_of_sound, f.FID)
        eta2 = f.h * f.h * 0.01
        accel = jnp.zeros_like(f.P)

        def grad_scale(r2):
            r = jnp.sqrt(r2)
            safe = jnp.where(r > EPSILON, r, 1.0)
            return jnp.where(r > EPSILON, kg_dw(r, f.h, f.dim) / safe, 0.0)

        # Fluid-fluid (same fluid, v.r < 0).
        for dpos, r2, within, j in _pairs(
            f.spec_f, f.dim, f.h, f.P, f.maskf, f.P, f.maskf,
            {"v": f.V, "vol": f.VOL, "rho": f.RHO, "fid": f.FID},
        ):
            dwr = grad_scale(r2)
            vr = jnp.zeros_like(r2)
            for d in range(f.dim):
                vr = vr + dpos[d] * (f.V[d][:, None, :] - j["v"][d][None, :, :])
            rho_avg = (f.RHO[:, None, :] + j["rho"][None, :, :]) * 0.5
            mu = f.h * vr / (r2 + eta2)
            visc = sos[:, None, :] * alpha[:, None, :] * mu \
                - beta[:, None, :] * mu * mu
            ok = within & (vr < 0.0) \
                & (f.FID[:, None, :] == j["fid"][None, :, :])
            scale = jnp.where(
                ok,
                coeff[:, None, :] * visc * j["vol"][None, :, :]
                * f.R0[:, None, :] / jnp.maximum(rho_avg, EPSILON),
                0.0,
            )
            accel = accel + jnp.stack(
                [jnp.sum(dpos[d] * dwr * scale, axis=1) for d in range(f.dim)]
            )

        any_b = any(v != 0.0 for v in self.boundary_coefficients)
        Fb = None
        if any_b:
            # Fluid-boundary term.
            for dpos, r2, within, j in _pairs(
                f.spec_f, f.dim, f.h, f.P, f.maskf, f.Pb, f.maskb,
                {"vb": f.Vbvel, "vol": f.Volb},
            ):
                dwr = grad_scale(r2)
                vr = jnp.zeros_like(r2)
                for d in range(f.dim):
                    vr = vr + dpos[d] * (
                        f.V[d][:, None, :] - j["vb"][d][None, :, :]
                    )
                mu = f.h * vr / (r2 + eta2)
                visc = sos[:, None, :] * alpha[:, None, :] * mu \
                    - beta[:, None, :] * mu * mu
                scale = jnp.where(
                    within & (vr < 0.0),
                    bcoeff[:, None, :] * visc * j["vol"][None, :, :]
                    * f.R0[:, None, :]
                    / jnp.maximum(f.RHO[:, None, :], EPSILON),
                    0.0,
                )
                accel = accel + jnp.stack(
                    [jnp.sum(dpos[d] * dwr * scale, axis=1)
                     for d in range(f.dim)]
                )
            # Feedback (owner = boundary): contrib = -m_i * delta.
            ci_common = bcoeff * f.R0 / jnp.maximum(f.RHO, EPSILON) * f.M
            ci_visc_a = sos * alpha
            Fb = jnp.zeros_like(f.Pb)
            for dpos, r2, within, j in _pairs(
                f.spec_b, f.dim, f.h, f.Pb, f.maskb, f.P, f.maskf,
                {"c": ci_common, "sa": ci_visc_a, "b": beta, "v": f.V},
            ):
                dwr = grad_scale(r2)
                # dpos = p_b - p_i; fluid-frame r_ib = -dpos, v_ib = v_i - vb.
                vr = jnp.zeros_like(r2)
                for d in range(f.dim):
                    vr = vr + (-dpos[d]) * (
                        j["v"][d][None, :, :] - f.Vbvel[d][:, None, :]
                    )
                mu = f.h * vr / (r2 + eta2)
                visc = j["sa"][None, :, :] * mu - j["b"][None, :, :] * mu * mu
                scale = jnp.where(
                    within & (vr < 0.0),
                    j["c"][None, :, :] * visc * f.Volb[:, None, :],
                    0.0,
                )
                # grad_ij (w.r.t. fluid i) = -dpos * dwr; contrib to b = -m_i*grad*scale
                Fb = Fb + jnp.stack(
                    [jnp.sum(dpos[d] * dwr * scale, axis=1)
                     for d in range(f.dim)]
                )
        return accel, Fb


def to_dense_force(force) -> Optional[object]:
    """Dense counterpart of a gather-layout force config, or None."""
    from .viscosity import ArtificialViscosityForce, XSPHViscosityForce

    if isinstance(force, XSPHViscosityForce):
        return XSPHViscosityDense(
            force.fluid_coefficients, force.boundary_coefficients
        )
    if isinstance(force, ArtificialViscosityForce):
        return ArtificialViscosityDense(
            force.fluid_coefficients,
            force.boundary_coefficients,
            force.alphas,
            force.betas,
            force.speeds_of_sound,
        )
    return None


def to_dense_forces(force_set) -> Optional[Tuple]:
    """Convert a whole ForceSet, or None if any member is unsupported."""
    out = []
    for force in force_set:
        dense = to_dense_force(force)
        if dense is None:
            return None
        out.append(dense)
    return tuple(out)
