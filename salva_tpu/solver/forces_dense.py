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
    StepContext at predict_advection time).

    ``jff``/``jfb``/``jbf``: neighbor-view functions (fluid-fluid,
    fluid-owner/boundary-j, boundary-owner/fluid-j) — rolls in grid mode,
    active-table gathers in compact mode (see ``dense_common``)."""

    jff: object
    jfb: object
    jbf: object
    n_offsets: int
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


def _pairs(f: "DenseFields", which: str, j_arrays):
    """Yield (dpos, r2, within, j_views) for each neighbor view.

    ``which``: "ff" (fluid owner, fluid j), "fb" (fluid owner, boundary
    j), "bf" (boundary owner, fluid j).
    """
    dim, h = f.dim, f.h
    h2 = h * h
    if which == "ff":
        pos_i, mask_i, pos_j, mask_j, jview = f.P, f.maskf, f.P, f.maskf, f.jff
    elif which == "fb":
        pos_i, mask_i, pos_j, mask_j, jview = f.P, f.maskf, f.Pb, f.maskb, f.jfb
    else:
        pos_i, mask_i, pos_j, mask_j, jview = f.Pb, f.maskb, f.P, f.maskf, f.jbf
    for o in range(f.n_offsets):
        pj = jview(pos_j, o)
        mj = jview(mask_j, o)
        j = {k: jview(v, o) for k, v in j_arrays.items()}
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
            f, "ff",
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
                f, "fb", {"vb": f.Vbvel, "vol": f.Volb},
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
                f, "bf", {"ci": ci, "v": f.V},
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
            f, "ff",
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
                f, "fb", {"vb": f.Vbvel, "vol": f.Volb},
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
                f, "bf",
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


@dataclasses.dataclass(frozen=True)
class Akinci2013SurfaceTensionDense:
    """Dense Akinci 2013 cohesion + curvature + boundary adhesion
    (`akinci2013_surface_tension.rs`)."""

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_adhesion_coefficients: Tuple[float, ...]

    def apply(self, f: DenseFields):
        from ..kernels import sph

        kg_w, kg_dw = get_kernel(f.kernel_gradient)
        coeff = per_slot(self.fluid_tension_coefficients, f.FID)
        badh = per_slot(self.boundary_adhesion_coefficients, f.FID)

        def dwr_of(r2):
            r = jnp.sqrt(r2)
            safe = jnp.where(r > EPSILON, r, 1.0)
            return jnp.where(r > EPSILON, kg_dw(r, f.h, f.dim) / safe, 0.0)

        # Pass 1: normals n_i = h sum m_j / rho_j grad (`:43-68`).
        N = jnp.zeros_like(f.P)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"m": f.M, "rho": f.RHO, "fid": f.FID},
        ):
            dwr = dwr_of(r2)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            s = jnp.where(
                ok, j["m"][None, :, :] / jnp.maximum(j["rho"][None, :, :], EPSILON), 0.0
            ) * dwr
            N = N + jnp.stack(
                [f.h * jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
            )

        # Pass 2: cohesion + curvature (`:137-165`).
        accel = jnp.zeros_like(f.P)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"vol": f.VOL, "rho": f.RHO, "fid": f.FID, "n": N},
        ):
            r = jnp.sqrt(r2)
            safe = jnp.where(r > EPSILON, r, 1.0)
            coh_w = sph.cohesion_kernel(r, f.h, f.dim)
            coh_s = jnp.where(
                r > EPSILON,
                -coeff[:, None, :] * j["vol"][None, :, :]
                * f.R0[:, None, :] * coh_w / safe,
                0.0,
            )
            kij = 2.0 * f.R0[:, None, :] / jnp.maximum(
                f.RHO[:, None, :] + j["rho"][None, :, :], EPSILON
            )
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            w_all = jnp.where(ok, kij, 0.0)
            accel = accel + jnp.stack(
                [
                    jnp.sum(
                        (dpos[d] * coh_s
                         - coeff[:, None, :]
                         * (N[d][:, None, :] - j["n"][d][None, :, :]))
                        * w_all,
                        axis=1,
                    )
                    for d in range(f.dim)
                ]
            )

        # Pass 3: boundary adhesion (`:167-190`).
        any_b = any(v != 0.0 for v in self.boundary_adhesion_coefficients)
        Fb = None
        if any_b:
            for dpos, r2, within, j in _pairs(
                f, "fb", {"vol": f.Volb},
            ):
                r = jnp.sqrt(r2)
                safe = jnp.where(r > EPSILON, r, 1.0)
                adh = sph.adhesion_kernel(r, f.h, f.dim)
                s = jnp.where(
                    within & (r > EPSILON),
                    badh[:, None, :] * j["vol"][None, :, :]
                    * f.R0[:, None, :] * adh / safe,
                    0.0,
                )
                accel = accel - jnp.stack(
                    [jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
                )
            # Feedback (owner = boundary): F_b += sum_i adh_acc_i * m_i.
            ci = badh * f.R0 * f.M
            Fb = jnp.zeros_like(f.Pb)
            for dpos, r2, within, j in _pairs(
                f, "bf", {"c": ci},
            ):
                r = jnp.sqrt(r2)
                safe = jnp.where(r > EPSILON, r, 1.0)
                adh = sph.adhesion_kernel(r, f.h, f.dim)
                s = jnp.where(
                    within & (r > EPSILON),
                    j["c"][None, :, :] * f.Volb[:, None, :] * adh / safe,
                    0.0,
                )
                # dir from i to b as seen from owner b: -dpos (dpos = pb-pi).
                Fb = Fb - jnp.stack(
                    [jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
                )
        return accel, Fb


@dataclasses.dataclass(frozen=True)
class WCSPHSurfaceTensionDense:
    """Dense WCSPH position-difference cohesion
    (`wcsph_surface_tension.rs`; boundary loop fixed as in the gather
    implementation)."""

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_tension_coefficients: Tuple[float, ...]

    def apply(self, f: DenseFields):
        kd_w, _ = get_kernel(f.kernel_density)
        coeff = per_slot(self.fluid_tension_coefficients, f.FID)
        bcoeff = per_slot(self.boundary_tension_coefficients, f.FID)
        safe_vol = jnp.where(f.VOL > 0, f.VOL, 1.0)
        accel = jnp.zeros_like(f.P)

        for dpos, r2, within, j in _pairs(
            f, "ff", {"vol": f.VOL, "fid": f.FID},
        ):
            w = kd_w(jnp.sqrt(r2), f.h, f.dim)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            scale = jnp.where(
                ok,
                -coeff[:, None, :] * w * j["vol"][None, :, :]
                / safe_vol[:, None, :],
                0.0,
            )
            accel = accel + jnp.stack(
                [jnp.sum(dpos[d] * scale, axis=1) for d in range(f.dim)]
            )

        any_b = any(v != 0.0 for v in self.boundary_tension_coefficients)
        Fb = None
        if any_b:
            safe_m = jnp.where(f.M > 0, f.M, 1.0)
            for dpos, r2, within, j in _pairs(
                f, "fb", {"vol": f.Volb},
            ):
                w = kd_w(jnp.sqrt(r2), f.h, f.dim)
                scale = jnp.where(
                    within,
                    bcoeff[:, None, :] * w * j["vol"][None, :, :]
                    * f.R0[:, None, :],
                    0.0,
                )
                accel = accel - jnp.stack(
                    [jnp.sum(dpos[d] * scale, axis=1) / safe_m
                     for d in range(f.dim)]
                )
            ci = bcoeff * f.R0
            Fb = jnp.zeros_like(f.Pb)
            for dpos, r2, within, j in _pairs(
                f, "bf", {"c": ci},
            ):
                w = kd_w(jnp.sqrt(r2), f.h, f.dim)
                scale = jnp.where(
                    within, j["c"][None, :, :] * f.Volb[:, None, :] * w, 0.0
                )
                # forceb in fluid frame used dposb = p_i - p_b = -dpos here.
                Fb = Fb - jnp.stack(
                    [jnp.sum(dpos[d] * scale, axis=1) for d in range(f.dim)]
                )
        return accel, Fb


@dataclasses.dataclass(frozen=True)
class He2014SurfaceTensionDense:
    """Dense He 2014 color-field surface tension
    (`he2014_surface_tension.rs`)."""

    fluid_tension_coefficients: Tuple[float, ...]
    boundary_tension_coefficients: Tuple[float, ...]

    def apply(self, f: DenseFields):
        kd_w, _ = get_kernel(f.kernel_density)
        kg_w, kg_dw = get_kernel(f.kernel_gradient)
        coeff = per_slot(self.fluid_tension_coefficients, f.FID)
        bcoeff = per_slot(self.boundary_tension_coefficients, f.FID)

        def dwr_of(r2):
            r = jnp.sqrt(r2)
            safe = jnp.where(r > EPSILON, r, 1.0)
            return jnp.where(r > EPSILON, kg_dw(r, f.h, f.dim) / safe, 0.0)

        vol_over_rho = f.M / jnp.maximum(f.RHO, EPSILON)

        # Pass 1: colors (`:40-75`).
        colors = jnp.zeros_like(f.maskf)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"vr": vol_over_rho, "fid": f.FID},
        ):
            w = kd_w(jnp.sqrt(r2), f.h, f.dim)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            colors = colors + jnp.sum(
                jnp.where(ok, w * j["vr"][None, :, :], 0.0), axis=1
            )
        for dpos, r2, within, j in _pairs(f, "fb", {"vol": f.Volb}):
            w = kd_w(jnp.sqrt(r2), f.h, f.dim)
            colors = colors + jnp.sum(
                jnp.where(within, w * j["vol"][None, :, :], 0.0), axis=1
            )

        # Pass 2: |grad c|^2 (`:77-105`).
        safe_colors = jnp.where(jnp.abs(colors) > 0, colors, 1.0)
        gradc = jnp.zeros_like(f.P)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"vr": vol_over_rho, "c": colors, "fid": f.FID},
        ):
            dwr = dwr_of(r2)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            s = jnp.where(ok, j["c"][None, :, :] * j["vr"][None, :, :], 0.0) * dwr
            gradc = gradc + jnp.stack(
                [jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
            )
        gradc = gradc / safe_colors[None]
        gradcs = jnp.sum(gradc * gradc, axis=0)

        # Pass 3: fluid force (`:138-158`).
        m_over_rho = f.M / jnp.maximum(f.RHO, EPSILON)
        safe_m = jnp.where(f.M > 0, f.M, 1.0)
        accel = jnp.zeros_like(f.P)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"mr": m_over_rho, "g": gradcs, "fid": f.FID},
        ):
            dwr = dwr_of(r2)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            s = jnp.where(
                ok,
                m_over_rho[:, None, :] * j["mr"][None, :, :]
                * (gradcs[:, None, :] + j["g"][None, :, :]) * 0.5,
                0.0,
            ) * dwr
            accel = accel + jnp.stack(
                [jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
            )
        accel = accel * (coeff / (2.0 * safe_m))[None]

        # Pass 4: boundary force (`:160-178`) + feedback.
        any_b = any(v != 0.0 for v in self.boundary_tension_coefficients)
        Fb = None
        if any_b:
            for dpos, r2, within, j in _pairs(
                f, "fb", {"vol": f.Volb},
            ):
                dwr = dwr_of(r2)
                s = jnp.where(
                    within,
                    (f.M / jnp.maximum(f.RHO, EPSILON))[:, None, :]
                    * j["vol"][None, :, :] * gradcs[:, None, :]
                    * bcoeff[:, None, :] * 0.25,
                    0.0,
                ) * dwr
                accel = accel + jnp.stack(
                    [jnp.sum(dpos[d] * s, axis=1) / safe_m
                     for d in range(f.dim)]
                )
            ci = (f.M / jnp.maximum(f.RHO, EPSILON)) * gradcs * bcoeff * 0.25
            Fb = jnp.zeros_like(f.Pb)
            for dpos, r2, within, j in _pairs(
                f, "bf", {"c": ci},
            ):
                dwr = dwr_of(r2)
                s = jnp.where(within, j["c"][None, :, :] * f.Volb[:, None, :], 0.0) * dwr
                # fb_f in fluid frame = grad_i * s = -dpos*dwr*s (dpos here
                # is p_b - p_i); feedback = -fb_f = +dpos*dwr*s.
                Fb = Fb + jnp.stack(
                    [jnp.sum(dpos[d] * s, axis=1) for d in range(f.dim)]
                )
        return accel, Fb


def to_dense_force(force) -> Optional[object]:
    """Dense counterpart of a gather-layout force config, or None."""
    from .surface_tension import (
        Akinci2013SurfaceTensionForce,
        He2014SurfaceTensionForce,
        WCSPHSurfaceTensionForce,
    )
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
    if isinstance(force, Akinci2013SurfaceTensionForce):
        return Akinci2013SurfaceTensionDense(
            force.fluid_tension_coefficients,
            force.boundary_adhesion_coefficients,
        )
    if isinstance(force, WCSPHSurfaceTensionForce):
        return WCSPHSurfaceTensionDense(
            force.fluid_tension_coefficients,
            force.boundary_tension_coefficients,
        )
    if isinstance(force, He2014SurfaceTensionForce):
        return He2014SurfaceTensionDense(
            force.fluid_tension_coefficients,
            force.boundary_tension_coefficients,
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
