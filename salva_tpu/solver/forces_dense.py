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
    dt: jnp.ndarray
    inv_dt: jnp.ndarray
    kernel_density: str
    kernel_gradient: str
    # Domain decomposition (parallel/domain.py): ghost-layer exchange for
    # per-force intermediates computed on owned cells but read at j
    # (e.g. Akinci normals, He2014 color gradients). None single-device.
    halo: object = None
    # Slot-ownership mask under domain decomposition ([1, C] bool; owned
    # layers True) for global mean-error rules inside iterative forces.
    interior: object = None


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
            from .dense_common import w_dwr

            return w_dwr(r2, f.h, f.dim, kg_w, kg_dw)[1]

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
            # Shared fused evaluation (cubic fast path: one sqrt + one
            # rsqrt per pair slot instead of sqrt + two divides).
            from .dense_common import w_dwr

            return w_dwr(r2, f.h, f.dim, kg_w, kg_dw)[1]

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

        if f.halo is not None:
            # Normals at ghost columns saw half a neighborhood; pass 2
            # reads n_j, so refresh from the owning devices.
            N = f.halo.exchange(N)

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
            # Shared fused evaluation (cubic fast path: one sqrt + one
            # rsqrt per pair slot instead of sqrt + two divides).
            from .dense_common import w_dwr

            return w_dwr(r2, f.h, f.dim, kg_w, kg_dw)[1]

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

        if f.halo is not None:
            colors = f.halo.exchange(colors)

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
        if f.halo is not None:
            gradcs = f.halo.exchange(gradcs)

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


@dataclasses.dataclass(frozen=True)
class ParticleWiseForce:
    """Dense-substep adapter for forces evaluated in particle layout.

    Becker elasticity reads only positions and its *static* rest-contact
    table (`becker2009_elasticity.rs:268-334`) — no spatial search — so
    inside the dense substep it runs directly on the particle arrays via
    ``force.apply_particles(fluids, es, dim)`` and its acceleration is
    scattered into the grid once. This keeps elastic fluids on the dense
    fast path instead of dragging the whole scene onto the gather layout.
    """

    force: object


def to_dense_force(force) -> Optional[object]:
    """Dense counterpart of a gather-layout force config, or None."""
    from .elasticity import Becker2009ElasticityForce
    from .surface_tension import (
        Akinci2013SurfaceTensionForce,
        He2014SurfaceTensionForce,
        WCSPHSurfaceTensionForce,
    )
    from .viscosity import (
        ArtificialViscosityForce,
        DFSPHViscosityForce,
        XSPHViscosityForce,
    )

    if isinstance(force, Becker2009ElasticityForce):
        return ParticleWiseForce(force)
    if isinstance(force, DFSPHViscosityForce):
        return DFSPHViscosityDense(
            force.viscosity_coefficients,
            force.participating,
            force.min_viscosity_iter,
            force.max_viscosity_iter,
            force.max_viscosity_error,
        )
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


@dataclasses.dataclass(frozen=True)
class DFSPHViscosityDense:
    """Dense implicit strain-rate projection viscosity
    (`dfsph_viscosity.rs`; fluid-internal only, `:82-86`).

    Hoisting (positions frozen, w_ij = m_j / (2 rho_i) restricted to
    same-fluid participating pairs; G(g) is the [S, dim] strain operator
    with S(g, v) = G(g) . v, identical to the gather path's
    ``_gradient_matrix``):

    - per-substep: ``Msum_i = sum_j w G_ij`` [S, dim] (both the
      v_i'-term of the strain rate and the beta normal-equation ``gsum``),
      ``sq_i = sum_j (w G)(w G)^T / rho_i`` [S, S], and
      ``Nsum_i = sum_j vol_j G_ij^T`` [dim, S] (the u_i term of the
      force update, `dfsph_viscosity.rs:293-333` i-side);
    - per iteration: one S-channel pass ``TS_i = sum_j w G_ij v_j'`` for
      the strain rate and one dim-channel pass
      ``U_i = sum_j vol_j G_ij^T u_j`` for the update.
    """

    viscosity_coefficients: Tuple[float, ...]
    participating: Tuple[int, ...]
    min_viscosity_iter: int = 1
    max_viscosity_iter: int = 50
    max_viscosity_error: float = 0.01

    def apply(self, f: DenseFields):
        import jax

        dim = f.dim
        S = 3 if dim == 2 else 6
        kg_w, kg_dw = get_kernel(f.kernel_gradient)
        nu = per_slot(self.viscosity_coefficients, f.FID)
        part = per_slot(tuple(float(v) for v in self.participating), f.FID)
        rho = jnp.maximum(f.RHO, EPSILON)

        def dwr_of(r2):
            # Shared fused evaluation (cubic fast path: one sqrt + one
            # rsqrt per pair slot instead of sqrt + two divides).
            from .dense_common import w_dwr

            return w_dwr(r2, f.h, f.dim, kg_w, kg_dw)[1]

        def g_rows(g):
            """Rows of G(g): list of S lists of dim entries
            (`dfsph_viscosity.rs:59-82`)."""
            z = jnp.zeros_like(g[0])
            if dim == 2:
                return [
                    [2.0 * g[0], z],
                    [z, 2.0 * g[1]],
                    [g[1], g[0]],
                ]
            return [
                [2.0 * g[0], z, z],
                [z, 2.0 * g[1], z],
                [z, z, 2.0 * g[2]],
                [g[1], g[0], z],
                [g[2], z, g[0]],
                [z, g[2], g[1]],
            ]

        # --- per-substep hoists --------------------------------------------
        shape = f.maskf.shape
        Msum = jnp.zeros((S, dim) + shape, jnp.float32)
        Sq = jnp.zeros((S, S) + shape, jnp.float32)
        Nsum = jnp.zeros((dim, S) + shape, jnp.float32)
        for dpos, r2, within, j in _pairs(
            f, "ff", {"m": f.M, "vol": f.VOL, "fid": f.FID}
        ):
            dwr = dwr_of(r2)
            ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
            okf = jnp.where(ok, 1.0, 0.0) * part[:, None, :]
            g = [dpos[d] * dwr for d in range(dim)]
            rows = g_rows(g)
            w_pair = j["m"][None, :, :] / (2.0 * rho[:, None, :]) * okf
            vol_pair = j["vol"][None, :, :] * okf
            # wG [S, dim] per pair, reduced over j.
            wG = [[rows[s][d] * w_pair for d in range(dim)] for s in range(S)]
            Msum = Msum + jnp.stack(
                [jnp.stack([jnp.sum(wG[s][d], axis=1) for d in range(dim)])
                 for s in range(S)]
            )
            # (wG)(wG)^T / rho_i, reduced over j.
            Sq = Sq + jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.sum(
                                sum(wG[s][d] * wG[t][d] for d in range(dim)),
                                axis=1,
                            )
                            / rho
                            for t in range(S)
                        ]
                    )
                    for s in range(S)
                ]
            )
            Nsum = Nsum + jnp.stack(
                [
                    jnp.stack(
                        [jnp.sum(rows[s][d] * vol_pair, axis=1)
                         for s in range(S)]
                    )
                    for d in range(dim)
                ]
            )

        # Beta: diag-preconditioned inverse of (Sq + Msum Msum^T / rho)
        # (`dfsph_viscosity.rs:130-197`).
        denom = Sq + jnp.einsum("sd...,td...->st...", Msum, Msum) / rho[None, None]
        D = jnp.moveaxis(denom, (0, 1), (-2, -1))  # [cap, C, S, S]
        diag = jnp.diagonal(D, axis1=-2, axis2=-1)
        inv_diag = jnp.where(
            jnp.abs(diag) < 1.0e-6, 1.0,
            1.0 / jnp.where(diag == 0, 1.0, diag),
        )
        Dp = D * inv_diag[..., :, None]
        det = jnp.linalg.det(Dp)
        singular = jnp.abs(det) < 1.0e-6
        safe = jnp.where(
            singular[..., None, None], jnp.eye(S, dtype=Dp.dtype), Dp
        )
        beta = jnp.where(singular[..., None, None], 0.0, jnp.linalg.inv(safe))
        beta = beta * inv_diag[..., None, :]  # [cap, C, S, S]

        # --- per-iteration passes ------------------------------------------
        def ts_pass(Vp):
            """TS_i = sum_j w G_ij v_j' [S]."""
            acc = jnp.zeros((S,) + shape, jnp.float32)
            for dpos, r2, within, j in _pairs(
                f, "ff", {"m": f.M, "v": Vp, "fid": f.FID}
            ):
                dwr = dwr_of(r2)
                ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
                w_pair = (
                    jnp.where(ok, 1.0, 0.0) * part[:, None, :]
                    * j["m"][None, :, :] / (2.0 * rho[:, None, :])
                )
                g = [dpos[d] * dwr for d in range(dim)]
                rows = g_rows(g)
                acc = acc + jnp.stack(
                    [
                        jnp.sum(
                            sum(rows[s][d] * j["v"][d][None, :, :]
                                for d in range(dim)) * w_pair,
                            axis=1,
                        )
                        for s in range(S)
                    ]
                )
            return acc

        def u_pass(U):
            """U_i = sum_j vol_j G_ij^T u_j [dim]."""
            acc = jnp.zeros((dim,) + shape, jnp.float32)
            for dpos, r2, within, j in _pairs(
                f, "ff", {"vol": f.VOL, "u": U, "fid": f.FID}
            ):
                dwr = dwr_of(r2)
                ok = within & (f.FID[:, None, :] == j["fid"][None, :, :])
                vol_pair = (
                    jnp.where(ok, 1.0, 0.0) * part[:, None, :]
                    * j["vol"][None, :, :]
                )
                g = [dpos[d] * dwr for d in range(dim)]
                rows = g_rows(g)
                acc = acc + jnp.stack(
                    [
                        jnp.sum(
                            sum(rows[s][d] * j["u"][s][None, :, :]
                                for s in range(S)) * vol_pair,
                            axis=1,
                        )
                        for d in range(dim)
                    ]
                )
            return acc

        def strain_rate(accel):
            vp = f.V + accel * f.dt
            ts = ts_pass(vp)
            own = jnp.einsum("sd...,d...->s...", Msum, vp)
            return ts - own

        target = strain_rate(jnp.zeros_like(f.P)) * (1.0 - nu)[None]

        live_part = (f.maskf > 0) & (part > 0)
        if f.interior is not None:
            # Domain decomposition: reduce over owned slots, psum for the
            # reference's GLOBAL mean-error rule.
            live_part = live_part & f.interior
        counts = [
            jnp.sum(jnp.where(live_part & (f.FID == fl), 1.0, 0.0))
            for fl in range(len(self.viscosity_coefficients))
        ]
        if f.halo is not None:
            counts = [f.halo.psum(c) for c in counts]

        def mean_err(err_vec):
            contrib = jnp.sum(jnp.abs(err_vec), axis=0) / 6.0
            err = jnp.zeros((), jnp.float32)
            for fl, cnt in enumerate(counts):
                s = jnp.sum(
                    jnp.where(live_part & (f.FID == fl), contrib, 0.0)
                )
                if f.halo is not None:
                    s = f.halo.psum(s)
                err = jnp.maximum(
                    err, jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)
                )
            return err

        def body(carry):
            i, accel, _, _ = carry
            if f.halo is not None:
                # ts_pass reads (V + accel dt) at j: refresh the ghost
                # layers of the iterate before each strain evaluation.
                accel = f.halo.exchange(accel)
            err_vec = strain_rate(accel) - target
            err = mean_err(err_vec)
            converged = (err <= self.max_viscosity_error) & (
                i >= self.min_viscosity_iter
            )

            def update(a):
                ev = jnp.moveaxis(err_vec, 0, -1)  # [cap, C, S]
                u = jnp.einsum("...st,...t->...s", beta, ev)
                u = jnp.moveaxis(u, -1, 0) / (rho * rho)[None]  # [S, cap, C]
                if f.halo is not None:
                    # u is valid on owned cells (beta/err_vec are);
                    # u_pass reads u at j.
                    u = f.halo.exchange(u)
                upass = u_pass(u)
                own = jnp.einsum("ds...,s...->d...", Nsum, u)
                contrib = (own + upass) * (f.R0 * 0.5)[None]
                return a + contrib * (f.VOL * f.R0)[None] * f.inv_dt

            accel = jax.lax.cond(converged, lambda a: a, update, accel)
            return i + 1, accel, err, converged

        def cond(carry):
            i, _, _, done = carry
            return (i < self.max_viscosity_iter) & jnp.logical_not(done)

        _, accel, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), jnp.zeros_like(f.P),
             jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
        )
        return accel, None
