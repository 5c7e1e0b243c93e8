"""Shared machinery of the dense-layout pressure solvers.

Binning, pair folds over shifted cell views, the per-substep hoisted sums
(density, gradient sums, gradient norms, boundary terms, contact counts)
and the per-iteration pair passes shared by dense DFSPH and dense IISPH.

Physics contract identical to ``common.py`` / the reference
(``dfsph_solver.rs``, ``iisph_solver.rs``); see ``dfsph_dense.py`` for the
hoisting derivation.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..config import SimConfig
from ..geometry import dense_grid as dg
from ..kernels import get_kernel

EPSILON = float(jnp.finfo(jnp.float32).eps)


def pair_fold(spec_j: dg.DenseGridSpec, dim: int, h, pos_i, mask_i,
              pos_j, mask_j, j_arrays: Dict, body, init):
    """Fold ``body(acc, dpos, r2, within, j) -> acc`` over all 3^dim
    shifted pair blocks (see ``dense_grid`` for layout/correctness)."""
    acc = init
    h2 = h * h
    for off in dg.neighbor_offsets(dim):
        pj = dg.shift_j(spec_j, pos_j, off)
        mj = dg.shift_j(spec_j, mask_j, off)
        j = {k: dg.shift_j(spec_j, v, off) for k, v in j_arrays.items()}
        dpos = [pos_i[d][:, None, :] - pj[d][None, :, :] for d in range(dim)]
        r2 = dpos[0] * dpos[0]
        for d in range(1, dim):
            r2 = r2 + dpos[d] * dpos[d]
        within = (r2 <= h2) & (mask_i[:, None, :] > 0) & (mj[None, :, :] > 0)
        acc = body(acc, dpos, r2, within, j)
    return acc


def w_dwr(r2, h, dim, w_fn, dw_fn):
    """(W, dW/dr / r) with the r ~ 0 gradient cutoff (`kernel.rs:19-26`)."""
    r = jnp.sqrt(r2)
    w = w_fn(r, h, dim)
    safe_r = jnp.where(r > EPSILON, r, 1.0)
    dwr = jnp.where(r > EPSILON, dw_fn(r, h, dim) / safe_r, 0.0)
    return w, dwr


def per_fluid_mean_max_grid(values, fid, mask, num_fluids: int):
    """`per_fluid_mean_max` on grid layout (static loop over fluids)."""
    err = jnp.zeros((), jnp.float32)
    live = mask > 0
    for f in range(num_fluids):
        sel = live & (fid == f)
        s = jnp.sum(jnp.where(sel, values, 0.0))
        cnt = jnp.sum(sel.astype(jnp.float32))
        err = jnp.maximum(err, jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0))
    return err


class DenseCtx:
    """Per-substep binned state + hoisted sums (positions frozen).

    Hoisted quantities (all per fluid slot, grid layout):
    - ``rho``: density (`dfsph_solver.rs:628-665`);
    - ``Gf`` = sum_ff m_j grad; ``Gb`` = rho0_i sum_fb Volb_j grad;
      ``Gsum`` = Gf + Gb;
    - ``Sb`` = rho0_i sum_fb Volb_j (vb_j . grad);
    - ``sq_mm`` = sum |m_j grad|^2 (ff) + |fbm grad|^2 (fb)  [DFSPH alpha];
    - ``s2_m`` = sum_ff m_j |grad|^2 + sum_fb fbm |grad|^2   [IISPH a_ii];
    - ``count``: pairs within h (incl. self).
    """

    def __init__(self, sim: SimConfig, spec_f, spec_b, fluids, boundaries,
                 velocity_changes_shape_like=None):
        self.sim = sim
        self.spec_f = spec_f
        self.spec_b = spec_b
        self.dim = sim.dim
        self.h = sim.h
        self.kd = get_kernel(sim.kernel_density)
        self.kg = get_kernel(sim.kernel_gradient)

        self.binf = dg.bin_particles(spec_f, fluids.positions, fluids.alive)
        self.binb = dg.bin_particles(
            spec_b, boundaries.positions, boundaries.alive
        )
        # Positions fill with the far sentinel: all pair terms against
        # empty slots vanish via kernel support (see dense_grid docstring),
        # so the hot passes run mask-free.
        self.P = dg.to_grid(
            spec_f, self.binf, fluids.positions, fill=dg.POS_SENTINEL
        )
        self.V = dg.to_grid(spec_f, self.binf, fluids.velocities)
        self.M = dg.to_grid(spec_f, self.binf, fluids.masses)
        self.R0 = dg.to_grid(spec_f, self.binf, fluids.density0, fill=1.0)
        self.FID = dg.to_grid(spec_f, self.binf, fluids.fluid_id, fill=-1)
        self.maskf = self.binf.mask
        self.live = self.maskf > 0
        self.Pb = dg.to_grid(
            spec_b, self.binb, boundaries.positions, fill=dg.POS_SENTINEL
        )
        self.Vbvel = dg.to_grid(spec_b, self.binb, boundaries.velocities)
        self.maskb = self.binb.mask

        self._compute_boundary_volumes()
        self._hoist()

    # -- per-substep passes -------------------------------------------------

    def _compute_boundary_volumes(self):
        """V_b = 1 / sum W_bb (`dfsph_solver.rs:72-96`)."""
        kd_w, kd_dw = self.kd

        def body(acc, dpos, r2, within, j):
            w, _ = w_dwr(r2, self.h, self.dim, kd_w, kd_dw)
            return acc + jnp.sum(jnp.where(within, w, 0.0), axis=1)

        wsum = pair_fold(
            self.spec_b, self.dim, self.h, self.Pb, self.maskb,
            self.Pb, self.maskb, {}, body, jnp.zeros_like(self.maskb),
        )
        self.Volb = jnp.where(
            (wsum > 0) & (self.maskb > 0),
            1.0 / jnp.where(wsum > 0, wsum, 1.0),
            0.0,
        )

    def _hoist(self):
        kd_w, kd_dw = self.kd
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h

        def ff_body(acc, dpos, r2, within, j):
            rho, gf, sq, s2, cnt = acc
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            wd, _ = w_dwr(r2, h, dim, kd_w, kd_dw)
            mj = jnp.where(within, j["m"][None, :, :], 0.0)
            rho = rho + jnp.sum(mj * wd, axis=1)
            gsq = jnp.zeros_like(r2)
            gf_new = []
            for d in range(dim):
                g_d = dpos[d] * dwr  # grad_d
                gf_new.append(gf[d] + jnp.sum(g_d * mj, axis=1))
                gsq = gsq + g_d * g_d
            sq = sq + jnp.sum(gsq * mj * mj, axis=1)
            s2 = s2 + jnp.sum(gsq * mj, axis=1)
            cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
            return rho, jnp.stack(gf_new), sq, s2, cnt

        z = jnp.zeros_like(self.maskf)
        rho_ff, Gf, sq_ff, s2_ff, cnt_ff = pair_fold(
            self.spec_f, dim, h, self.P, self.maskf, self.P, self.maskf,
            {"m": self.M}, ff_body,
            (z, jnp.zeros_like(self.P), z, z,
             jnp.zeros_like(self.maskf, dtype=jnp.int32)),
        )

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

        rho_fb, Gb_raw, sq_fb, s2_fb, Sb_raw, cnt_fb = pair_fold(
            self.spec_f, dim, h, self.P, self.maskf, self.Pb, self.maskb,
            {"vol": self.Volb, "vb": self.Vbvel}, fb_body,
            (z, jnp.zeros_like(self.P), z, z, z,
             jnp.zeros_like(self.maskf, dtype=jnp.int32)),
        )

        R0 = self.R0
        self.rho = jnp.where(self.live, rho_ff + R0 * rho_fb, R0)
        self.Gf = Gf
        self.Gb = R0[None] * Gb_raw
        self.Gsum = self.Gf + self.Gb
        self.Sb = R0 * Sb_raw
        # sum |m grad|^2 over ff and fb (fb mass = Volb_j * rho0_i).
        self.sq_mm = sq_ff + R0 * R0 * sq_fb
        # sum m |grad|^2 over ff and fb (and the ff-only part, used by the
        # IISPH d_ji . grad self-term which exists only for fluid pairs).
        self.s2_ff = s2_ff
        self.s2_m = s2_ff + R0 * s2_fb
        self.count = cnt_ff + cnt_fb
        self.cnt_ff = cnt_ff
        self.cnt_fb = cnt_fb

    # -- per-iteration passes -----------------------------------------------

    def _sym_blocks(self):
        """Yield (dpos, dwr, offset) for the half stencil: the zero offset
        plus one of each {+d, -d} pair.

        The dense analog of the reference's half-stencil cell-pair walk
        (``contacts.rs:202-220``): each cell-pair block is evaluated once
        (one distance/kernel evaluation) and consumed by BOTH sides — the
        mirrored contribution is reduced over the i axis and rolled onto
        the neighbor cells. No occupancy masks: empty slots sit at the far
        position sentinel, so dwr vanishes through kernel support, and
        every term carries a zero j-side mass/volume factor.
        """
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h
        half = [
            off for off in dg.neighbor_offsets(dim)
            if off > tuple([0] * dim)
        ]
        for off in [tuple([0] * dim)] + half:
            pj = dg.shift_j(self.spec_f, self.P, off)
            dpos = [
                self.P[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
            ]
            r2 = dpos[0] * dpos[0]
            for d in range(1, dim):
                r2 = r2 + dpos[d] * dpos[d]
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            yield dpos, dwr, off

    def _use_pallas(self) -> bool:
        import jax

        if not getattr(self.sim, "use_pallas", True):
            return False
        try:
            from ..ops import PALLAS_OK
        except Exception:  # noqa: BLE001
            return False
        return PALLAS_OK and jax.default_backend() == "tpu"

    def t_pass(self, Q):
        """T_i = sum_ff m_j (Q_j . grad_ij) for a per-slot vector Q
        (half-stencil: each block also contributes m_i Q_i . grad_ji to
        its mirror side; on TPU a fused Pallas kernel walks the full
        stencil in VMEM instead)."""
        if self._use_pallas():
            from ..ops import t_pass_pallas

            return t_pass_pallas(
                self.spec_f, self.h, self.dim, self.sim.kernel_gradient,
                self.P, self.M, Q,
            )
        dim = self.dim
        spec = self.spec_f
        acc = jnp.zeros_like(self.maskf)
        for dpos, dwr, off in self._sym_blocks():
            is_self = off == tuple([0] * dim)
            mj = dg.shift_j(spec, self.M, off)
            qj = dg.shift_j(spec, Q, off)
            t = jnp.zeros_like(dwr)
            for d in range(dim):
                t = t + qj[d][None, :, :] * dpos[d]
            acc = acc + jnp.sum(t * dwr * mj[None, :, :], axis=1)
            if not is_self:
                # Mirror: grad_ji = -dpos; i-side arrays unshifted.
                tm = jnp.zeros_like(dwr)
                for d in range(dim):
                    tm = tm - Q[d][:, None, :] * dpos[d]
                s = jnp.sum(tm * dwr * self.M[:, None, :], axis=0)
                acc = acc + dg.shift_j(spec, s, tuple(-o for o in off))
        return acc

    def k_pass(self, K):
        """K_i = sum_ff k_j m_j grad_ij for a per-slot scalar k
        (half-stencil, mirrored like t_pass; fused Pallas kernel on TPU)."""
        if self._use_pallas():
            from ..ops import k_pass_pallas

            return k_pass_pallas(
                self.spec_f, self.h, self.dim, self.sim.kernel_gradient,
                self.P, self.M, K,
            )
        dim = self.dim
        spec = self.spec_f
        acc = jnp.zeros_like(self.P)
        for dpos, dwr, off in self._sym_blocks():
            is_self = off == tuple([0] * dim)
            mj = dg.shift_j(spec, self.M, off)
            kj = dg.shift_j(spec, K, off)
            coeff = kj[None, :, :] * mj[None, :, :] * dwr
            acc = jnp.stack(
                [acc[d] + jnp.sum(dpos[d] * coeff, axis=1)
                 for d in range(dim)]
            )
            if not is_self:
                coeff_m = K[:, None, :] * self.M[:, None, :] * dwr
                neg_off = tuple(-o for o in off)
                acc = jnp.stack(
                    [
                        acc[d]
                        + dg.shift_j(
                            spec, jnp.sum(-dpos[d] * coeff_m, axis=0), neg_off
                        )
                        for d in range(dim)
                    ]
                )
        return acc

    def delta_density(self, Vp):
        """sum m_j (v_i'-v_j').grad + boundary term, via hoisted sums:
        = v_i'.Gsum - T(v') - Sb."""
        t = self.t_pass(Vp)
        return jnp.sum(Vp * self.Gsum, axis=0) - t - self.Sb

    def boundary_forces(self, coef):
        """One boundary-owner pass: F_b = Volb_b sum_i grad_ij coef_i
        (grad w.r.t. the fluid point; dpos in the fold is p_b - p_i)."""
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h

        def body(acc, dpos, r2, within, j):
            # No mask needed: coef is zero on dead fluid slots and the
            # sentinel positions zero dwr for any empty-slot pairing.
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            c = j["coef"][None, :, :]
            return jnp.stack(
                [acc[d] - jnp.sum(dpos[d] * dwr * c, axis=1)
                 for d in range(dim)]
            )

        Fb = pair_fold(
            self.spec_b, dim, h, self.Pb, self.maskb, self.P, self.maskf,
            {"coef": coef}, body, jnp.zeros_like(self.Pb),
        )
        return self.Volb[None] * Fb

    # -- layout conversion ---------------------------------------------------

    def to_f(self, values, fill=0.0):
        return dg.to_grid(self.spec_f, self.binf, values, fill)

    def unbin_f(self, grid, fallback):
        out = dg.from_grid(self.spec_f, self.binf, grid, 0.0)
        if out.ndim == 2:
            return jnp.where(self.binf.in_grid[:, None], out, fallback)
        return jnp.where(self.binf.in_grid, out, fallback)

    def unbin_b(self, grid, fallback):
        out = dg.from_grid(self.spec_b, self.binb, grid, 0.0)
        if out.ndim == 2:
            return jnp.where(self.binb.in_grid[:, None], out, fallback)
        return jnp.where(self.binb.in_grid, out, fallback)
