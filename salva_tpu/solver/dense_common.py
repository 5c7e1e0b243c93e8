"""Shared machinery of the dense-layout pressure solvers.

Binning, pair folds, the per-substep hoisted sums (density, gradient
sums, gradient norms, boundary terms, contact counts) and the
per-iteration pair passes shared by dense DFSPH and dense IISPH.

Two cell indexings share all physics code:

- **grid** (``sim.dense_compact = False``): one column per domain cell
  (``[cap, C]``); neighbor views are flat rolls of the cell axis.
- **compact** (default): one column per *occupied* cell plus a void
  column (``[cap, A+1]``); neighbor views gather columns through
  precomputed ``[A+1, 3^dim]`` neighbor tables
  (``dense_grid.neighbor_table``). Pair compute scales with occupancy
  instead of domain volume; the column gather measures ~free on TPU.

Physics contract identical to ``common.py`` / the reference
(``dfsph_solver.rs``, ``iisph_solver.rs``); see ``dfsph_dense.py`` for the
hoisting derivation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..geometry import dense_grid as dg
from ..kernels import get_kernel

EPSILON = float(jnp.finfo(jnp.float32).eps)


def w_dwr(r2, h, dim, w_fn, dw_fn):
    """(W, dW/dr / r) with the r ~ 0 gradient cutoff (`kernel.rs:19-26`).

    The cubic-spline default takes a fused path that evaluates dW/r
    directly from r² — the near branch of the cubic's dW/r is a
    polynomial in q (no division) and the far branch needs only an
    rsqrt, so the pair passes spend one sqrt + one rsqrt instead of a
    sqrt and two divides per pair slot (these transcendentals dominate
    the VPU cost of the hot folds)."""
    from ..kernels.sph import cubic_dw, cubic_w, _cubic_normalizer

    if w_fn is cubic_w and dw_fn is cubic_dw:
        norm = _cubic_normalizer(h, dim)
        inv_h2 = 1.0 / (h * h)
        q2 = r2 * inv_h2
        q = jnp.sqrt(q2)
        # W(q): 1 + 6(q^3 - q^2) near, 2(1-q)^3 far.
        near_w = 1.0 + (q2 * q - q2) * 6.0
        one_q = 1.0 - q
        far_w = one_q * one_q * one_q * 2.0
        w = norm * jnp.where(
            q <= 0.5, near_w, jnp.where(q <= 1.0, far_w, 0.0)
        )
        # dW/dr / r = norm/h^2 * [ (18q - 12)          q <= 0.5
        #                          -6 (1-q)^2 / q      0.5 < q <= 1 ].
        rq = jax.lax.rsqrt(jnp.maximum(q2, 1.0e-12))
        far_d = -6.0 * one_q * one_q * rq
        near_d = 18.0 * q - 12.0
        cut = (q > 1.0) | (q <= 1.0e-5)  # `cubic_spline_kernel.rs:71`
        dwr = (norm * inv_h2) * jnp.where(
            cut, 0.0, jnp.where(q <= 0.5, near_d, far_d)
        )
        return w, dwr
    r = jnp.sqrt(r2)
    w = w_fn(r, h, dim)
    safe_r = jnp.where(r > EPSILON, r, 1.0)
    dwr = jnp.where(r > EPSILON, dw_fn(r, h, dim) / safe_r, 0.0)
    return w, dwr


def per_fluid_mean_max_grid(values, fid, mask, num_fluids: int, halo=None,
                            interior=None):
    """`per_fluid_mean_max` on grid layout (static loop over fluids).

    With ``halo``/``interior`` set (domain decomposition), each device
    reduces over its owned (interior) slots and the sums/counts are
    psum'd so every device computes the reference's *global* mean error
    (`dfsph_solver.rs:150-160`)."""
    err = jnp.zeros((), jnp.float32)
    live = mask > 0
    if interior is not None:
        live = live & interior
    for f in range(num_fluids):
        sel = live & (fid == f)
        s = jnp.sum(jnp.where(sel, values, 0.0))
        cnt = jnp.sum(sel.astype(jnp.float32))
        if halo is not None:
            s = halo.psum(s)
            cnt = halo.psum(cnt)
        err = jnp.maximum(err, jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0))
    return err


def fold_pairs(offsets, h, dim, pos_i, mask_i, pos_j, mask_j, jview,
               j_arrays: Dict, body, init):
    """Fold ``body(acc, dpos, r2, within, j) -> acc`` over all 3^dim
    neighbor views produced by ``jview(arr, o)``."""
    acc = init
    h2 = h * h
    for o in range(len(offsets)):
        pj = jview(pos_j, o)
        mj = jview(mask_j, o)
        j = {k: jview(v, o) for k, v in j_arrays.items()}
        dpos = [pos_i[d][:, None, :] - pj[d][None, :, :] for d in range(dim)]
        r2 = dpos[0] * dpos[0]
        for d in range(1, dim):
            r2 = r2 + dpos[d] * dpos[d]
        within = (r2 <= h2) & (mask_i[:, None, :] > 0) & (mj[None, :, :] > 0)
        acc = body(acc, dpos, r2, within, j)
    return acc


class DenseCtx:
    """Per-substep binned state + hoisted sums (positions frozen).

    Hoisted quantities (per fluid slot):
    - ``rho``: density (`dfsph_solver.rs:628-665`);
    - ``Gf`` = sum_ff m_j grad; ``Gb`` = rho0_i sum_fb Volb_j grad;
      ``Gsum`` = Gf + Gb;
    - ``Sb`` = rho0_i sum_fb Volb_j (vb_j . grad);
    - ``sq_mm`` = sum |m_j grad|^2 (ff + fb)   [DFSPH alpha];
    - ``s2_m`` = sum m_j |grad|^2 (ff + fb), ``s2_ff`` ff-only [IISPH];
    - ``count``: pairs within h (incl. self).
    """

    def __init__(self, sim: SimConfig, spec_f, spec_b, fluids, boundaries,
                 halo=None, need_s2: bool = True):
        # ``need_s2``: accumulate the IISPH-only sums (s2_ff / s2_m);
        # dense DFSPH passes False to trim two reductions from the hoist.
        self.need_s2 = need_s2
        self._boundaries_volumes = boundaries.volumes
        self.sim = sim
        self.spec_f = spec_f
        self.spec_b = spec_b
        self.dim = sim.dim
        self.h = sim.h
        self.kd = get_kernel(sim.kernel_density)
        self.kg = get_kernel(sim.kernel_gradient)
        self.offsets = dg.neighbor_offsets(self.dim)
        # Brute all-pairs tier (``dense_grid.brute_spec``): a 1D cyclic
        # 'grid' whose offsets 0..C-1 enumerate every cell pair once —
        # exact all-pairs interaction with no spatial binning, for small
        # particle sets where the grid's fixed costs dominate.
        self.brute = bool(getattr(spec_f, "brute", False))
        if self.brute:
            self.offsets = [(k,) for k in range(spec_f.dims[0])]
        self.compact = (
            bool(getattr(sim, "dense_compact", True)) and not self.brute
        )
        self.halo = halo
        # Fluid-tracking grid window (config.fitted_dims): static dims,
        # traced origin recomputed HERE from the live fluid extent each
        # substep — a translating fluid never recompiles. Boundary
        # particles outside the window are dropped from binning (> h
        # from any fluid by the margin) rather than clamped into the
        # border ring, where they would interact spuriously.
        self.fitted = (
            getattr(sim, "fitted_dims", None) is not None
            and halo is None
            and not self.brute
        )
        self.drop_b = self.fitted
        self.origin_dyn = None
        if self.fitted:
            import numpy as _np

            h = sim.h
            mins = _np.asarray(sim.domain[0], _np.float64)
            maxs = _np.asarray(sim.domain[1], _np.float64)
            o0 = mins - 2 * h
            full_dims = _np.maximum(
                _np.ceil((maxs - o0) / h).astype(int) + 2, 3
            )
            max_shift = _np.maximum(
                full_dims - _np.asarray(spec_f.dims), 0
            ).astype(_np.float32)
            big = jnp.float32(1.0e30)
            lo = jnp.min(
                jnp.where(fluids.alive[:, None], fluids.positions, big),
                axis=0,
            )
            anchor = jnp.asarray(spec_f.origin, jnp.float32)
            shift = jnp.floor((lo - 2.0 * h - anchor) / h)
            shift = jnp.clip(shift, 0.0, jnp.asarray(max_shift))
            self.origin_dyn = anchor + shift * jnp.float32(h)

        self.sparse_b = False
        # Dense+spill pair structure (config.dense_spill_columns): only
        # on the single-device full-grid half-stencil path — the other
        # layouts keep their own caps.
        self.spill_E = 0
        if halo is not None:
            # Domain decomposition (parallel/domain.py): this device's
            # extended x-slab of the grid; flat rolls act on the LOCAL
            # dims, ghost layers are filled by the slab binning.
            self.compact = False
            nxl = halo.nxl
            spec_f_loc = spec_f.replace(dims=(nxl + 2,) + spec_f.dims[1:])
            spec_b_loc = spec_b.replace(dims=(nxl + 2,) + spec_b.dims[1:])
            self.binf = dg.bin_particles_slab(
                spec_f, nxl, halo.x0, fluids.positions, fluids.alive
            )
            self.binb = dg.bin_particles_slab(
                spec_b, nxl, halo.x0, boundaries.positions, boundaries.alive
            )
            self.sf = spec_f_loc
            self.sb = spec_b_loc
            offs = self.offsets
            self.jff = lambda arr, o: dg.shift_j(spec_f_loc, arr, offs[o])
            self.jfb = self.jff
            self.jbf = self.jff
            self.jbb = self.jff
            # Slot-level ownership mask: columns in owned layers.
            layer = jnp.arange(spec_f_loc.num_cells, dtype=jnp.int32) // (
                halo.nyz
            )
            self.interior = ((layer >= 1) & (layer < nxl + 1))[None, :]
        elif self.brute:
            # Identity binding, cyclic all-pairs views; spill / sparse /
            # fitted / half / pallas machinery all stay off (the generic
            # full-fold paths below are exactly the brute formulation).
            self.binf = dg.bin_particles_brute(spec_f, fluids.alive)
            self.binb = dg.bin_particles_brute(spec_b, boundaries.alive)
            self.sf, self.sb = spec_f, spec_b
            offs = self.offsets
            self.jff = lambda arr, o: dg.shift_j(spec_f, arr, offs[o])
            self.jfb = self.jff
            self.jbf = self.jff
            self.jbb = self.jff
        elif self.compact:
            a_f = max(
                256,
                min(
                    spec_f.num_cells,
                    int(fluids.capacity * sim.dense_active_ratio),
                ),
            )
            a_b = max(
                256,
                min(
                    spec_b.num_cells,
                    int(
                        boundaries.capacity
                        * sim.dense_active_ratio_boundary
                    ),
                ),
            )
            self.binf = dg.bin_particles_active(
                spec_f, a_f, fluids.positions, fluids.alive,
                cap=spec_f.cap, origin=self.origin_dyn,
            )
            self.binb = dg.bin_particles_active(
                spec_b, a_b, boundaries.positions, boundaries.alive,
                cap=spec_b.cap, drop_clamped=self.drop_b,
                origin=self.origin_dyn,
            )
            self.sf = dg.ActiveSpec(a_f + 1, spec_f.cap)
            self.sb = dg.ActiveSpec(a_b + 1, spec_b.cap)
            nff = dg.neighbor_table(
                spec_f, self.binf.active_cells, self.binf.cell_to_active
            )
            nfb = dg.neighbor_table(
                spec_f, self.binf.active_cells, self.binb.cell_to_active
            )
            nbf = dg.neighbor_table(
                spec_f, self.binb.active_cells, self.binf.cell_to_active
            )
            nbb = dg.neighbor_table(
                spec_f, self.binb.active_cells, self.binb.cell_to_active
            )
            self.jff = lambda arr, o: arr[..., nff[:, o]]
            self.jfb = lambda arr, o: arr[..., nfb[:, o]]
            self.jbf = lambda arr, o: arr[..., nbf[:, o]]
            self.jbb = lambda arr, o: arr[..., nbb[:, o]]
        else:
            self.spill_E = int(getattr(sim, "dense_spill_columns", 0) or 0)
            self.binf = dg.bin_particles(
                spec_f, fluids.positions, fluids.alive,
                origin=self.origin_dyn, spill_cols=self.spill_E,
            )
            if self.spill_E:
                # Extended column axis [cap, C + E + 1] (spill columns +
                # void); all layout shuffles work through the extended
                # grid_src/slot_of, only pair passes decompose.
                self.sf = dg.ActiveSpec(
                    spec_f.num_cells + self.spill_E + 1, spec_f.cap
                )
            else:
                self.sf = spec_f
            offs = self.offsets
            self.jff = lambda arr, o: dg.shift_j(spec_f, arr, offs[o])
            self.sparse_b = bool(getattr(sim, "dense_sparse_boundary", True))
            if self.sparse_b:
                # Boundary side compact (walls/floors occupy few cells):
                # boundary-owner passes run over A_b occupied columns; the
                # compact boundary arrays are rematerialized onto the full
                # grid once (a few small scatters, below) so fluid-owner
                # fb reads stay cheap roll views.
                a_b = max(
                    64,
                    min(
                        spec_b.num_cells,
                        int(
                            boundaries.capacity
                            * sim.dense_active_ratio_boundary
                        ),
                    ),
                )
                self.binb = dg.bin_particles_active(
                    spec_b, a_b, boundaries.positions, boundaries.alive,
                    cap=spec_b.cap, drop_clamped=self.drop_b,
                    origin=self.origin_dyn,
                )
                self.sb = dg.ActiveSpec(a_b + 1, spec_b.cap)
                nbb = dg.neighbor_table(
                    spec_f, self.binb.active_cells, self.binb.cell_to_active
                )
                self.jbb = lambda arr, o: arr[..., nbb[:, o]]
                shifts = jnp.asarray(
                    [spec_f.flat_shift(off) for off in offs], jnp.int32
                )
                C = spec_f.num_cells
                active = self.binb.active_cells  # [A_b + 1], void = C
                is_void = active >= C

                def fluid_cols(o, sign):
                    """Full-grid fluid column per boundary active cell at
                    +/- offset o: (gather index in-bounds, scatter index
                    with void -> out-of-bounds for mode='drop')."""
                    cols = active + sign * shifts[o]
                    gather = jnp.where(is_void, 0, cols)
                    scatter = jnp.where(is_void, C, cols)
                    return gather, scatter

                self._fluid_cols = fluid_cols
                self._b_active = active
                self._b_is_void = is_void
                # Solver-internal fb hoists read the rematerialized
                # full-grid boundary arrays via roll views; the
                # boundary-owner feedback pass (``boundary_forces``) uses
                # the compact columns. The fluid-owner jfb view is kept
                # for generality.
                self.jfb = lambda arr, o: dg.shift_j(spec_f, arr, offs[o])

                def jbf(arr, o):
                    g, _ = fluid_cols(o, 1)
                    return arr[..., g]

                self.jbf = jbf
            else:
                self.binb = dg.bin_particles(
                    spec_b, boundaries.positions, boundaries.alive,
                    drop_clamped=self.drop_b, origin=self.origin_dyn,
                )
                self.sb = spec_b
                self.jfb = self.jff
                self.jbf = self.jff
                self.jbb = self.jff

        if halo is None:
            self.interior = None

        # Half-stencil symmetry (config.dense_half_stencil): on the
        # full-grid roll path each +/- flat-shift pair shares one pair
        # block (see t_pass/k_pass/_hoist). Positive shifts only; the
        # self block (shift 0) is kept whole.
        self.half = (
            not self.compact
            and not self.brute
            and halo is None
            and bool(getattr(sim, "dense_half_stencil", True))
        )
        if self.half:
            shifts = [self.spec_f.flat_shift(o) for o in self.offsets]
            assert sorted(shifts) == sorted(-s for s in shifts), shifts
            self.pos_shifts = tuple(s for s in shifts if s > 0)

        if self.spill_E:
            assert self.half and self.sparse_b, (
                "dense_spill_columns requires the single-device full-grid "
                "half-stencil layout with sparse boundary binning "
                "(the world only enables it there)"
            )
        self.maskf = self.binf.mask
        self.live = self.maskf > 0
        if self.spill_E:
            self._build_spill_tables()
        self.uniform = getattr(sim, "uniform_particles", None)
        packed_f = getattr(self.binf, "grid_src", None) is not None
        if packed_f:
            # Compact layout: ALL fluid channels bin through ONE packed
            # row gather (per-row, payload-insensitive) instead of
            # per-channel scatters — see dense_grid.to_grid_multi.
            f_items = [
                (fluids.positions, dg.POS_SENTINEL),
                (fluids.velocities, 0.0),
            ]
            if self.uniform is None:
                f_items += [(fluids.masses, 0.0), (fluids.density0, 1.0)]
            f_grids = dg.to_grid_multi(self.sf, self.binf, f_items)
            self.P, self.V = f_grids[0], f_grids[1]
            if self.uniform is None:
                self.M, self.R0 = f_grids[2], f_grids[3]
        else:
            self.P = dg.to_grid(
                self.sf, self.binf, fluids.positions, fill=dg.POS_SENTINEL
            )
            self.V = dg.to_grid(self.sf, self.binf, fluids.velocities)
            if self.uniform is None:
                self.M = dg.to_grid(self.sf, self.binf, fluids.masses)
                self.R0 = dg.to_grid(
                    self.sf, self.binf, fluids.density0, fill=1.0
                )
        if self.uniform is not None:
            # Constant channels derived from the mask — no shuffle at all.
            fid, m0, rho0 = self.uniform
            self.M = self.maskf * jnp.float32(m0)
            self.R0 = jnp.where(self.live, jnp.float32(rho0), 1.0)
            self.FID = jnp.where(self.live, int(fid), -1).astype(jnp.int32)
        else:
            self.FID = dg.to_grid(
                self.sf, self.binf, fluids.fluid_id, fill=-1
            )
        if getattr(self.binb, "grid_src", None) is not None:
            self.Pb, self.Vbvel = dg.to_grid_multi(
                self.sb, self.binb,
                [(boundaries.positions, dg.POS_SENTINEL),
                 (boundaries.velocities, 0.0)],
            )
        else:
            self.Pb = dg.to_grid(
                self.sb, self.binb, boundaries.positions,
                fill=dg.POS_SENTINEL,
            )
            self.Vbvel = dg.to_grid(self.sb, self.binb, boundaries.velocities)
        self.maskb = self.binb.mask

        self._compute_boundary_volumes()
        if self.sparse_b:
            # Rematerialize the compact boundary arrays onto the full grid
            # once (a handful of small scatters): the fluid-owner fb hoist
            # and the force passes then run as roll-view blocks — measured
            # faster than per-offset compact-table gathers, which cost
            # more than they save (see config.dense_sparse_boundary).
            C = self.spec_f.num_cells
            cols = jnp.where(self._b_is_void, C, self._b_active)

            def to_full(arr, fill=0.0):
                full = jnp.full(arr.shape[:-1] + (C,), fill, arr.dtype)
                return full.at[..., cols].set(arr, mode="drop")

            self._Pb_full = to_full(self.Pb, dg.POS_SENTINEL)
            self._Vbvel_full = to_full(self.Vbvel)
            self._Volb_full = to_full(self.Volb)
            self._maskb_full = to_full(self.maskb)
        self._hoist()
        self.frozen = bool(getattr(sim, "dense_frozen_pairs", False))
        if self.frozen:
            if self.spill_E:
                raise NotImplementedError(
                    "dense_frozen_pairs is incompatible with "
                    "dense_spill_columns"
                )
            self._freeze_pairs()

    @property
    def bin_overflow(self):
        extra = 0
        if self.compact:
            extra = self.binf.active_overflow + self.binb.active_overflow
        elif self.sparse_b:
            extra = self.binb.active_overflow
        extra = extra + getattr(self, "_fb_adj_overflow", 0)
        return self.binf.overflow + self.binb.overflow + extra + (
            self.spill_overflow if self.spill_E else 0
        )

    @property
    def spill_overflow(self):
        """Spill-structure table overflows (cells beyond the spill table,
        adjacency columns beyond its table, condensed spill-neighbor
        entries beyond K) — each one means dropped contacts, so the world
        grows the tables when this fires."""
        if not self.spill_E:
            return 0
        return (
            self.binf.spill_col_overflow
            + self._spill_adj_overflow
            + self._spill_k_overflow
        )

    @property
    def spill_k_overflow(self):
        """Condensed-K-table component of ``spill_overflow``, surfaced
        separately (ADVICE r4): it is insensitive to the spill table size
        E, so the world's growth policy must widen ``dense_spill_k`` (or
        fall back to the plain tier) instead of doubling E forever."""
        return self._spill_k_overflow if self.spill_E else 0

    # -- dense+spill machinery (config.dense_spill_columns) ------------------
    #
    # The pair universe splits by (i-class, j-class) over main-grid and
    # spill slots; each combination is covered exactly once:
    #   main  <- main : the half-stencil roll blocks (unchanged, on the
    #                   [..., :C] main slice);
    #   spill <- main : gathered blocks over the spill columns' 3^dim
    #                   main-neighbor columns;
    #   spill <- spill: gathered blocks over the spill columns' 3^dim
    #                   spill-neighbor columns (full stencil -> both
    #                   directions covered);
    #   main  <- spill: gathered blocks over the main columns ADJACENT to
    #                   any spill cell (compact static table, fb-sparse
    #                   pattern), each with a condensed [K] table of its
    #                   neighboring spill columns (typically 1-3 of the
    #                   27 neighbors are spill cells; K = dense_spill_k).
    # Spill columns are rare by construction (cells beyond the cap tier:
    # measured <= ~1% of occupied cells at tier 12 even in deep splash),
    # so the gathered blocks are small; outputs assemble back onto the
    # extended column axis with one unique-column scatter.

    def _build_spill_tables(self):
        sim, spec = self.sim, self.spec_f
        E = self.spill_E
        C = spec.num_cells
        self._Cmain = C
        self.cap2 = min(8, spec.cap)
        self.CE = C + E + 1
        shifts_py = [spec.flat_shift(o) for o in self.offsets]
        shifts = jnp.asarray(shifts_py, jnp.int32)
        sc = self.binf.spill_cells  # [E], C = unused
        used = sc < C
        c2s_ext = jnp.concatenate(
            [self.binf.cell_to_spill, jnp.full((1,), E, jnp.int32)]
        )  # [C+1]

        # j-tables of each spill column's 3^dim neighborhood. Real spill
        # cells are normally interior (cell + shift stays in [0, C)), but
        # escape-clamp pile-ups CAN make a border-ring cell spill
        # (ADVICE r4: exp_maxocc measured occupancy 344 from escapees), so
        # out-of-range flat indices must route to the void column instead
        # of wrapping into arbitrary spill columns; unused table slots
        # point at the void column too (their i-side rows are
        # sentinel-masked anyway).
        nb = sc[:, None] + shifts[None, :]
        in_rng = (nb >= 0) & (nb < C)
        valid = used[:, None] & in_rng
        self._sp_nb_main = jnp.where(valid, nb, self.CE - 1)
        nb_cell = jnp.clip(jnp.where(valid, nb, C), 0, C)
        self._sp_nb_spill = C + c2s_ext[nb_cell]  # [E, 3^dim]
        # Same neighborhoods as CELL ids, for gathers into [_, C]-shaped
        # boundary grids (clamped to 0; i-side sentinel masks the rest).
        self._sp_nb_cell = jnp.where(valid, nb, 0)

        # Adjacency table (main-i <- spill-j): occupied main columns with
        # a spill cell in their 3^dim neighborhood, compacted via top_k.
        # Measured (tools/exp_spill.py, 97k trajectory): dilated-spill
        # columns run ~8x the spill cell count (scattered cells, 3^dim
        # dilation), and the E table itself carries ~4x headroom.
        AADJ = getattr(sim, "dense_spill_adj_columns", None) or 8 * E
        AADJ = int(min(AADJ, C))
        K = min(int(getattr(sim, "dense_spill_k", 8)), len(shifts_py))
        occ = self.binf.cell_to_spill < E  # [C]
        adj = occ
        for s in shifts_py:
            if s != 0:
                adj = adj | jnp.roll(occ, s)
        col_occ = jnp.any(self.maskf[:, :C] > 0, axis=0)
        adj = adj & col_occ
        iota = jnp.arange(C, dtype=jnp.int32)
        key = jnp.where(adj, C - iota, 0)
        vals, ac = jax.lax.top_k(key, AADJ)
        got = vals > 0
        n_adj = jnp.sum(adj.astype(jnp.int32))
        self._spill_adj_overflow = jnp.maximum(n_adj - AADJ, 0)
        self._adj_cols = jnp.where(got, ac, 0)
        self._adj_got = got
        self._adj_sc = jnp.where(got, ac, self.CE)  # scatter target

        # Condensed spill-j table [AADJ, K]: the spill columns in each
        # adjacent column's neighborhood (entries beyond K are dropped
        # AND counted — a silent drop would lose contacts).
        s_nb = c2s_ext[
            jnp.minimum(self._adj_cols[:, None] + shifts[None, :], C)
        ]  # [AADJ, 3^dim] spill indices (E = none)
        is_sp = (s_nb < E) & got[:, None]
        n_per = jnp.sum(is_sp.astype(jnp.int32), axis=1)
        n_off = len(shifts_py)
        kkey = jnp.where(
            is_sp, n_off - jnp.arange(n_off, dtype=jnp.int32)[None, :], 0
        )
        kv, ko = jax.lax.top_k(kkey, K)
        picked = jnp.take_along_axis(s_nb, ko, axis=1)
        self._adj_sp_nb = jnp.where(
            kv > 0, C + picked, self.CE - 1
        )  # [AADJ, K] extended col ids
        self._spill_k_overflow = jnp.sum(jnp.maximum(n_per - K, 0))

    def _mslice(self, arr):
        """Main-column slice of an extended array (identity w/o spill)."""
        return arr[..., : self._Cmain] if self.spill_E else arr

    def _sp_i(self, arr):
        """Spill-i slice: the live spill rows of the spill columns."""
        return arr[..., : self.cap2, self._Cmain : self._Cmain + self.spill_E]

    def _jv_sp_main(self, arr, o):
        return arr[..., self._sp_nb_main[:, o]]

    def _jv_sp_spill(self, arr, o):
        return arr[..., : self.cap2, :][..., self._sp_nb_spill[:, o]]

    def _jv_adj_spill(self, arr, k):
        return arr[..., : self.cap2, :][..., self._adj_sp_nb[:, k]]

    def _ff_spill_fold(self, j_arrays, body, init):
        """Spill-i fold of a fluid-fluid pass: main-j then spill-j
        gathered blocks over the spill columns' neighborhoods."""
        acc = fold_pairs(
            self.offsets, self.h, self.dim, self._sp_i(self.P),
            self._sp_i(self.maskf), self.P, self.maskf, self._jv_sp_main,
            j_arrays, body, init,
        )
        return fold_pairs(
            self.offsets, self.h, self.dim, self._sp_i(self.P),
            self._sp_i(self.maskf), self.P, self.maskf, self._jv_sp_spill,
            j_arrays, body, acc,
        )

    def _ff_adj_fold(self, j_arrays, body, init):
        """Adjacent-main-i <- spill-j fold (condensed K-wide j-table)."""
        Pad = self.P[..., self._adj_cols]
        mad = jnp.where(
            self._adj_got, self.maskf[..., self._adj_cols], 0.0
        )
        K = self._adj_sp_nb.shape[1]
        return fold_pairs(
            range(K), self.h, self.dim, Pad, mad, self.P, self.maskf,
            self._jv_adj_spill, j_arrays, body, init,
        )

    def _assemble(self, main, spill, adj=None):
        """main [..., cap, C] + spill [..., cap2, E] + optional
        adj [..., cap, AADJ] -> extended [..., cap, CE]."""
        cap = self.spec_f.cap
        if self.cap2 < cap:
            pad_shape = (
                spill.shape[:-2] + (cap - self.cap2,) + spill.shape[-1:]
            )
            spill = jnp.concatenate(
                [spill, jnp.zeros(pad_shape, spill.dtype)], axis=-2
            )
        void = jnp.zeros(main.shape[:-1] + (1,), main.dtype)
        out = jnp.concatenate([main, spill, void], axis=-1)
        if adj is not None:
            scat = jnp.zeros(
                main.shape[:-1] + (self.CE,), main.dtype
            ).at[..., self._adj_sc].set(adj, mode="drop")
            out = out + scat
        return out

    # -- per-substep passes -------------------------------------------------

    def _compute_boundary_volumes(self):
        """V_b = 1 / sum W_bb (`dfsph_solver.rs:72-96`).

        When the world marks boundaries unchanged
        (``sim.recompute_boundary_volumes = False``), the volumes computed
        by a previous step are read from the state instead — they depend
        only on boundary positions.
        """
        if not getattr(self.sim, "recompute_boundary_volumes", True):
            self.Volb = dg.to_grid(
                self.sb, self.binb, self._boundaries_volumes
            )
            return
        kd_w, kd_dw = self.kd

        def body(acc, dpos, r2, within, j):
            w, _ = w_dwr(r2, self.h, self.dim, kd_w, kd_dw)
            return acc + jnp.sum(jnp.where(within, w, 0.0), axis=1)

        wsum = fold_pairs(
            self.offsets, self.h, self.dim, self.Pb, self.maskb,
            self.Pb, self.maskb, self.jbb, {}, body,
            jnp.zeros_like(self.maskb),
        )
        self.Volb = jnp.where(
            (wsum > 0) & (self.maskb > 0),
            1.0 / jnp.where(wsum > 0, wsum, 1.0),
            0.0,
        )
        if self.halo is not None:
            # Ghost boundary cells computed only half their W-sum; the fb
            # passes read Volb at j, so refresh from the owners.
            self.Volb = self.halo.exchange(self.Volb)

    def _hoist(self):
        kd_w, kd_dw = self.kd
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h

        need_s2 = self.need_s2

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
            if need_s2:
                s2 = s2 + jnp.sum(gsq * mj, axis=1)
            cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
            return rho, jnp.stack(gf_new), sq, s2, cnt

        z = jnp.zeros_like(self.maskf)
        if self.spill_E:
            main = self._hoist_ff_half()
            j_arr = {"m": self.M}
            E, cap2 = self.spill_E, self.cap2
            zs = jnp.zeros((cap2, E), jnp.float32)
            sp = self._ff_spill_fold(
                j_arr, ff_body,
                (zs, jnp.zeros((dim, cap2, E), jnp.float32), zs, zs,
                 jnp.zeros((cap2, E), jnp.int32)),
            )
            AADJ = self._adj_cols.shape[0]
            cap = self.spec_f.cap
            za = jnp.zeros((cap, AADJ), jnp.float32)
            adj = self._ff_adj_fold(
                j_arr, ff_body,
                (za, jnp.zeros((dim, cap, AADJ), jnp.float32), za, za,
                 jnp.zeros((cap, AADJ), jnp.int32)),
            )
            rho_ff, Gf, sq_ff, s2_ff, cnt_ff = (
                self._assemble(m, s_, a)
                for m, s_, a in zip(main, sp, adj)
            )
        elif self._use_pallas():
            rho_ff, Gf, sq_ff, s2_ff, cnt_ff = self._pallas_fns()[2](
                self.spec_f, h, dim, self.sim.kernel_density,
                self.sim.kernel_gradient, self.P, self.M,
                need_s2=need_s2,
            )
        elif self.half:
            rho_ff, Gf, sq_ff, s2_ff, cnt_ff = self._hoist_ff_half()
        else:
            rho_ff, Gf, sq_ff, s2_ff, cnt_ff = fold_pairs(
                self.offsets, h, dim, self.P, self.maskf, self.P,
                self.maskf, self.jff, {"m": self.M}, ff_body,
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
            if need_s2:
                s2 = s2 + jnp.sum(gsq * vj, axis=1)
            sb = sb + jnp.sum(vdotg, axis=1)
            cnt = cnt + jnp.sum(within.astype(jnp.int32), axis=1)
            return rho, jnp.stack(gb_new), sq, s2, sb, cnt

        if self.sparse_b:
            pb, maskb = self._Pb_full, self._maskb_full
            volb, vbvel = self._Volb_full, self._Vbvel_full
        else:
            pb, maskb, volb, vbvel = self.Pb, self.maskb, self.Volb, self.Vbvel
        if self._fb_cols():
            rho_fb, Gb_raw, sq_fb, s2_fb, Sb_raw, cnt_fb = (
                self._hoist_fb_sparse(fb_body)
            )
        elif self.spill_E:
            # Full-roll fb hoist on the main slice + a gathered spill-i
            # block over each spill column's 3^dim boundary neighborhood.
            zm = jnp.zeros_like(self._mslice(self.maskf))
            main = fold_pairs(
                self.offsets, h, dim, self._mslice(self.P),
                self._mslice(self.maskf), pb, maskb, self.jfb,
                {"vol": volb, "vb": vbvel}, fb_body,
                (zm, jnp.zeros_like(self._mslice(self.P)), zm, zm, zm,
                 jnp.zeros_like(zm, dtype=jnp.int32)),
            )
            E, cap2 = self.spill_E, self.cap2
            zs = jnp.zeros((cap2, E), jnp.float32)
            jv_cell = lambda arr, o: arr[..., self._sp_nb_cell[:, o]]  # noqa: E731
            sp = fold_pairs(
                self.offsets, h, dim, self._sp_i(self.P),
                self._sp_i(self.maskf), pb, maskb, jv_cell,
                {"vol": volb, "vb": vbvel}, fb_body,
                (zs, jnp.zeros((dim, cap2, E), jnp.float32), zs, zs, zs,
                 jnp.zeros((cap2, E), jnp.int32)),
            )
            rho_fb, Gb_raw, sq_fb, s2_fb, Sb_raw, cnt_fb = (
                self._assemble(m, s_) for m, s_ in zip(main, sp)
            )
        elif self._use_pallas():
            rho_fb, Gb_raw, sq_fb, s2_fb, Sb_raw, cnt_fb = (
                self._pallas_fns()[3](
                    self.spec_f, pb.shape[-2], h, dim,
                    self.sim.kernel_density, self.sim.kernel_gradient,
                    self.P, self.M, pb, volb, vbvel, need_s2=need_s2,
                )
            )
        else:
            rho_fb, Gb_raw, sq_fb, s2_fb, Sb_raw, cnt_fb = fold_pairs(
                self.offsets, h, dim, self.P, self.maskf, pb, maskb,
                self.jfb, {"vol": volb, "vb": vbvel}, fb_body,
                (z, jnp.zeros_like(self.P), z, z, z,
                 jnp.zeros_like(self.maskf, dtype=jnp.int32)),
            )

        R0 = self.R0
        self.rho = jnp.where(self.live, rho_ff + R0 * rho_fb, R0)
        if self.halo is not None:
            # Single-pass forces (XSPH/artificial viscosity) read rho_j.
            self.rho = self.halo.exchange(self.rho)
        self.Gf = Gf
        self.Gb = R0[None] * Gb_raw
        self.Gsum = self.Gf + self.Gb
        self.Sb = R0 * Sb_raw
        self.sq_mm = sq_ff + R0 * R0 * sq_fb
        self.s2_ff = s2_ff
        self.s2_m = s2_ff + R0 * s2_fb
        self.count = cnt_ff + cnt_fb
        self.cnt_ff = cnt_ff
        self.cnt_fb = cnt_fb

    # -- sparse fluid-boundary hoist (config.dense_fb_columns) ---------------

    def _fb_cols(self) -> int:
        """Static boundary-adjacency table size for the sparse fb hoist,
        or 0 when the configuration doesn't support / doesn't benefit
        from it (needs the full-grid layout with the compact boundary
        binning for per-cell boundary occupancy)."""
        cols = getattr(self.sim, "dense_fb_columns", None)
        if not cols or not self.sparse_b or self.halo is not None:
            return 0
        cols = min(int(cols), self.spec_f.num_cells)
        # Near-dense adjacency: gathered columns would not beat rolls.
        if cols * 2 >= self.spec_f.num_cells:
            return 0
        return cols

    def _hoist_fb_sparse(self, fb_body):
        """The fb hoist over boundary-ADJACENT fluid columns only.

        The full-roll fb hoist walks all 3^dim offsets over every window
        column, although only columns within one cell of an occupied
        boundary cell can have nonzero fb sums (walls occupy ~2% of a
        dam-break window; measured ~22 ms of a 76 ms step at 97k). Here:

        1. the boundary occupancy mask [C] (from the compact boundary
           table) is dilated by the 3^dim flat shifts (vector rolls);
        2. the adjacent cell ids compact into a static [AFB] table via
           ``top_k`` (count overflow surfaces in ``bin_overflow`` — a
           dropped column would silently lose wall contacts);
        3. the pair fold runs over ``[cap_f, cap_b, AFB]`` gathered
           blocks (fluid columns by table, boundary neighbors through
           ``cell_to_active`` like the compact layout);
        4. the outputs scatter back into full-grid arrays once (all
           other columns are exactly zero, matching the roll path
           bitwise: slot order inside compact boundary columns equals
           the remat'd full-grid order).

        Roll wrap-around in step 1 can mark ghost-ring columns adjacent;
        harmless — their fluid occupancy mask is zero (interior clamp)
        so they only consume table slots (covered by the sizing
        headroom).

        Under the spill structure the adjacency extends over the spill
        columns too (a spill column whose CELL is boundary-adjacent
        enters the table with its extended column id), so spill
        particles keep their wall contacts.
        """
        C = self.spec_f.num_cells
        AFB = self._fb_cols()
        shifts = [self.spec_f.flat_shift(o) for o in self.offsets]

        occ = (
            jnp.zeros((C + 1,), bool)
            .at[jnp.where(self._b_is_void, C, self._b_active)]
            .set(True)[:C]
        )
        adj = occ
        for s in shifts:
            if s != 0:
                adj = adj | jnp.roll(occ, s)
        if self.spill_E:
            E = self.spill_E
            sc = self.binf.spill_cells
            used = sc < C
            adj_sp = jnp.where(used, adj[jnp.minimum(sc, C - 1)], False)
            adj_ext = jnp.concatenate([adj, adj_sp])
            n_cols = C + E
        else:
            adj_ext = adj
            n_cols = C
        iota = jnp.arange(n_cols, dtype=jnp.int32)
        key = jnp.where(adj_ext, n_cols - iota, 0)
        vals, af = jax.lax.top_k(key, AFB)
        got = vals > 0
        n_adj = jnp.sum(adj_ext.astype(jnp.int32))
        self._fb_adj_overflow = jnp.maximum(n_adj - AFB, 0)
        af_g = jnp.where(got, af, 0)

        # i-side: gathered fluid columns (mask zeroed on unused slots).
        Pi = self.P[..., af_g]
        maski = jnp.where(got[None, :], self.maskf[..., af_g], 0.0)

        # j-side: boundary compact columns of each table cell's 3^dim
        # neighbors (void column for inactive cells). Spill table
        # entries use their CELL id for the neighborhood.
        if self.spill_E:
            af_cell = jnp.where(
                af_g < C, af_g, sc[jnp.clip(af_g - C, 0, E - 1)]
            )
        else:
            af_cell = af_g
        sh = jnp.asarray(shifts, jnp.int32)
        nfb = self.binb.cell_to_active[
            jnp.clip(af_cell[:, None] + sh[None, :], 0, C)
        ]  # [AFB, 3^dim]

        def jview(arr, o):
            return arr[..., nfb[:, o]]

        z = jnp.zeros_like(maski)
        rho, Gb, sq, s2, sb, cnt = fold_pairs(
            self.offsets, self.h, self.dim, Pi, maski, self.Pb, self.maskb,
            jview, {"vol": self.Volb, "vb": self.Vbvel}, fb_body,
            (z, jnp.zeros_like(Pi), z, z, z,
             jnp.zeros_like(maski, dtype=jnp.int32)),
        )

        # Scatter back to the (extended) grid: one packed float scatter +
        # one int scatter (unused table slots target a dropped column).
        out_cols = self.CE if self.spill_E else C
        af_sc = jnp.where(got, af, out_cols)
        packed = jnp.concatenate(
            [rho[None], Gb, sq[None], s2[None], sb[None]], axis=0
        )
        fullf = jnp.zeros(packed.shape[:-1] + (out_cols,), packed.dtype)
        fullf = fullf.at[..., af_sc].set(packed, mode="drop")
        fulli = jnp.zeros(cnt.shape[:-1] + (out_cols,), cnt.dtype)
        fulli = fulli.at[..., af_sc].set(cnt, mode="drop")
        dim = self.dim
        return (fullf[0], fullf[1:1 + dim], fullf[1 + dim],
                fullf[2 + dim], fullf[3 + dim], fulli)

    # -- per-iteration passes -----------------------------------------------

    def _freeze_pairs(self):
        """Materialize the iteration-invariant pair coefficient
        ``s_ij = (dW/dr / r) * m_j`` per neighbor view (``[cap, cap, C]``
        each). Contact gradients are frozen during a substep
        (`helper.rs:9-44`), so every per-iteration pair sum is linear in
        per-slot vectors through these coefficients — the solver loops
        then never re-evaluate the kernel polynomial."""
        kg_w, kg_dw = self.kg
        dtype = jnp.dtype(getattr(self.sim, "dense_pair_dtype", "float32"))
        S = []
        for dpos, dwr, o in self._hot_blocks():
            mj = self.jff(self.M, o)
            S.append((dwr * mj[None, :, :]).astype(dtype))
        self.S = S

    def sp_multi(self, X):
        """[m, cap, C] channels -> [m, cap, C]: X_out[m, i] =
        sum_j s_ij X[m, j] over the frozen coefficients (f32 accumulate)."""
        acc = jnp.zeros((X.shape[0],) + tuple(self.maskf.shape), jnp.float32)
        for o, S_o in enumerate(self.S):
            xj = self.jff(X, o)
            prod = S_o[None].astype(jnp.float32) * xj[:, None].astype(
                jnp.float32
            )
            acc = acc + jnp.sum(prod, axis=2)
        return acc

    def _hot_blocks(self):
        """(dpos, dwr, o) per neighbor view — mask-free (see the far
        position sentinel note in ``dense_grid``)."""
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h
        for o in range(len(self.offsets)):
            pj = self.jff(self.P, o)
            dpos = [
                self.P[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
            ]
            r2 = dpos[0] * dpos[0]
            for d in range(1, dim):
                r2 = r2 + dpos[d] * dpos[d]
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            yield dpos, dwr, o

    # -- half-stencil machinery (config.dense_half_stencil) ------------------

    def _rollj(self, arr, s: int):
        """j-side view at flat shift ``s`` (cell c sees cell c + s)."""
        return arr if s == 0 else jnp.roll(arr, -s, axis=-1)

    def _blocks_half(self):
        """(dpos, r2, s) for s in {0} + positive flat shifts.

        Each s > 0 block covers the unordered cell-pair set {(c, c+s)}:
        the i-side contribution reduces over the j cap axis (axis 1), the
        mirrored j-side contribution reduces over the i cap axis (axis 0)
        and is placed at cell c+s via ``jnp.roll(r, s)`` — the dense-roll
        analog of the reference's half-stencil contact ``flip``
        (`contacts.rs:202-220,300-305`). A rolled-back column can wrap
        only when its source column held no live pair (ghost ring /
        sentinel argument in ``dense_grid``), i.e. it moves zeros.

        Under the spill structure the blocks run on the MAIN column
        slice; spill interactions are separate gathered blocks (see the
        dense+spill section)."""
        dim = self.dim
        Pm = self._mslice(self.P)
        for s in (0,) + self.pos_shifts:
            pj = self._rollj(Pm, s)
            dpos = [
                Pm[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
            ]
            r2 = dpos[0] * dpos[0]
            for d in range(1, dim):
                r2 = r2 + dpos[d] * dpos[d]
            yield dpos, r2, s

    def _t_pass_half(self, Q):
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h
        Mm = self._mslice(self.M)
        Qm = self._mslice(Q)
        acc = jnp.zeros_like(self._mslice(self.maskf))
        for dpos, r2, s in self._blocks_half():
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            mj = self._rollj(Mm, s)
            qj = self._rollj(Qm, s)
            t = qj[0][None, :, :] * dpos[0]
            for d in range(1, dim):
                t = t + qj[d][None, :, :] * dpos[d]
            acc = acc + jnp.sum(t * dwr * mj[None, :, :], axis=1)
            if s:
                # Mirror: T_j += m_i (Q_i . (p_j - p_i)) dwr = -(Q_i . dpos) dwr m_i
                ti = Qm[0][:, None, :] * dpos[0]
                for d in range(1, dim):
                    ti = ti + Qm[d][:, None, :] * dpos[d]
                r = jnp.sum(ti * dwr * Mm[:, None, :], axis=0)
                acc = acc - jnp.roll(r, s, axis=-1)
        return acc

    def _k_pass_half(self, K):
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h
        MK = self._mslice(self.M * K)
        acc = [jnp.zeros_like(self._mslice(self.maskf)) for _ in range(dim)]
        for dpos, r2, s in self._blocks_half():
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            coeff_j = self._rollj(MK, s)[None, :, :] * dwr
            if s:
                coeff_i = MK[:, None, :] * dwr
            for d in range(dim):
                acc[d] = acc[d] + jnp.sum(dpos[d] * coeff_j, axis=1)
                if s:
                    # Mirror: K_j,d += (k m)_i (p_j - p_i)_d dwr.
                    r = jnp.sum(dpos[d] * coeff_i, axis=0)
                    acc[d] = acc[d] - jnp.roll(r, s, axis=-1)
        return jnp.stack(acc)

    # Spill-extended per-iteration bodies (plain full-stencil fold
    # bodies; mask-free via the sentinel argument — dead slots carry
    # zero mass and far positions).

    def _t_body(self):
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h

        def body(acc, dpos, r2, within, j):
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            t = j["q"][0][None, :, :] * dpos[0]
            for d in range(1, dim):
                t = t + j["q"][d][None, :, :] * dpos[d]
            return acc + jnp.sum(t * dwr * j["m"][None, :, :], axis=1)

        return body

    def _k_body(self):
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h

        def body(acc, dpos, r2, within, j):
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            coeff = j["mk"][None, :, :] * dwr
            return jnp.stack(
                [acc[d] + jnp.sum(dpos[d] * coeff, axis=1)
                 for d in range(dim)]
            )

        return body

    def _t_pass_spill(self, Q):
        main = self._t_pass_half(Q)
        body = self._t_body()
        j_arr = {"m": self.M, "q": Q}
        sp = self._ff_spill_fold(
            j_arr, body,
            jnp.zeros((self.cap2, self.spill_E), jnp.float32),
        )
        adj = self._ff_adj_fold(
            j_arr, body,
            jnp.zeros(
                (self.spec_f.cap, self._adj_cols.shape[0]), jnp.float32
            ),
        )
        return self._assemble(main, sp, adj)

    def _k_pass_spill(self, K):
        main = self._k_pass_half(K)
        body = self._k_body()
        dim = self.dim
        j_arr = {"mk": self.M * K}
        sp = self._ff_spill_fold(
            j_arr, body,
            jnp.zeros((dim, self.cap2, self.spill_E), jnp.float32),
        )
        adj = self._ff_adj_fold(
            j_arr, body,
            jnp.zeros(
                (dim, self.spec_f.cap, self._adj_cols.shape[0]),
                jnp.float32,
            ),
        )
        return self._assemble(main, sp, adj)

    def _hoist_ff_half(self):
        """Half-stencil twin of the ff fold in :meth:`_hoist`: every
        hoisted sum has an i<->j mirror on the shared pair block
        (rho: m_i W; Gf: -grad m_i; sq: |grad|^2 m_i^2; s2: |grad|^2 m_i;
        cnt: the symmetric ``within``)."""
        kd_w, kd_dw = self.kd
        kg_w, kg_dw = self.kg
        dim, h = self.dim, self.h
        h2 = h * h
        need_s2 = self.need_s2
        Mm = self._mslice(self.M)
        maskm = self._mslice(self.maskf)
        z = jnp.zeros_like(maskm)
        rho, sq, s2 = z, z, z
        cnt = jnp.zeros_like(maskm, dtype=jnp.int32)
        gf = [z for _ in range(dim)]
        mask_i = maskm[:, None, :] > 0
        for dpos, r2, s in self._blocks_half():
            _, dwr = w_dwr(r2, h, dim, kg_w, kg_dw)
            wd, _ = w_dwr(r2, h, dim, kd_w, kd_dw)
            within = (r2 <= h2) & mask_i & (
                self._rollj(maskm, s)[None, :, :] > 0
            )
            mj = jnp.where(within, self._rollj(Mm, s)[None, :, :], 0.0)
            rho = rho + jnp.sum(mj * wd, axis=1)
            win_i = jnp.sum(within.astype(jnp.int32), axis=1)
            cnt = cnt + win_i
            if s:
                mi = jnp.where(within, Mm[:, None, :], 0.0)
                rho = rho + jnp.roll(jnp.sum(mi * wd, axis=0), s, axis=-1)
                cnt = cnt + jnp.roll(
                    jnp.sum(within.astype(jnp.int32), axis=0), s, axis=-1
                )
            gsq = jnp.zeros_like(r2)
            for d in range(dim):
                g_d = dpos[d] * dwr
                gf[d] = gf[d] + jnp.sum(g_d * mj, axis=1)
                if s:
                    # grad_ji = -grad_ij.
                    gf[d] = gf[d] - jnp.roll(
                        jnp.sum(g_d * mi, axis=0), s, axis=-1
                    )
                gsq = gsq + g_d * g_d
            sq = sq + jnp.sum(gsq * mj * mj, axis=1)
            if need_s2:
                s2 = s2 + jnp.sum(gsq * mj, axis=1)
            if s:
                sq = sq + jnp.roll(jnp.sum(gsq * mi * mi, axis=0), s, axis=-1)
                if need_s2:
                    s2 = s2 + jnp.roll(
                        jnp.sum(gsq * mi, axis=0), s, axis=-1
                    )
        return rho, jnp.stack(gf), sq, s2, cnt

    def t_pass(self, Q):
        """T_i = sum_ff m_j (Q_j . grad_ij) for a per-slot vector Q."""
        dim = self.dim
        if self.frozen:
            # grad_ij = s_ij (p_i - p_j):
            # T_i = sum_d p_i,d SP(Q_d)_i - SP(sum_d Q_d p_d)_i.
            ch = jnp.concatenate(
                [Q, jnp.sum(Q * self.P, axis=0, keepdims=True)], axis=0
            )
            out = self.sp_multi(ch)
            return jnp.sum(self.P * out[:dim], axis=0) - out[dim]
        if self.spill_E:
            return self._t_pass_spill(Q)
        if self._use_pallas():
            return self._pallas_fns()[1](
                self.spec_f, self.h, self.dim, self.sim.kernel_gradient,
                self.P, self.M, Q,
            )
        if self.half:
            return self._t_pass_half(Q)
        acc = jnp.zeros_like(self.maskf)
        for dpos, dwr, o in self._hot_blocks():
            mj = self.jff(self.M, o)
            qj = self.jff(Q, o)
            t = jnp.zeros_like(dwr)
            for d in range(dim):
                t = t + qj[d][None, :, :] * dpos[d]
            acc = acc + jnp.sum(t * dwr * mj[None, :, :], axis=1)
        return acc

    def k_pass(self, K):
        """K_i = sum_ff k_j m_j grad_ij for a per-slot scalar k."""
        dim = self.dim
        if self.frozen:
            # K_i,d = p_i,d SP(K)_i - SP(K p_d)_i.
            ch = jnp.concatenate([K[None], K[None] * self.P], axis=0)
            out = self.sp_multi(ch)
            return self.P * out[0][None] - out[1:]
        if self.spill_E:
            return self._k_pass_spill(K)
        if self._use_pallas():
            return self._pallas_fns()[0](
                self.spec_f, self.h, self.dim, self.sim.kernel_gradient,
                self.P, self.M, K,
            )
        if self.half:
            return self._k_pass_half(K)
        acc = [jnp.zeros_like(self.maskf) for _ in range(dim)]
        for dpos, dwr, o in self._hot_blocks():
            mj = self.jff(self.M, o)
            kj = self.jff(K, o)
            coeff = kj[None, :, :] * mj[None, :, :] * dwr
            for d in range(dim):
                acc[d] = acc[d] + jnp.sum(dpos[d] * coeff, axis=1)
        return jnp.stack(acc)

    def _pallas_fns(self):
        """(k_pass, t_pass, hoist_ff, hoist_fb) for the configured
        ``pallas_variant``: "v3" = the lo/hi slot-group split (measured
        3.2x the XLA rolls on the 1M k_pass), "v1" = the plain windowed
        kernels with tile-level air skip."""
        if getattr(self.sim, "pallas_variant", "v3") == "v1":
            from ..ops import (
                hoist_fb_pallas,
                hoist_ff_pallas,
                k_pass_pallas,
                t_pass_pallas,
            )

            return (k_pass_pallas, t_pass_pallas, hoist_ff_pallas,
                    hoist_fb_pallas)
        from ..ops.pallas_pair2 import (
            hoist_fb_pallas3,
            hoist_ff_pallas3,
            k_pass_pallas3,
            t_pass_pallas3,
        )

        return (k_pass_pallas3, t_pass_pallas3, hoist_ff_pallas3,
                hoist_fb_pallas3)

    def _use_pallas(self) -> bool:
        import jax

        if self.halo is not None or self.spill_E or self.brute:
            return False
        if self.compact or not getattr(self.sim, "use_pallas", False):
            return False
        try:
            from ..ops import PALLAS_OK
        except Exception:  # noqa: BLE001
            return False
        # Any accelerator backend (the tunneled TPU plugin reports its
        # own platform name, not "tpu").
        return PALLAS_OK and jax.default_backend() != "cpu"

    def delta_density(self, Vp):
        """sum m_j (v_i'-v_j').grad + boundary term via hoisted sums:
        = v_i'.Gsum - T(v') - Sb."""
        t = self.t_pass(Vp)
        return jnp.sum(Vp * self.Gsum, axis=0) - t - self.Sb

    def boundary_forces(self, coef):
        """One boundary-owner pass: F_b = Volb_b sum_i grad_ij coef_i
        (grad w.r.t. the fluid point; dpos in the fold is p_b - p_i).

        Under the spill structure a second fold adds the spill fluid
        slots' contributions (j = spill columns of each boundary cell's
        3^dim neighborhood)."""
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

        Fb = fold_pairs(
            self.offsets, h, dim, self.Pb, self.maskb, self.P, self.maskf,
            self.jbf, {"coef": coef}, body, jnp.zeros_like(self.Pb),
        )
        if self.spill_E:
            C, E = self._Cmain, self.spill_E
            c2s_ext = jnp.concatenate(
                [self.binf.cell_to_spill, jnp.full((1,), E, jnp.int32)]
            )
            sh = jnp.asarray(
                [self.spec_f.flat_shift(o) for o in self.offsets],
                jnp.int32,
            )
            b_cell = jnp.minimum(self._b_active, C)  # void -> C
            nbs = C + c2s_ext[
                jnp.minimum(b_cell[:, None] + sh[None, :], C)
            ]  # [Ab+1, 3^dim] extended spill cols (or void)

            def jv_spill(arr, o):
                return arr[..., : self.cap2, :][..., nbs[:, o]]

            Fb = fold_pairs(
                self.offsets, h, dim, self.Pb, self.maskb, self.P,
                self.maskf, jv_spill, {"coef": coef}, body, Fb,
            )
        return self.Volb[None] * Fb

    # -- force-facing views ---------------------------------------------------

    def force_field_views(self):
        """(jfb, jbf, Pb, Vbvel, Volb, maskb) as the non-pressure force
        passes (``forces_dense``) consume them.

        In sparse-boundary mode the boundary arrays were rematerialized
        onto the full grid at construction (compact-table gathers over
        the full cell axis measured ~3x slower than rolls on TPU), so
        force passes run as plain roll-view blocks."""
        if self.spill_E:
            # The generic force pair passes don't know the spill
            # decomposition; the world disables the spill structure for
            # scenes with dense-layout pair forces (particle-wise forces
            # like elasticity never reach here).
            raise NotImplementedError(
                "dense pair forces are not supported with "
                "dense_spill_columns; the world falls back to the plain "
                "cap tier for such scenes"
            )
        if not self.sparse_b:
            return (self.jfb, self.jbf, self.Pb, self.Vbvel, self.Volb,
                    self.maskb)
        roll = self.jff
        return (
            roll, roll, self._Pb_full, self._Vbvel_full, self._Volb_full,
            self._maskb_full,
        )

    def np_fb_to_native(self, fb_full):
        """Bring a force boundary-feedback grid back to the native
        boundary layout (full grid -> compact columns in sparse mode)."""
        if not self.sparse_b:
            return fb_full
        gather_cols = jnp.where(self._b_is_void, 0, self._b_active)
        out = fb_full[..., gather_cols]
        return out * self.maskb[None] if out.ndim == 3 else out * self.maskb

    # -- layout conversion ---------------------------------------------------

    def vol_grid(self, fluids):
        """Particle volumes in grid layout (mask-derived when uniform)."""
        if self.uniform is not None:
            _fid, m0, rho0 = self.uniform
            return self.maskf * jnp.float32(m0 / rho0)
        return self.to_f(fluids.volumes)

    def to_f(self, values, fill=0.0):
        return dg.to_grid(self.sf, self.binf, values, fill)

    def unbin_f(self, grid, fallback):
        out = dg.from_grid(self.sf, self.binf, grid, 0.0)
        if self.halo is not None:
            keep = self.binf.in_interior
            sel = keep[:, None] if out.ndim == 2 else keep
            return self.halo.merge_particles(
                jnp.where(sel, out, 0.0), keep, fallback
            )
        if out.ndim == 2:
            return jnp.where(self.binf.in_grid[:, None], out, fallback)
        return jnp.where(self.binf.in_grid, out, fallback)

    def unbin_f_multi(self, items):
        """Unbin several fluid grids with ONE packed row gather
        (``dense_grid.from_grid_multi``). ``items``: [(grid, fallback)].
        Halo path falls back to per-channel unbins (the psum merge
        dominates there anyway)."""
        if self.halo is not None:
            return [self.unbin_f(g, fb) for g, fb in items]
        outs = dg.from_grid_multi(self.sf, self.binf, [g for g, _ in items])
        res = []
        for out, (_g, fb) in zip(outs, items):
            sel = (
                self.binf.in_grid[:, None]
                if out.ndim == 2 else self.binf.in_grid
            )
            res.append(jnp.where(sel, out, fb))
        return res

    def unbin_b_multi(self, items):
        """Boundary twin of :meth:`unbin_f_multi`."""
        if self.halo is not None:
            return [self.unbin_b(g, fb) for g, fb in items]
        outs = dg.from_grid_multi(self.sb, self.binb, [g for g, _ in items])
        res = []
        for out, (_g, fb) in zip(outs, items):
            sel = (
                self.binb.in_grid[:, None]
                if out.ndim == 2 else self.binb.in_grid
            )
            res.append(jnp.where(sel, out, fb))
        return res

    def unbin_b(self, grid, fallback):
        out = dg.from_grid(self.sb, self.binb, grid, 0.0)
        if self.halo is not None:
            keep = self.binb.in_interior
            sel = keep[:, None] if out.ndim == 2 else keep
            return self.halo.merge_particles(
                jnp.where(sel, out, 0.0), keep, fallback
            )
        if out.ndim == 2:
            return jnp.where(self.binb.in_grid[:, None], out, fallback)
        return jnp.where(self.binb.in_grid, out, fallback)
