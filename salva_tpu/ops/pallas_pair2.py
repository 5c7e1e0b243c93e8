"""Occupancy-exact ("true pairs") Pallas TPU pair-pass kernels.

The v1 kernels (``pallas_pair.py``) skip whole 512-cell tiles that hold
no particle; within an occupied tile they still compute every
``[cap, cap]`` pair slot of every shift — the same work as the XLA roll
folds. The measured roofline (DESIGN.md "Roofline") shows that the roll
formulation's remaining ~28x slot inflation over true pairs decomposes
as ~1.67x air columns x ~2x i-cap padding x ~2x j-cap padding x the
stencil's sphere-in-cube factor. These kernels attack the first three
with *slot-group gating*: the dense ``[cap, C]`` layout is already a
sorted per-cell particle list with static offsets (cell c's rank-r
particle sits at slot ``[r, c]``; ranks fill from 0), so "dynamic
per-cell counts" reduce to *which 8-sublane slot groups are live* —
group g of cell c is live iff the cell holds more than ``8 g``
particles. This is the TPU-shaped equivalent of the reference's
per-occupied-cell neighbor iteration
(``/root/reference/src/geometry/contacts.rs:154-252``), which walks
exactly the particles each cell actually holds.

Two formulations, both measured at a 1M-particle dam-break state
(tools/exp_truepairs.py, v5e):

- **v2** (kept for the record): one kernel, every ``[8, 8, 128]``
  slot-group block predicated on ``own_flag[g_i] & j_flag[g_j]`` with
  scratch-ref accumulation. Work drops to the live-block fraction
  (22.9% measured) but the per-block ``@pl.when`` regions + VMEM RMW
  run ~3x slower per slot than v1's branch-free code: 22.0 ms vs XLA's
  40.3 ms — only 1.83x.
- **v3** (the production path): split the pair universe instead.
  The common case — group 0 x group 0, live in every occupied cell —
  runs as the UNGATED v1 kernel on the cap-8 row slice (branch-free
  inner code at v1's full throughput). Every block touching a hi group
  (gi > 0 or gj > 0) — live only where cell occupancy exceeds 8, a
  small transient fraction of the trajectory (tools/exp_maxocc.py) —
  runs in a complement kernel gated per (chunk, shift, group pair)
  with ``pl.when`` + scratch accumulation (a VALUE-level ``lax.cond``
  lowers to compute-both-branches + select on Mosaic — measured: the
  "gated" blocks cost the same as unconditional ones), and whole
  chunks skip when neither their own rows nor any stencil neighbor has
  a hi flag (``_pallas_hi._fired_flags``).

Correctness is unconditional: skipped blocks contribute exactly zero
(empty slots carry the far-position sentinel and zero mass), so gating
is a pure work elision — outputs match the XLA folds to
float-accumulation-order tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pragma: no cover - import guard for non-TPU-capable installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # noqa: BLE001
    PALLAS_OK = False

from ..geometry import dense_grid as dg
from ._pallas_hi import (
    _fired_flags,
    _group_flags,
    _j_flag,
    hi_complement,
)
from .pallas_pair import (
    _compiler_params,
    _grad_scale_fn,
    _halo,
    _pad_cap,
    _pad_last,
    _shifts,
    _w_scale_fn,
    hoist_ff_pallas,
    k_pass_pallas,
    t_pass_pallas,
)


def _build_k2_kernel(spec, h, dim, tile, kernel_gradient):
    capp = _pad_cap(spec.cap)
    G = capp // 8
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    nchunks = tile // 128
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def kernel(flags_ref, p_hbm, mk_hbm, out_ref, pwin, mkwin, acc, sem):
        i = pl.program_id(0)
        out_ref[:, :, :] = jnp.zeros((dim, capp, tile), jnp.float32)
        base_flag = w // 128 + i * nchunks

        own_any = flags_ref[0, base_flag]
        for g in range(G):
            for ch in range(nchunks):
                if g or ch:
                    own_any = own_any | flags_ref[g, base_flag + ch]

        @pl.when(own_any != 0)
        def _compute():
            c0 = i * tile
            cps = [
                pltpu.make_async_copy(
                    p_hbm.at[:, :, pl.ds(c0, win)], pwin, sem.at[0]
                ),
                pltpu.make_async_copy(
                    mk_hbm.at[:, pl.ds(c0, win)], mkwin, sem.at[1]
                ),
            ]
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

            # Per-group row views of the windows, loaded once as values
            # (per-shift unaligned lane slices then happen at value
            # level; ref slices at non-128-aligned offsets don't
            # compile — same pattern as v1).
            pwg = [
                [
                    jax.lax.slice_in_dim(pwin[d], g * 8, g * 8 + 8, axis=0)
                    for g in range(G)
                ]
                for d in range(dim)
            ]
            mkwg = [
                jax.lax.slice_in_dim(mkwin[:, :], g * 8, g * 8 + 8, axis=0)
                for g in range(G)
            ]

            for ch in range(nchunks):
                lane0 = ch * 128
                for gi in range(G):
                    own_flag = flags_ref[gi, base_flag + ch]

                    @pl.when(own_flag != 0)
                    def _group(ch=ch, gi=gi, lane0=lane0):
                        own_p = [
                            jax.lax.slice_in_dim(
                                pwg[d][gi], w + lane0, w + lane0 + 128,
                                axis=1,
                            )
                            for d in range(dim)
                        ]
                        acc[:, :, :] = jnp.zeros((dim, 8, 128), jnp.float32)
                        for s in shifts:
                            for gj in range(G):
                                jf = _j_flag(
                                    flags_ref, gj, base_flag + ch, s
                                )

                                @pl.when(jf != 0)
                                def _block(s=s, gj=gj, lane0=lane0):
                                    base = w + lane0 + s
                                    pj = [
                                        jax.lax.slice_in_dim(
                                            pwg[d][gj], base, base + 128,
                                            axis=1,
                                        )
                                        for d in range(dim)
                                    ]
                                    mkj = jax.lax.slice_in_dim(
                                        mkwg[gj], base, base + 128, axis=1
                                    )
                                    dpos = [
                                        own_p[d][:, None, :]
                                        - pj[d][None, :, :]
                                        for d in range(dim)
                                    ]
                                    r2 = dpos[0] * dpos[0]
                                    for d in range(1, dim):
                                        r2 = r2 + dpos[d] * dpos[d]
                                    coeff = dwr_of(r2) * mkj[None, :, :]
                                    acc[:, :, :] = acc[:, :, :] + jnp.stack(
                                        [
                                            jnp.sum(dpos[d] * coeff, axis=1)
                                            for d in range(dim)
                                        ]
                                    )

                        out_ref[
                            :, gi * 8 : (gi + 1) * 8, lane0 : lane0 + 128
                        ] = acc[:, :, :]

    return kernel, w, win


def k_pass_pallas2(spec, h: float, dim: int, kernel_gradient: str, P, M, K,
                   tile: int = 512, interpret: bool = False):
    """v2 formulation of the gated k_pass (measured slower than v3;
    kept for the A/B record — see the module docstring)."""
    kernel, w, win = _build_k2_kernel(spec, h, dim, tile, kernel_gradient)
    capp = _pad_cap(spec.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    MKp, _ = _pad_last(M * K, w, tile, 0.0)
    Mp, _ = _pad_last(M, w, tile, 0.0)
    flags = _group_flags(Mp, capp, w)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cp // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (dim, capp, tile), lambda i, flags_ref: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((dim, capp, win), jnp.float32),
                pltpu.VMEM((capp, win), jnp.float32),
                pltpu.VMEM((dim, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=jax.ShapeDtypeStruct((dim, capp, cp), jnp.float32),
    )(flags, Pp, MKp)
    return out[:, : spec.cap, :c]


# -- v3: branch-free lo kernel + gated hi-complement kernel ------------------


def k_pass_pallas3(spec, h: float, dim: int, kernel_gradient: str, P, M, K,
                   tile: int = 512, interpret: bool = False):
    """K_i = sum_ff (k m)_j grad_ij via the lo/hi split: branch-free v1
    kernel on the cap-8 slice + gated hi-complement kernel."""
    capp = _pad_cap(spec.cap)
    if capp <= 8:
        return k_pass_pallas(spec, h, dim, kernel_gradient, P, M, K,
                             tile=tile, interpret=interpret)
    lo = 8
    A = k_pass_pallas(
        spec.replace(cap=lo), h, dim, kernel_gradient,
        P[:, :lo], M[:lo], K[:lo], tile=tile, interpret=interpret,
    )

    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def block(dpos, r2, jvecs, jscls):
        (mkj,) = jscls
        coeff = dwr_of(r2) * mkj[None, :, :]
        return jnp.stack(
            [jnp.sum(dpos[d] * coeff, axis=1) for d in range(dim)]
        )

    hi = hi_complement(
        spec, dim, P, M, vecs=(), scls=(M * K,), n_out=dim,
        block_fn=block, tile=tile, interpret=interpret,
    )
    return hi.at[:, :lo, :].add(A)


def t_pass_pallas3(spec, h: float, dim: int, kernel_gradient: str, P, M, Q,
                   tile: int = 512, interpret: bool = False):
    """T_i = sum_ff m_j (Q_j . grad_ij) via the lo/hi split."""
    capp = _pad_cap(spec.cap)
    if capp <= 8:
        return t_pass_pallas(spec, h, dim, kernel_gradient, P, M, Q,
                             tile=tile, interpret=interpret)
    lo = 8
    A = t_pass_pallas(
        spec.replace(cap=lo), h, dim, kernel_gradient,
        P[:, :lo], M[:lo], Q[:, :lo], tile=tile, interpret=interpret,
    )

    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def block(dpos, r2, jvecs, jscls):
        (qj,) = jvecs
        (mj,) = jscls
        dwr = dwr_of(r2)
        t = qj[0][None, :, :] * dpos[0]
        for d in range(1, dim):
            t = t + qj[d][None, :, :] * dpos[d]
        return jnp.sum(t * dwr * mj[None, :, :], axis=1)[None]

    hi = hi_complement(
        spec, dim, P, M, vecs=(Q,), scls=(M,), n_out=1,
        block_fn=block, tile=tile, interpret=interpret,
    )[0]
    return hi.at[:lo, :].add(A)


def hoist_ff_pallas3(spec, h: float, dim: int, kernel_density: str,
                     kernel_gradient: str, P, M, need_s2: bool = True,
                     tile: int = 512, interpret: bool = False):
    """(rho_ff, Gf, sq_ff, s2_ff, cnt_ff) via the lo/hi split. The
    count channel accumulates in f32 inside the complement kernel
    (exact for integer increments far below 2^24) and is cast back."""
    capp = _pad_cap(spec.cap)
    if capp <= 8:
        return hoist_ff_pallas(
            spec, h, dim, kernel_density, kernel_gradient, P, M,
            need_s2=need_s2, tile=tile, interpret=interpret,
        )
    lo = 8
    rho, gf, sq, s2, cnt = hoist_ff_pallas(
        spec.replace(cap=lo), h, dim, kernel_density, kernel_gradient,
        P[:, :lo], M[:lo], need_s2=need_s2, tile=tile,
        interpret=interpret,
    )

    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)
    w_of = _w_scale_fn(kernel_density, h, dim)
    h2 = h * h

    def block(dpos, r2, jvecs, jscls):
        (mj,) = jscls
        mj = mj[None, :, :]
        dwr = dwr_of(r2)
        rows = [jnp.sum(mj * w_of(r2), axis=1)]
        gsq = jnp.zeros_like(r2)
        for d in range(dim):
            g_d = dpos[d] * dwr
            rows.append(jnp.sum(g_d * mj, axis=1))
            gsq = gsq + g_d * g_d
        rows.append(jnp.sum(gsq * mj * mj, axis=1))
        rows.append(jnp.sum(gsq * mj, axis=1))
        rows.append(
            jnp.sum(((r2 <= h2) & (mj != 0.0)).astype(jnp.float32), axis=1)
        )
        return jnp.stack(rows)

    hi = hi_complement(
        spec, dim, P, M, vecs=(), scls=(M,), n_out=dim + 4,
        block_fn=block, tile=tile, interpret=interpret,
    )
    rho_o = hi[0].at[:lo, :].add(rho)
    gf_o = hi[1 : 1 + dim].at[:, :lo, :].add(gf)
    sq_o = hi[1 + dim].at[:lo, :].add(sq)
    s2_o = hi[2 + dim].at[:lo, :].add(s2)
    cnt_o = hi[3 + dim].astype(jnp.int32).at[:lo, :].add(cnt)
    return rho_o, gf_o, sq_o, s2_o, cnt_o


def hoist_fb_pallas3(spec_f, cap_b: int, h: float, dim: int,
                     kernel_density: str, kernel_gradient: str, P, M,
                     Pb, Volb, Vbvel, need_s2: bool = True,
                     tile: int = 512, interpret: bool = False):
    """Fluid-boundary hoist via the lo/hi split. The boundary j side has
    no fluid slot groups, so the complement is simply the v1 fb kernel
    run on the hi fluid row slice — its own per-tile occupancy flags
    (from the hi rows' masses) skip everything when no cell exceeds
    occupancy 8."""
    from .pallas_pair import hoist_fb_pallas

    capp = _pad_cap(spec_f.cap)
    if capp <= 8:
        return hoist_fb_pallas(
            spec_f, cap_b, h, dim, kernel_density, kernel_gradient,
            P, M, Pb, Volb, Vbvel, need_s2=need_s2, tile=tile,
            interpret=interpret,
        )
    lo = 8
    parts = []
    for r0 in range(0, capp, lo):
        sl = slice(r0, r0 + lo)
        parts.append(hoist_fb_pallas(
            spec_f.replace(cap=min(lo, spec_f.cap - r0)), cap_b, h, dim,
            kernel_density, kernel_gradient, P[:, sl], M[sl], Pb, Volb,
            Vbvel, need_s2=need_s2, tile=tile, interpret=interpret,
        ))
    outs = []
    for k in range(6):
        outs.append(jnp.concatenate([p[k] for p in parts], axis=-2))
    rho, gb, sq, s2, sb, cnt = outs
    return rho, gb, sq, s2, sb, cnt
