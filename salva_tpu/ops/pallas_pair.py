"""Pallas TPU kernels for the per-iteration dense pair passes.

The XLA lowering of ``DenseCtx.t_pass`` / ``k_pass`` (27 shifted views,
``[cap_i, cap_j, C]`` pair blocks) computes every pair slot of every
cell — including the 45-70% of window cells that are air at dam-break
states. These kernels tile the flat cell axis C: each program DMAs its
tile plus a halo window of ``W = flat_shift((1,..,1))`` cells into VMEM
once, then walks all 3^dim neighbor offsets as *static slices* of the
window, accumulating entirely on-chip — and each program first checks a
prefetched per-tile occupancy flag, skipping DMA and compute outright
for air tiles (``@pl.when``). That skip is the structural advantage over
the XLA folds, which cannot express data-dependent work elision; the
kernel's pair math itself (fused cubic dW/r) is identical.

Correctness mirrors the XLA path exactly: empty slots carry the far
position sentinel (kernel support zeroes their terms) and zero masses, so
no occupancy masks are needed; halo cells that fall outside the array are
padded the same way by the caller wrapper.

Layout: channel-major ``[cap, Cp]`` blocks with the big cell axis on the
128-wide lanes (Cp = C padded to the tile size).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pragma: no cover - import guard for non-TPU-capable installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # noqa: BLE001
    PALLAS_OK = False

from ..geometry import dense_grid as dg
from ..kernels import get_kernel

EPSILON = float(jnp.finfo(jnp.float32).eps)

# Mosaic's default scoped-VMEM limit is 16 MiB; at bench window sizes
# (C ~ 32k cells) the hoist kernels' windows + multi-output blocks need
# more (measured 37 MiB at 97k). v5e/v5p have 128 MiB VMEM per core —
# raise the per-kernel cap and let the compiler place buffers.
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    if not PALLAS_OK:  # pragma: no cover
        return None
    cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams", None
    )
    if cls is None:  # pragma: no cover - depends on the JAX version
        # Without the raised VMEM limit the hoist kernels OOM at bench
        # window sizes (C ~ 32k needs ~37 MiB scoped VMEM vs the 16 MiB
        # Mosaic default, ADVICE r3) — make that attributable instead of
        # resurfacing as a bare Mosaic allocation error.
        import warnings

        warnings.warn(
            "pallas_pair: no pltpu.CompilerParams class on this JAX "
            f"version; cannot raise vmem_limit_bytes to {_VMEM_LIMIT} — "
            "large grids may fail VMEM allocation in the hoist kernels",
            RuntimeWarning,
            stacklevel=3,
        )
        return None
    return cls(vmem_limit_bytes=_VMEM_LIMIT)


def _halo(spec: dg.DenseGridSpec) -> int:
    """Max |flat shift| over the neighbor offsets."""
    return max(
        abs(spec.flat_shift(off)) for off in dg.neighbor_offsets(spec.dim)
    )


def _shifts(spec: dg.DenseGridSpec) -> Tuple[int, ...]:
    return tuple(spec.flat_shift(off) for off in dg.neighbor_offsets(spec.dim))


def _grad_scale_fn(kernel_gradient: str, h: float, dim: int):
    if kernel_gradient == "cubic":
        # Fused dW/dr / r straight from r^2 — one sqrt + one rsqrt, no
        # division; bit-identical to the XLA folds' fast path
        # (dense_common.w_dwr), which these kernels must reproduce.
        from ..kernels.sph import _cubic_normalizer

        inv_h2 = 1.0 / (h * h)
        scale = _cubic_normalizer(h, dim) * inv_h2

        def dwr_of(r2):
            q2 = r2 * inv_h2
            q = jnp.sqrt(q2)
            one_q = 1.0 - q
            rq = jax.lax.rsqrt(jnp.maximum(q2, 1.0e-12))
            far_d = -6.0 * one_q * one_q * rq
            near_d = 18.0 * q - 12.0
            cut = (q > 1.0) | (q <= 1.0e-5)
            return scale * jnp.where(
                cut, 0.0, jnp.where(q <= 0.5, near_d, far_d)
            )

        return dwr_of

    _, kg_dw = get_kernel(kernel_gradient)

    def dwr_of(r2):
        r = jnp.sqrt(r2)
        safe = jnp.where(r > EPSILON, r, 1.0)
        return jnp.where(r > EPSILON, kg_dw(r, h, dim) / safe, 0.0)

    return dwr_of


def _pad_cap(cap: int) -> int:
    """Sublane-align the cap axis (DMA slices need multiples of 8)."""
    return -(-cap // 8) * 8


def _pad_last(arr, w: int, tile: int, fill):
    """Pad the cap axis to the sublane multiple and the last axis with
    ``w`` halo cells each side + round the interior up to a multiple of
    ``tile`` (fill = sentinel/zero)."""
    c = arr.shape[-1]
    cap = arr.shape[-2]
    cp = -(-c // tile) * tile
    pad = [(0, 0)] * (arr.ndim - 2) + [
        (0, _pad_cap(cap) - cap),
        (w, w + (cp - c)),
    ]
    return jnp.pad(arr, pad, constant_values=fill), cp


def _build_t_kernel(spec, h, dim, tile, kernel_gradient):
    cap = _pad_cap(spec.cap)
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def kernel(occ_ref, p_hbm, m_hbm, q_hbm, out_ref, pwin, mwin, qwin,
               sem):
        i = pl.program_id(0)

        # Occupancy skip — the structural edge over the XLA folds: a tile
        # with no live i-particle produces only zeros, so skip its DMA
        # and its 3^dim pair blocks entirely (work becomes proportional
        # to OCCUPIED tiles; the fitted window still holds 45-70% air).
        @pl.when(occ_ref[i] == 0)
        def _skip():
            out_ref[:, :] = jnp.zeros((cap, tile), jnp.float32)

        @pl.when(occ_ref[i] != 0)
        def _compute():
            c0 = i * tile  # window start in padded coords
            cps = [
                pltpu.make_async_copy(
                    p_hbm.at[:, :, pl.ds(c0, win)], pwin, sem.at[0]
                ),
                pltpu.make_async_copy(
                    m_hbm.at[:, pl.ds(c0, win)], mwin, sem.at[1]
                ),
                pltpu.make_async_copy(
                    q_hbm.at[:, :, pl.ds(c0, win)], qwin, sem.at[2]
                ),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            # Load whole windows as values once; the per-offset unaligned
            # slices then happen at value level (Mosaic lowers them to
            # vector shifts — ref slices at non-128-aligned offsets don't
            # compile).
            pw = [pwin[d] for d in range(dim)]
            mw = mwin[:, :]
            qw = [qwin[d] for d in range(dim)]
            own_p = [
                jax.lax.slice_in_dim(pw[d], w, w + tile, axis=1)
                for d in range(dim)
            ]
            acc = jnp.zeros((cap, tile), jnp.float32)
            for s in shifts:
                base = w + s
                pj = [
                    jax.lax.slice_in_dim(pw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                mj = jax.lax.slice_in_dim(mw, base, base + tile, axis=1)
                qj = [
                    jax.lax.slice_in_dim(qw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                # pair block [cap_i, cap_j, tile]
                dpos = [
                    own_p[d][:, None, :] - pj[d][None, :, :]
                    for d in range(dim)
                ]
                r2 = dpos[0] * dpos[0]
                for d in range(1, dim):
                    r2 = r2 + dpos[d] * dpos[d]
                dwr = dwr_of(r2)
                t = qj[0][None, :, :] * dpos[0]
                for d in range(1, dim):
                    t = t + qj[d][None, :, :] * dpos[d]
                acc = acc + jnp.sum(t * dwr * mj[None, :, :], axis=1)
            out_ref[:, :] = acc

    return kernel, w, win


def _occupancy(M, c: int, cp: int, tile: int):
    """Per-tile ``any live i-particle`` flags from the mass channel
    (empty slots carry m = 0 in every layout, uniform or not)."""
    occ = jnp.pad(jnp.any(M != 0.0, axis=0), ((0, cp - c),))
    return occ.reshape(cp // tile, tile).any(axis=1).astype(jnp.int32)


def t_pass_pallas(spec, h: float, dim: int, kernel_gradient: str, P, M, Q,
                  tile: int = 512, interpret: bool = False):
    """T_i = sum_ff m_j (Q_j . grad_ij), fused on TPU; air tiles skipped."""
    kernel, w, win = _build_t_kernel(spec, h, dim, tile, kernel_gradient)
    cap = _pad_cap(spec.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    Mp, _ = _pad_last(M, w, tile, 0.0)
    Qp, _ = _pad_last(Q, w, tile, 0.0)
    occ = _occupancy(M, c, cp, tile)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cp // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (cap, tile), lambda i, occ_ref: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((dim, cap, win), jnp.float32),
                pltpu.VMEM((cap, win), jnp.float32),
                pltpu.VMEM((dim, cap, win), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=jax.ShapeDtypeStruct((cap, cp), jnp.float32),
    )(occ, Pp, Mp, Qp)
    return out[: spec.cap, :c]


def _w_scale_fn(kernel_density: str, h: float, dim: int):
    if kernel_density == "cubic":
        from ..kernels.sph import _cubic_normalizer

        norm = _cubic_normalizer(h, dim)
        inv_h2 = 1.0 / (h * h)

        def w_of(r2):
            q2 = r2 * inv_h2
            q = jnp.sqrt(q2)
            near_w = 1.0 + (q2 * q - q2) * 6.0
            one_q = 1.0 - q
            far_w = one_q * one_q * one_q * 2.0
            return norm * jnp.where(
                q <= 0.5, near_w, jnp.where(q <= 1.0, far_w, 0.0)
            )

        return w_of

    w_fn, _ = get_kernel(kernel_density)

    def w_of(r2):
        return w_fn(jnp.sqrt(r2), h, dim)

    return w_of


def _build_hoist_kernel(spec, h, dim, tile, kernel_density,
                        kernel_gradient, need_s2):
    """Fluid-fluid hoist: rho, Gf, sum|m grad|^2, [s2,] count in ONE
    windowed pass (the per-substep fold of ``DenseCtx._hoist``'s
    ``ff_body``), with the same air-tile skip as the iteration passes."""
    cap = _pad_cap(spec.cap)
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)
    w_of = _w_scale_fn(kernel_density, h, dim)
    h2 = h * h

    def kernel(occ_ref, p_hbm, m_hbm, rho_ref, g_ref, sq_ref, s2_ref,
               cnt_ref, pwin, mwin, sem):
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _skip():
            z = jnp.zeros((cap, tile), jnp.float32)
            rho_ref[:, :] = z
            g_ref[:, :, :] = jnp.zeros((dim, cap, tile), jnp.float32)
            sq_ref[:, :] = z
            s2_ref[:, :] = z
            cnt_ref[:, :] = jnp.zeros((cap, tile), jnp.int32)

        @pl.when(occ_ref[i] != 0)
        def _compute():
            c0 = i * tile
            cps = [
                pltpu.make_async_copy(
                    p_hbm.at[:, :, pl.ds(c0, win)], pwin, sem.at[0]
                ),
                pltpu.make_async_copy(
                    m_hbm.at[:, pl.ds(c0, win)], mwin, sem.at[1]
                ),
            ]
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

            pw = [pwin[d] for d in range(dim)]
            mw = mwin[:, :]
            own_p = [
                jax.lax.slice_in_dim(pw[d], w, w + tile, axis=1)
                for d in range(dim)
            ]
            z = jnp.zeros((cap, tile), jnp.float32)
            rho, sq, s2 = z, z, z
            cnt = jnp.zeros((cap, tile), jnp.int32)
            gf = [z for _ in range(dim)]
            for s in shifts:
                base = w + s
                pj = [
                    jax.lax.slice_in_dim(pw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                mj = jax.lax.slice_in_dim(mw, base, base + tile, axis=1)[
                    None, :, :
                ]
                dpos = [
                    own_p[d][:, None, :] - pj[d][None, :, :]
                    for d in range(dim)
                ]
                r2 = dpos[0] * dpos[0]
                for d in range(1, dim):
                    r2 = r2 + dpos[d] * dpos[d]
                dwr = dwr_of(r2)
                rho = rho + jnp.sum(mj * w_of(r2), axis=1)
                gsq = jnp.zeros_like(r2)
                for d in range(dim):
                    g_d = dpos[d] * dwr
                    gf[d] = gf[d] + jnp.sum(g_d * mj, axis=1)
                    gsq = gsq + g_d * g_d
                sq = sq + jnp.sum(gsq * mj * mj, axis=1)
                if need_s2:
                    s2 = s2 + jnp.sum(gsq * mj, axis=1)
                cnt = cnt + jnp.sum(
                    ((r2 <= h2) & (mj != 0.0)).astype(jnp.int32), axis=1
                )
            rho_ref[:, :] = rho
            for d in range(dim):
                g_ref[d, :, :] = gf[d]
            sq_ref[:, :] = sq
            s2_ref[:, :] = s2
            cnt_ref[:, :] = cnt

    return kernel, w, win


def hoist_ff_pallas(spec, h: float, dim: int, kernel_density: str,
                    kernel_gradient: str, P, M, need_s2: bool = True,
                    tile: int = 512, interpret: bool = False):
    """(rho_ff, Gf, sq_ff, s2_ff, cnt_ff) fused on TPU; air tiles
    skipped. Matches ``DenseCtx._hoist``'s ff fold: count uses
    ``(r2 <= h^2) & (m_j != 0)`` which equals the masked XLA count on
    live slots (and is exactly right on dead slots too — sentinel
    positions put every live pair out of range, and dead j carry m=0)."""
    kernel, w, win = _build_hoist_kernel(
        spec, h, dim, tile, kernel_density, kernel_gradient, need_s2
    )
    cap = _pad_cap(spec.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    Mp, _ = _pad_last(M, w, tile, 0.0)
    occ = _occupancy(M, c, cp, tile)

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cp // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (dim, cap, tile), lambda i, occ_ref: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((dim, cap, win), jnp.float32),
                pltpu.VMEM((cap, win), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=[
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((dim, cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.int32),
        ],
    )(occ, Pp, Mp)
    rho, gf, sq, s2, cnt = outs
    return (
        rho[: spec.cap, :c],
        gf[:, : spec.cap, :c],
        sq[: spec.cap, :c],
        s2[: spec.cap, :c],
        cnt[: spec.cap, :c],
    )


def _build_fb_hoist_kernel(spec, cap_b_pad, h, dim, tile, kernel_density,
                           kernel_gradient, need_s2):
    """Fluid-boundary hoist: rho_fb, Gb, sq_fb, [s2_fb,] Sb, count in one
    windowed pass (``DenseCtx._hoist``'s ``fb_body``). Tiles are skipped
    when they hold no live fluid OR no boundary particle within the halo
    window — walls touch few tiles, so most of the grid skips."""
    cap = _pad_cap(spec.cap)
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)
    w_of = _w_scale_fn(kernel_density, h, dim)
    h2 = h * h

    def kernel(occ_ref, p_hbm, pb_hbm, volb_hbm, vb_hbm, rho_ref, g_ref,
               sq_ref, s2_ref, sb_ref, cnt_ref, pown, pbwin, volbwin,
               vbwin, sem):
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _skip():
            z = jnp.zeros((cap, tile), jnp.float32)
            rho_ref[:, :] = z
            g_ref[:, :, :] = jnp.zeros((dim, cap, tile), jnp.float32)
            sq_ref[:, :] = z
            s2_ref[:, :] = z
            sb_ref[:, :] = z
            cnt_ref[:, :] = jnp.zeros((cap, tile), jnp.int32)

        @pl.when(occ_ref[i] != 0)
        def _compute():
            c0 = i * tile
            cps = [
                pltpu.make_async_copy(
                    p_hbm.at[:, :, pl.ds(c0 + w, tile)], pown, sem.at[0]
                ),
                pltpu.make_async_copy(
                    pb_hbm.at[:, :, pl.ds(c0, win)], pbwin, sem.at[1]
                ),
                pltpu.make_async_copy(
                    volb_hbm.at[:, pl.ds(c0, win)], volbwin, sem.at[2]
                ),
                pltpu.make_async_copy(
                    vb_hbm.at[:, :, pl.ds(c0, win)], vbwin, sem.at[3]
                ),
            ]
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

            own_p = [pown[d] for d in range(dim)]
            pbw = [pbwin[d] for d in range(dim)]
            volw = volbwin[:, :]
            vbw = [vbwin[d] for d in range(dim)]
            z = jnp.zeros((cap, tile), jnp.float32)
            rho, sq, s2, sb = z, z, z, z
            cnt = jnp.zeros((cap, tile), jnp.int32)
            gb = [z for _ in range(dim)]
            for s in shifts:
                base = w + s
                pj = [
                    jax.lax.slice_in_dim(pbw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                vj = jax.lax.slice_in_dim(volw, base, base + tile, axis=1)[
                    None, :, :
                ]
                vbj = [
                    jax.lax.slice_in_dim(vbw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                dpos = [
                    own_p[d][:, None, :] - pj[d][None, :, :]
                    for d in range(dim)
                ]
                r2 = dpos[0] * dpos[0]
                for d in range(1, dim):
                    r2 = r2 + dpos[d] * dpos[d]
                dwr = dwr_of(r2)
                rho = rho + jnp.sum(vj * w_of(r2), axis=1)
                gsq = jnp.zeros_like(r2)
                vdotg = jnp.zeros_like(r2)
                for d in range(dim):
                    g_d = dpos[d] * dwr
                    gb[d] = gb[d] + jnp.sum(g_d * vj, axis=1)
                    gsq = gsq + g_d * g_d
                    vdotg = vdotg + vbj[d][None, :, :] * g_d * vj
                sq = sq + jnp.sum(gsq * vj * vj, axis=1)
                if need_s2:
                    s2 = s2 + jnp.sum(gsq * vj, axis=1)
                sb = sb + jnp.sum(vdotg, axis=1)
                cnt = cnt + jnp.sum(
                    ((r2 <= h2) & (vj != 0.0)).astype(jnp.int32), axis=1
                )
            rho_ref[:, :] = rho
            for d in range(dim):
                g_ref[d, :, :] = gb[d]
            sq_ref[:, :] = sq
            s2_ref[:, :] = s2
            sb_ref[:, :] = sb
            cnt_ref[:, :] = cnt

    return kernel, w, win


def hoist_fb_pallas(spec_f, cap_b: int, h: float, dim: int,
                    kernel_density: str, kernel_gradient: str, P, M,
                    Pb, Volb, Vbvel, need_s2: bool = True,
                    tile: int = 512, interpret: bool = False):
    """(rho_fb, Gb, sq_fb, s2_fb, Sb, cnt_fb) fused on TPU. ``Pb``/
    ``Volb``/``Vbvel`` are the full-grid boundary channels ([cap_b, C]
    cell layout matching the fluid grid's flat indexing); ``M`` is only
    used for the fluid-side occupancy flags."""
    capb = _pad_cap(cap_b)
    kernel, w, win = _build_fb_hoist_kernel(
        spec_f, capb, h, dim, tile, kernel_density, kernel_gradient,
        need_s2,
    )
    cap = _pad_cap(spec_f.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    Pbp, _ = _pad_last(Pb, w, tile, dg.POS_SENTINEL)
    Volbp, _ = _pad_last(Volb, w, tile, 0.0)
    Vbp, _ = _pad_last(Vbvel, w, tile, 0.0)
    # Skip tiles with no live fluid OR no boundary within the halo
    # window: OR the per-tile boundary flags over +/- ceil(halo/tile)
    # neighbor tiles.
    occ_f = _occupancy(M, c, cp, tile)
    occ_b = _occupancy(Volb, c, cp, tile)
    k = -(-_halo(spec_f) // tile)
    occ_b_win = occ_b
    for off in range(1, k + 1):
        occ_b_win = (
            occ_b_win
            | jnp.roll(occ_b, off).at[:off].set(0)
            | jnp.roll(occ_b, -off).at[-off:].set(0)
        )
    occ = (occ_f & occ_b_win).astype(jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=[
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (dim, cap, tile), lambda i, occ_ref: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ] + [
                pl.BlockSpec(
                    (cap, tile), lambda i, occ_ref: (0, i),
                    memory_space=pltpu.VMEM,
                )
            ] * 4,
            scratch_shapes=[
                pltpu.VMEM((dim, cap, tile), jnp.float32),
                pltpu.VMEM((dim, capb, win), jnp.float32),
                pltpu.VMEM((capb, win), jnp.float32),
                pltpu.VMEM((dim, capb, win), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=[
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((dim, cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.float32),
            jax.ShapeDtypeStruct((cap, cp), jnp.int32),
        ],
    )(occ, Pp, Pbp, Volbp, Vbp)
    rho, gb, sq, s2, sb, cnt = outs
    return (
        rho[: spec_f.cap, :c],
        gb[:, : spec_f.cap, :c],
        sq[: spec_f.cap, :c],
        s2[: spec_f.cap, :c],
        sb[: spec_f.cap, :c],
        cnt[: spec_f.cap, :c],
    )


def _build_k_kernel(spec, h, dim, tile, kernel_gradient):
    cap = _pad_cap(spec.cap)
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def kernel(occ_ref, p_hbm, mk_hbm, out_ref, pwin, mkwin, sem):
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _skip():
            out_ref[:, :, :] = jnp.zeros((dim, cap, tile), jnp.float32)

        @pl.when(occ_ref[i] != 0)
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

            pw = [pwin[d] for d in range(dim)]
            mkw = mkwin[:, :]
            own_p = [
                jax.lax.slice_in_dim(pw[d], w, w + tile, axis=1)
                for d in range(dim)
            ]
            accs = [jnp.zeros((cap, tile), jnp.float32) for _ in range(dim)]
            for s in shifts:
                base = w + s
                pj = [
                    jax.lax.slice_in_dim(pw[d], base, base + tile, axis=1)
                    for d in range(dim)
                ]
                mkj = jax.lax.slice_in_dim(mkw, base, base + tile, axis=1)
                dpos = [
                    own_p[d][:, None, :] - pj[d][None, :, :]
                    for d in range(dim)
                ]
                r2 = dpos[0] * dpos[0]
                for d in range(1, dim):
                    r2 = r2 + dpos[d] * dpos[d]
                coeff = dwr_of(r2) * mkj[None, :, :]
                for d in range(dim):
                    accs[d] = accs[d] + jnp.sum(dpos[d] * coeff, axis=1)
            for d in range(dim):
                out_ref[d, :, :] = accs[d]

    return kernel, w, win


def k_pass_pallas(spec, h: float, dim: int, kernel_gradient: str, P, M, K,
                  tile: int = 512, interpret: bool = False):
    """K_i = sum_ff (k m)_j grad_ij, fused on TPU.

    The scalar coefficient k and mass m enter only as the product, so the
    kernel takes one fused ``mk = m * k`` operand.
    """
    kernel, w, win = _build_k_kernel(spec, h, dim, tile, kernel_gradient)
    cap = _pad_cap(spec.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    MKp, _ = _pad_last(M * K, w, tile, 0.0)
    # Occupancy from M, not M*K: a tile whose own kappas are all zero
    # still receives force from neighbors' kappa outside the tile.
    occ = _occupancy(M, c, cp, tile)

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
                (dim, cap, tile), lambda i, occ_ref: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((dim, cap, win), jnp.float32),
                pltpu.VMEM((cap, win), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=jax.ShapeDtypeStruct((dim, cap, cp), jnp.float32),
    )(occ, Pp, MKp)
    return out[:, : spec.cap, :c]
