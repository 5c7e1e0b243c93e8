"""Pallas TPU kernels for the per-iteration dense pair passes.

The XLA lowering of ``DenseCtx.t_pass`` / ``k_pass`` (27 shifted views,
``[cap_i, cap_j, C]`` pair blocks) measures ~5x off compute-bound at 27k
particles — the shifted operands and pair intermediates round-trip HBM.
These kernels tile the flat cell axis C: each program DMAs its tile plus a
halo window of ``W = flat_shift((1,..,1))`` cells into VMEM once, then
walks all 3^dim neighbor offsets as *static slices* of the window,
accumulating entirely on-chip.

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


def _halo(spec: dg.DenseGridSpec) -> int:
    """Max |flat shift| over the neighbor offsets."""
    return max(
        abs(spec.flat_shift(off)) for off in dg.neighbor_offsets(spec.dim)
    )


def _shifts(spec: dg.DenseGridSpec) -> Tuple[int, ...]:
    return tuple(spec.flat_shift(off) for off in dg.neighbor_offsets(spec.dim))


def _grad_scale_fn(kernel_gradient: str, h: float, dim: int):
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

    def kernel(p_hbm, m_hbm, q_hbm, out_ref, pwin, mwin, qwin, sem):
        i = pl.program_id(0)
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
        # slices then happen at value level (Mosaic lowers them to vector
        # shifts — ref slices at non-128-aligned offsets don't compile).
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
                own_p[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
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


def t_pass_pallas(spec, h: float, dim: int, kernel_gradient: str, P, M, Q,
                  tile: int = 512, interpret: bool = False):
    """T_i = sum_ff m_j (Q_j . grad_ij), fused on TPU."""
    kernel, w, win = _build_t_kernel(spec, h, dim, tile, kernel_gradient)
    cap = _pad_cap(spec.cap)
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    Mp, _ = _pad_last(M, w, tile, 0.0)
    Qp, _ = _pad_last(Q, w, tile, 0.0)

    out = pl.pallas_call(
        kernel,
        grid=(cp // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (cap, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((cap, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dim, cap, win), jnp.float32),
            pltpu.VMEM((cap, win), jnp.float32),
            pltpu.VMEM((dim, cap, win), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(Pp, Mp, Qp)
    return out[: spec.cap, :c]


def _build_k_kernel(spec, h, dim, tile, kernel_gradient):
    cap = _pad_cap(spec.cap)
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    dwr_of = _grad_scale_fn(kernel_gradient, h, dim)

    def kernel(p_hbm, mk_hbm, out_ref, pwin, mkwin, sem):
        i = pl.program_id(0)
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
                own_p[d][:, None, :] - pj[d][None, :, :] for d in range(dim)
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

    out = pl.pallas_call(
        kernel,
        grid=(cp // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (dim, cap, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dim, cap, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dim, cap, win), jnp.float32),
            pltpu.VMEM((cap, win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(Pp, MKp)
    return out[:, : spec.cap, :c]
