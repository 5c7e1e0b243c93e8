"""Generic hi-complement kernel for the v3 lo/hi split pair passes.

One builder serves every fluid-fluid pass (k / t / ff hoist): the pass
supplies a ``block_fn`` computing its per-pair math on an
``[8 own rows, 8 j rows, 128 cells]`` block, and the builder handles
the shared machinery — window DMA, slot-group flag gating with
VALUE-level ``lax.cond`` accumulation, fired-chunk skipping, and the
stacked multi-channel output. See ``pallas_pair2`` for the design
rationale and measurements.
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
from .pallas_pair import (
    _compiler_params,
    _halo,
    _pad_cap,
    _pad_last,
    _shifts,
)


def _group_flags(Mp, capp: int, w: int):
    """[G, nfc + 1] int32 live flags per (slot group, 128-lane chunk) of
    the padded-window lane coordinates; one extra zero chunk so the
    ``+1`` covering read of the largest positive shift stays in range."""
    G = capp // 8
    total = Mp.shape[-1]
    assert total % 128 == 0 and w % 128 == 0
    nfc = total // 128
    live = (Mp != 0.0).reshape(G, 8, nfc, 128).any(axis=(1, 3))
    return jnp.pad(live, ((0, 0), (0, 1))).astype(jnp.int32)


def _j_flag(flags_ref, gj: int, idx0, s: int):
    """Live flag for shifted group ``gj`` over j lanes
    ``[chunk_start + s, chunk_start + s + 128)`` — the one or two flag
    chunks covering that range (``idx0`` = flag index of the chunk
    itself; offsets are static per shift)."""
    off = s // 128  # Python floor (s may be negative)
    f = flags_ref[gj, idx0 + off]
    if s % 128 != 0:
        f = f | flags_ref[gj, idx0 + off + 1]
    return f


def _fired_flags(spec, flags):
    """Per-chunk "needs hi work" flags [nfc + 1]: a chunk fires iff its
    own rows hold a hi group, or a group-0 row there can see a hi group
    through some shift — hi_any at exactly the flag chunks ``_j_flag``
    reads: offsets {s//128 (+1 when unaligned)} over the 3^dim shifts
    (~9 distinct values in 3D, NOT the contiguous +/-(halo//128) span —
    full-span dilation would fire most of the grid from a handful of hi
    cells)."""
    hi_any = (flags[1:, :-1] != 0).any(axis=0)
    cover = sorted(
        {
            (s // 128) + d
            for s in _shifts(spec)
            for d in ((0,) if s % 128 == 0 else (0, 1))
        }
    )
    dil = jnp.zeros_like(hi_any)
    for off in cover:
        r = jnp.roll(hi_any, -off)
        if off > 0:
            r = r.at[-off:].set(False)
        elif off < 0:
            r = r.at[:-off].set(False)
        dil = dil | r
    lo_any = flags[0, :-1] != 0
    return jnp.pad((hi_any | (lo_any & dil)), ((0, 1))).astype(jnp.int32)


def _build_hi_kernel(spec, dim: int, tile: int, n_vec: int, n_scl: int,
                     n_out: int, block_fn):
    """Complement kernel over all (gi, gj) != (0, 0) slot-group blocks.

    Window channels after positions: ``n_vec`` vector channels
    ``[dim, capp, win]`` then ``n_scl`` scalar channels ``[capp, win]``.
    ``block_fn(dpos, r2, jvecs, jscls) -> [n_out, 8, 128]`` where jvecs
    is a list of per-channel lists of [8, 128] (one per spatial dim)
    and jscls a list of [8, 128].
    """
    capp = _pad_cap(spec.cap)
    G = capp // 8
    shifts = _shifts(spec)
    w = -(-_halo(spec) // 128) * 128
    win = tile + 2 * w
    nchunks = tile // 128

    def kernel(flags_ref, fired_ref, *refs):
        p_hbm = refs[0]
        vec_hbm = refs[1 : 1 + n_vec]
        scl_hbm = refs[1 + n_vec : 1 + n_vec + n_scl]
        out_ref = refs[1 + n_vec + n_scl]
        pwin = refs[2 + n_vec + n_scl]
        vec_win = refs[3 + n_vec + n_scl : 3 + 2 * n_vec + n_scl]
        scl_win = refs[3 + 2 * n_vec + n_scl : 3 + 2 * n_vec + 2 * n_scl]
        acc = refs[3 + 2 * n_vec + 2 * n_scl]
        sem = refs[4 + 2 * n_vec + 2 * n_scl]

        i = pl.program_id(0)
        out_ref[:, :, :] = jnp.zeros((n_out, capp, tile), jnp.float32)
        base_flag = w // 128 + i * nchunks

        any_fired = fired_ref[base_flag]
        for ch in range(1, nchunks):
            any_fired = any_fired | fired_ref[base_flag + ch]

        @pl.when(any_fired != 0)
        def _compute():
            c0 = i * tile
            cps = [
                pltpu.make_async_copy(
                    p_hbm.at[:, :, pl.ds(c0, win)], pwin, sem.at[0]
                )
            ]
            for k, hv in enumerate(vec_hbm):
                cps.append(
                    pltpu.make_async_copy(
                        hv.at[:, :, pl.ds(c0, win)], vec_win[k],
                        sem.at[1 + k],
                    )
                )
            for k, hs in enumerate(scl_hbm):
                cps.append(
                    pltpu.make_async_copy(
                        hs.at[:, pl.ds(c0, win)], scl_win[k],
                        sem.at[1 + n_vec + k],
                    )
                )
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

            def grouped3(ref):
                return [
                    [
                        jax.lax.slice_in_dim(
                            ref[d], g * 8, g * 8 + 8, axis=0
                        )
                        for g in range(G)
                    ]
                    for d in range(dim)
                ]

            pwg = grouped3(pwin)
            vwg = [grouped3(v) for v in vec_win]
            swg = [
                [
                    jax.lax.slice_in_dim(sw[:, :], g * 8, g * 8 + 8, axis=0)
                    for g in range(G)
                ]
                for sw in scl_win
            ]

            for ch in range(nchunks):
                lane0 = ch * 128

                @pl.when(fired_ref[base_flag + ch] != 0)
                def _chunk(ch=ch, lane0=lane0):
                    own_p = [
                        [
                            jax.lax.slice_in_dim(
                                pwg[d][g], w + lane0, w + lane0 + 128,
                                axis=1,
                            )
                            for g in range(G)
                        ]
                        for d in range(dim)
                    ]
                    # Accumulate in VMEM scratch under @pl.when: a
                    # value-level lax.cond here lowers to
                    # compute-both-branches + select on Mosaic
                    # (measured: the "gated" blocks cost the same as
                    # unconditional ones), while pl.when regions
                    # actually branch.
                    acc[:, :, :] = jnp.zeros(
                        (n_out, capp, 128), jnp.float32
                    )
                    for s in shifts:
                        for gi in range(G):
                            for gj in range(G):
                                if gi == 0 and gj == 0:
                                    continue  # covered by the lo kernel
                                own_f = flags_ref[gi, base_flag + ch]
                                pred = (own_f != 0) & (
                                    _j_flag(flags_ref, gj,
                                            base_flag + ch, s) != 0
                                )

                                @pl.when(pred)
                                def _blk(s=s, gi=gi, gj=gj):
                                    base = w + lane0 + s

                                    def lane(arr):
                                        return jax.lax.slice_in_dim(
                                            arr, base, base + 128, axis=1
                                        )

                                    pj = [
                                        lane(pwg[d][gj])
                                        for d in range(dim)
                                    ]
                                    jvecs = [
                                        [lane(vg[d][gj])
                                         for d in range(dim)]
                                        for vg in vwg
                                    ]
                                    jscls = [lane(sg[gj]) for sg in swg]
                                    dpos = [
                                        own_p[d][gi][:, None, :]
                                        - pj[d][None, :, :]
                                        for d in range(dim)
                                    ]
                                    r2 = dpos[0] * dpos[0]
                                    for d in range(1, dim):
                                        r2 = r2 + dpos[d] * dpos[d]
                                    rows = slice(gi * 8, (gi + 1) * 8)
                                    acc[:, rows, :] = acc[
                                        :, rows, :
                                    ] + block_fn(dpos, r2, jvecs, jscls)

                    out_ref[:, :, lane0 : lane0 + 128] = acc[:, :, :]

    return kernel, w, win


def hi_complement(spec, dim: int, P, M, vecs, scls, n_out: int, block_fn,
                  tile: int = 512, interpret: bool = False):
    """Run the complement kernel; returns ``[n_out, cap, C]`` holding
    every (gi, gj) != (0, 0) slot-group block's contribution (zeros when
    no cell exceeds occupancy 8). ``M`` provides the occupancy flags
    only; pass the padded channels via ``vecs``/``scls``."""
    capp = _pad_cap(spec.cap)
    n_vec, n_scl = len(vecs), len(scls)
    kernel, w, win = _build_hi_kernel(
        spec, dim, tile, n_vec, n_scl, n_out, block_fn
    )
    c = P.shape[-1]
    Pp, cp = _pad_last(P, w, tile, dg.POS_SENTINEL)
    vps = [_pad_last(v, w, tile, 0.0)[0] for v in vecs]
    sps = [_pad_last(s_, w, tile, 0.0)[0] for s_ in scls]
    Mp, _ = _pad_last(M, w, tile, 0.0)
    flags = _group_flags(Mp, capp, w)
    fired = _fired_flags(spec, flags)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            * (1 + n_vec + n_scl),
            out_specs=pl.BlockSpec(
                (n_out, capp, tile), lambda i, f1, f2: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((dim, capp, win), jnp.float32)]
            + [pltpu.VMEM((dim, capp, win), jnp.float32)] * n_vec
            + [pltpu.VMEM((capp, win), jnp.float32)] * n_scl
            + [
                pltpu.VMEM((n_out, capp, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((1 + n_vec + n_scl,)),
            ],
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
        out_shape=jax.ShapeDtypeStruct((n_out, capp, cp), jnp.float32),
    )(flags, fired, Pp, *vps, *sps)
    return out[:, : spec.cap, :c]
