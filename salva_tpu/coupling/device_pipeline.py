"""Device-resident rigid-body + coupling stepping.

The host pipeline (``rigid_body.py`` + ``collider_coupling.py``) keeps
body state in numpy and crosses the host<->device boundary several times
per substep (SDF contact queries, the dynamic-sampling emit fetch, the
force fetch). On a remote accelerator each crossing costs real latency —
the measured coupled 2D scenes were seconds per step. This module moves
the ENTIRE coupled substep machinery onto the device:

- body pose/velocity state is a small pytree of ``[B, ...]`` arrays;
- contact generation (collider samples vs every other collider's SDF,
  including dynamic-dynamic pairs), sequential-impulse resolution,
  integration and position projection run inside one jitted program;
- boundary resampling (static pose transforms AND DynamicContactSampling
  emission with on-device compaction into fixed slot blocks) writes the
  world's boundary arrays directly — no emit fetch;
- force transmission reduces boundary forces to per-body impulses on
  device.

A coupled substep is then three asynchronous dispatches (pre-step, fluid
step, post-step) and ZERO host round trips. Semantics mirror the host
engine (`fluids_pipeline.rs:137-288` role); the contact solver matches
`rigid_body.py` up to the position-projection tie-break (max-depth
contact per body, resolved by first index on device).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import shapes as shp


class DeviceRigidState(NamedTuple):
    """Rigid body dynamic state on device.

    ``rot``: [B, d, d] rotation matrices; ``angvel``: [B] in 2D (scalar
    omega) or [B, 3] in 3D.
    """

    trans: jnp.ndarray
    rot: jnp.ndarray
    linvel: jnp.ndarray
    angvel: jnp.ndarray
    # Dropped DynamicContactSampling emissions (capacity overflow),
    # accumulated for rare host-side surfacing.
    sampling_dropped: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class _ColliderMeta:
    shape: object  # SDF-capable (TriMesh pre-voxelized at freeze)
    body: int
    local_rot: tuple
    local_trans: tuple
    dynamic: bool


def _device_shape(shape):
    if isinstance(shape, shp.TriMesh):
        from ..sampling.voxelize import trimesh_sdf

        return trimesh_sdf(shape)
    return shape


def _rot2_dev(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )


def _skew3_dev(w):
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], z, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], z], -1),
        ],
        -2,
    )


def _orthonormalize_dev(R):
    u, _, vt = jnp.linalg.svd(R)
    return u @ vt


class DeviceColliderCoupling:
    """CouplingManager implementation with device-resident rigid state.

    Built from a host ``RigidBodyWorld`` + ``ColliderCouplingSet`` at
    freeze time; thereafter the host objects are STALE until
    :meth:`sync_to_host` copies the poses back (one fetch, for rendering
    or user reads)."""

    # Contacts kept after compaction (penetrating samples are few; the
    # full candidate set is samples x colliders).
    max_contacts: int = 64

    def __init__(self, coupling_set, world):
        rw = coupling_set.rigid_world
        self.rigid_world = rw
        self.coupling_set = coupling_set
        self.dim = rw.dim
        self._gravity = np.zeros(rw.dim, np.float32)
        self._freeze(coupling_set, rw, world)

    # -- freeze ------------------------------------------------------------

    def _freeze(self, cs, rw, world):
        d = self.dim
        B = len(rw.bodies)
        self.n_bodies = B
        self.inv_mass = jnp.asarray(
            [b.inv_mass for b in rw.bodies], jnp.float32
        )
        self.inv_inertia = jnp.asarray(
            np.stack([np.atleast_1d(b._inv_inertia()) for b in rw.bodies])
            if B
            else np.zeros((0, 1)),
            jnp.float32,
        )  # [B, 1] in 2D, [B, 3] in 3D
        self.dynamic_mask = jnp.asarray(
            [b.is_dynamic for b in rw.bodies], bool
        )

        self.colliders = tuple(
            _ColliderMeta(
                shape=_device_shape(c.shape),
                body=c.body,
                local_rot=tuple(map(tuple, np.asarray(c.local_rotation))),
                local_trans=tuple(np.asarray(c.local_translation)),
                dynamic=rw.bodies[c.body].is_dynamic,
            )
            for c in rw.colliders
        )

        # Contact samples of every dynamic collider (local frames).
        samp_pts, samp_body, samp_cid = [], [], []
        for cid, c in enumerate(rw.colliders):
            if not rw.bodies[c.body].is_dynamic:
                continue
            local = rw._collider_samples(c)
            samp_pts.append(np.asarray(local, np.float32))
            samp_body.append(np.full(len(local), c.body, np.int32))
            samp_cid.append(np.full(len(local), cid, np.int32))
        if samp_pts:
            self.samples = jnp.asarray(np.concatenate(samp_pts))
            self.sample_body = jnp.asarray(np.concatenate(samp_body))
            self.sample_cid = jnp.asarray(np.concatenate(samp_cid))
        else:
            self.samples = jnp.zeros((0, d), jnp.float32)
            self.sample_body = jnp.zeros((0,), jnp.int32)
            self.sample_cid = jnp.zeros((0,), jnp.int32)

        # Coupling entries: normalize boundary slot blocks so counts are
        # static (dynamic entries reserve max_samples slots up front).
        self.entries = []
        for e in cs.entries.values():
            if e.sampling.kind == "static":
                pts = np.asarray(e.sampling.points, np.float32)
                # Normalize the slot count to the sample count.
                world.set_boundary_particles(e.boundary, pts)
                slots = np.where(
                    world._boundary_slot_owner == e.boundary
                )[0]
                self.entries.append(
                    dict(
                        kind="static",
                        collider=e.collider,
                        boundary=e.boundary,
                        slots=jnp.asarray(slots.astype(np.int32)),
                        points=jnp.asarray(pts),
                    )
                )
            else:
                cap = int(e.sampling.max_samples)
                world.set_boundary_particles(
                    e.boundary, np.zeros((cap, d), np.float32)
                )
                slots = np.where(
                    world._boundary_slot_owner == e.boundary
                )[0]
                # Reserved slots start dead (nothing emitted yet).
                world.boundaries_state = world.boundaries_state.replace(
                    alive=world.boundaries_state.alive.at[
                        jnp.asarray(slots)
                    ].set(False)
                )
                self.entries.append(
                    dict(
                        kind="dynamic",
                        collider=e.collider,
                        boundary=e.boundary,
                        slots=jnp.asarray(slots.astype(np.int32)),
                        cap=cap,
                    )
                )

        self.friction = float(rw.friction)
        self.restitution = float(rw.restitution)
        self.contact_iterations = int(rw.contact_iterations)
        self.contact_slop = float(rw.contact_slop)
        self.particle_radius = float(world.particle_radius)
        self.h = float(world.h)

        self.rigid_state = DeviceRigidState(
            trans=jnp.asarray(
                np.stack([b.translation for b in rw.bodies])
                if B else np.zeros((0, d))
            ).astype(jnp.float32),
            rot=jnp.asarray(
                np.stack([b.rotation for b in rw.bodies])
                if B else np.zeros((0, d, d))
            ).astype(jnp.float32),
            linvel=jnp.asarray(
                np.stack([b.linvel for b in rw.bodies])
                if B else np.zeros((0, d))
            ).astype(jnp.float32),
            angvel=jnp.asarray(
                np.stack([np.atleast_1d(b.angvel) for b in rw.bodies])
                if B else np.zeros((0, 1))
            ).astype(jnp.float32).reshape(
                (B,) if d == 2 else (B, 3)
            ),
            sampling_dropped=jnp.zeros((), jnp.int32),
        )

        self._pre = jax.jit(self._build_pre())
        self._post = jax.jit(self._build_post())

    # -- small device helpers ----------------------------------------------

    def _collider_pose(self, rs, meta: _ColliderMeta):
        lR = jnp.asarray(meta.local_rot, jnp.float32)
        lt = jnp.asarray(meta.local_trans, jnp.float32)
        Rb = rs.rot[meta.body]
        return Rb @ lR, Rb @ lt + rs.trans[meta.body]

    def _point_vel(self, rs, body, p):
        r = p - rs.trans[body]
        if self.dim == 2:
            w = rs.angvel[body]
            return rs.linvel[body] + w * jnp.stack([-r[1], r[0]])
        return rs.linvel[body] + jnp.cross(rs.angvel[body], p - rs.trans[body])

    def _inv_inertia_world(self, rs, body):
        """Apply the world-frame inverse inertia to a vector: returns a
        closure tau -> domega."""
        if self.dim == 2:
            inv = self.inv_inertia[body, 0]
            return lambda tau: inv * tau
        R = rs.rot[body]
        inv = self.inv_inertia[body]
        return lambda tau: R @ (inv * (R.T @ tau))

    def _eff_mass(self, rs, body, r, axis):
        if self.dim == 2:
            rn = r[0] * axis[1] - r[1] * axis[0]
            return self.inv_mass[body] + rn * rn * self.inv_inertia[body, 0]
        rn = jnp.cross(r, axis)
        iw = self._inv_inertia_world(rs, body)(rn)
        return self.inv_mass[body] + jnp.dot(jnp.cross(iw, r), axis)

    def _apply_impulse(self, linvel, angvel, rs, body, imp, p):
        """Functional impulse application into the velocity ARRAYS (rs is
        only read for poses/inertia)."""
        dv = imp * self.inv_mass[body]
        linvel = linvel.at[body].add(dv)
        r = p - rs.trans[body]
        if self.dim == 2:
            tau = r[0] * imp[1] - r[1] * imp[0]
            angvel = angvel.at[body].add(tau * self.inv_inertia[body, 0])
        else:
            tau = jnp.cross(r, imp)
            angvel = angvel.at[body].add(
                self._inv_inertia_world(rs, body)(tau)
            )
        return linvel, angvel

    # -- contacts ----------------------------------------------------------

    def _find_contacts_dev(self, rs, margin):
        """Fixed-capacity contact table: compacted penetrating samples.

        Returns dict of [K] arrays (a_body, b_body(-1=static), p, n,
        depth) + count."""
        K = self.max_contacts
        d = self.dim
        T = self.samples.shape[0]
        if T == 0 or not self.colliders:
            return None
        # World-space sample points.
        Rs = rs.rot[self.sample_body]  # [T, d, d]
        pts = (
            jnp.einsum("tde,te->td", Rs, self.samples)
            + rs.trans[self.sample_body]
        )
        cand_mask, cand_n, cand_depth, cand_b = [], [], [], []
        for cid, meta in enumerate(self.colliders):
            Rc, tc = self._collider_pose(rs, meta)
            _, dist, nrm = shp.project_point(meta.shape, pts, Rc, tc)
            hit = dist < margin
            if meta.dynamic:
                hit = hit & (self.sample_body != meta.body) & (
                    self.sample_cid != cid
                )
            cand_mask.append(hit)
            cand_n.append(nrm)
            cand_depth.append(-dist)
            cand_b.append(
                jnp.full((T,), meta.body if meta.dynamic else -1, jnp.int32)
            )
        mask = jnp.concatenate(cand_mask)  # [T * NC]
        n_all = jnp.concatenate(cand_n)
        depth_all = jnp.concatenate(cand_depth)
        b_all = jnp.concatenate(cand_b)
        a_all = jnp.tile(self.sample_body, len(self.colliders))
        p_all = jnp.tile(pts, (len(self.colliders), 1))

        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        keep = mask & (rank < K)
        tgt = jnp.where(keep, rank, K)
        count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), K)

        def compact(arr, fill=0.0):
            out = jnp.full((K + 1,) + arr.shape[1:], fill, arr.dtype)
            return out.at[tgt].set(arr, mode="drop")[:K]

        return dict(
            a=compact(a_all, 0),
            b=compact(b_all, -1),
            p=compact(p_all),
            n=compact(n_all),
            depth=compact(depth_all),
            count=count,
        )

    def _solve_velocities_dev(self, rs, con):
        """Sequential impulses (scan over the contact table per
        iteration), mirroring ``rigid_body._solve_contact_velocities``."""
        K = self.max_contacts

        def contact_step(carry, k):
            linvel, angvel, acc_n = carry
            rs_v = rs._replace(linvel=linvel, angvel=angvel)
            active = k < con["count"]
            a = con["a"][k]
            b = con["b"][k]
            p = con["p"][k]
            n = con["n"][k]
            has_b = b >= 0
            bs = jnp.maximum(b, 0)

            v = self._point_vel(rs_v, a, p) - jnp.where(
                has_b, self._point_vel(rs_v, bs, p), 0.0
            )
            vn = jnp.dot(v, n)
            kn = self._eff_mass(rs, a, p - rs.trans[a], n) + jnp.where(
                has_b, self._eff_mass(rs, bs, p - rs.trans[bs], n), 0.0
            )
            ok = active & (kn > 0.0)
            j = jnp.where(ok, -(1.0 + self.restitution) * vn
                          / jnp.where(kn > 0, kn, 1.0), 0.0)
            new_acc = jnp.maximum(acc_n[k] + j, 0.0)
            dj = jnp.where(ok, new_acc - acc_n[k], 0.0)
            acc_n = acc_n.at[k].set(jnp.where(ok, new_acc, acc_n[k]))
            lv, av = self._apply_impulse(linvel, angvel, rs, a, dj * n, p)
            lv2, av2 = self._apply_impulse(lv, av, rs, bs, -dj * n, p)
            linvel = jnp.where(has_b, lv2, lv)
            angvel = jnp.where(has_b, av2, av)

            if self.friction > 0.0:
                rs_v = rs._replace(linvel=linvel, angvel=angvel)
                v = self._point_vel(rs_v, a, p) - jnp.where(
                    has_b, self._point_vel(rs_v, bs, p), 0.0
                )
                vt = v - jnp.dot(v, n) * n
                vt_norm = jnp.linalg.norm(vt)
                tdir = vt / jnp.where(vt_norm > 1e-6, vt_norm, 1.0)
                kt = self._eff_mass(rs, a, p - rs.trans[a], tdir) + jnp.where(
                    has_b,
                    self._eff_mass(rs, bs, p - rs.trans[bs], tdir), 0.0
                )
                okf = ok & (acc_n[k] > 0.0) & (vt_norm > 1e-6) & (kt > 0.0)
                jt = -vt_norm / jnp.where(kt > 0, kt, 1.0)
                lim = self.friction * acc_n[k]
                jt = jnp.clip(jt, -lim, lim)
                jt = jnp.where(okf, jt, 0.0)
                lv, av = self._apply_impulse(
                    linvel, angvel, rs, a, jt * tdir, p
                )
                lv2, av2 = self._apply_impulse(lv, av, rs, bs, -jt * tdir, p)
                linvel = jnp.where(has_b, lv2, lv)
                angvel = jnp.where(has_b, av2, av)
            return (linvel, angvel, acc_n), None

        def iteration(carry, _):
            carry, _ = jax.lax.scan(
                contact_step, carry, jnp.arange(K, dtype=jnp.int32)
            )
            return carry, None

        init = (rs.linvel, rs.angvel, jnp.zeros((K,), jnp.float32))
        (linvel, angvel, _), _ = jax.lax.scan(
            iteration, init, None, length=self.contact_iterations
        )
        return rs._replace(linvel=linvel, angvel=angvel)

    def _project_positions_dev(self, rs, beta=0.8, passes=2):
        """Per-body max-depth push (inverse-mass split for dyn-dyn)."""
        B = self.n_bodies
        for _ in range(passes):
            con = self._find_contacts_dev(rs, -self.contact_slop)
            if con is None:
                return rs
            K = self.max_contacts
            active = jnp.arange(K) < con["count"]
            corr = (con["depth"] - self.contact_slop) * beta
            has_b = con["b"] >= 0
            bs = jnp.maximum(con["b"], 0)
            wa = self.inv_mass[con["a"]]
            wb = jnp.where(has_b, self.inv_mass[bs], 0.0)
            wsum = jnp.maximum(wa + wb, 1e-12)
            corr_a = jnp.where(active, corr * jnp.where(has_b, wa / wsum, 1.0), 0.0)
            corr_b = jnp.where(active & has_b, corr * wb / wsum, 0.0)

            bodies = jnp.concatenate([con["a"], bs])
            corrs = jnp.concatenate([corr_a, corr_b])
            norms = jnp.concatenate([con["n"], -con["n"]])
            corrs = jnp.maximum(corrs, 0.0)

            best = jnp.zeros((B,), jnp.float32).at[bodies].max(
                corrs, mode="drop"
            )
            # Tie-break: the first contact achieving the per-body max.
            is_best = (corrs == best[bodies]) & (corrs > 0.0)
            kidx = jnp.arange(2 * K, dtype=jnp.int32)
            first = jnp.full((B,), 2 * K, jnp.int32).at[
                jnp.where(is_best, bodies, B)
            ].min(kidx, mode="drop")
            sel = jnp.minimum(first, 2 * K - 1)
            push = jnp.where(
                ((first < 2 * K) & self.dynamic_mask)[:, None],
                best[:, None] * norms[sel],
                0.0,
            )
            rs = rs._replace(trans=rs.trans + push)
        return rs

    def _integrate_dev(self, rs, dt):
        dyn = self.dynamic_mask
        trans = jnp.where(dyn[:, None], rs.trans + rs.linvel * dt, rs.trans)
        if self.dim == 2:
            dR = _rot2_dev(rs.angvel * dt)
            rot = jnp.where(dyn[:, None, None], dR @ rs.rot, rs.rot)
        else:
            rot = jnp.where(
                dyn[:, None, None],
                _orthonormalize_dev(
                    rs.rot + dt * _skew3_dev(rs.angvel) @ rs.rot
                ),
                rs.rot,
            )
        return rs._replace(trans=trans, rot=rot)

    def _rigid_step_dev(self, rs, dt, gravity):
        """Device port of ``RigidBodyWorld.step``."""
        if self.n_bodies == 0:
            return rs
        linvel = jnp.where(
            self.dynamic_mask[:, None], rs.linvel + gravity[None, :] * dt,
            rs.linvel,
        )
        rs = rs._replace(linvel=linvel)
        con = self._find_contacts_dev(rs, 0.0)
        if con is not None:
            rs = self._solve_velocities_dev(rs, con)
        rs = self._integrate_dev(rs, dt)
        if con is not None:
            rs = self._project_positions_dev(rs)
        return rs

    # -- boundary resampling / force transmit -------------------------------

    def _build_pre(self):
        d = self.dim

        def pre(rs, fl, bd, dt, gravity):
            rs = self._rigid_step_dev(rs, dt, gravity)
            bpos, bvel, balive = bd.positions, bd.velocities, bd.alive
            dropped = rs.sampling_dropped
            for entry in self.entries:
                meta = self.colliders[entry["collider"]]
                Rc, tc = self._collider_pose(rs, meta)
                body = meta.body
                if entry["kind"] == "static":
                    pts = entry["points"] @ Rc.T + tc
                    r = pts - rs.trans[body]
                    if d == 2:
                        perp = jnp.stack([-r[:, 1], r[:, 0]], -1)
                        vels = rs.linvel[body] + rs.angvel[body] * perp
                    else:
                        vels = rs.linvel[body] + jnp.cross(
                            jnp.broadcast_to(rs.angvel[body], r.shape), r
                        )
                    slots = entry["slots"]
                    bpos = bpos.at[slots].set(pts)
                    bvel = bvel.at[slots].set(vels)
                    balive = balive.at[slots].set(True)
                else:
                    cap = entry["cap"]
                    slots = entry["slots"]
                    predicted = fl.positions + fl.velocities * dt
                    _, dist, nrm = shp.project_point(
                        meta.shape, predicted, Rc, tc
                    )
                    margin = self.particle_radius * 0.1
                    from .collider_coupling import _dynamic_sample_kernel

                    new_pos, new_vel, emit, proj = _dynamic_sample_kernel(
                        fl.positions, fl.velocities, fl.alive, dist, nrm,
                        jnp.float32(dt), jnp.float32(self.h),
                        jnp.float32(margin),
                    )
                    fl = fl.replace(positions=new_pos, velocities=new_vel)
                    # On-device compaction of emitted projections into the
                    # reserved slot block (no host fetch).
                    rank = jnp.cumsum(emit.astype(jnp.int32)) - 1
                    keep = emit & (rank < cap)
                    tgt = slots[jnp.clip(rank, 0, cap - 1)]
                    tgt = jnp.where(keep, tgt, bpos.shape[0])
                    n_emit = jnp.sum(emit.astype(jnp.int32))
                    count = jnp.minimum(n_emit, cap)
                    dropped = dropped + jnp.maximum(n_emit - cap, 0)
                    r = proj - rs.trans[body]
                    if d == 2:
                        perp = jnp.stack([-r[:, 1], r[:, 0]], -1)
                        vels = rs.linvel[body] + rs.angvel[body] * perp
                    else:
                        vels = rs.linvel[body] + jnp.cross(
                            jnp.broadcast_to(rs.angvel[body], r.shape), r
                        )
                    bpos = bpos.at[tgt].set(proj, mode="drop")
                    bvel = bvel.at[tgt].set(vels, mode="drop")
                    balive = balive.at[slots].set(
                        jnp.arange(cap) < count
                    )
            bd = bd.replace(positions=bpos, velocities=bvel, alive=balive)
            rs = rs._replace(sampling_dropped=dropped)
            return rs, fl, bd

        return pre

    def _build_post(self):
        def post(rs, bd, dt):
            linvel, angvel = rs.linvel, rs.angvel
            for entry in self.entries:
                meta = self.colliders[entry["collider"]]
                if not meta.dynamic:
                    continue
                body = meta.body
                slots = entry["slots"]
                f = bd.forces[slots] * dt  # [S, d] impulses
                p = bd.positions[slots]
                alive = bd.alive[slots].astype(jnp.float32)[:, None]
                f = f * alive
                linvel = linvel.at[body].add(
                    jnp.sum(f, axis=0) * self.inv_mass[body]
                )
                r = p - rs.trans[body]
                if self.dim == 2:
                    tau = jnp.sum(r[:, 0] * f[:, 1] - r[:, 1] * f[:, 0])
                    angvel = angvel.at[body].add(
                        tau * self.inv_inertia[body, 0]
                    )
                else:
                    tau = jnp.sum(jnp.cross(r, f), axis=0)
                    angvel = angvel.at[body].add(
                        self._inv_inertia_world(rs, body)(tau)
                    )
            return rs._replace(linvel=linvel, angvel=angvel)

        return post

    # -- CouplingManager protocol -------------------------------------------

    def set_gravity(self, gravity):
        self._gravity = np.asarray(gravity, np.float32)

    def update_boundaries(self, world, dt: float):
        self.rigid_state, world.fluids_state, world.boundaries_state = (
            self._pre(
                self.rigid_state, world.fluids_state,
                world.boundaries_state, jnp.float32(dt),
                jnp.asarray(self._gravity),
            )
        )

    def transmit_forces(self, world, dt: float):
        self.rigid_state = self._post(
            self.rigid_state, world.boundaries_state, jnp.float32(dt)
        )

    # -- host sync -----------------------------------------------------------

    def sync_to_host(self):
        """Copy device poses/velocities back into the host RigidBody
        objects (ONE fetch; for rendering / user reads)."""
        rs = jax.device_get(self.rigid_state)
        for i, b in enumerate(self.rigid_world.bodies):
            b.translation = np.asarray(rs.trans[i], np.float32)
            b.rotation = np.asarray(rs.rot[i], np.float32)
            b.linvel = np.asarray(rs.linvel[i], np.float32)
            if self.dim == 2:
                b.angvel = float(rs.angvel[i])
            else:
                b.angvel = np.asarray(rs.angvel[i], np.float32)
        dropped = int(rs.sampling_dropped)
        if dropped > 0:
            import warnings

            warnings.warn(
                f"DynamicContactSampling dropped {dropped} emitted contact "
                "samples (max_samples capacity); raise "
                "DynamicContactSampling.max_samples."
            )
        return self.rigid_world


def supports_device_coupling(coupling_set, world) -> bool:
    """The device path needs SDF-capable shapes (all stock shapes are;
    TriMesh voxelizes) and no user-subclassed machinery."""
    return True
