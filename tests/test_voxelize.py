"""TriMesh voxel-SDF: accuracy vs an analytic shape, and
DynamicContactSampling coupling against a triangle mesh (the capability
the reference gets from parry point projection,
`fluids_pipeline.rs:192-255`)."""

import jax.numpy as jnp
import numpy as np

from salva_tpu import shapes
from salva_tpu.sampling.voxelize import trimesh_sdf


def cube_mesh(half=0.5):
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half)
         for z in (-half, half)],
        np.float32,
    )

    def quad(i, j, k, l):  # noqa: E741
        return [(i, j, k), (i, k, l)]

    tris = (
        quad(0, 1, 3, 2) + quad(4, 6, 7, 5) + quad(0, 4, 5, 1)
        + quad(2, 3, 7, 6) + quad(0, 2, 6, 4) + quad(1, 5, 7, 3)
    )
    return shapes.TriMesh.from_arrays(v, tris)


def test_voxel_sdf_matches_analytic_cuboid():
    mesh = cube_mesh()
    vox = trimesh_sdf(mesh, resolution=32)
    cub = shapes.Cuboid((0.5, 0.5, 0.5))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (2000, 3)).astype(np.float32)
    d_vox = np.asarray(vox.sdf(jnp.asarray(pts)))
    d_ref = np.asarray(cub.sdf(jnp.asarray(pts)))
    err = np.abs(d_vox - d_ref)
    near = np.abs(d_ref) < 3 * vox.spacing
    inside = d_ref < -vox.spacing
    # Near the surface and inside: sub-cell accuracy. Far outside the
    # field may overestimate slightly (clamped border + box distance).
    assert err[near].max() < vox.spacing, err[near].max()
    assert err[inside].max() < vox.spacing, err[inside].max()
    far = np.abs(d_ref) > vox.spacing
    assert (np.sign(d_vox[far]) == np.sign(d_ref[far])).all()
    # Autodiff normals finite everywhere (used for projection).
    n = np.asarray(shapes.sdf_normal(vox, jnp.asarray(pts[:64])))
    assert np.isfinite(n).all()
    # The cache returns the identical object for the same mesh.
    assert trimesh_sdf(mesh, resolution=32) is vox


def test_trimesh_dynamic_contact_sampling_depenetrates():
    """A fluid particle inside a TriMesh collider is pushed out and a
    boundary particle is emitted at the projection
    (`fluids_pipeline.rs:222-237` semantics)."""
    from salva_tpu.coupling import ColliderSampling, FluidsPipeline
    from salva_tpu.world import Boundary, Fluid

    pip = FluidsPipeline(0.025, 2.0, dim=3)
    # One particle inside the unit cube mesh, one far away.
    fl = pip.liquid_world.add_fluid(
        Fluid([[0.0, 0.45, 0.0], [0.0, 2.0, 0.0]], density0=1000.0)
    )
    body = pip.bodies.add_body("fixed")
    co = pip.bodies.add_collider(body, cube_mesh())
    bo = pip.liquid_world.add_boundary(Boundary(np.zeros((0, 3))))
    pip.coupling.register_coupling(
        bo, co, ColliderSampling.dynamic_contact_sampling()
    )
    pip.step((0.0, 0.0, 0.0), 1.0 / 200.0)

    pos = pip.liquid_world.fluid_positions(fl)
    d = np.asarray(
        trimesh_sdf(cube_mesh(), resolution=48).sdf(jnp.asarray(pos))
    )
    # The penetrating particle was projected out (within a voxel).
    assert d.min() > -2.0 * trimesh_sdf(cube_mesh()).spacing, d
    assert len(pip.liquid_world.boundary_positions(bo)) > 0
