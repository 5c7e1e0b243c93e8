"""Native triangle-mesh ray-cast sampler (`native/trimesh_sampler.cpp`,
the `ray_sampling.rs` mesh-path equivalent)."""

import numpy as np
import pytest

from salva_tpu import native, shapes
from salva_tpu.sampling import shape_surface_sample, shape_volume_sample


def _cube_mesh(half=0.5):
    v = np.array(
        [
            [-half, -half, -half], [half, -half, -half],
            [half, half, -half], [-half, half, -half],
            [-half, -half, half], [half, -half, half],
            [half, half, half], [-half, half, half],
        ],
        np.float32,
    )
    t = np.array(
        [
            [0, 1, 2], [0, 2, 3],  # -z
            [4, 6, 5], [4, 7, 6],  # +z
            [0, 4, 5], [0, 5, 1],  # -y
            [3, 2, 6], [3, 6, 7],  # +y
            [0, 3, 7], [0, 7, 4],  # -x
            [1, 5, 6], [1, 6, 2],  # +x
        ],
        np.int32,
    )
    return v, t


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("g++ unavailable")
    return True


def test_surface_sample_cube(native_ok):
    v, t = _cube_mesh()
    pts = native.trimesh_surface_sample(v, t, 0.05)
    assert len(pts) > 100
    # All sampled points lie on (near) the cube surface.
    d = shapes.Cuboid((0.5, 0.5, 0.5)).sdf(np.abs(pts) * 0 + pts)
    assert np.abs(np.asarray(d)).max() < 0.06
    # Every face is covered.
    for axis in range(3):
        for sign in (-1, 1):
            on_face = np.abs(pts[:, axis] - sign * 0.5) < 0.06
            assert on_face.sum() > 20, (axis, sign)


def test_volume_sample_cube(native_ok):
    v, t = _cube_mesh()
    pts = native.trimesh_volume_sample(v, t, 0.05)
    # ~ (1.0 / 0.1)^3 = 1000 lattice points inside.
    assert 600 < len(pts) < 1800
    assert np.abs(pts).max() < 0.56


def test_trimesh_shape_dispatch(native_ok):
    v, t = _cube_mesh()
    mesh = shapes.TriMesh.from_arrays(v, t)
    s = shape_surface_sample(mesh, 0.05)
    vol = shape_volume_sample(mesh, 0.05)
    assert len(s) > 100
    assert len(vol) > len(s) * 0.5
