"""Native (C++) runtime components, loaded through ctypes.

The reference is a native (Rust) library end to end; here the TPU compute
path is XLA and the host runtime pieces that profit from native code are
implemented in C++ under ``native/`` and auto-built on first use with the
toolchain's g++ (`pybind11` is not available; the C ABI + ctypes is).

Currently: the triangle-mesh ray-cast sampler
(``native/trimesh_sampler.cpp``), covering the reference's
``shape_surface_ray_sample`` / ``shape_volume_ray_sample`` for meshes
(``src/sampling/ray_sampling.rs``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "trimesh_sampler.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libtrimesh_sampler.so")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        warnings.warn(f"native trimesh sampler build failed: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        if not _build():
            _lib_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    for name in ("trimesh_surface_sample", "trimesh_volume_sample"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
    _lib = lib
    return _lib


def _call_sampler(fn_name: str, vertices, indices, radius: float,
                  max_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native trimesh sampler unavailable (g++ build failed)"
        )
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(indices, np.int32)
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert tris.ndim == 2 and tris.shape[1] == 3
    out = np.empty((max_out, 3), np.float32)
    n = getattr(lib, fn_name)(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(tris),
        ctypes.c_float(radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_out,
    )
    if n < 0:
        raise ValueError("invalid mesh or radius")
    return out[:n].copy()


def trimesh_surface_sample(vertices, indices, particle_radius: float,
                           max_out: int = 1_000_000) -> np.ndarray:
    """Surface boundary particles of a triangle mesh
    (`shape_surface_ray_sample` semantics, `ray_sampling.rs:27-88`)."""
    return _call_sampler(
        "trimesh_surface_sample", vertices, indices, particle_radius, max_out
    )


def trimesh_volume_sample(vertices, indices, particle_radius: float,
                          max_out: int = 4_000_000) -> np.ndarray:
    """Volume sample of a closed triangle mesh
    (`shape_volume_ray_sample` semantics, `ray_sampling.rs:91-164`)."""
    return _call_sampler(
        "trimesh_volume_sample", vertices, indices, particle_radius, max_out
    )


def available() -> bool:
    return _load() is not None
