"""Native (C++) host-runtime bindings via ctypes.

The TPU compute path is JAX/Pallas; this module binds the C++
host-side runtime in `csrc/` (currently: marching-tetrahedra meshing —
the host meshing hot loop, replacing numpy vectorized passes with a
single-pass O(1)-dedup C++ sweep). The shared library is built lazily
with g++ into a per-user cache and memoized; every caller must handle
`None` (build toolchain absent) and fall back to the numpy path.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

from isopoints_tpu.logger import get_logger

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "marching_tet.cpp")
_LIB = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"isopoints_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"libmarchingtet_{digest}.so")
    try:
        if not os.path.exists(lib_path):
            # per-process tmp path: concurrent builders each install
            # atomically via os.replace, never sharing a partial file
            tmp = f"{lib_path}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                   "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
    except (subprocess.SubprocessError, OSError) as e:
        get_logger().warning("native build/load failed (%s); using numpy "
                             "marching tetrahedra", e)
        return None
    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float),                       # values
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,       # nx ny nz
        ctypes.POINTER(ctypes.c_float),                       # origin
        ctypes.POINTER(ctypes.c_float),                       # spacing
        ctypes.c_float,                                       # level
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),       # out_verts
        ctypes.POINTER(ctypes.c_int64),                       # n_verts
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),       # out_faces
        ctypes.POINTER(ctypes.c_int64),                       # n_faces
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    return lib


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_lib()
    return _LIB


def marching_tetrahedra_native(values: np.ndarray, origin, spacing,
                               level: float = 0.0
                               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ marching tetrahedra; None if the native lib is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(values, dtype=np.float32)
    nx, ny, nz = vals.shape
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)

    out_v = ctypes.POINTER(ctypes.c_float)()
    out_f = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.marching_tets(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(level),
        ctypes.byref(out_v), ctypes.byref(nv),
        ctypes.byref(out_f), ctypes.byref(nf))
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
        verts = np.ctypeslib.as_array(out_v, shape=(nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(out_f, shape=(nf.value, 3)).copy()
    finally:
        lib.mt_free(out_v)
        lib.mt_free(out_f)
    return verts, faces
