"""ctypes bindings for the native marching-cubes engine (csrc/udf_mc.cpp)."""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from .build import ensure_built

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(ensure_built())
        for fn in (_lib.udf_mc, _lib.classic_mc):
            fn.restype = ctypes.c_int
        _lib.udf_mc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib.classic_mc.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib.mesh_free.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)
        ]
    return _lib


def _collect(verts_p, nverts, faces_p, nfaces) -> Tuple[np.ndarray, np.ndarray]:
    lib = _get_lib()
    nv, nf = nverts.value, nfaces.value
    verts = np.ctypeslib.as_array(verts_p, shape=(nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
    faces = np.ctypeslib.as_array(faces_p, shape=(nf, 3)).copy() if nf else np.zeros((0, 3), np.int32)
    lib.mesh_free(verts_p, faces_p)
    return verts, faces


ALGORITHMS = {"tets": 0, "lewiner": 1}


def marching_cubes_udf(udf: np.ndarray, grads: np.ndarray, voxel_size: float,
                       algorithm: str = "tets"):
    """Gradient-aware MC on an unsigned field.

    udf: [N,N,N] float32 (>=0); grads: [N,N,N,3] float32 (the -normalized
    gradient, i.e. pointing toward the surface). Returns (verts [V,3] in
    grid-index units, faces [F,3]).

    algorithm: 'tets' (marching tetrahedra, ambiguity-free default) or
    'lewiner' (the reference's Lewiner-table topology engine with face/
    interior saddle tests, ref: _marching_cubes_lewiner_cy.pyx:1847-2569).
    """
    lib = _get_lib()
    udf = np.ascontiguousarray(udf, np.float32)
    grads = np.ascontiguousarray(grads, np.float32)
    n0, n1, n2 = udf.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    nverts = ctypes.c_int64()
    nfaces = ctypes.c_int64()
    ret = lib.udf_mc(
        udf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n0, n1, n2, ctypes.c_float(voxel_size),
        ctypes.c_int32(ALGORITHMS[algorithm]),
        ctypes.byref(verts_p), ctypes.byref(nverts),
        ctypes.byref(faces_p), ctypes.byref(nfaces),
    )
    assert ret == 0
    return _collect(verts_p, nverts, faces_p, nfaces)


def marching_cubes_classic(grid: np.ndarray, isovalue: float,
                           algorithm: str = "tets"):
    """Classic iso-surface extraction (value < isovalue is inside).
    Returns (verts [V,3] in grid-index units, faces [F,3])."""
    lib = _get_lib()
    grid = np.ascontiguousarray(grid, np.float32)
    n0, n1, n2 = grid.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    nverts = ctypes.c_int64()
    nfaces = ctypes.c_int64()
    ret = lib.classic_mc(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n0, n1, n2, ctypes.c_float(isovalue),
        ctypes.c_int32(ALGORITHMS[algorithm]),
        ctypes.byref(verts_p), ctypes.byref(nverts),
        ctypes.byref(faces_p), ctypes.byref(nfaces),
    )
    assert ret == 0
    return _collect(verts_p, nverts, faces_p, nfaces)
