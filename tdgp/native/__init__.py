"""Native (C++) kernels, built on demand with g++ and bound via ctypes.

Counterpart of the reference's torch cpp_extension JIT build machinery
(ref src/torch_utils/custom_ops.py:59-155): sources are hashed, builds are
cached next to the sources, and loading is lazy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)


def _build(src: str, out: str) -> None:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-o', out]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib(name: str, source: str) -> Optional[ctypes.CDLL]:
    src_path = os.path.join(_HERE, source)
    with open(src_path, 'rb') as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    lib_path = os.path.join(_HERE, f'lib{name}-{digest}.so')
    if not os.path.exists(lib_path):
        try:
            _build(src_path, lib_path)
        except Exception:
            return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        return None


class _MarchingCubes:
    def __init__(self):
        self._lib = _load_lib('mc', 'marching_cubes.cpp')
        if self._lib is not None:
            self._lib.mc_run.restype = ctypes.c_void_p
            self._lib.mc_run.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int64)]
            self._lib.mc_get_triangles.argtypes = [ctypes.c_void_p,
                                                   ctypes.POINTER(ctypes.c_float)]
            self._lib.mc_free.argtypes = [ctypes.c_void_p]

    @property
    def available(self) -> bool:
        return self._lib is not None

    def marching_tetrahedra(self, values: np.ndarray,
                            level: float) -> Tuple[np.ndarray, np.ndarray]:
        assert values.ndim == 3 and values.dtype == np.float32
        nx, ny, nz = values.shape
        n_tris = ctypes.c_int64(0)
        handle = self._lib.mc_run(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(level), ctypes.byref(n_tris))
        tris = np.empty((n_tris.value, 3, 3), dtype=np.float32)
        if n_tris.value > 0:
            self._lib.mc_get_triangles(
                handle, tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        self._lib.mc_free(handle)
        # dedupe vertices -> indexed mesh
        verts, inverse = np.unique(tris.reshape(-1, 3).round(6), axis=0,
                                   return_inverse=True)
        faces = inverse.reshape(-1, 3)
        return verts.astype(np.float64), faces


_mc_singleton: Optional[_MarchingCubes] = None


def _get_mc() -> Optional[_MarchingCubes]:
    global _mc_singleton
    if _mc_singleton is None:
        _mc_singleton = _MarchingCubes()
    return _mc_singleton if _mc_singleton.available else None


class _McModule:
    """Shim so `from tdgp.native import mc_native` works lazily."""

    @staticmethod
    def marching_tetrahedra(values: np.ndarray, level: float):
        mc = _get_mc()
        if mc is None:
            raise ImportError('native marching cubes unavailable')
        return mc.marching_tetrahedra(values, level)


mc_native = _McModule()
