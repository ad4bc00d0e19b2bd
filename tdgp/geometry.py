"""Geometry extraction: density grid -> triangle mesh.

Counterpart of ref scripts/extract_geometry.py (+ scripts/utils.py
create_voxel_coords/extract_geometry): sample G's density field on a voxel
grid (chunked through compute_densities) and isosurface it. The reference
leans on the external `mcubes` package; here isosurfacing is provided by a
native C++ marching-tetrahedra kernel (tdgp/native/marching_cubes.cpp,
ctypes-bound, built on demand) with a vectorized numpy fallback implementing
the identical algorithm — the two are parity-tested.

Exports: .obj (plain text) and .mrc (minimal MRC2014 density volume, what
the reference wrote via mrcfile).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tdgp.utils.tensor_group import TensorGroup


# ------------------------------------------------------------- density grid

def create_voxel_coords(resolution: int, cube_scale: float = 0.5,
                        batch_size: int = 1) -> jnp.ndarray:
    """Voxel centers of a resolution^3 grid spanning the scene cube
    (ref scripts/utils.py:55-76). Returns [batch, res^3, 3]."""
    side = np.linspace(-cube_scale, cube_scale, resolution, dtype=np.float32)
    x, y, z = np.meshgrid(side, side, side, indexing='ij')
    coords = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    return jnp.asarray(np.broadcast_to(coords[None], (batch_size,) + coords.shape))


def extract_density_grid(G, g_vars, ws: jnp.ndarray, resolution: int = 128,
                         cube_scale: float = 0.5, chunk: int = 32 ** 3) -> np.ndarray:
    """Chunked sigma evaluation on the voxel grid (ref networks_epigraf.py:196-208).
    Returns [res, res, res] float densities for the first sample."""
    coords = create_voxel_coords(resolution, cube_scale, batch_size=1)

    @jax.jit
    def density_fn(c):
        return G.apply(g_vars, method=lambda g: g.synthesis.compute_densities(
            ws[:1], c, noise_mode='const'))

    total = coords.shape[1]
    out = []
    for i in range(0, total, chunk):
        out.append(np.asarray(density_fn(coords[:, i:i + chunk])))
    sigma = np.concatenate(out, axis=1)[0]
    return sigma.reshape(resolution, resolution, resolution)


# ------------------------------------------------------- marching tetrahedra

# cube corner offsets (x, y, z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)

# six tetrahedra per cube sharing the 0-6 diagonal
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], dtype=np.int64)


def _marching_tetrahedra_numpy(values: np.ndarray, level: float) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized marching tetrahedra. values: [X, Y, Z]. Returns (verts [V,3]
    in voxel coords, faces [F,3])."""
    nx, ny, nz = values.shape
    # corner values for every cube: [ncubes, 8]
    base = np.stack(np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                                np.arange(nz - 1), indexing='ij'), axis=-1).reshape(-1, 3)
    corner_idx = base[:, None, :] + _CORNERS[None, :, :]  # [ncubes, 8, 3]
    cv = values[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]  # [ncubes, 8]
    corner_pos = corner_idx.astype(np.float64)

    tri_list = []
    for tet in _TETS:
        v = cv[:, tet]                    # [ncubes, 4]
        p = corner_pos[:, tet]            # [ncubes, 4, 3]
        inside = v > level                # [ncubes, 4]
        code = (inside * np.array([1, 2, 4, 8])).sum(axis=1)  # [ncubes]

        def interp(mask, a, b):
            """edge intersection points for cubes selected by mask"""
            va, vb = v[mask, a], v[mask, b]
            t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return p[mask, a] + t * (p[mask, b] - p[mask, a])

        # single-corner cases (1 triangle); iso surface separates corner i
        single = [(1, 0, (1, 2, 3)), (2, 1, (0, 3, 2)), (4, 2, (0, 1, 3)), (8, 3, (0, 2, 1))]
        for code_in, ci, others in single:
            for c_val, flip in ((code_in, False), (15 - code_in, True)):
                m = code == c_val
                if not m.any():
                    continue
                pts = [interp(m, ci, o) for o in others]
                if flip:
                    pts = pts[::-1]
                tri_list.append(np.stack(pts, axis=1))  # [n, 3, 3]

        # two-corner cases (2 triangles / quad)
        double = [(3, (0, 1), (2, 3)), (5, (0, 2), (1, 3)), (9, (0, 3), (1, 2)),
                  (6, (1, 2), (0, 3)), (10, (1, 3), (0, 2)), (12, (2, 3), (0, 1))]
        for c_val, (a, b), (c_, d) in double:
            m = code == c_val
            if not m.any():
                continue
            # quad vertices: ac, ad, bd, bc
            q0, q1 = interp(m, a, c_), interp(m, a, d)
            q2, q3 = interp(m, b, d), interp(m, b, c_)
            tri_list.append(np.stack([q0, q1, q2], axis=1))
            tri_list.append(np.stack([q0, q2, q3], axis=1))

    if not tri_list:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    tris = np.concatenate(tri_list, axis=0)  # [F, 3, 3]
    verts, inverse = np.unique(tris.reshape(-1, 3).round(6), axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3)
    return verts, faces


def _load_native():
    try:
        from tdgp.native import _get_mc
        return _get_mc()  # None when g++ build/load failed
    except Exception:
        return None


def marching_cubes(values: np.ndarray, level: float,
                   use_native: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface extraction. Tries the native C++ kernel, falls back to numpy."""
    if use_native:
        native = _load_native()
        if native is not None:
            return native.marching_tetrahedra(np.ascontiguousarray(values, np.float32),
                                              float(level))
    return _marching_tetrahedra_numpy(values, level)


def extract_geometry(G, g_vars, ws: jnp.ndarray, resolution: int = 128,
                     cube_scale: float = 0.5, level: Optional[float] = None,
                     crop: int = 1) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full pipeline (ref scripts/extract_geometry.py:14-76). Returns
    (verts in world units, faces, sigma grid)."""
    sigma = extract_density_grid(G, g_vars, ws, resolution, cube_scale)
    if crop > 0:  # zero the boundary to close the surface (ref :44-50)
        sigma_c = sigma.copy()
        sigma_c[:crop] = sigma_c[-crop:] = 0
        sigma_c[:, :crop] = sigma_c[:, -crop:] = 0
        sigma_c[:, :, :crop] = sigma_c[:, :, -crop:] = 0
        sigma = sigma_c
    if level is None:
        level = float(np.percentile(sigma, 90))  # heuristic iso level
    verts, faces = marching_cubes(sigma, level)
    # voxel -> world coordinates
    verts = verts / (resolution - 1) * (2 * cube_scale) - cube_scale
    return verts, faces, sigma


# --------------------------------------------------------------------- io

def save_obj(verts: np.ndarray, faces: np.ndarray, path: str) -> None:
    with open(path, 'w') as f:
        for v in verts:
            f.write(f'v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n')
        for face in faces + 1:  # obj is 1-indexed
            f.write(f'f {face[0]} {face[1]} {face[2]}\n')


def save_mrc(volume: np.ndarray, path: str, voxel_size: float = 1.0) -> None:
    """Minimal MRC2014 writer (mode 2 = float32), replacing the reference's
    mrcfile dependency."""
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nz, ny, nx = vol.shape
    header = np.zeros(256, dtype=np.int32)
    header[0:3] = [nx, ny, nz]
    header[3] = 2  # mode: float32
    header[7:10] = [nx, ny, nz]            # mx, my, mz
    fheader = header.view(np.float32)
    fheader[10:13] = [nx * voxel_size, ny * voxel_size, nz * voxel_size]  # cell size
    fheader[13:16] = [90.0, 90.0, 90.0]    # cell angles
    header[16:19] = [1, 2, 3]              # axis order
    fheader[19] = float(vol.min())
    fheader[20] = float(vol.max())
    fheader[21] = float(vol.mean())
    header[52] = int.from_bytes(b'MAP ', 'little')
    header[53] = 0x00004144  # little-endian machine stamp
    with open(path, 'wb') as f:
        f.write(header.tobytes())
        f.write(vol.tobytes())
