"""Geometry extraction tests: marching tetrahedra (native + numpy) on an
analytic SDF, mesh export formats."""
import os

import numpy as np
import pytest

from tdgp.geometry import (_marching_tetrahedra_numpy, marching_cubes, save_mrc,
                           save_obj)


def sphere_volume(res=32, radius=0.6):
    side = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(side, side, side, indexing='ij')
    # density high inside the sphere
    return (radius - np.sqrt(x ** 2 + y ** 2 + z ** 2)).astype(np.float32)


def verts_to_world(verts, res):
    return verts / (res - 1) * 2.0 - 1.0


def test_numpy_marching_tetrahedra_sphere():
    res = 32
    vol = sphere_volume(res)
    verts, faces = _marching_tetrahedra_numpy(vol, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts_to_world(verts, res), axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.03)
    assert r.std() < 0.03
    assert faces.max() < len(verts)


def test_native_matches_numpy():
    from tdgp.native import _get_mc
    mc = _get_mc()
    if mc is None:
        pytest.skip('native kernel unavailable (no g++?)')
    vol = sphere_volume(24)
    v_np, f_np = _marching_tetrahedra_numpy(vol, level=0.0)
    v_cc, f_cc = mc.marching_tetrahedra(vol, 0.0)
    # same triangulation up to float rounding at the dedup boundary
    assert abs(len(f_cc) - len(f_np)) <= 0.01 * len(f_np) + 2
    r_np = np.linalg.norm(verts_to_world(v_np, 24), axis=1)
    r_cc = np.linalg.norm(verts_to_world(v_cc, 24), axis=1)
    np.testing.assert_allclose(r_cc.mean(), r_np.mean(), atol=1e-3)
    np.testing.assert_allclose(r_cc.std(), r_np.std(), atol=1e-3)
    # every native vertex lies on the numpy surface (nearest-neighbor check)
    sv_np = set(map(tuple, np.round(v_np, 4)))
    sv_cc = set(map(tuple, np.round(v_cc, 4)))
    overlap = len(sv_np & sv_cc) / max(len(sv_cc), 1)
    assert overlap > 0.9


def test_marching_cubes_dispatch_runs():
    vol = sphere_volume(16)
    verts, faces = marching_cubes(vol, 0.0)
    assert len(verts) > 0


def test_save_obj_and_mrc(tmp_path):
    vol = sphere_volume(16)
    verts, faces = marching_cubes(vol, 0.0, use_native=False)
    obj_path = str(tmp_path / 'mesh.obj')
    save_obj(verts, faces, obj_path)
    lines = open(obj_path).read().splitlines()
    assert sum(1 for l in lines if l.startswith('v ')) == len(verts)
    assert sum(1 for l in lines if l.startswith('f ')) == len(faces)

    mrc_path = str(tmp_path / 'vol.mrc')
    save_mrc(vol, mrc_path)
    raw = open(mrc_path, 'rb').read()
    assert len(raw) == 1024 + vol.size * 4
    header = np.frombuffer(raw[:1024], dtype=np.int32)
    assert list(header[:3]) == [16, 16, 16]
    assert header[3] == 2  # float32 mode
    data = np.frombuffer(raw[1024:], dtype=np.float32).reshape(16, 16, 16)
    np.testing.assert_allclose(data, vol)
