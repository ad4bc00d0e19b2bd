"""Inference utilities: trajectories, seeded latents, grids, video io."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp import inference
from tdgp.config import tiny_test_config, asdict
from tdgp.utils.tensor_group import TensorGroup

CFG = tiny_test_config()


def canonical(n=2):
    return inference.canonical_cameras(CFG, n)


def test_sample_z_from_seeds_deterministic():
    z1 = inference.sample_z_from_seeds([0, 1, 2], 16)
    z2 = inference.sample_z_from_seeds([0, 1, 2], 16)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1[0]), np.asarray(z1[1]))


@pytest.mark.parametrize("name,num_frames", [
    ('front_circle', 5), ('line', 4), ('wiggle', 4), ('points', 3), ('point', 1),
])
def test_trajectories(name, num_frames):
    traj = dict(name=name, num_frames=num_frames, fov_diff=1.0, yaw_diff=0.5,
                pitch_diff=0.3, yaw_left=-0.5, yaw_right=0.5, yaw_start=-0.5,
                yaw_end=0.5, pitch_start=1.5, pitch_end=1.5, fov=None,
                yaw_offset=0.1, pitch_offset=0.0,
                yaw_offsets=[-0.4, 0.0, 0.4])
    cams = inference.generate_camera_trajectory(traj, canonical(2))
    expected = {'points': 3, 'point': 1}.get(name, num_frames) * 2
    assert len(cams) == expected
    assert np.all(np.isfinite(np.asarray(cams.angles)))
    assert cams.fov.shape == (expected,)


def test_front_circle_returns_to_start():
    traj = dict(name='front_circle', num_frames=9, fov_diff=1.0, yaw_diff=0.5,
                pitch_diff=0.3)
    cams = inference.generate_camera_trajectory(traj, canonical(1))
    a = np.asarray(cams.angles)
    np.testing.assert_allclose(a[0], a[-1], atol=1e-5)  # sin/cos close the loop


def test_make_grid_layout():
    imgs = np.zeros((5, 8, 8, 3), dtype=np.float32)
    imgs[0, :, :, 0] = 1.0
    grid = inference.make_grid(imgs, nrow=3, pad=1)
    assert grid.shape == (2 * 9 - 1, 3 * 9 - 1, 3)
    assert grid[0, 0, 0] == 1.0   # first image top-left
    assert grid[0, 9, 0] == 0.0   # second image is black


def test_save_image_and_gif(tmp_path):
    img = np.random.rand(16, 16, 3).astype(np.float32)
    p = str(tmp_path / 'x.png')
    inference.save_image(img, p)
    import PIL.Image
    loaded = np.asarray(PIL.Image.open(p))
    assert loaded.shape == (16, 16, 3)
    np.testing.assert_allclose(loaded / 255.0, img, atol=0.01)

    frames = np.random.rand(4, 16, 16, 3).astype(np.float32)
    g = str(tmp_path / 'v.gif')
    inference.save_video_frames(frames, g, fps=5)
    gif = PIL.Image.open(g)
    assert gif.n_frames == 4


def test_video_fallback_to_gif_without_ffmpeg(tmp_path, monkeypatch):
    import shutil as _sh
    monkeypatch.setattr(_sh, 'which', lambda *_: None)
    frames = np.random.rand(2, 8, 8, 3).astype(np.float32)
    mp4 = str(tmp_path / 'v.mp4')
    inference.save_video_frames(frames, mp4, fps=5)
    assert os.path.exists(str(tmp_path / 'v.gif'))
