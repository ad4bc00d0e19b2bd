"""Inference & visualization utilities.

Counterpart of ref src/training/inference_utils.py + scripts/utils.py
(truncation, per-class w_avg, trajectory generators) and
scripts/inference.py (grids/videos). Rendering is jit-compiled per
(batch, resolution); frames come back as numpy uint8.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import PIL.Image

import jax
import jax.numpy as jnp

from tdgp.config import Config, asdict
from tdgp.rendering.camera import get_mean_camera_params
from tdgp.utils.tensor_group import EasyDict, TensorGroup


# ------------------------------------------------------------------ latents

def sample_z_from_seeds(seeds: Sequence[int], z_dim: int) -> jnp.ndarray:
    """Per-seed deterministic z (ref scripts/utils.py sample_z_from_seeds)."""
    zs = [np.random.RandomState(s).randn(z_dim).astype(np.float32) for s in seeds]
    return jnp.asarray(np.stack(zs))


def sample_ws_from_seeds(G, g_vars, seeds: Sequence[int], c: Optional[jnp.ndarray],
                         camera_angles: jnp.ndarray, truncation_psi: float = 1.0,
                         num_avg_samples: int = 256) -> jnp.ndarray:
    """Map seeds to w with truncation; when class-conditional, truncate toward
    the PER-CLASS w_avg (ref scripts/inference.py:118-134)."""
    z = sample_z_from_seeds(seeds, G.cfg.z_dim)

    def map_fn(g, z_, c_, ang_):
        return g.mapping(z_, c_, camera_angles=ang_, train=False)

    ws = G.apply(g_vars, z, c, camera_angles, method=map_fn)
    if truncation_psi != 1.0:
        if c is not None and c.shape[1] > 0:
            # per-class w_avg from num_avg_samples random z's per present class
            cls = np.unique(np.argmax(np.asarray(c), axis=1))
            w_avg_per_class = {}
            for k in cls:
                zs = jax.random.normal(jax.random.PRNGKey(int(k)),
                                       (num_avg_samples, G.cfg.z_dim))
                cs = jnp.zeros((num_avg_samples, c.shape[1])).at[:, int(k)].set(1.0)
                angs = jnp.repeat(camera_angles[:1], num_avg_samples, axis=0)
                w = G.apply(g_vars, zs, cs, angs, method=map_fn)
                w_avg_per_class[int(k)] = jnp.mean(w, axis=0)  # [num_ws, w_dim]
            avg = jnp.stack([w_avg_per_class[int(np.argmax(np.asarray(c)[i]))]
                             for i in range(len(seeds))])
            ws = avg + (ws - avg) * truncation_psi
        else:
            w_avg = g_vars['ema']['mapping']['w_avg']
            ws = w_avg + (ws - w_avg) * truncation_psi
    return ws


# -------------------------------------------------------------- trajectories

def generate_camera_trajectory(traj: Dict[str, Any],
                               canonical: TensorGroup) -> TensorGroup:
    """Camera paths: point | points | front_circle | line | wiggle
    (ref inference_utils.py:137-178)."""
    traj = EasyDict.init_recursively(traj)
    num_samples = len(canonical)
    name = traj['name']
    num_frames = len(traj['yaw_offsets']) if name == 'points' else traj.get('num_frames', 1)
    cam = canonical.repeat_interleave(num_frames, axis=0)
    angles = np.asarray(cam.angles)
    fov = np.asarray(cam.fov)

    if name == 'point':
        assert num_frames == 1
        angles = angles + np.asarray([traj['yaw_offset'], traj['pitch_offset'], 0.0])
        fov = fov + traj.get('fov_offset', 0.0)
    elif name == 'front_circle':
        steps = np.tile(np.linspace(0, 1, num_frames), num_samples)
        yaw = angles[:, 0] + traj['yaw_diff'] * np.sin(steps * 2 * np.pi)
        pitch = angles[:, 1] + traj['pitch_diff'] * np.cos(steps * 2 * np.pi)
        angles = np.stack([yaw, pitch, angles[:, 2]], axis=1)
        fov = fov + traj['fov_diff'] * np.sin(steps * 2 * np.pi)
    elif name == 'points':
        yaw = angles[:, 0] + np.tile(np.asarray(traj['yaw_offsets']), num_samples)
        pitch = angles[:, 1] + traj.get('pitch_offset', 0.0)
        angles = np.stack([yaw, pitch, angles[:, 2]], axis=1)
    elif name == 'wiggle':
        yaws = np.tile(np.linspace(traj['yaw_left'], traj['yaw_right'], num_frames), num_samples)
        pitches = np.tile(traj['pitch_diff'] * np.cos(np.linspace(0, 1, num_frames) * 2 * np.pi)
                          + np.pi / 2, num_samples)
        angles = np.stack([yaws, pitches, np.zeros_like(yaws)], axis=1)
    elif name == 'line':
        yaws = np.tile(np.linspace(traj['yaw_start'], traj['yaw_end'], num_frames), num_samples)
        pitches = np.tile(np.linspace(traj['pitch_start'], traj['pitch_end'], num_frames), num_samples)
        angles = np.stack([yaws, pitches, np.zeros_like(yaws)], axis=1)
        if traj.get('fov') is not None:
            fov = np.full_like(fov, traj['fov'])
    else:
        raise NotImplementedError(f'Unknown trajectory: {name}')

    return TensorGroup(
        angles=jnp.asarray(angles, dtype=jnp.float32),
        fov=jnp.asarray(fov + traj.get('fov_offset', 0.0), dtype=jnp.float32),
        radius=cam.radius, look_at=cam.look_at)


def canonical_cameras(cfg: Config, num: int, G=None, g_vars=None,
                      z: Optional[jnp.ndarray] = None, c: Optional[jnp.ndarray] = None,
                      use_posterior: bool = False) -> TensorGroup:
    """Mean prior camera, optionally warped through the camera adaptor
    (ref inference_utils.py:195-215 approximate_mean_camera_params)."""
    mean = get_mean_camera_params(asdict(cfg.camera))
    cam = TensorGroup(angles=jnp.repeat(mean.angles, num, axis=0),
                      fov=jnp.repeat(mean.fov, num, axis=0),
                      radius=jnp.repeat(mean.radius, num, axis=0),
                      look_at=jnp.repeat(mean.look_at, num, axis=0))
    if use_posterior and G is not None and cfg.generator.camera_adaptor.enabled:
        cam = G.apply(g_vars, method=lambda g: g.synthesis.apply_camera_adaptor(cam, z, c))
    return cam


# ----------------------------------------------------------------- rendering

def make_synthesis_fn(G, g_vars, **synthesis_kwargs) -> Callable:
    # eval ray chunking at high res (ref max_batch_res, model/3dgp.yaml:7)
    mbr = G.cfg.max_batch_res
    if 'ray_chunk' not in synthesis_kwargs and G.cfg.img_resolution > mbr:
        synthesis_kwargs['ray_chunk'] = mbr * mbr

    @jax.jit
    def fn(ws, angles, fov, radius, look_at):
        cam = TensorGroup(angles=angles, fov=fov, radius=radius, look_at=look_at)
        return G.apply(g_vars, method=lambda g: g.synthesis(
            ws, cam, train=False, noise_mode='const', **synthesis_kwargs))
    return fn


def generate(G, g_vars, ws: jnp.ndarray, camera_params: TensorGroup,
             batch_size: int = 4, **synthesis_kwargs) -> np.ndarray:
    """Batched const-noise rendering -> float images in [0,1]
    (ref inference_utils.py:105-123)."""
    fn = make_synthesis_fn(G, g_vars, **synthesis_kwargs)
    outs = []
    n = ws.shape[0]
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        # pad the tail batch to keep a single compiled shape
        pad = batch_size - (sl.stop - sl.start)
        w_b = jnp.concatenate([ws[sl], ws[sl][:1].repeat(pad, 0)]) if pad else ws[sl]
        cam_b = camera_params[sl]
        if pad:
            cam_b = TensorGroup(**{k: jnp.concatenate([v, v[:1].repeat(pad, 0)])
                                   for k, v in cam_b.items()})
        img = fn(w_b, cam_b.angles, cam_b.fov, cam_b.radius, cam_b.look_at)
        img = np.asarray(jnp.clip(img, -1, 1) * 0.5 + 0.5)
        outs.append(img[:sl.stop - sl.start])
    return np.concatenate(outs)


def generate_trajectory(G, g_vars, ws: jnp.ndarray, camera_params: TensorGroup,
                        batch_size: int = 4, **synthesis_kwargs) -> np.ndarray:
    """All ws x all trajectory frames (ref inference_utils.py:88-101).
    Returns [num_frames, num_samples, H, W, C] floats in [0,1]."""
    num_frames = len(camera_params) // ws.shape[0]
    num_samples = ws.shape[0]
    ws_rep = jnp.repeat(ws, num_frames, axis=0)
    imgs = generate(G, g_vars, ws_rep, camera_params, batch_size=batch_size,
                    **synthesis_kwargs)
    imgs = imgs.reshape(num_samples, num_frames, *imgs.shape[1:])
    return imgs.transpose(1, 0, 2, 3, 4)


# --------------------------------------------------------------------- io

def make_grid(images: np.ndarray, nrow: Optional[int] = None, pad: int = 2) -> np.ndarray:
    """[N,H,W,C] floats [0,1] -> one grid image [GH,GW,C]."""
    n, h, w, c = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.ones((ncol * (h + pad) - pad, nrow * (w + pad) - pad, c), dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * (h + pad): r * (h + pad) + h, col * (w + pad): col * (w + pad) + w] = images[i]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    """float [0,1] HWC -> png/jpg."""
    arr = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    PIL.Image.fromarray(arr).save(path)


def save_video_frames(frames: np.ndarray, path: str, fps: int = 25) -> None:
    """[T,H,W,C] floats [0,1] -> animated gif (or mp4 when ffmpeg exists)."""
    arrs = [np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8) for f in frames]
    if path.endswith('.gif'):
        ims = [PIL.Image.fromarray(a) for a in arrs]
        ims[0].save(path, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
    else:
        import shutil
        import subprocess
        import tempfile
        if shutil.which('ffmpeg') is None:
            # graceful fallback: gif next to the requested path
            save_video_frames(frames, os.path.splitext(path)[0] + '.gif', fps)
            return
        with tempfile.TemporaryDirectory() as td:
            for i, a in enumerate(arrs):
                PIL.Image.fromarray(a).save(os.path.join(td, f'{i:05d}.png'))
            subprocess.run(['ffmpeg', '-y', '-framerate', str(fps), '-i',
                            os.path.join(td, '%05d.png'), '-c:v', 'libx264',
                            '-crf', '20', '-pix_fmt', 'yuv420p', path], check=True)


def generate_videos(G, g_vars, cfg: Config, z: jnp.ndarray, c: Optional[jnp.ndarray],
                    num_frames: int = 32, batch_size: int = 4) -> np.ndarray:
    """front_circle preview videos (ref inference_utils.py:63-77).
    Returns [num_videos, num_frames, H, W, C]."""
    num_videos = min(z.shape[0], 9 if cfg.generator.img_resolution >= 1024 else 16)
    z, c = z[:num_videos], (c[:num_videos] if c is not None else None)
    canon = canonical_cameras(cfg, num_videos, G=G, g_vars=g_vars, z=z, c=c)
    traj = dict(name='front_circle', num_frames=num_frames, fov_diff=1.0,
                yaw_diff=0.5, pitch_diff=0.3, use_mean_camera=True)
    cams = generate_camera_trajectory(traj, canon)
    ws = G.apply(g_vars, method=lambda g: g.mapping(
        z, c, camera_angles=canon.angles, train=False))
    frames = generate_trajectory(G, g_vars, ws, cams, batch_size=batch_size)
    return frames.transpose(1, 0, 2, 3, 4)
