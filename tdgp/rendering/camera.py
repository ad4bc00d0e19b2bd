"""Camera sampling distributions and camera-to-world math.

Counterpart of ref src/training/rendering_utils.py. Everything is a pure
jnp function over an explicit PRNG key, so camera sampling lives INSIDE the
jitted train step (the reference sampled on the host with numpy/scipy,
ref rendering_utils.py:140-146, forcing a host->device copy per batch).

scipy's truncnorm sampler is replaced by the closed-form inverse-CDF
transform (erfinv), which is jit/vmap/grad-friendly.

Conventions (identical to the reference):
  - angles = (yaw, pitch, roll); yaw in (-pi, pi), pitch in (0, pi), roll=0
  - camera sits on a sphere of `radius` looking at `look_at` (itself given
    in spherical coords), up = +y
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdgp.utils.tensor_group import EasyDict, TensorGroup


def normalize_vec(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


# --------------------------------------------------------------- sampling

def _norm_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / math.sqrt(2.0)))


def sample_truncnorm(key, mean: float, std: float, lo: float, hi: float,
                     shape) -> jnp.ndarray:
    """Truncated normal via inverse CDF (replaces scipy.stats.truncnorm.rvs,
    ref rendering_utils.py:140-146)."""
    a = _norm_cdf((lo - mean) / std)
    b = _norm_cdf((hi - mean) / std)
    u = jax.random.uniform(key, shape, minval=a, maxval=b)
    u = jnp.clip(u, 1e-7, 1 - 1e-7)
    z = math.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)
    return mean + std * z


def sample_camera_angles(key, cfg: Dict[str, Any], batch_size: int) -> jnp.ndarray:
    """Sample (yaw, pitch, roll) per config distribution (ref rendering_utils.py:72-110)."""
    cfg = EasyDict.init_recursively(cfg)
    k_yaw, k_pitch, k_sel = jax.random.split(key, 3)
    dist = cfg['dist']

    if dist == 'custom':
        # dataset-driven angles (ref rendering_utils.py:187, training_loop.py:305-312):
        # the caller must pass dataset-sampled angles via
        # sample_camera_params(origin_angles=...) — there is nothing to draw here.
        raise ValueError("angles dist 'custom' requires dataset-provided origin_angles")
    if dist == 'uniform':
        yaw = jax.random.uniform(k_yaw, (batch_size,), minval=cfg.yaw['min'], maxval=cfg.yaw['max'])
        pitch = jax.random.uniform(k_pitch, (batch_size,), minval=cfg.pitch['min'], maxval=cfg.pitch['max'])
    elif dist == 'normal':
        yaw = jax.random.normal(k_yaw, (batch_size,)) * cfg.yaw['std'] + cfg.yaw['mean']
        pitch = jax.random.normal(k_pitch, (batch_size,)) * cfg.pitch['std'] + cfg.pitch['mean']
    elif dist == 'truncnorm':
        yaw = sample_truncnorm(k_yaw, (cfg.yaw['max'] + cfg.yaw['min']) * 0.5, cfg.yaw['std'],
                               cfg.yaw['min'], cfg.yaw['max'], (batch_size,))
        pitch = sample_truncnorm(k_pitch, (cfg.pitch['max'] + cfg.pitch['min']) * 0.5, cfg.pitch['std'],
                                 cfg.pitch['min'], cfg.pitch['max'], (batch_size,))
    elif dist == 'hybrid':
        # 50/50 mixture of wide-uniform and normal (ref :87-93); computed
        # branchlessly (select) to stay jit-friendly.
        u_yaw = (jax.random.uniform(k_yaw, (batch_size,)) - 0.5) * 2 * cfg.yaw['std'] * 2 + cfg.yaw['mean']
        u_pitch = (jax.random.uniform(k_pitch, (batch_size,)) - 0.5) * 2 * cfg.pitch['std'] * 2 + cfg.pitch['mean']
        kn_yaw, kn_pitch = jax.random.split(jax.random.fold_in(key, 1))
        n_yaw = jax.random.normal(kn_yaw, (batch_size,)) * cfg.yaw['std'] + cfg.yaw['mean']
        n_pitch = jax.random.normal(kn_pitch, (batch_size,)) * cfg.pitch['std'] + cfg.pitch['mean']
        take_uniform = jax.random.uniform(k_sel, ()) < 0.5
        yaw = jnp.where(take_uniform, u_yaw, n_yaw)
        pitch = jnp.where(take_uniform, u_pitch, n_pitch)
    elif dist == 'spherical_uniform':
        yaw_range, yaw_center = cfg.yaw['max'] - cfg.yaw['min'], 0.5 * (cfg.yaw['max'] + cfg.yaw['min'])
        pitch_range, pitch_center = cfg.pitch['max'] - cfg.pitch['min'], 0.5 * (cfg.pitch['max'] + cfg.pitch['min'])
        yaw = (jax.random.uniform(k_yaw, (batch_size,)) - 0.5) * yaw_range + yaw_center
        v = (jax.random.uniform(k_pitch, (batch_size,)) - 0.5) * pitch_range + pitch_center
        v = jnp.clip(v / math.pi, 1e-5, 1 - 1e-5)
        pitch = jnp.arccos(1 - 2 * v)
    else:
        raise NotImplementedError(f"Unknown angle distribution: {dist}")

    pitch = jnp.clip(pitch, 1e-5, math.pi - 1e-5)
    return jnp.stack([yaw, pitch, jnp.zeros_like(yaw)], axis=1)  # [batch, 3]


def sample_bounded_scalar(key, cfg: Dict[str, Any], batch_size: int) -> jnp.ndarray:
    """ref rendering_utils.py:125-136."""
    cfg = EasyDict.init_recursively(cfg)
    dist = cfg['dist']
    if dist == 'normal':
        assert float(cfg['std']) == 0.0, "scalar must be bounded"
        return jnp.full((batch_size,), float(cfg['mean']), dtype=jnp.float32)
    if dist == 'truncnorm':
        return sample_truncnorm(key, cfg['mean'], cfg['std'], cfg['min'], cfg['max'], (batch_size,))
    if dist == 'uniform':
        return jax.random.uniform(key, (batch_size,), minval=cfg['min'], maxval=cfg['max'])
    raise NotImplementedError(f"Unknown scalar distribution: {dist}")


def sample_in_ball(key, cfg: Dict[str, Any], batch_size: int) -> jnp.ndarray:
    """(yaw, pitch, radius) for the look-at point (ref rendering_utils.py:114-121)."""
    cfg = EasyDict.init_recursively(cfg)
    k_ang, k_rad = jax.random.split(key)
    angles = sample_camera_angles(k_ang, cfg['angles'], batch_size)  # [batch, 3]
    radius = sample_bounded_scalar(k_rad, cfg['radius'], batch_size)  # [batch]
    return jnp.concatenate([angles[:, :2], radius[:, None]], axis=1)


def sample_camera_params(key, cfg: Dict[str, Any], batch_size: int,
                         origin_angles: Optional[jnp.ndarray] = None) -> TensorGroup:
    """ref rendering_utils.py:150-156. Returns TensorGroup(angles, fov, radius, look_at)."""
    cfg = EasyDict.init_recursively(cfg)
    k_ang, k_fov, k_rad, k_la = jax.random.split(key, 4)
    angles = sample_camera_angles(k_ang, cfg['origin']['angles'], batch_size) \
        if origin_angles is None else origin_angles
    fov = sample_bounded_scalar(k_fov, cfg['fov'], batch_size)
    radius = sample_bounded_scalar(k_rad, cfg['origin']['radius'], batch_size)
    look_at = sample_in_ball(k_la, cfg['look_at'], batch_size)
    return TensorGroup(angles=angles, fov=fov, radius=radius, look_at=look_at)


# --------------------------------------------------------- analytic means

def get_max_sampling_value(cfg: Dict[str, Any]) -> float:
    dist = cfg['dist']
    if dist == 'normal':
        return cfg['mean'] if cfg['std'] <= 1e-8 else float('inf')
    if dist in ('truncnorm', 'uniform'):
        return cfg['max']
    raise NotImplementedError(dist)


def get_mean_sampling_value(cfg: Dict[str, Any]) -> float:
    dist = cfg['dist']
    if dist in ('normal', 'truncnorm'):
        return cfg['mean']
    if dist == 'uniform':
        return (cfg['max'] + cfg['min']) / 2
    raise NotImplementedError(dist)


def get_mean_angles_values(angles_cfg: Dict[str, Any]) -> List[float]:
    dist = angles_cfg['dist']
    if dist in ('spherical_uniform', 'truncnorm', 'uniform'):
        return [(angles_cfg['yaw']['max'] + angles_cfg['yaw']['min']) * 0.5,
                (angles_cfg['pitch']['max'] + angles_cfg['pitch']['min']) * 0.5, 0.0]
    if dist == 'normal':
        return [angles_cfg['yaw']['mean'], angles_cfg['pitch']['mean'], 0.0]
    raise NotImplementedError(dist)


def get_mean_camera_params(camera_cfg: Dict[str, Any]) -> TensorGroup:
    """The 8-scalar mean camera (used for test-time conditioning, ref train.py + inference)."""
    angles = jnp.asarray(get_mean_angles_values(camera_cfg['origin']['angles']), dtype=jnp.float32)
    fov = jnp.asarray([get_mean_sampling_value(camera_cfg['fov'])], dtype=jnp.float32)
    radius = jnp.asarray([get_mean_sampling_value(camera_cfg['origin']['radius'])], dtype=jnp.float32)
    la_mean = [(camera_cfg['look_at']['angles']['yaw']['max'] + camera_cfg['look_at']['angles']['yaw']['min']) * 0.5,
               (camera_cfg['look_at']['angles']['pitch']['max'] + camera_cfg['look_at']['angles']['pitch']['min']) * 0.5,
               get_mean_sampling_value(camera_cfg['look_at']['radius'])]
    look_at = jnp.asarray(la_mean, dtype=jnp.float32)
    return TensorGroup(angles=angles[None], fov=fov, radius=radius, look_at=look_at[None])


# -------------------------------------------------------------- cam2world

def spherical2cartesian(rotation: jnp.ndarray, pitch: jnp.ndarray,
                        radius=1.0) -> jnp.ndarray:
    """ref rendering_utils.py:270-285; the equations encode camera conventions."""
    x = radius * jnp.sin(pitch) * jnp.sin(-rotation)
    y = radius * jnp.cos(pitch)
    z = radius * jnp.sin(pitch) * jnp.cos(rotation)
    return jnp.stack([x, y, z], axis=-1)


def compute_cam2world_matrix(camera_params: TensorGroup) -> jnp.ndarray:
    """Look-at cam2world, up=+y (ref rendering_utils.py:194-218). Returns [batch, 4, 4]."""
    origins = spherical2cartesian(camera_params.angles[:, 0], camera_params.angles[:, 1],
                                  camera_params.radius)  # [batch, 3]
    look_at = spherical2cartesian(camera_params.look_at[:, 0], camera_params.look_at[:, 1],
                                  camera_params.look_at[:, 2])  # [batch, 3]
    forward = normalize_vec(look_at - origins)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype=forward.dtype), forward.shape)
    left = normalize_vec(jnp.cross(up, forward))
    up = normalize_vec(jnp.cross(forward, left))

    rot = jnp.stack([-left, up, -forward], axis=-1)  # [batch, 3, 3] columns
    batch = origins.shape[0]
    c2w = jnp.zeros((batch, 4, 4), dtype=forward.dtype)
    c2w = c2w.at[:, :3, :3].set(rot)
    c2w = c2w.at[:, :3, 3].set(origins)
    c2w = c2w.at[:, 3, 3].set(1.0)
    return c2w


# ------------------------------------------------------------- validation

def validate_frustum(fov: float, near: float, far: float, radius: float,
                     scale: float = 1.0, step: float = 1e-2, verbose: bool = False) -> bool:
    """Checks the whole viewing frustum stays inside the [-scale, scale]^3 cube
    for every camera on the sphere (ref rendering_utils.py:289-331).

    Host-side startup validation: pinned to the CPU backend so it never
    waits on an accelerator compile queue."""
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return _validate_frustum_impl(fov, near, far, radius, scale, step, verbose)
    return _validate_frustum_impl(fov, near, far, radius, scale, step, verbose)


def _validate_frustum_impl(fov: float, near: float, far: float, radius: float,
                           scale: float, step: float, verbose: bool) -> bool:
    num_angles = int((math.pi / 2) / step)
    yaw = np.linspace(0, 2 * math.pi, num_angles)
    pitch = np.clip(np.linspace(0, math.pi, num_angles), 1e-7, math.pi - 1e-7)
    yaw, pitch = np.meshgrid(yaw, pitch, indexing='ij')
    angles = np.stack([yaw.ravel(), pitch.ravel(), np.zeros(yaw.size)], axis=1).astype(np.float32)
    batch = angles.shape[0]

    camera_params = TensorGroup(
        angles=jnp.asarray(angles),
        radius=jnp.full((batch,), radius, dtype=jnp.float32),
        fov=jnp.full((batch,), fov, dtype=jnp.float32),
        look_at=jnp.zeros((batch, 3), dtype=jnp.float32),
    )
    c2w = compute_cam2world_matrix(camera_params)

    # 2x2 image-plane corners, near & far planes.
    x = jnp.asarray([-1.0, 1.0, -1.0, 1.0])
    y = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    fov_rad = fov / 360 * 2 * math.pi
    z = -jnp.ones(4) / math.tan(fov_rad * 0.5)
    rays_d_cam = normalize_vec(jnp.stack([x, y, z], axis=1))  # [4, 3]
    z_vals = jnp.asarray([near, far])  # [2]

    # world points: origin + t * R @ d
    dirs_world = jnp.einsum('bij,pj->bpi', c2w[:, :3, :3], rays_d_cam)  # [batch, 4, 3]
    origins = c2w[:, :3, 3][:, None, None, :]  # [batch, 1, 1, 3]
    pts = origins + z_vals[None, None, :, None] * dirs_world[:, :, None, :]  # [batch, 4, 2, 3]
    lo, hi = float(jnp.min(pts)), float(jnp.max(pts))
    if verbose:
        print(f"frustum extent: [{lo:.4f}, {hi:.4f}] vs cube ±{scale}")
    return lo >= -scale and hi <= scale


def compute_viewing_frustum_sizes(ray_start: float, ray_end: float, fov: float) -> EasyDict:
    """ref rendering_utils.py:335-344 (fov in degrees)."""
    return EasyDict(
        altitute=ray_end - ray_start,
        bottom_base=ray_end * math.radians(fov),
        top_base=ray_start * math.radians(fov),
    )
