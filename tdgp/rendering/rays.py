"""Ray generation (with patch cropping) and ray-box intersection.

Counterpart of ref src/training/tri_plane_renderer.py:487-556 (sample_rays,
validate_image_plane) and :409-461 (get_ray_limits_box). Pure jnp, static
shapes, no host round-trips.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from tdgp.rendering.camera import compute_cam2world_matrix, normalize_vec
from tdgp.utils.tensor_group import TensorGroup


def sample_rays(c2w: jnp.ndarray, fov: jnp.ndarray, resolution: Tuple[int, int],
                patch_params: Optional[dict] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate world-space ray origins/directions for a (possibly patch-cropped) image.

    c2w: [batch, 4, 4]; fov: [batch] degrees;
    patch_params: {'scales': [batch,2], 'offsets': [batch,2]} in [0,1] units.
    Returns (ray_o_world [batch, h*w, 3], ray_d_world [batch, h*w, 3]).

    ref tri_plane_renderer.py:487-527: NDC grid with y flipped to image
    memory layout, patch rescaling in [-1,1] then fov-scaled pinhole dirs.
    """
    batch = c2w.shape[0]
    w, h = resolution
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(1.0, -1.0, h)
    x = jnp.tile(xs[None, :], (h, 1)).reshape(-1)[None, :].repeat(batch, axis=0)  # [batch, h*w]
    y = jnp.tile(ys[:, None], (1, w)).reshape(-1)[None, :].repeat(batch, axis=0)  # [batch, h*w]

    if patch_params is not None:
        scales, offsets = patch_params['scales'], patch_params['offsets']
        x = (x + 1.0) * scales[:, 0:1] - 1.0 + offsets[:, 0:1] * 2.0
        y = (y + 1.0) * scales[:, 1:2] - 1.0 + offsets[:, 1:2] * 2.0

    fov = jnp.broadcast_to(jnp.asarray(fov, dtype=jnp.float32).reshape(-1), (batch,))
    fov_rad = fov[:, None] / 360.0 * 2.0 * math.pi  # [batch, 1]
    z = -jnp.ones_like(x) / jnp.tan(fov_rad * 0.5)
    ray_d_cam = normalize_vec(jnp.stack([x, y, z], axis=2))  # [batch, h*w, 3]

    ray_d_world = jnp.einsum('bij,bpj->bpi', c2w[:, :3, :3], ray_d_cam)
    ray_o_world = jnp.broadcast_to(c2w[:, :3, 3][:, None, :], ray_d_world.shape)
    return ray_o_world, ray_d_world


def get_ray_limits_box(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       box_size: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method intersection with the centered cube of side `box_size`
    (ref tri_plane_renderer.py:409-461). Invalid rays get (tmin, tmax)=(-1, -2).

    rays_o/rays_d: [..., 3]. Returns (tmin, tmax) each [..., 1].
    """
    half = box_size / 2.0
    invdir = 1.0 / rays_d
    t_lo = (-half - rays_o) * invdir  # [..., 3]
    t_hi = (half - rays_o) * invdir
    tmin_axis = jnp.minimum(t_lo, t_hi)
    tmax_axis = jnp.maximum(t_lo, t_hi)
    tmin = jnp.max(tmin_axis, axis=-1)
    tmax = jnp.min(tmax_axis, axis=-1)
    valid = tmax >= tmin
    tmin = jnp.where(valid, tmin, -1.0)
    tmax = jnp.where(valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def validate_image_plane(fov: float, radius: float, scale: float = 1.0,
                         step: float = 1e-2) -> bool:
    """All frustum corner rays must hit the cube (ref tri_plane_renderer.py:531-556).
    Pinned to CPU like validate_frustum."""
    import jax
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return _validate_image_plane_impl(fov, radius, scale, step)
    return _validate_image_plane_impl(fov, radius, scale, step)


def _validate_image_plane_impl(fov: float, radius: float, scale: float,
                               step: float) -> bool:
    import numpy as np
    num_angles = int((math.pi / 2) / step)
    yaw = np.linspace(0, 2 * math.pi, num_angles)
    pitch = np.clip(np.linspace(0, math.pi, num_angles), 1e-7, math.pi - 1e-7)
    yaw, pitch = np.meshgrid(yaw, pitch, indexing='ij')
    angles = np.stack([yaw.ravel(), pitch.ravel(), np.zeros(yaw.size)], axis=1).astype(np.float32)
    n = angles.shape[0]
    camera_params = TensorGroup(
        angles=jnp.asarray(angles),
        radius=jnp.full((n,), radius, dtype=jnp.float32),
        fov=jnp.full((n,), fov, dtype=jnp.float32),
        look_at=jnp.zeros((n, 3), dtype=jnp.float32),
    )
    c2w = compute_cam2world_matrix(camera_params)
    ray_o, ray_d = sample_rays(c2w, camera_params.fov, resolution=(2, 2))
    ray_start, ray_end = get_ray_limits_box(ray_o, ray_d, box_size=scale * 2)
    return bool(jnp.all(ray_end > ray_start))
