"""Patch-wise training utilities (ref: src/training/training_utils.py:22-143).

Patch parameters are sampled INSIDE the jitted train step with jax.random
(the reference used host numpy), with scales replicated across
mbstd groups so minibatch-std statistics see consistent scales.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tdgp.config import PatchCfg
from tdgp.ops.grid_sample import grid_sample_nhwc


def sample_patch_params(key, batch_size: int, cfg: PatchCfg,
                        min_scale: jnp.ndarray | float,
                        beta: jnp.ndarray | float = 1.0) -> Dict[str, jnp.ndarray]:
    """Sample {scales [N,2], offsets [N,2]} in [0,1] units (ref :57-143).

    min_scale / beta are the annealed schedule values (traced scalars).
    """
    group_size = cfg.mbstd_group_size
    assert batch_size % group_size == 0
    num_groups = batch_size // group_size
    k_scale, k_off = jax.random.split(key)

    if cfg.distribution in ('uniform', 'discrete_uniform'):
        if cfg.distribution == 'discrete_uniform' and len(cfg.discrete_support) > 0:
            support = jnp.asarray(cfg.discrete_support)
            # mask values outside [min_scale, max_scale]; renormalize
            valid = (support >= min_scale) & (support <= cfg.max_scale)
            logits = jnp.where(valid, 0.0, -jnp.inf)
            idx = jax.random.categorical(k_scale, jnp.broadcast_to(logits, (num_groups, len(cfg.discrete_support))))
            scales_x = support[idx]
        else:
            u = jax.random.uniform(k_scale, (num_groups,))
            scales_x = u * (cfg.max_scale - min_scale) + min_scale
    elif cfg.distribution == 'beta':
        b = jax.random.beta(k_scale, cfg.alpha, beta, (num_groups,))
        scales_x = b * (cfg.max_scale - min_scale) + min_scale
    else:
        raise NotImplementedError(cfg.distribution)

    scales = jnp.stack([scales_x, scales_x], axis=1)  # [G, 2] square patches
    offsets = jax.random.uniform(k_off, (num_groups, 2)) * (1.0 - scales)
    scales = jnp.repeat(scales, group_size, axis=0)
    offsets = jnp.repeat(offsets, group_size, axis=0)
    return {'scales': scales, 'offsets': offsets}


def compute_patch_coords(patch_params: Dict[str, jnp.ndarray], resolution: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Patch params -> grid_sample coords [N, res, res, 2] (ref :35-53)."""
    scales, offsets = patch_params['scales'], patch_params['offsets']
    batch = scales.shape[0]
    if align_corners:
        row = jnp.linspace(-1.0, 1.0, resolution)
    else:
        row = (jnp.arange(resolution) / resolution) * 2.0 - 1.0
    x = jnp.broadcast_to(row[None, :], (resolution, resolution))
    y = -x.T
    coords = jnp.stack([x, y], axis=2)[None]  # [1, res, res, 2]
    coords = (coords + 1.0) * scales[:, None, None, :] - 1.0 + offsets[:, None, None, :] * 2.0
    # grid_sample layout flips y (ref :49-52)
    return jnp.stack([coords[..., 0], -coords[..., 1]], axis=-1)


def extract_patches(x: jnp.ndarray, patch_params: Dict[str, jnp.ndarray],
                    resolution: int) -> jnp.ndarray:
    """Crop+resize patches from full images via bilinear sampling (ref :22-31).

    x: [N, H, W, C] -> [N, resolution, resolution, C].
    """
    assert x.shape[1] == x.shape[2], "square images only"
    coords = compute_patch_coords(patch_params, resolution)
    return grid_sample_nhwc(x, coords, align_corners=True)


def sample_random_c(key, batch_size: int, c_dim: int) -> jnp.ndarray:
    """Random one-hot labels (ref training_utils.py:207-214)."""
    if c_dim == 0:
        return jnp.zeros((batch_size, 0))
    idx = jax.random.randint(key, (batch_size,), 0, c_dim)
    return jax.nn.one_hot(idx, c_dim)
