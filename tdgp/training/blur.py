"""Gaussian blur with a TRACED sigma under static shapes.

The reference builds a kernel of size 2*floor(3*sigma)+1 on the host every
step (ref loss.py:331-337) — a dynamic shape. Under jit we instead allocate
the kernel at the maximum support once and mask taps beyond floor(3*sigma)
with a traced comparison; sigma=0 degenerates to the identity via the
normalization (only tap 0 survives).
"""
from __future__ import annotations

import jax.numpy as jnp

from tdgp.ops.upfirdn2d import filter2d


def gaussian_kernel_1d(sigma: jnp.ndarray, max_sigma: float,
                       denom: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked 2^{-(k/denom)^2} kernel, taps |k| <= floor(3*sigma) (ref loss.py:333-336).

    denom defaults to sigma (maybe_blur); the depth-channel blur uses the
    reference's fixed denom=30 quirk (ref loss.py:92-94).
    """
    max_taps = int(max_sigma * 3)
    k = jnp.arange(-max_taps, max_taps + 1, dtype=jnp.float32)
    d = sigma if denom is None else denom
    f = jnp.exp2(-jnp.square(k / jnp.maximum(d, 1e-8)))
    blur_size = jnp.floor(sigma * 3.0)
    f = jnp.where(jnp.abs(k) <= blur_size, f, 0.0)
    return f / jnp.sum(f)


def maybe_blur(img: jnp.ndarray, sigma: jnp.ndarray, max_sigma: float) -> jnp.ndarray:
    """Blur [N,H,W,C] when sigma > 0 (identity otherwise), static shapes."""
    if max_sigma <= 0:
        return img
    f = gaussian_kernel_1d(sigma, max_sigma)
    return filter2d(img, f)


def blur_depth_channel(img: jnp.ndarray, sigma: jnp.ndarray, max_sigma: float) -> jnp.ndarray:
    """Extra slight blur of channel 3 (depth) with the denom=30 kernel
    (ref loss.py:90-95). img: [N,H,W,>=4]."""
    if max_sigma <= 0:
        return img
    f = gaussian_kernel_1d(sigma, max_sigma, denom=jnp.asarray(30.0))
    depth = filter2d(img[..., 3:4], f)
    return jnp.concatenate([img[..., :3], depth, img[..., 4:]], axis=-1)
