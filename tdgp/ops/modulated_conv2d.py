"""StyleGAN2 modulated convolution, NHWC, MXU-friendly.

Counterpart of ref src/training/networks_stylegan2.py:30-88. The reference's
"fused" path materializes a per-sample weight tensor and runs a grouped conv
with `groups=batch` — efficient on cuDNN, hostile to the TPU MXU (B tiny
matmuls). Because modulation/demodulation are diagonal scalings and the conv
is linear, the identical result is obtained by scaling the *activations*:

    y = demod_n ⊙ conv(x ⊙ style_n, W)

which keeps ONE batched conv with shared weights on the MXU (this is the
reference's own non-fused path, ref :67-76, which it proves equivalent by
using it for inference). Demodulation coefficients are computed exactly as
ref :58-64. bf16 pre-normalization mirrors the fp16 overflow guard ref :51-53.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tdgp.ops.conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jnp.ndarray,                       # [N, H, W, Ci]
    weight: jnp.ndarray,                  # [kh, kw, Ci, Co]
    styles: jnp.ndarray,                  # [N, Ci]
    noise: Optional[jnp.ndarray] = None,  # [N, Ho, Wo, 1] or broadcastable
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jnp.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jnp.ndarray:
    N = x.shape[0]
    kh, kw, ci, co = weight.shape
    assert styles.shape == (N, ci), f"{styles.shape} vs {(N, ci)}"

    # Pre-normalize to avoid low-precision overflow (ref :51-53).
    if x.dtype == jnp.bfloat16 and demodulate:
        w_norm = jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)  # [1,1,1,Co]
        weight = weight * (1.0 / jnp.sqrt(ci * kh * kw) / (w_norm + 1e-12))
        s_norm = jnp.max(jnp.abs(styles), axis=1, keepdims=True)  # [N,1]
        styles = styles / (s_norm + 1e-12)

    dcoefs = None
    if demodulate:
        # sum_{kh,kw,ci} (W * s)^2 = einsum over squared terms (ref :58-62).
        w2 = jnp.sum(weight.astype(jnp.float32) ** 2, axis=(0, 1))          # [Ci, Co]
        sig2 = jnp.einsum('ni,io->no', styles.astype(jnp.float32) ** 2, w2)  # [N, Co]
        dcoefs = jax.lax.rsqrt(sig2 + 1e-8)                                  # [N, Co]

    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
                        padding=padding, flip_weight=flip_weight)
    if demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x
