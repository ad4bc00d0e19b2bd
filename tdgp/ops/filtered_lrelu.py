"""filtered_lrelu as a composition (upsample -> bias+lrelu -> downsample).

The reference ships a 1.3k-line fused CUDA kernel (ref:
src/torch_utils/ops/filtered_lrelu.cu) but it is UNUSED by the 3DGP model
path (SURVEY.md §2.2) — it exists for StyleGAN3 legacy. We provide the
mathematically-equivalent composition the reference itself falls back to
(ref filtered_lrelu.py:116-120); XLA fuses the elementwise middle into the
convs.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tdgp.ops.bias_act import bias_act
from tdgp.ops.upfirdn2d import upsample2d, downsample2d


def filtered_lrelu(x: jnp.ndarray, fu: Optional[jnp.ndarray] = None,
                   fd: Optional[jnp.ndarray] = None, b: Optional[jnp.ndarray] = None,
                   up: int = 2, down: int = 2, padding: int = 0, gain: float = 1.4142135623730951,
                   slope: float = 0.2, clamp: Optional[float] = None) -> jnp.ndarray:
    """x: [N,H,W,C]; returns filtered leaky-relu'd resampled tensor."""
    px0 = px1 = py0 = py1 = padding if isinstance(padding, int) else None
    if px0 is None:
        px0, px1, py0, py1 = padding
    x = upsample2d(x, fu, up=up, padding=(px0, px1, py0, py1))
    x = bias_act(x, b, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = downsample2d(x, fd, down=down)
    return x
