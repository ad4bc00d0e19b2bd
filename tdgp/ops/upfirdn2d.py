"""upfirdn2d: pad -> zero-upsample -> FIR filter -> downsample, NHWC.

TPU-native counterpart of the reference CUDA kernel (ref:
src/torch_utils/ops/upfirdn2d.py:70-211, upfirdn2d.cu). Instead of a
hand-tiled kernel, the whole pipeline maps onto ONE
`lax.conv_general_dilated` call: `lhs_dilation` performs the zero
upsampling, conv `padding` performs the (possibly negative) padding, the
depthwise filter performs the FIR, and `window_strides` performs the
downsampling. XLA lowers this to a single fused TPU convolution.

Numerical semantics match `_upfirdn2d_ref` (ref upfirdn2d.py:166-211)
exactly, including the filter flip convention and the per-pass gain for
separable filters.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def _parse_padding(padding: Union[int, Sequence[int]]) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def get_filter_size(f: Optional[jnp.ndarray]) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])  # (fw, fh)


def setup_filter(f, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None) -> jnp.ndarray:
    """Prepare a FIR filter for upfirdn2d (ref: upfirdn2d.py:70-115).

    Returns float32, 1-D (separable) or 2-D.
    """
    if f is None:
        f = 1.0
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[None]
    assert f.ndim in (1, 2)
    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def upfirdn2d(x: jnp.ndarray, f: Optional[jnp.ndarray], up: Union[int, Sequence[int]] = 1,
              down: Union[int, Sequence[int]] = 1, padding: Union[int, Sequence[int]] = 0,
              flip_filter: bool = False, gain: float = 1.0) -> jnp.ndarray:
    """x: [N, H, W, C]. Returns [N, H', W', C]."""
    assert x.ndim == 4, f"expected NHWC, got {x.shape}"
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    C = x.shape[3]

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 1:
        f2 = jnp.outer(f, f)
        # the reference applies gain**(1/2) per separable pass -> total gain
        f2 = f2 * gain
    else:
        f2 = f * gain
    if not flip_filter:
        f2 = jnp.flip(f2, axis=(0, 1))
    fh, fw = int(f2.shape[0]), int(f2.shape[1])

    # lhs_dilation inserts (up-1) zeros BETWEEN samples; the reference's
    # upsample appends trailing zeros too, so fold (up-1) into the trailing pad.
    pad_h = (py0, py1 + upy - 1)
    pad_w = (px0, px1 + upx - 1)

    # Depthwise conv: same filter for every channel.
    kernel = jnp.tile(f2[:, :, None, None].astype(x.dtype), (1, 1, 1, C))  # [fh, fw, 1, C]
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(downy, downx),
        padding=(pad_h, pad_w),
        lhs_dilation=(upy, upx),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=C,
    )
    return out.astype(x.dtype)


def filter2d(x: jnp.ndarray, f: Optional[jnp.ndarray], padding: Union[int, Sequence[int]] = 0,
             flip_filter: bool = False, gain: float = 1.0) -> jnp.ndarray:
    """Same-size FIR filtering (ref: upfirdn2d.py:277-308)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    px0 += (fw - 1) // 2
    px1 += fw // 2
    py0 += (fh - 1) // 2
    py1 += fh // 2
    return upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter, gain=gain)


def upsample2d(x: jnp.ndarray, f: Optional[jnp.ndarray], up: int = 2,
               padding: Union[int, Sequence[int]] = 0, flip_filter: bool = False,
               gain: float = 1.0) -> jnp.ndarray:
    """Upsample with FIR smoothing (ref: upfirdn2d.py:311-345)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    px0 += (fw + upx - 1) // 2
    px1 += (fw - upx) // 2
    py0 += (fh + upy - 1) // 2
    py1 += (fh - upy) // 2
    return upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x: jnp.ndarray, f: Optional[jnp.ndarray], down: int = 2,
                 padding: Union[int, Sequence[int]] = 0, flip_filter: bool = False,
                 gain: float = 1.0) -> jnp.ndarray:
    """FIR-smoothed downsampling (ref: upfirdn2d.py:348-380)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    px0 += (fw - downx + 1) // 2
    px1 += (fw - downx) // 2
    py0 += (fh - downy + 1) // 2
    py1 += (fh - downy) // 2
    return upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain)
