"""2D convolution with optional FIR up/downsampling, NHWC.

Counterpart of ref src/torch_utils/ops/conv2d_resample.py:46-141. The
reference hand-picks between five execution strategies (strided conv,
transpose conv, 1x1 reordering, ...) because cuDNN cares; on TPU we emit the
single mathematically-equivalent generic composition (ref :136-141) —
upfirdn(up) -> VALID conv -> upfirdn(down) — and let XLA pick the schedule.
Arbitrary-order gradients come from JAX autodiff (the reference needed
conv2d_gradfix for grad² on the R1 path).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from tdgp.ops.upfirdn2d import _parse_padding, get_filter_size, upfirdn2d


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: Union[int, Sequence[int]] = 0, groups: int = 1,
           flip_weight: bool = True) -> jnp.ndarray:
    """Plain conv. x: [N,H,W,Ci], w: [kh,kw,Ci/groups,Co].

    flip_weight=True means correlation (matches torch.conv2d / lax.conv).
    """
    if not flip_weight and (w.shape[0] > 1 or w.shape[1] > 1):
        w = jnp.flip(w, axis=(0, 1))
    px0, px1, py0, py1 = _parse_padding(padding)
    # No preferred_element_type: the TPU MXU accumulates bf16 convs in f32
    # natively, and mixed-precision cotangents break conv VJPs in jax 0.9.
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
    )


def conv2d_resample(x: jnp.ndarray, w: jnp.ndarray, f: Optional[jnp.ndarray] = None,
                    up: int = 1, down: int = 1, padding: Union[int, Sequence[int]] = 0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False) -> jnp.ndarray:
    """x: [N,H,W,Ci], w: [kh,kw,Ci/groups,Co], f: FIR filter (setup_filter output).

    `padding` is specified w.r.t. the upsampled image, exactly like the
    reference (conv2d_resample.py:49).
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling (ref :81-91).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Cheap special case: no resampling, symmetric non-negative padding.
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        return conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups, flip_weight=flip_weight)

    x = upfirdn2d(x, f if up > 1 else None, up=up, padding=(px0, px1, py0, py1),
                  gain=up ** 2, flip_filter=flip_filter)
    x = conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
